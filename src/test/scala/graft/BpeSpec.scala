package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pipeline

/** BPE trainer vs an independent sequential reference implementation
  * (plain-Scala greedy left-to-right merging — the mrsequential
  * philosophy), on a synthetic corpus engineered to exercise the
  * overlapping-run rule: `aaaa` under rule (a,a) must become [aa, aa],
  * and a wrong application would poison every later round's counts. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("graft_bpe").toString
    import spark.implicits._
    Seq(
      (0L, "aaaa aaaa aaaa aaaa aaab banana banana", "en", "t", 0L),
      (1L, "banana bandana aaaa abab abab cccc", "en", "t", 0L),
      (2L, "na na na banana aaab cccc dd dd dd dd", "en", "t", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Sequential reference: greedy left-to-right non-overlapping merge,
    * top pair by (count desc, "a b" string asc). */
  private def refBpe(words: Map[String, Long], rounds: Int)
      : Seq[(Long, String, String, String, Long)] = {
    var vocab: Map[String, (Vector[String], Long)] =
      words.map { case (w, n) => w -> (w.map(_.toString).toVector, n) }
    (1 to rounds).map { r =>
      val counts = vocab.values.toSeq
        .flatMap { case (toks, n) =>
          toks.sliding(2).filter(_.size == 2).map(p => ((p(0), p(1)), n)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
      def apply(toks: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.result()
      }
      vocab = vocab.map { case (w, (toks, n)) => w -> (apply(toks), n) }
      (r.toLong, a, b, a + b, cnt)
    }
  }

  test("learned merge table equals the sequential reference") {
    val texts = Seq(
      "aaaa aaaa aaaa aaaa aaab banana banana",
      "banana bandana aaaa abab abab cccc",
      "na na na banana aaab cccc dd dd dd dd")
    val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    val expected = refBpe(wc, 5)
    val got = Pipeline.bpeTrain(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === expected)
    // the run rule actually fired: some round merged a pair with a == b
    assert(expected.exists(m => m._2 == m._3),
      "fixture failed to exercise the overlapping-run case")
  }

  test("apply-side compression matches the sequential reference") {
    val texts = Seq(
      "aaaa aaaa aaaa aaaa aaab banana banana",
      "banana bandana aaaa abab abab cccc",
      "na na na banana aaab cccc dd dd dd dd")
    val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)
    // replay the reference merges, tracking weighted totals per round
    var vocab: Map[String, (Vector[String], Long)] =
      wc.map { case (w, n) => w -> (w.map(_.toString).toVector, n) }
    def total: Long = vocab.values.map { case (t, n) => t.length * n }.sum
    val expTotals = Seq.newBuilder[Long]
    expTotals += total
    refBpe(wc, 5).foreach { case (_, a, b, _, _) =>
      def apply(toks: Vector[String]): Vector[String] = {
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += (a + b); i += 2
          } else { out += toks(i); i += 1 }
        }
        out.result()
      }
      vocab = vocab.map { case (w, (t, n)) => w -> (apply(t), n) }
      expTotals += total
    }
    val exp = expTotals.result()
    val got = Pipeline.bpeApply(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2) === exp)
    got.foreach { case (_, t, ppm) => assert(ppm === t * 1000000L / exp.head) }
  }
}
