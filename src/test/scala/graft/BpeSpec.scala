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

  private val texts = Seq(
    "aaaa aaaa aaaa aaaa aaab banana banana",
    "banana bandana aaaa abab abab cccc",
    "na na na banana aaab cccc dd dd dd dd")

  private lazy val wordCounts: Map[String, Long] =
    texts.flatMap(_.split(" ")).filter(_.nonEmpty)
      .groupMapReduce(identity)(_ => 1L)(_ + _)

  private lazy val corpusDir: String = {
    val dir = Files.createTempDirectory("graft_bpe").toString
    import spark.implicits._
    texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t, "en", "t", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Greedy left-to-right non-overlapping application of rule (a, b). */
  private def applyMerge(a: String, b: String)(toks: Vector[String]): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Sequential reference: per round, top pair by (count desc, "a b"
    * string asc), then greedy application; returns the merge table and
    * the weighted total token count after every round (index 0 = chars). */
  private def refBpe(rounds: Int)
      : (Seq[(Long, String, String, String, Long)], Seq[Long]) = {
    var vocab: Map[String, (Vector[String], Long)] =
      wordCounts.map { case (w, n) => w -> (w.map(_.toString).toVector, n) }
    def total: Long = vocab.values.map { case (t, n) => t.length * n }.sum
    val totals = Seq.newBuilder[Long]
    totals += total
    val merges = (1 to rounds).map { r =>
      val counts = vocab.values.toSeq
        .flatMap { case (toks, n) =>
          toks.sliding(2).filter(_.size == 2).map(p => ((p(0), p(1)), n)) }
        .groupMapReduce(_._1)(_._2)(_ + _)
      val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, s"$x $y") }
      vocab = vocab.map { case (w, (toks, n)) => w -> (applyMerge(a, b)(toks), n) }
      totals += total
      (r.toLong, a, b, a + b, cnt)
    }
    (merges, totals.result())
  }

  test("learned merge table equals the sequential reference") {
    val (expected, _) = refBpe(5)
    val got = Pipeline.bpeTrain(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(3), r.getLong(4))).toSeq
    assert(got === expected)
    // the run rule actually fired: some round merged a pair with a == b
    assert(expected.exists(m => m._2 == m._3),
      "fixture failed to exercise the overlapping-run case")
  }

  test("apply-side compression matches the sequential reference") {
    val (_, exp) = refBpe(5)
    val got = Pipeline.bpeApply(spark, corpusDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got.map(_._2) === exp)
    got.foreach { case (_, t, ppm) => assert(ppm === t * 1000000L / exp.head) }
  }
}
