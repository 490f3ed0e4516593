package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{MrApi, MrSuite}

/** Differential tests for the MR app-suite queries: recompute each result
  * in plain Scala from the raw fixture and compare (the same philosophy as
  * the reference's `test-mr.sh` golden diff, with the in-JVM model as the
  * golden producer). */
class MrSuiteSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  private lazy val docs: Seq[(Long, String)] =
    Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq

  private def toks(s: String): Seq[String] =
    s.split("[^a-zA-Z]+").toSeq.filter(_.nonEmpty)

  test("q_wordcount matches plain-Scala recomputation") {
    val expected = docs.flatMap(d => toks(d._2)).groupBy(identity)
      .map { case (w, ws) => (w, ws.size.toLong) }
    val got = MrSuite.wordCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === expected)
  }

  test("q_inverted_index: distinct per doc, docs CSV sorted lexicographically") {
    val expected = docs
      .flatMap { case (id, t) => toks(t).distinct.map(w => (w, id.toString)) }
      .groupBy(_._1)
      .map { case (w, ps) =>
        val ds = ps.map(_._2).distinct.sorted
        (w, (ds.size.toLong, ds.mkString(",")))
      }
    val got = MrSuite.invertedIndex(spark, sf).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getString(2)))).toMap
    assert(got === expected)
  }

  test("q_sorted_concat: values sorted inside each key") {
    val rows = MrSuite.sortedConcat(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("a", "b", "c", "d"))
    rows.foreach { r =>
      val vals = r.getString(1).split(" ").toSeq
      assert(vals === vals.sorted, s"key ${r.getString(0)} not sorted")
    }
    val a = rows.find(_.getString(0) == "a").get.getString(1).split(" ")
    assert(a.length === docs.size)
  }

  test("MR-API twins equal the declarative versions") {
    val dfWc = MrSuite.wordCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1).toString)).toMap
    val mrWc = MrApi.mrWordCount(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(mrWc === dfWc)
  }
}
