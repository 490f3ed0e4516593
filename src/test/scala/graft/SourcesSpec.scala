package graft

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.mr.{MapReduceJob, RefApps}
import graft.sources.TextIO

/** Whole-file text source + "key value" text sink — the reference's I/O
  * model (`worker.go:60-70`, `worker.go:125-141`) — round-tripped. */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("wholeTextFiles -> wc -> writeKv -> readKv round trip") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_txt")
    Files.writeString(dir.resolve("pg-one.txt"), "the quick fox. the end")
    Files.writeString(dir.resolve("pg-two.txt"), "quick quick 42")

    val files = TextIO.wholeTextFiles(spark, dir.toString + "/*.txt")
    val got = files.collect().map(r => (r.getString(0), r.getString(1))).toMap
    assert(got === Map(
      "pg-one.txt" -> "the quick fox. the end",
      "pg-two.txt" -> "quick quick 42"))

    val wc = MapReduceJob.run(spark,
      files.as[(String, String)], RefApps.wcMap, RefApps.wcReduce).toDF("key", "value")
    val outDir = dir.resolve("out").toString
    TextIO.writeKv(wc, outDir)
    val back = TextIO.readKv(spark, outDir).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(back === Map("the" -> "2", "quick" -> "3", "fox" -> "1", "end" -> "1"))
  }

  test("readKv drops malformed lines like worker.go:112-115") {
    val dir = Files.createTempDirectory("graft_kv")
    Files.writeString(dir.resolve("mr-out-0"), "a 1\nmalformed\nb 2\nc x y\n")
    val back = TextIO.readKv(spark, dir.toString).collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(back === Map("a" -> "1", "b" -> "2"))
  }

  test("declared textRoundtrip equals a direct wordcount of docs 0..49") {
    import org.apache.spark.sql.functions._
    val sf = SparkTestSession.Sf
    val got = TextIO.textRoundtrip(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val want = Tables.documents(spark, sf).filter(col("doc_id") < 50)
      .select(explode(graft.functions.Fns.tokensArr(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(got === want)
  }

  test("csv and json round trips") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_fmt")
    val df = Seq((1L, "x"), (2L, "y")).toDF("id", "name")
    TextIO.writeCsv(df, s"$dir/c")
    assert(TextIO.readCsv(spark, s"$dir/c").collect().length === 2)
    TextIO.writeJson(df, s"$dir/j")
    assert(TextIO.readJson(spark, s"$dir/j").collect().length === 2)
  }

  test("schema evolution: v1 rows fold into the unknown bucket exactly") {
    val rows = TextIO.schemaEvolution(spark, SparkTestSession.Sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val o = Tables.orders(spark, SparkTestSession.Sf).collect()
      .map(r => (r.getLong(0), r.getString(2)))
    val v1 = o.count(_._1 % 3 == 0).toLong
    assert(rows("unknown") === v1)
    val v2 = o.filter(_._1 % 3 == 1).groupBy(_._2).view.mapValues(_.size.toLong)
    v2.foreach { case (st, n) => assert(rows(st) === n) }
    assert(rows.values.sum === v1 + v2.values.sum)
  }
}
