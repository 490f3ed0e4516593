package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (round 18): the fixture parquet files are single-row-group,
  * so EVERY scan is one effective map task locally whatever the split
  * config — this probe measures (a) whether hash-redistributing right
  * after the scan (guide §2.5's unsplittable-input move) parallelizes the
  * heavy per-row map work, and (b) the filter-pushdown trap: a filter on
  * a computed heavy column is pushed below the exchange and re-evaluates
  * the whole expression in the single-task stage, so the sig-null filter
  * must be expressed as its cheap equivalent (size(t) >= 3).
  *
  * runMain graft.tools.ScanProbe <sfDir>
  */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.Engine.tune(s)
    def force(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROBE $label%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // tokenize+shingle+sig map pass — the LSH stream shape; the sig-null
    // filter is the cheap equivalent size(t) >= 3 (sig is null iff the
    // shingle array is empty iff fewer than 3 tokens), so pushdown never
    // duplicates the 64-perm kernel
    def sigWork(wide: Boolean) = {
      import graft.functions.{Fns, VectorExpressions}
      val base0 = graft.Tables.documents(s, dir)
      val base = if (wide) base0.repartition(
        s.sparkContext.defaultParallelism, col("doc_id")) else base0
      base
        .select(col("doc_id"),
          filter(Fns.tokensArr(col("text")), w => w =!= lit("")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"),
          transform(sequence(lit(0), size(col("t")) - 3),
            i => concat_ws(" ", element_at(col("t"), i + 1),
                                element_at(col("t"), i + 2),
                                element_at(col("t"), i + 3))).as("shs"))
        .select(col("doc_id"),
          VectorExpressions.minhashSig(col("shs")).as("sig"))
        .select(col("doc_id"), element_at(col("sig"), 1).as("m0"))
    }
    // wordcount shape: tokenize + explode + keyed agg — the generic
    // doc-heavy query
    def wcWork(wide: Boolean) = {
      import graft.functions.Fns
      val base0 = graft.Tables.documents(s, dir)
      val base = if (wide) base0.repartition(
        s.sparkContext.defaultParallelism, col("doc_id")) else base0
      base.select(explode(Fns.tokensArr(col("text"))).as("word"))
        .filter(col("word") =!= "")
        .groupBy("word").agg(count(lit(1)).as("cnt"))
    }
    (1 to 3).foreach { r =>
      println(s"--- round $r ---")
      time("sig pass NARROW")(force(sigWork(false)))
      time("sig pass WIDE")(force(sigWork(true)))
      time("wordcount NARROW")(force(wcWork(false)))
      time("wordcount WIDE")(force(wcWork(true)))
    }
    s.stop()
  }
}
