package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: attribute the encoding-census cost between its two
  * branches (the shared-order block window vs the exploded distinct
  * aggregate) at a given corpus — the evidence for choosing the
  * distinct strategy at scale. runMain graft.tools.EncodingProbe <sfDir> */
object EncodingProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.head
    val spark = graft.Engine.tune(SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    def force(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val colsProfiled = Seq[(String, org.apache.spark.sql.Column)](
      "l_orderkey" -> col("l_orderkey").cast("long"),
      "l_partkey" -> col("l_partkey").cast("long"),
      "l_quantity" -> col("l_quantity").cast("long"),
      "l_returnflag" -> ascii(col("l_returnflag")).cast("long"),
      "l_linestatus" -> ascii(col("l_linestatus")).cast("long"))
    val idx = colsProfiled.indices
    def windowOnly(): org.apache.spark.sql.DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
      val base = graft.Tables.lineitem(spark, dir)
        .select(expr("l_orderkey div 512").as("blk") +:
          col("l_orderkey").as("k1") +: col("l_linenumber").as("k2") +:
          colsProfiled.zipWithIndex.map { case ((_, c), i) => c.as(s"v$i") }: _*)
      val ord = col("k1") +: col("k2") +: idx.map(i => col(s"v$i"))
      val wIn = w.partitionBy("blk").orderBy(ord: _*)
      val withChg = idx.foldLeft(base) { (d, i) =>
        d.withColumn(s"chg$i",
          when(lag(col(s"v$i"), 1).over(wIn) === col(s"v$i"), 0L).otherwise(1L))
      }
      withChg.groupBy("blk")
        .agg(count(lit(1)).as("n"),
          idx.map(i => sum(col(s"chg$i")).as(s"starts$i")): _*)
        .agg(sum(col("n")), idx.map(i => sum(col(s"starts$i"))): _*)
    }
    def distinctExploded(): org.apache.spark.sql.DataFrame =
      graft.Tables.lineitem(spark, dir)
        .select(explode(array(colsProfiled.map { case (nme, c) =>
          struct(lit(nme).as("c"), c.as("v")) }: _*)).as("e"))
        .groupBy(col("e.c").as("column_name"))
        .agg(countDistinct(col("e.v")).as("n_distinct"))
    def distinctPerColumn(): org.apache.spark.sql.DataFrame =
      colsProfiled.map { case (nme, c) =>
        graft.Tables.lineitem(spark, dir).agg(countDistinct(c).as("n_distinct"))
          .select(lit(nme).as("column_name"), col("n_distinct"))
      }.reduce(_ unionAll _)
    // the shipped shape's window+aggregate exactly (16-agg groupBy with
    // lag/lead boundary flags), minus distinct and stitch — attributes
    // the gap between the full query and windowOnly+distinct
    def windowFull16(): org.apache.spark.sql.DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
      val base = graft.Tables.lineitem(spark, dir)
        .select(expr("l_orderkey div 512").as("blk") +:
          col("l_orderkey").as("k1") +: col("l_linenumber").as("k2") +:
          colsProfiled.zipWithIndex.map { case ((_, c), i) => c.as(s"v$i") }: _*)
      val ord = col("k1") +: col("k2") +: idx.map(i => col(s"v$i"))
      val wIn = w.partitionBy("blk").orderBy(ord: _*)
      val withChg = idx.foldLeft(base) { (d, i) =>
        d.withColumn(s"chg$i",
          when(lag(col(s"v$i"), 1).over(wIn) === col(s"v$i"), 0L).otherwise(1L))
      }.withColumn("isf", lag(col("v0"), 1).over(wIn).isNull)
        .withColumn("isl", lead(col("v0"), 1).over(wIn).isNull)
      withChg.groupBy("blk")
        .agg(count(lit(1)).as("n"),
          idx.flatMap(i => Seq(
            sum(col(s"chg$i")).as(s"starts$i"),
            max(when(col("isf"), col(s"v$i"))).as(s"f$i"),
            max(when(col("isl"), col(s"v$i"))).as(s"l$i"))): _*)
    }
    for (pass <- 1 to 2) {
      println(f"PROBE pass$pass window_only       ${force(windowOnly())}%8.2f s")
      println(f"PROBE pass$pass window_full16     ${force(windowFull16())}%8.2f s")
      println(f"PROBE pass$pass distinct_exploded ${force(distinctExploded())}%8.2f s")
      println(f"PROBE pass$pass distinct_percol   ${force(distinctPerColumn())}%8.2f s")
    }
    spark.stop()
  }
}
