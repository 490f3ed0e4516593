package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Pipeline

/** The df-cap recall cliff must SELF-REPORT (round 16, VERDICT r15 #3):
  * SURVEY §9's honest-100× probe measured `q_dedup_ngram` silently
  * finding 0 pairs on a mass-duplicated corpus because every shingle's
  * df inflated past the stop-shingle cap — a data-quality incident with
  * no signal anywhere. The pair-memo build now publishes the measured
  * capped fraction as a session conf and logs a loud warning past the
  * advisory threshold; this spec proves the flag fires on a synthetic
  * df-saturated corpus and stays quiet on a healthy one. */
class DfCapAlertSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  private def writeDocs(rows: Seq[(Long, String)]): String = {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-dfcap").toString
    rows.toDF("doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("a df-saturated corpus flags 1e6 ppm capped with ZERO pairs; a healthy corpus reports 0 ppm") {
    // 150 verbatim copies of one 5-token text: every shingle's df (150)
    // exceeds the default cap (100), so ALL pairable keys are capped and
    // the pair table is empty — the silent-blindness scenario, except it
    // may no longer be silent
    val sat = writeDocs((1L to 150L).map(i =>
      i -> "alpha beta gamma delta epsilon"))
    try {
      assert(Pipeline.dedupNgram(spark, sat).count() === 0L,
        "the saturated corpus must reproduce the 0-recall cliff")
      assert(spark.conf.get(Pipeline.CapObservedConf).toLong === 1000000L,
        "the build must publish the measured capped fraction")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(sat))
    // healthy: one duplicated pair among distinct docs — dfs far below
    // the cap, one pair found, observation 0
    val ok = writeDocs(Seq(
      1L -> "alpha beta gamma delta epsilon",
      2L -> "alpha beta gamma delta epsilon",
      3L -> "one two three four five six",
      4L -> "seven eight nine ten eleven twelve"))
    try {
      assert(Pipeline.dedupNgram(spark, ok).count() === 1L)
      assert(spark.conf.get(Pipeline.CapObservedConf).toLong === 0L,
        "a healthy corpus must overwrite the observation with 0")
    } finally org.apache.commons.io.FileUtils
      .deleteDirectory(new java.io.File(ok))
  }
}
