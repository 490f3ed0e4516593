package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Clustering
import graft.util.CorpusMemo

/** Persisted ANN model tables (round 15, VERDICT r14 #5): with
  * `spark.graft.ann.modelPath` set, the trained k-means centroids and
  * PQ codebooks persist per corpus fingerprint; a later session adopts
  * them and recomputes only the one-pass assignment/encoding — results
  * hash-identical to in-session training, rebuild guarded by the
  * corpus fingerprint, default-off. */
class AnnModelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf
  private val Knob = "spark.graft.ann.modelPath"

  private def genDirs(p: String): Seq[String] =
    Option(new java.io.File(p).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .map(_.getName).toSeq.sorted

  private def withModelPath[T](p: String)(f: => T): T = {
    CorpusMemo.invalidate(spark, sf)
    spark.conf.set(Knob, p)
    try f finally {
      spark.conf.unset(Knob)
      CorpusMemo.invalidate(spark, sf)
    }
  }

  test("persisted models reproduce in-session training bit-for-bit; a second session adopts without rebuilding; families train lazily") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann").toString
    try {
      // kmeans covers the centroid table + recomputed assignment (its
      // n_vecs/wss aggregate the assignment); annAdc covers the PQ
      // codebooks + recomputed encoding end-to-end through the ADC rank
      val expectedKm = Clustering.kmeans(spark, sf).collect().map(_.toString)
      val expectedAdc = Clustering.annAdc(spark, sf).collect().map(_.toString)
      val (kmGens, pqGens) = withModelPath(root) {
        val km = Clustering.kmeans(spark, sf).collect().map(_.toString)
        assert(km.toSeq === expectedKm.toSeq)
        // per-family laziness (round-15 review): kmeans-only work must
        // not pay — or publish — the PQ Lloyd loop
        assert(genDirs(s"$root/kmeans").size === 1)
        assert(genDirs(s"$root/pq").isEmpty,
          "PQ must not train until a PQ consumer asks")
        val adc = Clustering.annAdc(spark, sf).collect().map(_.toString)
        assert(adc.toSeq === expectedAdc.toSeq)
        (genDirs(s"$root/kmeans"), genDirs(s"$root/pq"))
      }
      assert(kmGens.size === 1 && pqGens.size === 1)
      // "second session" (memos invalidated): must adopt, not retrain
      withModelPath(root) {
        val km = Clustering.kmeans(spark, sf).collect().map(_.toString)
        val adc = Clustering.annAdc(spark, sf).collect().map(_.toString)
        assert(km.toSeq === expectedKm.toSeq)
        assert(adc.toSeq === expectedAdc.toSeq)
        assert(genDirs(s"$root/kmeans") === kmGens, "must not retrain")
        assert(genDirs(s"$root/pq") === pqGens, "must not retrain")
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
    }
  }

  test("corpus fingerprint mismatch retrains for the new corpus") {
    val root = java.nio.file.Files.createTempDirectory("graft-ann-fp").toString
    val corpus2 = java.nio.file.Files.createTempDirectory("graft-ann-c2").toString
    try {
      withModelPath(root) { Clustering.kmeans(spark, sf).collect() }
      val gen1 = genDirs(s"$root/kmeans")
      Tables.embeddings(spark, sf).filter(col("vec_id") % 2 === 0)
        .write.mode("overwrite").parquet(s"$corpus2/embeddings.parquet")
      val expected2 = Clustering.kmeans(spark, corpus2).collect().map(_.toString)
      CorpusMemo.invalidate(spark, corpus2)
      val got2 = withModelPath(root) {
        CorpusMemo.invalidate(spark, corpus2)
        try Clustering.kmeans(spark, corpus2).collect().map(_.toString)
        finally CorpusMemo.invalidate(spark, corpus2)
      }
      assert(got2.toSeq === expected2.toSeq,
        "retrained model must serve the new corpus exactly")
      assert(genDirs(s"$root/kmeans").size === 2,
        "per-fingerprint retention keeps both corpora's generations")
      assert(genDirs(s"$root/kmeans") !== gen1)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(corpus2))
    }
  }
}
