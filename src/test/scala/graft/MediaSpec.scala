package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.multimodal.Media

/** Multimodal plumbing: binary column -> batched stub decode -> metadata. */
class MediaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("mediaDedup: digests reconcile with a driver-side recompute") {
    val rows = graft.multimodal.Media.mediaDedup(spark, SparkTestSession.Sf).collect()
    val docs = Tables.documents(spark, SparkTestSession.Sf)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // groups partition the corpus
    assert(rows.map(_.getLong(3)).sum === docs.length.toLong)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = docs.groupBy { case (id, t) =>
      val kind = (id % 3) match { case 0 => "img"; case 1 => "audio"; case _ => "video" }
      (kind, md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    }
    rows.foreach { r =>
      val g = expect((r.getString(0), r.getString(1)))
      assert(r.getLong(2) === g.map(_._1).min)      // keep_id
      assert(r.getLong(3) === g.length.toLong)      // n_copies
      assert(r.getLong(4) === g.head._2.getBytes("UTF-8").length.toLong)
      assert(r.getLong(5) === (g.length - 1).toLong * r.getLong(4))
    }
  }

  test("decode stub is deterministic in the payload") {
    val (w1, h1) = Media.decodeStub("hello world".getBytes)
    val (w2, h2) = Media.decodeStub("hello world".getBytes)
    assert((w1, h1) === (w2, h2))
    assert(w1 === 11 % 640 + 1 && h1 === (11 * 7) % 480 + 1)
  }

  test("mediaTransform: resize fits 224 box, video frame sampling, checksum") {
    val rows = Media.mediaTransform(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (f, ow, oh, frames) =
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ow >= 1 && oh >= 1)
      assert(math.max(ow, oh) <= 224)
      if (f == "video") assert(frames >= 1 && frames <= 6)
      else assert(frames === 1L)
    }
  }

  test("mediaMeta: schema and values derived from blob bytes") {
    val rows = Media.mediaMeta(spark, sf).collect()
    assert(rows.length === 500)
    assert(Media.mediaMeta(spark, sf).columns.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "format"))
    rows.foreach { r =>
      val (id, n, w, h, f) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      assert(w === n % 640 + 1)
      assert(h === (n * 7) % 480 + 1)
      assert(f === Seq("img", "audio", "video")((id % 3).toInt))
    }
  }

  test("mediaEmbed: cross-modal only, distances replay, top-3 is a total order") {
    val rows = graft.multimodal.Media.mediaEmbed(spark, sf).collect()
    assert(rows.nonEmpty)
    // every match crosses modalities
    rows.foreach(r => assert(r.getString(1) !== r.getString(3)))
    // replay the stub embedding + squared L2 driver-side
    val M = 1000000007L; val M2 = 1000000009L
    def ph(s: String, base: Long, mod: Long): Long =
      s.foldLeft(0L)((h, c) => (h * base + c.toLong) % mod)
    val docs = spark.read.parquet(s"${sf}/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def emb(id: Long): Seq[Long] = {
      val h1 = ph(docs(id), 31L, M); val h2 = ph(docs(id), 131L, M2)
      (1 to 8).map(i => (h1 + i * h2) % 1000L - 500L)
    }
    rows.foreach { r =>
      val d = emb(r.getLong(0)).zip(emb(r.getLong(2)))
        .map { case (a, b) => (a - b) * (a - b) }.sum
      assert(r.getLong(4) === d)
    }
    // per probe: exactly 3 ranks, ascending distance
    rows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getLong(5)).sorted.toSeq === Seq(1L, 2L, 3L))
      val byRank = rs.sortBy(_.getLong(5)).map(_.getLong(4))
      assert(byRank.toSeq === byRank.sorted.toSeq)
    }
  }
}
