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

  test("Codecs: synthesized animated GIF round-trips through javax.imageio exactly") {
    import graft.multimodal.Codecs
    for (id <- Seq(2L, 5L, 125L, 349L, 1000001L, 6788L)) {
      val (w, h, nf) = ((id % 350 + 8).toInt, (id * 5 % 24 + 4).toInt, (id % 14 + 2).toInt)
      val blob = Codecs.gifGray(w, h, nf, f => ((id + f) % 128).toInt)
      // closed-form byte length the oracle relies on
      val n = w * h
      val d = n + (n - 1) / 125 + 2
      assert(blob.length === 398 + nf * (12 + d + (d + 254) / 255), s"id=$id")
      // header-only parse: real reader, real dimensions, real format name
      assert(Codecs.imageMeta(blob) === ((w.toLong, h.toLong, "gif")), s"id=$id")
      // multi-frame decode: the codec's own search finds every frame and
      // each sampled raster sums to the constant-index closed form
      val (cnf, cw, ch, sums) = Codecs.gifFrameSums(blob, _ % 5 == 0)
      assert(cnf === nf, s"id=$id")
      assert((cw, ch) === ((w.toLong, h.toLong)), s"id=$id")
      assert(sums.map(_._1) === (0 until nf by 5), s"id=$id")
      sums.foreach { case (f, s) =>
        assert(s === w.toLong * h * ((id + f) % 128) % 1000000007L, s"id=$id f=$f")
      }
      // and the decoded pixels really are the synthesized gray value
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      val pv = (id % 128).toInt // frame 0
      val rgb = img.getRGB(w / 2, h / 2)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) === ((pv, pv, pv)))
    }
  }

  test("Codecs: synthesized PNG round-trips through javax.imageio exactly") {
    import graft.multimodal.Codecs
    for (id <- Seq(0L, 3L, 216L, 399L, 441L, 6789L)) {
      val (w, h, pv) = ((id % 300 + 8).toInt, (id * 7 % 48 + 8).toInt, (id % 256).toInt)
      val blob = Codecs.pngRgb(w, h, pv)
      // closed-form byte length the oracle relies on
      assert(blob.length === h * (1 + 3 * w) + 68, s"id=$id")
      // header-only parse: real reader, real dimensions, real format name
      assert(Codecs.imageMeta(blob) === ((w.toLong, h.toLong, "png")), s"id=$id")
      // full decode: the codec inflates the scanlines; the channel sum
      // must equal the constant-pixel closed form
      val (dw, dh, sum) = Codecs.imagePixelSum(blob)
      assert((dw, dh) === ((w.toLong, h.toLong)), s"id=$id")
      assert(sum === w.toLong * h * 3 * pv % 1000000007L, s"id=$id")
      // and the decoded pixels really are the synthesized color
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(blob))
      val rgb = img.getRGB(w / 2, h / 2)
      assert(((rgb >> 16) & 0xff, (rgb >> 8) & 0xff, rgb & 0xff) === ((pv, pv, pv)))
    }
  }

  test("Codecs: synthesized WAV round-trips through javax.sound exactly") {
    import graft.multimodal.Codecs
    for (id <- Seq(1L, 4L, 997L, 2101L)) {
      val (ns, sv) = ((id % 2000 + 100).toInt, (id % 1000).toInt)
      val blob = Codecs.wavPcm16Mono(8000, ns, sv)
      assert(blob.length === 44 + 2 * ns, s"id=$id")
      assert(Codecs.audioMeta(blob) === ((ns.toLong, 8000L, "wave")), s"id=$id")
      val (frames, sum) = Codecs.audioPcmSum(blob)
      assert(frames === ns.toLong, s"id=$id")
      assert(sum === ns.toLong * ((sv & 0xff) + (sv >> 8)) % 1000000007L, s"id=$id")
    }
  }

  test("mediaTransform: image resize fits 224, audio decimates, video samples frames") {
    val rows = Media.mediaTransform(spark, sf).collect()
    assert(rows.length === 500)
    rows.foreach { r =>
      val (id, f, ow, oh, frames) = (r.getLong(0),
        r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(ow >= 1 && oh >= 1)
      f match {
        case "img" =>
          assert(math.max(ow, oh) <= 224)
          assert(frames === 1L)
        case "audio" =>
          assert(ow === (id % 2000 + 100) / 2 && oh === 1L)
          assert(frames === 1L)
        case _ =>
          assert(math.max(ow, oh) <= 224)
          // every 5th of 2..15 real GIF frames → 1..3 sampled
          assert(frames >= 1 && frames <= 3)
          assert(frames === (id % 14 + 2 + 4) / 5)
      }
    }
    // both resize branches must be exercised by the synthesized widths
    val imgs = rows.filter(_.getString(1) == "img")
    assert(imgs.exists(r => r.getLong(2) === r.getLong(0) % 300 + 8),
      "some images fit the box unscaled")
    assert(imgs.exists(r => r.getLong(2) === 224L),
      "some images hit the downscale branch (width is the max dim)")
    val vids = rows.filter(_.getString(1) == "video")
    assert(vids.exists(r => r.getLong(2) === r.getLong(0) % 350 + 8),
      "some videos fit the box unscaled")
    assert(vids.exists(r => r.getLong(2) === 224L),
      "some videos hit the downscale branch (width is the max dim)")
  }

  test("mediaMeta: real codec parses surface the synthesis parameters") {
    val rows = Media.mediaMeta(spark, sf).collect()
    assert(rows.length === 500)
    assert(Media.mediaMeta(spark, sf).columns.toSeq ===
      Seq("doc_id", "n_bytes", "width", "height", "format"))
    rows.foreach { r =>
      val (id, n, w, h, f) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4))
      (id % 3) match {
        case 0 =>
          assert(f === "png", s"doc $id")
          assert(w === id % 300 + 8 && h === id * 7 % 48 + 8, s"doc $id")
          assert(n === h * (1 + 3 * w) + 68, s"doc $id")
        case 1 =>
          assert(f === "wave", s"doc $id")
          assert(w === id % 2000 + 100 && h === 8000L, s"doc $id")
          assert(n === 44 + 2 * w, s"doc $id")
        case _ =>
          assert(f === "gif", s"doc $id")
          assert(w === id % 350 + 8 && h === id * 5 % 24 + 4, s"doc $id")
          val nf = id % 14 + 2
          val np = w * h
          val d = np + (np - 1) / 125 + 2
          assert(n === 398 + nf * (12 + d + (d + 254) / 255), s"doc $id")
      }
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

  test("decode-budget knobs: hash-sampled audit pass and frame stride (r14)") {
    val fracKey = "spark.graft.media.decodeFraction"
    val strideKey = "spark.graft.media.frameStride"
    val full = Media.mediaTransform(spark, sf).collect()
    val fullFrames = Media.mediaFrames(spark, sf).collect()
    try {
      // fraction: the sampled run is EXACTLY the full run filtered by the
      // deterministic doc_id hash — same rows, same values, repeatable
      spark.conf.set(fracKey, "0.5")
      def kept(id: Long): Boolean =
        Math.floorMod(id * 2654435761L + 12345L, 1000000L) < 500000L
      val sampled = Media.mediaTransform(spark, sf).collect()
      assert(sampled.map(_.toString).toSeq ===
        full.filter(r => kept(r.getLong(0))).map(_.toString).toSeq)
      assert(sampled.length < full.length && sampled.nonEmpty,
        s"0.5 sample should be a proper nonempty subset: ${sampled.length}/${full.length}")
      spark.conf.unset(fracKey)
      // stride: every-frame decode yields a superset of the default
      // every-5th sample, with the default's rows intact
      spark.conf.set(strideKey, "1")
      val dense = Media.mediaFrames(spark, sf).collect()
      val defaults = fullFrames.map(r => (r.getLong(0), r.getLong(1))).toSet
      val denseKeys = dense.map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(defaults.subsetOf(denseKeys) && denseKeys.size > defaults.size)
      // default run unchanged after knob churn (bit-identical declared path)
      spark.conf.unset(strideKey)
      assert(Media.mediaTransform(spark, sf).collect().map(_.toString).toSeq ===
        full.map(_.toString).toSeq)
    } finally {
      spark.conf.unset(fracKey); spark.conf.unset(strideKey)
    }
  }
}
