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

/** Multimodal column plumbing (north-star extension). The container has no
  * image/audio codecs, so `decodeStub` below is a clearly-marked
  * deterministic FAKE decode; everything around it — binary column
  * construction, typed Dataset encoders, batched `mapPartitions` execution
  * shape (the Scala analogue of arrow-batched UDFs), schema of the
  * decoded output — is real and tested. Swapping `decodeStub` for a JNI
  * codec is a one-function change. */
object Media {

  /** STUB: stands in for an image/audio decoder. Deterministic in the blob
    * length so the DuckDB oracle can reproduce it exactly. */
  def decodeStub(blob: Array[Byte]): (Long, Long) =
    (blob.length.toLong % 640 + 1, (blob.length.toLong * 7) % 480 + 1)

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

  /** Build binary media columns from the documents fixture and run the
    * batched decode → metadata extraction pipeline. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val in = blobs(s, dir)
    // Batched per-partition decode: the grouped(64) mirrors an arrow batch
    // size; a real decoder would amortize codec init across the batch.
    val meta = in.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { b =>
          val (w, h) = decodeStub(b.media)
          MediaMeta(b.doc_id, b.media.length.toLong, w, h, b.kind)
        }
      }
    }
    meta.toDF().orderBy("doc_id")
  }

  /** Per-frame expansion for video blobs: sampled frame indices (every
    * 5th of the stub-decoded frame count) exploded to one row per frame,
    * each with a deterministic frame fingerprint (stub: content checksum
    * mixed with the frame index) — the fan-out a video pipeline runs
    * before per-frame feature extraction, with the same batched
    * mapPartitions execution shape as the decode. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frames = blobs(s, dir).filter(_.kind == "video").mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.flatMap { b =>
          val n = b.media.length.toLong
          val nFrames = n % 30 + 1
          var sum = 0L
          var i = 0
          while (i < b.media.length) { sum = (sum + (b.media(i) & 0xff)) % 1000000007L; i += 1 }
          (0L until nFrames by 5L).map { f =>
            (b.doc_id, f, (sum * (f + 1) + f) % 1000000007L)
          }
        }
      }
    }.toDF("doc_id", "frame_no", "frame_fp")
    frames.orderBy("doc_id", "frame_no")
  }

  /** Transform stage over the decoded media: resize to fit a 224×224 box
    * (aspect-preserving integer scale — STUB standing in for a real
    * resampler), sample every 5th frame for video, and fold a content
    * checksum (byte sum mod 1e9+7) as the feature-extraction stand-in.
    * All arithmetic is integer so the DuckDB oracle reproduces it. */
  def mediaTransform(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val out = blobs(s, dir).mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { b =>
          val n = b.media.length.toLong
          val (w, h) = decodeStub(b.media)
          val maxDim = math.max(w, h)
          val (ow, oh) =
            if (maxDim <= 224) (w, h)
            else (math.max(w * 224 / maxDim, 1L), math.max(h * 224 / maxDim, 1L))
          val frames = if (b.kind == "video") ((n % 30 + 1) + 4) / 5 else 1L
          var sum = 0L
          var i = 0
          while (i < b.media.length) { sum = (sum + (b.media(i) & 0xff)) % 1000000007L; i += 1 }
          MediaFeature(b.doc_id, b.kind, ow, oh, frames, sum)
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
