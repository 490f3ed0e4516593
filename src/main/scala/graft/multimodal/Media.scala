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

  /** Build binary media columns from the documents fixture and run the
    * batched decode → metadata extraction pipeline. */
  def mediaMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val blobs = Tables.documents(s, dir)
      .select(col("doc_id"),
        encode(col("text"), "UTF-8").as("media"),
        when(pmod(col("doc_id"), lit(3)) === 0, "img")
          .when(pmod(col("doc_id"), lit(3)) === 1, "audio")
          .otherwise("video").as("kind"))
      .as[MediaBlob]
    // Batched per-partition decode: the grouped(64) mirrors an arrow batch
    // size; a real decoder would amortize codec init across the batch.
    val meta = blobs.mapPartitions { it =>
      it.grouped(64).flatMap { batch =>
        batch.iterator.map { b =>
          val (w, h) = decodeStub(b.media)
          MediaMeta(b.doc_id, b.media.length.toLong, w, h, b.kind)
        }
      }
    }
    meta.toDF().orderBy("doc_id")
  }
}
