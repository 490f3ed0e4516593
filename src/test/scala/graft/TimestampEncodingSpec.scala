package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-encoding robustness for the events table.
  *
  * Round 7 proved the engine was coupled to ONE parquet timestamp
  * encoding: a driver regeneration switched `events.ts` from
  * TIMESTAMP(NANOS) to µs NTZ (`isAdjustedToUTC=false`) and six
  * event-time queries hard-failed at analysis. [[Tables.normalizeEvents]]
  * is the single seam that absorbs encoding drift; this spec pins its
  * contract: whatever encoding the fixture was written with — nanos read
  * back as INT64, µs NTZ, or µs LTZ — `Tables.events` yields the SAME
  * session-local TIMESTAMP instants, so every downstream consumer
  * (`unix_micros`, `withWatermark`, window frames) keeps working across
  * fixture regenerations.
  */
class TimestampEncodingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  // three fixed UTC instants, micro-aligned (the fixture guarantees this)
  private val micros = Seq(1700000000000000L, 1700000123456000L, 1700086400000500L)

  private def writeAndLoad(encode: String): Seq[Long] = {
    import spark.implicits._
    val dir = Files.createTempDirectory(s"graft_ts_$encode").toString
    val base = micros.zipWithIndex
      .map { case (us, i) => (i.toLong, us) }.toDF("event_id", "us")
    val df = encode match {
      // the legacy fixture: parquet TIMESTAMP(NANOS) comes back from the
      // nanosAsLong reader as a raw INT64 of epoch-nanos — write that
      // integer column directly to exercise the same LongType branch
      case "nanos_long" => base.select($"event_id", ($"us" * 1000L).as("ts"))
      case "micros_ntz" => base.select($"event_id",
        timestamp_micros($"us").cast(TimestampNTZType).as("ts"))
      case "micros_ltz" => base.select($"event_id", timestamp_micros($"us").as("ts"))
    }
    df.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val loaded = Tables.events(spark, dir)
    assert(loaded.schema("ts").dataType === TimestampType,
      s"$encode: normalizeEvents must yield session-local TIMESTAMP")
    loaded.orderBy("event_id").select(unix_micros($"ts"))
      .collect().map(_.getLong(0)).toSeq
  }

  test("all three observed parquet encodings normalize to identical LTZ instants") {
    assert(writeAndLoad("micros_ltz") === micros)
    assert(writeAndLoad("micros_ntz") === micros)
    assert(writeAndLoad("nanos_long") === micros)
  }

  test("the driver fixture itself round-trips through the normalizer") {
    val ev = Tables.events(spark, SparkTestSession.Sf)
    assert(ev.schema("ts").dataType === TimestampType)
    // unix_micros analyzes and executes (this is the exact call that broke
    // under NTZ) and yields sane epoch values
    val mn = ev.agg(min(unix_micros(col("ts")))).collect()(0).getLong(0)
    assert(mn > 0L)
  }
}
