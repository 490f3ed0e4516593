package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Relational
import graft.streaming.Streams

/** Streaming ≡ batch equivalence on the fixture (single micro-batch). */
class StreamsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("stream_window counts equal batch tumbling-window counts") {
    val stream = Streams.streamWindow(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val batch = Relational.tumblingWindow(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    assert(stream === batch)
  }

  test("stream_sessions equals batch sessionization") {
    val stream = Streams.streamSessions(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val batch = Relational.sessionize(spark, sf).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(stream === batch)
  }
}
