package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (round 18, VERDICT r17 #2): decompose the two heaviest bench
  * rows — q_stream_lsh_admit / q_stream_lsh_ingest — into (a) the actual
  * computation, timed as BATCH twins of each stage, and (b) the streaming
  * engine/state machinery, which is whatever remains. The stateful anchor
  * (cal_stream_stateful) bounds only the minimal 2-lane cold start; this
  * names where the other ~2.5–3 s/query goes before any optimization is
  * attempted. Timings print per stage; run twice and read the second set
  * (first pays session warmup).
  *
  * runMain graft.streaming.LshProbe <sfDir>
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val s = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    graft.Engine.tune(s)
    def force(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def time(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"PROBE $label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    // warm the signature memo exactly like the bench warm list does
    graft.operators.Pipeline.minhashSigs(s, dir).count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      // batch twin of the stream side's map work: same per-row signature +
      // band fan-out expressions over a batch scan of the same slice
      val batchBands = {
        import graft.functions.{Fns, VectorExpressions}
        val docs = graft.Tables.documents(s, dir)
          .filter(pmod(col("doc_id"), lit(4L)) === 3L)
          .select(col("doc_id"),
            filter(Fns.tokensArr(col("text")), w => w =!= lit("")).as("t"))
          .filter(size(col("t")) >= 3) // cheap sig-null equivalent, like streamBands
          .select(col("doc_id"),
            transform(sequence(lit(0), size(col("t")) - 3),
              i => concat_ws(" ", element_at(col("t"), i + 1),
                                  element_at(col("t"), i + 2),
                                  element_at(col("t"), i + 3))).as("shs"))
          .select(col("doc_id"),
            VectorExpressions.minhashSig(col("shs")).as("sig"))
        docs.select(col("doc_id"),
            explode(transform(sequence(lit(0), lit(15)), b =>
              struct(b.as("b"),
                concat_ws(",", (0 until 4).map(r =>
                  element_at(col("sig"), b * 4 + r + 1).cast("string")): _*)
                  .as("key")))).as("bk"))
          .select(col("doc_id"), col("bk.b").as("b"), col("bk.key").as("key"))
      }
      time("batch: bands map work")(force(batchBands))
      val index = graft.operators.Pipeline.minhashBands(s, dir)
        .filter(pmod(col("doc_id"), lit(4L)) =!= 3L)
        .select(col("b"), col("key"), col("doc_id").as("index_doc"))
      time("batch: ingest probe join+agg") {
        force(batchBands.join(index, Seq("b", "key"))
          .groupBy("doc_id")
          .agg(count(lit(1)).as("n_band_hits"),
            min(col("index_doc")).as("first_match")))
      }
      time("batch: admit census join+agg") {
        // the admit census with stream_match pinned -1 (no stream hits):
        // same join/aggregation volume as the real post-drain census
        val drained = batchBands.withColumn("stream_match", lit(-1L))
        force(drained.join(index, Seq("b", "key"), "left")
          .groupBy("doc_id")
          .agg(count(col("index_doc")).as("n_index_hits"),
            countDistinct(when(col("stream_match") >= 0, col("b")))
              .as("n_stream_hits"),
            min(col("index_doc")).as("fi"),
            min(when(col("stream_match") >= 0, col("stream_match"))).as("fs")))
      }
      // the drain ALONE (stream source -> bands -> stateful carrier ->
      // parquet sink), no census: the full admit minus this and the
      // census is ~the stateful engine floor
      time("stream: admit drain only") {
        val (data, ckpt) = Streams.sinkDirs()
        force(LshStreams.streamLshAdmitAt(s, dir, data, ckpt,
          singleBatch = true).limit(0))
      }
      time("stream: full q_stream_lsh_ingest") {
        force(LshStreams.streamLshIngest(s, dir))
      }
      time("stream: full q_stream_lsh_admit") {
        force(LshStreams.streamLshAdmit(s, dir))
      }
      // state-lane sweep, same session so host epoch cancels
      for (lanes <- Seq(1, 2, 4, 8)) {
        s.conf.set("spark.graft.stream.lanes", lanes.toString)
        time(s"stream: admit lanes=$lanes") {
          force(LshStreams.streamLshAdmit(s, dir))
        }
      }
      s.conf.unset("spark.graft.stream.lanes")
    }
    s.stop()
  }
}
