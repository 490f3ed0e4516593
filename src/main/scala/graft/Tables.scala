package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Fixture loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries read through here so every scan is a columnar parquet read
  * with Catalyst predicate pushdown / column pruning intact. At cluster
  * scale these would be partitioned tables behind a catalog; the loader is
  * the single seam where that swap happens.
  */
object Tables {
  private def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, dir: String): DataFrame    = load(s, dir, "region")
  def nation(s: SparkSession, dir: String): DataFrame    = load(s, dir, "nation")
  def customer(s: SparkSession, dir: String): DataFrame  = load(s, dir, "customer")
  def supplier(s: SparkSession, dir: String): DataFrame  = load(s, dir, "supplier")
  def part(s: SparkSession, dir: String): DataFrame      = load(s, dir, "part")
  def orders(s: SparkSession, dir: String): DataFrame    = load(s, dir, "orders")
  def lineitem(s: SparkSession, dir: String): DataFrame  = load(s, dir, "lineitem")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark's reader rejects;
    * read it as a raw INT64 (legacy nanosAsLong) and convert. The fixture's
    * timestamps are micro-aligned (verified: epoch_ns % 1000 == 0) so the
    * ns→µs integer division is lossless and DuckDB sees identical instants. */
  def eventsRaw(s: SparkSession, dir: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    load(s, dir, "events")
  }

  /** Normalize whatever timestamp encoding the fixture was written with to
    * session-local TIMESTAMP (LTZ). Three encodings have been observed across
    * driver regenerations: parquet TIMESTAMP(NANOS) read as INT64 via
    * nanosAsLong; µs NTZ (isAdjustedToUTC=false → TimestampNTZType); and µs
    * LTZ. All sessions are pinned to UTC on both engines, so the NTZ→LTZ cast
    * is instant-preserving and oracle hashes are unchanged. */
  def normalizeEvents(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _                => raw
    }
  }

  def events(s: SparkSession, dir: String): DataFrame = normalizeEvents(eventsRaw(s, dir))
  def documents(s: SparkSession, dir: String): DataFrame = load(s, dir, "documents")
  def embeddings(s: SparkSession, dir: String): DataFrame = load(s, dir, "embeddings")
}

/** Session tuning applied once per session before queries run.
  * Runtime-settable confs only (the session is created by the driver).
  *
  * Deployment knob registry (all optional; every default is the
  * fixture/CI-safe behavior — each knob is documented in depth at its
  * implementation site):
  *
  *  - `spark.graft.checkpoint.reliable` + `spark.graft.checkpoint.dir`
  *    — reliable DFS checkpoints for multi-executor clusters instead of
  *    `localCheckpoint` ([[graft.util.Checkpoints]]).
  *  - `spark.graft.minhash.sigsPath` — persist the per-corpus MinHash
  *    signature table as a parquet index (committed + corpus-
  *    fingerprinted; invalid indexes rebuild atomically)
  *    ([[graft.operators.Pipeline.minhashSigs]]).
  *  - `spark.graft.stream.admitTtlMs` — processing-time TTL on the
  *    streaming admit index's carrier state; steady-state ingest only,
  *    DISABLE for backfill/replay ([[graft.streaming.Streams]]).
  *  - `spark.graft.stream.admitIndexPath` — durable parquet band index
  *    merged per admit drain; survives checkpoint wipes; compact with
  *    [[graft.streaming.AdmitIndex.compactAdmitIndex]] (optionally age-
  *    pruned — the TTL's complement).
  *  - `spark.graft.stream.lanes` — state-lane count for the banded
  *    streaming LSH flavors (default 8); enforced against the
  *    checkpoint contract ([[graft.streaming.LshStreams]]).
  *  - `spark.graft.ngram.dfCap` — stop-shingle document-frequency cap
  *    for the near-dup pair table; grow with corpus-wide duplication
  *    ([[graft.operators.Pipeline.maxShingleDf]]).
  *  - `spark.graft.zonemap.box` — the zone-map probe predicate;
  *    `spark.graft.zonemap.manifestPath` — persist the block manifest +
  *    laid-out table per corpus fingerprint (footer-stats-derived,
  *    generational); `spark.graft.zonemap.blockRows` — natural-layout
  *    block width, part of the manifest fingerprint
  *    ([[graft.operators.ZoneMaps]]).
  *  - `spark.graft.media.decodeFraction` / `spark.graft.media.frameStride`
  *    — multimodal decode budget: deterministic hash-sampled audit pass
  *    and video frame stride ([[graft.multimodal.Media]]).
  *  - `spark.graft.graph.memoPath` — persist the basket-graph memos
  *    (pairs/degrees/oriented/adj) per corpus fingerprint, plus — each
  *    in its own lazily-built store — the component label table
  *    (`<path>/components`) and PageRank's degree-attached edge list
  *    (`<path>/predges`); later sessions adopt instead of rebuilding
  *    ([[graft.operators.Graph]]).
  *  - `spark.graft.graph.joinPartitions` — explicit width for the graph
  *    kernels' giant array-SMJ joins and credit aggregation; when unset
  *    the persisted-memo path sizes it from table bytes against the
  *    per-task heap share ([[graft.operators.Graph.arrayJoinPartitions]]).
  *  - `spark.graft.ngram.observedCappedPpm` — OUTPUT, not input: the
  *    pair-memo build publishes its measured stop-shingle dropped
  *    fraction here (integer ppm) so deployments can gate on the df-cap
  *    recall cliff without scheduling the census query
  *    ([[graft.operators.Pipeline]]). Single-corpus-session assumption
  *    (ADVICE r16): the key is session-global and overwritten per
  *    pair-memo build — in a session touching several corpora it holds
  *    the LAST corpus's observation only; a multi-corpus deployment
  *    gate must sample it after each corpus's build (the stderr/logger
  *    warning still fires per build either way).
  *  - `spark.graft.ann.modelPath` — persist the trained k-means
  *    centroids + PQ codebooks per corpus fingerprint; assignments
  *    recompute map-side from the k-row model
  *    ([[graft.operators.Clustering]]).
  *  - `spark.sql.autoBroadcastJoinThreshold` — set here to 64 MB, the
  *    single un-hinted broadcast policy; match to executor memory on a
  *    real cluster. */
object Engine {
  def tune(spark: SparkSession): SparkSession = {
    // expose the custom codegen expressions to the SQL surface (once per
    // session — re-registration is a no-op guarded by a session conf flag)
    if (!spark.conf.getOption("graft.registered").contains("true")) {
      GraftFunctions.builders.foreach { case (name, builder) =>
        org.apache.spark.sql.GraftShims.registerFunction(spark, name, builder)
      }
      // programmatic twin of GraftExtensions' injectOptimizerRule: the
      // extraOptimizations hook accepts rules after session build
      if (!spark.experimental.extraOptimizations
            .contains(graft.plans.LevenshteinLengthGuard)) {
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ graft.plans.LevenshteinLengthGuard
      }
      spark.conf.set("graft.registered", "true")
    }
    val c = spark.conf
    // InferFiltersFromGenerate excluded (round 18, guide §4.4): the rule
    // copies each Generate's child expression into an inferred
    // `size(e) > 0 AND isnotnull(e)` filter below it. For this engine's
    // generators that child is a COMPUTED array (tokenize + shingle
    // chains — higher-order functions, CodegenFallback, no
    // subexpression elimination), so the "free" filter re-runs the
    // whole tokenize per row just to skip rows the Generate would emit
    // nothing for anyway (plan census: q_bm25 / q_collocations /
    // q_token_positions each carried a duplicated tokenize filter).
    // Row sets are identical with the rule on or off — exploding an
    // empty/null array produces no rows either way — so every hash is
    // unchanged; only the duplicated evaluation disappears.
    // merged, not overwritten: a deployment excluding other rules keeps
    // them (idempotent across the per-query tune calls)
    val inferFilters =
      "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
    val excluded = c.getOption("spark.sql.optimizer.excludedRules")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty)).getOrElse(Array.empty)
    if (!excluded.contains(inferFilters))
      c.set("spark.sql.optimizer.excludedRules",
        (excluded :+ inferFilters).mkString(","))
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // 64 MB: the ONE broadcast size policy for every un-hinted join.
    // Since round 9 only provably constant tables carry broadcast()
    // hints (nation/region/1-row aggregates — HintAudit enforces this);
    // everything else (customer/supplier/part, dedup drop/keep lists,
    // band indexes) broadcasts exactly when AQE measures it under this
    // cap and falls back to a shuffled join above it — size-bounded at
    // any corpus scale. On a real cluster this is the knob to match to
    // executor memory.
    c.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark
  }
}
