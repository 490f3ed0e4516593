package graft

/** DuckDB oracle SQL for every oracle-able query in [[SparkEntry.queries]]
  * (driver contract: same parquet tables, UTC, hash compare after sorting
  * columns by name — SURVEY §5).
  *
  * Parity rules used throughout (see graft.functions.Fns):
  *  - identical column aliases and ORDER BY on both sides;
  *  - double sums routed through DECIMAL(18,x) then cast back to double →
  *    bit-identical, aggregation-order-independent;
  *  - dot products / norms as strict left-to-right folds on both sides;
  *  - integer outputs as BIGINT on both sides;
  *  - the polynomial hash (base 31 / 131, mod 1e9+7 / 1e9+9) reproduced
  *    with list_reduce.
  */
object Oracles {

  private val Toks =
    "SELECT doc_id, unnest(regexp_split_to_array(text,'[^a-zA-Z]+')) AS word FROM documents"

  private val TokList =
    "SELECT doc_id, lang, text, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'), w -> w <> '') AS t FROM documents"

  /** Portable polynomial rolling hash of a string expression, as SQL
    * (per-codepoint; equals the engine's byte-based PolyHashExpr on the
    * ASCII fixture corpus). */
  private def polyHashSql(e: String, base: Int = 31, mod: Long = 1000000007L): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
    s"list_transform(regexp_extract_all($e,'.'), c -> CAST(ascii(c) AS BIGINT))), " +
    s"(h,c) -> (h*$base+c) % $mod)"

  private def sumD(col: String, scale: Int, alias: String): String =
    s"CAST(sum(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE) AS $alias"

  /** The HLL rank CASE chain (1 + trailing-zero count of the hash
    * suffix, capped at 23) — the same 22-branch integer expression the
    * engine evaluates ([[graft.operators.Pipeline]]'s hllRho). */
  private def hllRhoSql(suf: String): String =
    s"CASE WHEN $suf = 0 THEN 23 " +
      (1 to 22).map(i =>
        s"WHEN $suf % ${1L << i} = ${1L << (i - 1)} THEN $i").mkString(" ") +
      " ELSE 23 END"

  /** VALUES rows reproducing [[graft.operators.LshPlanes]]' deterministic
    * hyperplanes. Every component is an exactly-representable double
    * ((m−500)/512), so the SQL literal → double conversion is bit-exact
    * and the sign tests agree with the engine on every vector. */
  private def lshPlaneRows: String = {
    import graft.operators.LshPlanes
    (0 until LshPlanes.NTables * LshPlanes.PlanesPerTable).map { p =>
      val t = p / LshPlanes.PlanesPerTable
      val j = p % LshPlanes.PlanesPerTable
      s"($t, $j, [${LshPlanes.planeValues(p).mkString(", ")}])"
    }.mkString(",\n")
  }

  /** Unrolled Lloyd-iteration CTE prefix reproducing
    * [[graft.operators.Clustering]] in exact integer arithmetic: q holds
    * the int64-quantized vectors, k0 the seed centroids (vec_id < K),
    * then per iteration t: a_t/b_t assign each vector to its argmin-
    * distance centroid (ties by cid), s_t sums each dimension per
    * cluster, and k_t rebuilds centroids via the same truncate-toward-
    * zero division as the engine ((sx − sx % n)/n — both engines' % takes
    * the dividend's sign). Ends with the final assignment b{Iters+1}
    * against k{Iters}. Shared by the q_kmeans and q_semdedup oracles. */
  private def kmeansCtes: String = {
    val k = graft.operators.Clustering.K
    val d1 = 65 // embedding dim + 1 (1-based, exclusive range end)
    def assignCte(t: Int): String =
      s"a$t AS (SELECT v.vec_id, v.qv, c.cid,\n" +
      s"    CAST(list_sum(list_transform(range(1, $d1),\n" +
      s"      i -> (v.qv[i]-c.cv[i])*(v.qv[i]-c.cv[i]))) AS BIGINT) AS dist\n" +
      s"  FROM q v, k${t - 1} c),\n" +
      s"b$t AS (SELECT vec_id, qv, cid, dist,\n" +
      s"    row_number() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS r FROM a$t)"
    val steps = (1 to KmIters).map { t =>
      assignCte(t) + ",\n" +
      s"s$t AS (SELECT cid, i, CAST(sum(qv[i]) AS BIGINT) AS sx,\n" +
      s"    CAST(count(*) AS BIGINT) AS n\n" +
      s"  FROM b$t, range(1, $d1) g$t(i) WHERE r = 1 GROUP BY cid, i),\n" +
      s"k$t AS (SELECT cid, list(CAST((sx - sx % n) / n AS BIGINT) ORDER BY i) AS cv\n" +
      s"  FROM s$t GROUP BY cid)"
    }.mkString(",\n")
    "WITH q AS (SELECT vec_id, list_transform(embedding,\n" +
    "    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv\n" +
    "  FROM embeddings),\n" +
    s"k0 AS (SELECT vec_id AS cid, qv AS cv FROM q WHERE vec_id < $k),\n" +
    steps + ",\n" +
    assignCte(KmIters + 1)
  }
  private def KmIters: Int = graft.operators.Clustering.Iters

  /** [[kmeansCtes]] extended to the within-cluster scored pair table `p`
    * (lower-id kept_by, higher-id vec_id, left-to-right-fold cosine) —
    * the shared body of q_semdedup and q_semdedup_sweep. */
  private def semDedupPairCtes: String =
    s"""$kmeansCtes,
       |asg AS (SELECT vec_id, cid FROM b${KmIters + 1} WHERE r = 1),
       |ed AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |nn AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM ed),
       |m AS (SELECT a.vec_id, a.cid, nn.v, nn.nrm
       |  FROM asg a JOIN nn ON a.vec_id = nn.vec_id),
       |p AS (SELECT y.vec_id AS vec_id, y.cid AS cid, x.vec_id AS kept_by,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(x.v, (e,i) -> e * y.v[i])), (s1,t1) -> s1+t1) / (x.nrm * y.nrm) AS cos
       |  FROM m x JOIN m y ON x.cid = y.cid AND x.vec_id < y.vec_id)""".stripMargin

  /** Unrolled product-quantization Lloyd prefix — [[kmeansCtes]] with a
    * subspace key m threaded through every CTE: psub holds each vector's
    * [[graft.operators.Clustering.PqM]] int64 subvectors, pk0 the per-
    * subspace seeds (vec_id < K), then per iteration the same assign /
    * sum / truncated-mean recenter as the engine, all keyed by (m, cid).
    * Ends with the final assignment pb{Iters+1} against pk{Iters}. */
  private def pqCtes: String = {
    val k = graft.operators.Clustering.K
    val m = graft.operators.Clustering.PqM
    val sd = graft.operators.Clustering.PqSubD
    val d1 = sd + 1 // subspace dim + 1 (1-based, exclusive range end)
    def assignCte(t: Int): String =
      s"pa$t AS (SELECT v.vec_id, v.m, v.qsub, c.cid,\n" +
      s"    CAST(list_sum(list_transform(range(1, $d1),\n" +
      s"      i -> (v.qsub[i]-c.cv[i])*(v.qsub[i]-c.cv[i]))) AS BIGINT) AS dist\n" +
      s"  FROM psub v JOIN pk${t - 1} c ON v.m = c.m),\n" +
      s"pb$t AS (SELECT vec_id, m, qsub, cid, dist,\n" +
      s"    row_number() OVER (PARTITION BY vec_id, m ORDER BY dist, cid) AS r FROM pa$t)"
    val steps = (1 to KmIters).map { t =>
      assignCte(t) + ",\n" +
      s"ps$t AS (SELECT m, cid, i, CAST(sum(qsub[i]) AS BIGINT) AS sx,\n" +
      s"    CAST(count(*) AS BIGINT) AS n\n" +
      s"  FROM pb$t, range(1, $d1) pg$t(i) WHERE r = 1 GROUP BY m, cid, i),\n" +
      s"pk$t AS (SELECT m, cid, list(CAST((sx - sx % n) / n AS BIGINT) ORDER BY i) AS cv\n" +
      s"  FROM ps$t GROUP BY m, cid)"
    }.mkString(",\n")
    "WITH q AS (SELECT vec_id, list_transform(embedding,\n" +
    "    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv\n" +
    "  FROM embeddings),\n" +
    s"psub AS (SELECT vec_id, m, list_slice(qv, m*$sd+1, (m+1)*$sd) AS qsub\n" +
    s"  FROM q, (SELECT unnest(range(0, $m)) AS m) mm),\n" +
    s"pk0 AS (SELECT m, vec_id AS cid, qsub AS cv FROM psub WHERE vec_id < $k),\n" +
    steps + ",\n" +
    assignCte(KmIters + 1)
  }

  /** CDC chunk rows (no ordering) — shared by the q_cdc_chunks and
    * q_cdc_dedup oracles. Window hashes are recomputed per position
    * (O(n·w)); the engine's incremental rolling update produces the same
    * values. Nested-WITH form so it can sit inside a CTE. */
  private val CdcChunkRowsSql: String =
    s"""WITH d0 AS (SELECT doc_id, text, len(text) AS n FROM documents
       |  WHERE len(text) > 0),
       |b0 AS (SELECT doc_id, text, n,
       |    list_filter(range(16, n + 1), i -> i < n AND
       |      (${polyHashSql("substr(text, CAST(i - 15 AS INT), 16)")}) % 32 = 0) AS bs
       |  FROM d0),
       |c0 AS (SELECT doc_id, text,
       |    list_prepend(CAST(1 AS BIGINT), list_transform(bs, x -> x + 1)) AS ss,
       |    list_append(bs, CAST(n AS BIGINT)) AS es FROM b0),
       |e0 AS (SELECT doc_id, text, ss, es,
       |    unnest(range(1, len(ss) + 1)) AS k FROM c0)
       |SELECT doc_id, CAST(k - 1 AS BIGINT) AS chunk_idx,
       |  CAST(ss[k] AS BIGINT) AS chunk_start,
       |  CAST(es[k] - ss[k] + 1 AS BIGINT) AS chunk_len,
       |  ${polyHashSql("substr(text, CAST(ss[k] AS INT), CAST(es[k] - ss[k] + 1 AS INT))")} AS chunk_hash
       |FROM e0""".stripMargin

  /** q_dedup_ngram, shared verbatim by the q_dedup_clusters oracle. */
  private val DedupNgramSql: String =
    s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
       |    w -> w <> '') AS t FROM documents),
       |shs AS (SELECT DISTINCT doc_id, h FROM (
       |  SELECT doc_id, ${polyHashSql("sh")} AS h FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) y) z),
       |rare AS (SELECT h FROM (SELECT h, count(*) AS df FROM shs GROUP BY h) f
       |  WHERE df <= 100),
       |shr AS (SELECT s1.doc_id, s1.h FROM shs s1 JOIN rare USING (h)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shs GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM shr a JOIN shr b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |    CAST(common AS DOUBLE)/CAST(sa.sz + sb.sz - common AS DOUBLE) AS jaccard
       |  FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id) j
       |WHERE jaccard >= 0.2 ORDER BY doc_a, doc_b""".stripMargin

  /** q_dedup_clusters, shared verbatim by the q_dedup_apply oracle. */
  private val DedupClustersSql: String =
    s"""WITH RECURSIVE np AS (SELECT doc_a, doc_b FROM ($DedupNgramSql) q),
       |edges AS (SELECT doc_a AS a, doc_b AS b FROM np
       |  UNION SELECT doc_b, doc_a FROM np),
       |verts AS (SELECT DISTINCT a AS v FROM edges),
       |reach(v, lbl) AS (
       |  SELECT v, v FROM verts
       |  UNION
       |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.v)
       |SELECT v AS doc_id, min(lbl) AS cluster_id FROM reach
       |GROUP BY v ORDER BY doc_id""".stripMargin

  /** q_dedup_containment — same shingle/pair CTEs as DedupNgramSql, scored
    * by the overlap coefficient common/min(|A|,|B|) instead of Jaccard. */
  private val DedupContainmentSql: String =
    s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
       |    w -> w <> '') AS t FROM documents),
       |shs AS (SELECT DISTINCT doc_id, h FROM (
       |  SELECT doc_id, ${polyHashSql("sh")} AS h FROM (
       |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
       |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) y) z),
       |rare AS (SELECT h FROM (SELECT h, count(*) AS df FROM shs GROUP BY h) f
       |  WHERE df <= 100),
       |shr AS (SELECT s1.doc_id, s1.h FROM shs s1 JOIN rare USING (h)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shs GROUP BY doc_id),
       |pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM shr a JOIN shr b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)
       |SELECT doc_a, doc_b, common, overlap FROM (
       |  SELECT doc_a, doc_b, CAST(common AS BIGINT) AS common,
       |    CAST(common AS DOUBLE)/CAST(least(sa.sz, sb.sz) AS DOUBLE) AS overlap
       |  FROM pairs JOIN sizes sa ON doc_a = sa.doc_id JOIN sizes sb ON doc_b = sb.doc_id) j
       |WHERE overlap >= 0.6 ORDER BY doc_a, doc_b""".stripMargin

  /** Shared minhash CTE chain (shingle sets → two polynomial hashes → 64
    * permutation minima → LSH bands → candidate pairs → sizes → common
    * counts): the full body of q_dedup_minhash up to its final SELECT,
    * extended by q_minhash_error with the signature-agreement estimator. */
  private val MinhashCtes: String =
    s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
       |    w -> w <> '') AS t FROM documents),
       |shs AS (SELECT DISTINCT doc_id, sh FROM (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
       |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) z),
       |hashed AS (SELECT doc_id, ${polyHashSql("sh")} AS h1,
       |  ${polyHashSql("sh", 131, 1000000009L)} AS h2 FROM shs),
       |perms AS (SELECT doc_id, i, min((h1 + i*h2) % 2147483647) AS mv
       |  FROM hashed, (SELECT unnest(range(0,64)) AS i) ii GROUP BY doc_id, i),
       |bands AS (SELECT doc_id, i // 4 AS b,
       |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i) AS key
       |  FROM perms GROUP BY doc_id, i // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands a JOIN bands b ON a.b = b.b AND a.key = b.key AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM shs GROUP BY doc_id),
       |common AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
       |  FROM shs a JOIN shs b ON a.sh = b.sh AND a.doc_id < b.doc_id
       |  JOIN cand c ON c.doc_a = a.doc_id AND c.doc_b = b.doc_id
       |  GROUP BY a.doc_id, b.doc_id)""".stripMargin

  /** Quality-score CTEs (d → s → sc), shared by q_quality_score and the
    * composed q_curation oracle. */
  private val QualityScoreCtes: String =
    s"""d AS ($TokList),
       |s AS (SELECT doc_id,
       |  CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(list_filter(t, w -> w IN ('the','a','of','and','to','in','is'))) AS BIGINT) AS n_stop,
       |  CAST(length(text) - length(regexp_replace(text,'[.,]','','g')) AS BIGINT) AS n_punct,
       |  CAST(length(text) AS BIGINT) AS n_chars FROM d),
       |sc AS (SELECT doc_id, n_tokens, n_stop, n_punct,
       |  (CASE WHEN n_tokens BETWEEN 20 AND 10000 THEN 1 ELSE 0 END) * CAST(0.5 AS DOUBLE)
       |  + CASE WHEN CAST(n_stop AS DOUBLE)/n_tokens > 0.01 THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END
       |  + CASE WHEN CAST(n_punct AS DOUBLE)/n_chars < 0.2 THEN CAST(0.25 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS score
       |FROM s)""".stripMargin

  /** Unrolled BPE-training rounds reproducing
    * [[graft.operators.Pipeline.bpeTrain]]: v0 is the char-split
    * vocabulary; per round t, p_t counts adjacent symbol pairs weighted
    * by word frequency, m_t adopts the top pair (ties by (a, b) — for
    * space-free symbols identical to the engine's joined-pair-string
    * tie-break), and e/f/g/h/q/d/v_t apply it with the same relational
    * greedy rule: consecutive matched positions form runs (i − rn
    * constant), even offsets within a run are taken, a taken position
    * emits a||b and drops its successor. */
  private def bpeCtes(rounds: Int): String = {
    val finalSel = (1 to rounds).map(t =>
      s"SELECT CAST($t AS BIGINT) AS \"round\", a, b, a || b AS merged, cnt FROM m$t")
      .mkString("\n", "\nUNION ALL\n", "")
    s"""${bpePrefix(rounds)}$finalSel
       |ORDER BY "round"""".stripMargin
  }

  /** Apply-side companion of [[bpeCtes]]: per-round weighted token
    * totals and the exact ppm compression vs round 0 (characters). */
  private def bpeApplyCtes(rounds: Int): String = {
    val tot = (0 to rounds).map(t =>
      s"SELECT $t AS r, CAST(coalesce(sum(n * len(toks)), 0) AS BIGINT) AS total_tokens FROM v$t")
      .mkString("\nUNION ALL\n")
    s"""${bpePrefix(rounds)},
       |tot AS ($tot),
       |t0 AS (SELECT total_tokens AS base FROM tot WHERE r = 0)
       |SELECT CAST(r AS BIGINT) AS "round", total_tokens,
       |  CASE WHEN base > 0
       |    THEN CAST(total_tokens * 1000000 // base AS BIGINT)
       |    ELSE CAST(0 AS BIGINT) END AS ratio_ppm
       |FROM tot, t0 ORDER BY "round"""".stripMargin
  }

  private def bpePrefix(rounds: Int): String = {
    def roundCtes(t: Int): String = {
      val prev = s"v${t - 1}"
      s"""p$t AS (SELECT pr.a AS a, pr.b AS b, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT n, unnest(list_transform(range(1, greatest(len(toks), 1)),
         |      i -> {'a': toks[i], 'b': toks[i+1]})) AS pr FROM $prev) sp$t
         |  GROUP BY 1, 2),
         |m$t AS (SELECT a, b, cnt FROM p$t ORDER BY cnt DESC, a, b LIMIT 1),
         |e$t AS (SELECT word, n, u.i AS i, u.tok AS tok, u.nxt AS nxt
         |  FROM (SELECT word, n, unnest(list_transform(toks,
         |      (x, ii) -> {'i': ii, 'tok': x, 'nxt': toks[ii+1]})) AS u
         |    FROM $prev) se$t),
         |f$t AS (SELECT e.*, m.a, m.b,
         |    (tok = m.a AND nxt IS NOT NULL AND nxt = m.b) AS mt
         |  FROM e$t e, m$t m),
         |g$t AS (SELECT *, sum(CASE WHEN mt THEN 1 ELSE 0 END)
         |    OVER (PARTITION BY word ORDER BY i) AS rn FROM f$t),
         |h$t AS (SELECT *, CASE WHEN mt THEN i - rn END AS grp FROM g$t),
         |q$t AS (SELECT *, mt AND ((rn - min(CASE WHEN mt THEN rn END)
         |    OVER (PARTITION BY word, grp)) % 2 = 0) AS taken FROM h$t),
         |d$t AS (SELECT *, coalesce(lag(taken, 1, false)
         |    OVER (PARTITION BY word ORDER BY i), false) AS dropped FROM q$t),
         |v$t AS (SELECT word, n,
         |    list(CASE WHEN taken THEN a || b ELSE tok END ORDER BY i) AS toks
         |  FROM d$t WHERE NOT dropped GROUP BY word, n)""".stripMargin
    }
    s"""WITH wc AS (SELECT word, CAST(count(*) AS BIGINT) AS n
       |  FROM ($Toks) tk WHERE word <> '' GROUP BY word),
       |v0 AS (SELECT word, n, regexp_extract_all(word, '.') AS toks FROM wc),
       |${(1 to rounds).map(roundCtes).mkString(",\n")}""".stripMargin
  }

  /** Per-(label, dimension) truncated-mean centroid cells (q/s/c CTEs)
    * reproducing [[graft.operators.Clustering.labelCentroidCells]] —
    * shared by the q_label_centroids summary and the q_eval_confusion
    * classifier, mirroring the shared Scala helper. */
  private lazy val labelCentroidCellCtes: String =
    s"""q AS (SELECT vec_id, label, list_transform(embedding,
       |    x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
       |  FROM embeddings),
       |s AS (SELECT label, i, CAST(sum(qv[i]) AS BIGINT) AS sx,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM q, range(1, 65) g(i) GROUP BY label, i),
       |c AS (SELECT label, i, n, CAST((sx - sx % n) / n AS BIGINT) AS c
       |  FROM s)""".stripMargin

  /** Prototype-distance CTE chain (cl/qt/d) reproducing
    * [[graft.operators.Evaluation.protoDistances]] — the labeled
    * vectors × per-label centroids exact integer squared distances,
    * shared by the q_eval_confusion, q_kappa, q_calibration, and
    * q_silhouette oracles (mirroring the shared Scala helper). */
  private lazy val protoDistCtes: String =
    s"""$labelCentroidCellCtes,
       |cl AS (SELECT CAST(label AS BIGINT) AS plabel, list(c ORDER BY i) AS cv
       |  FROM c GROUP BY label),
       |qt AS (SELECT vec_id, CAST(label AS BIGINT) AS true_label, qv FROM q),
       |d AS (SELECT qt.vec_id, qt.true_label, cl.plabel,
       |    CAST(list_sum(list_transform(range(1, 65),
       |      i -> (qv[i]-cv[i])*(qv[i]-cv[i]))) AS BIGINT) AS dist
       |  FROM qt, cl)""".stripMargin

  /** Exact brute-force cosine top-10 (shared verbatim by the
    * q_similarity_topk entry and, as a CTE, the q_ann_recall eval). */
  private lazy val changepointSql: String =
    s"""WITH cells AS (SELECT date_trunc('hour', ts) AS h,
       |    CAST(count(*) AS BIGINT) AS c FROM events GROUP BY 1),
       |t AS (SELECT CAST(sum(c) AS BIGINT) AS s,
       |    CAST(count(*) AS BIGINT) AS hh FROM cells),
       |sc AS (SELECT h, s, hh,
       |    CAST(row_number() OVER (ORDER BY h) AS BIGINT) AS idx,
       |    CAST(sum(c) OVER (ORDER BY h
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sh
       |  FROM cells, t),
       |d AS (SELECT *,
       |    abs(CAST(sh AS HUGEINT) * hh - CAST(idx AS HUGEINT) * s) AS dev
       |  FROM sc),
       |b AS (SELECT * FROM d ORDER BY dev DESC, idx LIMIT 1)
       |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS split_hour,
       |  sh AS n_before, s - sh AS n_after,
       |  CAST(sh * 1000 // idx AS BIGINT) AS rate_before_milli,
       |  CAST(CASE WHEN hh = idx THEN 0
       |    ELSE (s - sh) * 1000 // (hh - idx) END AS BIGINT)
       |    AS rate_after_milli,
       |  CAST(dev * 1000000 // (CAST(s AS HUGEINT) * hh) AS BIGINT) AS dev_ppm
       |FROM b""".stripMargin

  private lazy val similarityTopkSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM e),
       |sc AS (SELECT p.vec_id AS probe_id, x.vec_id AS vec_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(p.v, (a,i) -> a * x.v[i])), (s1,t1) -> s1+t1) / (p.nrm * x.nrm) AS cos
       |  FROM n p JOIN n x ON x.vec_id <> p.vec_id WHERE p.vec_id < 5),
       |r AS (SELECT probe_id, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT probe_id, vec_id, cos, rank FROM r WHERE rank <= 10
       |ORDER BY probe_id, rank""".stripMargin

  /** Multi-table LSH ANN top-10 with regenerated hyperplanes (shared by
    * the q_ann_lsh entry and, as a CTE, the q_ann_recall eval). */
  private lazy val annLshSql: String =
    s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
       |  FROM embeddings),
       |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM e),
       |planes(t, j, pv) AS (VALUES
       |$lshPlaneRows),
       |dots AS (SELECT vec_id, t, j,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(n.v, (x,i) -> x * pv[i])), (a,b) -> a+b) AS dp
       |  FROM n, planes),
       |eb AS (SELECT vec_id, t,
       |    CAST(sum(CASE WHEN dp > 0 THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
       |  FROM dots GROUP BY vec_id, t),
       |probes AS (SELECT vec_id AS probe_id, t, bucket FROM eb WHERE vec_id < 5),
       |cand AS (SELECT DISTINCT p.probe_id, x.vec_id
       |  FROM probes p JOIN eb x ON x.t = p.t AND x.bucket = p.bucket
       |  WHERE x.vec_id <> p.probe_id),
       |sc AS (SELECT c.probe_id, c.vec_id,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(a.v, (x,i) -> x * b.v[i])), (s1,t1) -> s1+t1) / (a.nrm * b.nrm) AS cos
       |  FROM cand c JOIN n a ON c.probe_id = a.vec_id JOIN n b ON c.vec_id = b.vec_id),
       |r AS (SELECT probe_id, vec_id, cos,
       |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
       |  FROM sc)
       |SELECT probe_id, vec_id, cos, rank FROM r WHERE rank <= 10
       |ORDER BY probe_id, rank""".stripMargin

  val sql: Map[String, String] = Map(

    // ------------------------------------------------------ MR app suite
    "q_wordcount" ->
      s"""SELECT word, count(*) AS cnt FROM ($Toks) t
         |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    // dirty-CSV permissive ingest: the corrupt rows are known by
    // construction (key ≡ 5 mod 11), so the oracle recomputes the
    // good/corrupt census and the surviving decimal sum from the base
    "q_csv_dirty" ->
      s"""SELECT CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN c_custkey % 11 <> 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
         |  CAST(sum(CASE WHEN c_custkey % 11 = 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupt,
         |  CAST(sum(CASE WHEN c_custkey % 11 <> 5
         |    THEN CAST(c_acctbal AS DECIMAL(18,2)) END) AS DOUBLE) AS sum_balance
         |FROM customer""".stripMargin,

    // the V2 connector roundtrip: wordcount → "key value" sink →
    // graftkv source with a pushed prefix filter; the oracle recomputes
    // the filtered counts from the base table
    "q_kv_source" ->
      s"""SELECT word AS key, count(*) AS cnt FROM ($Toks) t
         |WHERE word LIKE 's%' GROUP BY word ORDER BY key""".stripMargin,

    "q_inverted_index" ->
      s"""WITH pairs AS (SELECT DISTINCT word, CAST(doc_id AS VARCHAR) AS doc
         |  FROM ($Toks) t WHERE word <> '')
         |SELECT word, count(*) AS n_docs, string_agg(doc, ',' ORDER BY doc) AS docs
         |FROM pairs GROUP BY word ORDER BY word""".stripMargin,

    "q_sorted_concat" ->
      s"""WITH kv AS (
         |  SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
         |  UNION ALL SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
         |  UNION ALL SELECT 'c', CAST(n_chars AS VARCHAR) FROM documents
         |  UNION ALL SELECT 'd', 'xyzzy' FROM documents)
         |SELECT key, string_agg(value, ' ' ORDER BY value) AS cval
         |FROM kv GROUP BY key ORDER BY key""".stripMargin,

    "q_tokens_per_doc" ->
      s"""SELECT doc_id, count(*) AS n_tokens FROM ($Toks) t
         |WHERE word <> '' GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_distinct_words" ->
      s"SELECT DISTINCT word FROM ($Toks) t WHERE word <> '' ORDER BY word",

    // the reference's FNV-1a reduce-partition assignment (worker.go:22-26),
    // 32-bit wrap emulated exactly in int64: (xor(h,c) * prime) % 2^32
    "q_partition_diag" ->
      s"""WITH t AS (SELECT word FROM ($Toks) z WHERE word <> ''),
         |h AS (SELECT word, list_reduce(list_prepend(CAST(2166136261 AS BIGINT),
         |    list_transform(regexp_extract_all(word,'.'), c -> CAST(ascii(c) AS BIGINT))),
         |    (h, c) -> (xor(h, c) * 16777619) % 4294967296) AS fh FROM t)
         |SELECT (fh & 2147483647) % 10 AS partition, count(*) AS n_tokens,
         |  count(DISTINCT word) AS n_words
         |FROM h GROUP BY 1 ORDER BY partition""".stripMargin,

    // non-ASCII synthesized deterministically (translate a→ä, e→é) so the
    // \p{L} Unicode tokenizer is oracle-checked, not trusted
    "q_unicode_wordcount" ->
      s"""SELECT word, count(*) AS cnt FROM (
         |  SELECT unnest(regexp_split_to_array(translate(text,'ae','äé'),
         |    '[^\\p{L}]+')) AS word FROM documents) t
         |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    // the whole-file-scan → wordcount → "key value" sink → re-read path
    // touches only docs 0..49; counts come back through the text sink as
    // strings and are cast to BIGINT on both sides
    "q_text_roundtrip" ->
      s"""SELECT word, count(*) AS cnt FROM (
         |  SELECT unnest(regexp_split_to_array(text,'[^a-zA-Z]+')) AS word
         |  FROM documents WHERE doc_id < 50) t
         |WHERE word <> '' GROUP BY word ORDER BY word""".stripMargin,

    "q_sort_docs" ->
      "SELECT doc_id, lang, source, n_chars FROM documents ORDER BY lang, n_chars DESC, doc_id",

    "q_union_names" ->
      s"""SELECT c_name AS name, 'customer' AS kind FROM customer
         |UNION ALL SELECT s_name, 'supplier' FROM supplier ORDER BY kind, name""".stripMargin,

    // -------------------------------------------- MR API (plugin contract)
    "q_mr_wordcount" ->
      s"""SELECT word AS key, CAST(count(*) AS VARCHAR) AS value FROM ($Toks) t
         |WHERE word <> '' GROUP BY word ORDER BY key""".stripMargin,

    "q_mr_inverted_index" ->
      s"""WITH pairs AS (SELECT DISTINCT word, CAST(doc_id AS VARCHAR) AS doc
         |  FROM ($Toks) t WHERE word <> '')
         |SELECT word AS key,
         |  CAST(count(*) AS VARCHAR) || ' ' || string_agg(doc, ',' ORDER BY doc) AS value
         |FROM pairs GROUP BY word ORDER BY key""".stripMargin,

    "q_mr_grep" ->
      s"""WITH pairs AS (SELECT DISTINCT word, CAST(doc_id AS VARCHAR) AS doc
         |  FROM ($Toks) t
         |  WHERE word <> '' AND regexp_matches(word, 's[a-z]*a[a-z]+'))
         |SELECT word AS key,
         |  CAST(count(*) AS VARCHAR) || ' ' || string_agg(doc, ',' ORDER BY doc) AS value
         |FROM pairs GROUP BY word ORDER BY key""".stripMargin,

    "q_mr_cogroup" ->
      s"""WITH l AS (SELECT CAST(c_custkey AS VARCHAR) AS key, c_name FROM customer),
         |r AS (SELECT CAST(o_custkey AS VARCHAR) AS key,
         |        CAST(year(o_orderdate) AS VARCHAR) AS y FROM orders),
         |n AS (SELECT key, count(*) AS cnt FROM r GROUP BY key),
         |ys AS (SELECT key, string_agg(y, ',' ORDER BY y) AS years
         |       FROM (SELECT DISTINCT key, y FROM r) d GROUP BY key)
         |SELECT COALESCE(l.key, n.key) AS key,
         |  COALESCE(c_name,'') || '|' || COALESCE(CAST(cnt AS VARCHAR),'0')
         |    || '|' || COALESCE(years,'') AS value
         |FROM l FULL JOIN n ON l.key = n.key LEFT JOIN ys ON COALESCE(l.key, n.key) = ys.key
         |ORDER BY key""".stripMargin,

    // connector→plugin-API loop: wordcount and doc-frequency kv layouts
    // (both via the graftkv V2 sink/source) co-reduced per word; both
    // sides rebuilt from the base table here
    "q_mr_kv_cogroup" ->
      s"""WITH wc AS (SELECT word AS key, CAST(count(*) AS VARCHAR) AS cnt
         |  FROM ($Toks) t WHERE word <> '' GROUP BY word),
         |df AS (SELECT word AS key, CAST(count(*) AS VARCHAR) AS df
         |  FROM (SELECT DISTINCT word, doc_id FROM ($Toks) t WHERE word <> '') d
         |  GROUP BY word)
         |SELECT COALESCE(wc.key, df.key) AS key,
         |  COALESCE(cnt,'') || '|' || COALESCE(df,'') AS value
         |FROM wc FULL JOIN df ON wc.key = df.key ORDER BY key""".stripMargin,

    "q_mr_sorted_concat" ->
      s"""WITH kv AS (
         |  SELECT 'a' AS key, CAST(doc_id AS VARCHAR) AS value FROM documents
         |  UNION ALL SELECT 'b', CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
         |  UNION ALL SELECT 'c', CAST(length(text) AS VARCHAR) FROM documents
         |  UNION ALL SELECT 'd', 'xyzzy' FROM documents)
         |SELECT key, string_agg(value, ' ' ORDER BY value) AS value
         |FROM kv GROUP BY key ORDER BY key""".stripMargin,

    // ------------------------------------------------------- relational
    "q_grouped_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumD("l_quantity", 2, "sum_qty")},
         |  ${sumD("l_extendedprice", 2, "sum_base_price")},
         |  ${sumD("l_extendedprice*(1-l_discount)", 6, "sum_disc_price")},
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_filter_project" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity, l_extendedprice, l_discount
         |FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
         |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_topk_orders" ->
      s"""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_join_agg" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders, ${sumD("o_totalprice", 2, "revenue")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_join_multi" ->
      s"""SELECT r_name, n_name, ${sumD("l_extendedprice*(1-l_discount)", 6, "revenue")},
         |  count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin,

    // aggregate-then-join: HAVING collapses lineitem before any join
    "q_tpch_q18" ->
      s"""WITH big AS (SELECT l_orderkey,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
         |  FROM lineitem GROUP BY l_orderkey
         |  HAVING sum(CAST(l_quantity AS BIGINT)) > 150)
         |SELECT c_custkey, c_name, o_orderkey,
         |  CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, sum_qty
         |FROM orders JOIN big ON o_orderkey = big.l_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q3" ->
      s"""SELECT l_orderkey, ${sumD("l_extendedprice*(1-l_discount)", 6, "revenue")},
         |  o_orderdate, o_orderpriority
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate < DATE '1998-07-01' AND l_shipdate > DATE '1998-07-01'
         |GROUP BY l_orderkey, o_orderdate, o_orderpriority
         |ORDER BY revenue DESC, o_orderdate, l_orderkey LIMIT 10""".stripMargin,

    "q_tpch_q5" ->
      s"""SELECT n_name, ${sumD("l_extendedprice*(1-l_discount)", 6, "revenue")}
         |FROM customer
         |JOIN orders ON c_custkey = o_custkey
         |JOIN lineitem ON l_orderkey = o_orderkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
         |  AND o_orderdate >= DATE '1997-01-01'
         |  AND o_orderdate < DATE '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_tpch_q1" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  ${sumD("l_quantity", 2, "sum_qty")},
         |  ${sumD("l_extendedprice", 2, "sum_base_price")},
         |  ${sumD("l_extendedprice*(1-l_discount)", 6, "sum_disc_price")},
         |  ${sumD("l_extendedprice*(1-l_discount)*(1+l_tax)", 6, "sum_charge")},
         |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_qty,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_price,
         |  CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE)/count(*) AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_tpch_q7" ->
      s"""SELECT supp_nation, cust_nation, l_year,
         |  ${sumD("volume", 6, "revenue")}
         |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |    CAST(year(l_shipdate) AS INTEGER) AS l_year,
         |    l_extendedprice * (1 - l_discount) AS volume
         |  FROM supplier
         |  JOIN lineitem ON s_suppkey = l_suppkey
         |  JOIN orders ON o_orderkey = l_orderkey
         |  JOIN customer ON c_custkey = o_custkey
         |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |  WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
         |      OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
         |    AND l_shipdate >= DATE '1996-01-01'
         |    AND l_shipdate < DATE '1998-01-01')
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q_tpch_q8" ->
      s"""SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
         |  CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_3' THEN
         |      l_extendedprice * (1 - l_discount) ELSE 0 END
         |    AS DECIMAL(18,6))) AS DOUBLE) AS nation_volume,
         |  ${sumD("l_extendedprice*(1-l_discount)", 6, "total_volume")},
         |  CAST(sum(CAST(CASE WHEN sn.n_name = 'NATION_3' THEN
         |      l_extendedprice * (1 - l_discount) ELSE 0 END
         |    AS DECIMAL(18,6))) AS DOUBLE)
         |  / CAST(sum(CAST(l_extendedprice*(1-l_discount)
         |    AS DECIMAL(18,6))) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation cn ON c_nationkey = cn.n_nationkey
         |JOIN region ON cn.n_regionkey = r_regionkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE p_type = 'ECONOMY' AND r_name = 'EUROPE'
         |  AND o_orderdate >= DATE '1996-01-01'
         |  AND o_orderdate < DATE '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_tpch_q13" ->
      s"""SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
         |FROM (SELECT c_custkey,
         |    CAST(count(o_orderkey) AS BIGINT) AS c_count
         |  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         |  GROUP BY c_custkey)
         |GROUP BY c_count ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_tpch_q14" ->
      s"""SELECT
         |  CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN
         |      l_extendedprice * (1 - l_discount) ELSE 0 END
         |    AS DECIMAL(18,6))) AS DOUBLE) AS promo_revenue,
         |  ${sumD("l_extendedprice*(1-l_discount)", 6, "total_revenue")},
         |  100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN
         |      l_extendedprice * (1 - l_discount) ELSE 0 END
         |    AS DECIMAL(18,6))) AS DOUBLE)
         |  / CAST(sum(CAST(l_extendedprice*(1-l_discount)
         |    AS DECIMAL(18,6))) AS DOUBLE) AS promo_pct
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |WHERE l_shipdate >= DATE '1997-09-01'
         |  AND l_shipdate < DATE '1997-10-01'""".stripMargin,

    "q_tpch_q15" ->
      s"""WITH rev AS (SELECT l_suppkey,
         |    ${sumD("l_extendedprice*(1-l_discount)", 6, "total_revenue")}
         |  FROM lineitem
         |  WHERE l_shipdate >= DATE '1997-01-01'
         |    AND l_shipdate < DATE '1997-04-01'
         |  GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue
         |FROM supplier JOIN rev ON s_suppkey = l_suppkey
         |WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
         |ORDER BY s_suppkey""".stripMargin,

    "q_tpch_q17" ->
      s"""WITH lp AS (SELECT l_partkey, l_quantity, l_extendedprice
         |  FROM lineitem JOIN part ON l_partkey = p_partkey
         |  WHERE p_brand = 'Brand#23'),
         |aq AS (SELECT l_partkey AS ak,
         |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM lp GROUP BY 1)
         |SELECT ${sumD("l_extendedprice", 2, "total_revenue")},
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
         |    AS avg_yearly
         |FROM lp JOIN aq ON l_partkey = ak
         |WHERE CAST(l_quantity AS BIGINT) * 5 * cnt < sq""".stripMargin,

    "q_reconcile" ->
      s"""WITH comp AS (SELECT l_orderkey,
         |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         |      AS comp
         |  FROM lineitem GROUP BY 1),
         |rec AS (SELECT o_orderkey,
         |    CAST(floor(o_totalprice * 100) AS BIGINT) AS rec FROM orders),
         |j AS (SELECT rec, comp,
         |    CASE WHEN rec IS NULL THEN 'no_header'
         |      WHEN comp IS NULL THEN 'no_lines'
         |      WHEN abs(comp - rec) * 1000000 // rec = 0 THEN 'exact'
         |      WHEN abs(comp - rec) * 1000000 // rec <= 1000 THEN 'within_0.1pct'
         |      WHEN abs(comp - rec) * 1000000 // rec <= 10000 THEN 'within_1pct'
         |      WHEN abs(comp - rec) * 1000000 // rec <= 100000 THEN 'within_10pct'
         |      ELSE 'over_10pct' END AS band
         |  FROM rec FULL OUTER JOIN comp ON o_orderkey = l_orderkey)
         |SELECT band, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(coalesce(rec, 0)) AS BIGINT) AS recorded_cents,
         |  CAST(sum(coalesce(comp, 0)) AS BIGINT) AS computed_cents
         |FROM j GROUP BY band ORDER BY band""".stripMargin,

    // one-pass Poisson bootstrap: pinned affine hash mod 1e4 against the
    // integer Poisson(1) CDF; replica means tie-break by replica id
    "q_bootstrap_ci" ->
      s"""WITH o AS (SELECT o_orderkey AS k,
         |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
         |reps AS (SELECT b, cents,
         |    ((k % 1000000007) * (2654435761 + b * 40503) + 97 + b * 131)
         |      % 1000000007 % 10000 AS r
         |  FROM o, range(32) t(b)),
         |w AS (SELECT b, cents, CASE
         |    WHEN r < 3679 THEN 0 WHEN r < 7358 THEN 1 WHEN r < 9197 THEN 2
         |    WHEN r < 9810 THEN 3 WHEN r < 9963 THEN 4 WHEN r < 9994 THEN 5
         |    WHEN r < 9999 THEN 6 ELSE 7 END AS w
         |  FROM reps),
         |m AS (SELECT b, CAST(sum(w) AS BIGINT) AS n,
         |    CAST(sum(w * cents) AS BIGINT) AS sc FROM w GROUP BY b),
         |mm AS (SELECT b,
         |    CAST(CAST(sc AS HUGEINT) * 1000000 // n AS BIGINT) AS mean_micro
         |  FROM m),
         |rk AS (SELECT mean_micro,
         |    row_number() OVER (ORDER BY mean_micro, b) AS rank FROM mm),
         |ci AS (SELECT
         |    min(CASE WHEN rank = 2 THEN mean_micro END) AS ci_lo_micro,
         |    min(CASE WHEN rank = 31 THEN mean_micro END) AS ci_hi_micro
         |  FROM rk)
         |SELECT CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(CAST(sum(cents) AS HUGEINT) * 1000000 // count(*) AS BIGINT)
         |    AS mean_micro,
         |  ci_lo_micro, ci_hi_micro
         |FROM o, ci GROUP BY ci_lo_micro, ci_hi_micro""".stripMargin,

    "q_tpch_q6" ->
      s"""SELECT ${sumD("l_extendedprice*l_discount", 6, "revenue")},
         |  CAST(count(*) AS BIGINT) AS n_lines
         |FROM lineitem
         |WHERE l_shipdate >= DATE '1997-01-01' AND l_shipdate < DATE '1998-01-01'
         |  AND l_discount >= 0.05 AND l_discount <= 0.07
         |  AND l_quantity < 24""".stripMargin,

    "q_tpch_q10" ->
      s"""WITH pc AS (
         |  SELECT o_custkey, ${sumD("l_extendedprice*(1-l_discount)", 6, "revenue")}
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey
         |  WHERE o_orderdate >= DATE '1997-10-01'
         |    AND o_orderdate < DATE '1998-01-01'
         |    AND l_returnflag = 'R'
         |  GROUP BY o_custkey)
         |SELECT c_custkey, c_name, revenue, c_acctbal, n_name
         |FROM pc
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,

    "q_weighted_median" ->
      s"""WITH cells AS (SELECT l_returnflag, l_quantity,
         |    CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS wc
         |  FROM lineitem GROUP BY 1, 2),
         |c AS (SELECT l_returnflag, l_quantity,
         |    CAST(sum(wc) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(sum(wc) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
         |  FROM cells)
         |SELECT l_returnflag,
         |  min(CASE WHEN cum * 2 >= tot THEN l_quantity END) AS wmedian_qty,
         |  CAST(max(tot) AS BIGINT) AS total_cents
         |FROM c GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_constraint_check" ->
      s"""WITH r AS (
         |  SELECT 'orders.o_custkey complete' AS con, 1000000 AS thr,
         |    CAST(count(*) AS BIGINT) AS n_rows,
         |    CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
         |  FROM orders
         |  UNION ALL
         |  SELECT 'orders.o_custkey fk customer', 1000000,
         |    CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM orders LEFT JOIN customer ON o_custkey = c_custkey
         |  UNION ALL
         |  SELECT 'customer.c_custkey unique', 1000000,
         |    CAST(count(*) AS BIGINT),
         |    CAST(count(*) - count(DISTINCT c_custkey) AS BIGINT)
         |  FROM customer
         |  UNION ALL
         |  SELECT 'lineitem.l_quantity in [1,50]', 999000,
         |    CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'lineitem.l_discount in [0,0.1]', 999000,
         |    CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.1 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'events.value positive', 999000,
         |    CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN value <= 0 THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM events
         |  UNION ALL
         |  SELECT 'documents.lang iso2', 1000000,
         |    CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN NOT regexp_matches(lang, '^[a-z]{2}$$')
         |      THEN 1 ELSE 0 END) AS BIGINT)
         |  FROM documents)
         |SELECT con AS "constraint", n_rows, n_bad,
         |  CAST((n_rows - n_bad) * 1000000 // n_rows AS BIGINT) AS pass_ppm,
         |  CAST(CASE WHEN (n_rows - n_bad) * 1000000 // n_rows >= thr
         |    THEN 1 ELSE 0 END AS BIGINT) AS pass
         |FROM r ORDER BY con""".stripMargin,

    "q_semi_join" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |ORDER BY c_custkey""".stripMargin,

    "q_anti_join" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         |ORDER BY c_custkey""".stripMargin,

    "q_outer_join" ->
      s"""SELECT c_custkey, c_name, count(o_custkey) AS n_orders_1995,
         |  coalesce(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE),
         |           CAST(0.0 AS DOUBLE)) AS rev_1995
         |FROM customer LEFT JOIN orders
         |  ON c_custkey = o_custkey AND year(o_orderdate) = 1995
         |GROUP BY c_custkey, c_name ORDER BY c_custkey""".stripMargin,

    "q_window_rank" ->
      s"""SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         |  SELECT o_custkey, o_orderkey, o_totalprice,
         |    CAST(row_number() OVER (PARTITION BY o_custkey
         |      ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS rn
         |  FROM orders) t
         |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q_rollup" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
         |  count(*) AS n, ${sumD("l_quantity", 2, "sum_qty")}
         |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         |ORDER BY flag, status""".stripMargin,

    "q_cube_docs" ->
      s"""SELECT coalesce(lang,'ALL') AS lang, coalesce(source,'ALL') AS source,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents GROUP BY CUBE(lang, source) ORDER BY lang, source""".stripMargin,

    "q_full_outer" ->
      s"""WITH a AS (SELECT o_custkey, count(*) AS n_1995 FROM orders
         |  WHERE year(o_orderdate) = 1995 GROUP BY o_custkey),
         |b AS (SELECT o_custkey, count(*) AS n_1996 FROM orders
         |  WHERE year(o_orderdate) = 1996 GROUP BY o_custkey)
         |SELECT coalesce(a.o_custkey, b.o_custkey) AS custkey,
         |  coalesce(n_1995, 0) AS n_1995, coalesce(n_1996, 0) AS n_1996
         |FROM a FULL JOIN b ON a.o_custkey = b.o_custkey
         |ORDER BY custkey""".stripMargin,

    "q_intersect" ->
      s"""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         |INTERSECT
         |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         |ORDER BY o_custkey""".stripMargin,

    "q_except" ->
      s"""SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         |EXCEPT
         |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
         |ORDER BY o_custkey""".stripMargin,

    "q_except_all" ->
      s"""SELECT o_custkey, count(*) AS surplus_1995 FROM (
         |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         |  EXCEPT ALL
         |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_intersect_all" ->
      s"""SELECT o_custkey, count(*) AS n_common FROM (
         |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
         |  INTERSECT ALL
         |  SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996) t
         |GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_sql_correlated" ->
      s"""SELECT c_custkey, c_name FROM customer
         |WHERE (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) >= 15
         |ORDER BY c_custkey""".stripMargin,

    "q_grouping_sets" ->
      s"""SELECT coalesce(l_returnflag,'ALL') AS flag, coalesce(l_linestatus,'ALL') AS status,
         |  count(*) AS n, ${sumD("l_extendedprice", 2, "sum_price")}
         |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
         |ORDER BY flag, status""".stripMargin,

    "q_tumbling_window" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
         |  count(*) AS n, ${sumD("value", 2, "sum_value")}
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 50000) * 50000 AS BIGINT) AS bucket,
         |  count(*) AS n FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    // incremental MV maintenance: the oracle IS the full recompute — the
    // merged partials must equal it bit-for-bit (decimal-routed sums)
    "q_incremental_agg" ->
      s"""SELECT o_orderpriority, count(*) AS n_orders,
         |  ${sumD("o_totalprice", 2, "revenue")}
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin,

    // equi-depth histogram: the rank and the bucket formula
    // 1 + (rank-1)*8 div n are replicated exactly; the flat window here
    // is fine at DuckDB scale (the engine uses the two-phase prefix sum)
    // rank-formula Gini in exact cents; ratio through HUGEINT ≙ the
    // engine's DECIMAL(38,0) routing
    "q_gini" ->
      s"""WITH sp AS (SELECT o_custkey,
         |    CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
         |      AS m FROM orders GROUP BY o_custkey),
         |r AS (SELECT m, row_number() OVER (ORDER BY m, o_custkey) AS rank,
         |    (SELECT count(*) FROM sp) AS n,
         |    (SELECT CAST(sum(m) AS BIGINT) FROM sp) AS s FROM sp)
         |SELECT CAST(max(n) AS BIGINT) AS n_customers,
         |  CAST(max(s) AS BIGINT) AS total_cents,
         |  CAST((CAST(2 AS HUGEINT) * sum(rank * m)
         |      - CAST(max(n) + 1 AS HUGEINT) * max(s)) * 1000000
         |    // (CAST(max(n) AS HUGEINT) * max(s)) AS BIGINT) AS gini_ppm,
         |  CAST(sum(CASE WHEN rank > n - (n + 99) // 100 THEN m ELSE 0 END)
         |    * 1000000 // max(s) AS BIGINT) AS top1pct_share_ppm
         |FROM r""".stripMargin,

    // the oracle affords plain global row_number windows where the engine
    // uses the two-phase block prefix sum; same explicit score formula
    "q_rfm" ->
      s"""WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         |    CAST(o_totalprice AS DECIMAL(18,2)) AS p FROM orders),
         |mx AS (SELECT max(d) AS dmax FROM o),
         |b AS (SELECT o_custkey,
         |    date_diff('day', max(d), (SELECT dmax FROM mx)) AS r_days,
         |    count(*) AS f, sum(p) AS m FROM o GROUP BY o_custkey),
         |r AS (SELECT o_custkey, m,
         |    row_number() OVER (ORDER BY r_days, o_custkey) AS rr,
         |    row_number() OVER (ORDER BY f, o_custkey) AS rf,
         |    row_number() OVER (ORDER BY m, o_custkey) AS rm,
         |    (SELECT count(*) FROM b) AS n FROM b),
         |sc AS (SELECT o_custkey, m,
         |    CAST(5 - (rr - 1) * 5 // n AS BIGINT) AS r_score,
         |    CAST(1 + (rf - 1) * 5 // n AS BIGINT) AS f_score,
         |    CAST(1 + (rm - 1) * 5 // n AS BIGINT) AS m_score FROM r)
         |SELECT r_score, f_score, m_score,
         |  CASE WHEN r_score >= 4 AND f_score >= 4 AND m_score >= 4
         |         THEN 'champion'
         |       WHEN r_score <= 2 AND f_score <= 2 THEN 'hibernating'
         |       WHEN r_score <= 2 AND f_score >= 4 THEN 'at_risk'
         |       WHEN r_score >= 4 AND f_score <= 2 THEN 'new'
         |       ELSE 'regular' END AS segment,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(m) AS DOUBLE) AS sum_monetary
         |FROM sc GROUP BY 1, 2, 3, 4
         |ORDER BY r_score, f_score, m_score""".stripMargin,

    "q_equidepth_hist" ->
      s"""WITH r AS (SELECT l_extendedprice AS p,
         |    CAST(row_number() OVER (ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT) AS rank,
         |    CAST(count(*) OVER () AS BIGINT) AS n
         |  FROM lineitem)
         |SELECT CAST(1 + (rank - 1) * 8 // n AS BIGINT) AS bucket,
         |  count(*) AS n_rows, min(p) AS lo, max(p) AS hi,
         |  ${sumD("p", 2, "sum_price")}
         |FROM r GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_percentiles" ->
      s"""SELECT l_returnflag,
         |  round(quantile_cont(l_quantity, 0.5), 4) AS p50,
         |  round(quantile_cont(l_quantity, 0.9), 4) AS p90,
         |  round(quantile_cont(l_quantity, 0.99), 4) AS p99
         |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    // integer-cents moment spine (round 13): both engines sum EXACT
    // integer products (Spark: int64 cells recombined in decimal(38,0);
    // DuckDB: HUGEINT) and only the final sqrt/divide runs in doubles —
    // identical integers round to identical doubles, round 9 absorbs the
    // remaining division/sqrt ulps
    "q_corr_exact" ->
      s"""WITH c AS (SELECT l_returnflag,
         |    CAST(round(l_quantity * 100) AS BIGINT) AS qc,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS pc
         |  FROM lineitem),
         |m AS (SELECT l_returnflag, count(*) AS n,
         |    sum(CAST(qc AS HUGEINT)) AS sx, sum(CAST(pc AS HUGEINT)) AS sy,
         |    sum(CAST(qc AS HUGEINT) * pc) AS sxy,
         |    sum(CAST(qc AS HUGEINT) * qc) AS sxx,
         |    sum(CAST(pc AS HUGEINT) * pc) AS syy
         |  FROM c GROUP BY l_returnflag)
         |SELECT l_returnflag,
         |  round(CAST(n*sxy - sx*sy AS DOUBLE) /
         |    (sqrt(CAST(n*sxx - sx*sx AS DOUBLE)) * sqrt(CAST(n*syy - sy*sy AS DOUBLE))), 9)
         |    AS corr_qty_price
         |FROM m ORDER BY l_returnflag""".stripMargin,

    "q_sliding_window" ->
      s"""SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS wstart, event_type, count(*) AS n
         |FROM (SELECT event_type,
         |    unnest([time_bucket(INTERVAL '30 minutes', ts),
         |            time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes']) AS ws
         |  FROM events) t
         |GROUP BY ws, event_type ORDER BY wstart, event_type""".stripMargin,

    "q_sql_interface" ->
      s"""SELECT p_brand, count(*) AS n, ${sumD("l_quantity", 2, "sum_qty")}
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY p_brand ORDER BY p_brand""".stripMargin,

    "q_json_extract" ->
      s"""SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(json_extract(props,'$$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         |  count(DISTINCT CAST(json_extract(props,'$$.k') AS BIGINT)) AS distinct_k
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_upsert" ->
      s"""WITH snap AS (SELECT o_orderkey, o_custkey, o_totalprice FROM orders)
         |SELECT * FROM snap WHERE o_orderkey % 7 <> 0
         |UNION ALL
         |SELECT o_orderkey, o_custkey, o_totalprice * 1.1 FROM snap WHERE o_orderkey % 7 = 0
         |UNION ALL
         |SELECT o_orderkey + 10000000, o_custkey, o_totalprice FROM snap WHERE o_orderkey % 13 = 0
         |ORDER BY o_orderkey""".stripMargin,

    // UNION ALL recursion over an acyclic hierarchy: each engine adds
    // c_acctbal parent-first along the unique root path, so the double
    // path sum is bit-exact (identical association order, no reordering)
    "q_recursive_cte" ->
      s"""WITH RECURSIVE walk(custkey, depth, path_bal) AS (
         |  SELECT c_custkey, CAST(0 AS BIGINT), c_acctbal
         |  FROM customer WHERE c_custkey = 0
         |  UNION ALL
         |  SELECT c.c_custkey, w.depth + 1, w.path_bal + c.c_acctbal
         |  FROM customer c JOIN walk w ON c.c_custkey // 2 = w.custkey
         |  WHERE c.c_custkey > 0
         |)
         |SELECT custkey, depth, path_bal FROM walk ORDER BY custkey""".stripMargin,

    "q_lateral_topk" ->
      s"""SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
         |FROM customer c,
         |LATERAL (SELECT o_orderkey, o_totalprice FROM orders
         |         WHERE o_custkey = c.c_custkey
         |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) o
         |ORDER BY c.c_custkey, o.o_totalprice DESC, o.o_orderkey""".stripMargin,

    // the variant chain is encode→parse→typed-extract; its fixed point is
    // the source columns, so the oracle states the identity directly
    "q_variant_extract" ->
      s"""SELECT o_orderkey, o_custkey AS cust, o_totalprice AS total,
         |  CAST(o_orderdate AS VARCHAR) AS dt,
         |  o_orderkey % 11 AS tag1, CAST(-1 AS BIGINT) AS missing
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_sessionize" ->
      s"""WITH e AS (SELECT user_id, ts, event_id,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id, ts, event_id,
         |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |      THEN 1 ELSE 0 END AS new_sess FROM e),
         |t AS (SELECT user_id, sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM s)
         |SELECT user_id, CAST(max(sess_id) AS BIGINT) AS n_sessions, count(*) AS n_events
         |FROM t GROUP BY user_id ORDER BY user_id""".stripMargin,

    // the partitioned layout is invisible to the logical result
    "q_partitioned_scan" ->
      s"""SELECT source, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents WHERE lang = 'en'
         |GROUP BY source ORDER BY source""".stripMargin,

    "q_dpp_join" ->
      s"""SELECT lang, count(*) AS n_docs FROM documents
         |WHERE lang IN (SELECT DISTINCT lang FROM documents WHERE doc_id < 10)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // salted join ≡ plain join: the oracle is simply the unsalted query
    "q_skew_audit" ->
      s"""WITH u AS (
         |  SELECT 'lineitem.l_partkey' AS c, l_partkey AS k FROM lineitem
         |  UNION ALL SELECT 'lineitem.l_suppkey', l_suppkey FROM lineitem
         |  UNION ALL SELECT 'orders.o_custkey', o_custkey FROM orders),
         |kc AS (SELECT c, k, CAST(count(*) AS BIGINT) AS cnt
         |  FROM u GROUP BY c, k),
         |agg AS (SELECT c, CAST(sum(cnt) AS BIGINT) AS n,
         |    CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(max(cnt) AS BIGINT) AS max_cnt,
         |    min(k) FILTER (WHERE cnt = (SELECT max(cnt) FROM kc k2
         |      WHERE k2.c = kc.c)) AS top_key
         |  FROM kc GROUP BY c)
         |SELECT c AS key_column, n, n_keys, max_cnt, top_key,
         |  CAST(n * 100 // n_keys AS BIGINT) AS mean_x100,
         |  CAST(max_cnt * 100 * n_keys // n AS BIGINT) AS skew_x100,
         |  CASE WHEN max_cnt * 100 * n_keys // n >= 400 THEN 'salt'
         |       WHEN max_cnt * 100 * n_keys // n >= 200 THEN 'aqe_skew_join'
         |       ELSE 'none' END AS advice
         |FROM agg ORDER BY key_column""".stripMargin,

    "q_skew_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders, ${sumD("o_totalprice", 2, "revenue")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // session_window merge rule is next.start < prev.end (STRICT), so a
    // new session begins at a gap >= 30 min exactly — note >= vs the > of
    // q_sessionize (that operator defines its own 30-min rule)
    "q_session_window" ->
      s"""WITH e AS (SELECT user_id, ts, event_id,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id, ts, event_id,
         |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) >= 1800000000
         |      THEN 1 ELSE 0 END AS new_sess FROM e),
         |t AS (SELECT user_id, ts, sum(new_sess) OVER (PARTITION BY user_id
         |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
         |  FROM s)
         |SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS sess_start,
         |  strftime(max(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S') AS sess_end,
         |  count(*) AS n_events
         |FROM t GROUP BY user_id, sid ORDER BY user_id, sess_start""".stripMargin,

    // wide→long inverse of q_pivot; the oracle melts via UNION ALL
    "q_unpivot" ->
      s"""SELECT l_orderkey, l_linenumber, metric, value FROM (
         |  SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
         |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
         |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount', l_discount FROM lineitem
         |  UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem) t
         |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin,

    "q_array_functions" ->
      s"""WITH d AS (SELECT doc_id,
         |    list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'), w -> w <> '') AS t
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |  list_contains(t, 'the') AS has_the,
         |  CAST(list_position(t, 'the') AS BIGINT) AS pos_the,
         |  coalesce(t[1], '') AS first_tok,
         |  coalesce(t[-1], '') AS last_tok,
         |  array_to_string(list_sort(t)[1:3], ',') AS top3_sorted,
         |  list_has_any(t, ['the', 'a', 'of', 'and']) AS has_stop
         |FROM d ORDER BY doc_id""".stripMargin,

    // leftmost-match property: the first occurrence of the extracted match
    // string IS the regex match position (an earlier occurrence would
    // itself be a leftmost match), so strpos stands in for regexp_instr
    "q_grep" ->
      s"""SELECT doc_id, regexp_extract(text, 's[a-z]*a[a-z]+') AS first_match,
         |  CAST(strpos(text, regexp_extract(text, 's[a-z]*a[a-z]+')) - 1 AS BIGINT) AS pos0
         |FROM documents WHERE regexp_matches(text, 's[a-z]*a[a-z]+')
         |ORDER BY doc_id""".stripMargin,

    "q_approx_topk" ->
      s"""SELECT w AS word, count(*) AS cnt
         |FROM (SELECT unnest(list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |  w -> w <> '')) AS w FROM documents)
         |GROUP BY w ORDER BY cnt DESC, word LIMIT 50""".stripMargin,

    // sketch AUDIT forms (round 13): the raw HLL / GK estimates are
    // engine-internal, so the declared queries surface the exact side
    // plus a banded-accuracy verdict; the oracle replays the band as the
    // contract constant `true` — an engine-side accuracy regression
    // flips the hash red
    "q_approx_distinct" ->
      s"""SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
         |  true AS hll_within_5pct
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_approx_percentile" ->
      s"""SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
         |  true AS p50_in_band, true AS p90_in_band, true AS p99_in_band
         |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_map_functions" ->
      s"""WITH tok AS (SELECT doc_id,
         |    unnest(list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'), w -> w <> '')) AS w
         |  FROM documents),
         |wc AS (SELECT doc_id, w, count(*) AS n FROM tok GROUP BY doc_id, w),
         |m AS (SELECT doc_id, map_from_entries(list(struct_pack(k := w, v := n))) AS mp
         |  FROM wc GROUP BY doc_id),
         |sc AS (SELECT doc_id,
         |  CAST(cardinality(mp) AS BIGINT) AS n_distinct,
         |  CAST(list_sum(map_values(mp)) AS BIGINT) AS n_tokens,
         |  CAST(coalesce(element_at(mp, 'the')[1], 0) AS BIGINT) AS n_the,
         |  list_filter(map_entries(mp), e -> e."value" >= 5) AS freq FROM m)
         |SELECT doc_id, n_distinct, n_tokens, n_the,
         |  coalesce(u.e."key", '') AS word,
         |  CAST(coalesce(u.e."value", 0) AS BIGINT) AS n_word
         |FROM sc, unnest(CASE WHEN len(freq) = 0 THEN [NULL] ELSE freq END) AS u(e)
         |ORDER BY doc_id, word""".stripMargin,

    "q_window_suite" ->
      s"""SELECT o_orderkey, o_custkey,
         |  CAST(dense_rank() OVER (PARTITION BY o_custkey
         |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS drnk,
         |  CAST(ntile(4) OVER (PARTITION BY o_custkey
         |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS tile,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) OVER (PARTITION BY o_custkey
         |    ORDER BY o_orderdate RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |    AS DOUBLE) AS cum_rev
         |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin,

    // the bucketed layout is invisible to the logical result
    "q_bucketed_join" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders, ${sumD("o_totalprice", 2, "revenue")}
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_pivot" ->
      s"""SELECT c_mktsegment,
         |  CAST(count(CASE WHEN year(o_orderdate) = 1996 THEN 1 END) AS BIGINT) AS y1996,
         |  CAST(count(CASE WHEN year(o_orderdate) = 1997 THEN 1 END) AS BIGINT) AS y1997,
         |  CAST(count(CASE WHEN year(o_orderdate) = 1998 THEN 1 END) AS BIGINT) AS y1998
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    // blocked fuzzy join: per-nation candidates, exact edit distance
    "q_fuzzy_join" ->
      s"""SELECT c_nationkey AS nationkey, c_name, s_name,
         |  CAST(levenshtein(c_name, s_name) AS BIGINT) AS dist
         |FROM customer JOIN supplier ON c_nationkey = s_nationkey
         |WHERE levenshtein(c_name, s_name) <= 6
         |ORDER BY nationkey, c_name, s_name""".stripMargin,

    // the bloom filter is semantics-preserving row pruning, so the oracle
    // is the plain join — what the runtime filter must not change
    "q_bloom_join" ->
      s"""SELECT o_orderpriority, count(*) AS n_items,
         |  ${sumD("l_quantity", 2, "sum_qty")},
         |  ${sumD("l_extendedprice * (1 - l_discount)", 6, "revenue")}
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |WHERE o_totalprice > 450000
         |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    // 50-token chunks at stride 40 (10-token overlap), hash-verified
    "q_chunking" ->
      s"""WITH d AS ($TokList),
         |st AS (SELECT doc_id, t, unnest(range(1, len(t) + 1, 40)) AS cs
         |  FROM d WHERE len(t) > 0)
         |SELECT doc_id, CAST(cs AS BIGINT) AS chunk_start,
         |  CAST(len(t[cs:cs+49]) AS BIGINT) AS n_tokens,
         |  ${polyHashSql("array_to_string(t[cs:cs+49], ' ')")} AS chunk_hash
         |FROM st ORDER BY doc_id, chunk_start""".stripMargin,

    "q_redact" ->
      s"""WITH r AS (SELECT doc_id, regexp_replace(text, '[0-9]', '#', 'g') AS rt
         |  FROM documents)
         |SELECT doc_id,
         |  CAST(length(rt) - length(regexp_replace(rt, '#', '', 'g')) AS BIGINT) AS n_masked,
         |  ${polyHashSql("rt")} AS redacted_hash
         |FROM r ORDER BY doc_id""".stripMargin,

    // synthesized contact lines (identical bytes in both engines), PII
    // classes detected and masked by the same patterns the engine uses
    // the engine generates basket pairs map-side from per-order arrays;
    // the oracle's equivalent formulation is the distinct-projection
    // self-join (same pair multiset by construction)
    "q_copurchase" ->
      s"""WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
         |SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         |  CAST(count(*) AS BIGINT) AS support
         |FROM dp a JOIN dp b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |GROUP BY 1, 2 ORDER BY support DESC, part_a, part_b
         |LIMIT 20""".stripMargin,

    "q_graph_components" ->
      s"""WITH RECURSIVE dp AS (SELECT DISTINCT l_orderkey, l_partkey
         |  FROM lineitem),
         |pe AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
         |  FROM dp a JOIN dp b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |edges AS (SELECT a, b FROM pe UNION SELECT b, a FROM pe),
         |verts AS (SELECT DISTINCT a AS v FROM edges),
         |reach(v, lbl) AS (
         |  SELECT v, v FROM verts
         |  UNION
         |  SELECT e.b, r.lbl FROM reach r JOIN edges e ON e.a = r.v),
         |comp AS (SELECT v, min(lbl) AS lbl FROM reach GROUP BY v),
         |sizes AS (SELECT lbl, CAST(count(*) AS BIGINT) AS component_size
         |  FROM comp GROUP BY lbl)
         |SELECT component_size, CAST(count(*) AS BIGINT) AS n_components,
         |  CAST(component_size * count(*) AS BIGINT) AS n_vertices
         |FROM sizes GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_assoc_rules" ->
      s"""WITH dp AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |nb AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS nb FROM dp),
         |item AS (SELECT l_partkey AS p, CAST(count(*) AS BIGINT) AS isupp
         |  FROM dp GROUP BY 1),
         |pair AS (SELECT a.l_partkey AS pa, b.l_partkey AS pb,
         |    CAST(count(*) AS BIGINT) AS sab
         |  FROM dp a JOIN dp b
         |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         |  GROUP BY 1, 2 HAVING count(*) >= 2),
         |rules AS (
         |  SELECT pa AS antecedent, pb AS consequent, sab FROM pair
         |  UNION ALL SELECT pb, pa, sab FROM pair)
         |SELECT antecedent, consequent, sab AS support,
         |  CAST(sab * 1000000 // ia.isupp AS BIGINT) AS conf_ppm,
         |  CAST(CAST(sab AS HUGEINT) * nb * 1000000
         |    // (CAST(ia.isupp AS HUGEINT) * ic.isupp) AS BIGINT) AS lift_ppm
         |FROM rules
         |JOIN item ia ON antecedent = ia.p
         |JOIN item ic ON consequent = ic.p
         |CROSS JOIN nb
         |ORDER BY lift_ppm DESC, conf_ppm DESC, antecedent, consequent
         |LIMIT 20""".stripMargin,

    "q_skipgrams" ->
      s"""WITH d AS ($TokList),
         |p AS (SELECT split_part(pr, ' ', 1) AS w, split_part(pr, ' ', 2) AS c
         |  FROM (
         |    SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |      i -> t[i] || ' ' || t[i+1])) AS pr FROM d
         |    UNION ALL
         |    SELECT unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |      i -> t[i] || ' ' || t[i+2])) AS pr FROM d) u)
         |SELECT w, c, CAST(count(*) AS BIGINT) AS n_pairs FROM p
         |GROUP BY w, c ORDER BY n_pairs DESC, w, c LIMIT 30""".stripMargin,

    // window hashes recomputed per position (O(n·w) — the oracle trades
    // the engine's incremental rolling update for obviousness)
    "q_cdc_chunks" ->
      s"$CdcChunkRowsSql\nORDER BY doc_id, chunk_idx",

    "q_cdc_dedup" ->
      s"""WITH ch AS ($CdcChunkRowsSql),
         |r AS (SELECT doc_id, chunk_len, row_number() OVER (
         |    PARTITION BY chunk_hash ORDER BY doc_id, chunk_idx) AS rn FROM ch)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |  CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dup_chunks,
         |  CAST(sum(CASE WHEN rn > 1 THEN chunk_len ELSE 0 END) AS BIGINT) AS dup_bytes,
         |  CAST(sum(chunk_len) AS BIGINT) AS total_bytes,
         |  CAST(sum(CASE WHEN rn > 1 THEN chunk_len ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(chunk_len) AS DOUBLE) AS dup_frac
         |FROM r GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_vocab_prune" ->
      s"""WITH lw AS (SELECT lang, word AS w, count(*) AS c FROM
         |    (SELECT lang, unnest(regexp_split_to_array(text,'[^a-zA-Z]+')) AS word
         |     FROM documents) t
         |  WHERE word <> '' GROUP BY lang, word),
         |keep AS (SELECT w FROM (SELECT w, sum(c) AS cnt FROM lw GROUP BY w) v
         |  WHERE cnt >= 5),
         |vs AS (SELECT CAST(count(*) AS BIGINT) AS vocab_size FROM keep)
         |SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
         |  CAST(sum(CASE WHEN k.w IS NULL THEN c ELSE 0 END) AS BIGINT) AS n_unk,
         |  CAST(sum(CASE WHEN k.w IS NULL THEN c ELSE 0 END) AS DOUBLE)
         |    / CAST(sum(c) AS DOUBLE) AS unk_frac,
         |  vocab_size
         |FROM lw LEFT JOIN keep k ON lw.w = k.w CROSS JOIN vs
         |GROUP BY lang, vocab_size ORDER BY lang""".stripMargin,

    "q_novelty" ->
      s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |shs AS (SELECT DISTINCT doc_id, h FROM (
         |  SELECT doc_id, ${polyHashSql("sh")} AS h FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) y) z),
         |own AS (SELECT h, min(doc_id) AS first_doc FROM shs GROUP BY h)
         |SELECT s.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
         |  CAST(sum(CASE WHEN o.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_novel,
         |  CAST(sum(CASE WHEN o.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
         |    / CAST(count(*) AS DOUBLE) AS novelty
         |FROM shs s JOIN own o ON s.h = o.h
         |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin,

    "q_pii_scan" ->
      s"""WITH t AS (SELECT c_custkey,
         |    c_name || ' phone 555-' || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
         |      || ' email ' || lower(replace(c_name, '#', '.')) || '@example.com' AS text
         |  FROM customer)
         |SELECT c_custkey,
         |  CAST(len(regexp_extract_all(text, '555-[0-9]{4}')) AS BIGINT) AS n_phones,
         |  CAST(len(regexp_extract_all(text, '[a-z0-9.]+@[a-z.]+')) AS BIGINT) AS n_emails,
         |  ${polyHashSql("regexp_replace(regexp_replace(text, '555-[0-9]{4}', '555-XXXX', 'g'), '[a-z0-9.]+@', '***@', 'g')")} AS masked_hash
         |FROM t ORDER BY c_custkey""".stripMargin,

    "q_token_positions" ->
      s"""WITH d AS ($TokList),
         |p AS (SELECT doc_id, unnest(list_transform(t, (w, i) -> {'w': w, 'i': i})) AS u
         |  FROM d)
         |SELECT doc_id, u.w AS word, CAST(min(u.i) AS BIGINT) AS first_pos
         |FROM p GROUP BY doc_id, u.w ORDER BY doc_id, word""".stripMargin,

    "q_balanced_sample" ->
      s"""SELECT doc_id, lang, rnk FROM (
         |  SELECT doc_id, lang, CAST(row_number() OVER (PARTITION BY lang
         |    ORDER BY ${polyHashSql("text")}, doc_id) AS BIGINT) AS rnk
         |  FROM documents) t
         |WHERE rnk <= 20 ORDER BY lang, rnk""".stripMargin,

    "q_format_roundtrip" ->
      s"""SELECT lang, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents WHERE doc_id < 50
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // stratified mixture sampling: per-mille keep rate by language
    "q_mixture_sample" ->
      s"""SELECT lang, count(*) AS n_kept FROM documents
         |WHERE ${polyHashSql("text")} % 1000 <
         |  CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 800 WHEN 'fr' THEN 800
         |    WHEN 'es' THEN 800 WHEN 'zh' THEN 800 ELSE 0 END
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // one corpus pass; both samplers' keep rules as conditional sums
    "q_sample_bias" ->
      s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_full,
         |    CAST(sum(CASE WHEN ${polyHashSql("text")} % 100 < 10
         |      THEN 1 ELSE 0 END) AS BIGINT) AS n_hash,
         |    CAST(sum(CASE WHEN ${polyHashSql("text")} % 1000 <
         |      CASE lang WHEN 'en' THEN 400 WHEN 'de' THEN 800
         |        WHEN 'fr' THEN 800 WHEN 'es' THEN 800 WHEN 'zh' THEN 800
         |        ELSE 0 END THEN 1 ELSE 0 END) AS BIGINT) AS n_mix
         |  FROM documents GROUP BY lang),
         |lg AS (SELECT 'hash' AS sampler, lang, n_full, n_hash AS n_kept FROM c
         |  UNION ALL
         |  SELECT 'mixture', lang, n_full, n_mix FROM c),
         |tot AS (SELECT sampler, CAST(sum(n_full) AS BIGINT) AS tf,
         |    CAST(sum(n_kept) AS BIGINT) AS tk FROM lg GROUP BY sampler),
         |sc AS (SELECT lg.sampler, lang, n_full, n_kept,
         |    CAST(n_full * 1000000 // tf AS BIGINT) AS full_ppm,
         |    CAST(n_kept * 1000000 // tk AS BIGINT) AS kept_ppm,
         |    CAST(abs(n_full * 1000000 // tf - n_kept * 1000000 // tk)
         |      AS BIGINT) AS bias_ppm
         |  FROM lg JOIN tot ON lg.sampler = tot.sampler),
         |tv AS (SELECT sampler, CAST(sum(bias_ppm) // 2 AS BIGINT) AS tvd_ppm
         |  FROM sc GROUP BY sampler)
         |SELECT sc.sampler, lang, n_full, n_kept, full_ppm, kept_ppm,
         |  bias_ppm, tvd_ppm
         |FROM sc JOIN tv ON sc.sampler = tv.sampler
         |ORDER BY sc.sampler, lang""".stripMargin,

    // deterministic hash sampling (bucket 0-9 of 100)
    "q_hash_sample" ->
      s"""SELECT doc_id, n_chars FROM documents
         |WHERE ${polyHashSql("text")} % 100 < 10
         |ORDER BY doc_id""".stripMargin,

    // exact ROWS-frame aggregates; moving sum over integer cents because
    // a float moving sum depends on incremental-frame arithmetic order
    "q_moving_agg" ->
      s"""SELECT event_id, user_id,
         |  count(*) OVER w AS mov_cnt,
         |  min(value) OVER w AS mov_min,
         |  max(value) OVER w AS mov_max,
         |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT) AS mov_sum_cents
         |FROM events
         |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
         |  ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "q_date_functions" ->
      s"""SELECT o_orderkey,
         |  strftime(o_orderdate, '%Y-%m-%d') AS d_str,
         |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since,
         |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3m,
         |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS month_end,
         |  CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
         |  CAST(weekofyear(o_orderdate) AS BIGINT) AS iso_week,
         |  CAST(isodow(o_orderdate) - 1 AS BIGINT) AS weekday0
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_string_functions" ->
      s"""SELECT c_custkey, c_name,
         |  upper(c_name) AS up, lower(c_name) AS low, reverse(c_name) AS rev,
         |  lpad(c_name, 25, '*') AS padded, substring(c_name, 10, 5) AS sub,
         |  CAST(instr(c_name, '#') AS BIGINT) AS pos,
         |  regexp_replace(c_name, '0+', '0', 'g') AS collapsed,
         |  CAST(length(c_name) AS BIGINT) AS nlen
         |FROM customer ORDER BY c_custkey""".stripMargin,

    // nth_value/lead coalesced to -1: a NULL in a BIGINT column surfaces
    // as float64-NaN in both engines' dataframes and NaN breaks compares
    "q_window_navigation" ->
      s"""SELECT o_orderkey, o_custkey,
         |  first_value(o_orderkey) OVER w AS first_key,
         |  last_value(o_orderkey) OVER wf AS last_key,
         |  coalesce(nth_value(o_orderkey, 2) OVER wf, -1) AS second_key,
         |  coalesce(lead(o_orderkey, 1) OVER w, -1) AS next_key,
         |  percent_rank() OVER w AS pct_rank,
         |  cume_dist() OVER w AS cume
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
         |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
         |ORDER BY o_orderkey""".stripMargin,

    "q_bitwise_math" ->
      s"""SELECT event_id, user_id,
         |  event_id & user_id AS band, event_id | user_id AS bor,
         |  xor(event_id, user_id) AS bxor,
         |  event_id << 3 AS shl3, event_id >> 2 AS shr2,
         |  CAST(bit_count(event_id) AS BIGINT) AS nbits,
         |  event_id % 7 AS m7
         |FROM events ORDER BY event_id""".stripMargin,

    // tie-broken arg-max/arg-min (bare arg_max is nondeterministic when a
    // value tie lands on a group extreme — sf0.1 has one)
    "q_argmax" ->
      s"""WITH r AS (SELECT event_type, event_id, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rmax,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value ASC, event_id) AS rmin
         |  FROM events)
         |SELECT event_type,
         |  max(CASE WHEN rmax = 1 THEN event_id END) AS top_event_id,
         |  max(value) AS max_value,
         |  max(CASE WHEN rmin = 1 THEN event_id END) AS bottom_event_id,
         |  min(value) AS min_value
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // as-of join: DuckDB's native ASOF validates the union-and-carry-
    // forward window composition; right side deduped per (key, date)
    "q_asof_join" ->
      s"""WITH o2 AS (SELECT o_custkey AS user_id, o_orderdate AS d,
         |    max(o_orderkey) AS asof_orderkey FROM orders GROUP BY 1, 2),
         |e AS (SELECT event_id, user_id, CAST(date_trunc('day', ts) AS DATE) AS d
         |  FROM events)
         |SELECT e.event_id, e.user_id,
         |  coalesce(o2.asof_orderkey, -1) AS asof_orderkey,
         |  coalesce(strftime(o2.d, '%Y-%m-%d'), '') AS asof_orderdate
         |FROM e ASOF LEFT JOIN o2 ON e.user_id = o2.user_id AND e.d >= o2.d
         |ORDER BY event_id""".stripMargin,

    // range self-join: DuckDB's IEJoin evaluates the interval predicate
    // directly; the engine's bucketed equi-join must agree exactly
    // the CASE guards state which rows the engine's try_* forms rescue:
    // key%5=0 → null division, non-numeric status → null cast, and any
    // positive key overflows int64 max → null add
    // same explicit rank formula as the engine (not quantile_disc, whose
    // rank convention differs): element at row_number == ceil(q*n).
    // q is CAST AS DOUBLE so both engines do the same IEEE multiply —
    // DuckDB's bare 0.9 is DECIMAL-exact while Spark's lit(0.9) is the
    // double slightly above 9/10, which rounds differently when q*n
    // lands on an integer
    "q_percentiles_disc" ->
      s"""WITH r AS (SELECT l_returnflag, l_quantity,
         |  row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
         |  count(*) OVER (PARTITION BY l_returnflag) AS n
         |  FROM lineitem)
         |SELECT l_returnflag,
         |  max(CASE WHEN rn = ceil(CAST(0.5 AS DOUBLE) * n) THEN l_quantity END) AS p50_disc,
         |  max(CASE WHEN rn = ceil(CAST(0.9 AS DOUBLE) * n) THEN l_quantity END) AS p90_disc,
         |  max(CASE WHEN rn = ceil(CAST(0.99 AS DOUBLE) * n) THEN l_quantity END) AS p99_disc
         |FROM r GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_try_functions" ->
      s"""SELECT o_orderkey,
         |  COALESCE(CASE WHEN o_orderkey % 5 = 0 THEN NULL
         |    ELSE o_totalprice / (o_orderkey % 5) END, CAST(-1.0 AS DOUBLE)) AS safe_div,
         |  COALESCE(CASE WHEN o_orderkey % 7 = 0 THEN NULL
         |    ELSE o_orderkey END, CAST(-1 AS BIGINT)) AS safe_cast,
         |  COALESCE(CASE WHEN o_orderkey % 11 = 0 THEN NULL
         |    ELSE o_orderkey + 1 END, CAST(-1 AS BIGINT)) AS safe_add
         |FROM orders ORDER BY o_orderkey""".stripMargin,

    "q_zorder" -> {
      def spread(e: String): String =
        (0 until 16).map(i => s"(((($e) >> $i) & 1) << ${2 * i})").mkString(" + ")
      s"""WITH o AS (SELECT o_orderkey,
         |  CAST(o_custkey % 65536 AS BIGINT) AS cx,
         |  CAST(datediff('day', DATE '1990-01-01', o_orderdate) % 65536 AS BIGINT) AS dy
         |  FROM orders)
         |SELECT o_orderkey, cx, dy,
         |  CAST(${spread("cx")} + (${spread("dy")}) * 2 AS BIGINT) AS zkey
         |FROM o ORDER BY zkey, o_orderkey LIMIT 100""".stripMargin
    },

    // zone-map skipping: block min/max manifest per layout, box-overlap
    // prune, pruned-scan match count — replays the engine's exact blocks
    "q_zone_map" -> {
      def spread(e: String): String =
        (0 until 16).map(i => s"(((($e) >> $i) & 1) << ${2 * i})").mkString(" + ")
      s"""WITH z AS (SELECT o_orderkey,
         |    CAST(o_custkey % 65536 AS BIGINT) AS cx,
         |    CAST(datediff('day', DATE '1990-01-01', o_orderdate) % 65536
         |      AS BIGINT) AS dy
         |  FROM orders),
         |zz AS (SELECT o_orderkey, cx, dy,
         |    CAST(${spread("cx")} + (${spread("dy")}) * 2 AS BIGINT) AS zkey
         |  FROM z),
         |cells AS (
         |  SELECT 'natural' AS layout, CAST(o_orderkey // 4096 AS BIGINT)
         |    AS blk, cx, dy FROM zz
         |  UNION ALL SELECT 'zorder', CAST(zkey // 1048576 AS BIGINT),
         |    cx, dy FROM zz),
         |manifest AS (SELECT layout, blk,
         |    min(cx) AS min_cx, max(cx) AS max_cx,
         |    min(dy) AS min_dy, max(dy) AS max_dy,
         |    CAST(count(*) AS BIGINT) AS n,
         |    (max(cx) >= 100 AND min(cx) <= 299 AND
         |     max(dy) >= 2000 AND min(dy) <= 2499) AS h
         |  FROM cells GROUP BY layout, blk),
         |stats AS (SELECT layout, CAST(count(*) AS BIGINT) AS blocks_total,
         |    CAST(sum(CASE WHEN h THEN 1 ELSE 0 END) AS BIGINT)
         |      AS blocks_scanned,
         |    CAST(sum(CASE WHEN h THEN n ELSE 0 END) AS BIGINT)
         |      AS rows_in_scanned
         |  FROM manifest GROUP BY layout),
         |m AS (SELECT c.layout, CAST(count(*) AS BIGINT) AS rows_matched
         |  FROM cells c JOIN manifest mf
         |    ON mf.layout = c.layout AND mf.blk = c.blk AND mf.h
         |  WHERE c.cx BETWEEN 100 AND 299 AND c.dy BETWEEN 2000 AND 2499
         |  GROUP BY c.layout)
         |SELECT s.layout, s.blocks_total, s.blocks_scanned,
         |  s.rows_in_scanned,
         |  CAST(COALESCE(m.rows_matched, 0) AS BIGINT) AS rows_matched
         |FROM stats s LEFT JOIN m ON m.layout = s.layout
         |ORDER BY s.layout""".stripMargin
    },

    "q_range_frame_time" ->
      s"""WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS us FROM events)
         |SELECT event_id, user_id,
         |  count(*) OVER w AS n_1h,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS sum_1h
         |FROM e
         |WINDOW w AS (PARTITION BY user_id ORDER BY us
         |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,

    "q_anomaly" ->
      s"""WITH st AS (SELECT event_type, count(*) AS n,
         |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s1,
         |  CAST(sum(CAST(value * value AS DECIMAL(28,4))) AS DOUBLE) AS ss
         |  FROM events GROUP BY event_type),
         |z AS (SELECT e.event_type, e.event_id, e.value,
         |  round((e.value - s1/n) / sqrt(ss/n - (s1/n)*(s1/n)), 9) AS z
         |  FROM events e JOIN st USING (event_type)),
         |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
         |  ORDER BY abs(z) DESC, event_id) AS rank FROM z)
         |SELECT event_type, event_id, value, z, CAST(rank AS BIGINT) AS rank
         |FROM r WHERE rank <= 5 ORDER BY event_type, rank""".stripMargin,

    "q_skyline" ->
      s"""WITH o AS (SELECT o_orderkey, o_totalprice, CAST(o_orderdate AS DATE) AS dt,
         |  CAST(datediff('day', DATE '1990-01-01', o_orderdate) AS BIGINT) AS d
         |  FROM orders),
         |dm AS (SELECT d, max(o_totalprice) AS pmax FROM o GROUP BY d),
         |sw AS (SELECT d, pmax, max(pmax) OVER (ORDER BY d
         |  RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mb FROM dm),
         |keep AS (SELECT d, pmax FROM sw WHERE mb IS NULL OR mb < pmax)
         |SELECT o.o_orderkey, strftime(o.dt, '%Y-%m-%d') AS o_date, o.o_totalprice
         |FROM o JOIN keep ON o.d = keep.d AND o.o_totalprice = keep.pmax
         |ORDER BY o.o_orderkey""".stripMargin,

    // degree distribution of the same basket-projection graph
    "q_degree_hist" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM
         |  (SELECT a AS v FROM e UNION ALL SELECT b FROM e) dv GROUP BY v)
         |SELECT d, CAST(count(*) AS BIGINT) AS n_parts
         |FROM deg GROUP BY d ORDER BY d""".stripMargin,

    "q_triangle_count" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |deg AS (SELECT v, count(*) AS d FROM
         |  (SELECT a AS v FROM e UNION ALL SELECT b FROM e) dv GROUP BY v),
         |w AS (SELECT e1.a, e1.b, e2.b AS c FROM e e1 JOIN e e2 ON e1.b = e2.a),
         |t AS (SELECT count(*) AS n FROM w JOIN e e3 ON e3.a = w.a AND e3.b = w.c),
         |counts AS (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
         |  (SELECT CAST(COALESCE(sum(d * (d - 1) // 2), 0) AS BIGINT) FROM deg) AS n_wedges,
         |  (SELECT CAST(n AS BIGINT) FROM t) AS n_triangles)
         |SELECT n_edges, n_wedges, n_triangles,
         |  CASE WHEN n_wedges > 0
         |    THEN CAST(3 * n_triangles AS DOUBLE)/CAST(n_wedges AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS closure
         |FROM counts""".stripMargin,

    // common neighbors per edge via the all-wedges join (the oracle can
    // afford the quadratic form at sf0.01; the engine reuses the
    // degree-oriented triangle enumeration instead)
    "q_graph_jaccard" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |e AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b FROM li a JOIN li b
         |  ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
         |adj AS (SELECT a AS v, b AS nb FROM e UNION ALL SELECT b, a FROM e),
         |deg AS (SELECT v, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY v),
         |cm AS (SELECT x.v AS a, y.v AS b, CAST(count(*) AS BIGINT) AS t
         |  FROM adj x JOIN adj y ON x.nb = y.nb AND x.v < y.v
         |  GROUP BY x.v, y.v)
         |SELECT e.a AS part_a, e.b AS part_b,
         |  CAST(COALESCE(cm.t, 0) AS BIGINT) AS n_common,
         |  CAST(COALESCE(cm.t, 0) * 1000000
         |    // (da.d + db.d - COALESCE(cm.t, 0)) AS BIGINT) AS jaccard_ppm
         |FROM e LEFT JOIN cm ON cm.a = e.a AND cm.b = e.b
         |JOIN deg da ON da.v = e.a JOIN deg db ON db.v = e.b
         |ORDER BY jaccard_ppm DESC, part_a, part_b LIMIT 20""".stripMargin,

    // integer micro-unit PageRank, 3 unrolled power iterations — the same
    // recurrence as Graph.pageRank, replayed exactly (r div d contributions,
    // 150000 + (85·Σ) div 100 damping); all divisions are BIGINT `//`
    "q_pagerank" ->
      s"""WITH e0 AS (SELECT DISTINCT o_custkey*2 AS u, l_suppkey*2+1 AS v
         |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
         |edges AS (SELECT u, v FROM e0 UNION ALL SELECT v AS u, u AS v FROM e0),
         |deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM edges GROUP BY u),
         |r0 AS (SELECT u, CAST(1000000 AS BIGINT) AS r FROM deg),
         |r1 AS (SELECT e.v AS u,
         |  CAST(150000 + (85 * CAST(sum(r.r // g.d) AS BIGINT)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r0 r ON e.u = r.u JOIN deg g ON e.u = g.u GROUP BY e.v),
         |r2 AS (SELECT e.v AS u,
         |  CAST(150000 + (85 * CAST(sum(r.r // g.d) AS BIGINT)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r1 r ON e.u = r.u JOIN deg g ON e.u = g.u GROUP BY e.v),
         |r3 AS (SELECT e.v AS u,
         |  CAST(150000 + (85 * CAST(sum(r.r // g.d) AS BIGINT)) // 100 AS BIGINT) AS r
         |  FROM edges e JOIN r2 r ON e.u = r.u JOIN deg g ON e.u = g.u GROUP BY e.v)
         |SELECT u AS node,
         |  CASE WHEN u % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
         |  r AS rank_micro
         |FROM r3 ORDER BY rank_micro DESC, node LIMIT 20""".stripMargin,

    "q_transition_matrix" ->
      s"""WITH t AS (SELECT user_id, event_type,
         |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
         |    AS prev_type FROM events),
         |g AS (SELECT prev_type, event_type AS next_type,
         |  CAST(count(*) AS BIGINT) AS n FROM t WHERE prev_type IS NOT NULL
         |  GROUP BY 1, 2)
         |SELECT prev_type, next_type, n,
         |  CAST((n * 1000000) // CAST(sum(n) OVER (PARTITION BY prev_type)
         |    AS BIGINT) AS BIGINT) AS share_ppm
         |FROM g ORDER BY prev_type, next_type""".stripMargin,

    // last-touch attribution via DuckDB's native ASOF LEFT JOIN (>= is
    // inclusive on both sides, matching the engine's right-rows-first tie
    // order in the union-and-carry-forward plan)
    "q_attribution" ->
      s"""WITH c AS (SELECT user_id, ts, max(event_id) AS click_id,
         |  CAST(hour(ts) AS BIGINT) AS click_hour
         |  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
         |p AS (SELECT event_id, user_id, ts,
         |  CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |j AS (SELECT p.cents, c.click_hour FROM p ASOF LEFT JOIN c
         |  ON p.user_id = c.user_id AND p.ts >= c.ts)
         |SELECT coalesce(click_hour, -1) AS click_hour,
         |  CAST(count(*) AS BIGINT) AS n_purchases,
         |  CAST(sum(cents) AS BIGINT) AS revenue_cents
         |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,

    // remainders pinned to the LAST touch make per-purchase credit sums
    // exactly equal the revenue on both engines
    "q_mta" ->
      s"""WITH c AS (SELECT DISTINCT user_id, ts AS cts FROM events
         |  WHERE event_type = 'click'),
         |p AS (SELECT event_id AS pid, user_id, ts AS pts,
         |    CAST(floor(value * 100) AS BIGINT) AS cents
         |  FROM events WHERE event_type = 'purchase'),
         |t AS (SELECT pid, cents, cts,
         |    24 - (epoch_us(pts) - epoch_us(cts)) // 3600000000 AS w
         |  FROM p JOIN c USING (user_id)
         |  WHERE cts <= pts AND cts > pts - INTERVAL '24 hours'),
         |s1 AS (SELECT pid, cents, cts, w,
         |    CAST(count(*) OVER (PARTITION BY pid) AS BIGINT) AS k,
         |    CAST(sum(w) OVER (PARTITION BY pid) AS BIGINT) AS wsum,
         |    cts = max(cts) OVER (PARTITION BY pid) AS is_last
         |  FROM t),
         |s2 AS (SELECT *, cents // k AS lin0, cents * w // wsum AS dec0
         |  FROM s1),
         |s3 AS (SELECT *,
         |    CASE WHEN is_last THEN cents - (cents // k) * (k - 1)
         |      ELSE lin0 END AS lin,
         |    CASE WHEN is_last THEN
         |      cents - (sum(dec0) OVER (PARTITION BY pid) - dec0)
         |      ELSE dec0 END AS dec
         |  FROM s2),
         |orphan AS (SELECT -1 AS click_hour, cents AS lin, cents AS dec
         |  FROM p WHERE pid NOT IN (SELECT pid FROM t)),
         |u AS (SELECT CAST(hour(cts) AS BIGINT) AS click_hour, lin, dec
         |  FROM s3
         |  UNION ALL SELECT click_hour, lin, dec FROM orphan)
         |SELECT click_hour, CAST(count(*) AS BIGINT) AS n_credits,
         |  CAST(sum(lin) AS BIGINT) AS linear_cents,
         |  CAST(sum(dec) AS BIGINT) AS decay_cents
         |FROM u GROUP BY 1 ORDER BY 1""".stripMargin,

    // forward as-of via the portable rank form (earliest order ≥ event
    // day); unmatched events keep -1 markers as in q_asof_join
    "q_asof_forward" ->
      s"""WITH o AS (SELECT o_custkey AS user_id, CAST(o_orderdate AS DATE) AS d,
         |    CAST(min(o_orderkey) AS BIGINT) AS next_orderkey
         |  FROM orders GROUP BY 1, 2),
         |e AS (SELECT event_id, user_id, CAST(ts AS DATE) AS d FROM events),
         |j AS (SELECT e.event_id, e.user_id, e.d AS ed, o.d AS od,
         |    o.next_orderkey,
         |    row_number() OVER (PARTITION BY e.event_id ORDER BY o.d) AS rn
         |  FROM e LEFT JOIN o ON e.user_id = o.user_id AND o.d >= e.d)
         |SELECT event_id, user_id,
         |  coalesce(next_orderkey, -1) AS next_orderkey,
         |  CAST(CASE WHEN od IS NULL THEN -1
         |    ELSE date_diff('day', ed, od) END AS BIGINT) AS days_until
         |FROM j WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q_ivm_join" ->
      s"""WITH prof AS (SELECT o_custkey AS user_id,
         |    CAST(count(*) AS BIGINT) AS n_orders FROM orders GROUP BY 1)
         |SELECT event_type,
         |  CASE WHEN n_orders >= 12 THEN 'heavy' ELSE 'light' END AS tier,
         |  CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM events JOIN prof USING (user_id)
         |GROUP BY 1, 2 ORDER BY event_type, tier""".stripMargin,

    // max-CUSUM split: dev desc then idx asc picks the earliest maximal
    // deviation hour, matching the engine's (dev, -idx) struct-max. The
    // streaming twin drains identical hourly cells (commutative counts),
    // so both queries share this oracle verbatim.
    "q_changepoint" -> changepointSql,

    "q_stream_changepoint" -> changepointSql,

    "q_freshness" ->
      s"""WITH w AS (SELECT max(ts) AS wm FROM events)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_seen,
         |  CAST((epoch_us(max(wm)) - epoch_us(max(ts))) // 1000000 AS BIGINT)
         |    AS staleness_s,
         |  CAST(sum(CASE WHEN date_trunc('minute', ts) >
         |    wm - INTERVAL '24 hours' THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_last_day
         |FROM events, w GROUP BY event_type ORDER BY event_type""".stripMargin,

    // sweep-line: the oracle affords a single global running sum; the
    // engine computes the same curve via hour-block two-phase prefixes.
    // Tie order pinned (t, starts before ends, user, session)
    "q_concurrency" ->
      s"""WITH e AS (SELECT user_id, ts, event_id,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id, ts, event_id,
         |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |      THEN 1 ELSE 0 END AS new_sess FROM e),
         |t AS (SELECT user_id, ts,
         |    sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
         |  FROM s),
         |iv AS (SELECT user_id, sess_id, min(ts) AS st, max(ts) AS en
         |  FROM t GROUP BY 1, 2),
         |pts AS (SELECT st AS pt, CAST(1 AS BIGINT) AS d, user_id, sess_id FROM iv
         |  UNION ALL
         |  SELECT en, CAST(-1 AS BIGINT), user_id, sess_id FROM iv),
         |run AS (SELECT date_trunc('hour', pt) AS blk, d,
         |    CAST(sum(d) OVER (ORDER BY pt, d DESC, user_id, sess_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
         |  FROM pts)
         |SELECT strftime(blk, '%Y-%m-%d %H:%M:%S') AS hour,
         |  CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
         |  CAST(sum(CASE WHEN d = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
         |  CAST(max(c) AS BIGINT) AS peak_concurrency
         |FROM run GROUP BY blk ORDER BY hour""".stripMargin,

    "q_path_purchase" ->
      s"""WITH e AS (SELECT user_id, ts, event_id, event_type,
         |    lag(event_type, 1) OVER w AS p1,
         |    lag(event_type, 2) OVER w AS p2
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |paths AS (SELECT coalesce(p2, '^') || ' > ' || coalesce(p1, '^')
         |    || ' > ' || event_type AS path, CAST(count(*) AS BIGINT) AS n
         |  FROM e WHERE event_type = 'purchase' GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM paths)
         |SELECT path, n, CAST(n * 1000000 // total AS BIGINT) AS share_ppm
         |FROM paths, t ORDER BY n DESC, path LIMIT 20""".stripMargin,

    "q_benford" ->
      s"""WITH pos AS (SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |d AS (SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS BIGINT)
         |    AS digit, CAST(count(*) AS BIGINT) AS n
         |  FROM pos WHERE cents >= 1 GROUP BY 1),
         |t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM d),
         |exp_t(digit, exp_ppm) AS (VALUES (1, 301030), (2, 176091),
         |  (3, 124939), (4, 96910), (5, 79181), (6, 66947), (7, 57992),
         |  (8, 51153), (9, 45757))
         |SELECT d.digit, d.n,
         |  CAST(d.n * 1000000 // t.total AS BIGINT) AS obs_ppm,
         |  CAST(exp_ppm AS BIGINT) AS exp_ppm,
         |  CAST(abs(d.n * 1000000 // t.total - exp_ppm) AS BIGINT) AS dev_ppm,
         |  CAST(CASE WHEN abs(d.n * 1000000 // t.total - exp_ppm) > 20000
         |    THEN 1 ELSE 0 END AS BIGINT) AS flag
         |FROM d, t JOIN exp_t ON exp_t.digit = d.digit
         |ORDER BY d.digit""".stripMargin,

    // same XML envelopes rebuilt from the base table, parsed by regexp —
    // money rides as integer cents so the string render is engine-portable
    "q_xml_extract" ->
      s"""WITH x AS (SELECT '<o><k>' || o_orderkey || '</k><s>' || o_orderstatus
         |    || '</s><c>' || CAST(CAST(floor(o_totalprice*100) AS BIGINT) AS VARCHAR)
         |    || '</c></o>' AS xml, o_orderkey FROM orders),
         |parsed AS (SELECT
         |  CAST(regexp_extract(xml, '<k>([0-9]+)</k>', 1) AS BIGINT) AS k,
         |  regexp_extract(xml, '<s>([^<]*)</s>', 1) AS st,
         |  CAST(regexp_extract(xml, '<c>(-?[0-9]+)</c>', 1) AS BIGINT) AS c,
         |  o_orderkey FROM x)
         |SELECT st AS status, CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(c) AS BIGINT) AS cents
         |FROM parsed WHERE k = o_orderkey GROUP BY st ORDER BY st""".stripMargin,

    // GPT-style pack-then-slice: one flat window prefix sum (fine at
    // DuckDB scale; the engine computes it as a two-phase block sum)
    "q_pack_sequences" ->
      s"""WITH d AS (SELECT doc_id,
         |  CAST(len(list_filter(regexp_split_to_array(text, ' +'),
         |    w -> w <> '')) AS BIGINT) AS n FROM documents),
         |c AS (SELECT doc_id, n,
         |  CAST(coalesce(sum(n) OVER (ORDER BY doc_id
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cb
         |  FROM d WHERE n > 0),
         |x AS (SELECT doc_id, n, cb,
         |  unnest(range(cb // 256, (cb + n - 1) // 256 + 1)) AS seq FROM c)
         |SELECT seq AS seq_id, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(least(cb + n, (seq + 1) * 256) - greatest(cb, seq * 256))
         |    AS BIGINT) AS n_tokens,
         |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
         |FROM x GROUP BY seq ORDER BY seq""".stripMargin,

    // fixed-point BM25 (k1=1.2, b=0.75 cleared to integers, log-free
    // monotone idf) — the idf product routes through HUGEINT, mirroring
    // the engine's decimal(38,0), then truncates back to BIGINT
    "q_bm25" ->
      s"""WITH d AS ($TokList),
         |dl AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS dl FROM d),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS nn,
         |  CAST(sum(dl) AS BIGINT) AS ss FROM dl),
         |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, unnest(t) AS w FROM d)
         |  WHERE w IN ('spark', 'table', 'hash') GROUP BY doc_id, w),
         |dft AS (SELECT w, CAST(count(*) AS BIGINT) AS dfc FROM tf GROUP BY w),
         |sc AS (SELECT tf.doc_id,
         |  CAST(CAST((1000000 * (2*st.nn - 2*dft.dfc + 1)) // (2*dft.dfc + 1)
         |      AS HUGEINT) * (22 * st.ss * tf.tf)
         |    // (10 * st.ss * tf.tf + 3 * st.ss + 9 * dl.dl * st.nn)
         |    AS BIGINT) AS ts
         |  FROM tf JOIN dl USING (doc_id) JOIN dft ON tf.w = dft.w CROSS JOIN st)
         |SELECT doc_id, CAST(sum(ts) AS BIGINT) AS score FROM sc
         |GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 15""".stripMargin,

    // k-means topic labels: the shared unrolled-Lloyd CTE prefix gives the
    // final assignment; lift numerators route through HUGEINT (engine:
    // decimal(38,0))
    "q_cluster_labels" ->
      s"""$kmeansCtes,
         |asg AS (SELECT vec_id AS doc_id, cid FROM b${KmIters + 1} WHERE r = 1),
         |toks AS (SELECT a.cid, unnest(list_filter(
         |    regexp_split_to_array(d.text, '[^a-zA-Z]+'), w -> w <> '')) AS word
         |  FROM documents d JOIN asg a USING (doc_id)),
         |cw AS (SELECT cid, word, CAST(count(*) AS BIGINT) AS n_cw
         |  FROM toks GROUP BY cid, word),
         |c AS (SELECT cid, CAST(sum(n_cw) AS BIGINT) AS n_c FROM cw GROUP BY cid),
         |wt AS (SELECT word, CAST(sum(n_cw) AS BIGINT) AS n_w FROM cw GROUP BY word),
         |n AS (SELECT CAST(sum(n_cw) AS BIGINT) AS n_total FROM cw),
         |sc AS (SELECT cw.cid, cw.word, cw.n_cw,
         |  CAST((CAST(cw.n_cw AS HUGEINT) * n.n_total * 1000000)
         |    // (c.n_c * wt.n_w) AS BIGINT) AS lift_ppm
         |  FROM cw JOIN c USING (cid) JOIN wt USING (word) CROSS JOIN n
         |  WHERE cw.n_cw >= 5),
         |r AS (SELECT cid, word, n_cw, lift_ppm, CAST(row_number() OVER (
         |    PARTITION BY cid ORDER BY lift_ppm DESC, n_cw DESC, word)
         |  AS BIGINT) AS rank FROM sc)
         |SELECT cid, rank, word, n_cw, lift_ppm FROM r WHERE rank <= 3
         |ORDER BY cid, rank""".stripMargin,

    // data-profiling census — the oracle profiles column-by-column (the
    // engine does it in ONE scan; at DuckDB scale the union is fine);
    // l_quantity is integral-valued DOUBLE, routed through BIGINT.
    // Values travel as INJECTIVE LONGS on both sides (round 12: numeric
    // value, or the code point of the 1-char flags) — the sort order on
    // (k1, k2, v) decides which value sits at a duplicate-key boundary,
    // so engine and oracle must share the total order, and they now
    // share the integer one
    // round 13: ONE shared scan order for all five columns — ties on
    // (k1, k2) break by the full profiled-value tuple (v0..v4), exactly
    // the engine's single-window order (rows tying on all seven are
    // value-identical in every column, so run counts are well-defined)
    "q_encoding_stats" ->
      s"""WITH b AS (
         |  SELECT l_orderkey AS k1, l_linenumber AS k2,
         |    CAST(l_orderkey AS BIGINT) AS v0,
         |    CAST(l_partkey AS BIGINT) AS v1,
         |    CAST(l_quantity AS BIGINT) AS v2,
         |    CAST(ascii(l_returnflag) AS BIGINT) AS v3,
         |    CAST(ascii(l_linestatus) AS BIGINT) AS v4 FROM lineitem),
         |l AS (SELECT v0, v1, v2, v3, v4,
         |    lag(v0) OVER w AS p0, lag(v1) OVER w AS p1,
         |    lag(v2) OVER w AS p2, lag(v3) OVER w AS p3,
         |    lag(v4) OVER w AS p4
         |  FROM b WINDOW w AS (ORDER BY k1, k2, v0, v1, v2, v3, v4)),
         |runs AS (
         |  SELECT 'l_orderkey' AS c, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(CASE WHEN p0 IS NULL OR p0 <> v0 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_runs FROM l
         |  UNION ALL SELECT 'l_partkey', CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN p1 IS NULL OR p1 <> v1 THEN 1 ELSE 0 END)
         |      AS BIGINT) FROM l
         |  UNION ALL SELECT 'l_quantity', CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN p2 IS NULL OR p2 <> v2 THEN 1 ELSE 0 END)
         |      AS BIGINT) FROM l
         |  UNION ALL SELECT 'l_returnflag', CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN p3 IS NULL OR p3 <> v3 THEN 1 ELSE 0 END)
         |      AS BIGINT) FROM l
         |  UNION ALL SELECT 'l_linestatus', CAST(count(*) AS BIGINT),
         |    CAST(sum(CASE WHEN p4 IS NULL OR p4 <> v4 THEN 1 ELSE 0 END)
         |      AS BIGINT) FROM l),
         |d AS (
         |  SELECT 'l_orderkey' AS c,
         |    CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_distinct
         |  FROM lineitem
         |  UNION ALL SELECT 'l_partkey',
         |    CAST(count(DISTINCT l_partkey) AS BIGINT) FROM lineitem
         |  UNION ALL SELECT 'l_quantity',
         |    CAST(count(DISTINCT CAST(l_quantity AS BIGINT)) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL SELECT 'l_returnflag',
         |    CAST(count(DISTINCT ascii(l_returnflag)) AS BIGINT)
         |  FROM lineitem
         |  UNION ALL SELECT 'l_linestatus',
         |    CAST(count(DISTINCT ascii(l_linestatus)) AS BIGINT)
         |  FROM lineitem)
         |SELECT r.c AS column_name, r.n, d.n_distinct, r.n_runs,
         |  CAST(r.n * 100 // r.n_runs AS BIGINT) AS avg_run_x100,
         |  CASE WHEN r.n_runs * 8 <= r.n THEN 'rle'
         |       WHEN d.n_distinct * 256 <= r.n THEN 'dict'
         |       ELSE 'plain' END AS encoding
         |FROM runs r JOIN d USING (c) ORDER BY column_name""".stripMargin,

    "q_profile" ->
      s"""SELECT * FROM (
         |  SELECT 'l_partkey' AS col_name,
         |    CAST(count(l_partkey) AS BIGINT) AS n_nonnull,
         |    CAST(count(DISTINCT l_partkey) AS BIGINT) AS n_distinct,
         |    CAST(CAST(min(l_partkey) AS BIGINT) AS VARCHAR) AS min_val,
         |    CAST(CAST(max(l_partkey) AS BIGINT) AS VARCHAR) AS max_val
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_quantity',
         |    CAST(count(l_quantity) AS BIGINT),
         |    CAST(count(DISTINCT l_quantity) AS BIGINT),
         |    CAST(CAST(min(l_quantity) AS BIGINT) AS VARCHAR),
         |    CAST(CAST(max(l_quantity) AS BIGINT) AS VARCHAR)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_returnflag',
         |    CAST(count(l_returnflag) AS BIGINT),
         |    CAST(count(DISTINCT l_returnflag) AS BIGINT),
         |    min(l_returnflag), max(l_returnflag)
         |  FROM lineitem
         |  UNION ALL
         |  SELECT 'l_shipdate',
         |    CAST(count(l_shipdate) AS BIGINT),
         |    CAST(count(DISTINCT l_shipdate) AS BIGINT),
         |    strftime(min(l_shipdate), '%Y-%m-%d %H:%M:%S'),
         |    strftime(max(l_shipdate), '%Y-%m-%d %H:%M:%S')
         |  FROM lineitem) p ORDER BY col_name""".stripMargin,

    // α=0.5 temperature mixing: floor(sqrt) is exact in both engines
    // (IEEE sqrt is correctly rounded), shares are integer div
    "q_temperature_mix" ->
      s"""WITH l AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY lang),
         |w AS (SELECT lang, n_docs,
         |  CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS weight FROM l),
         |t AS (SELECT CAST(sum(weight) AS BIGINT) AS w_tot FROM w)
         |SELECT lang, n_docs, weight,
         |  CAST((weight * 1000000) // w_tot AS BIGINT) AS share_ppm,
         |  CAST((weight * 100000) // w_tot AS BIGINT) AS target_docs
         |FROM w CROSS JOIN t ORDER BY lang""".stripMargin,

    // OOV-bigram fluency filter: top-200 bigram vocabulary (ties broken
    // lexicographically on both sides), exact integer ppm OOV fraction
    "q_oov_filter" ->
      s"""WITH d AS ($TokList),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
         |  i -> t[i] || ' ' || t[i+1])) AS bigram FROM d),
         |top AS (SELECT bigram FROM (
         |  SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
         |  ORDER BY cnt DESC, bigram LIMIT 200) v),
         |sc AS (SELECT bg.doc_id, CAST(count(*) AS BIGINT) AS n_bg,
         |  CAST(sum(CASE WHEN t.bigram IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         |  FROM bg LEFT JOIN top t ON bg.bigram = t.bigram GROUP BY bg.doc_id)
         |SELECT doc_id, n_bg, n_oov,
         |  CAST((n_oov * 1000000) // n_bg AS BIGINT) AS oov_ppm
         |FROM sc ORDER BY oov_ppm DESC, doc_id LIMIT 25""".stripMargin,

    // span-level verbatim dedup: 20-token windows, stride 1; a doc is
    // flagged when a lower-id doc owns one of its span hashes
    "q_substring_dedup" ->
      s"""WITH d AS (SELECT doc_id, list_filter(
         |    regexp_split_to_array(text, '[^a-zA-Z]+'), w -> w <> '') AS t
         |  FROM documents),
         |sp AS (SELECT DISTINCT doc_id, ${polyHashSql("span")} AS h FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, len(t) - 18),
         |    i -> array_to_string(t[i:i+19], ' '))) AS span
         |  FROM d WHERE len(t) >= 20) y),
         |own AS (SELECT h, min(doc_id) AS owner, count(*) AS nd
         |  FROM sp GROUP BY h)
         |SELECT sp.doc_id, CAST(count(*) AS BIGINT) AS n_dup_spans,
         |  min(owner) AS first_witness
         |FROM sp JOIN own USING (h) WHERE own.nd > 1 AND sp.doc_id > own.owner
         |GROUP BY sp.doc_id ORDER BY sp.doc_id""".stripMargin,

    "q_shard_export" ->
      s"""SELECT ${polyHashSql("text")} % 16 AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CAST(len(list_filter(regexp_split_to_array(text, ' +'),
         |    w -> w <> '')) AS BIGINT)) AS BIGINT) AS n_tokens,
         |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
         |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM documents GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_schema_evolution" ->
      s"""WITH m AS (
         |  SELECT o_orderkey, o_totalprice, NULL AS st FROM orders WHERE o_orderkey % 3 = 0
         |  UNION ALL
         |  SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders WHERE o_orderkey % 3 = 1)
         |SELECT COALESCE(st, 'unknown') AS status, count(*) AS n,
         |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_gaps_islands" ->
      s"""WITH d AS (SELECT DISTINCT user_id,
         |  CAST(datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
         |  FROM events),
         |i AS (SELECT user_id, d,
         |  d - row_number() OVER (PARTITION BY user_id ORDER BY d) AS isl FROM d)
         |SELECT user_id, min(d) AS start_d, max(d) AS end_d, count(*) AS len
         |FROM i GROUP BY user_id, isl ORDER BY user_id, start_d""".stripMargin,

    "q_retention" ->
      s"""WITH ev AS (SELECT DISTINCT user_id,
         |  CAST(datediff('day', DATE '1990-01-01', CAST(ts AS DATE)) AS BIGINT) AS d
         |  FROM events),
         |fw AS (SELECT user_id, min(d) AS cohort FROM ev GROUP BY user_id),
         |cells AS (SELECT cohort, ev.d - cohort AS "offset", count(*) AS n_active
         |  FROM ev JOIN fw ON ev.user_id = fw.user_id GROUP BY 1, 2),
         |sz AS (SELECT cohort, count(*) AS n_cohort FROM fw GROUP BY cohort)
         |SELECT cells.cohort, "offset", n_active, n_cohort,
         |  CAST(n_active AS DOUBLE)/CAST(n_cohort AS DOUBLE) AS retained_frac
         |FROM cells JOIN sz ON cells.cohort = sz.cohort
         |ORDER BY cells.cohort, "offset"""".stripMargin,

    "q_funnel" ->
      s"""WITH v AS (SELECT user_id, min(ts) AS t_view FROM events
         |  WHERE event_type = 'view' GROUP BY user_id),
         |c AS (SELECT e.user_id, min(e.ts) AS t_click FROM events e
         |  JOIN v ON e.user_id = v.user_id
         |  WHERE e.event_type = 'click' AND e.ts >= v.t_view
         |    AND e.ts <= v.t_view + INTERVAL 1 DAY GROUP BY e.user_id),
         |p AS (SELECT e.user_id, min(e.ts) AS t_purchase FROM events e
         |  JOIN c ON e.user_id = c.user_id
         |  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
         |    AND e.ts <= c.t_click + INTERVAL 1 DAY GROUP BY e.user_id),
         |u AS (SELECT DISTINCT user_id FROM events),
         |st AS (SELECT u.user_id,
         |  CAST(CASE WHEN v.user_id IS NULL THEN 0 ELSE 1 END
         |     + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
         |     + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS stage
         |  FROM u LEFT JOIN v ON u.user_id = v.user_id
         |    LEFT JOIN c ON u.user_id = c.user_id
         |    LEFT JOIN p ON u.user_id = p.user_id)
         |SELECT stage, count(*) AS n_users FROM st GROUP BY stage ORDER BY stage""".stripMargin,

    "q_scd2" ->
      s"""WITH e AS (SELECT user_id, ts, event_id, event_type,
         |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
         |  FROM events),
         |c AS (SELECT user_id, ts, event_id, event_type FROM e
         |  WHERE prev IS NULL OR prev <> event_type),
         |v AS (SELECT user_id, event_id, event_type, ts,
         |    lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS vt
         |  FROM c)
         |SELECT user_id, event_id, event_type,
         |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
         |  COALESCE(strftime(vt, '%Y-%m-%d %H:%M:%S'), '9999-12-31 23:59:59') AS valid_to,
         |  vt IS NULL AS is_current
         |FROM v ORDER BY user_id, valid_from, event_id""".stripMargin,

    "q_range_join" ->
      s"""SELECT a.event_type, count(*) AS n_pairs
         |FROM events a JOIN events b ON a.event_type = b.event_type
         |  AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL '5 minutes'
         |GROUP BY a.event_type ORDER BY a.event_type""".stripMargin,

    // ------------------------------------------------------ LLM pipeline
    "q_dedup_exact" ->
      s"""SELECT sha256(text) AS h, min(doc_id) AS keep_id, count(*) AS n_copies
         |FROM documents GROUP BY sha256(text) ORDER BY h""".stripMargin,

    // shingles hashed to int64 exactly like the engine (polyHash) so the
    // rare hash collisions are reproduced bit-for-bit on both sides
    "q_dedup_ngram" -> DedupNgramSql,

    // df-cap self-report: distinct/pairable/capped shingle-key census +
    // the emitted pair count — the 1-row signal that fires when the cap
    // goes recall-blind under mass duplication
    "q_dedup_ngram_census" ->
      s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |shs AS (SELECT DISTINCT doc_id, h FROM (
         |  SELECT doc_id, ${polyHashSql("sh")} AS h FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) y) z),
         |pk AS (SELECT h, count(*) AS ndocs FROM shs GROUP BY h),
         |cz AS (SELECT CAST(count(*) AS BIGINT) AS n_keys,
         |    CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_multi,
         |    CAST(sum(CASE WHEN ndocs > 100 THEN 1 ELSE 0 END) AS BIGINT) AS n_capped
         |  FROM pk),
         |np AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM ($DedupNgramSql) p)
         |SELECT n_keys, n_multi, n_capped,
         |  CASE WHEN n_multi > 0
         |    THEN CAST(n_capped AS DOUBLE) * 1000000.0 / CAST(n_multi AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS capped_ppm,
         |  n_pairs,
         |  CASE WHEN (CASE WHEN n_multi > 0
         |    THEN CAST(n_capped AS DOUBLE) * 1000000.0 / CAST(n_multi AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END) > 100000.0
         |    THEN 'use_minhash' ELSE 'ok' END AS advice
         |FROM cz, np""".stripMargin,

    "q_dedup_containment" -> DedupContainmentSql,

    // connected components over the near-dup pair graph: a recursive CTE
    // computes the exact transitive min-label; the engine's fixed-round
    // min propagation must agree (spec also cross-checks via union-find)
    "q_dedup_clusters" -> DedupClustersSql,

    // the corpus filter the clusters exist for: drop every non-canonical
    // cluster member, count the kept corpus per language
    "q_dedup_apply" ->
      s"""SELECT lang, count(*) AS n_kept FROM documents
         |WHERE doc_id NOT IN (
         |  SELECT doc_id FROM ($DedupClustersSql) c WHERE doc_id <> cluster_id)
         |GROUP BY lang ORDER BY lang""".stripMargin,

    // quality-argmax canonical per cluster: row_number ordered by
    // (score DESC, doc_id) replays the engine's max(struct(score, -id))
    "q_dedup_keep_best" ->
      s"""WITH $QualityScoreCtes,
         |clusters AS (SELECT * FROM ($DedupClustersSql) x),
         |j AS (SELECT c.cluster_id, c.doc_id, sc.score
         |  FROM clusters c JOIN sc ON c.doc_id = sc.doc_id),
         |r AS (SELECT cluster_id, doc_id, score,
         |    row_number() OVER (PARTITION BY cluster_id
         |      ORDER BY score DESC, doc_id) AS rk,
         |    count(*) OVER (PARTITION BY cluster_id) AS nm FROM j)
         |SELECT cluster_id, CAST(nm AS BIGINT) AS n_members,
         |  doc_id AS kept_doc, CAST(score * 100 AS BIGINT) AS kept_score_pct,
         |  cluster_id <> doc_id AS changed
         |FROM r WHERE rk = 1 ORDER BY cluster_id""".stripMargin,

    "q_dedup_minhash" ->
      (MinhashCtes + "\n" +
        s"""SELECT c.doc_a, c.doc_b,
           |  CAST(coalesce(cm.common, 0) AS DOUBLE) /
           |    CAST(sa.sz + sb.sz - coalesce(cm.common, 0) AS DOUBLE) AS jaccard
           |FROM cand c
           |LEFT JOIN common cm ON c.doc_a = cm.doc_a AND c.doc_b = cm.doc_b
           |JOIN sizes sa ON c.doc_a = sa.doc_id JOIN sizes sb ON c.doc_b = sb.doc_id
           |ORDER BY c.doc_a, c.doc_b""".stripMargin),

    // the minhash CTE chain extended with the signature-agreement
    // estimator: n_agree of 64 permutation minima vs the exact Jaccard
    "q_minhash_error" ->
      (MinhashCtes + ",\n" +
        s"""jc AS (SELECT c.doc_a, c.doc_b,
           |  CAST(coalesce(cm.common, 0) AS DOUBLE) /
           |    CAST(sa.sz + sb.sz - coalesce(cm.common, 0) AS DOUBLE) AS jaccard
           |  FROM cand c
           |  LEFT JOIN common cm ON c.doc_a = cm.doc_a AND c.doc_b = cm.doc_b
           |  JOIN sizes sa ON c.doc_a = sa.doc_id JOIN sizes sb ON c.doc_b = sb.doc_id),
           |m AS (SELECT j.doc_a, j.doc_b,
           |  CAST(count(*) FILTER (pa.mv = pb.mv) AS BIGINT) AS n_agree
           |  FROM jc j JOIN perms pa ON pa.doc_id = j.doc_a
           |  JOIN perms pb ON pb.doc_id = j.doc_b AND pb.i = pa.i
           |  GROUP BY j.doc_a, j.doc_b)
           |SELECT j.doc_a, j.doc_b, n_agree,
           |  CAST(n_agree AS DOUBLE) / 64.0 AS jaccard_est, j.jaccard,
           |  abs(CAST(n_agree AS DOUBLE) / 64.0 - j.jaccard) AS abs_err
           |FROM jc j JOIN m ON j.doc_a = m.doc_a AND j.doc_b = m.doc_b
           |ORDER BY j.doc_a, j.doc_b""".stripMargin),

    // same band construction as q_dedup_minhash, split into an index side
    // (doc_id % 4 <> 3) and a probe side (doc_id % 4 = 3)
    "q_dedup_incremental" ->
      s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |shs AS (SELECT DISTINCT doc_id, sh FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) z),
         |hashed AS (SELECT doc_id, ${polyHashSql("sh")} AS h1,
         |  ${polyHashSql("sh", 131, 1000000009L)} AS h2 FROM shs),
         |perms AS (SELECT doc_id, i, min((h1 + i*h2) % 2147483647) AS mv
         |  FROM hashed, (SELECT unnest(range(0,64)) AS i) ii GROUP BY doc_id, i),
         |bands AS (SELECT doc_id, i // 4 AS b,
         |    string_agg(CAST(mv AS VARCHAR), ',' ORDER BY i) AS key
         |  FROM perms GROUP BY doc_id, i // 4),
         |probe AS (SELECT doc_id, b, key FROM bands WHERE doc_id % 4 = 3),
         |idx AS (SELECT doc_id AS index_doc, b, key FROM bands WHERE doc_id % 4 <> 3)
         |SELECT p.doc_id,
         |  CAST(count(DISTINCT i.index_doc) AS BIGINT) AS n_index_matches,
         |  min(i.index_doc) AS first_match
         |FROM probe p JOIN idx i ON p.b = i.b AND p.key = i.key
         |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin,

    // split by near-dup cluster representative so cluster members always
    // co-assign; buckets 80/10/10 by the Knuth multiplicative hash
    "q_leakage_split" ->
      s"""WITH cl AS (SELECT * FROM ($DedupClustersSql) c),
         |a AS (SELECT d.doc_id, d.lang, coalesce(cl.cluster_id, d.doc_id) AS rep_id
         |  FROM documents d LEFT JOIN cl USING (doc_id))
         |SELECT doc_id, lang, rep_id,
         |  CASE WHEN (rep_id * 2654435761) % 100 < 80 THEN 'train'
         |       WHEN (rep_id * 2654435761) % 100 < 90 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM a ORDER BY doc_id""".stripMargin,

    "q_split_parity" ->
      s"""WITH cl AS (SELECT * FROM ($DedupClustersSql) c),
         |a AS (SELECT d.doc_id, d.lang, d.n_chars,
         |    coalesce(cl.cluster_id, d.doc_id) AS rep_id
         |  FROM documents d LEFT JOIN cl USING (doc_id)),
         |sp AS (SELECT doc_id, lang, n_chars,
         |    CASE WHEN (rep_id * 2654435761) % 100 < 80 THEN 'train'
         |         WHEN (rep_id * 2654435761) % 100 < 90 THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM a),
         |u AS (SELECT split, 'lang' AS dim, lang AS v FROM sp
         |    WHERE split <> 'val'
         |  UNION ALL
         |  SELECT split, 'len_bucket',
         |    CAST(least(9, n_chars // 200) AS VARCHAR) FROM sp
         |    WHERE split <> 'val'),
         |cells AS (SELECT dim, v,
         |    CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS ntr,
         |    CAST(sum(CASE WHEN split = 'test' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS nte
         |  FROM u GROUP BY dim, v),
         |t AS (SELECT dim, CAST(sum(ntr) AS BIGINT) AS ttr,
         |    CAST(sum(nte) AS BIGINT) AS tte FROM cells GROUP BY dim)
         |SELECT dim AS dimension, max(ttr) AS n_train, max(tte) AS n_test,
         |  CAST(sum(abs(ntr * 1000000 // ttr - nte * 1000000 // tte)) // 2
         |    AS BIGINT) AS tvd_ppm
         |FROM cells JOIN t USING (dim)
         |GROUP BY dim ORDER BY dimension""".stripMargin,

    "q_syndication" ->
      s"""WITH np AS (SELECT doc_a, doc_b FROM ($DedupNgramSql) g),
         |s AS (SELECT doc_id, source FROM documents)
         |SELECT source_a, source_b, CAST(count(*) AS BIGINT) AS n_pairs,
         |  source_a <> source_b AS cross_source
         |FROM (SELECT least(sa.source, sb.source) AS source_a,
         |        greatest(sa.source, sb.source) AS source_b
         |      FROM np JOIN s sa ON np.doc_a = sa.doc_id
         |      JOIN s sb ON np.doc_b = sb.doc_id) z
         |GROUP BY source_a, source_b ORDER BY source_a, source_b""".stripMargin,

    // sequential stages: exact dedup keeps min doc_id per content hash,
    // near-dup removal then counts only those canonical survivors
    "q_dedup_funnel" ->
      s"""WITH t AS (SELECT CAST(count(*) AS BIGINT) AS n_raw,
         |    CAST(count(DISTINCT sha256(text)) AS BIGINT) AS n_exact FROM documents),
         |k AS (SELECT min(doc_id) AS doc_id FROM documents GROUP BY sha256(text)),
         |dl AS (SELECT doc_id FROM ($DedupClustersSql) c WHERE doc_id <> cluster_id),
         |r AS (SELECT CAST(count(*) AS BIGINT) AS n_nd
         |  FROM k JOIN dl USING (doc_id))
         |SELECT * FROM (
         |  SELECT CAST(0 AS BIGINT) AS stage, 'raw' AS name, n_raw AS n_docs,
         |    CAST(0 AS BIGINT) AS n_removed FROM t
         |  UNION ALL SELECT CAST(1 AS BIGINT), 'exact', n_exact, n_raw - n_exact FROM t
         |  UNION ALL SELECT CAST(2 AS BIGINT), 'neardup', n_exact - n_nd, n_nd
         |    FROM t, r) z
         |ORDER BY stage""".stripMargin,

    // per-document funnel lineage: sequential-stage disposition + the
    // surviving canonical representative (exact stage wins ties)
    "q_dedup_lineage" ->
      s"""WITH hx AS (SELECT doc_id, sha256(text) AS h FROM documents),
         |cx AS (SELECT h, min(doc_id) AS canon FROM hx GROUP BY h),
         |ex AS (SELECT doc_id, canon FROM hx JOIN cx USING (h)),
         |dl AS (SELECT doc_id, cluster_id FROM ($DedupClustersSql) c2
         |  WHERE doc_id <> cluster_id)
         |SELECT ex.doc_id,
         |  CASE WHEN ex.doc_id <> ex.canon THEN 'exact'
         |       WHEN dl.cluster_id IS NOT NULL THEN 'neardup'
         |       ELSE 'kept' END AS dropped_by,
         |  CAST(CASE WHEN ex.doc_id <> ex.canon THEN ex.canon
         |       WHEN dl.cluster_id IS NOT NULL THEN dl.cluster_id
         |       ELSE ex.doc_id END AS BIGINT) AS canonical
         |FROM ex LEFT JOIN dl ON ex.doc_id = dl.doc_id
         |ORDER BY ex.doc_id""".stripMargin,

    // content-hash CDC between the two deterministic snapshot slices
    "q_snapshot_diff" ->
      s"""WITH o AS (SELECT doc_id, lang, sha256(text) AS h FROM documents
         |    WHERE doc_id % 4 <> 3),
         |n AS (SELECT doc_id, lang, sha256(text) AS h FROM documents
         |    WHERE doc_id % 4 <> 0),
         |j AS (SELECT coalesce(n.lang, o.lang) AS lang,
         |    CASE WHEN o.h IS NULL THEN 'added' WHEN n.h IS NULL THEN 'removed'
         |         WHEN o.h = n.h THEN 'unchanged' ELSE 'changed' END AS status
         |  FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id)
         |SELECT lang, status, CAST(count(*) AS BIGINT) AS n_docs
         |FROM j GROUP BY lang, status ORDER BY lang, status""".stripMargin,

    // grams keyed by the same portable polyHash as the engine, so the
    // rare collisions are reproduced bit-for-bit and counts stay exact
    "q_ngram_diversity" ->
      s"""WITH d AS ($TokList),
         |g AS (
         |  SELECT lang, CAST(1 AS BIGINT) AS n, unnest(t) AS g FROM d
         |  UNION ALL
         |  SELECT lang, CAST(2 AS BIGINT), unnest(list_transform(
         |    range(1, greatest(len(t), 1)), i -> t[i] || ' ' || t[i+1])) FROM d
         |  UNION ALL
         |  SELECT lang, CAST(3 AS BIGINT), unnest(list_transform(
         |    range(1, greatest(len(t)-1, 1)),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) FROM d),
         |h AS (SELECT lang, n, ${polyHashSql("g")} AS h FROM g),
         |c AS (SELECT lang, n, h, count(*) AS c FROM h GROUP BY lang, n, h)
         |SELECT lang, n, CAST(sum(c) AS BIGINT) AS n_total,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(count(*) AS DOUBLE) / CAST(sum(c) AS DOUBLE) AS diversity
         |FROM c GROUP BY lang, n ORDER BY lang, n""".stripMargin,

    // self-trained bigram MLE; score = mean(ln cu - ln cb) per doc,
    // rounded to 4 decimals (order-sensitive float sum, house discipline)
    "q_doc_perplexity" ->
      """WITH d AS (SELECT doc_id, lang, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
        |    w -> w <> '') AS t FROM documents),
        |bg AS (SELECT doc_id, lang, t[i] AS w1, t[i+1] AS w2 FROM
        |  (SELECT doc_id, lang, t, unnest(range(1, len(t))) AS i FROM d WHERE len(t) >= 2) z),
        |lm AS (SELECT w1, w2, count(*) AS cb FROM bg GROUP BY w1, w2),
        |ctx AS (SELECT w1, CAST(sum(cb) AS BIGINT) AS cu FROM lm GROUP BY w1),
        |sc AS (SELECT l.w1, l.w2,
        |  ln(CAST(cu AS DOUBLE)) - ln(CAST(cb AS DOUBLE)) AS nll
        |  FROM lm l JOIN ctx USING (w1)),
        |p AS (SELECT doc_id, lang, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  sum(nll) AS sum_nll
        |  FROM bg JOIN sc USING (w1, w2) GROUP BY doc_id, lang)
        |SELECT doc_id, lang, n_bigrams, round(sum_nll / n_bigrams, 4) AS avg_nll
        |FROM p ORDER BY avg_nll DESC, doc_id LIMIT 25""".stripMargin,

    "q_simhash" ->
      s"""WITH tok AS (SELECT doc_id, word, count(*) AS cnt FROM ($Toks) t
         |  WHERE word <> '' GROUP BY doc_id, word),
         |h AS (SELECT doc_id, cnt, ${polyHashSql("word")} AS h FROM tok),
         |bits AS (SELECT doc_id, b,
         |    sum(CASE WHEN (h >> b) & 1 = 1 THEN cnt ELSE -cnt END) AS sc
         |  FROM h, (SELECT unnest(range(0,32)) AS b) bb GROUP BY doc_id, b)
         |SELECT doc_id,
         |  CAST(sum(CASE WHEN sc > 0 THEN (CAST(1 AS BIGINT) << b) ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS simhash
         |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_text_stats" ->
      s"""WITH d AS ($TokList),
         |s AS (SELECT doc_id,
         |  CAST(length(text) AS BIGINT) AS n_chars,
         |  CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct,
         |  CAST(length(text) - length(regexp_replace(text,'[.,]','','g')) AS BIGINT) AS n_punct,
         |  CAST(length(regexp_replace(text,'[^a-zA-Z]','','g')) AS BIGINT) AS sum_token_len
         |FROM d)
         |SELECT doc_id, n_chars, n_tokens, n_distinct, n_punct, sum_token_len,
         |  CAST(sum_token_len AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS avg_token_len,
         |  CAST(n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE) AS ttr
         |FROM s ORDER BY doc_id""".stripMargin,

    "q_quality_score" ->
      s"""WITH $QualityScoreCtes
         |SELECT doc_id, n_tokens, n_stop, n_punct, score, score >= 0.75 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin,

    "q_char_diversity" ->
      s"""WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '[^\\n]')) AS c
         |  FROM documents),
         |per AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
         |agg AS (SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_chars,
         |  CAST(count(*) AS BIGINT) AS n_distinct,
         |  CAST(sum(n * n) AS BIGINT) AS sum_sq FROM per GROUP BY doc_id)
         |SELECT d.doc_id, COALESCE(agg.n_chars, 0) AS n_chars,
         |  COALESCE(agg.n_distinct, 0) AS n_distinct,
         |  COALESCE(agg.sum_sq, 0) AS sum_sq,
         |  CASE WHEN agg.n_chars > 0
         |    THEN 1 - CAST(agg.sum_sq AS DOUBLE)/CAST(agg.n_chars * agg.n_chars AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS gini
         |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
         |ORDER BY d.doc_id""".stripMargin,

    // shingle CTE mirrors DedupNgramSql's shs exactly (same hash, same
    // distinct point) so the int64 shingle identities — collisions and
    // all — reproduce bit-for-bit
    "q_importance_sample" ->
      s"""SELECT doc_id, lang, n_chars,
         |  least(CAST(1.0 AS DOUBLE), CAST(n_chars AS DOUBLE)/1500.0) AS weight
         |FROM documents
         |WHERE CAST(${polyHashSql("text")} % 1000000 AS DOUBLE)
         |  < 1000000.0 * least(CAST(1.0 AS DOUBLE), CAST(n_chars AS DOUBLE)/1500.0)
         |ORDER BY doc_id""".stripMargin,

    "q_embedding_quantize" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |m AS (SELECT vec_id, v, list_min(v) AS minv, list_max(v) AS maxv FROM e),
         |sc AS (SELECT vec_id, v, minv, maxv, (maxv - minv)/255.0 AS scale FROM m)
         |SELECT vec_id, minv, maxv, scale,
         |  CASE WHEN scale = 0 THEN CAST(0.0 AS DOUBLE) ELSE
         |    list_max(list_transform(v, x -> abs(x - (minv +
         |      greatest(least(floor((x - minv)/scale + 0.5), 255.0), 0.0) * scale))))
         |  END AS max_abs_err
         |FROM sc ORDER BY vec_id""".stripMargin,

    "q_decontamination" ->
      s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |shs AS (SELECT DISTINCT doc_id, h FROM (
         |  SELECT doc_id, ${polyHashSql("sh")} AS h FROM (
         |    SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) y) z),
         |sp AS (SELECT doc_id, ${polyHashSql("text")} % 10 AS b FROM documents),
         |test AS (SELECT doc_id FROM sp WHERE b = 0),
         |trainsh AS (SELECT DISTINCT h FROM shs JOIN sp USING (doc_id) WHERE b <> 0),
         |testsh AS (SELECT shs.doc_id, h FROM shs JOIN test USING (doc_id)),
         |cnt AS (SELECT doc_id, count(*) AS n_shingles FROM testsh GROUP BY doc_id),
         |shr AS (SELECT doc_id, count(*) AS n_shared
         |  FROM testsh JOIN trainsh USING (h) GROUP BY doc_id)
         |SELECT cnt.doc_id, n_shingles, COALESCE(n_shared, 0) AS n_shared,
         |  CAST(COALESCE(n_shared, 0) AS DOUBLE)/CAST(n_shingles AS DOUBLE) AS overlap_frac,
         |  CAST(COALESCE(n_shared, 0) AS DOUBLE)/CAST(n_shingles AS DOUBLE) >= 0.6 AS contaminated
         |FROM cnt LEFT JOIN shr ON cnt.doc_id = shr.doc_id
         |ORDER BY cnt.doc_id""".stripMargin,

    "q_gopher_quality" ->
      s"""WITH d AS ($TokList),
         |s AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(len(list_distinct(t)) AS BIGINT) AS n_distinct FROM d),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
         |  i -> t[i] || ' ' || t[i+1])) AS bg FROM d),
         |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg GROUP BY doc_id, bg),
         |bm AS (SELECT doc_id, CAST(max(c) AS BIGINT) AS top_bigram_n FROM bc GROUP BY doc_id),
         |j AS (SELECT s.doc_id, n_tokens,
         |  CASE WHEN n_tokens > 0
         |    THEN CAST(n_distinct AS DOUBLE)/CAST(n_tokens AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS distinct_frac,
         |  COALESCE(top_bigram_n, 0) AS top_bigram_n,
         |  CASE WHEN n_tokens > 1
         |    THEN CAST(COALESCE(top_bigram_n, 0) AS DOUBLE)/CAST(n_tokens - 1 AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS top_bigram_frac
         |FROM s LEFT JOIN bm ON s.doc_id = bm.doc_id)
         |SELECT doc_id, n_tokens, distinct_frac, top_bigram_n, top_bigram_frac,
         |  distinct_frac > 0.3 AND top_bigram_frac < 0.2 AS keep
         |FROM j ORDER BY doc_id""".stripMargin,

    // groups by the 5-gram TEXT where the engine groups by xxhash64(gram)
    // — identical groups absent a 64-bit collision within one document;
    // range(1, len(t)-3) is empty for len(t) < 5, so short docs emit no
    // grams and fall to the LEFT JOIN's zero
    "q_repetition_filter" ->
      s"""WITH d AS ($TokList),
         |b AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |  CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS BIGINT)
         |    AS sum_token_len FROM d),
         |g AS (SELECT doc_id, unnest(list_transform(range(1, len(t) - 3),
         |  i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]
         |     || ' ' || t[i+4])) AS g FROM d),
         |c AS (SELECT doc_id, g, count(*) AS c,
         |  CAST(max(length(g)) - 4 AS BIGINT) AS glen
         |  FROM g GROUP BY doc_id, g),
         |dup AS (SELECT doc_id, CAST(sum(c * glen) AS BIGINT) AS dup_chars
         |  FROM c WHERE c > 1 GROUP BY doc_id)
         |SELECT b.doc_id, n_tokens, sum_token_len,
         |  COALESCE(dup_chars, 0) AS dup_5gram_chars,
         |  CASE WHEN sum_token_len > 0
         |    THEN CAST(COALESCE(dup_chars, 0) AS DOUBLE)/CAST(sum_token_len AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS dup_frac,
         |  CASE WHEN sum_token_len > 0
         |    THEN CAST(COALESCE(dup_chars, 0) AS DOUBLE)/CAST(sum_token_len AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END < 0.3 AS keep
         |FROM b LEFT JOIN dup ON b.doc_id = dup.doc_id
         |ORDER BY b.doc_id""".stripMargin,

    // same multiplicative hash (Knuth 2654435761 mod 2^32) on both sides;
    // doc_id tiebreak makes the per-source ranking total
    "q_domain_cap" ->
      """WITH r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
        |  FROM documents)
        |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 15 ORDER BY source, rk""".stripMargin,

    // sequential Poisson priority u/w: both operands exactly-representable
    // doubles, so the IEEE division (and the kept set) is bit-identical;
    // DuckDB's BIGINT / INT division is float division like Spark's
    // double-cast form
    "q_pps_sample" ->
      """WITH r AS (SELECT lang, doc_id, n_chars,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / n_chars,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT lang, doc_id, n_chars, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin,

    // order-statistic gates (values AT a rank), so tie order inside equal
    // n_chars is irrelevant and the census hash-checks unrounded
    "q_adaptive_filter" ->
      """WITH d AS (SELECT doc_id, lang, n_chars FROM documents),
        |r AS (SELECT lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n FROM d),
        |g AS (SELECT lang,
        |  max(CASE WHEN rn = ceil(CAST(0.05 AS DOUBLE) * n) THEN n_chars END) AS lo,
        |  max(CASE WHEN rn = ceil(CAST(0.95 AS DOUBLE) * n) THEN n_chars END) AS hi
        |  FROM r GROUP BY lang)
        |SELECT d.lang, max(g.lo) AS lo, max(g.hi) AS hi,
        |  CAST(sum(CASE WHEN d.n_chars < g.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_short,
        |  CAST(sum(CASE WHEN d.n_chars > g.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_long,
        |  CAST(sum(CASE WHEN d.n_chars BETWEEN g.lo AND g.hi THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_kept
        |FROM d JOIN g ON d.lang = g.lang
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin,

    // local slopes are per-row ratios of logs of exact ints (no cross-row
    // float accumulation); round 4dp absorbs cross-engine ln() ulps
    "q_zipf" ->
      s"""WITH wc AS (SELECT word, count(*) AS cnt FROM ($Toks) t
         |  WHERE word <> '' GROUP BY word),
         |r AS (SELECT word, cnt,
         |  CAST(row_number() OVER (ORDER BY cnt DESC, word) AS BIGINT) AS rank
         |  FROM wc QUALIFY rank <= 30)
         |SELECT rank, word, cnt,
         |  coalesce(round((ln(CAST(cnt AS DOUBLE)) - ln(CAST(lag(cnt) OVER w AS DOUBLE))) /
         |        (ln(CAST(rank AS DOUBLE)) - ln(CAST(lag(rank) OVER w AS DOUBLE))), 4), 0.0)
         |    AS local_slope
         |FROM r WINDOW w AS (ORDER BY rank) ORDER BY rank""".stripMargin,

    // the only float sum is vocabulary-sized (Σ c·ln c); corpus-sized data
    // moves through exact int counts, and 4dp rounding absorbs ln() ulps
    "q_word_entropy" ->
      """WITH wc AS (SELECT lang, word, count(*) AS cnt FROM
        |  (SELECT lang, unnest(regexp_split_to_array(text,'[^a-zA-Z]+')) AS word
        |   FROM documents) t
        |  WHERE word <> '' GROUP BY lang, word),
        |a AS (SELECT lang, CAST(sum(cnt) AS BIGINT) AS n_tokens,
        |  CAST(count(*) AS BIGINT) AS vocab_size,
        |  sum(CAST(cnt AS DOUBLE) * ln(CAST(cnt AS DOUBLE))) AS clogc
        |  FROM wc GROUP BY lang)
        |SELECT lang, n_tokens, vocab_size,
        |  round(ln(CAST(n_tokens AS DOUBLE)) - clogc / CAST(n_tokens AS DOUBLE), 4)
        |    AS entropy,
        |  CASE WHEN vocab_size > 1 THEN
        |    round((ln(CAST(n_tokens AS DOUBLE)) - clogc / CAST(n_tokens AS DOUBLE)) /
        |      ln(CAST(vocab_size AS DOUBLE)), 4) ELSE 0.0 END AS entropy_norm
        |FROM a ORDER BY lang""".stripMargin,

    // keyness: the pinned two-step micro division (q div d)*1e6 +
    // ((q mod d)*1e6) div d equals floor(q*1e6/d) exactly on both
    // engines while keeping every intermediate ≤ N⁴·10⁶
    "q_keyness" ->
      s"""WITH t AS (SELECT source,
         |    unnest(regexp_split_to_array(text,'[^a-zA-Z]+')) AS word
         |  FROM documents),
         |cells AS (SELECT source, word, CAST(count(*) AS BIGINT) AS a
         |  FROM t WHERE word <> '' GROUP BY 1, 2),
         |wt AS (SELECT word, CAST(sum(a) AS BIGINT) AS ab FROM cells GROUP BY 1),
         |st AS (SELECT source, CAST(sum(a) AS BIGINT) AS ac FROM cells GROUP BY 1),
         |n AS (SELECT CAST(sum(a) AS BIGINT) AS n FROM cells),
         |x AS (SELECT source, word, a, ab, ac, n,
         |    ab - a AS b, ac - a AS c, n - ab - (ac - a) AS d
         |  FROM cells JOIN wt USING (word) JOIN st USING (source) CROSS JOIN n),
         |f AS (SELECT source, word, a, ab,
         |    CAST(n AS HUGEINT)
         |      * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c)
         |      * (CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c) AS q,
         |    CAST(ab AS HUGEINT) * (c + d) * ac * (b + d) AS dn
         |  FROM x WHERE CAST(a AS HUGEINT) * d > CAST(b AS HUGEINT) * c),
         |sc AS (SELECT source, word, a, ab,
         |    CAST((q // dn) * 1000000 + ((q % dn) * 1000000) // dn AS BIGINT)
         |      AS chi2_micro
         |  FROM f),
         |r AS (SELECT source,
         |    CAST(row_number() OVER (PARTITION BY source
         |      ORDER BY chi2_micro DESC, word) AS BIGINT) AS rank,
         |    word, a AS cnt_in, ab AS cnt_all, chi2_micro
         |  FROM sc QUALIFY rank <= 10)
         |SELECT source, rank, word, cnt_in, cnt_all, chi2_micro
         |FROM r ORDER BY source, rank""".stripMargin,

    "q_token_compression" ->
      """WITH d AS (SELECT lang, n_chars,
        |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[.,]')) AS BIGINT) AS n_bpe
        |  FROM documents)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |  CAST(sum(n_bpe) AS BIGINT) AS sum_tokens,
        |  CASE WHEN CAST(sum(n_bpe) AS BIGINT) > 0
        |    THEN CAST(CAST(sum(n_chars) AS BIGINT) AS DOUBLE)
        |       / CAST(CAST(sum(n_bpe) AS BIGINT) AS DOUBLE)
        |    ELSE CAST(0.0 AS DOUBLE) END AS chars_per_token
        |FROM d GROUP BY lang ORDER BY lang""".stripMargin,

    // the composed curation job: quality keepers minus non-canonical
    // near-dup members, chunked and summarized per language — every piece
    // reused verbatim from its standalone oracle
    "q_curation" ->
      s"""WITH $QualityScoreCtes,
         |keepq AS (SELECT doc_id FROM sc WHERE score >= 0.75),
         |dropl AS (SELECT doc_id FROM ($DedupClustersSql) c WHERE doc_id <> cluster_id),
         |cur AS (SELECT doc_id, lang, text FROM documents
         |  WHERE doc_id IN (SELECT doc_id FROM keepq)
         |    AND doc_id NOT IN (SELECT doc_id FROM dropl)),
         |ct AS (SELECT doc_id, lang,
         |    list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'), w -> w <> '') AS t
         |  FROM cur),
         |st AS (SELECT doc_id, lang, t, unnest(range(1, len(t) + 1, 40)) AS cs
         |  FROM ct WHERE len(t) > 0)
         |SELECT lang, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
         |  count(*) AS n_chunks, CAST(sum(len(t[cs:cs+49])) AS BIGINT) AS n_tokens
         |FROM st GROUP BY lang ORDER BY lang""".stripMargin,

    "q_lang_id" ->
      s"""WITH d AS ($TokList),
         |s AS (SELECT doc_id, lang AS labeled_lang,
         |  CAST(len(list_filter(t, w -> w IN ('the','a','of'))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(t, w -> w IN ('der','die','das'))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(t, w -> w IN ('le','la','les'))) AS BIGINT) AS s_fr,
         |  CAST(len(list_filter(t, w -> w IN ('el','los','las'))) AS BIGINT) AS s_es
         |FROM d)
         |SELECT doc_id, labeled_lang,
         |  CASE WHEN s_es > greatest(s_en, s_de, s_fr, CAST(0 AS BIGINT)) THEN 'es'
         |       WHEN s_fr > greatest(s_en, s_de, CAST(0 AS BIGINT)) THEN 'fr'
         |       WHEN s_de > greatest(s_en, CAST(0 AS BIGINT)) THEN 'de'
         |       WHEN s_en > CAST(0 AS BIGINT) THEN 'en'
         |       ELSE 'und' END AS pred_lang,
         |  s_en, s_de, s_fr, s_es
         |FROM s ORDER BY doc_id""".stripMargin,

    "q_tfidf" ->
      s"""WITH t AS (SELECT doc_id, word FROM ($Toks) z WHERE word <> ''),
         |tf AS (SELECT doc_id, word, count(*) AS tf FROM t GROUP BY doc_id, word),
         |df AS (SELECT word, count(*) AS df FROM
         |  (SELECT DISTINCT doc_id, word FROM t) d GROUP BY word),
         |n AS (SELECT count(*) AS n FROM documents),
         |scored AS (SELECT doc_id, tf.word AS word, tf, df,
         |  CAST(tf * n AS DOUBLE) / df AS score
         |  FROM tf JOIN df ON tf.word = df.word CROSS JOIN n),
         |r AS (SELECT doc_id, word, tf, df, score,
         |  CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, word) AS BIGINT) AS rank
         |  FROM scored)
         |SELECT doc_id, word, tf, df, score, rank FROM r WHERE rank <= 3
         |ORDER BY doc_id, rank""".stripMargin,

    "q_token_count" ->
      s"""SELECT doc_id,
         |  CAST(len(list_filter(regexp_split_to_array(text,' +'), w -> w <> '')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(text,'[a-z]+|[0-9]+|[.,]')) AS BIGINT) AS n_bpe_tokens
         |FROM documents ORDER BY doc_id""".stripMargin,

    "q_bigrams" ->
      s"""WITH d AS ($TokList),
         |bg AS (SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |  i -> t[i] || ' ' || t[i+1])) AS bigram FROM d)
         |SELECT bigram, count(*) AS cnt FROM bg GROUP BY bigram
         |ORDER BY cnt DESC, bigram LIMIT 20""".stripMargin,

    // BPE tokenizer training: 5 unrolled greedy merge rounds over the
    // char-split vocabulary (see bpeCtes for the shared relational rule)
    "q_bpe_train" -> bpeCtes(5),

    // per-round compression of the learned merges, vs round-0 characters
    "q_bpe_apply" -> bpeApplyCtes(5),

    // bigram next-token table: integer conditional probabilities, the
    // sum-over-bigrams head totals (NOT unigram counts — the last token
    // of each doc heads no bigram), top-3 per head with ≥ 50 mass
    "q_next_token" ->
      s"""WITH d AS ($TokList),
         |bgs AS (SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |  i -> t[i] || ' ' || t[i+1])) AS bigram FROM d),
         |bc AS (SELECT split_part(bigram, ' ', 1) AS head,
         |    split_part(bigram, ' ', 2) AS next_word,
         |    CAST(count(*) AS BIGINT) AS cnt
         |  FROM bgs GROUP BY 1, 2),
         |h AS (SELECT head, CAST(sum(cnt) AS BIGINT) AS head_total
         |  FROM bc GROUP BY head),
         |j AS (SELECT bc.head, bc.next_word, bc.cnt, h.head_total,
         |    CAST(row_number() OVER (PARTITION BY bc.head
         |      ORDER BY bc.cnt DESC, bc.next_word) AS BIGINT) AS rank
         |  FROM bc JOIN h USING (head) WHERE h.head_total >= 50)
         |SELECT head, next_word, cnt, head_total,
         |  CAST(cnt * 1000000 // head_total AS BIGINT) AS p_ppm, rank
         |FROM j WHERE rank <= 3 ORDER BY head, rank""".stripMargin,

    "q_collocations" ->
      s"""WITH d AS ($TokList),
         |toks AS (SELECT unnest(t) AS w FROM d),
         |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks GROUP BY w),
         |bgs AS (SELECT unnest(list_transform(range(1, greatest(len(t), 1)),
         |  i -> t[i] || ' ' || t[i+1])) AS bigram FROM d),
         |bc AS (SELECT bigram, CAST(count(*) AS BIGINT) AS c_ab FROM bgs GROUP BY bigram),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n_bg FROM bgs)
         |SELECT bigram, c_ab, ua.c AS c_a, ub.c AS c_b,
         |  CAST(c_ab * n_bg AS DOUBLE) / CAST(ua.c * ub.c AS DOUBLE) AS lift
         |FROM bc CROSS JOIN n
         |  JOIN uni ua ON split_part(bigram, ' ', 1) = ua.w
         |  JOIN uni ub ON split_part(bigram, ' ', 2) = ub.w
         |WHERE c_ab >= 5
         |ORDER BY lift DESC, bigram LIMIT 50""".stripMargin,

    "q_fingerprint" ->
      s"SELECT doc_id, ${polyHashSql("text")} AS fp FROM documents ORDER BY doc_id",

    "q_sql_udtf" ->
      s"""WITH d AS ($TokList),
         |bg AS (SELECT doc_id, unnest(list_transform(range(1, greatest(len(t), 1)),
         |  i -> t[i] || ' ' || t[i+1])) AS ngram FROM d)
         |SELECT doc_id, count(*) AS n_ngrams,
         |  count(DISTINCT ngram) AS n_distinct
         |FROM bg GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "q_sql_custom_fn" ->
      s"SELECT doc_id, ${polyHashSql("text")} AS fp FROM documents ORDER BY doc_id",

    "q_similarity_topk" -> similarityTopkSql,

    // norm² via the same strict left-to-right double fold as the engine's
    // dotD; floor before the integer cast (DuckDB CAST rounds, Spark
    // truncates — floor pins both)
    "q_emb_health" ->
      s"""WITH e AS (SELECT CAST(label AS BIGINT) AS label,
         |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |m AS (SELECT label, CAST(len(v) AS BIGINT) AS dim,
         |    CAST(floor(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(v, x -> x * x)), (a, b) -> a + b) * 1000000)
         |      AS BIGINT) AS n2,
         |    CAST(len(list_filter(v, x -> x = 0)) AS BIGINT) AS zd
         |  FROM e)
         |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(max(dim) AS BIGINT) AS dim,
         |  CAST(min(n2) AS BIGINT) AS min_norm2_micro,
         |  CAST(max(n2) AS BIGINT) AS max_norm2_micro,
         |  CAST(sum(CAST(n2 AS HUGEINT)) // count(*) AS BIGINT)
         |    AS avg_norm2_micro,
         |  CAST(sum(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_zero_vecs,
         |  CAST(sum(zd) AS BIGINT) AS n_zero_dims
         |FROM m GROUP BY label ORDER BY label""".stripMargin,

    // LSH-blocked near-dup: candidates from shared (table, bucket) of the
    // deterministic hyperplanes (regenerated verbatim below), then exact
    // cosine ≥ 0.4 — mirrors Pipeline.embeddingNeardup's scale-safe plan.
    "q_embedding_neardup" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM e),
         |planes(t, j, pv) AS (VALUES
         |$lshPlaneRows),
         |dots AS (SELECT vec_id, t, j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(n.v, (x,i) -> x * pv[i])), (a,b) -> a+b) AS dp
         |  FROM n, planes),
         |eb AS (SELECT vec_id, t,
         |    CAST(sum(CASE WHEN dp > 0 THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
         |  FROM eb a JOIN eb b ON a.t = b.t AND a.bucket = b.bucket AND a.vec_id < b.vec_id)
         |SELECT id_a, id_b, cos FROM (
         |  SELECT id_a, id_b, list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(a.v, (x,i) -> x * b.v[i])), (s1,t1) -> s1+t1) / (a.nrm * b.nrm) AS cos
         |  FROM cand JOIN n a ON cand.id_a = a.vec_id JOIN n b ON cand.id_b = b.vec_id) p
         |WHERE cos >= 0.4 ORDER BY id_a, id_b""".stripMargin,

    // ANN-LSH promoted to hash-checked: the hyperplanes are deterministic
    // and regenerated verbatim, so candidates AND ranking are reproducible
    "q_ann_lsh" -> annLshSql,

    // recall@10 of the LSH ANN vs the exact baseline: both component
    // queries are the hash-checked oracles above, composed as CTEs; the
    // eval metric is an exact integer ppm so the whole row hash-checks
    "q_ann_recall" ->
      s"""WITH exact AS ($similarityTopkSql),
         |ann AS ($annLshSql)
         |SELECT e.probe_id, CAST(count(*) AS BIGINT) AS n_exact,
         |  CAST(count(a.vec_id) AS BIGINT) AS n_hit,
         |  CAST(count(a.vec_id) * 1000000 // count(*) AS BIGINT) AS recall_ppm
         |FROM exact e LEFT JOIN ann a
         |  ON e.probe_id = a.probe_id AND e.vec_id = a.vec_id
         |GROUP BY e.probe_id ORDER BY e.probe_id""".stripMargin,

    // ANN-IVF promoted to hash-checked: centroids are the first 16 corpus
    // vectors and both ranking passes are deterministic (ties by id)
    "q_ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM e),
         |cents AS (SELECT vec_id AS cent_id, v AS cv, nrm AS cn FROM n WHERE vec_id < 16),
         |ac AS (SELECT n.vec_id, cents.cent_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(n.v, (x,i) -> x * cv[i])), (a,b) -> a+b) / (n.nrm * cn) AS ccos
         |  FROM n, cents),
         |ranked AS (SELECT vec_id, cent_id, row_number() OVER (PARTITION BY vec_id
         |    ORDER BY ccos DESC, cent_id) AS r FROM ac),
         |assigned AS (SELECT vec_id, cent_id AS cell FROM ranked WHERE r = 1),
         |pc AS (SELECT vec_id AS probe_id, cent_id AS cell FROM ranked
         |  WHERE vec_id < 5 AND r <= 2),
         |cand AS (SELECT DISTINCT pc.probe_id, a.vec_id
         |  FROM pc JOIN assigned a ON a.cell = pc.cell WHERE a.vec_id <> pc.probe_id),
         |sc AS (SELECT c.probe_id, c.vec_id,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(p.v, (x,i) -> x * x2.v[i])), (s1,t1) -> s1+t1) / (p.nrm * x2.nrm) AS cos
         |  FROM cand c JOIN n p ON c.probe_id = p.vec_id JOIN n x2 ON c.vec_id = x2.vec_id),
         |r AS (SELECT probe_id, vec_id, cos,
         |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY cos DESC, vec_id) AS BIGINT) AS rank
         |  FROM sc)
         |SELECT probe_id, vec_id, cos, rank FROM r WHERE rank <= 10
         |ORDER BY probe_id, rank""".stripMargin,

    // every vector probes the LSH index; same plane regeneration as ann_lsh
    "q_knn_graph" ->
      s"""WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM e),
         |planes(t, j, pv) AS (VALUES
         |$lshPlaneRows),
         |dots AS (SELECT vec_id, t, j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(n.v, (x,i) -> x * pv[i])), (a,b) -> a+b) AS dp
         |  FROM n, planes),
         |eb AS (SELECT vec_id, t,
         |    CAST(sum(CASE WHEN dp > 0 THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT p.vec_id AS src, x.vec_id AS nb
         |  FROM eb p JOIN eb x ON x.t = p.t AND x.bucket = p.bucket
         |  WHERE x.vec_id <> p.vec_id),
         |sc AS (SELECT c.src, c.nb,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(a.v, (x,i) -> x * b.v[i])), (s1,t1) -> s1+t1) / (a.nrm * b.nrm) AS cos
         |  FROM cand c JOIN n a ON c.src = a.vec_id JOIN n b ON c.nb = b.vec_id),
         |r AS (SELECT src, nb, cos,
         |    CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, nb) AS BIGINT) AS rank
         |  FROM sc)
         |SELECT src, nb, cos, rank FROM r WHERE rank <= 3
         |ORDER BY src, rank""".stripMargin,

    // hard-negative mining: the knn_graph LSH candidate generation plus a
    // label-mismatch filter before scoring; top-2 negatives per anchor
    "q_hard_negatives" ->
      s"""WITH e AS (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
         |  FROM embeddings),
         |n AS (SELECT vec_id, label, v, sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(v, x -> x*x)), (a,b) -> a+b)) AS nrm FROM e),
         |planes(t, j, pv) AS (VALUES
         |$lshPlaneRows),
         |dots AS (SELECT vec_id, t, j,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(n.v, (x,i) -> x * pv[i])), (a,b) -> a+b) AS dp
         |  FROM n, planes),
         |eb AS (SELECT vec_id, t,
         |    CAST(sum(CASE WHEN dp > 0 THEN (1 << j) ELSE 0 END) AS INTEGER) AS bucket
         |  FROM dots GROUP BY vec_id, t),
         |cand AS (SELECT DISTINCT p.vec_id AS src, x.vec_id AS nb
         |  FROM eb p JOIN eb x ON x.t = p.t AND x.bucket = p.bucket
         |  WHERE x.vec_id <> p.vec_id),
         |sc AS (SELECT c.src, a.label AS src_label, c.nb, b.label AS nb_label,
         |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |      list_transform(a.v, (x,i) -> x * b.v[i])), (s1,t1) -> s1+t1) / (a.nrm * b.nrm) AS cos
         |  FROM cand c JOIN n a ON c.src = a.vec_id JOIN n b ON c.nb = b.vec_id
         |  WHERE a.label <> b.label),
         |r AS (SELECT src, src_label, nb, nb_label, cos,
         |    CAST(row_number() OVER (PARTITION BY src ORDER BY cos DESC, nb) AS BIGINT) AS rank
         |  FROM sc)
         |SELECT src, src_label, nb, nb_label, cos, rank FROM r WHERE rank <= 2
         |ORDER BY src, rank""".stripMargin,

    // class-prototype centroids: the same int64 quantization and
    // truncate-toward-zero mean as the k-means oracle, grouped by label
    "q_label_centroids" ->
      s"""WITH $labelCentroidCellCtes
         |SELECT label, max(n) AS n_vecs,
         |  CAST(min(CASE WHEN i = 1 THEN c END) AS BIGINT) AS c0,
         |  CAST(min(CASE WHEN i = 2 THEN c END) AS BIGINT) AS c1,
         |  CAST(sum(abs(c)) AS BIGINT) AS c_l1
         |FROM c GROUP BY label ORDER BY label""".stripMargin,

    // nearest-prototype confusion matrix: the same quantization and
    // truncated-mean centroids as q_label_centroids, argmin distance with
    // ties by label, then the exact integer cross-tab
    "q_eval_confusion" ->
      s"""WITH $protoDistCtes,
         |p AS (SELECT vec_id, true_label, plabel AS pred_label,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, plabel) AS r
         |  FROM d),
         |pr AS (SELECT true_label, pred_label FROM p WHERE r = 1),
         |rt AS (SELECT true_label, CAST(count(*) AS BIGINT) AS n_true
         |  FROM pr GROUP BY true_label)
         |SELECT pr.true_label, pr.pred_label, CAST(count(*) AS BIGINT) AS n,
         |  rt.n_true, CAST(count(*) * 1000000 // rt.n_true AS BIGINT) AS share_ppm
         |FROM pr JOIN rt USING (true_label)
         |GROUP BY pr.true_label, pr.pred_label, rt.n_true
         |ORDER BY true_label, pred_label""".stripMargin,

    // Cohen's kappa over the same nearest-prototype predictions: exact
    // integer ppm arithmetic, κ = (N·diag − Σ row·col) / (N² − Σ row·col)
    "q_kappa" ->
      s"""WITH $protoDistCtes,
         |p AS (SELECT vec_id, true_label, plabel,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, plabel) AS r
         |  FROM d),
         |pr AS (SELECT true_label, plabel AS pred_label FROM p WHERE r = 1),
         |cells AS (SELECT true_label, pred_label, CAST(count(*) AS BIGINT) AS n
         |  FROM pr GROUP BY true_label, pred_label),
         |rt AS (SELECT true_label AS lbl, CAST(sum(n) AS BIGINT) AS rn
         |  FROM cells GROUP BY 1),
         |ct AS (SELECT pred_label AS lbl, CAST(sum(n) AS BIGINT) AS cn
         |  FROM cells GROUP BY 1),
         |tot AS (SELECT CAST(sum(n) AS BIGINT) AS n_total,
         |    CAST(sum(CASE WHEN true_label = pred_label THEN n ELSE 0 END) AS BIGINT) AS n_agree
         |  FROM cells),
         |rc AS (SELECT CAST(coalesce(sum(rn * cn), 0) AS BIGINT) AS sum_rc
         |  FROM rt JOIN ct USING (lbl))
         |SELECT n_total, n_agree,
         |  CAST(n_agree * 1000000 // n_total AS BIGINT) AS po_ppm,
         |  CAST(sum_rc * 1000000 // (n_total * n_total) AS BIGINT) AS pe_ppm,
         |  CAST((n_total * n_agree - sum_rc) * 1000000 //
         |    (n_total * n_total - sum_rc) AS BIGINT) AS kappa_ppm
         |FROM tot, rc""".stripMargin,

    // centroid silhouette per label: a = own-prototype distance, b = min
    // other-prototype distance, s = (b−a)/max(a,b) as a floored ppm of an
    // IEEE-exact division of < 2^53 integers
    "q_silhouette" ->
      s"""WITH $protoDistCtes,
         |ab AS (SELECT vec_id, true_label,
         |    min(CASE WHEN plabel = true_label THEN dist END) AS a,
         |    min(CASE WHEN plabel <> true_label THEN dist END) AS b
         |  FROM d GROUP BY vec_id, true_label),
         |sil AS (SELECT true_label, CASE WHEN greatest(a, b) = 0 THEN 0
         |    ELSE CAST(floor(CAST(b - a AS DOUBLE) * 1000000.0 /
         |      CAST(greatest(a, b) AS DOUBLE)) AS BIGINT) END AS s_ppm
         |  FROM ab)
         |SELECT true_label, CAST(count(*) AS BIGINT) AS n_vecs,
         |  CAST(floor(CAST(sum(s_ppm) AS DOUBLE) / count(*)) AS BIGINT) AS mean_sil_ppm,
         |  CAST(min(s_ppm) AS BIGINT) AS min_sil_ppm,
         |  CAST(max(s_ppm) AS BIGINT) AS max_sil_ppm
         |FROM sil GROUP BY true_label ORDER BY true_label""".stripMargin,

    // reliability diagram of the prototype classifier: top-2 distance
    // margin pseudo-confidence, ten equal-width bins over the observed
    // range, integer-exact per-bin accuracy / mean confidence / gap
    "q_calibration" ->
      s"""WITH $protoDistCtes,
         |p AS (SELECT vec_id, true_label, plabel, dist,
         |    row_number() OVER (PARTITION BY vec_id ORDER BY dist, plabel) AS r
         |  FROM d),
         |per AS (SELECT vec_id, true_label,
         |    min(CASE WHEN r = 1 THEN plabel END) AS pred_label,
         |    min(CASE WHEN r = 1 THEN dist END) AS d1,
         |    min(CASE WHEN r = 2 THEN dist END) AS d2
         |  FROM p WHERE r <= 2 GROUP BY vec_id, true_label),
         |sc AS (SELECT CASE WHEN d1 + d2 = 0 THEN 500000
         |      ELSE CAST(floor(CAST(d2 AS DOUBLE) * 1000000.0 /
         |        CAST(d1 + d2 AS DOUBLE)) AS BIGINT) END AS conf_ppm,
         |    CASE WHEN pred_label = true_label THEN 1 ELSE 0 END AS hit
         |  FROM per),
         |bounds AS (SELECT min(conf_ppm) AS cmin, max(conf_ppm) AS cmax FROM sc),
         |sb AS (SELECT CAST((conf_ppm - cmin) * 10 // (cmax - cmin + 1) AS BIGINT) AS bin,
         |    conf_ppm, hit FROM sc, bounds)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(hit) AS BIGINT) AS n_hit,
         |  CAST(sum(hit) * 1000000 // count(*) AS BIGINT) AS acc_ppm,
         |  CAST(sum(conf_ppm) // count(*) AS BIGINT) AS avg_conf_ppm,
         |  CAST(abs(sum(hit) * 1000000 // count(*) -
         |    sum(conf_ppm) // count(*)) AS BIGINT) AS gap_ppm
         |FROM sb GROUP BY bin ORDER BY bin""".stripMargin,

    // two-sample KS statistic per event type (early vs late half): exact
    // cumulative integer CDFs over distinct values, D as max |ppm − ppm|
    "q_ks_test" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS tus, value FROM events),
         |b AS (SELECT min(tus) AS tmin, max(tus) AS tmax FROM ev),
         |t AS (SELECT event_type, value,
         |    CASE WHEN tus * 2 <= tmin + tmax THEN 1 ELSE 0 END AS early
         |  FROM ev, b),
         |cells AS (SELECT event_type, value, CAST(sum(early) AS BIGINT) AS ce,
         |    CAST(sum(1 - early) AS BIGINT) AS cl
         |  FROM t GROUP BY event_type, value),
         |c AS (SELECT event_type,
         |    CAST(sum(ce) OVER (PARTITION BY event_type ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cume,
         |    CAST(sum(cl) OVER (PARTITION BY event_type ORDER BY value
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cuml,
         |    CAST(sum(ce) OVER (PARTITION BY event_type) AS BIGINT) AS ne,
         |    CAST(sum(cl) OVER (PARTITION BY event_type) AS BIGINT) AS nl
         |  FROM cells)
         |SELECT event_type, max(ne) AS n_early, max(nl) AS n_late,
         |  CAST(max(abs(cume * 1000000 // ne - cuml * 1000000 // nl)) AS BIGINT) AS ks_ppm
         |FROM c GROUP BY event_type ORDER BY event_type""".stripMargin,

    // two-proportion z-test over the user_id-parity arm split: exact
    // integer inputs, fixed-order IEEE arithmetic, correctly-rounded sqrt
    // integer-micro-unit chi-square; squares through HUGEINT ≙ the
    // engine's DECIMAL(38,0) routing, term-exact so the statistic hashes
    "q_chi2" ->
      s"""WITH cells AS (SELECT lang, source, CAST(count(*) AS BIGINT) AS o
         |  FROM documents GROUP BY lang, source),
         |rt AS (SELECT lang, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY lang),
         |ct AS (SELECT source, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY source),
         |t AS (SELECT CAST(sum(o) AS BIGINT) AS n,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS nl,
         |    CAST(count(DISTINCT source) AS BIGINT) AS ns FROM cells),
         |terms AS (SELECT n, nl, ns,
         |    CAST(CAST(o * n - r * c AS HUGEINT) * (o * n - r * c) * 1000000
         |      // (CAST(n AS HUGEINT) * r * c) AS BIGINT) AS term
         |  FROM cells JOIN rt USING (lang) JOIN ct USING (source) CROSS JOIN t)
         |SELECT max(n) AS n_docs, max(nl) AS n_langs, max(ns) AS n_sources,
         |  CAST(max((nl - 1) * (ns - 1)) AS BIGINT) AS df,
         |  CAST(sum(term) AS BIGINT) AS chi2_micro
         |FROM terms""".stripMargin,

    "q_ab_test" ->
      s"""WITH ev AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS tus
         |  FROM events),
         |f AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY tus, event_id) AS r
         |  FROM ev),
         |u AS (SELECT user_id,
         |    CAST(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS BIGINT) AS conv
         |  FROM f WHERE r = 1),
         |t AS (SELECT
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_control,
         |    CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END) AS BIGINT) AS conv_control,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_treat,
         |    CAST(sum(CASE WHEN user_id % 2 = 1 THEN conv ELSE 0 END) AS BIGINT) AS conv_treat
         |  FROM u)
         |SELECT n_control, conv_control, n_treat, conv_treat,
         |  CAST(conv_control AS DOUBLE) / n_control AS p_control,
         |  CAST(conv_treat AS DOUBLE) / n_treat AS p_treat,
         |  CASE WHEN conv_control + conv_treat = 0
         |      OR conv_control + conv_treat = n_control + n_treat
         |    THEN CAST(0 AS DOUBLE)
         |    ELSE (CAST(conv_treat AS DOUBLE) / n_treat - CAST(conv_control AS DOUBLE) / n_control) /
         |      sqrt((CAST(conv_control + conv_treat AS DOUBLE) / (n_control + n_treat)) *
         |        (CAST(1 AS DOUBLE) - CAST(conv_control + conv_treat AS DOUBLE) / (n_control + n_treat)) *
         |        (CAST(1 AS DOUBLE) / n_control + CAST(1 AS DOUBLE) / n_treat)) END AS z
         |FROM t""".stripMargin,

    // robust (median/MAD) outlier census: exact order-statistic medians
    // via the percentilesDisc rank-window pick, 3·MAD gate
    "q_robust_anomaly" ->
      s"""WITH ev AS (SELECT event_type, event_id, value FROM events),
         |r1 AS (SELECT event_type, event_id, value,
         |    row_number() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM ev),
         |med AS (SELECT event_type,
         |    max(CASE WHEN rn = ceil(0.5 * n) THEN value END) AS med
         |  FROM r1 GROUP BY event_type),
         |dev AS (SELECT ev.event_type, ev.event_id, ev.value, med.med,
         |    abs(ev.value - med.med) AS adev
         |  FROM ev JOIN med USING (event_type)),
         |r2 AS (SELECT event_type, event_id, adev,
         |    row_number() OVER (PARTITION BY event_type ORDER BY adev, event_id) AS rn,
         |    count(*) OVER (PARTITION BY event_type) AS n
         |  FROM dev),
         |mad AS (SELECT event_type,
         |    max(CASE WHEN rn = ceil(0.5 * n) THEN adev END) AS mad
         |  FROM r2 GROUP BY event_type)
         |SELECT dev.event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  max(dev.med) AS median, max(mad.mad) AS mad,
         |  CAST(sum(CASE WHEN dev.adev > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |  CAST(sum(CASE WHEN dev.adev > 3.0 * mad.mad THEN 1 ELSE 0 END)
         |    * 1000000 // count(*) AS BIGINT) AS outlier_ppm
         |FROM dev JOIN mad USING (event_type)
         |GROUP BY dev.event_type ORDER BY event_type""".stripMargin,

    // embedding-drift monitor: per-label centroid L1/max-dim shift
    // between the vec_id-parity halves, same quantization + truncated
    // mean as the label-centroid family
    "q_embedding_drift" ->
      s"""WITH q AS (SELECT vec_id, label, vec_id % 2 AS half,
         |    list_transform(embedding,
         |      x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv
         |  FROM embeddings),
         |s AS (SELECT label, half, i, CAST(sum(qv[i]) AS BIGINT) AS sx,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM q, range(1, 65) g(i) GROUP BY label, half, i),
         |c AS (SELECT label, half, i, n,
         |    CAST((sx - sx % n) / n AS BIGINT) AS c FROM s),
         |p AS (SELECT label, i,
         |    min(CASE WHEN half = 0 THEN c END) AS c0,
         |    min(CASE WHEN half = 1 THEN c END) AS c1,
         |    max(CASE WHEN half = 0 THEN n END) AS n0,
         |    max(CASE WHEN half = 1 THEN n END) AS n1
         |  FROM c GROUP BY label, i)
         |SELECT label, CAST(max(n0) AS BIGINT) AS n_even,
         |  CAST(max(n1) AS BIGINT) AS n_odd,
         |  CAST(sum(abs(c0 - c1)) AS BIGINT) AS l1_shift,
         |  CAST(max(abs(c0 - c1)) AS BIGINT) AS max_dim_shift
         |FROM p GROUP BY label ORDER BY label""".stripMargin,

    // streaming drift monitor: live (odd event_ids) vs frozen reference
    // (even event_ids) TVD, bins pinned to reference-only bounds with an
    // edge-bin clamp
    // streaming registers ≡ batch registers (max is order-insensitive),
    // so the oracle is the batch HLL reduced to the monitor's columns
    "q_stream_hll" ->
      s"""WITH d AS (SELECT list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |w AS (SELECT DISTINCT word FROM (
         |  SELECT unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS word FROM d) u),
         |hh AS (SELECT (${polyHashSql("word")} * 2654435761 + 40503)
         |    % 1073741824 AS h FROM w),
         |r AS (SELECT h % 256 AS bucket, ${hllRhoSql("(h // 256)")} AS rho
         |  FROM hh),
         |regs AS (SELECT i AS bucket, COALESCE(m, 0) AS m
         |  FROM (SELECT unnest(range(0, 256)) AS i) b
         |  LEFT JOIN (SELECT bucket, max(rho) AS m FROM r GROUP BY bucket) g
         |    ON b.i = g.bucket)
         |SELECT CAST(floor(0.7213 / (1.0 + 1.079 / 256.0)
         |    * 65536.0 / sum(1.0 / power(2.0, m))) AS BIGINT) AS est_hll,
         |  CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |  CAST(max(m) AS BIGINT) AS max_rho
         |FROM regs""".stripMargin,

    "q_stream_drift" ->
      s"""WITH b AS (SELECT min(value) AS vmin, max(value) AS vmax
         |  FROM events WHERE event_id % 2 = 0),
         |t AS (SELECT event_type, event_id % 2 AS side,
         |    CASE WHEN vmax = vmin THEN 0 ELSE least(9, greatest(0,
         |      CAST(floor((value - vmin) * 10.0 / (vmax - vmin)) AS BIGINT))) END AS bin
         |  FROM events, b),
         |cells AS (SELECT event_type, bin,
         |    CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cr,
         |    CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cl
         |  FROM t GROUP BY event_type, bin),
         |tt AS (SELECT event_type, CAST(sum(cr) AS BIGINT) AS n_ref,
         |    CAST(sum(cl) AS BIGINT) AS n_live FROM cells GROUP BY event_type)
         |SELECT cells.event_type, max(n_ref) AS n_ref, max(n_live) AS n_live,
         |  CAST(sum(abs(cr * 1000000 // n_ref - cl * 1000000 // n_live)) // 2
         |    AS BIGINT) AS tvd_ppm
         |FROM cells JOIN tt USING (event_type)
         |GROUP BY cells.event_type ORDER BY event_type""".stripMargin,

    // count–min sketch with pinned affine hash rows: deterministic, so
    // the sketch ESTIMATES hash-verify (not just the exact counts)
    // same pinned affine hash rows; bits compared only as set membership;
    // the prediction cube uses the engine's exact association
    "q_bloom_fpr" ->
      s"""WITH members AS (SELECT c_custkey FROM customer),
         |mb AS (SELECT DISTINCT b FROM (
         |  SELECT (c_custkey * 131 + 7) % 65521 AS b FROM members
         |  UNION ALL SELECT (c_custkey * 137 + 11) % 65521 FROM members
         |  UNION ALL SELECT (c_custkey * 139 + 13) % 65521 FROM members) m),
         |probes AS (SELECT (SELECT max(c_custkey) FROM members) + i AS pk
         |  FROM (SELECT unnest(range(1, 20001)) AS i) r),
         |pbits AS (SELECT DISTINCT pk, b FROM (
         |  SELECT pk, (pk * 131 + 7) % 65521 AS b FROM probes
         |  UNION ALL SELECT pk, (pk * 137 + 11) % 65521 FROM probes
         |  UNION ALL SELECT pk, (pk * 139 + 13) % 65521 FROM probes) u),
         |pagg AS (SELECT pbits.pk, count(*) AS nb,
         |    sum(CASE WHEN mb.b IS NOT NULL THEN 1 ELSE 0 END) AS hits
         |  FROM pbits LEFT JOIN mb ON pbits.b = mb.b GROUP BY pbits.pk),
         |stats AS (SELECT
         |  (SELECT CAST(count(*) AS BIGINT) FROM members) AS n_members,
         |  (SELECT CAST(count(*) AS BIGINT) FROM mb) AS bits_set,
         |  (SELECT CAST(count(*) AS BIGINT) FROM pagg
         |     WHERE hits = nb) AS n_false_pos)
         |SELECT n_members, CAST(20000 AS BIGINT) AS n_probes,
         |  CAST(65521 AS BIGINT) AS m_bits,
         |  CAST(3 AS BIGINT) AS k_hashes, bits_set, n_false_pos,
         |  CAST(n_false_pos * 1000000 // 20000 AS BIGINT) AS fpr_ppm,
         |  CAST((bits_set * 1000000 // 65521) * (bits_set * 1000000 // 65521)
         |    // 1000000 * (bits_set * 1000000 // 65521) // 1000000
         |    AS BIGINT) AS fpr_pred_ppm
         |FROM stats""".stripMargin,

    "q_countmin" ->
      s"""WITH wc AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM ($Toks) t WHERE word <> '' GROUP BY word),
         |h AS (SELECT word, cnt, i,
         |    CASE i WHEN 0 THEN (${polyHashSql("word")} * 31 + 7) % 1021
         |           WHEN 1 THEN (${polyHashSql("word")} * 37 + 11) % 1021
         |           WHEN 2 THEN (${polyHashSql("word")} * 41 + 13) % 1021
         |           ELSE (${polyHashSql("word")} * 43 + 17) % 1021 END AS bkt
         |  FROM wc, range(0, 4) g(i)),
         |cells AS (SELECT i, bkt, CAST(sum(cnt) AS BIGINT) AS cell
         |  FROM h GROUP BY i, bkt),
         |top AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT 20),
         |est AS (SELECT t.word, t.cnt, CAST(min(c.cell) AS BIGINT) AS cm_est
         |  FROM top t JOIN h ON h.word = t.word
         |  JOIN cells c ON c.i = h.i AND c.bkt = h.bkt
         |  GROUP BY t.word, t.cnt)
         |SELECT word, cnt AS exact, cm_est, cm_est - cnt AS overestimate
         |FROM est ORDER BY exact DESC, word""".stripMargin,

    // the harmonic sum is a sum of dyadic rationals (exact in double in
    // any order), so the HLL ESTIMATE itself hash-checks; same pinned
    // hash, same 22-branch rank CASE, same literal-order alpha formula
    "q_hll_distinct" ->
      s"""WITH d AS (SELECT list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |w AS (SELECT DISTINCT word FROM (
         |  SELECT unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS word FROM d) u),
         |hh AS (SELECT (${polyHashSql("word")} * 2654435761 + 40503)
         |    % 1073741824 AS h FROM w),
         |r AS (SELECT h % 256 AS bucket, ${hllRhoSql("(h // 256)")} AS rho
         |  FROM hh),
         |regs AS (SELECT i AS bucket, COALESCE(m, 0) AS m
         |  FROM (SELECT unnest(range(0, 256)) AS i) b
         |  LEFT JOIN (SELECT bucket, max(rho) AS m FROM r GROUP BY bucket) g
         |    ON b.i = g.bucket),
         |st AS (SELECT sum(1.0 / power(2.0, m)) AS harm,
         |    CAST(sum(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
         |    CAST(max(m) AS BIGINT) AS max_rho FROM regs),
         |ex AS (SELECT CAST(count(*) AS BIGINT) AS n_exact FROM w),
         |est AS (SELECT n_exact, CAST(floor(0.7213 / (1.0 + 1.079 / 256.0)
         |    * 65536.0 / harm) AS BIGINT) AS est_hll, n_zero, max_rho
         |  FROM ex, st)
         |SELECT n_exact, est_hll, n_zero, max_rho,
         |  CAST(abs(est_hll - n_exact) * 1000000 // n_exact AS BIGINT)
         |    AS err_ppm
         |FROM est""".stripMargin,

    // AMS inner product of the two sides' CM sketches ≥ true join size
    "q_join_estimate" ->
      s"""WITH cl AS (SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS c
         |  FROM lineitem GROUP BY 1),
         |co AS (SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS c
         |  FROM orders GROUP BY 1),
         |e1 AS (SELECT i, CASE i WHEN 0 THEN (k * 31 + 7) % 1021
         |    WHEN 1 THEN (k * 37 + 11) % 1021
         |    WHEN 2 THEN (k * 41 + 13) % 1021
         |    ELSE (k * 43 + 17) % 1021 END AS bkt,
         |    CAST(sum(c) AS BIGINT) AS cc
         |  FROM cl, range(0, 4) g(i) GROUP BY 1, 2),
         |e2 AS (SELECT i, CASE i WHEN 0 THEN (k * 31 + 7) % 1021
         |    WHEN 1 THEN (k * 37 + 11) % 1021
         |    WHEN 2 THEN (k * 41 + 13) % 1021
         |    ELSE (k * 43 + 17) % 1021 END AS bkt,
         |    CAST(sum(c) AS BIGINT) AS cc2
         |  FROM co, range(0, 4) g(i) GROUP BY 1, 2),
         |ests AS (SELECT e1.i, CAST(sum(cc * cc2) AS BIGINT) AS est
         |  FROM e1 JOIN e2 ON e1.i = e2.i AND e1.bkt = e2.bkt GROUP BY e1.i),
         |mn AS (SELECT CAST(min(est) AS BIGINT) AS cm_est FROM ests),
         |tr AS (SELECT CAST(sum(cl.c * co.c) AS BIGINT) AS true_rows
         |  FROM cl JOIN co ON cl.k = co.k)
         |SELECT true_rows, cm_est, cm_est - true_rows AS overestimate,
         |  CAST((cm_est - true_rows) * 1000000 // true_rows AS BIGINT)
         |    AS over_ppm
         |FROM tr, mn""".stripMargin,

    // exact-allocation stratified sample: ⌈n/10⌉ per language stratum in
    // deterministic polyHash order
    "q_stratified_sample" ->
      s"""WITH d AS (SELECT doc_id, lang, ${polyHashSql("text")} AS h FROM documents),
         |r AS (SELECT doc_id, lang,
         |    CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS BIGINT) AS rk,
         |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_stratum
         |  FROM d)
         |SELECT doc_id, lang, rk, n_stratum FROM r
         |WHERE rk <= (n_stratum + 9) // 10
         |ORDER BY lang, rk""".stripMargin,

    // early-vs-late total-variation drift per event type over a 10-bin
    // equal-width value histogram (libm-free: exact ppm shares)
    "q_drift_tvd" ->
      s"""WITH ev AS (SELECT event_type, epoch_us(ts) AS tus, value FROM events),
         |b AS (SELECT min(tus) AS tmin, max(tus) AS tmax,
         |    min(value) AS vmin, max(value) AS vmax FROM ev),
         |t AS (SELECT event_type,
         |    CASE WHEN tus * 2 <= tmin + tmax THEN 'early' ELSE 'late' END AS half,
         |    CASE WHEN vmax = vmin THEN 0
         |      ELSE least(9, CAST(floor((value - vmin) * 10.0 /
         |        (vmax - vmin)) AS BIGINT)) END AS bin
         |  FROM ev, b),
         |cells AS (SELECT event_type, bin,
         |    CAST(sum(CASE WHEN half = 'early' THEN 1 ELSE 0 END) AS BIGINT) AS ce,
         |    CAST(sum(CASE WHEN half = 'late' THEN 1 ELSE 0 END) AS BIGINT) AS cl
         |  FROM t GROUP BY event_type, bin),
         |tt AS (SELECT event_type, CAST(sum(ce) AS BIGINT) AS n_early,
         |    CAST(sum(cl) AS BIGINT) AS n_late FROM cells GROUP BY event_type)
         |SELECT cells.event_type, max(n_early) AS n_early, max(n_late) AS n_late,
         |  CAST(sum(abs(ce * 1000000 // n_early - cl * 1000000 // n_late)) // 2
         |    AS BIGINT) AS tvd_ppm
         |FROM cells JOIN tt USING (event_type)
         |GROUP BY cells.event_type ORDER BY event_type""".stripMargin,

    // watermark late-data census: arrival order modeled as a
    // deterministic multiplicative-hash permutation of event_id (the
    // fixture's event_id order is time-monotone), running per-user max
    // event time, lateness thresholds a streaming watermark would drop at
    // the oracle's rank is one global row_number; same integer ceil ranks
    "q_event_gaps" ->
      s"""WITH g AS (SELECT user_id, event_id,
         |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
         |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
         |  FROM events),
         |gg AS (SELECT user_id, event_id, gap_us,
         |    row_number() OVER (ORDER BY gap_us, user_id, event_id) AS r,
         |    (SELECT count(*) FROM g WHERE gap_us IS NOT NULL) AS nn
         |  FROM g WHERE gap_us IS NOT NULL)
         |SELECT CAST(max(nn) AS BIGINT) AS n_gaps,
         |  CAST(max(CASE WHEN r = (nn + 1) // 2 THEN gap_us END)
         |    AS BIGINT) AS p50_us,
         |  CAST(max(CASE WHEN r = (9 * nn + 9) // 10 THEN gap_us END)
         |    AS BIGINT) AS p90_us,
         |  CAST(max(CASE WHEN r = (99 * nn + 99) // 100 THEN gap_us END)
         |    AS BIGINT) AS p99_us,
         |  CAST(sum(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_over_30m,
         |  CAST(sum(CASE WHEN gap_us > 1800000000 THEN 1 ELSE 0 END)
         |    * 1000000 // max(nn) AS BIGINT) AS over_30m_ppm
         |FROM gg""".stripMargin,

    "q_seasonality" ->
      s"""WITH cells AS (SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
         |    CAST(count(*) AS BIGINT) AS n_events
         |  FROM events GROUP BY 1, 2),
         |tot AS (SELECT event_type, CAST(sum(n_events) AS BIGINT) AS total,
         |    min(CASE WHEN n_events = mx THEN hod END) AS peak_hour
         |  FROM (SELECT *, max(n_events) OVER (PARTITION BY event_type) AS mx
         |        FROM cells) c
         |  GROUP BY event_type)
         |SELECT c.event_type, c.hod, c.n_events,
         |  CAST(c.n_events * 1000000 // t.total AS BIGINT) AS share_ppm,
         |  c.hod = t.peak_hour AS is_peak
         |FROM cells c JOIN tot t ON c.event_type = t.event_type
         |ORDER BY c.event_type, c.hod""".stripMargin,

    "q_gap_fill" ->
      s"""SELECT event_id, user_id, event_type,
         |  coalesce(last_value(CASE WHEN event_type = 'purchase'
         |      THEN CAST(floor(value * 100) AS BIGINT) END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
         |    AS locf_cents
         |FROM events ORDER BY event_id""".stripMargin,

    // the streaming LOCF twin shares the batch oracle verbatim: a single
    // AvailableNow drain folds each user's events in (ts, event_id) order,
    // which IS the batch window
    "q_stream_gap_fill" ->
      s"""SELECT event_id, user_id, event_type,
         |  coalesce(last_value(CASE WHEN event_type = 'purchase'
         |      THEN CAST(floor(value * 100) AS BIGINT) END IGNORE NULLS)
         |    OVER (PARTITION BY user_id ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), -1)
         |    AS locf_cents
         |FROM events ORDER BY event_id""".stripMargin,

    "q_mom_growth" ->
      s"""WITH m AS (SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate)
         |    AS BIGINT) AS m,
         |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
         |      AS rev
         |  FROM orders GROUP BY 1),
         |g AS (SELECT m, rev, lag(rev) OVER (ORDER BY m) AS prev FROM m)
         |SELECT printf('%04d-%02d', (m - 1) // 12, (m - 1) % 12 + 1) AS month,
         |  rev AS rev_cents,
         |  CAST((rev - prev) * 1000000 // prev AS BIGINT) AS mom_growth_ppm
         |FROM g WHERE prev IS NOT NULL ORDER BY month""".stripMargin,

    "q_cohort_ltv" ->
      s"""WITH o AS (SELECT o_custkey,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
         |    CAST(floor(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
         |c AS (SELECT o_custkey, CAST(min(m) AS BIGINT) AS cm
         |  FROM o GROUP BY 1),
         |sz AS (SELECT cm, CAST(count(*) AS BIGINT) AS n_customers
         |  FROM c GROUP BY 1),
         |cells AS (SELECT cm, m - cm AS age, CAST(sum(cents) AS BIGINT) AS rev
         |  FROM o JOIN c USING (o_custkey) GROUP BY 1, 2),
         |t AS (SELECT cm, age, rev,
         |    CAST(sum(rev) OVER (PARTITION BY cm ORDER BY age
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |      AS cum
         |  FROM cells)
         |SELECT cm AS cohort_month, age, n_customers, rev AS rev_cents,
         |  cum AS cum_cents,
         |  CAST(CAST(cum AS HUGEINT) * 1000000 // n_customers AS BIGINT)
         |    AS ltv_microcents
         |FROM t JOIN sz USING (cm)
         |ORDER BY cohort_month, age""".stripMargin,

    "q_spend_trend" ->
      s"""WITH monthly AS (SELECT c_mktsegment,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
         |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |base AS (SELECT min(m) AS m0 FROM monthly),
         |xy AS (SELECT c_mktsegment, m - m0 AS x, y FROM monthly CROSS JOIN base),
         |a AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_months,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx
         |  FROM xy GROUP BY 1)
         |SELECT c_mktsegment, n_months,
         |  CAST((CAST(n_months AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy)
         |    * 1000000 // (CAST(n_months AS HUGEINT) * sxx
         |      - CAST(sx AS HUGEINT) * sx) AS BIGINT) AS slope_microcents
         |FROM a ORDER BY c_mktsegment""".stripMargin,

    // Theil–Sen / Mann–Kendall share the month-pair CTE: slopes stay an
    // exact (num, den) rational; ordering is the IEEE slope with the
    // exact pair as tie-break so the median pick is bit-deterministic
    "q_theil_sen" ->
      s"""WITH monthly AS (SELECT c_mktsegment,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
         |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |pairs AS (SELECT a.c_mktsegment,
         |    CAST(b.y - a.y AS BIGINT) AS num, CAST(b.m - a.m AS BIGINT) AS den,
         |    CAST(b.y - a.y AS DOUBLE) / CAST(b.m - a.m AS DOUBLE) AS slope
         |  FROM monthly a JOIN monthly b
         |    ON a.c_mktsegment = b.c_mktsegment AND a.m < b.m),
         |counted AS (SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_pairs
         |  FROM pairs GROUP BY 1),
         |ranked AS (SELECT *, row_number() OVER (PARTITION BY c_mktsegment
         |    ORDER BY slope, num, den) AS rk FROM pairs)
         |SELECT r.c_mktsegment, n_pairs,
         |  num AS slope_num_cents, den AS slope_den_months,
         |  slope AS slope_cents_per_month
         |FROM ranked r JOIN counted c ON r.c_mktsegment = c.c_mktsegment
         |WHERE rk = (n_pairs + 1) // 2
         |ORDER BY r.c_mktsegment""".stripMargin,

    "q_mann_kendall" ->
      s"""WITH monthly AS (SELECT c_mktsegment,
         |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
         |    CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |pairs AS (SELECT a.c_mktsegment,
         |    CASE WHEN b.y > a.y THEN 1 WHEN b.y < a.y THEN -1 ELSE 0 END AS sgn
         |  FROM monthly a JOIN monthly b
         |    ON a.c_mktsegment = b.c_mktsegment AND a.m < b.m)
         |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_pairs,
         |  CAST(sum(sgn) AS BIGINT) AS s_stat,
         |  CAST(sum(sgn) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS tau,
         |  CASE WHEN sum(sgn) > 0 THEN 'increasing'
         |    WHEN sum(sgn) < 0 THEN 'decreasing' ELSE 'no_trend' END AS verdict
         |FROM pairs GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,

    "q_active_users" ->
      s"""WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
         |days AS (SELECT DISTINCT d FROM du),
         |dau AS (SELECT d, CAST(count(*) AS BIGINT) AS dau FROM du GROUP BY d),
         |wau AS (SELECT days.d AS day,
         |    CAST(count(DISTINCT du.user_id) AS BIGINT) AS wau
         |  FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
         |  GROUP BY days.d)
         |SELECT day, dau, wau,
         |  CAST(dau * 1000000 // wau AS BIGINT) AS stickiness_ppm
         |FROM wau JOIN dau ON dau.d = wau.day
         |ORDER BY day""".stripMargin,

    "q_auc" ->
      s"""WITH cells AS (SELECT source, n_chars,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS pos,
         |    CAST(sum(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) AS BIGINT) AS neg
         |  FROM documents GROUP BY 1, 2),
         |c AS (SELECT source, pos, neg,
         |    CAST(coalesce(sum(neg) OVER (PARTITION BY source ORDER BY n_chars
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cnb
         |  FROM cells),
         |a AS (SELECT source, CAST(sum(pos) AS BIGINT) AS n_pos,
         |    CAST(sum(neg) AS BIGINT) AS n_neg,
         |    CAST(sum(pos * (2 * cnb + neg)) AS BIGINT) AS u2
         |  FROM c GROUP BY source)
         |SELECT source, n_pos, n_neg,
         |  CAST(CAST(u2 AS HUGEINT) * 1000000
         |    // (2 * CAST(n_pos AS HUGEINT) * n_neg) AS BIGINT) AS auc_ppm
         |FROM a WHERE n_pos > 0 AND n_neg > 0 ORDER BY source""".stripMargin,

    "q_salted_agg" ->
      s"""SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         |  CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_late_data" ->
      s"""WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS tus,
         |    (event_id * 1000003) % 10000019 AS arr FROM events),
         |r AS (SELECT event_type,
         |    max(tus) OVER (PARTITION BY user_id ORDER BY arr, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - tus AS late_us
         |  FROM ev)
         |SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         |  CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
         |  CAST(sum(CASE WHEN late_us > 3600000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1h,
         |  CAST(sum(CASE WHEN late_us > 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_late_1d,
         |  CAST(max(late_us) AS BIGINT) AS max_late_us
         |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,

    // per-source dataset card: volume, language spread + deterministic
    // dominant language, within-source exact-dup count, mean quality
    // (scores are multiples of 0.25, so the double sum is exact)
    "q_dataset_card" ->
      s"""WITH ${QualityScoreCtes},
         |dd AS (SELECT d2.source, d2.lang, sc.n_tokens,
         |    CAST(length(d2.text) AS BIGINT) AS n_chars,
         |    sha256(d2.text) AS h, sc.score
         |  FROM sc JOIN documents d2 ON sc.doc_id = d2.doc_id),
         |base AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
         |    CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
         |    CAST(sum(n_chars) AS BIGINT) AS n_chars,
         |    CAST(count(*) - count(DISTINCT h) AS BIGINT) AS n_dup_docs,
         |    sum(score) / count(*) AS mean_quality
         |  FROM dd GROUP BY source),
         |tl AS (SELECT source, lang AS top_lang FROM (
         |  SELECT source, lang, row_number() OVER (PARTITION BY source
         |      ORDER BY count(*) DESC, lang) AS rn
         |  FROM dd GROUP BY source, lang) z WHERE rn = 1)
         |SELECT base.source, n_docs, n_langs, top_lang, n_tokens, n_chars,
         |  n_dup_docs, mean_quality
         |FROM base JOIN tl ON base.source = tl.source
         |ORDER BY base.source""".stripMargin,

    // precision/recall sweep of the LSH candidate set against the blocked
    // exact-Jaccard pair table: the minhash CTE chain supplies the
    // candidates (+ exact Jaccard), a renamed copy of the ngram-dedup
    // chain supplies the truth pairs, and each side fans out over the
    // 4-row threshold list
    "q_lsh_pr_sweep" ->
      (MinhashCtes + ",\n" +
        s"""candj AS (SELECT c.doc_a, c.doc_b,
           |    CAST(coalesce(cm.common, 0) AS DOUBLE) /
           |      CAST(sa.sz + sb.sz - coalesce(cm.common, 0) AS DOUBLE) AS j_exact
           |  FROM cand c
           |  LEFT JOIN common cm ON c.doc_a = cm.doc_a AND c.doc_b = cm.doc_b
           |  JOIN sizes sa ON c.doc_a = sa.doc_id JOIN sizes sb ON c.doc_b = sb.doc_id),
           |nshs AS (SELECT DISTINCT doc_id, ${polyHashSql("sh")} AS h FROM shs),
           |nrare AS (SELECT h FROM (SELECT h, count(*) AS df FROM nshs GROUP BY h) f
           |  WHERE df <= 100),
           |nshr AS (SELECT s1.doc_id, s1.h FROM nshs s1 JOIN nrare USING (h)),
           |nsizes AS (SELECT doc_id, count(*) AS sz FROM nshs GROUP BY doc_id),
           |npairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS common
           |  FROM nshr a JOIN nshr b ON a.h = b.h AND a.doc_id < b.doc_id
           |  GROUP BY a.doc_id, b.doc_id),
           |truth AS (SELECT doc_a, doc_b, j_ngram FROM (
           |  SELECT doc_a, doc_b,
           |    CAST(common AS DOUBLE)/CAST(sa.sz + sb.sz - common AS DOUBLE) AS j_ngram
           |  FROM npairs JOIN nsizes sa ON doc_a = sa.doc_id
           |  JOIN nsizes sb ON doc_b = sb.doc_id) j WHERE j_ngram >= 0.2),
           |th AS (SELECT unnest([CAST(0.2 AS DOUBLE), CAST(0.25 AS DOUBLE),
           |  CAST(0.3 AS DOUBLE), CAST(0.4 AS DOUBLE)]) AS threshold),
           |t1 AS (SELECT threshold,
           |    CAST(sum(CASE WHEN j_ngram >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_truth
           |  FROM truth, th GROUP BY threshold),
           |t2 AS (SELECT threshold, CAST(count(*) AS BIGINT) AS n_cand,
           |    CAST(sum(CASE WHEN j_exact >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_cand_above
           |  FROM candj, th GROUP BY threshold),
           |m AS (SELECT c.doc_a, c.doc_b, t.j_ngram
           |  FROM candj c JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b),
           |t3 AS (SELECT threshold,
           |    CAST(sum(CASE WHEN j_ngram >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_cand_truth
           |  FROM m, th GROUP BY threshold)
           |SELECT t1.threshold, n_truth, n_cand,
           |  CAST(coalesce(n_cand_truth, 0) AS BIGINT) AS n_cand_truth, n_cand_above,
           |  CASE WHEN n_truth > 0
           |    THEN CAST(coalesce(n_cand_truth, 0) AS DOUBLE) / CAST(n_truth AS DOUBLE)
           |    ELSE CAST(0.0 AS DOUBLE) END AS recall,
           |  CASE WHEN n_cand > 0
           |    THEN CAST(n_cand_above AS DOUBLE) / CAST(n_cand AS DOUBLE)
           |    ELSE CAST(0.0 AS DOUBLE) END AS precision
           |FROM t1 JOIN t2 ON t1.threshold = t2.threshold
           |LEFT JOIN t3 ON t1.threshold = t3.threshold
           |ORDER BY t1.threshold""".stripMargin),

    // streaming LSH ingest probe: per new-snapshot doc (doc_id ≡ 3 mod 4),
    // its band-collision census against the accepted-corpus index — same
    // band construction as q_dedup_minhash, counting collision ROWS (the
    // batch q_dedup_incremental counts DISTINCT index docs)
    "q_stream_lsh_ingest" ->
      (MinhashCtes + ",\n" +
        s"""idx AS (SELECT b, key, doc_id AS index_doc FROM bands WHERE doc_id % 4 <> 3),
           |probe AS (SELECT doc_id, b, key FROM bands WHERE doc_id % 4 = 3)
           |SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_band_hits,
           |  min(i.index_doc) AS first_match
           |FROM probe p JOIN idx i ON p.b = i.b AND p.key = i.key
           |GROUP BY p.doc_id ORDER BY p.doc_id""".stripMargin),

    // streaming LSH probe-then-insert: per new-snapshot doc, collisions
    // against the static index AND against earlier-id stream docs (the
    // persistent carrier state drained in one batch ≡ min earlier-id doc
    // per band key); admitted = zero hits of either kind
    "q_stream_lsh_admit" ->
      (MinhashCtes + ",\n" +
        s"""idx AS (SELECT b, key, doc_id AS index_doc FROM bands WHERE doc_id % 4 <> 3),
           |probe AS (SELECT doc_id, b, key FROM bands WHERE doc_id % 4 = 3),
           |ih AS (SELECT p.doc_id,
           |    CAST(count(i.index_doc) AS BIGINT) AS n_index_hits,
           |    min(i.index_doc) AS fi
           |  FROM probe p LEFT JOIN idx i ON p.b = i.b AND p.key = i.key
           |  GROUP BY p.doc_id),
           |sh AS (SELECT p1.doc_id, p1.b, min(p2.doc_id) AS carrier
           |  FROM probe p1 JOIN probe p2
           |    ON p1.b = p2.b AND p1.key = p2.key AND p2.doc_id < p1.doc_id
           |  GROUP BY p1.doc_id, p1.b),
           |sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_stream_hits,
           |    min(carrier) AS fs
           |  FROM sh GROUP BY doc_id)
           |SELECT ih.doc_id, n_index_hits,
           |  CAST(coalesce(n_stream_hits, 0) AS BIGINT) AS n_stream_hits,
           |  CAST(CASE WHEN fi IS NULL AND fs IS NULL THEN -1
           |    ELSE least(coalesce(fi, fs), coalesce(fs, fi)) END AS BIGINT)
           |    AS first_match,
           |  (n_index_hits = 0 AND coalesce(n_stream_hits, 0) = 0) AS admitted
           |FROM ih LEFT JOIN sc ON ih.doc_id = sc.doc_id
           |ORDER BY ih.doc_id""".stripMargin),

    // DSIR importance log-weights: hashed-unigram bucket models (target =
    // lang 'en', raw = whole corpus), add-one smoothing over 256 buckets;
    // per-bucket terms rounded through DECIMAL(18,9) so the per-doc sum is
    // order-independent and bit-identical on both engines
    "q_dsir" ->
      s"""WITH w AS (SELECT doc_id, lang,
         |    unnest(list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'), x -> x <> '')) AS w
         |  FROM documents),
         |tok AS (SELECT doc_id, lang, ${polyHashSql("w")} % 256 AS bucket FROM w),
         |db AS (SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS c
         |  FROM tok GROUP BY doc_id, lang, bucket),
         |raw AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS r FROM db GROUP BY bucket),
         |tgt AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS t
         |  FROM db WHERE lang = 'en' GROUP BY bucket),
         |tot AS (SELECT (SELECT CAST(sum(r) AS BIGINT) FROM raw) AS rtot,
         |               (SELECT CAST(sum(t) AS BIGINT) FROM tgt) AS ttot),
         |term AS (SELECT db.doc_id, db.lang, db.c,
         |    CAST(CAST(db.c AS DOUBLE) *
         |      (ln(CAST(coalesce(tgt.t, 0) AS DOUBLE) + 1.0)
         |       - ln(CAST(raw.r AS DOUBLE) + 1.0)) AS DECIMAL(18,9)) AS term
         |  FROM db JOIN raw USING (bucket) LEFT JOIN tgt USING (bucket)),
         |p AS (SELECT doc_id, lang, sum(term) AS sum_term,
         |    CAST(sum(c) AS BIGINT) AS n_tokens
         |  FROM term GROUP BY doc_id, lang)
         |SELECT doc_id, lang, n_tokens,
         |  CAST(sum_term + CAST(CAST(n_tokens AS DOUBLE) *
         |    (ln(CAST(rtot AS DOUBLE) + 256) - ln(CAST(ttot AS DOUBLE) + 256))
         |    AS DECIMAL(18,9)) AS DOUBLE) AS dsir_logw
         |FROM p, tot ORDER BY doc_id""".stripMargin,

    // reciprocal-rank fusion of the quality score and the distinct-token
    // fraction: each signal's top-100 list ranked independently, fused
    // with 1/(60+rank); fused scores are sums of two exactly-representable
    // reciprocals
    "q_rank_fusion" ->
      s"""WITH ${QualityScoreCtes},
         |q AS (SELECT doc_id, score,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS r_quality
         |  FROM sc ORDER BY score DESC, doc_id LIMIT 100),
         |g AS (SELECT doc_id, CASE WHEN len(t) > 0
         |    THEN CAST(len(list_distinct(t)) AS DOUBLE) / CAST(len(t) AS DOUBLE)
         |    ELSE CAST(0.0 AS DOUBLE) END AS distinct_frac FROM d),
         |dv AS (SELECT doc_id, distinct_frac,
         |    CAST(row_number() OVER (ORDER BY distinct_frac DESC, doc_id) AS BIGINT) AS r_diversity
         |  FROM g ORDER BY distinct_frac DESC, doc_id LIMIT 100)
         |SELECT coalesce(q.doc_id, dv.doc_id) AS doc_id,
         |  CAST(coalesce(r_quality, 0) AS BIGINT) AS r_quality,
         |  CAST(coalesce(r_diversity, 0) AS BIGINT) AS r_diversity,
         |  coalesce(1.0 / CAST(60 + r_quality AS DOUBLE), CAST(0.0 AS DOUBLE))
         |  + coalesce(1.0 / CAST(60 + r_diversity AS DOUBLE), CAST(0.0 AS DOUBLE)) AS rrf_score
         |FROM q FULL OUTER JOIN dv ON q.doc_id = dv.doc_id
         |ORDER BY rrf_score DESC, doc_id LIMIT 25""".stripMargin,

    // merged per-source MinHash signatures (element-wise min over the
    // source's docs — min over all (doc, i) minima of the source) and the
    // pairwise signature-agreement Jaccard estimate between sources
    "q_source_similarity" ->
      s"""WITH d AS (SELECT doc_id, list_filter(regexp_split_to_array(text,'[^a-zA-Z]+'),
         |    w -> w <> '') AS t FROM documents),
         |shs AS (SELECT DISTINCT doc_id, sh FROM (
         |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(t)-1, 1)),
         |    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS sh FROM d) z),
         |hashed AS (SELECT doc_id, ${polyHashSql("sh")} AS h1,
         |  ${polyHashSql("sh", 131, 1000000009L)} AS h2 FROM shs),
         |perms AS (SELECT doc_id, i, min((h1 + i*h2) % 2147483647) AS mv
         |  FROM hashed, (SELECT unnest(range(0,64)) AS i) ii GROUP BY doc_id, i),
         |merged AS (SELECT dc.source, p.i, min(p.mv) AS mv
         |  FROM perms p JOIN documents dc USING (doc_id) GROUP BY dc.source, p.i)
         |SELECT a.source AS src_a, b.source AS src_b,
         |  CAST(sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS BIGINT) AS n_agree,
         |  CAST(sum(CASE WHEN a.mv = b.mv THEN 1 ELSE 0 END) AS DOUBLE) / 64.0 AS jaccard_est
         |FROM merged a JOIN merged b ON a.i = b.i AND a.source < b.source
         |GROUP BY a.source, b.source ORDER BY src_a, src_b""".stripMargin,

    // language-ID confusion matrix: same marker rule as q_lang_id, grouped
    // into (labeled, pred) cells with each cell's share of its labeled row
    "q_langid_eval" ->
      s"""WITH d AS ($TokList),
         |s AS (SELECT doc_id, lang AS labeled_lang,
         |  CAST(len(list_filter(t, w -> w IN ('the','a','of'))) AS BIGINT) AS s_en,
         |  CAST(len(list_filter(t, w -> w IN ('der','die','das'))) AS BIGINT) AS s_de,
         |  CAST(len(list_filter(t, w -> w IN ('le','la','les'))) AS BIGINT) AS s_fr,
         |  CAST(len(list_filter(t, w -> w IN ('el','los','las'))) AS BIGINT) AS s_es
         |FROM d),
         |li AS (SELECT doc_id, labeled_lang,
         |  CASE WHEN s_es > greatest(s_en, s_de, s_fr, CAST(0 AS BIGINT)) THEN 'es'
         |       WHEN s_fr > greatest(s_en, s_de, CAST(0 AS BIGINT)) THEN 'fr'
         |       WHEN s_de > greatest(s_en, CAST(0 AS BIGINT)) THEN 'de'
         |       WHEN s_en > CAST(0 AS BIGINT) THEN 'en'
         |       ELSE 'und' END AS pred_lang FROM s),
         |cm AS (SELECT labeled_lang, pred_lang, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM li GROUP BY labeled_lang, pred_lang)
         |SELECT labeled_lang, pred_lang, n_docs,
         |  CAST(n_docs AS DOUBLE) /
         |    CAST(sum(n_docs) OVER (PARTITION BY labeled_lang) AS DOUBLE) AS frac_of_labeled
         |FROM cm ORDER BY labeled_lang, pred_lang""".stripMargin,

    // quality-filter threshold sweep: survivors and surviving tokens per
    // candidate threshold; the thr = 0 row is the corpus total (score >= 0
    // always), so the fraction needs no second corpus pass
    "q_quality_sweep" ->
      s"""WITH ${QualityScoreCtes},
         |th AS (SELECT unnest([CAST(0.0 AS DOUBLE), CAST(0.25 AS DOUBLE),
         |    CAST(0.5 AS DOUBLE), CAST(0.75 AS DOUBLE), CAST(1.0 AS DOUBLE)]) AS threshold),
         |ag AS (SELECT threshold,
         |    CAST(sum(CASE WHEN score >= threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
         |    CAST(sum(CASE WHEN score >= threshold THEN n_tokens ELSE 0 END) AS BIGINT) AS n_tokens_kept
         |  FROM sc, th GROUP BY threshold)
         |SELECT threshold, n_docs, n_tokens_kept,
         |  CAST(n_docs AS DOUBLE) / CAST(max(n_docs) OVER () AS DOUBLE) AS frac_docs
         |FROM ag ORDER BY threshold""".stripMargin,

    // integer-exact Lloyd k-means: see kmeansCtes for the unrolled rounds
    "q_kmeans" ->
      s"""$kmeansCtes,
         |g AS (SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
         |    CAST(sum(dist) AS BIGINT) AS wss
         |  FROM b${KmIters + 1} WHERE r = 1 GROUP BY cid)
         |SELECT g.cid, g.n_vecs, g.wss, c.cv[1] AS c0, c.cv[2] AS c1,
         |  CAST(list_sum(list_transform(c.cv, x -> abs(x))) AS BIGINT) AS c_l1
         |FROM g JOIN k$KmIters c ON g.cid = c.cid ORDER BY g.cid""".stripMargin,

    // product quantization: codes and integer reconstruction error from
    // the unrolled per-subspace Lloyd loop
    "q_embedding_pq" ->
      s"""$pqCtes
         |SELECT vec_id,
         |  max(CASE WHEN m = 0 THEN cid END) AS code0,
         |  max(CASE WHEN m = 1 THEN cid END) AS code1,
         |  max(CASE WHEN m = 2 THEN cid END) AS code2,
         |  max(CASE WHEN m = 3 THEN cid END) AS code3,
         |  CAST(sum(dist) AS BIGINT) AS sq_err
         |FROM pb${KmIters + 1} WHERE r = 1
         |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    // ADC: per-probe LUT of exact-subvector-to-codebook distances, then
    // approximate distance = sum of M lookups over the codes
    "q_ann_adc" ->
      s"""$pqCtes,
         |codes AS (SELECT vec_id, m, cid FROM pb${KmIters + 1} WHERE r = 1),
         |lut AS (SELECT p.vec_id AS probe_id, p.m, c.cid,
         |    CAST(list_sum(list_transform(range(1, ${graft.operators.Clustering.PqSubD + 1}),
         |      i -> (p.qsub[i]-c.cv[i])*(p.qsub[i]-c.cv[i]))) AS BIGINT) AS pd
         |  FROM psub p JOIN pk$KmIters c ON p.m = c.m WHERE p.vec_id < 5),
         |ad AS (SELECT l.probe_id, cd.vec_id, CAST(sum(l.pd) AS BIGINT) AS adist
         |  FROM codes cd JOIN lut l ON cd.m = l.m AND cd.cid = l.cid
         |  WHERE cd.vec_id <> l.probe_id
         |  GROUP BY l.probe_id, cd.vec_id),
         |rr AS (SELECT probe_id, vec_id, adist,
         |    CAST(row_number() OVER (PARTITION BY probe_id ORDER BY adist, vec_id)
         |      AS BIGINT) AS rank
         |  FROM ad)
         |SELECT probe_id, vec_id, adist, rank FROM rr WHERE rank <= 10
         |ORDER BY probe_id, rank""".stripMargin,

    // SemDeDup: within-cluster lower-id witness with cosine >= tau drops
    // the higher id; cosine is the same left-to-right fold as the engine
    "q_semdedup" ->
      (semDedupPairCtes + ",\n" +
        s"""f AS (SELECT vec_id, cid, kept_by, cos,
           |    row_number() OVER (PARTITION BY vec_id ORDER BY kept_by) AS rr
           |  FROM p WHERE cos >= CAST(0.3 AS DOUBLE))
           |SELECT vec_id, cid, kept_by, cos FROM f WHERE rr = 1 ORDER BY vec_id""".stripMargin),

    // threshold sweep over the same scored pair table; tau literals are
    // IEEE-identical on both engines so the >= comparisons are exact
    "q_semdedup_sweep" ->
      (semDedupPairCtes + "\n" +
        s"""SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(count(DISTINCT vec_id) AS BIGINT) AS n_dropped
           |FROM p JOIN (SELECT unnest([${graft.operators.Clustering.SweepTaus
                  .map(t => s"CAST($t AS DOUBLE)").mkString(", ")}]) AS tau) t
           |  ON p.cos >= t.tau
           |GROUP BY tau ORDER BY tau""".stripMargin),

    // ------------------------------------------------------- multimodal
    // REAL-CODEC lanes (rounds 12-13): img rows are synthesized PNGs
    // (w = id%300+8, h = id*7%48+8, one stored-deflate block → byte
    // length h*(1+3w)+68) parsed by javax.imageio; audio rows are PCM16
    // mono WAVs (id%2000+100 samples at 8 kHz → 44+2n bytes) parsed by
    // javax.sound; video rows are multi-frame animated GIFs
    // (w = id%350+8, h = id*5%24+4, frames = id%14+2, uncompressed LZW:
    // per frame D = N + (N-1) div 125 + 2 one-byte codes over N = w*h
    // pixels, blob = 398 + frames*(12 + D + ceil(D/255)) — Codecs.scala
    // documents the derivation) decoded by ImageIO's GIF reader. The
    // oracle replays the SYNTHESIS closed forms; the engine reports what
    // the codec parsed.
    "q_multimodal_meta" ->
      s"""WITH d AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS k,
         |    CAST(doc_id % 350 + 8 AS BIGINT) AS vw,
         |    CAST((doc_id * 5) % 24 + 4 AS BIGINT) AS vh,
         |    CAST(doc_id % 14 + 2 AS BIGINT) AS vf
         |  FROM documents),
         |v AS (SELECT *, vw * vh + (vw * vh - 1) // 125 + 2 AS vd FROM d)
         |SELECT doc_id,
         |  CAST(CASE k
         |    WHEN 0 THEN ((doc_id * 7) % 48 + 8) * (1 + 3 * (doc_id % 300 + 8)) + 68
         |    WHEN 1 THEN 44 + 2 * (doc_id % 2000 + 100)
         |    ELSE 398 + vf * (12 + vd + (vd + 254) // 255) END AS BIGINT) AS n_bytes,
         |  CAST(CASE k
         |    WHEN 0 THEN doc_id % 300 + 8
         |    WHEN 1 THEN doc_id % 2000 + 100
         |    ELSE vw END AS BIGINT) AS width,
         |  CAST(CASE k
         |    WHEN 0 THEN (doc_id * 7) % 48 + 8
         |    WHEN 1 THEN 8000
         |    ELSE vh END AS BIGINT) AS height,
         |  CASE k WHEN 0 THEN 'png' WHEN 1 THEN 'wave'
         |    ELSE 'gif' END AS format
         |FROM v ORDER BY doc_id""".stripMargin,

    // cross-modal retrieval over the stub 8-dim integer embedding
    // ((h1 + i*h2) % 1000 - 500); exact integer squared-L2, ties by doc_id
    "q_multimodal_embed" ->
      s"""WITH e AS (SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'img'
         |      WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         |    list_transform(range(1, 9), i ->
         |      (${polyHashSql("text")} + i * ${polyHashSql("text", 131, 1000000009L)})
         |        % 1000 - 500) AS v
         |  FROM documents),
         |p AS (SELECT doc_id AS probe_id, kind AS probe_kind, v AS pv
         |  FROM e WHERE doc_id < 5),
         |sc AS (SELECT probe_id, probe_kind, e.doc_id, e.kind,
         |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
         |      list_transform(range(1, 9),
         |        i -> (pv[i] - v[i]) * (pv[i] - v[i]))),
         |      (a, b) -> a + b) AS BIGINT) AS dist
         |  FROM e JOIN p ON e.kind <> probe_kind),
         |r AS (SELECT *, CAST(row_number() OVER (PARTITION BY probe_id
         |    ORDER BY dist, doc_id) AS BIGINT) AS rank
         |  FROM sc QUALIFY rank <= 3)
         |SELECT probe_id, probe_kind, doc_id, kind, dist, rank
         |FROM r ORDER BY probe_id, rank""".stripMargin,

    // exact media dedup by payload digest: media = UTF-8 bytes of text
    // (ASCII fixture → sha256(text) hashes the same bytes), modality from
    // doc_id % 3 as in the other multimodal oracles
    "q_multimodal_dedup" ->
      s"""WITH m AS (SELECT doc_id,
         |    CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'img' WHEN 1 THEN 'audio'
         |      ELSE 'video' END AS kind,
         |    sha256(text) AS h, CAST(length(text) AS BIGINT) AS len
         |  FROM documents),
         |g AS (SELECT kind, h, min(doc_id) AS keep_id,
         |    CAST(count(*) AS BIGINT) AS n_copies, min(len) AS n_bytes
         |  FROM m GROUP BY kind, h)
         |SELECT kind, h, keep_id, n_copies, n_bytes,
         |  CAST((n_copies - 1) * n_bytes AS BIGINT) AS dup_bytes
         |FROM g ORDER BY kind, h""".stripMargin,

    // img: real ImageIO pixel decode — checksum is the decoded RGB byte
    // sum, which for the constant-pixel synthesis is w*h*3*(id%256);
    // audio: real PCM decode — checksum is the little-endian byte sum of
    // n identical 16-bit samples; video: real GIF decode of every 5th
    // frame — checksum is the sum of the sampled frames' raster index
    // sums, which for the constant-index synthesis is Σ w*h*((id+f)%128)
    "q_multimodal_transform" ->
      s"""WITH m AS (SELECT doc_id, CAST(doc_id % 3 AS INTEGER) AS k
         |  FROM documents),
         |d AS (SELECT doc_id, k,
         |    CAST(CASE k WHEN 0 THEN doc_id % 300 + 8
         |      ELSE doc_id % 350 + 8 END AS BIGINT) AS w,
         |    CAST(CASE k WHEN 0 THEN (doc_id * 7) % 48 + 8
         |      ELSE (doc_id * 5) % 24 + 4 END AS BIGINT) AS h,
         |    CAST(doc_id % 14 + 2 AS BIGINT) AS vf
         |  FROM m)
         |SELECT doc_id,
         |  CASE k WHEN 0 THEN 'img' WHEN 1 THEN 'audio' ELSE 'video' END AS format,
         |  CAST(CASE WHEN k = 1 THEN (doc_id % 2000 + 100) // 2
         |       WHEN greatest(w, h) <= 224 THEN w
         |       ELSE greatest(w * 224 // greatest(w, h), 1) END AS BIGINT) AS out_w,
         |  CAST(CASE WHEN k = 1 THEN 1
         |       WHEN greatest(w, h) <= 224 THEN h
         |       ELSE greatest(h * 224 // greatest(w, h), 1) END AS BIGINT) AS out_h,
         |  CAST(CASE WHEN k = 2 THEN (vf + 4) // 5
         |       ELSE 1 END AS BIGINT) AS n_frames_sampled,
         |  CAST(CASE k
         |    WHEN 0 THEN (w * h * 3 * (doc_id % 256)) % 1000000007
         |    WHEN 1 THEN ((doc_id % 2000 + 100) *
         |      ((doc_id % 1000) % 256 + (doc_id % 1000) // 256)) % 1000000007
         |    ELSE list_aggregate(list_transform(range(0, vf, 5),
         |      f -> w * h * ((doc_id + f) % 128)), 'sum') % 1000000007
         |    END AS BIGINT) AS checksum
         |FROM d ORDER BY doc_id""".stripMargin,

    // per-frame fan-out for video blobs: the engine decodes every 5th
    // GIF frame for real; the oracle replays the constant-index raster
    // sum w*h*((id+f)%128) per sampled frame
    "q_multimodal_frames" ->
      s"""WITH v AS (SELECT doc_id,
         |    CAST(doc_id % 350 + 8 AS BIGINT) AS w,
         |    CAST((doc_id * 5) % 24 + 4 AS BIGINT) AS h,
         |    CAST(doc_id % 14 + 2 AS BIGINT) AS vf
         |  FROM documents WHERE doc_id % 3 = 2),
         |f AS (SELECT doc_id, w, h, unnest(range(0, vf, 5)) AS frame_no FROM v)
         |SELECT doc_id, CAST(frame_no AS BIGINT) AS frame_no,
         |  CAST((w * h * ((doc_id + frame_no) % 128)) % 1000000007 AS BIGINT) AS frame_fp
         |FROM f ORDER BY doc_id, frame_no""".stripMargin,

    // -------------------------------------------------------- streaming
    "q_stream_window" ->
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
         |  count(*) AS n
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    // append-mode watermarked windows: exactly the windows whose end is at
    // or below the final watermark (max event time − 1 h) are emitted
    "q_stream_window_wm" ->
      s"""WITH m AS (SELECT max(ts) AS mx FROM events),
         |g AS (SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2)
         |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type, n
         |FROM g, m WHERE h + INTERVAL '1 hour' <= mx - INTERVAL '1 hour'
         |ORDER BY hour, event_type""".stripMargin,

    // streaming WAU closed set: a day [d, d+1) emits when d+1 ≤ final
    // watermark = (max event day + 6d) − 8d, same contract as
    // q_stream_window_wm's closure filter
    "q_stream_active_users" ->
      s"""WITH du AS (SELECT DISTINCT date_trunc('day', ts) AS d, user_id
         |  FROM events),
         |m AS (SELECT date_trunc('day', max(ts)) AS mxd FROM events),
         |f AS (SELECT d + i * INTERVAL '1 day' AS day, user_id
         |  FROM du, range(7) r(i)),
         |w AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
         |  FROM f GROUP BY 1)
         |SELECT strftime(day, '%Y-%m-%d') AS day, wau
         |FROM w, m
         |WHERE day + INTERVAL '1 day' <= mxd + INTERVAL '6 days' - INTERVAL '8 days'
         |ORDER BY day""".stripMargin,

    // exact order statistics from (hour, cents) count cells: the
    // percentile is the smallest value whose cumulative count reaches
    // ceil(q*n), expressed as cum*100 >= tot*q on integers
    "q_stream_percentile" ->
      s"""WITH cells AS (SELECT strftime(date_trunc('hour', ts),
         |    '%Y-%m-%d %H:%M:%S') AS hour,
         |    CAST(floor(value * 100) AS BIGINT) AS cents,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |c AS (SELECT hour, cents, n,
         |    CAST(sum(n) OVER (PARTITION BY hour ORDER BY cents
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         |    CAST(sum(n) OVER (PARTITION BY hour) AS BIGINT) AS tot
         |  FROM cells)
         |SELECT hour, CAST(max(tot) AS BIGINT) AS n_events,
         |  min(CASE WHEN cum * 100 >= tot * 50 THEN cents END) AS p50,
         |  min(CASE WHEN cum * 100 >= tot * 95 THEN cents END) AS p95,
         |  min(CASE WHEN cum * 100 >= tot * 99 THEN cents END) AS p99
         |FROM c GROUP BY hour ORDER BY hour""".stripMargin,

    "q_stream_dedup" ->
      s"""SELECT DISTINCT user_id,
         |  strftime(date_trunc('minute', ts), '%Y-%m-%d %H:%M') AS minute
         |FROM events ORDER BY user_id, minute""".stripMargin,

    "q_stream_static_join" ->
      s"""WITH p AS (SELECT o_custkey AS user_id, count(*) AS n_orders
         |  FROM orders GROUP BY 1)
         |SELECT event_type,
         |  CASE WHEN coalesce(n_orders, 0) >= 12 THEN 'heavy' ELSE 'light' END AS tier,
         |  count(*) AS n
         |FROM events LEFT JOIN p USING (user_id)
         |GROUP BY 1, 2 ORDER BY event_type, tier""".stripMargin,

    "q_stream_stream_join" ->
      s"""SELECT a.user_id, a.event_id AS view_id, b.event_id AS purchase_id
         |FROM events a JOIN events b ON a.user_id = b.user_id
         |  AND a.event_type = 'view' AND b.event_type = 'purchase'
         |  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL '30 minutes'
         |ORDER BY a.user_id, view_id, purchase_id""".stripMargin,

    // closed set of the streaming left-outer interval join: all inner
    // matches, plus views provably unmatched at the final watermark
    // (max event time at ms precision − 1 h, the engine's watermark unit)
    "q_stream_outer_join" ->
      s"""WITH v AS (SELECT user_id, ts AS view_ts, event_id AS view_id
         |  FROM events WHERE event_type = 'view'),
         |p AS (SELECT user_id AS p_user, ts AS purchase_ts, event_id AS purchase_id
         |  FROM events WHERE event_type = 'purchase'),
         |wm AS (SELECT date_trunc('millisecond', least(
         |    (SELECT max(ts) FROM events WHERE event_type = 'view'),
         |    (SELECT max(ts) FROM events WHERE event_type = 'purchase')))
         |  - INTERVAL 1 HOUR AS w),
         |m AS (SELECT v.user_id, v.view_id, p.purchase_id
         |  FROM v JOIN p ON v.user_id = p.p_user
         |    AND p.purchase_ts >= v.view_ts
         |    AND p.purchase_ts <= v.view_ts + INTERVAL '30 minutes'),
         |um AS (SELECT v.user_id, v.view_id, CAST(-1 AS BIGINT) AS purchase_id
         |  FROM v CROSS JOIN wm
         |  WHERE v.view_ts + INTERVAL '30 minutes' < wm.w
         |    AND NOT EXISTS (SELECT 1 FROM p WHERE p.p_user = v.user_id
         |      AND p.purchase_ts >= v.view_ts
         |      AND p.purchase_ts <= v.view_ts + INTERVAL '30 minutes'))
         |SELECT * FROM m UNION ALL SELECT * FROM um
         |ORDER BY user_id, view_id, purchase_id""".stripMargin,

    "q_stream_current" ->
      s"""WITH r AS (SELECT user_id, event_type,
         |    row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
         |  FROM events),
         |c AS (SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id)
         |SELECT c.user_id, n_events, r.event_type AS last_type
         |FROM c JOIN r ON c.user_id = r.user_id AND r.rn = 1
         |ORDER BY c.user_id""".stripMargin,

    "q_stream_sessions" ->
      s"""WITH e AS (SELECT user_id, ts, event_id,
         |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
         |  FROM events),
         |s AS (SELECT user_id,
         |    CASE WHEN prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000
         |      THEN 1 ELSE 0 END AS new_sess FROM e)
         |SELECT user_id, CAST(sum(new_sess) AS BIGINT) AS n_sessions, count(*) AS n_events
         |FROM s GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_stream_topk" ->
      s"""SELECT user_id, count(*) AS n FROM events
         |GROUP BY user_id ORDER BY n DESC, user_id LIMIT 10""".stripMargin,

    // stream → graftkv V2 sink → graftkv V2 source: after the one-shot
    // drain the kv snapshot equals the batch per-type count
    "q_stream_kv_sink" ->
      s"""SELECT event_type AS key, count(*) AS n FROM events
         |GROUP BY event_type ORDER BY key""".stripMargin,

    // incremental first-occurrence census: min-owner + count commute
    // across any micro-batch order, so the drained stream equals this
    // batch census exactly
    "q_stream_cdc_dedup" ->
      s"""WITH ch AS ($CdcChunkRowsSql),
         |r AS (SELECT chunk_hash, doc_id, chunk_idx, chunk_len,
         |    row_number() OVER (PARTITION BY chunk_hash
         |      ORDER BY doc_id, chunk_idx) AS rn,
         |    count(*) OVER (PARTITION BY chunk_hash) AS n_occ
         |  FROM ch)
         |SELECT chunk_hash, doc_id AS owner_doc, chunk_idx AS owner_idx,
         |  chunk_len, CAST(n_occ AS BIGINT) AS n_occ,
         |  CAST((n_occ - 1) * chunk_len AS BIGINT) AS dup_bytes
         |FROM r WHERE rn = 1 ORDER BY chunk_hash""".stripMargin,

    // min-K by hash is a commutative semilattice, so the drained stream's
    // kept set equals the batch quota exactly — same SQL as q_domain_cap
    "q_stream_domain_cap" ->
      """WITH r AS (SELECT source, doc_id,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY (doc_id * 2654435761) % 4294967296, doc_id) AS rk
        |  FROM documents)
        |SELECT source, doc_id, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 15 ORDER BY source, rk""".stripMargin,

    // the drained stream's kept set equals the batch PPS sample exactly
    // (min-K over the u/w priority is a commutative semilattice) — same
    // ranking SQL as q_pps_sample, minus the n_chars column the streaming
    // state doesn't carry
    "q_stream_pps_sample" ->
      """WITH r AS (SELECT lang, doc_id,
        |  row_number() OVER (PARTITION BY lang
        |    ORDER BY CAST((doc_id * 2654435761) % 4294967296 AS DOUBLE) / n_chars,
        |      doc_id) AS rk
        |  FROM documents)
        |SELECT lang, doc_id, CAST(rk AS BIGINT) AS rk
        |FROM r WHERE rk <= 20 ORDER BY lang, rk""".stripMargin
  )
}
