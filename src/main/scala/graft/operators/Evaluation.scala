package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Pipeline-quality evaluation operators: the measurements a production
  * training-data platform runs continuously over its own indexes and
  * models — ANN recall against the exact baseline, and a
  * nearest-prototype classifier confusion matrix over the labeled
  * embedding corpus.
  *
  * Both are deterministic and integer-exact (counts and ppm fractions,
  * no libm), so the DuckDB oracle reproduces them bit-for-bit; and both
  * ride plans that are already verified hash-green ([[Pipeline.annLsh]],
  * [[Pipeline.similarityTopk]], the [[Clustering.labelCentroids]]
  * centroid table), so the eval layer adds no new scale hazard: its
  * inputs are top-k tables (10 rows per probe) and a k-row centroid
  * broadcast.
  *
  * Reference analog: the reference proves its own correctness by diffing
  * against a sequential oracle (`test-mr.sh:60-117`); these queries are
  * the same philosophy applied to approximate operators, where the
  * "diff" is a quantified recall/accuracy instead of byte equality.
  */
object Evaluation {

  /** Recall@10 of the multi-table LSH ANN ([[Pipeline.annLsh]]) against
    * the exact brute-force top-10 ([[Pipeline.similarityTopk]]), per
    * probe: |ANN ∩ exact| / |exact| in exact parts-per-million. The
    * continuous index-quality monitor of a vector store — run on a probe
    * sample, it detects recall regressions after re-index or plane/table
    * retuning.
    *
    * Scale shape: both inputs end at 10 rows per probe, so the eval join
    * is probe-sample-sized regardless of corpus size; the cost is the two
    * underlying (already linear-shuffle) pipelines, and the LSH index is
    * the shared cached build. */
  def annRecall(s: SparkSession, dir: String): DataFrame = {
    val exact = Pipeline.similarityTopk(s, dir).select(col("probe_id"), col("vec_id"))
    val ann = Pipeline.annLsh(s, dir)
      .select(col("probe_id"), col("vec_id"), lit(1L).as("hit"))
    exact.join(ann, Seq("probe_id", "vec_id"), "left")
      .groupBy("probe_id")
      .agg(count(lit(1)).as("n_exact"), count(col("hit")).as("n_hit"))
      .select(col("probe_id"), col("n_exact"), col("n_hit"),
        expr("n_hit * 1000000L div n_exact").as("recall_ppm"))
      .orderBy("probe_id")
  }

  /** Nearest-prototype classifier evaluation: assign every labeled
    * vector to its closest per-label centroid (the
    * [[Clustering.labelCentroids]] prototypes, int64-quantized space,
    * codegen'd integer squared distance, ties by label) and cross-tab
    * predictions against true labels — the confusion matrix with exact
    * per-true-label share_ppm. This is the eval step of a
    * prototype-based labeling pipeline (few-shot classification over
    * embeddings); training-data platforms run it to monitor label noise
    * and embedding drift.
    *
    * Scale shape: the 10-row centroid table is an aggregate of one
    * (label, dim) shuffle and broadcasts to every executor; assignment is
    * a narrow map-side pass (corpus × k integer folds), and the output
    * is at most k² cells. Diagonal cells are the per-class hits. */
  def evalConfusion(s: SparkSession, dir: String): DataFrame = {
    val q = Clustering.labeledQVecs(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("true_label"),
        col("qv"))
    // per-label prototype centroids: the SAME cells (quantization +
    // truncated mean) as Clustering.labelCentroids, assembled to vectors
    val cents = Clustering.labelCentroidCells(s, dir)
      .select(col("label").cast("long").as("plabel"), col("i"), col("c"))
      .groupBy("plabel")
      .agg(array_sort(collect_list(struct(col("i"), col("c"))))
        .getField("c").as("cv"))
    val w = Window.partitionBy("vec_id").orderBy(col("dist"), col("plabel"))
    val pred = q.crossJoin(broadcast(cents))
      .withColumn("dist", Fns.sqDistL(col("qv"), col("cv")))
      .withColumn("r", row_number().over(w)).filter(col("r") === 1)
      .select(col("vec_id"), col("true_label"), col("plabel").as("pred_label"))
    val rowTot = pred.groupBy("true_label").agg(count(lit(1)).as("n_true"))
    pred.groupBy("true_label", "pred_label").agg(count(lit(1)).as("n"))
      .join(broadcast(rowTot), Seq("true_label"))
      .select(col("true_label"), col("pred_label"), col("n"), col("n_true"),
        expr("n * 1000000L div n_true").as("share_ppm"))
      .orderBy("true_label", "pred_label")
  }
}
