package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.Fns

/** The reference's application suite (`/root/reference/src/mrapps/&#42;.go`)
  * re-expressed as declarative DataFrame pipelines over the `documents`
  * fixture (doc_id ≙ filename, text ≙ file contents — FIXTURES.md §2).
  *
  * Every query is a narrow scan → (optional explode) → hash-aggregate plan:
  * one shuffle each, map-side partial aggregation automatic, fully inside
  * whole-stage codegen. The final `orderBy` exists only to make the driver's
  * hash compare deterministic; Catalyst's EliminateSorts removes it under
  * the benchmark's `count()` action.
  */
object MrSuite {

  /** Exploded (doc_id, word) pairs — the map phase of wc.go:21-34. */
  private[graft] def tokenPairs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(Fns.tokensArr(col("text"))).as("word"))
      .filter(col("word") =!= "")

  /** wc.go — word count. Reduce `len(values)` is a pure fold, so this takes
    * the efficient `count` path (partial + final aggregate), not
    * collect_list (SURVEY §2 #5). */
  def wordCount(s: SparkSession, dir: String): DataFrame =
    tokenPairs(s, dir).groupBy("word").agg(count(lit(1)).as("cnt")).orderBy("word")

  /** The reference's reduce-partition assignment
    * (`/root/reference/src/mr/worker.go:22-26`: FNV-1a 32, `& 0x7fffffff`,
    * `% nReduce`): how the word key space spreads over nReduce=10 reduce
    * partitions — byte-compatible with the reference's layout, so a user
    * can predict exactly which mr-out-R file a key lands in. */
  def partitionDiag(s: SparkSession, dir: String): DataFrame =
    tokenPairs(s, dir)
      .select(col("word"),
        pmod(graft.functions.VectorExpressions.fnv1a(col("word"))
          .bitwiseAND(lit(0x7fffffffL)), lit(10L)).as("partition"))
      .groupBy("partition")
      .agg(count(lit(1)).as("n_tokens"), countDistinct(col("word")).as("n_words"))
      .orderBy("partition")

  /** Word count under the Unicode tokenizer (exact `unicode.IsLetter`
    * semantics of wc.go:23 via \p{L}). The fixture corpus is ASCII, so
    * accented input is synthesized deterministically — translate a→ä, e→é —
    * identically on both engines, making the non-ASCII path oracle-checked
    * rather than trusted. */
  def unicodeWordCount(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(Fns.tokensArrUnicode(
        translate(col("text"), "ae", "äé"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .orderBy("word")

  /** indexer.go:20-39 — inverted index: per-document distinct words, then
    * per word: document count + lexicographically sorted CSV of doc ids. */
  def invertedIndex(s: SparkSession, dir: String): DataFrame =
    tokenPairs(s, dir)
      .select(col("word"), col("doc_id").cast("string").as("doc"))
      .distinct()
      .groupBy("word")
      .agg(count(lit(1)).as("n_docs"),
           array_join(sort_array(collect_set(col("doc"))), ",").as("docs"))
      .orderBy("word")

  /** crash.go:34-55 / nocrash.go payload — map emits four fixed keys a–d
    * with (filename, len(filename), len(contents), "xyzzy"); reduce sorts
    * the complete value list and joins with a single space. This is the
    * canonical *non-decomposable* reduce: it needs every value, so it maps
    * to collect_list + sort_array, not a fold (SURVEY §1). */
  def sortedConcat(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(s, dir).select(
      col("doc_id").cast("string").as("doc"), col("n_chars"))
    val kv = d.select(explode(array(
        struct(lit("a").as("key"), col("doc").as("value")),
        struct(lit("b").as("key"), length(col("doc")).cast("string").as("value")),
        struct(lit("c").as("key"), col("n_chars").cast("string").as("value")),
        struct(lit("d").as("key"), lit("xyzzy").as("value")))).as("kv"))
      .select(col("kv.key").as("key"), col("kv.value").as("value"))
    kv.groupBy("key")
      .agg(concat_ws(" ", sort_array(collect_list(col("value")))).as("cval"))
      .orderBy("key")
  }

  /** early_exit.go:21-40 — per-file count (here: tokens per document). */
  def tokensPerDoc(s: SparkSession, dir: String): DataFrame =
    tokenPairs(s, dir).groupBy("doc_id").agg(count(lit(1)).as("n_tokens"))
      .orderBy("doc_id")

  /** indexer.go:21-26's per-doc distinct, lifted to the whole corpus:
    * global distinct vocabulary. */
  def distinctWords(s: SparkSession, dir: String): DataFrame =
    tokenPairs(s, dir).select("word").distinct().orderBy("word")

  /** mrsequential.go:59 sort-by-key, generalized: total-order sort of the
    * documents table (range-partitioned sort at cluster scale). */
  def sortDocs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("lang"), col("n_chars").desc, col("doc_id"))

  /** Distributed grep — the canonical MapReduce example workload (map
    * emits matching records, reduce is identity; Dean & Ghemawat §2.3, see
    * PAPERS.md): documents whose text matches a pattern, with the first
    * match and its position surfaced. The filter is predicate-pushdown-
    * friendly and the scan is embarrassingly parallel — grep's map-only
    * shape is the degenerate case the reference schedules with zero
    * reduce work. */
  def grepDocs(s: SparkSession, dir: String): DataFrame = {
    val pat = "s[a-z]*a[a-z]+" // s…a…-shaped words (scan, small, spark, stream)
    Tables.documents(s, dir)
      .filter(col("text").rlike(pat))
      .select(col("doc_id"),
        regexp_extract(col("text"), pat, 0).as("first_match"),
        (expr(s"regexp_instr(text, '$pat')") - 1).cast("long").as("pos0"))
      .orderBy("doc_id")
  }

  /** Union of heterogeneous sources into one keyspace — the implicit union
    * of all map outputs (`worker.go:98-123`). */
  def unionNames(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir).select(col("c_name").as("name"), lit("customer").as("kind"))
      .union(Tables.supplier(s, dir).select(col("s_name"), lit("supplier")))
      .orderBy("kind", "name")
}
