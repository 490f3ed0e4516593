package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.mr.{MapReduceJob, RefApps}

/** The reference plugin apps executed through the generic
  * [[graft.mr.MapReduceJob]] API — proving the plugin contract
  * (`Map(file, contents) → []KV`, `Reduce(key, values) → string`,
  * `/root/reference/src/main/mrworker.go:34-43`) runs unchanged on this
  * engine. The pure-DataFrame twins in [[MrSuite]] are the optimized path;
  * these go through `groupByKey`+`mapGroups` exactly like an opaque user
  * reducer would, and hash-match the same oracles. */
object MrApi {

  def mrWordCount(s: SparkSession, dir: String): DataFrame =
    MapReduceJob.runOnDocs(s, Tables.documents(s, dir), RefApps.wcMap, RefApps.wcReduce)
      .orderBy("key")

  def mrInvertedIndex(s: SparkSession, dir: String): DataFrame =
    MapReduceJob.runOnDocs(s, Tables.documents(s, dir), RefApps.indexerMap, RefApps.indexerReduce)
      .orderBy("key")

  /** Distributed grep through the plugin API — the map-only classic
    * (Dean & Ghemawat §2.3) in its keyed form: map emits (matching token,
    * doc) pairs, reduce is the indexer's "count + sorted doc list", i.e.
    * `grep -l` aggregated per matched word. Twin of the declarative
    * [[MrSuite.grepDocs]]. */
  def mrGrep(s: SparkSession, dir: String): DataFrame = {
    val pat = "s[a-z]*a[a-z]+".r
    val mapf: MapReduceJob.MapF = (name, contents) =>
      // same unicode.IsLetter tokenizer as RefApps (wc.go:23 rune parity)
      contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty)
        .filter(w => pat.findFirstIn(w).isDefined).distinct.map(w => (w, name))
    MapReduceJob.runOnDocs(s, Tables.documents(s, dir), mapf, RefApps.indexerReduce)
      .orderBy("key")
  }

  /** Reduce-side join through the plugin API: customers and orders are
    * each mapped to (custkey, value) pairs, and one co-reducer sees both
    * complete value lists per key ([[MapReduceJob.corun]]). Output value
    * is "names|n_orders|year1,year2,..." — names sorted (normally one),
    * order count, distinct order years sorted; either side may be empty
    * (full-outer semantics, exactly what cogroup yields). */
  def mrCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val left = Tables.customer(s, dir)
      .selectExpr("cast(c_custkey as string)", "c_name").as[(String, String)]
    val right = Tables.orders(s, dir)
      .selectExpr("cast(o_custkey as string)", "cast(year(o_orderdate) as string)")
      .as[(String, String)]
    val coreduce: MapReduceJob.CoReduceF = (_, names, years) =>
      s"${names.sorted.mkString(",")}|${years.size}|${years.distinct.sorted.mkString(",")}"
    MapReduceJob.corun(s, left, right, coreduce).toDF("key", "value").orderBy("key")
  }

  /** Multi-source reduce fed BY the V2 connector — the loop between the
    * two signature deliverables closed: the wordcount and per-word
    * document-frequency `"key value"` layouts (both written through the
    * `graftkv` V2 sink) are read back via `format("graftkv")` and
    * co-reduced through the plugin API, exactly how a reference user
    * would chain one MR job's mr-out-R files into the next job's input
    * (`worker.go:125-141` output ↔ `:60-70` input). Output value is
    * "counts|dfs" (each side's sorted full value list — here one value
    * per key per side, but the co-reducer contract is the general one). */
  def mrKvCogroup(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    import graft.sources.TextIO
    val left = s.read.format("graftkv").load(TextIO.kvWordcountLayout(s, dir))
      .as[(String, String)]
    val right = s.read.format("graftkv").load(TextIO.kvDocFreqLayout(s, dir))
      .as[(String, String)]
    val co: MapReduceJob.CoReduceF = (_, cnts, dfs) =>
      s"${cnts.sorted.mkString(",")}|${dfs.sorted.mkString(",")}"
    MapReduceJob.corun(s, left, right, co).toDF("key", "value").orderBy("key")
  }

  /** crash.go/nocrash.go payload through the API: map emits the four fixed
    * keys a–d per document; reduce = sorted concat (order-insensitive
    * input, deterministic output — SURVEY §1 determinism contract). */
  def mrSortedConcat(s: SparkSession, dir: String): DataFrame = {
    val mapf: MapReduceJob.MapF = (name, contents) => Seq(
      ("a", name),
      ("b", name.length.toString),
      ("c", contents.length.toString),
      ("d", "xyzzy"))
    MapReduceJob.runOnDocs(s, Tables.documents(s, dir), mapf, RefApps.sortedConcatReduce)
      .orderBy("key")
  }
}
