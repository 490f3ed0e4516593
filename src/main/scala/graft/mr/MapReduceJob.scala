package graft.mr

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}
import scala.collection.mutable.ArrayBuffer

/** The reference's user-facing computation model
  * (`/root/reference/src/mr/worker.go:15-18`, `src/main/mrworker.go:34-43`):
  *
  * {{{
  *   Map(filename, contents) -> []KeyValue        // 1 input → n pairs
  *   Reduce(key, values)     -> string            // full value list at once
  * }}}
  *
  * re-expressed on Spark. `run` is the library's signature API: a user of
  * the reference can hand the same two functions here and get the same
  * result, with Spark supplying scheduling, shuffle, fault tolerance, and
  * stragglers (reference `coordinator.go` is zero code here — SURVEY §3b).
  *
  * Semantics preserved exactly (SURVEY §1):
  *  - `reducef` receives the COMPLETE value list per key — `groupByKey` +
  *    `mapGroups`, never a commutative fold — because reference reducers
  *    such as indexer.go:36-38 need the whole list.
  *  - Value order within a key is unspecified, as in the reference (Go map
  *    iteration, `worker.go:131`); deterministic reducers must sort, as the
  *    reference apps do (`crash.go:49-51`).
  *  - Memory is bounded per key, not per partition: Spark spills groups;
  *    the reference held the whole partition in RAM (`worker.go:96-123`).
  */
object MapReduceJob {

  type MapF    = (String, String) => IterableOnce[(String, String)]
  type ReduceF = (String, Seq[String]) => String

  /** Run a MapReduce job over (name, contents) records. */
  def run(spark: SparkSession, input: Dataset[(String, String)],
          mapf: MapF, reducef: ReduceF): Dataset[(String, String)] = {
    import spark.implicits._
    input
      .flatMap { case (k, v) => mapf(k, v) }
      .groupByKey(_._1)
      .mapGroups { (key, it) => (key, reducef(key, it.map(_._2).toSeq)) }
  }

  /** DataFrame adapter: documents(doc_id, text) stand in for the
    * reference's (filename, contents) input files (FIXTURES.md §2). */
  def runOnDocs(spark: SparkSession, docs: DataFrame,
                mapf: MapF, reducef: ReduceF): DataFrame = {
    import spark.implicits._
    val input = docs.selectExpr("cast(doc_id as string)", "text").as[(String, String)]
    run(spark, input, mapf, reducef).toDF("key", "value")
  }

  /** Runtime plugin loading — the JVM analog of the reference's
    * `plugin.Open(file); Lookup("Map"); Lookup("Reduce")`
    * (`/root/reference/src/main/mrworker.go:25-43`,
    * `mrsequential.go:93-110`): the job's functions arrive by NAME at run
    * time, not as compile-time lambdas. `className` names a Scala `object`
    * (the `.so` stand-in — any jar on the classpath) exposing members
    * `mapf: MapF` and `reducef: ReduceF`; they are resolved reflectively,
    * exactly as `Lookup` resolves exported symbols. Fails fast with the
    * same three error shapes as the reference (cannot load plugin /
    * cannot find Map / cannot find Reduce). */
  def load(className: String): (MapF, ReduceF) = {
    val cls =
      try Class.forName(if (className.endsWith("$")) className else className + "$")
      catch { case e: ClassNotFoundException =>
        throw new IllegalArgumentException(s"cannot load plugin $className", e) }
    val module = cls.getField("MODULE$").get(null)
    def lookup[T](member: String): T =
      cls.getMethods.find(m => m.getName == member && m.getParameterCount == 0)
        .getOrElse(throw new IllegalArgumentException(
          s"cannot find $member in $className"))
        .invoke(module).asInstanceOf[T]
    (lookup[MapF]("mapf"), lookup[ReduceF]("reducef"))
  }

  /** [[run]] with the (mapf, reducef) pair loaded by name — the full
    * `mrworker <plugin>` contract: `runLoaded(spark, in, "pkg.WcPlugin")`
    * ≙ `go run mrworker.go wc.so`. */
  def runLoaded(spark: SparkSession, input: Dataset[(String, String)],
                className: String): Dataset[(String, String)] = {
    val (mapf, reducef) = load(className)
    run(spark, input, mapf, reducef)
  }

  /** [[run]] with per-task interval recording — the engine-side probe
    * behind the parallelism-overlap spec (≙ the reference's
    * `mtiming.go:19-62` / `rtiming.go`, driven by `test-mr.sh:133-185`,
    * which assert that map tasks and reduce tasks actually run
    * concurrently rather than serially). Each map TASK appends one
    * ("map", taskAttemptId, start, end) event spanning its partition;
    * each reduce GROUP appends a ("reduce", taskAttemptId, start, end)
    * event, so a reduce task's span is the hull of its group events.
    * The map wrapper buffers one partition — probe-only; [[run]] stays
    * the streaming path. */
  def runProbed(spark: SparkSession, input: Dataset[(String, String)],
                mapf: MapF, reducef: ReduceF,
                events: org.apache.spark.util.CollectionAccumulator[(String, Long, Long, Long)])
      : Dataset[(String, String)] = {
    import spark.implicits._
    input
      .mapPartitions { it =>
        val t0 = System.nanoTime()
        val out = it.flatMap { case (k, v) => mapf(k, v) }.toVector
        events.add(("map", org.apache.spark.TaskContext.get().taskAttemptId(),
          t0, System.nanoTime()))
        out.iterator
      }
      .groupByKey(_._1)
      .mapGroups { (key, it) =>
        val t0 = System.nanoTime()
        val r = (key, reducef(key, it.map(_._2).toSeq))
        events.add(("reduce", org.apache.spark.TaskContext.get().taskAttemptId(),
          t0, System.nanoTime()))
        r
      }
  }

  type CoReduceF = (String, Seq[String], Seq[String]) => String

  /** Two-source reduce — the classic MapReduce reduce-side join: both
    * inputs are mapped to (key, value) pairs, the shuffle co-locates each
    * key's COMPLETE value lists from BOTH sources, and one reducer sees
    * them together (Dean & Ghemawat §4.4's "join" usage of reduce; the
    * reference's single-input contract generalized the way real MR jobs
    * did it, via a source tag in the value). On Spark this is the typed
    * `KeyValueGroupedDataset.cogroup` — one shuffle per side on the key,
    * no value-list buffering beyond the group, groups spilled not held. */
  def corun(spark: SparkSession,
            left: Dataset[(String, String)], right: Dataset[(String, String)],
            coreducef: CoReduceF): Dataset[(String, String)] = {
    import spark.implicits._
    left.groupByKey(_._1).cogroup(right.groupByKey(_._1)) { (key, l, r) =>
      Iterator.single((key, coreducef(key, l.map(_._2).toSeq, r.map(_._2).toSeq)))
    }
  }

  /** Untyped variant of the reduce contract for `DataFrame.agg` /
    * SQL registration via `functions.udaf`: buffers the full value list,
    * then applies `reducef`. For fold-style reducers (wc) prefer the
    * built-in aggregates — Catalyst's partial aggregation is strictly
    * better; this exists for API fidelity with arbitrary reducers. */
  def reduceAggregator(key: String, reducef: ReduceF): Aggregator[String, ArrayBuffer[String], String] =
    new Aggregator[String, ArrayBuffer[String], String] {
      def zero: ArrayBuffer[String] = ArrayBuffer.empty
      def reduce(b: ArrayBuffer[String], v: String): ArrayBuffer[String] = { b += v; b }
      def merge(a: ArrayBuffer[String], b: ArrayBuffer[String]): ArrayBuffer[String] = { a ++= b; a }
      def finish(b: ArrayBuffer[String]): String = reducef(key, b.toSeq)
      def bufferEncoder: Encoder[ArrayBuffer[String]] =
        Encoders.kryo[ArrayBuffer[String]]
      def outputEncoder: Encoder[String] = Encoders.STRING
    }
}

/** The reference's application plugins (`src/mrapps/&#42;.go`) as (mapf,
  * reducef) pairs runnable on [[MapReduceJob.run]] — used by the
  * `q_mr_*` queries and the property tests to prove API fidelity. */
object RefApps {
  /** wc.go:21-44 — split on any non-letter RUNE (`unicode.IsLetter`:
    * digits split words, letters of ANY script are kept — `\p{L}`, not
    * `[a-zA-Z]`), emit (word,"1"); reduce = count. The fixture corpus is
    * ASCII so the two classes coincide there, but the API-fidelity claim
    * is "hand wc.go's functions to [[MapReduceJob.run]]" — rune-level
    * parity is part of it (round 11; non-ASCII property-tested in
    * `MapReduceJobSpec`). */
  val wcMap: MapReduceJob.MapF = (_, contents) =>
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).map(w => (w, "1"))
  val wcReduce: MapReduceJob.ReduceF = (_, values) => values.size.toString

  /** indexer.go:20-39 — per-doc distinct words (same `unicode.IsLetter`
    * tokenizer as wc.go); reduce = "N doc1,doc2,..."
    * with docs sorted lexicographically. */
  val indexerMap: MapReduceJob.MapF = (name, contents) =>
    contents.split("[^\\p{L}]+").iterator.filter(_.nonEmpty).distinct.map(w => (w, name))
  val indexerReduce: MapReduceJob.ReduceF = (_, values) => {
    val docs = values.distinct.sorted
    s"${docs.size} ${docs.mkString(",")}"
  }

  /** crash.go:34-55 payload — reduce sorts the full value list, joins on " ". */
  val sortedConcatReduce: MapReduceJob.ReduceF = (_, values) => values.sorted.mkString(" ")
}

/** Wordcount as a loadable plugin — the `wc.so` stand-in resolved by name
  * through [[MapReduceJob.load]] (`"graft.mr.WordCountPlugin"`), proving
  * the by-name contract end-to-end, not just the lambda API. */
object WordCountPlugin {
  val mapf: MapReduceJob.MapF = RefApps.wcMap
  val reducef: MapReduceJob.ReduceF = RefApps.wcReduce
}
