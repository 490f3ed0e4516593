package graft.sources.kv

import java.util

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, StringStartsWith}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 connector for the reference's `"key value"` text format
  * (`/root/reference/src/mr/worker.go:125-141` sink, `:112-115` read-back):
  * line-oriented partition files where each row is `key<space>value` and
  * lines that don't split into exactly two fields are dropped.
  *
  * Unlike the DataFrame-composition reader ([[graft.sources.TextIO.readKv]],
  * kept for parity tests), this is the engine-integration surface: a real
  * `TableProvider` registered as `graftkv`, with
  *
  *  - '''column pruning''' (`SupportsPushDownRequiredColumns`): a
  *    key-only projection never materializes value strings (visible as
  *    the scan's `ReadSchema`), and
  *  - '''filter pushdown''' (`SupportsPushDownFilters`): comparison and
  *    prefix predicates on `key` are evaluated inside the partition
  *    reader against the raw line, before any row object is built.
  *    Pushed filters are ALSO returned as post-scan filters (the
  *    conservative V2 contract), so Spark's own evaluation remains a
  *    correctness backstop and the pushdown is purely an I/O saving, and
  *  - '''limit pushdown''' (`SupportsPushDownLimit`, round 12): a
  *    `LIMIT k` directly over the scan stops each split's byte stream
  *    after k emitted rows (partial push — Spark keeps the global
  *    Limit; the per-split cut is the I/O saving).
  *
  * Input partitions are BYTE-RANGE splits of each file (capped at the
  * session's `spark.sql.files.maxPartitionBytes`, overridable with the
  * `splitSize` read option), realigned to line boundaries by the
  * standard text-split contract: a reader whose range starts mid-file
  * discards everything up to and including the first newline at or after
  * its start (the previous range finishes that line), and every reader
  * runs past its end to complete the last line it started. The reference
  * instead queues one whole file per task (`coordinator.go:263-266`) —
  * which makes one 10 GB mr-out file one task on one core forever; byte
  * ranges are the scale-correct re-expression, and a `splitSize` ≥ the
  * largest file reproduces the reference's file-per-task behavior
  * exactly.
  *
  * The write side ([[KvWrite]]) makes the connector a full source+sink:
  * per-task staged `"key value"` files renamed into place on task
  * commit, with `mode("overwrite")` arriving as a truncate.
  */
class KvDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graftkv"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KvDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new KvTable(properties.get("path"))
}

object KvDataSource {
  // nullable so any (string, string) frame can write through the sink;
  // the reader itself never produces nulls (malformed lines are dropped)
  val Schema: StructType = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("value", StringType, nullable = true)))
}

private[kv] class KvTable(path: String) extends Table
    with SupportsRead with SupportsWrite {
  require(path != null && path.nonEmpty, "graftkv requires a path")
  override def name(): String = s"graftkv:$path"
  override def schema(): StructType = KvDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new KvScanBuilder(path, options)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new KvWriteBuilder(path, info.schema(), info.queryId())
}

private[kv] class KvScanBuilder(path: String, options: CaseInsensitiveStringMap)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters
    with SupportsPushDownLimit {
  private var required: StructType = KvDataSource.Schema
  private var pushed: Array[Filter] = Array.empty
  private var limit: Int = -1

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(KvFilters.supported)
    filters // all filters re-evaluated post-scan: pushdown is an I/O saving
  }

  override def pushedFilters(): Array[Filter] = pushed

  /** Limit pushdown (round 12, VERDICT #7): each partition reader stops
    * after emitting `limit` rows instead of draining its whole byte
    * range — a `LIMIT k` over a TB-scale kv dir then reads O(k) lines
    * per split, not the dir. Returns false (a PARTIAL push): with
    * multiple splits the source can only bound each partition at k, so
    * Spark keeps its own global Limit on top — the engine-side cut is
    * purely an I/O saving, the same conservative contract as the filter
    * pushdown above. Spark only offers the limit when it sits directly
    * on the scan (no residual-filtered LIMIT ever reaches here). */
  override def pushLimit(l: Int): Boolean = { limit = l; false }

  override def build(): Scan = {
    // 0 or negative disables splitting (one partition per file)
    val splitSize = options.getLong("splitsize",
      SparkSession.active.sessionState.conf.filesMaxPartitionBytes)
    new KvScan(path, required, pushed,
      if (splitSize > 0) splitSize else Long.MaxValue, limit)
  }
}

/** Key-filter evaluation shared by the planner (supported?) and the
  * partition readers (evaluate on the raw key, pre-row-build). String
  * order is UTF8String binary order — identical to the engine's own
  * string comparisons. */
private[kv] object KvFilters {
  def supported(f: Filter): Boolean = f match {
    case EqualTo("key", _: String)            => true
    case GreaterThan("key", _: String)        => true
    case GreaterThanOrEqual("key", _: String) => true
    case LessThan("key", _: String)           => true
    case LessThanOrEqual("key", _: String)    => true
    case StringStartsWith("key", _)           => true
    case _                                    => false
  }

  def accept(key: UTF8String, filters: Array[Filter]): Boolean =
    filters.forall {
      case EqualTo("key", v: String)            => key == UTF8String.fromString(v)
      case GreaterThan("key", v: String)        => key.compareTo(UTF8String.fromString(v)) > 0
      case GreaterThanOrEqual("key", v: String) => key.compareTo(UTF8String.fromString(v)) >= 0
      case LessThan("key", v: String)           => key.compareTo(UTF8String.fromString(v)) < 0
      case LessThanOrEqual("key", v: String)    => key.compareTo(UTF8String.fromString(v)) <= 0
      case StringStartsWith("key", v)           => key.startsWith(UTF8String.fromString(v))
      case _                                    => true
    }
}

private[kv] class KvScan(path: String, required: StructType,
                         pushed: Array[Filter], splitSize: Long,
                         limit: Int = -1)
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required

  override def description(): String =
    s"graftkv path=$path, PushedFilters: [${pushed.mkString(", ")}], " +
    s"PushedLimit: ${if (limit >= 0) limit.toString else "none"}, " +
    s"ReadSchema: ${required.catalogString}"

  override def toBatch: Batch = this

  // one driver-side listing serves both the statistics estimate and the
  // split planning
  private lazy val fileStats: Seq[(String, Long)] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new HPath(path)
    val fs = FileSystem.get(p.toUri, conf)
    val stats =
      if (fs.getFileStatus(p).isDirectory) fs.listStatus(p).toSeq
      else Seq(fs.getFileStatus(p))
    stats.filter(s => s.isFile && s.getLen > 0)
      // commit markers and hidden files, per the file-source convention
      .filterNot { s =>
        val n = s.getPath.getName
        n.startsWith("_") || n.startsWith(".")
      }
      .sortBy(_.getPath.toString)
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Size statistics from the file listing (round 12): without them a
    * DSv2 relation reports the session's `defaultSizeInBytes` (Long.Max
    * by default), so a 2 KB kv dimension table could NEVER be chosen
    * for an auto-broadcast join — the planner treated the smallest
    * input in the system as the largest. Row count stays unknown (lines
    * aren't counted without a scan); byte size is what the broadcast
    * threshold compares against. */
  override def estimateStatistics(): Statistics =
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(fileStats.map(_._2).sum)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }

  override def planInputPartitions(): Array[InputPartition] = {
    fileStats
      .flatMap { case (f, len) =>
        (0L until len by splitSize).map(off =>
          KvInputPartition(f, off, math.min(splitSize, len - off)): InputPartition)
      }
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // ship the session's Hadoop conf to the (potentially remote) readers
    // as plain key-value pairs — a reader-side `new Configuration()`
    // would drop session filesystem settings (credentials, default FS)
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val props = {
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    new KvReaderFactory(required, pushed, props, limit)
  }
}

private[kv] case class KvInputPartition(file: String, start: Long,
                                        length: Long) extends InputPartition

// ----------------------------------------------------------------- write

private[kv] class KvWriteBuilder(path: String, schema: StructType,
                                 queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new KvWrite(path, schema, queryId, doTruncate)
}

/** Batch write of `"key value"` lines with a two-level commit protocol:
  *
  *  - '''task level''': every task writes a HIDDEN
  *    `.staged-<writeId>-part-…-<taskId>` file (the read side skips
  *    hidden files by convention) and reports it in its commit message —
  *    a speculated, retried, or crashed task can never leave a
  *    half-written partition file visible.
  *  - '''job level''' (`BatchWrite.commit`): only after EVERY task has
  *    committed are the staged files renamed to their visible
  *    `part-…` names. `mode("overwrite")` arrives as a truncate and the
  *    old visible files are deleted HERE, not before the tasks run — a
  *    job that fails partway leaves the previous layout fully intact and
  *    nothing new visible. `abort` (and the post-publish sweep in
  *    `commit`) deletes this job's leftover staging; truncate also sweeps
  *    stale `.staged-*` files orphaned by prior crashed jobs, since they
  *    are connector-owned.
  *
  * The reference writes its mr-out-R files with a bare per-task create
  * (`worker.go:126`) and relies on the coordinator's exactly-once
  * accounting instead; under Spark's scheduler (retries + speculation,
  * SURVEY §3b) staged task output + driver-side publish is the correct
  * re-expression of that guarantee — the same shape as Spark's own
  * `FileCommitProtocol`.
  *
  * Format guardrails: the `"key value"` line format cannot represent
  * nulls, embedded spaces, or newlines (the reader's exactly-two-fields
  * rule, `worker.go:112-115`, would silently drop or mis-split such
  * rows), so the writer rejects them with a clear error instead of
  * corrupting the layout. */
private[kv] class KvWrite(path: String, schema: StructType, queryId: String,
                          doTruncate: Boolean)
    extends Write with BatchWrite {
  require(schema.fieldNames.toSeq == Seq("key", "value"),
    s"graftkv writes (key, value) rows, got ${schema.catalogString}")

  // queryId is Spark's per-write UUID — filename-safe, unique per job
  private val writeId = queryId

  override def toBatch: BatchWrite = this

  private def dirFs(): (FileSystem, HPath) = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new HPath(path)
    (FileSystem.get(p.toUri, conf), p)
  }

  private def isVisibleData(name: String): Boolean =
    !(name.startsWith("_") || name.startsWith("."))

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val p = new HPath(path)
    FileSystem.get(p.toUri, conf).mkdirs(p)
    val props = {
      val it = conf.iterator()
      val b = Array.newBuilder[(String, String)]
      while (it.hasNext) { val e = it.next(); b += ((e.getKey, e.getValue)) }
      b.result()
    }
    new KvWriterFactory(path, writeId, props)
  }

  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, p) = dirFs()
    if (doTruncate) {
      // every task has committed its staging — NOW the old layout can go;
      // stale .staged-* from prior crashed jobs are connector-owned trash
      fs.listStatus(p).filter(_.isFile)
        .filter { s =>
          val n = s.getPath.getName
          isVisibleData(n) ||
            (n.startsWith(".staged-") && !n.startsWith(s".staged-$writeId-"))
        }
        .foreach(s => fs.delete(s.getPath, false))
    }
    messages.foreach { case KvCommit(staged, dest) =>
      val from = new HPath(staged)
      val to = new HPath(p, dest)
      if (!fs.rename(from, to))
        throw new java.io.IOException(s"graftkv: publish $from -> $to failed")
    }
    sweepStaging(fs, p)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val (fs, p) = dirFs()
    if (fs.exists(p)) sweepStaging(fs, p)
  }

  /** Remove any remaining `.staged-<thisWriteId>-*` files (crashed or
    * speculated attempts whose task-level abort never ran). */
  private def sweepStaging(fs: FileSystem, p: HPath): Unit =
    fs.listStatus(p)
      .filter(s => s.isFile &&
        s.getPath.getName.startsWith(s".staged-$writeId-"))
      .foreach(s => fs.delete(s.getPath, false))
}

private[kv] case class KvCommit(staged: String, dest: String)
    extends WriterCommitMessage

private[kv] class KvWriterFactory(path: String, writeId: String,
                                  hadoopProps: Array[(String, String)])
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new KvDataWriter(path, writeId, partitionId, taskId, hadoopProps)
}

private[kv] class KvDataWriter(path: String, writeId: String,
                               partitionId: Int, taskId: Long,
                               hadoopProps: Array[(String, String)])
    extends DataWriter[InternalRow] {
  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val destName = f"part-$partitionId%05d-$taskId"
  private val staged = new HPath(path, s".staged-$writeId-$destName")
  private val fs = FileSystem.get(staged.toUri, conf)
  private val out = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
    fs.create(staged, true), java.nio.charset.StandardCharsets.UTF_8))

  private def checkField(which: String, v: String): String = {
    if (v.indexOf(' ') >= 0 || v.indexOf('\n') >= 0 || v.indexOf('\r') >= 0)
      throw new IllegalArgumentException(
        s"graftkv: $which contains a space or newline, which the " +
          "\"key value\" line format cannot represent " +
          s"(reader drops/mis-splits such lines): ${v.take(80)}")
    v
  }

  override def write(row: InternalRow): Unit = {
    if (row.isNullAt(0) || row.isNullAt(1))
      throw new IllegalArgumentException(
        "graftkv: null key or value — the \"key value\" line format has " +
          "no null representation; filter nulls before writing")
    out.write(checkField("key", row.getUTF8String(0).toString))
    out.write(' ')
    out.write(checkField("value", row.getUTF8String(1).toString))
    out.write('\n')
  }

  override def commit(): WriterCommitMessage = {
    out.close()
    KvCommit(staged.toString, destName)
  }

  override def abort(): Unit = { out.close(); fs.delete(staged, false); () }
  override def close(): Unit = ()
}

private[kv] class KvReaderFactory(required: StructType, pushed: Array[Filter],
                                  hadoopProps: Array[(String, String)],
                                  limit: Int = -1)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[KvInputPartition]
    new KvPartitionReader(p.file, p.start, p.length, required, pushed,
      hadoopProps, limit)
  }
}

/** Streams one byte-range split line by line: malformed lines (not
  * exactly two space-separated fields — `worker.go:112-115`) are dropped,
  * pushed key predicates are applied before row construction, and only
  * the pruned columns are materialized.
  *
  * Line ownership follows the standard text-split contract: a line is
  * owned by the range containing the byte BEFORE its first byte (so a
  * reader starting mid-file seeks to `start` and discards through the
  * first newline — its predecessor read past its own end to finish that
  * line), and a line starting exactly at `start + length` still belongs
  * to THIS range. Every line lands in exactly one reader with no
  * coordination, which is what lets one 10 GB file fan out across a
  * cluster instead of pinning one core. */
private[kv] class KvPartitionReader(file: String, start: Long, length: Long,
                                    required: StructType,
                                    pushed: Array[Filter],
                                    hadoopProps: Array[(String, String)],
                                    limit: Int = -1)
    extends PartitionReader[InternalRow] {
  private val conf = {
    val c = new org.apache.hadoop.conf.Configuration(false)
    hadoopProps.foreach { case (k, v) => c.set(k, v) }
    c
  }
  private val hPath = new HPath(file)
  private val end = start + length
  private val in = FileSystem.get(hPath.toUri, conf).open(hPath)
  private val lines = {
    if (start > 0) in.seek(start)
    new org.apache.hadoop.util.LineReader(in)
  }
  private val text = new org.apache.hadoop.io.Text()
  // byte position of the next unread line's first byte
  private var pos = start
  if (start > 0) pos += lines.readLine(text)
  private var row: InternalRow = _
  private var emitted = 0

  override def next(): Boolean = {
    // pushed-limit early stop: a LIMIT k plan stops this split's byte
    // stream after k emitted rows instead of draining the range
    if (limit >= 0 && emitted >= limit) return false
    while (pos <= end) {
      val n = lines.readLine(text)
      if (n == 0) return false // EOF
      pos += n
      // Text is raw UTF-8 bytes sans terminator; decode once per line
      val line = text.toString
      val sep = line.indexOf(' ')
      // exactly two fields (empty fields allowed) — byte-identical to
      // TextIO.readKv's split-size-2 rule and worker.go:112-115
      if (sep >= 0 && line.indexOf(' ', sep + 1) < 0) {
        val key = UTF8String.fromString(line.substring(0, sep))
        if (KvFilters.accept(key, pushed)) {
          val vals = required.fieldNames.map {
            case "key"   => key
            case "value" => UTF8String.fromString(line.substring(sep + 1))
          }
          row = InternalRow.fromSeq(vals.toIndexedSeq)
          emitted += 1
          return true
        }
      }
    }
    false
  }

  override def get(): InternalRow = row
  override def close(): Unit = lines.close()
}
