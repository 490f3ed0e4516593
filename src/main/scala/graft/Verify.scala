package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    // optional extra args: run only the named queries (dev subset runs;
    // the driver always passes exactly two args → full run)
    val only = args.drop(2).toSet
    def selected(name: String): Boolean = only.isEmpty || only(name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Declared hashes are pinned to every knob's DEFAULT (the dfCap
    // discipline): a session inherited with e.g. spark.graft.zonemap.box
    // or spark.graft.ngram.dfCap still set would make a sound-but-
    // differently-parameterized run fail the oracle compare spuriously
    // (ADVICE r14). getOrCreate() can hand back a pre-existing session,
    // so clear every graft knob before hashing anything — EXCEPT the
    // operational confs that shape no result (round 15, ADVICE r14):
    // blanket-unsetting spark.graft.checkpoint.* made a cluster-deployed
    // Verify silently fall back to localCheckpoint, which is not
    // fault-tolerant under executor loss. The allowlist is explicit and
    // additive-by-review: a NEW knob defaults to cleared, which is the
    // safe side for hashing (an operational knob left cleared costs a
    // deployment property, never a wrong hash; a result-shaping knob
    // left SET would corrupt the compare).
    val operational = Set(
      "spark.graft.checkpoint.reliable",
      "spark.graft.checkpoint.dir")
    spark.conf.getAll.keys
      .filter(k => k.startsWith("spark.graft.") && !operational(k))
      .foreach(spark.conf.unset)
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries.foreach { case (name, fn) =>
      if (selected(name)) {
        // drop any stale dump first: if the query fails before writing, a
        // previous run's parquet must not satisfy the compare for it
        val dumpDir = new java.io.File(s"$outDir/$name")
        if (dumpDir.exists()) {
          import scala.jdk.CollectionConverters._
          Files.walk(dumpDir.toPath).iterator().asScala.toSeq
            .sortBy(-_.getNameCount).foreach(p => Files.deleteIfExists(p))
        }
        try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        catch { case e: Throwable =>
          System.err.println(s"[verify] $name failed: ${e.getMessage}")
        }
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // full runs write EVERY oracle entry (a query that failed to dump then
    // fails the compare loudly instead of vanishing); subset runs ALWAYS
    // keep their selected queries' entries (so a selected query that fails
    // before creating its dir still fails the compare loudly) plus any
    // query whose parquet already exists in outDir — so a subset run into
    // a previously-full outDir keeps the other queries' entries and a
    // later compare still checks them instead of silently skipping
    val json = SparkEntry.oracleSql
      .filter { case (k, _) =>
        only.isEmpty || only.contains(k) ||
          new java.io.File(s"$outDir/$k").exists() }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
