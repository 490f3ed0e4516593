package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.mr.{MapReduceJob, RefApps}

/** Property tests for the MapReduceJob plugin contract (SURVEY §5):
  * the distributed result must equal the sequential reference executor
  * (port of `/root/reference/src/main/mrsequential.go:38-84`) after output
  * sort, for randomized inputs (fixed seed) and any partition count. */
/** Executor-side crash evidence for the failure-injection tests: local
  * mode shares the JVM, so a static counter sees the throw happen. */
object CrashProbe {
  val fired = new java.util.concurrent.atomic.AtomicInteger(0)
}

class MapReduceJobSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Sequential oracle: mapf over all (name, contents), sort by key,
    * run-length group, reducef per key — mrsequential.go semantics. */
  private def sequential(files: Seq[(String, String)],
                         mapf: MapReduceJob.MapF,
                         reducef: MapReduceJob.ReduceF): Map[String, String] = {
    val kva = files.flatMap { case (n, c) => mapf(n, c).iterator.toSeq }.sortBy(_._1)
    kva.groupBy(_._1).map { case (k, vs) => k -> reducef(k, vs.map(_._2)) }
  }

  // seed overridable per soak trial (graft.tools.Soak ≙ test-mr-many.sh:
  // N re-runs with distinct seeds to flush nondeterministic flakes)
  private val rnd = new Random(
    sys.props.get("graft.soak.seed").map(_.toLong).getOrElse(42L))
  private val vocab = Seq("the", "a", "spark", "map", "reduce", "Go", "x7y", "Key")

  private def genFiles(n: Int): Seq[(String, String)] =
    (0 until n).map { i =>
      val words = Seq.fill(rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size)))
      (s"file$i", words.mkString(" "))
    }

  private def runBoth(files: Seq[(String, String)], parts: Int,
                      mapf: MapReduceJob.MapF, reducef: MapReduceJob.ReduceF): Unit = {
    val input = files.toDS().repartition(parts)
    val got = MapReduceJob.run(spark, input, mapf, reducef).collect().toMap
    assert(got === sequential(files, mapf, reducef))
  }

  test("wc ≡ sequential executor on randomized inputs") {
    (1 to 8).foreach { _ => runBoth(genFiles(6), 3, RefApps.wcMap, RefApps.wcReduce) }
  }

  test("indexer ≡ sequential executor on randomized inputs") {
    (1 to 8).foreach { _ =>
      runBoth(genFiles(5), 2, RefApps.indexerMap, RefApps.indexerReduce)
    }
  }

  test("wc/indexer ≡ sequential executor on non-ASCII inputs (unicode.IsLetter parity)") {
    // wc.go:23 splits on any non-LETTER rune: digits split words, letters
    // of ANY script are kept. The fixture corpus is ASCII so the declared
    // q_mr_* hashes can't see this; these cases pin the rune-level
    // semantics the plugin-API fidelity claim rests on (round 11).
    val uniVocab = Seq("naïve", "café", "東京", "Größe", "схема", "x7y", "π", "reduce")
    def genU(n: Int): Seq[(String, String)] = (0 until n).map { i =>
      val words = Seq.fill(10 + rnd.nextInt(20))(uniVocab(rnd.nextInt(uniVocab.size)))
      (s"u$i", words.mkString(" "))
    }
    (1 to 4).foreach { _ =>
      runBoth(genU(4), 3, RefApps.wcMap, RefApps.wcReduce)
      runBoth(genU(3), 2, RefApps.indexerMap, RefApps.indexerReduce)
    }
    // rune-class spot checks against the Go semantics themselves (the
    // runBoth equality above uses the same mapf on both sides, so it can
    // never catch a tokenizer-class divergence): digits SPLIT (x7y → x,y;
    // 東京2024年 → 東京,年), any-script letters KEEP (naïve is one token)
    assert(RefApps.wcMap("f", "naïve x7y 東京2024年 café-au-lait").map(_._1).toSeq ===
      Seq("naïve", "x", "y", "東京", "年", "café", "au", "lait"))
    assert(RefApps.indexerMap("d", "π π schéma_2 π").map(_._1).toSeq ===
      Seq("π", "schéma"))
  }

  test("partition-count invariance (1/4/10 partitions)") {
    (1 to 3).foreach { _ =>
      val files = genFiles(5)
      val results = Seq(1, 4, 10).map { p =>
        MapReduceJob.run(spark, files.toDS().repartition(p),
          RefApps.wcMap, RefApps.wcReduce).collect().sortBy(_._1).toSeq
      }
      assert(results.distinct.size === 1)
    }
  }

  test("reduceAggregator applies reducef over the complete buffered list") {
    import org.apache.spark.sql.functions.typedlit
    val agg = MapReduceJob.reduceAggregator("k", RefApps.sortedConcatReduce)
    val got = Seq("b", "a", "c").toDS().select(agg.toColumn).head()
    assert(got === "a b c")
  }

  test("map-task crash on first attempt: retried, result identical (exactly-once output)") {
    // the reference proves crash recovery by killing workers mid-job and
    // diffing against the clean output (test-mr.sh:270-317, crash.go,
    // jobcount.go's no-duplicate probe); the Spark-native equivalent is a
    // task that throws on its first attempt — the scheduler retries it
    // (SURVEY §3b: §2a rows 9-10 are platform-delegated) and the shuffle
    // dedups per stage attempt, so the output must match the clean run
    val files = genFiles(8)
    CrashProbe.fired.set(0)
    val crashingMap: MapReduceJob.MapF = (n, c) => {
      val tc = org.apache.spark.TaskContext.get()
      if (tc.attemptNumber() == 0 && CrashProbe.fired.compareAndSet(0, 1))
        throw new RuntimeException("injected map crash (first attempt)")
      RefApps.wcMap(n, c)
    }
    val got = MapReduceJob.run(spark, files.toDS().repartition(4),
      crashingMap, RefApps.wcReduce).collect().toMap
    assert(CrashProbe.fired.get() >= 1, "injection never fired — test vacuous")
    assert(got === sequential(files, RefApps.wcMap, RefApps.wcReduce))
  }

  test("reduce-task crash on first attempt: retried, result identical") {
    // same probe on the reduce side (crash.go crashes reducers too):
    // reducef throws once inside mapGroups, the stage-2 task retries, and
    // every key's full value list is re-delivered intact
    val files = genFiles(8)
    CrashProbe.fired.set(0)
    val crashingReduce: MapReduceJob.ReduceF = (k, vs) => {
      val tc = org.apache.spark.TaskContext.get()
      if (tc.attemptNumber() == 0 && CrashProbe.fired.compareAndSet(0, 1))
        throw new RuntimeException("injected reduce crash (first attempt)")
      RefApps.wcReduce(k, vs)
    }
    val got = MapReduceJob.run(spark, files.toDS().repartition(4),
      RefApps.wcMap, crashingReduce).collect().toMap
    assert(CrashProbe.fired.get() >= 1, "injection never fired — test vacuous")
    assert(got === sequential(files, RefApps.wcMap, RefApps.wcReduce))
  }

  test("corun co-reducer sees both complete value lists, incl. one-sided keys") {
    val left = Seq(("k1", "L1"), ("k1", "L2"), ("k2", "Lx"), ("k4", "only-left"))
    val right = Seq(("k1", "R1"), ("k2", "R2"), ("k2", "R3"), ("k3", "only-right"))
    val co: MapReduceJob.CoReduceF = (_, l, r) =>
      s"${l.sorted.mkString(",")}/${r.sorted.mkString(",")}"
    val got = MapReduceJob.corun(spark,
      left.toDS().repartition(3), right.toDS().repartition(2), co).collect().toMap
    assert(got === Map(
      "k1" -> "L1,L2/R1", "k2" -> "Lx/R2,R3",
      "k3" -> "/only-right", "k4" -> "only-left/"))
  }

  test("by-name plugin loading ≡ compile-time lambdas (mrworker.go contract)") {
    // mrworker.go:25-43 / mrsequential.go:93-110: the (Map, Reduce) pair
    // arrives as a NAME resolved at run time, not as code the driver was
    // compiled against — same wordcount, loaded via "graft.mr.WordCountPlugin"
    val files = genFiles(6)
    val viaPlugin = MapReduceJob.runLoaded(spark, files.toDS().repartition(3),
      "graft.mr.WordCountPlugin").collect().toMap
    assert(viaPlugin === sequential(files, RefApps.wcMap, RefApps.wcReduce))
    // the reference's three failure shapes: bad plugin file / missing symbol
    val e1 = intercept[IllegalArgumentException](MapReduceJob.load("no.such.Plugin"))
    assert(e1.getMessage.contains("cannot load plugin"))
    val e2 = intercept[IllegalArgumentException](MapReduceJob.load("graft.mr.RefApps"))
    assert(e2.getMessage.contains("cannot find mapf"))
  }

  test("map tasks overlap and reduce tasks overlap (mtiming/rtiming analog)") {
    // ≙ test-mr.sh:133-185 with mtiming.go/rtiming.go: the reference's
    // timing plugins assert the workers actually run in PARALLEL, not
    // serially. Here each task records its (start, end) span through an
    // accumulator; with 4 local cores, 8 slow map partitions and 4 slow
    // reduce partitions must produce ≥2 concurrently-running tasks in
    // each phase.
    val events = spark.sparkContext
      .collectionAccumulator[(String, Long, Long, Long)]("mrTaskSpans")
    val slowMap: MapReduceJob.MapF = (n, c) => {
      Thread.sleep(150); RefApps.wcMap(n, c)
    }
    val slowReduce: MapReduceJob.ReduceF = (k, vs) => {
      Thread.sleep(30); RefApps.wcReduce(k, vs)
    }
    // 24 files over 8 partitions; a 64-word vocabulary (two-letter words —
    // wc.go's splitter keeps letters only) so the keyed shuffle populates
    // all 4 reduce partitions, not just one
    val wideVocab = for (a <- 'a' to 'h'; b <- 'a' to 'h') yield s"$a$b"
    val files = (0 until 24).map { i =>
      (s"file$i", Seq.fill(20)(wideVocab(rnd.nextInt(wideVocab.size))).mkString(" "))
    }
    // the reference runs with a FIXED nReduce (mrcoordinator.go); AQE's
    // small-shuffle coalescing would legitimately fold this toy shuffle
    // into one partition, which is exactly what the probe must not measure
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val oldCoalesce = spark.conf.get(coalesceKey, "true")
    spark.conf.set(coalesceKey, "false")
    val got =
      try MapReduceJob.runProbed(spark, files.toDS().repartition(8),
        slowMap, slowReduce, events).collect().toMap
      finally spark.conf.set(coalesceKey, oldCoalesce)
    assert(got === sequential(files, RefApps.wcMap, RefApps.wcReduce))
    import scala.jdk.CollectionConverters._
    // per-task span = hull of that task's events (reduce records per group)
    def spans(phase: String): Seq[(Long, Long)] =
      events.value.asScala.toSeq.filter(_._1 == phase)
        .groupBy(_._2).values.map(es => (es.map(_._3).min, es.map(_._4).max)).toSeq
    def maxConcurrent(ss: Seq[(Long, Long)]): Int =
      ss.map { case (s0, e0) =>
        ss.count { case (s1, e1) => s1 < e0 && s0 < e1 }
      }.max
    val (m, r) = (spans("map"), spans("reduce"))
    assert(m.size >= 2 && maxConcurrent(m) >= 2,
      s"map tasks did not overlap: $m")
    assert(r.size >= 2 && maxConcurrent(r) >= 2,
      s"reduce tasks did not overlap: $r")
  }

  test("reducef receives the complete value list (not a fold)") {
    val files = Seq(("f1", "a b a"), ("f2", "a c"))
    val reducef: MapReduceJob.ReduceF = (_, values) => values.sorted.mkString("|")
    val got = MapReduceJob.run(spark,
      files.toDS().repartition(2),
      (n, c) => c.split(" ").toSeq.map(w => (w, n)), reducef).collect().toMap
    assert(got("a") === "f1|f1|f2")
    assert(got("b") === "f1")
    assert(got("c") === "f2")
  }
}
