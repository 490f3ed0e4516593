package graft.util

import java.util.concurrent.{ConcurrentHashMap, CopyOnWriteArrayList}

import org.apache.spark.sql.SparkSession

/** Shared registry + invalidation hook for the per-(session, corpus)
  * memo caches (dedup pair/signature/cluster tables, graph adjacency,
  * k-means/PQ/BPE models, kv layouts, …). Each cache holds
  * localCheckpoint'ed tables whose storage blocks stay pinned for as
  * long as the cache references them — fine for the one-corpus-per-run
  * harnesses, but a long-lived session touching many corpora would
  * accumulate executor storage without bound. `invalidate` drops every
  * registered cache's entry for a corpus; Spark's ContextCleaner then
  * unpersists the checkpointed RDD blocks once the dropped references
  * are GC'd — the standard reference-driven cleanup path, no explicit
  * unpersist needed (or safe: a concurrent reader may still hold the
  * frame).
  *
  * This is deliberately an explicit hook rather than an LRU bound: the
  * tables are per-corpus INVESTMENTS (the whole point is that repeat
  * queries ride them), so only the owner knows when a corpus is done —
  * e.g. a soak harness finishing one tenant's dataset before loading the
  * next. */
object CorpusMemo {

  private val registered =
    new CopyOnWriteArrayList[ConcurrentHashMap[(SparkSession, String), _]]()

  /** Register a per-(session, corpus) cache; returns it for inline use
    * at the declaration site. */
  def register[V](c: ConcurrentHashMap[(SparkSession, String), V])
      : ConcurrentHashMap[(SparkSession, String), V] = {
    registered.add(c)
    c
  }

  /** Drop every registered cache's entry for this (session, corpus). */
  def invalidate(s: SparkSession, dir: String): Unit =
    registered.forEach { c => c.remove((s, dir)): Unit }

  /** Drop every registered cache's entries for this session (all
    * corpora) — e.g. before retiring a pooled session. */
  def invalidateSession(s: SparkSession): Unit =
    registered.forEach { c => c.keySet.removeIf(_._1 eq s): Unit }

  /** Total live entries across registered caches (diagnostics/tests). */
  def liveEntries: Int = {
    var n = 0
    registered.forEach { c => n += c.size }
    n
  }
}
