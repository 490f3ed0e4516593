package graft.util

/** Minimal primitive open-addressing Long→Long hash map for
  * per-partition imperative state (the components contraction's
  * union-find parent table). `java.util.HashMap[Long, Long]` costs
  * ~100 B/entry (entry node + two boxed Longs + table slot); this is
  * three flat arrays at ≤ 70 % load — ~24 B/entry — which is the
  * difference between a contraction task fitting its heap share and
  * the 100× probe's OOM (round 16; Spark's own `OpenHashMap` is
  * `private[spark]`, hence this 60-line twin). Linear probing over a
  * power-of-two table, fibonacci-hashing the key; key 0 is a valid key
  * (vertex ids start at 0), tracked by the `used` array rather than a
  * sentinel. Single-threaded by design, like the task state it backs. */
final class LongLongMap(initialCapacity: Int = 1 << 10) {
  private[this] var cap =
    math.max(16, Integer.highestOneBit(math.max(1, initialCapacity - 1)) << 1)
  private[this] var keys = new Array[Long](cap)
  private[this] var vals = new Array[Long](cap)
  private[this] var used = new Array[Boolean](cap)
  private[this] var n = 0

  private def slot(k: Long, ks: Array[Long], us: Array[Boolean]): Int = {
    val mask = ks.length - 1
    var i = java.lang.Long.hashCode(k * -7046029254386353131L) & mask
    while (us(i) && ks(i) != k) i = (i + 1) & mask
    i
  }

  def size: Int = n

  def contains(k: Long): Boolean = used(slot(k, keys, used))

  def getOrElse(k: Long, default: Long): Long = {
    val i = slot(k, keys, used)
    if (used(i)) vals(i) else default
  }

  /** Insert or overwrite. Growth happens only when a NEW key arrives
    * (the check sits inside the unused-slot branch — round-16 review:
    * a pre-insert check also fired on overwrites, allocating 2× arrays
    * during the streamed-output phase at exactly the sized-to-budget
    * peak), so updates to existing keys (the union-find's path
    * compression) never invalidate an in-progress [[keysSnapshot]]
    * iteration. Threshold math in Long: cap × 7 overflows Int past
    * 2²⁹ entries. */
  def put(k: Long, v: Long): Unit = {
    var i = slot(k, keys, used)
    if (!used(i)) {
      if ((n + 1L) * 10L >= cap.toLong * 7L) { grow(); i = slot(k, keys, used) }
      used(i) = true; keys(i) = k; n += 1
    }
    vals(i) = v
  }

  private def grow(): Unit = {
    require(cap < (1 << 30), s"LongLongMap capacity overflow at $n entries")
    val nk = new Array[Long](cap * 2)
    val nv = new Array[Long](cap * 2)
    val nu = new Array[Boolean](cap * 2)
    var i = 0
    while (i < cap) {
      if (used(i)) {
        val j = slot(keys(i), nk, nu)
        nu(j) = true; nk(j) = keys(i); nv(j) = vals(i)
      }
      i += 1
    }
    cap *= 2; keys = nk; vals = nv; used = nu
  }

  /** Iterator over the keys as stored at call time (pins the current
    * arrays: value updates to existing keys remain visible through
    * getOrElse, but a concurrent NEW-key grow would not be — callers
    * stream output after the insert phase, which is exactly the
    * union-find shape). */
  def keysSnapshot: Iterator[Long] = {
    val ks = keys; val us = used
    Iterator.range(0, ks.length).collect { case i if us(i) => ks(i) }
  }
}
