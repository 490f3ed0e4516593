package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.LongLongMap

/** Differential test of the primitive open-addressing map against
  * java.util.HashMap over a deterministic mixed workload — growth,
  * overwrites, collisions, key 0, negative keys — plus the snapshot
  * contract the union-find contraction relies on. */
class LongLongMapSpec extends AnyFunSuite {

  test("put/get/contains agree with java.util.HashMap across growth, overwrites, zero and negative keys") {
    val m = new LongLongMap(4)
    val ref = new java.util.HashMap[Long, Long]()
    // deterministic key stream with collisions-by-construction: a small
    // multiplicative generator re-visiting keys (overwrites) and mixing
    // signs; includes 0 and Long extremes
    var k = 0L
    for (i <- 0 until 200000) {
      k = k * 6364136223846793005L + 1442695040888963407L
      val key = (i % 7) match {
        case 0 => k % 1000          // dense small keys incl. negatives
        case 1 => 0L
        case 2 => Long.MinValue + (i % 3)
        case 3 => Long.MaxValue - (i % 5)
        case _ => k
      }
      m.put(key, i.toLong)
      ref.put(key, i.toLong)
    }
    assert(m.size === ref.size)
    ref.forEach { (key, v) =>
      assert(m.contains(key))
      assert(m.getOrElse(key, -1L) === v)
    }
    // absent keys miss on both
    for (probe <- Seq(123456789012L, -987654321098L))
      if (!ref.containsKey(probe)) {
        assert(!m.contains(probe))
        assert(m.getOrElse(probe, -7L) === -7L)
      }
  }

  test("keysSnapshot enumerates every key once, and value updates during iteration stay visible") {
    val m = new LongLongMap()
    (0L until 10000L).foreach(i => m.put(i * 31 - 5000, i))
    val seen = scala.collection.mutable.ArrayBuffer.empty[Long]
    m.keysSnapshot.foreach { key =>
      // the union-find output phase's access pattern: overwrite existing
      // keys mid-iteration (path compression) — no NEW keys, no grow
      m.put(key, 42L)
      seen += key
    }
    assert(seen.size === m.size)
    assert(seen.distinct.size === seen.size, "each key exactly once")
    assert(seen.forall(k => m.getOrElse(k, -1L) === 42L))
  }
}
