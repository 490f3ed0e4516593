package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (priority, doc) candidate for the bounded top-K buffer. The
  * priority is a Double so one aggregator serves both integer-hash
  * rankings (uniform quotas — any int64 hash below 2⁵³ is exactly
  * representable, so ordering is unchanged) and ratio priorities like
  * sequential Poisson sampling's u/w. */
case class Prioritized(pr: Double, doc_id: Long)

/** Bounded top-K aggregation buffer: the K smallest items, kept sorted. */
case class TopKBuf(items: Seq[Prioritized])

/** Keep the K smallest (pr, doc_id) pairs per group — a BOUNDED
  * alternative to `collect_set` + sort + slice whose buffer can never
  * exceed K entries, no matter how many rows a group receives. The merge
  * is commutative and associative (min-K is a semilattice join), so the
  * result is independent of partitioning, reduce order, and — in a
  * streaming aggregation — micro-batch arrival order; state per group is
  * K fixed-width rows by construction. With pr a deterministic uniform
  * hash this IS per-group uniform sampling (the K smallest hashes are a
  * uniform K-subset); with pr = hash/weight it is sequential Poisson
  * (probability-proportional-to-size) sampling — either way the
  * streaming-safe form of reservoir sampling.
  */
class BoundedTopK(k: Int) extends Aggregator[Prioritized, TopKBuf, TopKBuf] {
  private def lt(a: Prioritized, b: Prioritized): Boolean =
    a.pr < b.pr || (a.pr == b.pr && a.doc_id < b.doc_id)

  def zero: TopKBuf = TopKBuf(Vector.empty)

  def reduce(b: TopKBuf, v: Prioritized): TopKBuf =
    if (b.items.length >= k && !lt(v, b.items.last)) b
    else {
      val (lo, hi) = b.items.span(lt(_, v))
      // collect_set semantics: an exact duplicate pair is inserted once
      if (hi.headOption.contains(v)) b
      else TopKBuf(((lo :+ v) ++ hi).take(k))
    }

  def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    b.items.foldLeft(a)(reduce)

  def finish(b: TopKBuf): TopKBuf = b

  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
