package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (hash-key, doc) candidate for the bounded top-K buffer. */
case class HkDoc(hk: Long, doc_id: Long)

/** Bounded top-K aggregation buffer: the K smallest items, kept sorted. */
case class TopKBuf(items: Seq[HkDoc])

/** Keep the K smallest (hk, doc_id) pairs per group — a BOUNDED
  * alternative to `collect_set` + sort + slice whose buffer can never
  * exceed K entries, no matter how many rows a group receives. The merge
  * is commutative and associative (min-K is a semilattice join), so the
  * result is independent of partitioning, reduce order, and — in a
  * streaming aggregation — micro-batch arrival order; state per group is
  * K fixed-width rows by construction. With hk a deterministic hash this
  * IS per-group uniform sampling (the K smallest hashes are a uniform
  * K-subset), the streaming-safe form of reservoir sampling.
  */
class BoundedTopK(k: Int) extends Aggregator[HkDoc, TopKBuf, TopKBuf] {
  private def lt(a: HkDoc, b: HkDoc): Boolean =
    a.hk < b.hk || (a.hk == b.hk && a.doc_id < b.doc_id)

  def zero: TopKBuf = TopKBuf(Vector.empty)

  def reduce(b: TopKBuf, v: HkDoc): TopKBuf =
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
