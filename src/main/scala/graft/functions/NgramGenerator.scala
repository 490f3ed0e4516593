package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Table-generating function (the Scala-side UDTF surface): explode a text
  * column into its word n-grams, one output row per n-gram — callable from
  * SQL as `LATERAL VIEW explode_ngrams(text, n)` once registered
  * ([[graft.GraftExtensions]] / `Engine.tune`).
  *
  * The reference's plugin contract is map-shaped (`Map(file, contents) →
  * []KV`, worker.go:15-18) — i.e. exactly a table function — so this
  * completes the UDF/UDAF/UDTF trio beside the scalar codegen expressions
  * and the full-value-list Aggregator. Tokenization matches the engine's
  * `Fns.tokensArr` contract (split on non-letters, drop empties), so the
  * n=3 stream equals the dedup shingle stream. Generators are
  * CodegenFallback by design in Spark (they return row iterators); the
  * per-row work is a single split + sliding window, and the explosion
  * happens inside the generate operator, never on the driver. */
case class NgramGenerator(child: Expression, nExpr: Expression)
    extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(child, nExpr)
  override def elementSchema: StructType =
    StructType(StructField("ngram", StringType) :: Nil)
  override def prettyName: String = "explode_ngrams"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType && nExpr.dataType == IntegerType &&
        nExpr.foldable)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        "explode_ngrams(text STRING, n INT literal)")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val s = child.eval(input)
    val nv = nExpr.eval(input)
    // null text, null n, or a non-positive n generate nothing (the same
    // lenient contract as the built-in explode of an empty array)
    if (s == null || nv == null || nv.asInstanceOf[Int] <= 0) Nil
    else {
      val n = nv.asInstanceOf[Int]
      val toks = s.toString.split("[^a-zA-Z]+").filter(_.nonEmpty)
      if (toks.length < n) Nil
      else toks.sliding(n).map(g =>
        InternalRow(UTF8String.fromString(g.mkString(" ")))).toSeq
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), nExpr = newChildren(1))
}
