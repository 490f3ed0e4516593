package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session-extension entry point: the deployment path for plugging the
  * engine's codegen'd functions into ANY Spark session —
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * registers `poly_hash` / `poly_hash2` / `fold_dot` / `fnv1a32` as
  * SQL-callable functions at session build, with no call into
  * `Engine.tune` required (which keeps doing the same registration
  * imperatively for programmatic sessions). This is the standard
  * `SparkSessionExtensions.injectFunction` mechanism, the same hook a
  * custom Rule/Strategy would use if an operator ever outgrew what the
  * built-in planner expresses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression) =
    (new FunctionIdentifier(name),
     new ExpressionInfo("graft", name),
     builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    // semantics-preserving rewrite: thresholded levenshtein predicates
    // gain a cheap length-gap guard (see the rule's doc for the proof)
    ext.injectOptimizerRule(_ => graft.plans.LevenshteinLengthGuard)
    ext.injectFunction(fn("poly_hash",
      es => graft.functions.PolyHashExpr(es.head, 31L, 1000000007L)))
    ext.injectFunction(fn("poly_hash2",
      es => graft.functions.PolyHashExpr(es.head, 131L, 1000000009L)))
    ext.injectFunction(fn("fold_dot",
      es => graft.functions.FoldDotProduct(es(0), es(1))))
    ext.injectFunction(fn("fnv1a32",
      es => graft.functions.Fnv1aExpr(es.head)))
    ext.injectFunction(fn("explode_ngrams",
      es => graft.functions.NgramGenerator(es(0), es(1))))
  }
}
