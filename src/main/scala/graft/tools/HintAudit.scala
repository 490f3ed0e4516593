package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._

/** Structural audit of `broadcast()` hints: classifies each hinted
  * logical subtree as provably constant-bounded or (conservatively)
  * corpus-derived. A forced hint overrides AQE's runtime size check, so
  * a hint on anything that grows with the corpus ships a multi-GB
  * relation through the driver at 100 TB — the bug class fixed in
  * dedupMinhash (r8) and dedupApply/dedupFunnel/curationPipeline/the
  * TPC-H SF-growing dims (r9). `PlanGuardSpec` runs this as CI over
  * every declared query. */
object HintAudit {

  /** Fixture columns whose value domain does not grow with corpus size
    * (TESTDATA.md schemas): the categorical enums (lang / source /
    * event_type / label), literal-struct tags (sampler / dim), and the
    * calendar-bounded cohort day. Grouping on ONLY these yields a
    * constant-cardinality aggregate even over an unbounded child. */
  private val boundedDomainCols =
    Set("lang", "source", "event_type", "sampler", "dim",
        "label", "true_label", "pred_label", "cohort")

  /** Fixture primary keys (unique per row): a `key < literal` filter
    * caps the subtree at `literal` rows — the probe-table idiom
    * (`vec_id < 5`) used by the ANN/similarity family. */
  private val uniqueKeyCols = Set("vec_id", "doc_id")

  private def isLit(e: Expression): Boolean = e match {
    case _: Literal => true
    case c: Cast    => isLit(c.child)
    case _          => false
  }

  private def keyCapped(cond: Expression): Boolean = cond match {
    case LessThan(a: AttributeReference, l) if isLit(l)        => uniqueKeyCols(a.name)
    case LessThanOrEqual(a: AttributeReference, l) if isLit(l) => uniqueKeyCols(a.name)
    case And(l, r) => keyCapped(l) || keyCapped(r)
    case _         => false
  }

  /** TPC-H tables whose row count is constant at every scale factor
    * (nation = 25, region = 5 per the TPC-H spec), recognized by their
    * signature key columns surviving in a leaf's output. */
  private def constantDimLeaf(l: LeafNode): Boolean = {
    val names = l.output.map(_.name).toSet
    names.contains("n_nationkey") || names.contains("r_regionkey")
  }

  /** Conservative structural proof that a logical subtree's row count
    * does not grow with input size. Anything not provably bounded is
    * treated as corpus-derived. */
  def constantBounded(p: LogicalPlan): Boolean = p match {
    case _: LocalRelation | _: OneRowRelation | _: Range => true
    case _: GlobalLimit | _: LocalLimit                  => true
    case a: Aggregate =>
      a.groupingExpressions.isEmpty || constantBounded(a.child) ||
        a.groupingExpressions.forall(
          _.references.forall(r => boundedDomainCols(r.name)))
    case f: Filter   => keyCapped(f.condition) || constantBounded(f.child)
    // Generate MULTIPLIES rows, so a bounded child proves nothing unless
    // the generator's fan-out is a fixed arity: explode/posexplode/inline
    // of an array LITERAL CONSTRUCTOR (CreateArray — fixed element count
    // whatever the element expressions reference). explode of a
    // collect_list (or any data-sized array) over a 1-row aggregate is
    // exactly the corpus-smuggling shape this prover exists to reject.
    case g: Generate =>
      (g.generator match {
        case Explode(_: CreateArray) | PosExplode(_: CreateArray) => true
        case Inline(_: CreateArray)                               => true
        case _                                                    => false
      }) && g.children.forall(constantBounded)
    case j: Join     => constantBounded(j.left) && constantBounded(j.right)
    case u: Union    => u.children.forall(constantBounded)
    case l: LeafNode => constantDimLeaf(l) // file scan / RDD: grows with the corpus
    case other       => other.children.forall(constantBounded)
  }

  /** All broadcast-hinted subtrees in a query's analyzed plan. */
  def broadcastHinted(df: DataFrame): Seq[LogicalPlan] =
    df.queryExecution.analyzed.collectWithSubqueries {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) => h.child
    }

  /** The hinted subtrees NOT provably constant-bounded. */
  def unprovenHints(df: DataFrame): Seq[LogicalPlan] =
    broadcastHinted(df).filterNot(constantBounded)
}
