package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{
  AggregateExpression, First, Last, Max, Min}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.types.Decimal

/** Structural audit of `broadcast()` hints: classifies each hinted
  * logical subtree as provably constant-bounded or (conservatively)
  * corpus-derived. A forced hint overrides AQE's runtime size check, so
  * a hint on anything that grows with the corpus ships a multi-GB
  * relation through the driver at 100 TB — the bug class fixed in
  * dedupMinhash (r8) and dedupApply/dedupFunnel/curationPipeline/the
  * TPC-H SF-growing dims (r9). `PlanGuardSpec` runs this as CI over
  * every declared query.
  *
  * Attribute checks resolve through exprId LINEAGE (Project / Aggregate /
  * Window alias definitions and fixed-arity generator outputs) down to
  * base-relation columns, so an alias cannot launder an unbounded
  * subtree into a declared-bounded column name
  * (`select(col("text").as("lang"))` proves nothing). */
object HintAudit {

  /** Fixture columns whose value domain does not grow with corpus size
    * (TESTDATA.md schemas): the categorical enums (lang / source /
    * event_type / label), literal-struct tags (sampler / dim), and the
    * calendar-bounded cohort day. A BASE-RELATION attribute resolving to
    * one of these — or any deterministic scalar function of only these —
    * yields a constant-cardinality grouping even over an unbounded
    * child. */
  private val boundedDomainCols =
    Set("lang", "source", "event_type", "sampler", "dim",
        "label", "true_label", "pred_label", "cohort")

  /** Fixture columns whose value RANGE is corpus-independent (TPC-H
    * price formulas: l_extendedprice ≤ ~105k, o_totalprice ≤ ~600k at
    * every SF) but whose raw cardinality is too large to group on — only
    * an explicit COARSENING (`floor(col / k)` / `col div k`, literal
    * k ≥ [[MinCoarsen]]) of them is bounded: range/k rows, ≤ a few
    * hundred for the declared domains. */
  private val boundedRangeCols = Set("l_extendedprice", "o_totalprice")

  /** Fixture primary keys (unique per row): a `key < literal` filter
    * caps the subtree at `literal` rows — the probe-table idiom
    * (`vec_id < 5`) used by the ANN/similarity family. */
  private val uniqueKeyCols = Set("vec_id", "doc_id")

  /** `pmod(_, k)` is bounded by k whatever its child; accept it as a
    * broadcast-safe bound only while k itself is small (the bloom bit
    * domain, 65521, is the largest declared sketch modulus). */
  private val MaxPmod = 4000000L

  /** Minimum literal divisor for a range-coarsening bound, so "bounded"
    * always means "small enough to broadcast": range/1000 of the
    * declared [[boundedRangeCols]] domains is ≤ ~600 rows. */
  private val MinCoarsen = 1000L

  /** Boundedness certificate for one memoized (checkpointed) table:
    * whether its ROW COUNT is corpus-independent, and which of its
    * columns have corpus-independent VALUE DOMAINS. Recorded at
    * [[certifyStable]] time, keyed by (applicationId, RDD id) — the RDD
    * id is stable across `newInstance()` plan copies (they share the
    * RDD) but RESTARTS per SparkContext, so a bare-id key would let a
    * later context in the same JVM inherit a stale rows-bounded
    * certificate for a corpus-sized checkpoint (round 11, ADVICE). The
    * entry also holds the RDD weakly: once a memo invalidation drops the
    * last strong reference and GC runs, the cert is swept on the next
    * [[certifyStable]] — the map is bounded by the LIVE memo population,
    * not the session's cumulative `stable` call count. */
  private final case class MemoCert(rowsBounded: Boolean, boundedCols: Set[String])
  private final case class CertSlot(
      holder: java.lang.ref.WeakReference[AnyRef], cert: MemoCert)
  private val memoCerts =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), CertSlot]()

  private def certOf(lr: LogicalRDD): Option[MemoCert] =
    Option(memoCerts.get((lr.rdd.context.applicationId, lr.rdd.id)))
      .filter(_.holder.get() != null).map(_.cert)

  /** Called by [[graft.util.Checkpoints.stable]]: prove what we can
    * about `original` BEFORE its lineage is cut, and attach the result
    * to the checkpointed plan's RDD so later audits can see through the
    * opaque `LogicalRDD` leaf. This is what lets the ITERATIVE memos
    * (k-means centroids, PQ codebooks) stay provable by induction: round
    * 0's seed table is bounded by a key-capped filter, each recenter is
    * an aggregate grouping on columns whose domains the previous round's
    * certificate bounds, so every round's checkpoint re-earns the
    * certificate. A corpus-sized checkpoint (CC labels, pair tables)
    * gets only its genuinely domain-bounded columns (e.g. a cluster id
    * drawn from a bounded centroid table), never a row bound. */
  def certifyStable(original: DataFrame, stabilized: DataFrame): Unit =
    stabilized.queryExecution.analyzed.collectLeaves() match {
      case Seq(lr: LogicalRDD) =>
        val plan = original.queryExecution.analyzed
        val rows = constantBounded(plan)
        val ctx = ctxOf(plan)
        val cols =
          if (rows) plan.output.map(_.name).toSet
          else plan.output.filter(o => boundedValue(o, ctx)).map(_.name).toSet
        if (rows || cols.nonEmpty) {
          val app = lr.rdd.context.applicationId
          // sweep: certs of DEAD contexts (only one SparkContext is
          // alive per JVM, so any other appId is a past context whose
          // RDD ids may collide with this one's) and of GC'd checkpoints
          // (the memo cache dropped its only strong reference)
          memoCerts.entrySet.removeIf(e =>
            e.getKey._1 != app || e.getValue.holder.get() == null)
          memoCerts.put((app, lr.rdd.id),
            CertSlot(new java.lang.ref.WeakReference[AnyRef](lr.rdd),
              MemoCert(rows, cols)))
        }
      case _ => () // reliable-checkpoint or unexpected shape: no claim
    }

  /** Lineage context harvested from one audited subtree. */
  private final case class Ctx(
      defs: Map[ExprId, Expression],       // alias → defining expression
      gens: Map[ExprId, Seq[Expression]],  // fixed-arity generator output → elements
      leaf: Map[ExprId, String],           // base-relation attribute → column name
      inSet: Set[ExprId],                  // attrs filtered to a literal set below
      boundedAttrs: Set[ExprId],           // leaf attrs with certified bounded domains
      timeAttrs: Set[ExprId])              // base-relation ts/date-typed attrs

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  private def ctxOf(p: LogicalPlan): Ctx = {
    import scala.collection.mutable
    val defs = mutable.Map[ExprId, Expression]()
    val gens = mutable.Map[ExprId, Seq[Expression]]()
    val leaf = mutable.Map[ExprId, String]()
    val ins = mutable.Set[ExprId]()
    val bnd = mutable.Set[ExprId]()
    val tim = mutable.Set[ExprId]()

    // resolve an exprId through alias RENAMES to its base column name,
    // over the partially-built maps (used by the Union intersection)
    def resolveBase(id: ExprId, depth: Int = 0): Option[String] =
      if (depth > 24) None
      else defs.get(id) match {
        case Some(d) => strip(d) match {
          case ar: AttributeReference => resolveBase(ar.exprId, depth + 1)
          case _                      => None
        }
        case None => leaf.get(id)
      }

    // POST-ORDER traversal: descendants' facts land before the node's
    // own, so a Union can intersect its branches' claims before any
    // constraint established ABOVE it (a Filter on the unioned result —
    // which legitimately binds all branches' rows) is recorded.
    def visit(n: LogicalPlan): Unit = {
      n match {
        case u: Union =>
          u.children.foreach(visit)
          // Union reuses its FIRST child's output exprIds, so a fact
          // proven inside one branch would otherwise apply to rows
          // flowing from every other branch
          // (filtered.union(unfiltered).groupBy(col) must NOT be proven
          // bounded — round 11, ADVICE). An output attr keeps a
          // branch-local fact only if EVERY branch's corresponding attr
          // establishes it; lineage survives only when all branches
          // rename the SAME base column.
          u.output.indices.foreach { i =>
            val outId = u.output(i).exprId
            val ids = u.children.map(_.output(i).exprId)
            if (!ids.forall(ins)) ins -= outId
            if (!ids.forall(bnd)) bnd -= outId
            if (!ids.forall(tim)) tim -= outId
            val names = ids.map(id => resolveBase(id))
            defs -= outId
            gens -= outId
            if (names.forall(_.isDefined) && names.distinct.size == 1)
              leaf(outId) = names.head.get
            else
              leaf -= outId
          }
        case other => other.children.foreach(visit)
      }
      n match {
        case pr: Project =>
          pr.projectList.foreach {
            case a: Alias => defs(a.exprId) = a.child
            case _        => ()
          }
        case ag: Aggregate =>
          ag.aggregateExpressions.foreach {
            case a: Alias => defs(a.exprId) = a.child
            case _        => ()
          }
        case wd: Window =>
          wd.windowExpressions.foreach {
            case a: Alias => defs(a.exprId) = a.child
            case _        => ()
          }
        case g: Generate =>
          g.generator match {
            case Explode(arr: CreateArray) =>
              g.generatorOutput.foreach(o => gens(o.exprId) = arr.children)
            case PosExplode(arr: CreateArray) =>
              g.generatorOutput match {
                case Seq(pos, c) =>
                  gens(pos.exprId) =
                    arr.children.indices.map(i => Literal(i): Expression)
                  gens(c.exprId) = arr.children
                case _ => ()
              }
            case _ => () // data-sized generator: outputs stay unresolvable
          }
        case f: Filter =>
          // only CONJUNCTS constrain — an In under Or/Not bounds nothing
          conjuncts(f.condition).foreach {
            case In(a: AttributeReference, vs) if vs.forall(isLit) =>
              ins += a.exprId
            case InSet(a: AttributeReference, _) => ins += a.exprId
            case EqualTo(a: AttributeReference, l) if isLit(l) => ins += a.exprId
            case EqualTo(l, a: AttributeReference) if isLit(l) => ins += a.exprId
            case _ => ()
          }
        case l: LeafNode =>
          l.output.foreach { o =>
            leaf(o.exprId) = o.name
            o.dataType match {
              case _: org.apache.spark.sql.types.DateType |
                  _: org.apache.spark.sql.types.TimestampType |
                  _: org.apache.spark.sql.types.TimestampNTZType =>
                tim += o.exprId
              case _ => ()
            }
          }
          l match {
            case _: LocalRelation | _: OneRowRelation =>
              // driver-local by construction: every column's domain is as
              // bounded as the relation itself
              l.output.foreach(o => bnd += o.exprId)
            case lr: LogicalRDD =>
              certOf(lr).foreach { cert =>
                l.output.foreach(o =>
                  if (cert.rowsBounded || cert.boundedCols(o.name))
                    bnd += o.exprId)
              }
            case _ => ()
          }
        case _ => ()
      }
    }
    visit(p)
    Ctx(defs.toMap, gens.toMap, leaf.toMap, ins.toSet, bnd.toSet, tim.toSet)
  }

  /** Peel the value-preserving wrappers analysis inserts. */
  @scala.annotation.tailrec
  private def strip(e: Expression): Expression = e match {
    case c: Cast  => strip(c.child)
    case a: Alias => strip(a.child)
    case u: UnaryExpression
        if u.nodeName == "CheckOverflow" || u.nodeName == "PromotePrecision" ||
          u.nodeName == "KnownNotNull" =>
      strip(u.child)
    case _ => e
  }

  private def isLit(e: Expression): Boolean = strip(e) match {
    case _: Literal => true
    case _          => false
  }

  private def litLong(e: Expression): Option[Long] = strip(e) match {
    case Literal(v: Long, _)    => Some(v)
    case Literal(v: Int, _)     => Some(v.toLong)
    case Literal(v: Short, _)   => Some(v.toLong)
    case Literal(v: Byte, _)    => Some(v.toLong)
    case Literal(d: Decimal, _) => Some(d.toLong)
    case Literal(d: Double, _)  => Some(d.toLong)
    case _                      => None
  }

  /** Resolve an attribute through alias definitions to the BASE-relation
    * column name it renames, or None if it is derived (not a rename). */
  private def baseName(a: AttributeReference, ctx: Ctx, depth: Int = 0): Option[String] =
    if (depth > 24) None
    else ctx.defs.get(a.exprId) match {
      case Some(d) => strip(d) match {
        case ar: AttributeReference => baseName(ar, ctx, depth + 1)
        case _                      => None
      }
      case None => ctx.leaf.get(a.exprId)
    }

  /** x is (a rename of) a declared bounded-RANGE base column. */
  private def boundedRangeRef(x: Expression, ctx: Ctx): Boolean =
    strip(x) match {
      case ar: AttributeReference => baseName(ar, ctx).exists(boundedRangeCols)
      case _                      => false
    }

  /** Cardinality ceiling for a range-inferred bound: an integer
    * expression whose inferred range spans < MaxCard values groups into
    * a broadcast-small table (same policy ceiling as [[MaxPmod]]). */
  private val MaxCard = 4000000L

  /** Declared µs-epoch envelope of the fixtures' event calendar:
    * TESTDATA pins `events.ts` inside a fixed window at every SF (the
    * generated data spans January 2024; the envelope below is the whole
    * 2024 calendar year for regeneration slack). Corpus growth adds
    * events per unit time, never calendar span — the same
    * fixture-domain declaration as the TPC-H price ranges. */
  private val tsRangeUs = (1704067200000000L, 1735689600000000L)

  /** Every attribute the expression references resolves (through alias
    * lineage) to a base-relation column in `names`. */
  private def onlyBase(e: Expression, ctx: Ctx, names: Set[String],
                       depth: Int = 0): Boolean =
    depth <= 24 && e.references.toSeq.forall {
      case ar: AttributeReference =>
        ctx.defs.get(ar.exprId) match {
          case Some(d) => onlyBase(d, ctx, names, depth + 1)
          case None    => ctx.leaf.get(ar.exprId).exists(names)
        }
      case _ => false
    }

  /** Interval corners under an op monotone in each argument (add / sub /
    * mul / trunc-div are); None on int64 overflow — overflow means the
    * proof is abandoned, never widened. */
  private def corners(a: (Long, Long), b: (Long, Long),
                      f: (Long, Long) => Long): Option[(Long, Long)] =
    try {
      val vs = Seq(f(a._1, b._1), f(a._1, b._2), f(a._2, b._1), f(a._2, b._2))
      Some((vs.min, vs.max))
    } catch { case _: ArithmeticException => None }

  /** Conservative int64 interval inference — the engine behind the
    * range-cardinality clause of [[boundedValue]]. Seeds: literals and
    * µs-epoch images of the declared event calendar
    * (`unix_micros(ts…)`, however the fixture's timestamp encoding was
    * normalized). Propagates through alias lineage, lag/lead/nth-value
    * (they SELECT an input value), min/max/first/last (plain or
    * windowed), +/−/× (corner arithmetic, overflow aborts the proof),
    * `div` by a literal, `floor(x / k)`, and `pmod(_, k)` → [0, k).
    * This is what proves the gap-histogram blocking shape:
    * `(tus − lag(tus)) div 60e6` spans ≤ the calendar window in minutes
    * — corpus-independent — even though every intermediate value has
    * far too many distinct values to group on raw. */
  private def rangeOf(e0: Expression, ctx: Ctx, depth: Int = 0): Option[(Long, Long)] = {
    if (depth > 24) return None
    def rec(e: Expression): Option[(Long, Long)] = rangeOf(e, ctx, depth + 1)
    strip(e0) match {
      case um: UnixMicros if onlyBase(um, ctx, Set("ts")) => Some(tsRangeUs)
      case l: Literal => litLong(l).map(v => (v, v))
      case ar: AttributeReference => ctx.defs.get(ar.exprId).flatMap(rec)
      case we: WindowExpression =>
        we.windowFunction match {
          case lg: Lag       => rec(lg.input)
          case ld: Lead      => rec(ld.input)
          case nv: NthValue  => rec(nv.input)
          case ae: AggregateExpression => rec(ae)
          case _             => None
        }
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          case Min(c)   => rec(c)
          case Max(c)   => rec(c)
          case f: First => rec(f.child)
          case l: Last  => rec(l.child)
          case _        => None
        }
      case a: Add =>
        for { x <- rec(a.left); y <- rec(a.right)
              r <- corners(x, y, Math.addExact) } yield r
      case s: Subtract =>
        for { x <- rec(s.left); y <- rec(s.right)
              r <- corners(x, y, Math.subtractExact) } yield r
      case m: Multiply =>
        for { x <- rec(m.left); y <- rec(m.right)
              r <- corners(x, y, Math.multiplyExact) } yield r
      case d: IntegralDivide =>
        for { k <- litLong(d.right) if k != 0L
              x <- rec(d.left)
              r <- corners(x, (k, k), _ / _) } yield r
      case fl: Floor =>
        strip(fl.child) match {
          case d: Divide =>
            for { k <- litLong(d.right) if k != 0L
                  x <- rec(d.left)
                  r <- corners(x, (k, k), Math.floorDiv) } yield r
          case other => rec(other)
        }
      case p: Pmod =>
        litLong(p.right).collect { case k if k > 0L => (0L, k - 1L) }
      case _ => None
    }
  }

  /** The expression's inferred integer range spans fewer than
    * [[MaxCard]] distinct values — a corpus-independent grouping. */
  private def rangeBounded(e: Expression, ctx: Ctx): Boolean =
    rangeOf(e, ctx).exists { case (lo, hi) =>
      try Math.subtractExact(hi, lo) < MaxCard
      catch { case _: ArithmeticException => false }
    }

  /** Structural equality modulo exprIds: the two expressions have the
    * same shape and their attributes resolve — through alias lineage —
    * to definitions of the same shape, bottoming out at equal
    * base-relation column NAMES. This is what survives Spark's
    * DeduplicateRelations, which renews exprIds on one side of a
    * self-referential join (the crossJoin(broadcast(df.agg(…))) extent
    * idiom is exactly that). By-name leaf matching is why the pattern's
    * documented same-rows assumption exists. */
  private def structEq(e1: Expression, e2: Expression, ctx: Ctx,
                       depth: Int = 0): Boolean = {
    if (depth > 32) return false
    (strip(e1), strip(e2)) match {
      case (a: AttributeReference, b: AttributeReference) =>
        a.exprId == b.exprId ||
          ((ctx.defs.get(a.exprId), ctx.defs.get(b.exprId)) match {
            case (Some(da), Some(db)) => structEq(da, db, ctx, depth + 1)
            case (None, None) =>
              ((ctx.gens.get(a.exprId), ctx.gens.get(b.exprId)) match {
                case (Some(ga), Some(gb)) =>
                  ga.size == gb.size && ga.zip(gb).forall {
                    case (u, v) => structEq(u, v, ctx, depth + 1)
                  }
                case _ => false
              }) ||
                ((ctx.leaf.get(a.exprId), ctx.leaf.get(b.exprId)) match {
                  case (Some(x), Some(y)) => x == y
                  case _                  => false
                })
            case _ => false
          })
      case (l1: Literal, l2: Literal) => l1.semanticEquals(l2)
      case (g1: GetStructField, g2: GetStructField) =>
        g1.ordinal == g2.ordinal && structEq(g1.child, g2.child, ctx, depth + 1)
      case (x, y) =>
        x.getClass == y.getClass && x.children.size == y.children.size &&
          x.children.zip(y.children).forall {
            case (c1, c2) => structEq(c1, c2, ctx, depth + 1)
          }
    }
  }

  /** `ref` is an attribute that resolves to an aggregate `agg(x')` (Max
    * or Min per `wantMax`) where x' is THE SAME value as `x`: the
    * identical attribute (exprId match), a rename of the same
    * base-relation key column, or [[structEq]]-identical lineage (the
    * post-DeduplicateRelations case). */
  private def extentOf(ref: Expression, x: AttributeReference, wantMax: Boolean,
                       ctx: Ctx): Boolean = {
    def sameAs(e: Expression): Boolean = strip(e) match {
      case ar: AttributeReference =>
        ar.exprId == x.exprId ||
          ((baseName(ar, ctx), baseName(x, ctx)) match {
            case (Some(a), Some(b)) => a == b && uniqueKeyCols(a)
            case _                  => false
          }) || structEq(ar, x, ctx)
      case _ => false
    }
    strip(ref) match {
      case mr: AttributeReference =>
        ctx.defs.get(mr.exprId).map(strip).exists {
          case ae: AggregateExpression =>
            ae.aggregateFunction match {
              case Max(mc) if wantMax  => sameAs(mc)
              case Min(mc) if !wantMax => sameAs(mc)
              case _                   => false
            }
          case _ => false
        }
      case _ => false
    }
  }

  /** The adaptive-coarsening shapes (q_pack_sequences, q_gini, q_rfm):
    *
    *   x div greatest(litM, (max(x) + 1) div litK)          — key form
    *   (x − min(x)) div greatest(litM, (max(x) − min(x) + 1) div litK)
    *                                                        — range form
    *
    * In both, the divisor is corpus-DERIVED (1-row extent aggregates
    * broadcast onto the stream) yet the quotient is provably < litK at
    * any corpus size and any value distribution: the key form needs
    * 0 ≤ x (declared non-negative fixture keys), the range form needs
    * nothing — min(x) ≤ x ≤ max(x) by definition. The extent aggregates
    * must be over the SAME attribute as x ([[extentOf]]). Assumption the
    * pattern cannot check: the extent is aggregated over (a superset of)
    * the rows being divided — true by construction for the
    * crossJoin(broadcast(df.agg(…))) idiom these queries use, the only
    * shape in this repo; an extent over a FILTERED subset would not
    * bound the full column. */
  private def adaptiveKeyDiv(d: IntegralDivide, ctx: Ctx): Boolean = {
    // numerator: either x itself (key form) or x − minRef (range form)
    val num = strip(d.left) match {
      case x: AttributeReference => Some((x, None: Option[Expression]))
      case s: Subtract => strip(s.left) match {
        case x: AttributeReference => Some((x, Some(s.right)))
        case _                     => None
      }
      case _ => None
    }
    num.exists { case (x, minRef) =>
      val keyForm = minRef.isEmpty && baseName(x, ctx).exists(uniqueKeyCols)
      val rangeForm = minRef.exists(m => extentOf(m, x, wantMax = false, ctx))
      (keyForm || rangeForm) && (strip(d.right) match {
        case g: Greatest if g.children.size == 2 =>
          g.children.map(strip).exists(c => litLong(c).exists(_ >= 1L)) &&
            g.children.map(strip).exists {
              case inner: IntegralDivide =>
                litLong(inner.right).exists(k => k >= 1L && k < MaxCard) &&
                  (strip(inner.left) match {
                    case a: Add if litLong(a.right).contains(1L) =>
                      strip(a.left) match {
                        // key form: max(x) + 1
                        case mr: AttributeReference if minRef.isEmpty =>
                          extentOf(mr, x, wantMax = true, ctx)
                        // range form: (max(x) − min(x)) + 1, with the
                        // SAME min reference as the numerator's shift
                        case s2: Subtract if minRef.nonEmpty =>
                          extentOf(s2.left, x, wantMax = true, ctx) &&
                            ((strip(s2.right), minRef.map(strip)) match {
                              case (a2: AttributeReference,
                                    Some(a1: AttributeReference)) =>
                                a1.exprId == a2.exprId
                              case _ => false
                            })
                        case _ => false
                      }
                    case _ => false
                  })
              case _ => false
            }
        case _ => false
      })
    }
  }

  /** Conservative proof that the expression's VALUE DOMAIN is small and
    * corpus-independent — the per-grouping-expression engine behind the
    * Aggregate case of [[constantBounded]]. Handles: int64 interval
    * inference ([[rangeOf]] — window-lag diffs of calendar values,
    * arithmetic compositions, spans < [[MaxCard]]); literals;
    * `pmod(_, k)` (≤ k values); the adaptive key coarsening
    * `x div greatest(m, (max(x)+1) div k)` ([[adaptiveKeyDiv]] — ≤ k
    * blocks at any corpus size); `floor(range-col / k)` / `range-col div
    * k` coarsenings; calendar coarsenings (day-or-coarser images of any
    * physical time column are bounded by the fixtures' fixed calendar
    * windows, and sub-day fields are range-bounded by definition —
    * hour ∈ 0..23); attributes resolved through alias lineage,
    * fixed-arity generator elements, In-literal filters below, or
    * declared enum base columns; struct-field access into fixed-arity
    * generator elements; and any deterministic scalar composition of
    * bounded inputs. Accumulating aggregate/window values (sums, counts)
    * are corpus-derived by fiat. */
  private def boundedValue(e0: Expression, ctx: Ctx, depth: Int = 0): Boolean = {
    if (depth > 24) return false
    def rec(e: Expression): Boolean = boundedValue(e, ctx, depth + 1)
    strip(e0) match {
      // interval inference first: it proves compositions (window-lag
      // diffs of calendar values, adaptive key coarsenings) no single
      // syntactic clause below can see
      case e if rangeBounded(e, ctx) => true
      case _: Literal => true
      case p: Pmod =>
        litLong(p.right).exists(v => v > 0 && v <= MaxPmod)
      case d: IntegralDivide if adaptiveKeyDiv(d, ctx) => true
      case d: IntegralDivide
          if litLong(d.right).exists(_ >= MinCoarsen) &&
            boundedRangeRef(d.left, ctx) => true
      case fl: Floor =>
        strip(fl.child) match {
          case d: Divide =>
            litLong(d.right).exists(_ >= MinCoarsen) &&
              boundedRangeRef(d.left, ctx)
          case d: IntegralDivide =>
            litLong(d.right).exists(_ >= MinCoarsen) &&
              boundedRangeRef(d.left, ctx)
          case other => rec(other) // floor of a bounded value stays bounded
        }
      // intra-year / sub-day calendar FIELDS are range-bounded by
      // DEFINITION whatever the child (hour ∈ 0..23, month ∈ 1..12, …)
      case _: Quarter | _: Month | _: DayOfMonth | _: DayOfYear |
          _: WeekOfYear | _: DayOfWeek | _: Hour | _: Minute | _: Second =>
        true
      // day-or-coarser IMAGES are bounded only by the fixtures' fixed
      // calendar window — a fact about the base ts/date COLUMNS, so the
      // temporal child must resolve to one through lineage: to_date /
      // datediff of a corpus-ACCUMULATING value proves nothing
      // (round 11, ADVICE — previously accepted unconditionally)
      case e @ (_: ParseToDate | _: TruncDate | _: TruncTimestamp |
          _: Year | _: DateDiff) =>
        e.children.forall(c => isLit(c) || timeColRooted(c, ctx, depth + 1))
      case ar: AttributeReference =>
        ctx.inSet(ar.exprId) || ctx.boundedAttrs(ar.exprId) ||
          (ctx.defs.get(ar.exprId) match {
            case Some(d) => rec(d)
            case None =>
              ctx.gens.get(ar.exprId) match {
                case Some(els) => els.forall(rec)
                case None => ctx.leaf.get(ar.exprId).exists(boundedDomainCols)
              }
          })
      case gsf: GetStructField =>
        strip(gsf.child) match {
          case ar: AttributeReference if ctx.gens.contains(ar.exprId) =>
            ctx.gens(ar.exprId).forall { el =>
              strip(el) match {
                case cns: CreateNamedStruct =>
                  cns.valExprs.lift(gsf.ordinal).exists(rec)
                case _ => false
              }
            }
          case _ => false
        }
      // min/max/first/last SELECT a value from their input, so the
      // result's domain is a subset of the child's — bounded child value,
      // bounded aggregate (q_retention's cohort = min(calendar day)).
      // Sums/counts/averages ACCUMULATE and are corpus-derived by fiat.
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          case Min(c)   => rec(c)
          case Max(c)   => rec(c)
          case f: First => rec(f.child)
          case l: Last  => rec(l.child)
          case _        => false
        }
      case _: WindowExpression    => false
      case other if other.deterministic && other.children.nonEmpty =>
        other.children.forall(rec)
      case _ => false
    }
  }

  /** The expression is (a rename of) a base ts/date-TYPED column, or a
    * value-preserving temporal image of one (cast / trunc / parse
    * chains; [[strip]] unwraps the casts) — the lineage requirement
    * behind the calendar-coarsening clause of [[boundedValue]]. A
    * min/max/first/last of a time-rooted value still SELECTS one of its
    * inputs, so aggregate wrappers keep the root. */
  private def timeColRooted(e: Expression, ctx: Ctx, depth: Int = 0): Boolean = {
    if (depth > 24) return false
    strip(e) match {
      case ar: AttributeReference =>
        ctx.timeAttrs(ar.exprId) ||
          ctx.defs.get(ar.exprId).exists(d => timeColRooted(d, ctx, depth + 1))
      case t @ (_: ParseToDate | _: TruncDate | _: TruncTimestamp) =>
        t.children.exists(c => !isLit(c) && timeColRooted(c, ctx, depth + 1)) &&
          t.children.forall(c => isLit(c) || timeColRooted(c, ctx, depth + 1))
      case ae: AggregateExpression =>
        ae.aggregateFunction match {
          case Min(c)   => timeColRooted(c, ctx, depth + 1)
          case Max(c)   => timeColRooted(c, ctx, depth + 1)
          case f: First => timeColRooted(f.child, ctx, depth + 1)
          case l: Last  => timeColRooted(l.child, ctx, depth + 1)
          case _        => false
        }
      case _ => false
    }
  }

  private def keyCapped(cond: Expression, ctx: Ctx): Boolean = cond match {
    case LessThan(a: AttributeReference, l) if isLit(l) =>
      baseName(a, ctx).exists(uniqueKeyCols)
    case LessThanOrEqual(a: AttributeReference, l) if isLit(l) =>
      baseName(a, ctx).exists(uniqueKeyCols)
    case And(l, r) => keyCapped(l, ctx) || keyCapped(r, ctx)
    case _         => false
  }

  /** TPC-H tables whose row count is constant at every scale factor
    * (nation = 25, region = 5 per the TPC-H spec), recognized by their
    * signature key columns surviving in a leaf's output; plus memoized
    * checkpoints carrying a rows-bounded [[certifyStable]] certificate
    * (k-means centroids, PQ codebooks — bounded by induction over the
    * Lloyd rounds). */
  private def constantDimLeaf(l: LeafNode): Boolean = l match {
    case lr: LogicalRDD => certOf(lr).exists(_.rowsBounded)
    case _ =>
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
      a.groupingExpressions.isEmpty || constantBounded(a.child) || {
        val ctx = ctxOf(a)
        a.groupingExpressions.forall(g => boundedValue(g, ctx))
      }
    case f: Filter =>
      keyCapped(f.condition, ctxOf(f)) || constantBounded(f.child)
    // DISTINCT over keys with bounded value domains is bounded whatever
    // the child's row count (q_bloom_fpr's distinct pmod-valued bits).
    case d: Deduplicate =>
      d.keys.forall(k => boundedValue(k, ctxOf(d))) ||
        d.children.forall(constantBounded)
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
    // typed flatMap family: each of these can fan one input row out to
    // arbitrarily many output rows (an iterator the audit cannot see
    // into), so a bounded child proves nothing — reject explicitly
    // rather than falling into the 1:1 default case.
    case _: MapPartitions | _: MapGroups | _: CoGroup |
        _: FlatMapGroupsWithState =>
      false
    case j: Join  => constantBounded(j.left) && constantBounded(j.right)
    case u: Union => u.children.forall(constantBounded)
    case l: LeafNode => constantDimLeaf(l) // file scan / RDD: grows with the corpus
    case other => other.children.forall(constantBounded)
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
