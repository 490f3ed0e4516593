package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tools.HintAudit

/** Direct unit coverage for the broadcast-hint structural prover (the
  * engine behind PlanGuardSpec's per-query sweep): each bounded shape it
  * promises to prove, and each corpus-derived shape it must reject. */
class HintAuditSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  private def docs = Tables.documents(spark, sf)

  /** Number of broadcast-hinted subtrees the prover can NOT bound. */
  private def unproven(hinted: DataFrame): Int = {
    val probe = docs.select(col("doc_id")).limit(1).crossJoin(broadcast(hinted))
    HintAudit.unprovenHints(probe).size
  }

  test("proves: 1-row global aggregate") {
    assert(unproven(docs.agg(count(lit(1)).as("n"))) === 0)
  }

  test("proves: limit over a corpus scan") {
    assert(unproven(docs.limit(5)) === 0)
  }

  test("proves: enum-domain grouping (lang) over an unbounded child") {
    assert(unproven(docs.groupBy("lang").agg(count(lit(1)).as("n"))) === 0)
  }

  test("proves: key-capped filter (doc_id < literal)") {
    assert(unproven(docs.filter(col("doc_id") < 5).select("doc_id")) === 0)
  }

  test("proves: constant TPC-H dims (nation, region)") {
    assert(unproven(Tables.nation(spark, sf)) === 0)
    assert(unproven(Tables.region(spark, sf)) === 0)
  }

  test("proves: join/union of bounded sides stays bounded") {
    val n = Tables.nation(spark, sf)
    val one = docs.agg(max(col("doc_id")).as("m"))
    assert(unproven(n.crossJoin(one)) === 0)
    assert(unproven(docs.limit(3).union(docs.limit(4))) === 0)
  }

  test("rejects: a bare corpus scan") {
    assert(unproven(docs.select("doc_id")) === 1)
  }

  test("rejects: grouping on a corpus-cardinality key (doc_id)") {
    assert(unproven(docs.groupBy("doc_id").agg(count(lit(1)).as("n"))) === 1)
  }

  test("rejects: a non-key filter, however selective it looks") {
    assert(unproven(docs.filter(col("n_chars") < 5)) === 1)
  }

  test("rejects: SF-growing TPC-H dims (customer), even filtered on non-keys") {
    assert(unproven(Tables.customer(spark, sf)) === 1)
    assert(unproven(
      Tables.customer(spark, sf).filter(col("c_mktsegment") === "BUILDING")) === 1)
  }

  test("rejects: a join with one unbounded side") {
    val one = docs.agg(max(col("doc_id")).as("m"))
    assert(unproven(docs.crossJoin(one)) === 1)
  }

  test("rejects: explode of a data-sized array over a 1-row aggregate") {
    // the corpus-smuggling shape: collect the whole corpus into one row,
    // then explode it back out — the 1-row aggregate must NOT launder it
    val smuggled = docs.agg(collect_list(col("doc_id")).as("ids"))
      .select(explode(col("ids")).as("doc_id"))
    assert(unproven(smuggled) === 1)
  }

  test("proves: explode of a FIXED-arity literal array constructor") {
    val two = docs.agg(count(lit(1)).as("n"), max(col("doc_id")).as("m"))
      .select(explode(array(struct(lit("count").as("k"), col("n").as("v")),
        struct(lit("max").as("k"), col("m").as("v")))).as("e"))
    assert(unproven(two) === 0)
  }

  test("counts every hint in a multi-hint plan, including subqueries") {
    val bad = docs.select("doc_id")
    val good = docs.limit(2)
    val df = docs.join(broadcast(bad), Seq("doc_id"), "left_semi")
      .join(broadcast(good), Seq("doc_id"), "left_anti")
    assert(HintAudit.unprovenHints(df).size === 1)
    assert(HintAudit.broadcastHinted(df).size === 2)
  }
}
