package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join splitting (enabled in [[graft.Engine.tune]]) handles
  * most runtime skew; explicit salting remains the tool when one join key
  * dominates so heavily that even split partitions bottleneck, or when the
  * skew is known up front (e.g. a null-heavy or celebrity key). */
object Skew {

  /** Inner equi-join with the fact side salted K ways and the (small)
    * build side replicated K×: the hot key's rows spread over K reducers
    * instead of one. `saltBy` must be a deterministic fact-side column
    * (row identity), so results are reproducible run to run.
    *
    * Semantics: identical row multiset to `fact.join(dim, key)`. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int, saltBy: Column): DataFrame = {
    val sf = fact.withColumn("__salt", pmod(hash(saltBy), lit(salts)))
    val sd = dim.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    sf.join(sd, Seq(key, "__salt")).drop("__salt")
  }

  /** Declared proof query: salted join ≡ plain join. orders (fact, salted
    * 8 ways by row identity) ⋈ customer (dim, replicated 8×), rolled up by
    * market segment with a decimal-routed (order-independent) revenue sum,
    * so the result matches the unsalted oracle plan bit-for-bit. */
  def skewJoinDemo(s: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val fact = graft.Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    val dim = graft.Tables.customer(s, dir)
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
    saltedJoin(fact, dim, "o_custkey", 8, col("o_orderkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.Fns.sumD2(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
  }
}
