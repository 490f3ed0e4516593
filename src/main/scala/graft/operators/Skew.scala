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
}
