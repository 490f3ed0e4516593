package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Skew

/** Salted join must be a pure physical rewrite: same row multiset as the
  * plain join, for any salt count. */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = SparkTestSession.Sf

  test("saltedJoin ≡ plain join (orders ⋈ customer)") {
    val fact = Tables.orders(spark, sf)
    val dim = Tables.customer(spark, sf)
      .withColumnRenamed("c_custkey", "o_custkey")
    val plain = fact.join(dim, Seq("o_custkey"))
      .select("o_orderkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    Seq(1, 4, 16).foreach { k =>
      val salted = Skew.saltedJoin(fact, dim, "o_custkey", k, col("o_orderkey"))
        .select("o_orderkey", "c_name").collect()
        .map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(salted === plain, s"salts=$k")
    }
  }

  test("declared skewJoinDemo equals the unsalted rollup") {
    val got = Skew.skewJoinDemo(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    val want = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
           graft.functions.Fns.sumD2(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
  }

  test("salting cuts max task input on a 50%-hot-key frame") {
    import spark.implicits._
    // hot-key fixture: key 1 carries 50% of all rows, 100 cold keys the rest
    val rows = (1 to 10000).map(i => (1L, i.toLong)) ++
      (1 to 10000).map(i => (2L + i % 100, i.toLong))
    val df = rows.toDF("k", "payload")
    def maxPartRows(parted: org.apache.spark.sql.DataFrame): Long =
      parted.rdd.mapPartitions(it => Iterator.single(it.size.toLong))
        .collect().max
    // shuffle on the bare key: the hot key's 10k rows land in ONE task
    val unsalted = maxPartRows(df.repartition(8, col("k")))
    assert(unsalted >= 10000L)
    // shuffle on (key, salt): the same rows spread over the 8 salt lanes,
    // so the biggest task shrinks to ~total/8
    val salted = maxPartRows(df
      .withColumn("__salt", pmod(hash(col("payload")), lit(8)))
      .repartition(8, col("k"), col("__salt")))
    // (k, salt) hash collisions can stack a couple of lanes in one
    // partition, so assert the halving rather than a perfect total/8 split
    assert(salted * 2 <= unsalted,
      s"salted max task input $salted, unsalted $unsalted")
  }

  test("saltedJoin spreads a hot key over multiple partitions") {
    import spark.implicits._
    // one celebrity key: 10k fact rows on key 1, dim has 2 keys
    val fact = (1 to 10000).map(i => (1L, i.toLong)) :+ ((2L, 0L))
    val dim = Seq((1L, "hot"), (2L, "cold"))
    val salted = Skew.saltedJoin(
      fact.toDF("k", "payload").repartition(8),
      dim.toDF("k", "name"), "k", 8, col("payload"))
    assert(salted.count() === 10001L)
    // the pre-join salted fact side must occupy >1 shuffle partition for key 1
    val parts = fact.toDF("k", "payload")
      .withColumn("__salt", pmod(hash(col("payload")), lit(8)))
      .filter(col("k") === 1).select("__salt").distinct().count()
    assert(parts > 1)
  }
}
