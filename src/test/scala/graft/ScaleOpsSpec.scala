package graft

import org.apache.spark.sql.functions._

import graft.operators.SkewJoin
import graft.queries.QueryDef
import graft.sinks.BucketedStore

/** Scale-path operators: salted skew join correctness, bucketed
  * co-located joins (no Exchange in plan), and the driver-contract
  * flagship smoke. */
class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("salted join returns exactly the rows of the plain join") {
    // skewed facts: 90% of rows share one key
    val facts = ((1 to 900).map(i => (1L, i.toLong)) ++
                 (1 to 100).map(i => (i.toLong % 7 + 2, i.toLong)))
      .toDF("k", "payload")
    val dims = (1L to 10L).map(k => (k, s"dim$k")).toDF("k", "name")

    val plain = facts.join(dims, Seq("k")).select("k", "payload", "name")
    val salted = SkewJoin.saltedJoin(facts, dims, "k", col("payload"), 8)
      .select("k", "payload", "name")
    assert(plain.count() == salted.count())
    assert(plain.except(salted).count() == 0 && salted.except(plain).count() == 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val o = QueryDef.table(spark, sf0001, "orders")
      val l = QueryDef.table(spark, sf0001, "lineitem")
      BucketedStore.writeBucketed(
        o.select("o_orderkey", "o_totalprice"), "orders_b", "o_orderkey", 4)
      BucketedStore.writeBucketed(
        l.select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "lineitem_b", "o_orderkey", 4)
      val joined = BucketedStore.read(spark, "orders_b")
        .join(BucketedStore.read(spark, "lineitem_b"), Seq("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected shuffle-free plan:\n$plan")
      assert(joined.count() == l.count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
