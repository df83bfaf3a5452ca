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

  test("as-of join: latest-at-or-before semantics, ties, tolerance, no-match drop") {
    import java.sql.Timestamp
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    val left = Seq(
      (1L, ts(10), 100L),  // clicks at 5 and 10 → tie at 10 matches (inclusive)
      (1L, ts(30), 101L),  // latest click 10, within 30 min → matches
      (1L, ts(45), 102L),  // latest click 10, 35 min back → outside tolerance
      (2L, ts(20), 103L)   // user 2 has no clicks → dropped
    ).toDF("user_id", "ts", "purchase_id")
    val right = Seq(
      (1L, ts(5), 7L),
      (1L, ts(10), 8L),
      (1L, ts(10), 9L)     // same (key, ts): max click_id 9 wins
    ).toDF("user_id", "click_ts", "click_id")
    val out = graft.operators.AsOfJoin.asofJoin(
        left, right, "user_id", "ts", "click_ts", "click_id",
        Seq("click_id", "click_ts"), Some("INTERVAL 30 minutes"))
      .select("purchase_id", "click_id").as[(Long, Long)].collect().toSet
    assert(out == Set((100L, 9L), (101L, 9L)))
  }

  test("flagship entry returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
