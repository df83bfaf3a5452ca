package graft

import org.apache.spark.sql.functions._

import graft.analytics.SelfAudit

/** Negative-path pins for the self-audit harness: the registry's
  * approximate entries are hash-green BECAUSE their audit booleans are
  * deterministically true — so the harness itself must demonstrably
  * flip them on a broken serve. A harness that can't fail would make
  * every audited row vacuously green. */
class SelfAuditSpec extends SparkSpec {
  import spark.implicits._

  test("topK: honest serve passes; collapsed recall and fabricated scores flip the booleans") {
    val exact = Seq((1L, 0.9), (2L, 0.8), (3L, 0.7))
      .toDF("vec_id", "cos_sim")
    val good = SelfAudit
      .topK(exact, exact, minHits = 2, "cos_sim", higherIsBetter = true)
      .head()
    assert(good.getAs[Long]("n_served") == 3)
    assert(good.getAs[Boolean]("recall_ok"))
    assert(good.getAs[Boolean]("best_bounded"))
    // a serve returning ids outside the exact set (broken bucket join)
    // fails the floor; one FABRICATING a score above the exact optimum
    // fails the bound
    val broken = Seq((9L, 0.99), (8L, 0.5)).toDF("vec_id", "cos_sim")
    val bad = SelfAudit
      .topK(broken, exact, minHits = 2, "cos_sim", higherIsBetter = true)
      .head()
    assert(!bad.getAs[Boolean]("recall_ok"))
    assert(!bad.getAs[Boolean]("best_bounded"))
    // lower-is-better direction (the PQ-metric serves)
    val exactL2 = Seq((1L, 0.1), (2L, 0.2)).toDF("vec_id", "l2_dist")
    val cheat = Seq((1L, 0.01)).toDF("vec_id", "l2_dist")
    val l2 = SelfAudit
      .topK(cheat, exactL2, minHits = 1, "l2_dist", higherIsBetter = false)
      .head()
    assert(l2.getAs[Boolean]("recall_ok")) // id 1 is a true neighbor...
    assert(!l2.getAs[Boolean]("best_bounded")) // ...but the score lies
    // extras ride the served aggregate
    val ex = SelfAudit.topK(exact, exact, minHits = 1, "cos_sim",
        higherIsBetter = true,
        extras = Seq("all_pos_ok" -> bool_and(col("vec_id") > 0)))
      .head()
    assert(ex.getAs[Boolean]("all_pos_ok"))
  }

  test("batchTopK: per-query bounds and the hit floor flip on a broken batch serve") {
    val exact = Seq((0L, 10L, 0.9), (0L, 11L, 0.8),
                    (1L, 20L, 0.7), (1L, 21L, 0.6))
      .toDF("query_id", "vec_id", "cos_sim")
    val good = SelfAudit.batchTopK(exact, exact,
        auditQueryIds = Seq(0L, 1L), minHitsTotal = 3,
        simCol = "cos_sim", higherIsBetter = true)
      .head()
    assert(good.getAs[Long]("n_queries") == 2)
    assert(good.getAs[Long]("total_served") == 4)
    assert(good.getAs[Boolean]("recall_ok"))
    assert(good.getAs[Boolean]("best_bounded"))
    // decimal-accumulated exact optimum sum is order-free and exact
    assert(math.abs(good.getAs[Double]("exact_best_sum") - 1.6) < 1e-12)
    val broken = Seq((0L, 99L, 0.95), (1L, 98L, 0.1))
      .toDF("query_id", "vec_id", "cos_sim")
    val bad = SelfAudit.batchTopK(broken, exact,
        auditQueryIds = Seq(0L, 1L), minHitsTotal = 1,
        simCol = "cos_sim", higherIsBetter = true)
      .head()
    assert(!bad.getAs[Boolean]("recall_ok"))
    assert(!bad.getAs[Boolean]("best_bounded")) // query 0 fabricates 0.95 > 0.9
  }
}
