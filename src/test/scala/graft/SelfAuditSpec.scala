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

  test("topKSliced: honest serve dominates the slice; a collapsed serve flips the boolean") {
    // slice scores: ten rows, best 0.90 descending by 0.05
    val slice = (1L to 10L).map(i => (i, 0.95 - 0.05 * i))
      .toDF("vec_id", "cos_sim")
    // honest serve: its best (0.93) beats every slice row → beaten 0
    val good = SelfAudit.topKSliced(
        Seq((100L, 0.93), (101L, 0.80)).toDF("vec_id", "cos_sim"),
        slice, "cos_sim", higherIsBetter = true, beatCap = 2)
      .head()
    assert(good.getAs[Long]("n_served") == 2)
    assert(math.abs(good.getAs[Double]("exact_best_slice") - 0.90) < 1e-9)
    assert(good.getAs[Boolean]("slice_dominated_ok"))
    // near-optimal serve: best 0.82 — beaten by 0.90 and 0.85 only,
    // within the cap (the ≥1-top-k-hit bound in the scaladoc)
    val near = SelfAudit.topKSliced(
        Seq((102L, 0.82)).toDF("vec_id", "cos_sim"),
        slice, "cos_sim", higherIsBetter = true, beatCap = 2)
      .head()
    assert(near.getAs[Boolean]("slice_dominated_ok"))
    // collapsed serve (broken bucket join → mediocre rows): most of
    // the slice beats its best → the boolean flips
    val bad = SelfAudit.topKSliced(
        Seq((103L, 0.47)).toDF("vec_id", "cos_sim"),
        slice, "cos_sim", higherIsBetter = true, beatCap = 2)
      .head()
    assert(!bad.getAs[Boolean]("slice_dominated_ok"))
    // lower-is-better direction (the PQ-metric serves)
    val sliceL2 = (1L to 5L).map(i => (i, 0.1 * i)).toDF("vec_id", "l2_dist")
    val goodL2 = SelfAudit.topKSliced(
        Seq((100L, 0.05)).toDF("vec_id", "l2_dist"),
        sliceL2, "l2_dist", higherIsBetter = false, beatCap = 0)
      .head()
    assert(goodL2.getAs[Boolean]("slice_dominated_ok"))
    assert(math.abs(goodL2.getAs[Double]("exact_best_slice") - 0.1) < 1e-9)
    val badL2 = SelfAudit.topKSliced(
        Seq((100L, 0.45)).toDF("vec_id", "l2_dist"),
        sliceL2, "l2_dist", higherIsBetter = false, beatCap = 2)
      .head()
    assert(!badL2.getAs[Boolean]("slice_dominated_ok"))
    // extras ride the served aggregate (the takedown invariant seat)
    val ex = SelfAudit.topKSliced(
        Seq((100L, 0.93), (101L, 0.80)).toDF("vec_id", "cos_sim"),
        slice, "cos_sim", higherIsBetter = true,
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
