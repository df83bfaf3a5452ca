package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** In-plan self-validation for APPROXIMATE serving entries — the x16
  * discipline (sketch result checked against in-plan exact bounds)
  * generalized to the ANN/LSH/bloom serving tier.
  *
  * An approximate serve (IVF probe, LSH bucket scan, PQ shortlist…)
  * cannot be replayed by a SQL oracle: WHICH rows it returns depends on
  * learned index state. What CAN be oracle-checked is the audit the
  * serve carries with it: the same plan computes the exact answer
  * (whole-corpus for single-query serves, a deterministic embedded
  * query subset for batch serves), measures the serve against it, and
  * emits only deterministic scalars — counts the oracle derives from
  * the data, exact-side values the oracle recomputes, and booleans
  * (recall floor met, served scores bounded by the exact optimum) the
  * oracle asserts as `true`. A serving regression (bad centroids,
  * broken probe pruning, masked rows leaking) flips a boolean and the
  * driver's hash compare goes red — the entry is both a real serve of
  * the approximate path and a hash-checkable correctness row.
  *
  * Floors are deliberately LOOSE collapse detectors (a real break
  * yields ~0 hits); the tight measured floors live in the specs
  * (DedupSpec et al.) where the fixture is pinned. Cost discipline:
  * each serve/exact frame is k rows — materialized once via eager
  * `localCheckpoint` (the dq05 recipe) so the audit never re-runs the
  * probe or the exact scan.
  */
object SelfAudit {

  /** Materialize a small (≤ k·queries rows) frame exactly once; every
    * audit aggregate derives from the materialization, not the lineage. */
  def once(df: DataFrame): DataFrame = df.localCheckpoint(true)

  /** Audit a single-query top-k serve against the in-plan exact top-k.
    *
    * Output: `n_served` (deterministic k), `exact_best` (the exact
    * optimum score — oracle recomputes it), `recall_ok`
    * (|serve ∩ exact| ≥ minHits), `best_bounded` (the serve's best
    * score never beats the exact optimum — a serve that "wins" is
    * fabricating scores), plus any `extras` (name → aggregate over the
    * served rows; each must be deterministically `true`/a constant for
    * the oracle).
    */
  def topK(served: DataFrame, exact: DataFrame, minHits: Int,
           simCol: String, higherIsBetter: Boolean,
           idCol: String = "vec_id",
           extras: Seq[(String, Column)] = Nil): DataFrame = {
    val s = once(served)
    val e = once(exact)
    def best(c: Column): Column = if (higherIsBetter) max(c) else min(c)
    val sAggCols = Seq(best(col(simCol)).as("__served_best")) ++
      extras.map { case (n, c) => c.as(n) }
    val sAgg = s.agg(count(lit(1)).as("n_served"), sAggCols: _*)
    val eAgg = e.agg(best(col(simCol)).as("exact_best"))
    val hits = s.select(idCol).join(e.select(idCol), Seq(idCol), "left_semi")
      .agg(count(lit(1)).as("__hits"))
    val bounded =
      if (higherIsBetter) col("__served_best") <= col("exact_best") + lit(1e-9)
      else col("__served_best") >= col("exact_best") - lit(1e-9)
    sAgg.crossJoin(eAgg).crossJoin(hits)
      .select(Seq(col("n_served"), col("exact_best"),
                  (col("__hits") >= minHits).as("recall_ok"),
                  bounded.as("best_bounded")) ++
              extras.map { case (n, _) => col(n) }: _*)
  }

  /** Audit a batch top-k serve on a deterministic SUBSET of its
    * queries (full exact recall on every query would re-run the
    * brute-force anchor inside the serving entry — the subset keeps the
    * audit a bounded fraction of the serve).
    *
    * Output: `n_queries`/`total_served` (deterministic), `exact_best_sum`
    * (decimal-accumulated sum of the audited queries' exact optima —
    * order-free, oracle recomputes it), `recall_ok` (total hits across
    * audited queries ≥ minHitsTotal), `best_bounded` (per audited
    * query, served best never beats the exact optimum). */
  def batchTopK(served: DataFrame, exactAudit: DataFrame,
                auditQueryIds: Seq[Long], minHitsTotal: Int,
                simCol: String, higherIsBetter: Boolean): DataFrame = {
    val s = once(served)
    val e = once(exactAudit)
    def best(c: Column): Column = if (higherIsBetter) max(c) else min(c)
    val sAud = s.filter(col("query_id").isin(auditQueryIds.map(Long.box): _*))
    val nAgg = s.agg(countDistinct(col("query_id")).as("n_queries"),
                     count(lit(1)).as("total_served"))
    val eBest = e.groupBy("query_id").agg(best(col(simCol)).as("__eb"))
    val eAgg = eBest.agg(
      sum(col("__eb").cast("decimal(20,6)")).cast("double")
        .as("exact_best_sum"))
    val hits = sAud.select("query_id", "vec_id")
      .join(e.select("query_id", "vec_id"),
            Seq("query_id", "vec_id"), "left_semi")
      .agg(count(lit(1)).as("__hits"))
    val bAgg = sAud.groupBy("query_id").agg(best(col(simCol)).as("__sb"))
      .join(eBest, Seq("query_id"))
      .agg(bool_and(
        if (higherIsBetter) col("__sb") <= col("__eb") + lit(1e-9)
        else col("__sb") >= col("__eb") - lit(1e-9)).as("best_bounded"))
    nAgg.crossJoin(eAgg).crossJoin(hits).crossJoin(bAgg)
      .select(col("n_queries"), col("total_served"), col("exact_best_sum"),
              (col("__hits") >= minHitsTotal).as("recall_ok"),
              col("best_bounded"))
  }
}
