package graft.analytics

import org.apache.spark.sql.DataFrame

/** Input-size-derived parallelism for expensive MAP passes over tiny
  * frames (r17).
  *
  * The driver fixtures ship each table as ONE parquet file with ONE
  * row group, and parquet cannot split below row-group granularity —
  * so a base-table scan (or a broadcast join built on one) is exactly
  * one task, and an expensive projection chained on it (BPE unit
  * tokenization, shingle+MinHash) serializes on one core while the
  * rest idle.
  *
  * [[forMapPass]] widens such a frame with a round-robin exchange
  * ONLY when the optimizer's size estimate proves the shuffle
  * trivial: total bytes below parallelism × 4 MB (i.e. the exchange
  * moves at most ~one scan split per core). At production scale the
  * estimate is far above the bound and the call is the identity — no
  * large corpus is ever repartitioned by this helper; a real corpus
  * arrives in many splits and never needs it. The decision input is
  * the plan's own statistics (driver-side, no job).
  *
  * Measured discipline (r17): this helper pays off when the widened
  * pass feeds AGGREGATION (cp07's per-unit deep+prefix BPE
  * tokenization: 5.84 → 4.84 s) and is a wash or a regression when it
  * feeds a JOIN whose strategy then flips on the changed estimates
  * (dd03 flat; dd04's gram self-join 1.2 → 14 s — both reverted).
  * Apply only at aggregation-downstream sites, with an A/B number.
  *
  * Caller contract: downstream must be ORDER-INSENSITIVE (per-row
  * projections, set/count/max aggregates) — round-robin changes row
  * order. Spark's sort-before-repartition (on by default) keeps the
  * assignment deterministic under task retry.
  */
private[graft] object ScanSpread {
  def forMapPass(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val plan = df.queryExecution.optimizedPlan
    val bytes = plan.stats.sizeInBytes
    // a scan that already arrives in >= p/2 files parallelizes by
    // itself — spreading it is a pure extra exchange (measured at the
    // staged sf1 corpus, whose tables land as 32 part files: tok04
    // 1.39 -> 1.95 s, bp01 4.56 -> 5.84 s before this clause). Count
    // the leaf files of every file-sourced relation under the frame;
    // driver-side metadata, already listed by the scan.
    val leafFiles = plan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.inputFiles.length
          case _ => 0
        }
    }.sum
    // retry determinism of round-robin repartition relies on Spark's
    // sort-before-repartition (on by default, SPARK-23207); a session
    // that disabled it (e.g. via the AB-conf seam) loses that guarantee
    // — fall back to identity rather than trade correctness for spread
    val sortedRepartition = spark.conf
      .get("spark.sql.execution.sortBeforeRepartition", "true").toBoolean
    if (sortedRepartition &&
        bytes < BigInt(p.toLong) * 4L * 1024 * 1024 && leafFiles < p / 2)
      df.repartition(p)
    else df
  }
}
