package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded time-range (interval) join: every (left, right) pair with the
  * same key whose right timestamp falls in `[leftTs + lo, leftTs + hi)`
  * — "all clicks in the hour before each error", the join behind
  * feature windows, attribution lookbacks, and burst/correlation
  * analysis over event logs.
  *
  * Spark compiles a raw inequality join either to a broadcast
  * nested-loop (driver OOM once the small side isn't small) or, with an
  * equi-key, to a per-key cross product filtered afterwards — per-key
  * quadratic, unbounded by the time window. The scalable formulation is
  * the classic bucketed rewrite:
  *
  *  1. width W = hi − lo (the interval length), timestamps as epoch µs;
  *  2. each RIGHT row keys to its single bucket `rt div W`;
  *  3. each LEFT row's window `[lt+lo, lt+hi)` has length exactly W, so
  *     it overlaps AT MOST TWO buckets — explode left to those (1 or 2)
  *     bucket ids;
  *  4. equi-join on (key, bucket) — a plain shuffle join Catalyst can
  *     plan as SMJ/SHJ with AQE skew handling — then the exact residual
  *     `rt ∈ [lt+lo, lt+hi)`.
  *
  * Cost: ≤ 2× replication of the left side, one shuffle on (key,
  * bucket), matching-pair-linear output — never a per-key cross
  * product. A left interval's two buckets are distinct and a right row
  * has one bucket, so no pair can match twice (no dedup pass). At
  * 100 TB the shuffle partitions by (key, W-bucket), which also bounds
  * skew: a hot key spreads over its time range instead of landing in
  * one task.
  */
object RangeJoin {

  /** Inner bounded-range join; returns all left columns plus
    * `rightPayload` columns (right side must pre-rename clashes).
    *
    * @param key     equi-join key column name (both sides)
    * @param leftTs  event-time column on `left` (timestamp type)
    * @param rightTs event-time column on `right` (timestamp type)
    * @param loUs    window start offset in µs relative to leftTs
    *                (inclusive; negative = lookback)
    * @param hiUs    window end offset in µs relative to leftTs
    *                (exclusive); must be > loUs
    */
  def rangeJoin(left: DataFrame, right: DataFrame, key: String,
                leftTs: String, rightTs: String,
                loUs: Long, hiUs: Long,
                rightPayload: Seq[String]): DataFrame = {
    require(hiUs > loUs, s"empty window: [$loUs, $hiUs)")
    val w = hiUs - loUs
    // floor division via pmod (`div` alone truncates toward zero, which
    // mis-buckets pre-1970 timestamps; pmod is non-negative, so
    // subtracting it lands exactly on the bucket boundary)
    def bucket(a: String) = expr(s"(($a) - pmod($a, ${w}L)) div ${w}L")
    val l = left
      .withColumn("__lt", unix_micros(col(leftTs)))
      .withColumn("__b0", bucket(s"__lt + (${loUs}L)"))
      .withColumn("__b1", bucket(s"__lt + (${hiUs}L) - 1"))
      .withColumn("__b", explode(
        when(col("__b0") === col("__b1"), array(col("__b0")))
          .otherwise(array(col("__b0"), col("__b1")))))
      .drop("__b0", "__b1")
    val r = right
      .withColumn("__rt", unix_micros(col(rightTs)))
      .withColumn("__b", bucket("__rt"))
      .select((Seq(col(key), col("__b"), col("__rt")) ++
        rightPayload.map(col)): _*)
    l.join(r, Seq(key, "__b"))
      .filter(col("__rt") >= col("__lt") + lit(loUs) &&
              col("__rt") < col("__lt") + lit(hiUs))
      .drop("__b", "__lt", "__rt")
  }
}
