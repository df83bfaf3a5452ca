package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions.call_function

/** Spark's own runtime-filter bloom expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain`), surfaced as
  * session functions. Catalyst ships them for its internal
  * InjectRuntimeFilter rewrite but does not register them in the
  * public function registry; the engine's incremental ingest gate
  * (id02) wants exactly these semantics — build a fixed-size filter
  * over corpus gram hashes IN-PLAN (distributed aggregate, no driver
  * loop), then probe it as a codegen'd predicate — so we register the
  * stock expressions rather than re-implement the sketch.
  *
  * Contract notes (mirroring InjectRuntimeFilter's canonical use):
  * the inserted/probed value must be the SAME `xxhash64` of the item
  * on both sides, and the probe-side filter argument must be foldable
  * (a literal) — the offline-built filter bytes are embedded as a
  * literal, the in-plan equivalent of broadcasting the filter.
  */
object BloomFns {
  val aggName = "bloom_agg"
  val containsName = "bloom_might_contain"

  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      aggName,
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      containsName,
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }

  /** `bloom_agg(xxhash64(item), estItems, numBits) → binary` — one
    * serialized bloom filter over all input rows (partial-aggregated:
    * executors build local filters, merge is a bit-OR). */
  def bloomAgg(spark: SparkSession, hashed: Column,
               estItems: Column, numBits: Column): Column = {
    register(spark)
    call_function(aggName, hashed, estItems, numBits)
  }

  /** `bloom_might_contain(filterBytes, xxhash64(item)) → boolean` —
    * never false for an inserted item (no false negatives); false
    * positives at the filter's configured rate. */
  def bloomContains(spark: SparkSession, filter: Column,
                    hashed: Column): Column = {
    register(spark)
    call_function(containsName, filter, hashed)
  }
}
