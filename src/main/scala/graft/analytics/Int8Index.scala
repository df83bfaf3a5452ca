package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.QueryDef

/** Persisted int8 serving index: the (vec_id, scale, q) quantized form
  * behind ss09/st13, computed ONCE offline and stored as parquet with
  * `q` as `array<tinyint>` — the scan then reads 1-byte codes instead
  * of 4-byte floats (the memory-bandwidth win the in-plan quantization
  * recomputes per query). Same offline-index contract as [[IvfIndex]]:
  * the dir key folds in a content stamp of the embeddings files, so a
  * regenerated dataset invalidates the index instead of silently
  * serving stale codes; queries quantize their own vector in-plan (one
  * row) and never retrain anything. */
object Int8Index {

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def indexDir(sfDir: String): String = {
    val key = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sfDir, 0x9747b28c))
    s"${sys.props("java.io.tmpdir")}/graft-int8-$key-${IvfIndex.contentStamp(sfDir)}-v1"
  }

  /** Build once per (dataset, content stamp); quantized values are in
    * [-127, 127] by construction, so the tinyint narrowing is lossless. */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val dir = indexDir(sfDir)
    built.computeIfAbsent(dir, { _ =>
      val done = new java.io.File(s"$dir/codes/_SUCCESS")
      if (!done.exists()) {
        Similarity.int8Quantized(QueryDef.table(spark, sfDir, "embeddings"))
          .select(col("vec_id"), col("__scale").as("scale"),
                  expr("transform(__q, x -> cast(x as tinyint))").as("q"))
          .write.mode("overwrite").parquet(s"$dir/codes")
      }
      dir
    })
  }

  /** The persisted codes in the (vec_id, __scale, __q) shape the int8
    * scoring path consumes. `__q` stays `array<tinyint>` — the scorer
    * ([[graft.functions.DotL]]) takes any integral element type and
    * widens each element to long INSIDE its compiled loop, so the
    * serve scan pays no per-element interpreted widen pass (the r15
    * `transform(q, cast(bigint))` form was one more HOF lambda per
    * element per corpus row — the r16 HOF audit retired it; identical
    * arithmetic, Java integral widening before the multiply). */
  def readCodes(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/codes")
      .select(col("vec_id"), col("scale").as("__scale"), col("q").as("__q"))

  /** INCREMENTAL maintenance: append newly-arrived vectors' codes to an
    * existing index dir. Sound for int8 codes specifically because each
    * vector's quantization depends on NOTHING but that vector (its own
    * norm and abs-max) — unlike IVF centroids or PQ codebooks, which are
    * corpus statistics and go stale under growth (those indexes rebuild
    * via the content stamp instead). Appending the delta is therefore
    * EXACTLY equal to rebuilding over the grown corpus, which is what
    * makes a continuously-fed serving tier affordable: per batch, write
    * codes for the batch, never rescan the corpus. Callers own dedup of
    * re-delivered vec_ids (the st11 membership discipline — or route
    * arrivals through the st10 ingest gate first). */
  def appendCodes(newVecs: org.apache.spark.sql.DataFrame, dir: String): Unit =
    Similarity.int8Quantized(newVecs)
      .select(col("vec_id"), col("__scale").as("scale"),
              expr("transform(__q, x -> cast(x as tinyint))").as("q"))
      .write.mode("append").parquet(s"$dir/codes")

  /** Tombstone DELETE — [[Tombstones]] parity with [[IvfIndex
    * .deleteIds]]: the takedown path of a continuously-fed int8
    * serving tier. Deleted ids land as an append-only side segment
    * (replay-idempotent batch stamps); serve through [[liveCodes]]. */
  def deleteIds(spark: SparkSession, dir: String, ids: DataFrame): Long =
    Tombstones.delete(spark, dir, ids)

  /** The serving view: persisted codes minus tombstoned ids (unhinted
    * anti-join — AQE decides, the tombstone set grows with deletion
    * history until a purge). */
  def liveCodes(spark: SparkSession, dir: String): DataFrame =
    readCodes(spark, dir)
      .join(Tombstones.read(spark, dir), Seq("vec_id"), "left_anti")

  /** Physically apply the tombstones: codes are per-vector (no
    * partition structure to preserve), so the purge is one filtered
    * staging rewrite of the codes dir, swapped in via [[StagedSwap]]'s
    * move-first protocol before the tombstone segment is cleared — a
    * crash at any point leaves the old codes, the rewritten ones, or a
    * transient old ∪ staged duplicate state (deleted rows still masked
    * by the intact tombstones; never a state where the codes exist
    * only in the reader-invisible staging dir), and replaying the
    * purge converges (staging recovery + the deduplicating rewrite).
    * Returns the number of rows dropped. */
  def purgeTombstones(spark: SparkSession, dir: String): Long = {
    val recovered =
      StagedSwap.recover(new java.io.File(dir), "purge").contains("codes")
    val tombs = Tombstones.read(spark, dir).persist()
    val masked =
      try spark.read.parquet(s"$dir/codes")
        .join(tombs, Seq("vec_id"), "left_semi").count()
      finally ()
    if (masked > 0L || recovered) {
      val codes = new java.io.File(s"$dir/codes")
      val tmp = StagedSwap.stagingFor(new java.io.File(dir), "purge", "codes")
      spark.read.parquet(codes.getPath)
        .join(tombs, Seq("vec_id"), "left_anti")
        .dropDuplicates("vec_id") // converges a crash-recovered duplicate dir
        .write.mode("overwrite").parquet(tmp.getPath)
      StagedSwap.swapIn(codes, tmp)
    }
    tombs.unpersist(false)
    Tombstones.clear(dir)
    masked
  }
}
