package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.etl.ArtifactEtl

/** Parquet-backed artifact store: the reference's CREATE TABLE +
  * INSERT IGNORE load path (K1/K2, `harvard_artifacts_app.py:37-101,
  * 239-274`) as idempotent partitioned writes.
  *
  * Layout for 100 TB: the hub table partitions by `classification` —
  * the reference's universal ingest/filter axis
  * (`harvard_artifacts_app.py:122,367`) — so Q1/Q16-style equality
  * filters prune whole directories before a byte is read; satellites
  * stay unpartitioned (they're only reached via the `objectid` join,
  * which AQE plans as broadcast/shuffle-hash off the pruned hub).
  */
object ArtifactStore {

  /** Initial load (≙ K1 CREATE TABLE + first batch): PK-dedup the batch
    * and write partitioned. */
  def create(metadata: DataFrame, path: String): Unit =
    ArtifactEtl.dedupKeepFirst(metadata, "id", col("id"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("classification")
      .parquet(path)

  /** Idempotent re-ingest (≙ K2 INSERT IGNORE): within-batch keep-first
    * dedup, anti-join against the existing store's keys, append. The
    * anti-join reads only the `id` column of the store (column-pruned
    * scan), so a 100 TB store costs one narrow column scan per load. */
  def appendIgnore(spark: SparkSession, newRows: DataFrame, path: String): Unit = {
    val existing = spark.read.parquet(path)
    ArtifactEtl.upsertIgnore(
        ArtifactEtl.dedupKeepFirst(newRows, "id", col("id")), existing, "id")
      .write.mode(SaveMode.Append)
      .partitionBy("classification")
      .parquet(path)
  }

  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Small-files compaction: every `appendIgnore` lands one file set
    * per batch, and at 100 TB a store fed by thousands of incremental
    * loads degrades into millions of KB-scale files (open/seek-bound
    * scans, NameNode/listing pressure). Rewrites the store so each
    * partition holds ~`targetRowsPerFile` rows per file, preserving the
    * partition layout. Run off the hot path (the same slot nightly
    * OPTIMIZE jobs occupy elsewhere).
    *
    * Swap protocol (crash-safe; every step keeps at least one intact
    * copy and every intermediate state is mechanically repairable by
    * [[recoverCompaction]]):
    *   1. write staged copy to `path__compacting` (live untouched);
    *      the parquet committer's `_SUCCESS` marks it complete
    *   2. rename live → `path__old`   (live copy preserved under __old)
    *   3. rename staged → live        (complete copy becomes live)
    *   4. delete `__old`
    * Both renames are CHECKED: a failed step aborts (rolling back step 2
    * if needed) and throws, leaving the live store intact. Leftover
    * `__old`/`__compacting` dirs from a crashed run fail fast — run
    * [[recoverCompaction]] first. */
  def compact(spark: SparkSession, path: String,
              targetRowsPerFile: Int = 1000000): Unit = {
    val df = spark.read.parquet(path)
    val nRows = df.count()
    val nClasses = math.max(1,
      df.select("classification").distinct().count().toInt)
    // repartition on (classification, salt), NOT classification alone —
    // hashing only the partition column funnels each classification
    // into one task and one giant file regardless of target size. The
    // id-derived salt splits each class across ~filesPerClass writers.
    val filesPerClass = math.max(1,
      (nRows / targetRowsPerFile.toLong / nClasses).toInt + 1)
    val base = path.stripSuffix("/")
    // the path's OWN filesystem — FileSystem.get(conf) resolves
    // fs.defaultFS, which breaks whenever the store lives on a
    // different scheme than the cluster default
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(base + "__compacting")
    val old = new org.apache.hadoop.fs.Path(base + "__old")
    if (fs.exists(old) || fs.exists(staged))
      throw new IllegalStateException(
        s"leftover ${old} or ${staged} from an interrupted compaction — " +
        "run ArtifactStore.recoverCompaction first")
    df.withColumn("__salt", pmod(xxhash64(col("id")), lit(filesPerClass)))
      .repartition(nClasses * filesPerClass, col("classification"), col("__salt"))
      .drop("__salt")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("classification")
      .parquet(staged.toString)
    if (!fs.rename(live, old))
      throw new java.io.IOException(
        s"compact: rename $live -> $old failed; live store untouched")
    if (!fs.rename(staged, live)) {
      // roll the live copy back into place before surfacing the error
      fs.rename(old, live)
      throw new java.io.IOException(
        s"compact: rename $staged -> $live failed; live store restored")
    }
    // only now is the swap durable — discard the superseded copy
    fs.delete(old, true)
    // maintenance is when production statistics refresh (TableStats'
    // ingest-schedule contract): the same nightly OPTIMIZE slot that
    // compacted the store re-ANALYZEs it, so the CBO plans the next
    // day's queries under current row counts / NDVs instead of the
    // pre-compaction epoch's
    graft.analytics.TableStats.analyzePath(spark, "artifacts", path)
  }

  /** Repair an interrupted [[compact]]: inspects which of
    * live/`__old`/`__compacting` survive and restores the store to
    * exactly one intact live copy. Safe to call when no compaction was
    * in flight (no-op). Completeness of the staged copy is judged by
    * the parquet committer's `_SUCCESS` marker. */
  def recoverCompaction(spark: SparkSession, path: String): Unit = {
    val base = path.stripSuffix("/")
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val staged = new org.apache.hadoop.fs.Path(base + "__compacting")
    val old = new org.apache.hadoop.fs.Path(base + "__old")
    val stagedComplete = fs.exists(staged) &&
      fs.exists(new org.apache.hadoop.fs.Path(staged, "_SUCCESS"))
    if (fs.exists(live)) {
      // live survived: crash was before the swap (or after it completed
      // with a leftover __old) — the staged/old copies are redundant
      if (fs.exists(staged)) fs.delete(staged, true)
      if (fs.exists(old)) fs.delete(old, true)
    } else if (stagedComplete) {
      // crash between the two renames with a complete staged copy:
      // finish the swap
      if (!fs.rename(staged, live))
        throw new java.io.IOException(s"recover: rename $staged -> $live failed")
      if (fs.exists(old)) fs.delete(old, true)
    } else if (fs.exists(old)) {
      // staged incomplete (or absent): restore the pre-compaction copy
      if (!fs.rename(old, live))
        throw new java.io.IOException(s"recover: rename $old -> $live failed")
      if (fs.exists(staged)) fs.delete(staged, true)
    } else if (fs.exists(staged)) {
      // nothing else survives; an incomplete staged copy is better than
      // no store at all only if it has data — refuse silently restoring
      // a torn write
      throw new IllegalStateException(
        s"recover: only an incomplete staged copy remains at $staged — " +
        "manual inspection required")
    }
  }
}
