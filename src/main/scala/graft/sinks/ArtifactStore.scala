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
    * The rewrite stages into a sibling dir then swaps, so a failed
    * compaction never destroys the live store. */
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
    val staged = path.stripSuffix("/") + "__compacting"
    df.withColumn("__salt", pmod(xxhash64(col("id")), lit(filesPerClass)))
      .repartition(nClasses * filesPerClass, col("classification"), col("__salt"))
      .drop("__salt")
      .write.mode(SaveMode.Overwrite)
      .partitionBy("classification")
      .parquet(staged)
    // the path's OWN filesystem — FileSystem.get(conf) resolves
    // fs.defaultFS, which breaks whenever the store lives on a
    // different scheme than the cluster default
    val live = new org.apache.hadoop.fs.Path(path)
    val fs = live.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = new org.apache.hadoop.fs.Path(path.stripSuffix("/") + "__old")
    fs.rename(live, old)
    fs.rename(new org.apache.hadoop.fs.Path(staged), live)
    fs.delete(old, true)
  }
}
