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
}
