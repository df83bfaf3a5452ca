package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout: pre-shuffles a table ONCE at write time so
  * every future equi-join/aggregation on the bucket key runs
  * shuffle-free — the 100 TB answer to "this join repeats every run".
  *
  * Both sides bucketed on the join key with the same bucket count ⇒
  * SortMergeJoin with zero Exchange; one side bucketed ⇒ only the other
  * side shuffles (both asserted in `ScaleOpsSpec`).
  */
object BucketedStore {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
