package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named query of the engine's public surface.
  *
  * @param name   stable key used by the driver (`SparkEntry.queries`)
  * @param df     DataFrame program; `sfDir` points at a directory of
  *               parquet tables (`/root/testdata/sf*`)
  * @param oracle equivalent ANSI SQL runnable by DuckDB over the same
  *               parquet tables; None for non-SQL-expressible operators
  *               (driver then records a weaker rows-only check)
  */
final case class QueryDef(
    name: String,
    df: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object QueryDef {
  /** Load one of the driver test tables. Plain parquet scan: Catalyst
    * pushes filters + prunes columns into this scan for free. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") eventsTable(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** `events.parquet` stores TIMESTAMP(NANOS), which Spark's Parquet
    * reader rejects (Spark time is µs). Read nanos as long and floor to
    * µs — the same truncation DuckDB applies casting TIMESTAMP_NS →
    * TIMESTAMP, keeping both engines on identical instants. */
  def eventsTable(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    // driver data is TIMESTAMP(NANOS) (surfaces as long under the legacy
    // conf); derived copies (scale-probe replicas, landing dirs) may
    // already carry a real µs timestamp — convert only the former
    if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
      raw.withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
    else raw
  }
}
