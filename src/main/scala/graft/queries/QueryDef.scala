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
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("ts", org.apache.spark.sql.functions.expr(
        "timestamp_micros(ts div 1000)"))
  }
}
