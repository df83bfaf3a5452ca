package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.analytics.{BpeTokenizer, CurationPipeline, DataMix, DataQuality, Dedup, FrequentItems, GraphOps, Multimodal, Quantiles, Similarity, TextAnalysis}
import graft.queries._
import graft.streaming.StreamShapes

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The engine's public query surface is assembled from per-module
  * registries; each [[graft.queries.QueryDef]] pairs a Spark DataFrame
  * program with the ANSI-SQL oracle the driver replays in DuckDB.
  */
object SparkEntry {

  /** Full registry: reference relational surface (SURVEY.md §2.4),
    * relational extensions, ETL operators (§2.2-2.3), and the
    * LLM-pipeline analytics modules. */
  def registry: Seq[QueryDef] =
    Relational.all ++ Relational.extensions ++ ScaleExtensions.all ++
      EtlOps.all ++ TextAnalysis.all ++ Dedup.all ++ Similarity.all ++
      Multimodal.all ++ StreamShapes.all ++ DataMix.all ++ DataQuality.all ++
      CurationPipeline.all ++ BpeTokenizer.all ++ FrequentItems.all ++
      Quantiles.all ++ GraphOps.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Join + group + multi-aggregate (reference Q20 shape). */
  def entry(spark: SparkSession): DataFrame =
    Relational.all.find(_.name == "q20_join_group_multiagg").get
      .df(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.df).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}
