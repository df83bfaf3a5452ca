package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's ETL dataflow (`transform_data` + `insert_data`,
  * `harvard_artifacts_app.py:157-278`; SURVEY.md §2.2-2.3) re-expressed
  * as declarative Spark transforms.
  *
  * One cached parse of the raw API records fans out into the three
  * artifact tables (T6 vertical split); every per-row Python loop of the
  * reference becomes a codegen'd columnar expression, so the same logic
  * distributes across executors unchanged at 100 TB.
  */
object ArtifactEtl {

  /** T2 default-fill for strings: missing → '' (`:169-177`). */
  private def str(c: String): Column = coalesce(col(c), lit("")).as(c)

  /** T3 default-fill for ints: missing → 0 (`:186-189`). */
  private def int0(c: String): Column = coalesce(col(c), lit(0L)).as(c)

  /** T1+T2+T4+T5: raw API records → `artifactmetadata` rows
    * (`harvard_artifacts_app.py:167-180`). `description` is truncated to
    * 500 chars (T5, `:175`); `accessionyear` stays nullable (T4). */
  def toMetadata(raw: DataFrame): DataFrame =
    raw.select(
      col("id"),
      str("title"), str("culture"), str("period"), str("century"),
      str("medium"), str("dimensions"),
      substring(coalesce(col("description"), lit("")), 1, 500).as("description"),
      str("department"), str("classification"),
      col("accessionyear"),          // T4 nullable passthrough (`:178`)
      str("accessionmethod"))

  /** T1+T3+T4: raw API records → `artifactmedia` rows (`:183-191`). */
  def toMedia(raw: DataFrame): DataFrame =
    raw.select(
      col("id").as("objectid"),
      int0("imagecount"), int0("mediacount"), int0("colorcount"),
      int0("rank"),
      col("datebegin"), col("dateend")) // T4 nullable passthrough (`:190-191`)

  /** T7+T8: raw API records → `artifactcolors` rows (`:197-206`).
    * `slice(...,1,5)` + `explode` ≙ `for color in colors[:5]`; plain
    * explode (not explode_outer) matches "no colors ⇒ no child rows". */
  def toColors(raw: DataFrame): DataFrame =
    raw.select(col("id").as("objectid"), explode(slice(col("colors"), 1, 5)).as("c"))
      .select(
        col("objectid"),
        coalesce(col("c.spectrum"), lit("")).as("spectrum"),
        coalesce(col("c.hue"), lit("")).as("hue"),
        coalesce(col("c.color"), lit("")).as("color"),
        coalesce(col("c.percent"), lit(0.0)).as("percent"),
        coalesce(col("c.css3"), lit("")).as("css3"))

  /** T6 vertical split: one parsed batch → the three artifact tables.
    * Caller should `.cache()` `raw` first (≙ the reference's
    * session-state reuse, `:387`). */
  def transform(raw: DataFrame): (DataFrame, DataFrame, DataFrame) =
    (toMetadata(raw), toMedia(raw), toColors(raw))

  /** K3: NaN/±inf → NULL on all double columns, the reference's pre-sink
    * cleanse (`:226-233`). Must run before writes/aggregates — Spark
    * propagates NaN into avg where MySQL stored NULL (SURVEY.md §7.5.5). */
  def cleanseDoubles(df: DataFrame): DataFrame =
    df.schema.fields.filter(_.dataType == org.apache.spark.sql.types.DoubleType)
      .foldLeft(df) { (acc, f) =>
        acc.withColumn(f.name,
          when(isnan(col(f.name)) ||
               col(f.name) === Double.PositiveInfinity ||
               col(f.name) === Double.NegativeInfinity, lit(null))
            .otherwise(col(f.name)))
      }

  /** K2 within-batch half of INSERT IGNORE: deterministic keep-first
    * dedup by PK. MySQL keeps the first-arriving row (`:241`), so we rank
    * over an explicit arrival column instead of `dropDuplicates` (whose
    * survivor is partition-order dependent) — SURVEY.md §7.5.4. */
  def dedupKeepFirst(df: DataFrame, pk: String, arrival: Column): DataFrame =
    df.withColumn("__rn", row_number().over(
        Window.partitionBy(col(pk)).orderBy(arrival)))
      .filter(col("__rn") === 1)
      .drop("__rn")

  /** K2 cross-batch half of INSERT IGNORE: drop rows whose PK already
    * exists in the target (`:239-272`). Left-anti join — streams the new
    * batch against the existing keys; Catalyst broadcasts the small side. */
  def upsertIgnore(newRows: DataFrame, existing: DataFrame, pk: String): DataFrame =
    newRows.join(existing.select(pk), Seq(pk), "left_anti")
}
