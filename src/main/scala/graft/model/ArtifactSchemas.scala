package graft.model

import org.apache.spark.sql.types._

/** Explicit schemas for the reference's data model (SURVEY.md §1;
  * reference DDL at `harvard_artifacts_app.py:53-97`, raw API shape at
  * `:108-206`).
  *
  * Ids are `LongType` rather than the reference's 32-bit INT — at the
  * 100 TB design point object ids outgrow 2^31 (SURVEY.md §1.2).
  */
object ArtifactSchemas {

  /** Raw Harvard-API `/object` record — only the fields the reference's
    * `transform_data` consumes (`harvard_artifacts_app.py:167-206`),
    * schema-on-read: unknown fields are dropped by the projection. */
  val rawApiSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType),
    StructField("culture", StringType),
    StructField("period", StringType),
    StructField("century", StringType),
    StructField("medium", StringType),
    StructField("dimensions", StringType),
    StructField("description", StringType),
    StructField("department", StringType),
    StructField("classification", StringType),
    StructField("accessionyear", LongType),
    StructField("accessionmethod", StringType),
    StructField("imagecount", LongType),
    StructField("mediacount", LongType),
    StructField("colorcount", LongType),
    StructField("rank", LongType),
    StructField("datebegin", LongType),
    StructField("dateend", LongType),
    StructField("colors", ArrayType(StructType(Seq(
      StructField("spectrum", StringType),
      StructField("hue", StringType),
      StructField("color", StringType),
      StructField("percent", DoubleType),
      StructField("css3", StringType)
    ))))
  ))

  /** `artifactmetadata` (`harvard_artifacts_app.py:53-68`): hub table,
    * PK `id`. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("title", StringType),
    StructField("culture", StringType),
    StructField("period", StringType),
    StructField("century", StringType),
    StructField("medium", StringType),
    StructField("dimensions", StringType),
    StructField("description", StringType),
    StructField("department", StringType),
    StructField("classification", StringType),
    StructField("accessionyear", LongType),
    StructField("accessionmethod", StringType)
  ))

  /** `artifactmedia` (`harvard_artifacts_app.py:72-83`): 1:1 satellite,
    * FK `objectid`. */
  val mediaSchema: StructType = StructType(Seq(
    StructField("objectid", LongType, nullable = false),
    StructField("imagecount", LongType),
    StructField("mediacount", LongType),
    StructField("colorcount", LongType),
    StructField("rank", LongType),
    StructField("datebegin", LongType),
    StructField("dateend", LongType)
  ))

  /** `artifactcolors` (`harvard_artifacts_app.py:87-97`): 1:N child
    * (≤5 rows per object after the ETL slice), FK `objectid`. */
  val colorsSchema: StructType = StructType(Seq(
    StructField("objectid", LongType, nullable = false),
    StructField("spectrum", StringType),
    StructField("hue", StringType),
    StructField("color", StringType),
    StructField("percent", DoubleType),
    StructField("css3", StringType)
  ))
}
