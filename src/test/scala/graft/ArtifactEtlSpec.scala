package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.etl.ArtifactEtl
import graft.model.ArtifactSchemas

/** ETL operator semantics (SURVEY.md §2.2-2.3) on the FIXTURES.md §A.1
  * edge cases: missing keys → defaults, truncation, color slice cap,
  * no-colors → no child rows, NaN/inf cleanse, INSERT-IGNORE dedup. */
class ArtifactEtlSpec extends SparkSpec {

  private def color(hue: String, pct: Double) = Row("#8c7b62", hue, "#967d5a", pct, "#8b7355")

  private lazy val raw = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      // fully populated, 7 colors (must slice to 5), >500-char description
      Row(1L, "Gold Solidus", "Byzantine", "Early Byzantine period", "11th century",
          "Gold", "2.1 cm", "x" * 600, "Numismatics", "Coins", 1951L, "Bequest",
          2L, 1L, 6L, 104227L, 527L, 565L,
          (1 to 7).map(i => color(s"Hue$i", i / 10.0))),
      // all optional fields missing/null, no colors array
      Row(2L, null, null, null, null, null, null, null, null, null, null, null,
          null, null, null, null, null, null, null),
      // empty colors array; empty-string culture (distinct from NULL, §7.5.6)
      Row(3L, "Amphora", "", "Archaic", "6th century BCE", "Clay", null, "desc",
          "Classics", "Vessels", 1900L, "Purchase", 0L, 0L, 0L, 5L, -600L, -580L,
          Seq.empty[Row])
    )), ArtifactSchemas.rawApiSchema)

  test("T1/T2/T5: metadata projection, default-fill, truncation") {
    val m = ArtifactEtl.toMetadata(raw).orderBy("id").collect()
    assert(m.length == 3)
    assert(m(0).getAs[String]("description").length == 500) // T5 cap
    assert(m(1).getAs[String]("title") == "")               // T2 missing → ''
    assert(m(1).isNullAt(m(1).fieldIndex("accessionyear"))) // T4 nullable kept
    assert(m(2).getAs[String]("culture") == "")             // '' preserved, not NULL
  }

  test("T3: media int default-fill to 0, nullable date passthrough") {
    val a = ArtifactEtl.toMedia(raw).orderBy("objectid").collect()
    assert(a(1).getAs[Long]("imagecount") == 0L)            // T3 missing → 0
    assert(a(1).isNullAt(a(1).fieldIndex("datebegin")))     // T4 stays null
    assert(a(0).getAs[Long]("rank") == 104227L)
  }

  test("T7: colors slice to 5, no/empty colors yield no child rows") {
    val c = ArtifactEtl.toColors(raw)
    val byId = c.groupBy("objectid").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId(1L) == 5L)        // 7 colors sliced to 5
    assert(!byId.contains(2L))    // missing colors key → no rows
    assert(!byId.contains(3L))    // empty colors array → no rows
  }

  test("K3: NaN/±inf normalize to NULL") {
    import spark.implicits._
    val df = Seq(1.0, Double.NaN, Double.PositiveInfinity,
                 Double.NegativeInfinity).toDF("percent")
    val cleaned = ArtifactEtl.cleanseDoubles(df)
    assert(cleaned.filter(col("percent").isNull).count() == 3)
    assert(cleaned.filter(isnan(col("percent"))).count() == 0)
  }

  test("K2: within-batch keep-first + cross-batch upsert-ignore") {
    import spark.implicits._
    val batch = Seq((1L, "first", 1L), (1L, "second", 2L), (2L, "only", 3L))
      .toDF("id", "payload", "arrival")
    val deduped = ArtifactEtl.dedupKeepFirst(batch, "id", col("arrival"))
    assert(deduped.count() == 2)
    assert(deduped.filter(col("id") === 1L).head().getAs[String]("payload") == "first")

    val existing = Seq((2L, "already-there")).toDF("id", "payload")
    val appended = ArtifactEtl.upsertIgnore(deduped, existing, "id")
    assert(appended.select("id").as[Long].collect().toSet == Set(1L)) // id=2 dropped
  }
}
