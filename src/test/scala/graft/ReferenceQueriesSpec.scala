package graft

import org.apache.spark.sql.{DataFrame, Row}

import graft.model.ArtifactSchemas
import graft.queries.ReferenceQueries

/** Golden replay of the reference's 20 query templates
  * (`harvard_artifacts_app.py:289-313`) against seeded artifact-shaped
  * fixtures whose values cover every literal the templates use
  * (FIXTURES.md §A.2). */
class ReferenceQueriesSpec extends SparkSpec {

  private def meta(id: Long, title: String, culture: String, period: String,
                   century: String, dept: String, cls: String, year: Any) =
    Row(id, title, culture, period, century, "Gold", "2cm", "desc", dept, cls,
        year.asInstanceOf[Any] match { case null => null; case y => y }, "Bequest")

  private lazy val metadata: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      meta(1, "Solidus", "Byzantine", "Early Byzantine", "11th century", "Numis", "Coins", 1951L),
      meta(2, "Tetradrachm", "Greek", "Archaic period", "6th century BCE", "Numis", "Coins", 1920L),
      meta(3, "Amphora", "", "Late Archaic", "5th century BCE", "Classics", "Vessels", null),
      meta(4, "Portrait", "Dutch", "Golden Age", "17th century", "Paintings", "Paintings", 1980L),
      meta(5, "Icon", "Byzantine", null, "12th century", "Paintings", "Paintings", 2001L)
    )), ArtifactSchemas.metadataSchema)

  //            objectid, imagecount, mediacount, colorcount, rank, datebegin, dateend
  private lazy val media: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, 2L, 1L, 6L, 5L, 527L, 565L),
      Row(2L, 0L, 0L, 0L, 9L, -520L, -500L),
      Row(3L, 5L, 2L, 1L, 200L, 1550L, 1560L),
      Row(4L, 1L, 3L, 2L, 10L, 1640L, 1650L),
      Row(5L, 3L, 0L, 4L, null, 1100L, 1150L)
    )), ArtifactSchemas.mediaSchema)

  private lazy val colors: DataFrame = spark.createDataFrame(
    spark.sparkContext.parallelize(Seq(
      Row(1L, "#8c7b62", "Grey", "#967d5a", 0.41, "#696969"),
      Row(1L, "#5e4b3c", "Brown", "#6b5b4f", 0.18, "#8b7355"),
      Row(2L, "#aaaaaa", "Grey", "#bbbbbb", 0.70, "#d3d3d3"),
      Row(4L, "#112233", "Blue", "#223344", 0.55, "#000080"),
      Row(5L, "#eeeeee", "White", "#ffffff", 0.90, "#ffffff")
    )), ArtifactSchemas.colorsSchema)

  private def run(n: String): DataFrame =
    ReferenceQueries.run(spark, n, metadata, media, colors,
                         deterministicLimits = true)

  test("Q1: century+culture equality conjunction") {
    assert(run("1").collect().map(_.getAs[Long]("id")).toSeq == Seq(1L))
  }

  test("Q2: DISTINCT culture excludes NULL and ''") {
    assert(run("2").collect().map(_.getString(0)).toSet ==
      Set("Byzantine", "Greek", "Dutch"))
  }

  test("Q3: LIKE %Archaic% matches mid-string") {
    assert(run("3").collect().map(_.getAs[Long]("id")).toSet == Set(2L, 3L))
  }

  test("Q4: top-k by accessionyear DESC drops NULLs") {
    val ys = run("4").collect().map(_.getAs[Long]("accessionyear")).toSeq
    assert(ys == Seq(2001L, 1980L, 1951L, 1920L))
  }

  test("Q5: group-count by department") {
    val m = run("5").collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("Numis" -> 2L, "Classics" -> 1L, "Paintings" -> 2L))
  }

  test("Q6: join + imagecount > 1") {
    assert(run("6").collect().map(_.getString(0)).toSet ==
      Set("Solidus", "Amphora", "Icon"))
  }

  test("Q7: global AVG(rank) ignores NULL") {
    assert(run("7").head().getDouble(0) == (5 + 9 + 200 + 10) / 4.0)
  }

  test("Q8: colorcount > mediacount column-vs-column") {
    assert(run("8").collect().map(_.getString(0)).toSet == Set("Solidus", "Icon"))
  }

  test("Q9: datebegin BETWEEN 1500 AND 1600") {
    assert(run("9").collect().map(_.getString(0)).toSeq == Seq("Amphora"))
  }

  test("Q10: count mediacount = 0") {
    assert(run("10").head().getLong(0) == 2L)
  }

  test("Q11: DISTINCT hue") {
    assert(run("11").collect().map(_.getString(0)).toSet ==
      Set("Grey", "Brown", "Blue", "White"))
  }

  test("Q12: color frequency top-5") {
    val rows = run("12").collect()
    assert(rows.length == 5 && rows.forall(_.getLong(1) == 1L))
  }

  test("Q13: AVG(percent) by hue") {
    val m = run("13").collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(m("Grey") - (0.41 + 0.70) / 2) < 1e-12)
  }

  test("Q14/Q18: unqualified objectid resolves like MySQL; twins agree") {
    val a = run("14").collect().map(_.getString(0)).sorted.toSeq
    val b = run("18").collect().map(_.getString(0)).sorted.toSeq
    assert(a == b && a == Seq("Amphora", "Portrait", "Solidus", "Tetradrachm"))
  }

  test("Q15: COUNT(*) colors") {
    assert(run("15").head().getLong(0) == 5L)
  }

  test("Q16: Byzantine 1:N join multiplies rows") {
    assert(run("16").count() == 3) // Solidus×2 colors + Icon×1
  }

  test("Q17: full sort by title") {
    val titles = run("17").collect().map(_.getString(0)).toSeq
    assert(titles == titles.sorted)
  }

  test("Q19: 3-way join + DISTINCT + rank <= 10 + hue Grey") {
    assert(run("19").collect().map(_.getString(0)).toSet ==
      Set("Solidus", "Tetradrachm"))
  }

  test("Q20: classification count + avg media, ordered") {
    val rows = run("20").collect()
    val m = rows.map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(m("Coins") == ((2L, 0.5)) && m("Paintings") == ((2L, 1.5)))
    assert(rows.map(_.getLong(1)).toSeq == rows.map(_.getLong(1)).toSeq.sorted.reverse)
  }

  test("auto-chart payload shaping (K5)") {
    val p = ReferenceQueries.chartPayload(run("5"))
    assert(p.isDefined && p.get.columns.length == 2 && p.get.count() <= 10)
    assert(ReferenceQueries.chartPayload(run("2")).isEmpty) // 1 column → no chart
  }
}
