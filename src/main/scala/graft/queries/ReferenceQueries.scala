package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The reference's 20 analytics query templates
  * (`harvard_artifacts_app.py:289-313`) replayed verbatim-semantics over
  * the artifact tables as Spark SQL. The reference ships these to a
  * remote MySQL engine; here parse→analyze→optimize→execute all run
  * in-process through Catalyst (SURVEY.md §3 E3).
  *
  * Dialect deltas from MySQL (SURVEY.md §7.5): backtick-quoted `rank`
  * is a plain identifier in Spark SQL; string comparison is
  * case-sensitive (documented divergence — reference data is
  * API-canonical); AVG over integers yields DOUBLE, not DECIMAL.
  *
  * Queries 6/8/9/16 carry the reference's bare LIMIT (nondeterministic
  * row choice, SURVEY.md O4); [[ReferenceQueries.deterministic]] versions
  * add a tiebreak ORDER BY for testability.
  */
object ReferenceQueries {

  val templates: Map[String, String] = Map(
    "1" -> "SELECT * FROM artifactmetadata WHERE century = '11th century' AND culture = 'Byzantine'",
    "2" -> "SELECT DISTINCT culture FROM artifactmetadata WHERE culture IS NOT NULL AND culture != ''",
    "3" -> "SELECT * FROM artifactmetadata WHERE period LIKE '%Archaic%'",
    "4" -> "SELECT title, accessionyear FROM artifactmetadata WHERE accessionyear IS NOT NULL ORDER BY accessionyear DESC LIMIT 20",
    "5" -> "SELECT department, COUNT(*) AS count FROM artifactmetadata GROUP BY department",
    "6" -> "SELECT m.title, a.imagecount FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE a.imagecount > 1 LIMIT 20",
    "7" -> "SELECT AVG(rank) AS avg_rank FROM artifactmedia WHERE rank IS NOT NULL",
    "8" -> "SELECT m.title FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE a.colorcount > a.mediacount LIMIT 20",
    "9" -> "SELECT m.title FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE a.datebegin BETWEEN 1500 AND 1600 LIMIT 20",
    "10" -> "SELECT COUNT(*) FROM artifactmedia WHERE mediacount = 0",
    "11" -> "SELECT DISTINCT hue FROM artifactcolors WHERE hue IS NOT NULL",
    "12" -> "SELECT color, COUNT(*) AS frequency FROM artifactcolors GROUP BY color ORDER BY frequency DESC LIMIT 5",
    "13" -> "SELECT hue, AVG(percent) AS avg_coverage FROM artifactcolors WHERE hue IS NOT NULL GROUP BY hue",
    // Q14: the reference leaves `objectid` unqualified in the ON clause;
    // Spark's analyzer resolves it to artifactmedia.objectid exactly as
    // MySQL does (SURVEY.md R4).
    "14" -> "SELECT m.title, m.culture, a.rank FROM artifactmetadata m JOIN artifactmedia a ON m.id = objectid WHERE m.period IS NOT NULL",
    "15" -> "SELECT COUNT(*) AS total_color_entries FROM artifactcolors",
    "16" -> "SELECT m.title, c.hue FROM artifactmetadata m JOIN artifactcolors c ON m.id = c.objectid WHERE m.culture = 'Byzantine' LIMIT 20",
    "17" -> "SELECT m.title, c.hue FROM artifactmetadata m JOIN artifactcolors c ON m.id = c.objectid ORDER BY m.title",
    "18" -> "SELECT m.title, m.culture, a.rank FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE m.period IS NOT NULL",
    "19" -> ("SELECT DISTINCT m.title FROM artifactmetadata m " +
             "JOIN artifactmedia a ON m.id = a.objectid " +
             "JOIN artifactcolors c ON m.id = c.objectid " +
             "WHERE c.hue = 'Grey' AND a.rank <= 10"),
    "20" -> "SELECT classification, COUNT(*) AS artifact_count, AVG(a.mediacount) AS avg_media FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid GROUP BY classification ORDER BY artifact_count DESC LIMIT 10"
  )

  /** Deterministic variants of the four bare-LIMIT templates (Q6/8/9/16):
    * same rows-eligible set, explicit tiebreak order (SURVEY.md §7.5.1). */
  val deterministic: Map[String, String] = templates ++ Map(
    "6" -> "SELECT m.title, a.imagecount FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE a.imagecount > 1 ORDER BY m.id LIMIT 20",
    "8" -> "SELECT m.title FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE a.colorcount > a.mediacount ORDER BY m.id LIMIT 20",
    "9" -> "SELECT m.title FROM artifactmetadata m JOIN artifactmedia a ON m.id = a.objectid WHERE a.datebegin BETWEEN 1500 AND 1600 ORDER BY m.id LIMIT 20",
    "16" -> "SELECT m.title, c.hue FROM artifactmetadata m JOIN artifactcolors c ON m.id = c.objectid WHERE m.culture = 'Byzantine' ORDER BY m.id, c.hue LIMIT 20"
  )

  /** Register the three artifact tables and run template `queryNum` —
    * the engine-side equivalent of the reference's `run_query`
    * (`harvard_artifacts_app.py:315-352`). */
  def run(spark: SparkSession, queryNum: String,
          metadata: DataFrame, media: DataFrame, colors: DataFrame,
          deterministicLimits: Boolean = false): DataFrame = {
    metadata.createOrReplaceTempView("artifactmetadata")
    media.createOrReplaceTempView("artifactmedia")
    colors.createOrReplaceTempView("artifactcolors")
    val m = if (deterministicLimits) deterministic else templates
    spark.sql(m(queryNum))
  }

  /** Result-shaping for the reference's auto-chart sink (K5,
    * `harvard_artifacts_app.py:433-439`): first 10 rows of (col0, col1)
    * when the result has ≥2 columns — pure post-processing. */
  def chartPayload(df: DataFrame): Option[DataFrame] =
    if (df.columns.length >= 2)
      Some(df.select(df.columns(0), df.columns(1)).limit(10))
    else None
}
