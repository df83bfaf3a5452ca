package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef

/** The end-to-end training-data curation pipeline, composed from the
  * module operators as ONE Spark plan: eval-set isolation → C4-style
  * quality gate (dq02's rules) → exact fingerprint dedup (dd01's key,
  * keep-first) → benchmark decontamination (dc01's 5-gram overlap) →
  * deterministic epoch shuffle (dm04's shards) → token-budget sequence
  * packing (dm02's running sum) — emitting the per-document training
  * manifest (shard, position, packed sequence).
  *
  * This is the artifact a pretraining run actually consumes, and the
  * integration check that the unit operators compose: one lazy plan,
  * stage boundaries only where semantics need them (the dedup window,
  * the decontamination broadcast, the shard-local pack windows). At
  * 100 TB each stage keeps its unit-operator scale shape — nothing in
  * the composition adds a corpus-wide barrier beyond the dedup
  * shuffle the semantics require.
  */
object CurationPipeline {
  import QueryDef.table

  private val wordsExpr =
    "filter(split(text, '\\\\s+'), w -> length(w) > 0)"
  private val wordsSql =
    """list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0)"""

  def all: Seq[QueryDef] = Seq(
    QueryDef(
      "cp01_curation_manifest",
      (s, d) => {
        val grams5 =
          """CASE WHEN size(words) >= 5 THEN
            |  transform(sequence(0, size(words) - 5),
            |            i -> md5(cast(concat_ws(' ', slice(words, i + 1, 5)) as binary)))
            |ELSE cast(array() as array<string>) END""".stripMargin
        val base = table(s, d, "documents")
          .select(col("doc_id"), col("text"), col("source"),
                  expr(wordsExpr).as("words"),
                  length(regexp_replace(col("text"), "\\s", ""))
                    .as("n_word_chars"))
          .withColumn("n_words", size(col("words")))
          .withColumn("n_distinct", size(array_distinct(col("words"))))
        // stage 1+2: eval set (src0) aside, quality gate (dq02's rules)
        val kept = base
          .filter(col("source") =!= "src0")
          .filter(col("n_words").between(20, 10000) &&
            (col("n_word_chars") * lit(1.0) / greatest(col("n_words"), lit(1)))
              .between(3.0, 10.0) &&
            regexp_count(col("text"), lit("\\b(the|a|and|of|to|in)\\b")) > 0 &&
            !col("text").contains("{") &&
            !lower(col("text")).contains("lorem ipsum") &&
            (col("n_words") - col("n_distinct")) * lit(1.0) /
              greatest(col("n_words"), lit(1)) <= 0.5)
        // stage 3: exact content dedup, keep-first (dd01's fingerprint)
        val dedupW = Window
          .partitionBy(TextAnalysis.fingerprint(col("text")))
          .orderBy("doc_id")
        val deduped = kept
          .withColumn("rk", row_number().over(dedupW))
          .filter(col("rk") === 1).drop("rk")
        // stage 4: decontamination against the eval set's 5-grams
        val bench = base.filter(col("source") === "src0")
          .select(explode(expr(grams5)).as("g")).distinct()
        val contaminated = deduped
          .select(col("doc_id"), explode(expr(grams5)).as("g"))
          .join(broadcast(bench), Seq("g"), "left_semi")
          .select("doc_id").distinct()
        val clean = deduped.join(contaminated, Seq("doc_id"), "left_anti")
        // stage 5: deterministic epoch shuffle (dm04's shards)
        val h = md5(concat(col("doc_id").cast("string"), lit(":1"))
          .cast("binary"))
        val sharded = clean
          .select(col("doc_id"), col("n_words").cast("long").as("n_tokens"))
          .withColumn("h", h)
          .withColumn("shard", conv(substring(col("h"), 1, 2), 16, 10)
            .cast("int") % 16)
        // stage 6: token-budget packing in shuffle order (dm02's sum)
        val posW = Window.partitionBy("shard").orderBy(col("h"), col("doc_id"))
        val cumW = posW.rowsBetween(Window.unboundedPreceding, -1)
        sharded
          .withColumn("pos", row_number().over(posW).cast("int"))
          .withColumn("cum_before", coalesce(sum("n_tokens").over(cumW), lit(0L)))
          .withColumn("seq_id", (col("cum_before") / lit(512)).cast("long"))
          .select("doc_id", "n_tokens", "shard", "pos", "seq_id")
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, text, source, $wordsSql AS words,
              |    length(regexp_replace(text, '\\s', '', 'g')) AS n_word_chars
              |  FROM documents),
              |st AS (
              |  SELECT *, len(words) AS n_words,
              |    len(list_distinct(words)) AS n_distinct
              |  FROM base),
              |kept AS (
              |  SELECT * FROM st WHERE source <> 'src0'
              |    AND n_words BETWEEN 20 AND 10000
              |    AND n_word_chars * 1.0 / greatest(n_words, 1) BETWEEN 3.0 AND 10.0
              |    AND len(regexp_extract_all(text, '\\b(the|a|and|of|to|in)\\b')) > 0
              |    AND NOT contains(text, '{')
              |    AND NOT contains(lower(text), 'lorem ipsum')
              |    AND (n_words - n_distinct) * 1.0 / greatest(n_words, 1) <= 0.5),
              |dedup AS (
              |  SELECT * FROM (
              |    SELECT *, row_number() OVER (
              |      PARTITION BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
              |      ORDER BY doc_id) AS rk
              |    FROM kept) WHERE rk = 1),
              |bench AS (
              |  SELECT DISTINCT unnest(list_transform(range(greatest(len(words) - 4, 0)),
              |    i -> md5(array_to_string(words[i + 1:i + 5], ' ')))) AS g
              |  FROM st WHERE source = 'src0'),
              |dgrams AS (
              |  SELECT doc_id, unnest(list_transform(range(greatest(len(words) - 4, 0)),
              |    i -> md5(array_to_string(words[i + 1:i + 5], ' ')))) AS g
              |  FROM dedup),
              |contam AS (
              |  SELECT DISTINCT doc_id FROM dgrams
              |  WHERE g IN (SELECT g FROM bench)),
              |clean AS (
              |  SELECT doc_id, CAST(n_words AS BIGINT) AS n_tokens,
              |    md5(CAST(doc_id AS VARCHAR) || ':1') AS h
              |  FROM dedup WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
              |sharded AS (
              |  SELECT doc_id, n_tokens, h,
              |    CAST((strpos('0123456789abcdef', substring(h, 1, 1)) - 1) * 16
              |       + (strpos('0123456789abcdef', substring(h, 2, 1)) - 1)
              |       AS INT) % 16 AS shard
              |  FROM clean),
              |ordered AS (
              |  SELECT doc_id, n_tokens, shard,
              |    CAST(row_number() OVER w AS INT) AS pos,
              |    COALESCE(SUM(n_tokens) OVER (PARTITION BY shard ORDER BY h, doc_id
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
              |  FROM sharded
              |  WINDOW w AS (PARTITION BY shard ORDER BY h, doc_id))
              |SELECT doc_id, n_tokens, shard, pos,
              |  CAST(floor(cum_before / 512) AS BIGINT) AS seq_id
              |FROM ordered ORDER BY doc_id""".stripMargin)
    )
  )
}
