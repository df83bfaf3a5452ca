package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.queries.QueryDef

/** Text-analysis operators for a large-scale training-data pipeline over
  * the `documents` table: token counting, quality scoring, language
  * identification, and document fingerprinting.
  *
  * Everything is built from codegen'd built-in expressions
  * (`regexp_count`/`split`/`md5` — no UDFs), so each operator is a
  * narrow projection over a column-pruned parquet scan: at 100 TB these
  * run as embarrassingly parallel map-only stages, no shuffle at all
  * (the per-language rollup shuffles only its tiny aggregate state).
  */
object TextAnalysis {
  import QueryDef.table

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = regexp_count(text, lit("\\S+"))

  /** BPE-ish subword-boundary token count: letter runs, digit runs, and
    * single punctuation marks each count as one token — the pre-merge
    * word segmentation used by byte-pair tokenizers. */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))

  /** Punctuation density per character. */
  def punctRatio(text: Column): Column =
    round(regexp_count(text, lit("[,.;:!?]")) * lit(1.0) /
      greatest(length(text), lit(1)), 6)

  /** Mean word length (chars excluding whitespace / tokens). */
  def avgWordLen(text: Column): Column =
    round(length(regexp_replace(text, "\\s", "")) * lit(1.0) /
      greatest(tokenCount(text), lit(1)), 4)

  /** Heuristic quality gate: token-count band + punctuation sanity —
    * the length/punct/stopword-ratio family of pretraining filters. */
  def qualityOk(text: Column): Column =
    (tokenCount(text).between(10, 2000) && punctRatio(text) < 0.1)
      .cast("int")

  /** Canonical content fingerprint: md5 over lowercased,
    * whitespace-collapsed text. Identical in any engine, so it doubles
    * as the exact-dedup key (see [[Dedup]]). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Per-language stopword hit count (word-boundary regex — identical
    * RE2/Java semantics for these ASCII patterns). */
  private def hits(text: Column, words: Seq[String]): Column =
    regexp_count(lower(text), lit("\\b(" + words.mkString("|") + ")\\b"))

  private val enWords = Seq("the", "and", "of", "to", "in", "is", "that", "it", "was", "for")
  private val frWords = Seq("le", "la", "les", "des", "et", "une", "est", "dans", "pour", "que")
  private val deWords = Seq("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von")
  private val esWords = Seq("el", "los", "las", "y", "un", "una", "es", "en", "por", "como")

  /** N-gram/stopword language-ID heuristic: CJK codepoints short-circuit
    * to zh; otherwise argmax of per-language stopword hits with a fixed
    * tie-break order (en > fr > de > es). */
  def langId(text: Column): Column = {
    val en = hits(text, enWords); val fr = hits(text, frWords)
    val de = hits(text, deWords); val es = hits(text, esWords)
    when(regexp_count(text, lit("[\\x{4e00}-\\x{9fff}]")) > 0, "zh")
      .when(en >= fr && en >= de && en >= es, "en")
      .when(fr >= de && fr >= es, "fr")
      .when(de >= es, "de")
      .otherwise("es")
  }

  /** DuckDB-side equivalents for the oracle SQL. */
  private def sqlHits(words: Seq[String]): String =
    s"len(regexp_extract_all(lower(text), '\\b(${words.mkString("|")})\\b'))"

  def all: Seq[QueryDef] = Seq(
    QueryDef(
      "tx01_token_count",
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"),
                  tokenCount(col("text")).cast("long").as("n_tokens"),
                  bpeishTokenCount(col("text")).cast("long").as("n_bpeish"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  len(regexp_extract_all(text, '\S+')) AS n_tokens,
             |  len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpeish
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    QueryDef(
      "tx02_quality_score",
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"),
                  avgWordLen(col("text")).as("avg_word_len"),
                  punctRatio(col("text")).as("punct_ratio"),
                  qualityOk(col("text")).as("quality_ok"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  round(length(regexp_replace(text, '\s', '', 'g')) * 1.0 /
             |        greatest(len(regexp_extract_all(text, '\S+')), 1), 4) AS avg_word_len,
             |  round(len(regexp_extract_all(text, '[,.;:!?]')) * 1.0 /
             |        greatest(length(text), 1), 6) AS punct_ratio,
             |  CAST(len(regexp_extract_all(text, '\S+')) BETWEEN 10 AND 2000
             |       AND len(regexp_extract_all(text, '[,.;:!?]')) * 1.0 /
             |           greatest(length(text), 1) < 0.1 AS INT) AS quality_ok
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    QueryDef(
      "tx03_lang_id",
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"), col("lang").as("labeled_lang"),
                  langId(col("text")).as("predicted_lang"))
          .orderBy("doc_id"),
      Some(s"""SELECT doc_id, lang AS labeled_lang,
              |  CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]')) > 0 THEN 'zh'
              |       WHEN ${sqlHits(enWords)} >= ${sqlHits(frWords)}
              |        AND ${sqlHits(enWords)} >= ${sqlHits(deWords)}
              |        AND ${sqlHits(enWords)} >= ${sqlHits(esWords)} THEN 'en'
              |       WHEN ${sqlHits(frWords)} >= ${sqlHits(deWords)}
              |        AND ${sqlHits(frWords)} >= ${sqlHits(esWords)} THEN 'fr'
              |       WHEN ${sqlHits(deWords)} >= ${sqlHits(esWords)} THEN 'de'
              |       ELSE 'es' END AS predicted_lang
              |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    QueryDef(
      "tx04_fingerprint",
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"), fingerprint(col("text")).as("fp"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |  md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    QueryDef(
      "tx08_tfidf_top_terms",
      // TF-IDF top-3 terms per document — the keyword-extraction /
      // relevance-weighting primitive. IDF is the RATIONAL smooth form
      // (N+1)/(df+1), not ln of it: integer counts through one IEEE
      // division and one multiply are bit-identical across engines,
      // while ln() is not guaranteed correctly rounded and could flip a
      // rounded 6-dp score at a boundary. Monotone in the usual idf, so
      // ranking semantics are unchanged.
      //
      // Scale shape: explode → two partial-aggregated groupBys (tf, df),
      // df is term-dictionary-sized after aggregation so its join back
      // is cheap; the only per-row window is the per-doc top-k. No stage
      // touches raw text twice.
      (s, d) => {
        val docs = table(s, d, "documents")
        val toks = docs.select(col("doc_id"),
          explode(filter(split(lower(col("text")), "\\s+"),
                         t => length(t) > 0)).as("term"))
        val tf = toks.groupBy("doc_id", "term")
          .agg(count(lit(1)).as("tf"))
        val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
        val n = docs.agg(count(lit(1)).as("n_docs"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy(desc("tfidf"), asc("term"))
        tf.join(df, Seq("term")).crossJoin(broadcast(n))
          .withColumn("tfidf",
            round(col("tf") * (col("n_docs") + lit(1.0)) / (col("df") + lit(1.0)), 6))
          .withColumn("rk", row_number().over(w).cast("int"))
          .filter(col("rk") <= 3)
          .select("doc_id", "term", "tf", "df", "tfidf", "rk")
          .orderBy("doc_id", "rk")
      },
      Some("""WITH toks AS (
             |  SELECT doc_id, unnest(list_filter(
             |    string_split_regex(lower(text), '\s+'),
             |    t -> len(t) > 0)) AS term
             |  FROM documents),
             |tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
             |df AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
             |n AS (SELECT COUNT(*) AS n_docs FROM documents),
             |scored AS (
             |  SELECT tf.doc_id, tf.term, tf.tf, df.df,
             |    round(tf.tf * (n.n_docs + 1.0) / (df.df + 1.0), 6) AS tfidf
             |  FROM tf JOIN df USING (term) CROSS JOIN n),
             |ranked AS (
             |  SELECT *, CAST(row_number() OVER (
             |    PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rk
             |  FROM scored)
             |SELECT doc_id, term, tf, df, tfidf, rk FROM ranked
             |WHERE rk <= 3 ORDER BY doc_id, rk""".stripMargin)
    ),
    QueryDef(
      "tx09_readability",
      // Flesch-style readability from exact integer counts: sentences
      // (terminal-punctuation runs, floor 1), words (tokens, floor 1),
      // vowel-group count as the syllable proxy. The score is two
      // multiplies and a subtraction on exact integer ratios —
      // correctly-rounded IEEE ops, no transcendentals, bit-identical
      // across engines. Map-only over a column-pruned scan.
      (s, d) => {
        val words = greatest(tokenCount(col("text")), lit(1)).cast("double")
        val sents = greatest(regexp_count(col("text"), lit("[.!?]+")), lit(1))
          .cast("double")
        val syll = regexp_count(lower(col("text")), lit("[aeiouy]+"))
          .cast("double")
        table(s, d, "documents")
          .select(col("doc_id"),
                  round(lit(206.835) - lit(1.015) * (words / sents)
                        - lit(84.6) * (syll / words), 4).as("flesch"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
             |  round(206.835
             |    - 1.015 * (greatest(len(regexp_extract_all(text, '\S+')), 1) * 1.0
             |               / greatest(len(regexp_extract_all(text, '[.!?]+')), 1))
             |    - 84.6 * (len(regexp_extract_all(lower(text), '[aeiouy]+')) * 1.0
             |              / greatest(len(regexp_extract_all(text, '\S+')), 1)), 4)
             |    AS flesch
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),
    QueryDef(
      "tx10_vocab_coverage",
      // tokenizer-design curve: for each candidate vocabulary size K,
      // the fraction of all token OCCURRENCES covered by the K most
      // frequent terms (rank by count desc, term asc). One corpus-wide
      // term count (partially aggregated, vocabulary-sized after the
      // combine); the top-40 slice is a TakeOrderedAndProject — never a
      // vocabulary-wide window, so a 10^9-term web-corpus vocabulary is
      // never sorted through one task. Rank WITHIN the 40-row slice is
      // a broadcast self-join count ((n, term) pairs are unique after
      // the groupBy, so the strict-order count is exactly row_number).
      (s, d) => {
        val terms = table(s, d, "documents")
          .select(explode(expr(
            "filter(split(lower(text), '\\\\s+'), w -> length(w) > 0)"))
            .as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
        val ks = Seq(5, 10, 20, 40)
        val total = terms.agg(sum("n").cast("long").as("total_tokens"))
        val top = terms
          .orderBy(col("n").desc, col("term").asc).limit(ks.max)
        val ranked = top.as("a")
          .join(broadcast(top.as("b")),
                col("b.n") > col("a.n") ||
                (col("b.n") === col("a.n") && col("b.term") < col("a.term")),
                "left")
          .groupBy(col("a.term").as("term"), col("a.n").as("n"))
          .agg((count(col("b.term")) + lit(1)).as("rk"))
        val sumCols = ks.map(k =>
          sum(when(col("rk") <= k, col("n")).otherwise(lit(0L))).as(s"s$k"))
        val covs = ranked.agg(sumCols.head, sumCols.tail: _*)
        total.crossJoin(broadcast(covs)).select(
          col("total_tokens") +:
          ks.map(k => round(col(s"s$k") * lit(1.0) / col("total_tokens"), 6)
            .as(s"cov_top$k")): _*)
      },
      Some("""WITH terms AS (
             |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
             |                w -> length(w) > 0)) AS term
             |  FROM documents),
             |counts AS (SELECT term, count(*) AS n FROM terms GROUP BY term),
             |ranked AS (
             |  SELECT n, row_number() OVER (ORDER BY n DESC, term) AS rk
             |  FROM counts)
             |SELECT CAST(SUM(n) AS BIGINT) AS total_tokens,
             |  round(SUM(CASE WHEN rk <= 5 THEN n ELSE 0 END) * 1.0 / SUM(n), 6) AS cov_top5,
             |  round(SUM(CASE WHEN rk <= 10 THEN n ELSE 0 END) * 1.0 / SUM(n), 6) AS cov_top10,
             |  round(SUM(CASE WHEN rk <= 20 THEN n ELSE 0 END) * 1.0 / SUM(n), 6) AS cov_top20,
             |  round(SUM(CASE WHEN rk <= 40 THEN n ELSE 0 END) * 1.0 / SUM(n), 6) AS cov_top40
             |FROM ranked""".stripMargin)
    ),
    QueryDef(
      "tx11_collocations",
      // Collocation mining: top word bigrams by LIFT — the association
      // statistic behind phrase/tokenizer-merge discovery. lift =
      // P(xy) / (P(x)·P(y)) = n_xy·N / (n_x·n_y); PMI is log(lift), and
      // lift is monotone in PMI, so ranking by lift gives the PMI
      // ordering from integer counts through one IEEE multiply/divide —
      // bit-identical across engines, no transcendental drift (the tx08
      // rational-IDF discipline). min support n_xy >= 5 cuts hapax
      // noise, the standard collocation floor.
      //
      // Scale shape: one explode for unigram counts + one for bigram
      // counts, both partially aggregated (dictionary-sized after the
      // combine); the unigram joins are dictionary⋈dictionary equi-joins
      // (NOT broadcast — a web-corpus vocabulary is 10^8+, so it must
      // stay a shuffle join); the 1-row total broadcasts; final top-20
      // is a TakeOrderedAndProject, never a global sort.
      (s, d) => {
        val words = table(s, d, "documents")
          .select(expr(
            "filter(split(lower(text), '\\\\s+'), w -> length(w) > 0)")
            .as("w"))
        val uni = words.select(explode(col("w")).as("term"))
          .groupBy("term").agg(count(lit(1)).as("n"))
        val total = uni.agg(sum("n").cast("double").as("n_total"))
        val bi = words.select(explode(expr(
            """zip_with(slice(w, 1, greatest(size(w) - 1, 0)),
              |         slice(w, 2, greatest(size(w) - 1, 0)),
              |         (a, b) -> named_struct('w1', a, 'w2', b))""".stripMargin))
            .as("bg"))
          .select(col("bg.w1").as("w1"), col("bg.w2").as("w2"))
          .groupBy("w1", "w2").agg(count(lit(1)).as("n_xy"))
          .filter(col("n_xy") >= 5)
        bi.join(uni.select(col("term").as("w1"), col("n").as("n_x")), Seq("w1"))
          .join(uni.select(col("term").as("w2"), col("n").as("n_y")), Seq("w2"))
          .crossJoin(broadcast(total))
          .withColumn("lift",
            round(col("n_xy").cast("double") * col("n_total") /
                  (col("n_x").cast("double") * col("n_y").cast("double")), 6))
          .select("w1", "w2", "n_xy", "n_x", "n_y", "lift")
          .orderBy(desc("lift"), asc("w1"), asc("w2")).limit(20)
      },
      Some("""WITH w AS (
             |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
             |                     x -> length(x) > 0) AS w
             |  FROM documents),
             |uni AS (SELECT unnest(w) AS term FROM w),
             |un AS (SELECT term, COUNT(*) AS n FROM uni GROUP BY term),
             |tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS n_total FROM un),
             |big AS (
             |  SELECT unnest(w[1:len(w) - 1]) AS w1,
             |         unnest(w[2:len(w)]) AS w2
             |  FROM w),
             |bn AS (
             |  SELECT w1, w2, COUNT(*) AS n_xy FROM big
             |  GROUP BY w1, w2 HAVING COUNT(*) >= 5)
             |SELECT b.w1, b.w2, b.n_xy, ux.n AS n_x, uy.n AS n_y,
             |  round(CAST(b.n_xy AS DOUBLE) * t.n_total /
             |        (CAST(ux.n AS DOUBLE) * CAST(uy.n AS DOUBLE)), 6) AS lift
             |FROM bn b
             |JOIN un ux ON b.w1 = ux.term
             |JOIN un uy ON b.w2 = uy.term
             |CROSS JOIN tot t
             |ORDER BY lift DESC, w1, w2 LIMIT 20""".stripMargin)
    ),
    QueryDef(
      "tx05_corpus_stats",
      (s, d) =>
        table(s, d, "documents")
          .groupBy("lang")
          .agg(count(lit(1)).as("n_docs"),
               sum(tokenCount(col("text")).cast("long")).as("total_tokens"),
               round(avg(col("n_chars")), 4).as("avg_chars"))
          .orderBy("lang"),
      // CAST: DuckDB SUM(BIGINT) yields HUGEINT while Spark sums to
      // LongType — identical values, mismatched hash without the cast.
      Some("""SELECT lang, COUNT(*) AS n_docs,
             |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT) AS total_tokens,
             |  round(AVG(n_chars), 4) AS avg_chars
             |FROM documents GROUP BY lang ORDER BY lang""".stripMargin)
    )
  )
}
