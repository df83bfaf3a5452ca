package graft

import org.apache.spark.sql.functions._

import graft.analytics.{BpeTokenizer, TextAnalysis}
import graft.queries.QueryDef

/** Pins for the learned-merge tokenizer (graft.analytics.BpeTokenizer):
  * determinism, structural bounds the DuckDB oracle can't see, and the
  * monotone-shrink property of the replace-chain application. */
class BpeTokenizerSpec extends SparkSpec {

  test("bpe: learning is deterministic, merges distinct, full length") {
    val m1 = BpeTokenizer.learnMerges(spark, sf0001)
    val m2 = BpeTokenizer.learnMerges(spark, sf0001)
    assert(m1 == m2, "two learns over the same corpus diverged")
    assert(m1.map(m => (m.l, m.r)).distinct.size == m1.size,
           s"duplicate merge learned: $m1")
    assert(m1.size == BpeTokenizer.Merges)
    assert(m1.forall(m => m.cnt > 0 && !m.l.contains(' ') && !m.r.contains(' ')))
  }

  test("bpe: per-doc counts bounded by words below and chars above; more merges never grow") {
    val merges = BpeTokenizer.loadOrLearn(spark, sf0001)
    val docs = QueryDef.table(spark, sf0001, "documents")
      .filter(col("doc_id") < 50)
    val rows = docs.select(
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_words"),
        BpeTokenizer.bpeTokenCount(col("text"), merges).as("n_bpe"),
        length(regexp_replace(col("text"), "\\s+", "")).cast("long")
          .as("n_chars"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0),
             s"fewer tokens than words: $r") // every word >= 1 token
      assert(r.getLong(1) <= r.getLong(2),
             s"more tokens than characters: $r") // merges only shrink
    }
    // a PREFIX of the merge list can only leave MORE tokens: each
    // replace pass strictly never increases the symbol count
    val both = docs.select(
        BpeTokenizer.bpeTokenCount(col("text"), merges.take(4)).as("few"),
        BpeTokenizer.bpeTokenCount(col("text"), merges).as("all"))
      .collect()
    both.foreach(r => assert(r.getLong(0) >= r.getLong(1)))
    // and the fixture must actually exercise merging (some doc shrinks)
    assert(both.exists(r => r.getLong(0) > r.getLong(1)) ||
           rows.exists(r => r.getLong(1) < r.getLong(2)))
  }
}
