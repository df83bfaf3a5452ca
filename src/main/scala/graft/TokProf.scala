package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-cost decomposition of the token-hash pipeline feeding the
  * SimHash family (r16 HOF audit follow-up): is the interpreted
  * `transform(filter(split(text)), xxhash64)` worth a native twin?
  *
  * Measured answer at sf0.1 (warm samples): the ENTIRE fingerprint
  * stage — tokenize, per-token xxhash64 HOF, native SimHash64 vote
  * loop — runs in ~0.25 s while the dd03 entry books ~3.6 s, so the
  * entry's cost lives in the chunk-blocked pair join + exact verify +
  * in-plan audit replays, not the per-token lambda. A native
  * tokenizer-hasher is a measured NO at this corpus shape (one cheap
  * lambda per token; the 64-lambdas-per-token part went native in r13
  * as SimHash64).
  *
  * Usage: runMain graft.TokProf [sfDir]
  */
object TokProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.Dedup
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    noop(docs.select(col("doc_id"))) // warm-up
    time("scan text")(noop(docs.select(col("doc_id"), col("text"))))
    time("split+filter only")(noop(docs.selectExpr("doc_id",
      """filter(split(lower(text), '\\s+'), tk -> length(tk) > 0) AS t""")))
    time("tokenHashes HOF")(noop(docs.selectExpr("doc_id",
      s"${Dedup.tokenHashesExpr} AS th")))
    time("fingerprints (HOF+native64)")(noop(Dedup.simhashFingerprints(docs)))
    // second samples: first runs above carry their codegen warm-up
    time("2nd: fingerprints")(noop(Dedup.simhashFingerprints(docs)))
    time("2nd: tokenHashes HOF")(noop(docs.selectExpr("doc_id",
      s"${Dedup.tokenHashesExpr} AS th")))
    spark.stop()
  }
}
