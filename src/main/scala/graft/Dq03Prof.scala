package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage costs of dq03's per-doc champion-run fold (`topRun`): the
  * r16 HOF-audit candidate left as "complex struct fold, deferred".
  * Decides native-vs-keep from a measurement, not an assumption.
  * Usage: runMain graft.Dq03Prof [sfDir] */
object Dq03Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def topRun(arr: Column) =
      aggregate(
        array_sort(arr),
        struct(lit("").as("prev"), lit(0L).as("run"),
               lit("").as("best"), lit(0L).as("bestn")),
        (acc, x) => {
          val newRun = when(x === acc("prev"), acc("run") + lit(1L))
            .otherwise(lit(1L))
          val better = newRun > acc("bestn")
          struct(x.as("prev"), newRun.as("run"),
                 when(better, x).otherwise(acc("best")).as("best"),
                 when(better, newRun).otherwise(acc("bestn")).as("bestn"))
        },
        acc => struct(acc("best").as("gram"), acc("bestn").as("n")))
    val wordsExpr =
      """filter(split(lower(text), '\\s+'), w -> length(w) > 0)"""
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    noop(docs.select(col("doc_id")))
    val words = docs.selectExpr("doc_id", s"$wordsExpr AS words")
    time("words only")(noop(words))
    time("words+sort")(noop(words.select(col("doc_id"),
      array_sort(col("words")).as("s"))))
    time("words+topRun")(noop(words.select(col("doc_id"),
      topRun(col("words")).as("t"))))
    time("2nd words+topRun")(noop(words.select(col("doc_id"),
      topRun(col("words")).as("t"))))
    time("2nd words only")(noop(words))
    spark.stop()
  }
}
