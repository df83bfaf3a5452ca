package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-decomposition of the banded decon SERVE cost (r15: JobProf
  * showed dc03's serve stage burning ~35 CPU-seconds for a 1801-row
  * corpus × 199-row bench at 12×4 — ~20 ms/row where the scorer's
  * arithmetic accounts for ~20 µs). Times each plan variant so the
  * cost lands on a component: the scoring expression itself, the
  * number of times Catalyst evaluates it (filter + collapsed
  * projections), or the broadcast-join machinery around it.
  *
  * Usage: runMain graft.DeconProf [sfDir]
  */
object DeconProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.analytics.DataQuality

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val corpus = emb.filter(col("label") =!= 0).select("vec_id", "embedding")
    val bench = emb.filter(col("label") === 0)
      .select(col("vec_id").as("bench_id"), col("embedding"))
    val chunks = DataQuality.deconBenchBucketChunks(bench)
      .map(_.localCheckpoint(true))

    def time(tag: String)(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-55s $dt%7.3f s")
      dt
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up: codegen + broadcast machinery
    noop(DataQuality.semanticDeconScoredWith(spark, corpus, chunks))

    time("corpus scan baseline")(noop(corpus))
    // the raw one-eval form: ONE DeconScore per row, struct kept whole
    graft.functions.DeconScore.register(spark)
    val joined = corpus.select(col("vec_id"), col("embedding"))
      .repartition(spark.sparkContext.defaultParallelism)
      .crossJoin(broadcast(chunks.head.select(col("bkts").as("__bkts_0"))))
    val structOnce = joined.select(col("vec_id"),
      call_function(graft.functions.DeconScore.fnName,
        col("embedding"), col("__bkts_0"), lit(12), lit(4)).as("s"))
    time("struct, no field extraction (1 eval/row)")(noop(structOnce))
    time("scoredWith (field extraction projections)")(
      noop(DataQuality.semanticDeconScoredWith(spark, corpus, chunks)))
    time("drops (filter + projection over scored)")(
      noop(DataQuality.semanticDeconLshDropsWith(spark, corpus, chunks)))
    // join machinery alone: same shape, trivial expression
    val cheap = joined.select(col("vec_id"), size(col("__bkts_0")).as("s"))
    time("same join, size() instead of scorer")(noop(cheap))
    // second samples (box variance)
    time("struct once, 2nd sample")(noop(structOnce))
    time("drops, 2nd sample")(
      noop(DataQuality.semanticDeconLshDropsWith(spark, corpus, chunks)))
    spark.stop()
  }
}
