package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A/B of the r16 fold natives vs their HOF references at SCALE (the
  * r15 dc06 lesson: an interpreted HOF is invisible at fixture size
  * and a multi-second single-task stage the moment a data-dependent
  * frame grows — so the decision needs a number at a bigger N, not
  * only the fixture bench where both read as noise).
  *
  * The corpus is the sf dir's embeddings self-unioned `mult` times
  * (plan-side explode, no staging); each variant is one map-only
  * noop-sink pass computing the fold per row. Interleaved samples,
  * min booked (GenProf's bursty-noise discipline).
  *
  * Usage: runMain graft.HofAb [sfDir] [mult]
  */
object HofAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val mult = args.lift(1).map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.functions.VectorOps

    val emb0 = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb = emb0
      .crossJoin(spark.range(mult).select(col("id").as("__rep")))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val n = emb.count()
    println(s"== corpus: $n rows (x$mult) ==")
    val q = emb0.filter(col("vec_id") === 0L)
      .select(col("embedding").as("qvec"))
    val qz = graft.analytics.Similarity.int8Quantized(emb0)
      .localCheckpoint(true)
    val qzBig = qz
      .crossJoin(spark.range(mult).select(col("id").as("__rep")))
      .repartition(spark.sparkContext.defaultParallelism)
      .localCheckpoint(true)
    val qq = qz.filter(col("vec_id") === 0L).select(col("__q").as("q_q"))

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    graft.functions.SimhashSig.register(spark)
    val variants: Seq[(String, () => DataFrame)] = Seq(
      "bucket_hof" -> (() => emb.crossJoin(broadcast(q)).select(
        VectorOps.simhashBucket(col("embedding"), 4).as("b"))),
      "bucket_native" -> (() => emb.crossJoin(broadcast(q)).select(
        call_function(graft.functions.SimhashSig.fnName,
                      col("embedding"), lit(4)).as("b"))),
      "dot_hof" -> (() => emb.crossJoin(broadcast(q)).select(
        VectorOps.dot(col("embedding"), col("qvec")).as("d"))),
      "dot_native" -> (() => emb.crossJoin(broadcast(q)).select(
        VectorOps.dotNative(spark, col("embedding"), col("qvec")).as("d"))),
      "qdot_hof" -> (() => qzBig.crossJoin(broadcast(qq)).select(
        aggregate(zip_with(col("__q"), col("q_q"), (a, b) => a * b),
                  lit(0L), (acc, v) => acc + v).as("d"))),
      "qdot_native" -> (() => qzBig.crossJoin(broadcast(qq)).select(
        VectorOps.dotLongNative(spark, col("__q"), col("q_q")).as("d"))))

    // warm-up every plan once (codegen), then 3 interleaved samples
    variants.foreach { case (_, mk) => noop(mk()) }
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 3).foreach { _ =>
      variants.foreach { case (tag, mk) =>
        times(tag) = times(tag) :+ time(noop(mk()))
      }
    }
    variants.foreach { case (tag, _) =>
      println(f"$tag%-14s ${times(tag).map(t => f"$t%.3f").mkString("/")}" +
        f"  min=${times(tag).min}%.3f s")
    }
    spark.stop()
  }
}
