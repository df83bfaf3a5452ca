package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold-plan codegen cost per native expression (VERDICT r15 #2: the
  * DeconScore thin-call fix was applied where the tax was FOUND — an
  * ~80-line inlined `doGenCode` body costing ~1.1 s of janino compile
  * per fresh plan — but the other object-returning natives with
  * inlined bodies were never measured against it).
  *
  * Method: each expression is projected over a small parquet fixture
  * (parquet, not a local relation — `ConvertToLocalRelation` would
  * evaluate a projection over an in-memory relation interpreted on the
  * driver and skip codegen entirely). Each COLD iteration adds a
  * distinct salt literal to the projection so the generated source
  * differs → a fresh janino compile per iteration (Spark's codegen
  * cache keys on source text). A trivial-expression BASELINE over the
  * same fixture with the same salt trick isolates the expression's own
  * compile contribution: `cold_delta = median(cold) − median(base)`.
  * A WARM re-run of an already-compiled plan gives the per-row cost
  * floor the thin-call decision must not regress.
  *
  * Usage: runMain graft.GenProf
  */
object GenProf {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    graft.functions.NearestCentroid.register(spark)
    graft.functions.Nearest2Centroid.register(spark)
    graft.functions.PqAdc.register(spark)
    graft.functions.SpanStrip.register(spark)
    graft.functions.SimhashSig.register(spark)
    graft.functions.DeconScore.register(spark)
    graft.functions.BloomProbeFile.register(spark)

    val dir = "/tmp/genprof"

    // ---- fixtures (written once; every iteration reads parquet) ----
    val dim = 64
    val nCent = 64
    val rows = 4096
    val cents = Seq.tabulate(nCent)(c =>
      Seq.tabulate(dim)(j => math.sin(c * 131 + j).toDouble))
    Seq.tabulate(rows)(i =>
        (i.toLong, Seq.tabulate(dim)(j => math.cos(i * 17 + j).toFloat), cents))
      .toDF("id", "vec", "cents")
      .write.mode("overwrite").parquet(s"$dir/vecs")

    val m = 8; val books = 16; val dSub = 8
    val cb = Seq.tabulate(m)(s => Seq.tabulate(books)(b =>
      Seq.tabulate(dSub)(j => math.sin(s * 7 + b * 3 + j).toDouble)))
    Seq.tabulate(rows)(i =>
        (i.toLong, Seq.tabulate(m * dSub)(j => math.cos(i + j).toDouble),
         Seq.tabulate(m)(s => (i + s) % books), cb))
      .toDF("id", "q", "codes", "cb")
      .write.mode("overwrite").parquet(s"$dir/pq")

    Seq.tabulate(rows)(i =>
        (i.toLong, Seq.tabulate(100)(j => s"w${(i + j) % 997}"),
         Seq.tabulate(5)(k => k * 17)))
      .toDF("id", "words", "starts")
      .write.mode("overwrite").parquet(s"$dir/spans")

    // a real on-disk bloom filter for the probe's load-once path
    val bfPath = s"$dir/bloom.bin"
    val bf = org.apache.spark.util.sketch.BloomFilter.create(10000, 0.01)
    (0 until 1000).foreach(i => bf.putLong(i.toLong * 7919))
    val os = new java.io.BufferedOutputStream(
      new java.io.FileOutputStream(bfPath))
    try bf.writeTo(os) finally os.close()
    Seq.tabulate(rows)(i => (i.toLong, i.toLong * 13))
      .toDF("id", "h")
      .write.mode("overwrite").parquet(s"$dir/hashes")

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)

    // JVM/classloading warm-up on an unrelated plan
    noop(spark.range(1000).select((col("id") * 2).as("x")))

    /** 4 fresh-source compiles + 1 warm re-run of the last plan. */
    def profile(tag: String, mk: Int => DataFrame): (Double, Double) = {
      val cold = (1 to 4).map(s => time(noop(
        mk(s).withColumn("salt", col("id") + lit(s * 1000003)))))
      val last = mk(4).withColumn("salt", col("id") + lit(4 * 1000003))
      val warm = time(noop(last))
      println(f"$tag%-34s cold=${cold.map(c => f"$c%.3f").mkString("/")}" +
        f"  median=${median(cold)}%.3f  warm=$warm%.3f s")
      (median(cold), warm)
    }

    val vecs = () => spark.read.parquet(s"$dir/vecs")
    val pq = () => spark.read.parquet(s"$dir/pq")
    val spans = () => spark.read.parquet(s"$dir/spans")
    val hashes = () => spark.read.parquet(s"$dir/hashes")

    println(s"== fixtures: $rows rows, dim=$dim, $nCent centroids, " +
      s"pq $m x $books x $dSub ==")

    val results = scala.collection.mutable.LinkedHashMap[String, (Double, Double)]()
    results("base_vecs") = profile("baseline size(vec) [vecs]",
      _ => vecs().select(col("id"), size(col("vec")).as("v")))
    results("nearest_centroid") = profile("nearest_centroid (inline)",
      _ => vecs().select(col("id"),
        call_function("nearest_centroid", col("vec"), col("cents")).as("v")))
    results("nearest2_centroid") = profile("nearest2_centroid (inline)",
      _ => vecs().select(col("id"),
        call_function("nearest2_centroid", col("vec"), col("cents")).as("v")))
    results("base_pq") = profile("baseline size(codes) [pq]",
      _ => pq().select(col("id"), size(col("codes")).as("v")))
    results("pq_adc") = profile("pq_adc (inline)",
      _ => pq().select(col("id"),
        call_function("pq_adc", col("q"), col("codes"), col("cb")).as("v")))
    results("base_spans") = profile("baseline size(words) [spans]",
      _ => spans().select(col("id"), size(col("words")).as("v")))
    results("span_strip") = profile("span_strip (inline)",
      _ => spans().select(col("id"),
        call_function("span_strip", col("words"), col("starts"),
                      lit(17)).as("v")))
    results("base_hashes") = profile("baseline h*2 [hashes]",
      _ => hashes().select(col("id"), (col("h") * 2).as("v")))
    results("bloom_probe_file") = profile("bloom_probe_file (mutable-state)",
      _ => hashes().select(col("id"),
        call_function("bloom_probe_file", lit(bfPath), col("h")).as("v")))
    // thin-call controls: the r15 fix (DeconScore) and the born-thin
    // SimhashSig — their deltas are what "fixed" reads as
    results("simhash_sig") = profile("simhash_sig_n (thin control)",
      _ => vecs().select(col("id"),
        call_function("simhash_sig_n", col("vec"), lit(48)).as("v")))

    println("\n== cold-plan delta vs same-fixture baseline ==")
    def delta(tag: String, base: String): Unit = {
      val d = results(tag)._1 - results(base)._1
      println(f"$tag%-22s cold_delta=${d}%+.3f s  warm=${results(tag)._2}%.3f s")
    }
    delta("nearest_centroid", "base_vecs")
    delta("nearest2_centroid", "base_vecs")
    delta("simhash_sig", "base_vecs")
    delta("pq_adc", "base_pq")
    delta("span_strip", "base_spans")
    delta("bloom_probe_file", "base_hashes")
    spark.stop()
  }
}
