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
    // JVM/classloading warm-up on an unrelated plan
    noop(spark.range(1000).select((col("id") * 2).as("x")))

    val vecs = () => spark.read.parquet(s"$dir/vecs")
    val pq = () => spark.read.parquet(s"$dir/pq")
    val spans = () => spark.read.parquet(s"$dir/spans")
    val hashes = () => spark.read.parquet(s"$dir/hashes")

    println(s"== fixtures: $rows rows, dim=$dim, $nCent centroids, " +
      s"pq $m x $books x $dSub ==")

    // Variants measured INTERLEAVED: this box's stalls are bursty in
    // time (a 30-60 s slow window swallowed whole per-expression
    // blocks in the first, sequential, formulation — one variant read
    // warm=6 s for a 4096-row frame while its near-identical twin read
    // 0.1 s). Round-robining the variants puts each variant's k-th
    // sample in a different window; MIN over samples is then the
    // estimator for the deterministic compile/run cost under additive
    // bursty noise.
    val variants: Seq[(String, Int => DataFrame)] = Seq(
      "base_vecs" -> (_ =>
        vecs().select(col("id"), size(col("vec")).as("v"))),
      "nearest_centroid" -> (_ => vecs().select(col("id"),
        call_function("nearest_centroid", col("vec"), col("cents")).as("v"))),
      "nearest2_centroid" -> (_ => vecs().select(col("id"),
        call_function("nearest2_centroid", col("vec"), col("cents")).as("v"))),
      "base_pq" -> (_ =>
        pq().select(col("id"), size(col("codes")).as("v"))),
      "pq_adc" -> (_ => pq().select(col("id"),
        call_function("pq_adc", col("q"), col("codes"), col("cb")).as("v"))),
      "base_spans" -> (_ =>
        spans().select(col("id"), size(col("words")).as("v"))),
      "span_strip" -> (_ => spans().select(col("id"),
        call_function("span_strip", col("words"), col("starts"),
                      lit(17)).as("v"))),
      "base_hashes" -> (_ =>
        hashes().select(col("id"), (col("h") * 2).as("v"))),
      "bloom_probe_file" -> (_ => hashes().select(col("id"),
        call_function("bloom_probe_file", lit(bfPath), col("h")).as("v"))),
      // thin-call control: born-thin SimhashSig — its delta is what
      // "fixed" reads as
      "simhash_sig" -> (_ => vecs().select(col("id"),
        call_function("simhash_sig_n", col("vec"), lit(48)).as("v"))))

    val nCold = 8
    val cold = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to nCold).foreach { s =>
      variants.foreach { case (tag, mk) =>
        val t = time(noop(
          mk(s).withColumn("salt", col("id") + lit(s * 1000003))))
        cold(tag) = cold(tag) :+ t
      }
    }
    val warm = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    (1 to 3).foreach { _ =>
      variants.foreach { case (tag, mk) =>
        val last = mk(nCold).withColumn("salt",
          col("id") + lit(nCold * 1000003))
        warm(tag) = warm(tag) :+ time(noop(last))
      }
    }
    variants.foreach { case (tag, _) =>
      println(f"$tag%-20s cold=${cold(tag).map(c => f"$c%.3f").mkString("/")}" +
        f"  min=${cold(tag).min}%.3f  warm_min=${warm(tag).min}%.3f s")
    }

    println("\n== cold-plan delta vs same-fixture baseline (min-based) ==")
    def delta(tag: String, base: String): Unit = {
      val d = cold(tag).min - cold(base).min
      println(f"$tag%-22s cold_delta=${d}%+.3f s  warm=${warm(tag).min}%.3f s")
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
