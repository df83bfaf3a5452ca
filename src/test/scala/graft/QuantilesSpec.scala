package graft

import org.apache.spark.sql.functions._

import graft.analytics.Quantiles

/** The quantile tier's contract: the emitted number is the EXACT
  * discrete quantile (value at rank max(1, ceil(p·n))) for ANY value
  * distribution, even though the execution path runs through a
  * merge-order-dependent GK sketch — the sketch only chooses the
  * bracket, never the answer. These tests drive the sketch path
  * (n > accuracy) through the distributions that break naive quantile
  * code: constant columns, near-total point masses, heavy skew, and
  * duplicate-riddled streams. */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  /** Reference semantics, straight from the definition. */
  private def discQuantile(sorted: Vector[Long], num: Long, den: Long): Long = {
    val n = sorted.size.toLong
    val t = math.max(1L, (num * n + den - 1) / den)
    sorted((t - 1).toInt)
  }

  private val PS = Seq(("p50", 1L, 2L, 0.5), ("p90", 9L, 10L, 0.9),
                       ("p99", 99L, 100L, 0.99))

  private def check(values: Seq[Long], acc: Int, label: String): Unit = {
    val sorted = values.toVector.sorted
    val got = Quantiles
      .bracketed(values.toDF("v"), Seq.empty, PS, acc)
      .select("plabel", "q_exact", "n_group", "bracket_ok")
      .as[(String, Long, Long, Boolean)].collect()
      .map { case (pl, q, n, ok) => pl -> ((q, n, ok)) }.toMap
    assert(got.size == PS.size, s"$label: ${got.keySet}")
    PS.foreach { case (pl, num, den, _) =>
      val (q, n, ok) = got(pl)
      assert(n == values.size.toLong, label)
      assert(ok, s"$label $pl: GK bracket missed the target rank")
      assert(q == discQuantile(sorted, num, den),
        s"$label $pl: got $q want ${discQuantile(sorted, num, den)}")
    }
  }

  test("sketch path is exact on adversarial distributions (n >> accuracy)") {
    // all four drive the sketch path: n = 5000 vs accuracy 100
    check(Seq.fill(5000)(7L), 100, "constant column")
    check(Seq.fill(4999)(1L) :+ 1000L, 100, "point mass low")
    check(1L +: Seq.fill(4999)(1000L), 100, "point mass high")
    // Zipf-ish: value i appears ~5000/i times — heavy head, long tail
    check((1 to 100).flatMap(i => Seq.fill(5000 / i)(i.toLong)), 100,
      "zipf skew")
    // seeded uniform with duplicates
    val rnd = new scala.util.Random(42)
    check(Seq.fill(5000)(rnd.nextInt(300).toLong), 100, "uniform dups")
  }

  test("grouped form keeps per-group exactness with divergent distributions") {
    // group a: constant; group b: skewed — both past the sketch cutoff
    val rows = Seq.fill(800)(("a", 5L)) ++
      (1 to 40).flatMap(i => Seq.fill(i)(("b", i.toLong)))
    val bSorted = rows.collect { case ("b", v) => v }.toVector.sorted
    val got = Quantiles
      .bracketed(rows.toDF("g", "v"), Seq("g"), PS, acc = 100)
      .select("g", "plabel", "q_exact", "bracket_ok")
      .as[(String, String, Long, Boolean)].collect()
    assert(got.length == 6)
    got.foreach { case (g, pl, q, ok) =>
      assert(ok, s"$g/$pl bracket")
      val (num, den) = PS.collectFirst {
        case (`pl`, n0, d0, _) => (n0, d0) }.get
      val want =
        if (g == "a") 5L else discQuantile(bSorted, num, den)
      assert(q == want, s"$g/$pl: got $q want $want")
    }
  }

  test("small groups take the exact fallback and still match the definition") {
    // n = 30 <= accuracy: bracket is [min, max], refine is plain selection
    val values = Seq(3L, 1L, 4L, 1L, 5L, 9L, 2L, 6L, 5L, 3L, 5L,
      8L, 9L, 7L, 9L, 3L, 2L, 3L, 8L, 4L, 6L, 2L, 6L, 4L, 3L,
      3L, 8L, 3L, 2L, 7L)
    check(values, 100, "small-n fallback")
  }

  test("st25: histogram state is bounded by the value domain, not the stream") {
    val vals = graft.queries.QueryDef.table(spark, sf0001, "documents")
      .select(graft.analytics.TextAnalysis.tokenCount(col("text"))
        .cast("long").as("v"))
    val maxV = vals.agg(max("v")).as[Long].head()
    val bins = vals.groupBy(shiftright(col("v"), 3).as("bin"))
      .count().count()
    assert(bins <= maxV / 8 + 1,
      s"$bins bins exceed the domain bound ${maxV / 8 + 1}")
    // the cross-batch state the entry persists is exactly this frame —
    // a dozen (bin, count) rows for a 10..100 token domain
    assert(bins <= 16, s"token-count domain grew: $bins bins")
  }

  test("qs03: weighted and unweighted medians genuinely diverge at sf0.001") {
    // the operator's reason to exist: when weight correlates with
    // value, the mass-weighted median sits above the count median
    val rows = SparkEntry.queries("qs03_weighted_quantiles")(spark, sf0001)
      .select("plabel", "q_weighted")
      .as[(String, Long)].collect().toMap
    val docs = graft.queries.QueryDef.table(spark, sf0001, "documents")
      .select(graft.analytics.TextAnalysis.tokenCount(col("text"))
                .cast("long").as("v"),
              col("n_chars").cast("long").as("w"))
      .as[(Long, Long)].collect()
    // local weighted reference, straight from the definition
    val byV = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum)
      .toVector.sortBy(_._1)
    val wtot = byV.map(_._2).sum
    def weighted(num: Long, den: Long): Long = {
      val t = math.max(1L, (num * wtot + den - 1) / den)
      byV.scanLeft((0L, 0L)) { case ((_, c), (v, wv)) => (v, c + wv) }
        .drop(1).find(_._2 >= t).get._1
    }
    assert(rows("p50") == weighted(1, 2))
    assert(rows("p90") == weighted(9, 10))
    assert(rows("p99") == weighted(99, 100))
    // and it is NOT the unweighted median (chars grow with tokens)
    val sortedV = docs.map(_._1).sorted.toVector
    val countMedian = sortedV((sortedV.size + 1) / 2 - 1)
    assert(rows("p50") != countMedian,
      s"weighted median ${rows("p50")} degenerate to count median")
  }

  test("streaming incremental quantiles: planted shift moves the published tail") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("st25_").toString
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.incrementalQuantiles(
      mem.toDF().toDF("doc_id", "text"),
      s"$tmp/state", s"$tmp/store", s"$tmp/out", s"$tmp/ckpt")
    try {
      // batch 0: 9 docs of 2 tokens, 1 of 40 → p50 = 2, p90 = 2
      // (rank ceil(0.9·10) = 9), p99 = 40 (rank 10)
      mem.addData((1L to 9L).map(i => (i, "w w")) :+
        ((10L, Seq.fill(40)("w").mkString(" "))))
      q.processAllAvailable()
      // batch 1: twenty 40-token docs — the stream-so-far median jumps
      mem.addData((11L to 30L).map(i =>
        (i, Seq.fill(40)("w").mkString(" "))))
      q.processAllAvailable()
      def pub(b: Int) = spark.read.parquet(s"$tmp/out")
        .filter(col("batch_id") === b)
        .select("plabel", "q_exact", "n_stream")
        .as[(String, Long, Long)].collect().toSet
      assert(pub(0) == Set(("p50", 2L, 10L), ("p90", 2L, 10L),
        ("p99", 40L, 10L)))
      // so far: 9×2-token + 21×40-token, n=30 → ranks 15/27/30 all 40
      assert(pub(1) == Set(("p50", 40L, 30L), ("p90", 40L, 30L),
        ("p99", 40L, 30L)))
      // cross-batch state is the bounded histogram alone: two bins
      // (2 DIV 8 = 0, 40 DIV 8 = 5) — and no streaming state store
      val st = spark.read.parquet(s"$tmp/state/state_1")
        .as[(Long, Long)].collect().toMap
      assert(st == Map(0L -> 9L, 5L -> 21L), st.toString)
      assert(q.lastProgress.stateOperators.isEmpty ||
             q.lastProgress.stateOperators.forall(_.numRowsTotal == 0))
    } finally q.stop()
  }

  test("st25 batch form is row-equal to the streaming twin at sf0.001") {
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("st25t_").toString
    val docs = graft.queries.QueryDef.table(spark, sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    val q = graft.streaming.EventStreams.incrementalQuantiles(
      mem.toDF().toDF("doc_id", "text"),
      s"$tmp/state", s"$tmp/store", s"$tmp/out", s"$tmp/ckpt")
    try {
      mem.addData(docs.filter(_._1 % 2 == 0).toSeq)
      q.processAllAvailable()
      mem.addData(docs.filter(_._1 % 2 == 1).toSeq)
      q.processAllAvailable()
      val streamed = spark.read.parquet(s"$tmp/out")
        .select((col("batch_id") + 1).cast("int").as("epoch"),
                col("plabel"), col("q_exact"), col("n_stream"))
        .as[(Int, String, Long, Long)].collect().toSet
      val batch = SparkEntry.queries("st25_incremental_quantiles")(
        spark, sf0001).as[(Int, String, Long, Long)].collect().toSet
      assert(streamed == batch && batch.size == 6)
    } finally q.stop()
  }

  test("st25 matches a local exact computation at sf0.001") {
    val docs = graft.queries.QueryDef.table(spark, sf0001, "documents")
      .select(col("doc_id"),
        graft.analytics.TextAnalysis.tokenCount(col("text"))
          .cast("long").as("v"))
      .as[(Long, Long)].collect()
    val e1 = docs.collect { case (id, v) if id % 2 == 0 => v }
      .toVector.sorted
    val all = docs.map(_._2).toVector.sorted
    val want = (for {
      (epoch, s) <- Seq((1, e1), (2, all))
      (pl, num, den, _) <- PS
    } yield (epoch, pl, discQuantile(s, num, den), s.size.toLong)).toSet
    val got = SparkEntry.queries("st25_incremental_quantiles")(spark, sf0001)
      .as[(Int, String, Long, Long)].collect().toSet
    assert(got == want, s"got $got want $want")
  }
}
