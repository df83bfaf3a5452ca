package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage costs of the two fold candidates the r16 HOF audit left
  * measured-DEFERRED (VERDICT r16 missing #3): dd08's span-coverage
  * interval-union fold and the chunk-pack
  * `array_join(transform(sort_array(collect_list(struct))))` shared by
  * tok02/dm08/cp07. Same protocol as [[Dq03Prof]] (which converted,
  * −28 %) and [[TokProf]] (which rejected, with numbers): time each
  * pipeline with the fold present vs replaced by a same-cardinality
  * cheap stand-in, so the difference IS the fold's share of the entry.
  * Usage: runMain graft.FoldProf [sfDir] */
object FoldProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def time(tag: String)(b: => Unit): Unit = {
      val t0 = System.nanoTime(); b
      println(f"$tag%-34s ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    noop(docs.select(col("doc_id"))) // warm the scan

    // ---- candidate 1: dd08 interval-union coverage fold ------------------
    // rebuild dd08's perDoc input (sorted duplicated-gram positions),
    // then time the tail with (a) size-only stand-in, (b) the HOF fold.
    val L = 20
    val gramsL =
      s"""CASE WHEN size(words) >= $L THEN
         |  transform(sequence(0, size(words) - $L),
         |            i -> concat_ws(' ', slice(words, i + 1, $L)))
         |ELSE cast(array() as array<string>) END""".stripMargin
    val words = docs
      .select(col("doc_id"),
              expr("filter(split(text, '\\\\s+'), w -> length(w) > 0)")
                .as("words"))
    val grams = words
      .select(col("doc_id"), posexplode(expr(gramsL)).as(Seq("p", "gram")))
      .withColumn("h1", xxhash64(col("gram")))
      .withColumn("h2", xxhash64(col("gram"), lit(1)))
      .select("doc_id", "p", "h1", "h2")
    val flagged = grams.groupBy("h1", "h2")
      .agg(countDistinct("doc_id").as("n_docs"))
      .filter(col("n_docs") >= 2).select("h1", "h2")
    val ps = grams.join(flagged, Seq("h1", "h2"), "left_semi")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(col("p"))).as("ps"))
    def covFold(c: Column): Column =
      aggregate(c,
        struct(lit(-1).as("end"), lit(0L).as("cov")),
        (acc, p) => {
          val start = greatest(p, acc("end") + lit(1))
          val add = greatest(p + lit(L) - start, lit(0))
          struct(greatest(acc("end"), p + lit(L) - 1).as("end"),
                 (acc("cov") + add.cast("long")).as("cov"))
        },
        acc => acc("cov"))
    time("dd08 pipeline, size-only")(noop(
      ps.select(col("doc_id"), size(col("ps")).as("n"))))
    time("dd08 pipeline, +HOF cov fold")(noop(
      ps.select(col("doc_id"), covFold(col("ps")).as("cov"))))
    time("dd08 size-only (2nd)")(noop(
      ps.select(col("doc_id"), size(col("ps")).as("n"))))
    time("dd08 +HOF cov fold (2nd)")(noop(
      ps.select(col("doc_id"), covFold(col("ps")).as("cov"))))
    // checkpointed isolation: the frame is materialized, so the timed
    // job is ONLY the fold (or its stand-in)
    val psCk = ps.localCheckpoint()
    time("dd08 ck size-only")(noop(
      psCk.select(col("doc_id"), size(col("ps")).as("n"))))
    time("dd08 ck +HOF cov fold")(noop(
      psCk.select(col("doc_id"), covFold(col("ps")).as("cov"))))
    // upper bound: EVERY gram position duplicated (the 100 TB worst
    // case where boilerplate floods the census) — fold work ∝ corpus
    // token count instead of the organic dup tail
    val allPs = words.select(col("doc_id"),
      expr(s"CASE WHEN size(words) >= $L THEN " +
        s"sequence(0, size(words) - $L) " +
        "ELSE cast(array() as array<int>) END").as("ps"))
      .localCheckpoint()
    time("dd08 ALLpos size-only")(noop(
      allPs.select(col("doc_id"), size(col("ps")).as("n"))))
    time("dd08 ALLpos +HOF cov fold")(noop(
      allPs.select(col("doc_id"), covFold(col("ps")).as("cov"))))
    time("dd08 ALLpos size-only (2nd)")(noop(
      allPs.select(col("doc_id"), size(col("ps")).as("n"))))
    time("dd08 ALLpos +HOF fold (2nd)")(noop(
      allPs.select(col("doc_id"), covFold(col("ps")).as("cov"))))

    // ---- candidate 2: chunk-pack sort+project+join fold ------------------
    // dm08's exact agg shape: collect_list(struct(pos, text)) per
    // (shard, seq) cell, then order-restore + join. Stand-in keeps the
    // same collect_list (the shuffle is identical) and replaces only
    // the sort+transform+join tail with size().
    val toks = docs.select(col("doc_id"), col("text"),
      expr("CAST(size(filter(split(text, '\\\\s+'), " +
        "w -> length(w) > 0)) AS LONG)").as("n_tokens"),
      (col("doc_id") / lit(1000)).cast("long").as("shard"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("doc_id")
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cells = toks
      .withColumn("cum", coalesce(sum("n_tokens").over(win), lit(0L)))
      .withColumn("seq_id", (col("cum") / lit(2048)).cast("long"))
      .withColumn("pos_in_seq",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy("shard", "seq_id").orderBy("doc_id")))
    def packAgg(tail: Column) = cells.groupBy("shard", "seq_id")
      .agg(count(lit(1)).as("n_docs"), tail.as("t"))
    val collected = collect_list(struct(col("pos_in_seq"), col("text")))
    time("pack, collect+size only")(noop(packAgg(size(collected))))
    time("pack, +sort_array")(noop(packAgg(size(sort_array(collected)))))
    time("pack, +sort+transform+join")(noop(packAgg(
      array_join(transform(sort_array(collected), p => p("text")), " "))))
    time("pack, collect+size (2nd)")(noop(packAgg(size(collected))))
    time("pack, +sort+tr+join (2nd)")(noop(packAgg(
      array_join(transform(sort_array(collected), p => p("text")), " "))))
    // checkpointed isolation for the pack tail: materialize the
    // collected cells, then time just the sort+transform+join
    val cellsCk = packAgg(collected).localCheckpoint()
    time("pack ck size-only")(noop(
      cellsCk.select(col("shard"), col("seq_id"), size(col("t")).as("n"))))
    time("pack ck sort+tr+join")(noop(
      cellsCk.select(col("shard"), col("seq_id"),
        array_join(transform(sort_array(col("t")), p => p("text")), " ")
          .as("seq_text"))))
    time("pack ck size-only (2nd)")(noop(
      cellsCk.select(col("shard"), col("seq_id"), size(col("t")).as("n"))))
    time("pack ck sort+tr+join (2nd)")(noop(
      cellsCk.select(col("shard"), col("seq_id"),
        array_join(transform(sort_array(col("t")), p => p("text")), " ")
          .as("seq_text"))))
    spark.stop()
  }
}
