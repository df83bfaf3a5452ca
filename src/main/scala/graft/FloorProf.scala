package graft

import org.apache.spark.sql.SparkSession

/** Decomposes the per-entry ORCHESTRATION FLOOR of the bench
  * (VERDICT r13 next-round #6: the driver total grew 174.8 → 277.5 s
  * over five rounds while the registry grew 190 → 227 — before the
  * 2× ceiling binds, the fixed per-entry cost needs a number and an
  * owner). Three measurements:
  *
  *  1. `noop_floor` — a trivial one-row noop-sink write, repeated: the
  *     irreducible scheduling + write-path cost every entry pays.
  *  2. For the N fastest entries (per the committed BENCH_QUERIES
  *     map): first-run latency split into BUILD (QueryDef.df plan
  *     construction, incl. any eager jobs) and EXEC (noop write =
  *     analysis + optimization + codegen compile + run).
  *  3. A SECOND exec of the same frame: Spark caches generated code
  *     by source, so exec₂ ≈ scheduling + run, and
  *     exec₁ − exec₂ ≈ the per-entry analysis/optimize/janino cost —
  *     the part a long-lived session would amortize but a fresh plan
  *     per entry cannot.
  *
  * Usage: runMain graft.FloorProf [nEntries] [sfDir]
  */
object FloorProf {
  def main(args: Array[String]): Unit = {
    val n = args.lift(0).map(_.toInt).getOrElse(50)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](body: => T): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // warm-up (Bench's contract)
    try SparkEntry.queries("q05_group_count")(spark, sfDir).count()
    catch { case _: Throwable => () }

    // 1. the pure write-path floor
    val floors = (1 to 20).map(_ => time(noop(spark.range(1).toDF("x"))))
    println(f"noop_floor: min=${floors.min}%.3f median=" +
      f"${floors.sorted.apply(floors.size / 2)}%.3f max=${floors.max}%.3f s")

    // 2+3. fastest-N entries from the committed per-query map
    val benchFile = new java.io.File("BENCH_QUERIES.json")
    val fastest: Seq[String] =
      if (benchFile.exists()) {
        val txt = scala.io.Source.fromFile(benchFile).mkString
        val m = """"([a-z0-9_]+)":([0-9.]+)""".r
        // registry names can appear TWICE in the artifact (the queries
        // map and the serve_only map share keys, ADVICE r14) — dedupe
        // by name keeping the min so no entry ranks or profiles twice
        m.findAllMatchIn(txt)
          .map(x => x.group(1) -> x.group(2).toDouble)
          .filter { case (k, _) => SparkEntry.registry.exists(_.name == k) }
          .toSeq.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).min }
          .toSeq.sortBy(_._2).take(n).map(_._1)
      } else SparkEntry.registry.take(n).map(_.name)

    var sumBuild = 0.0; var sumE1 = 0.0; var sumE2 = 0.0
    var counted = 0
    fastest.foreach { name =>
      val q = SparkEntry.registry.find(_.name == name).get
      try {
        var frame: org.apache.spark.sql.DataFrame = null
        val tb = time { frame = q.df(spark, sfDir) }
        val e1 = time(noop(frame))
        val e2 = time(noop(frame))
        sumBuild += tb; sumE1 += e1; sumE2 += e2; counted += 1
        println(f"$name%-40s build=$tb%6.3f exec1=$e1%6.3f exec2=$e2%6.3f")
      } catch { case e: Throwable =>
        println(s"$name FAILED: ${e.getMessage.take(120)}")
      }
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }
    println(f"TOTAL over $counted entries: build=$sumBuild%.1f s " +
      f"exec1=$sumE1%.1f s exec2=$sumE2%.1f s " +
      f"plan+codegen≈${sumE1 - sumE2}%.1f s " +
      f"(per entry: build=${sumBuild / counted}%.3f " +
      f"exec1=${sumE1 / counted}%.3f exec2=${sumE2 / counted}%.3f)")
    spark.stop()
  }
}
