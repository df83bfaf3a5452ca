package graft.analytics

import org.apache.spark.sql.SparkSession

/** Makes tp01's table profile LOAD-BEARING: the same statistics the
  * profile entry publishes (row count, per-column null count, NDV,
  * min/max) are persisted into the session catalog via
  * `ANALYZE TABLE … COMPUTE STATISTICS FOR COLUMNS`, where Spark's
  * cost-based optimizer reads them — so the numbers steer plans
  * instead of only feeding dashboards.
  *
  * Why this matters at 100 TB: AQE's runtime statistics only exist
  * AFTER a stage materializes — the initial join ORDER of a multi-way
  * join is fixed at planning time, and a wrong order materializes the
  * big intermediate before AQE can see it. Catalog column stats +
  * `spark.sql.cbo.joinReorder.enabled` let `CostBasedJoinReorder` pick
  * the small-intermediate order BEFORE anything runs; AQE then still
  * re-plans exchanges at runtime. The two are complementary — stats fix
  * the shape, AQE fixes the sizes (the PlanAuditSpec pin demonstrates a
  * 3-way join whose order only CBO+stats repairs).
  *
  * Scale shape of ANALYZE itself: per-column passes with partial
  * aggregation — exactly tp01's plan discipline (no Expand; see
  * `tp01_table_profile`'s comment); at a real deployment it runs on the
  * ingest schedule, not per query.
  */
object TableStats {

  /** Database name used for the stats-bearing external tables. */
  val StatsDb = "graft_stats"

  /** Register `tables` of the sfDir corpus as EXTERNAL parquet tables
    * in [[StatsDb]] (data stays in place — the catalog entry is
    * metadata only) and persist table + column statistics for each.
    * Idempotent: re-registering replaces the catalog entry and
    * recomputes stats, so regenerated data cannot serve stale numbers.
    * Columns default to every top-level leaf column of the file. */
  def analyze(spark: SparkSession, sfDir: String,
              tables: Seq[String],
              columnsFor: String => Seq[String] = _ => Nil): Unit =
    tables.foreach(t =>
      analyzePath(spark, t, s"$sfDir/$t.parquet", columnsFor(t)))

  /** Single-table [[analyze]] over an explicit data path — the form
    * the store maintenance path uses ([[graft.sinks.ArtifactStore
    * .compact]] re-ANALYZEs the freshly compacted store, the nightly
    * OPTIMIZE slot being exactly when production statistics refresh). */
  def analyzePath(spark: SparkSession, t: String, path: String,
                  columns: Seq[String] = Nil): Unit = {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $StatsDb")
    spark.sql(s"DROP TABLE IF EXISTS $StatsDb.$t")
    spark.catalog.createTable(s"$StatsDb.$t", path, "parquet")
    val cols = {
      if (columns.nonEmpty) columns
      else spark.table(s"$StatsDb.$t").schema
        // nested/array/map columns are not ANALYZE-supported; the
        // join-order decisions ride on scalar keys anyway
        .filter(f => f.dataType.typeName match {
          case "struct" | "array" | "map" => false
          case _ => true
        })
        .map(f => s"`${f.name}`")
    }
    spark.sql(
      s"ANALYZE TABLE $StatsDb.$t COMPUTE STATISTICS FOR COLUMNS " +
        cols.mkString(", "))
  }

  private val analyzedDir =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Per-table locks for [[memoized]] — interning through a map (not
    * `t.intern.synchronized`) keeps the lock objects private to this
    * memo. Bounded: one entry per distinct table name per JVM. */
  private val memoLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** At-most-once-per-key claim WITH retry-after-failure (ADVICE r16):
    * the bare get→analyze→put sequence let two concurrent same-JVM
    * callers both run ANALYZE (or both stage an overwrite write to the
    * same external-table path); a put-first claim made a mid-ANALYZE
    * throw poison the memo (ADVICE r15). Serializing the check+work+
    * record per TABLE KEY gives both properties: the second caller
    * blocks, re-checks under the lock, and sees either the completed
    * memo (skip) or — if the first caller threw — an unset memo
    * (retry). Distinct tables still proceed in parallel. */
  private def memoized(t: String, key: String)(work: => Unit): Unit = {
    val lock = memoLocks.computeIfAbsent(t, _ => new Object)
    lock.synchronized {
      if (analyzedDir.get(t) != key) {
        work
        analyzedDir.put(t, key)
      }
    }
  }

  /** Fingerprint of one table's parquet CONTENT (per-part name,
    * length, mtime — the same form [[IvfIndex.contentStamp]] uses for
    * index dirs). Folded into [[ensure]]'s memo key so regenerating or
    * appending data at the SAME path re-ANALYZEs instead of leaving
    * tp02 planning under stale row counts / NDV (the r13 memo was
    * path-only — a 100×-stale NDV can make CBO pick a WORSE join
    * order than no stats, silently). Local-FS walk; an HDFS/object
    * store deployment folds FileStatus length+mtime the same way. */
  private[analytics] def contentStamp(path: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else Seq(f)
    val root = new java.io.File(path).toPath.toAbsolutePath
    // the signature keys each file by its path RELATIVE TO THE TABLE
    // ROOT, not just its name (ADVICE r14: same-named parts moved
    // between subdirectories — partition re-layout — must re-ANALYZE),
    // and folds through a 64-bit hash (two independent murmur seeds)
    // so a stamp collision needs ~2^32 distinct states, not ~2^16
    val sig = walk(root.toFile)
      .map { f =>
        val rel = root.relativize(f.toPath.toAbsolutePath)
        s"$rel:${f.length}:${f.lastModified}"
      }
      .sorted.mkString("|")
    f"${scala.util.hashing.MurmurHash3.stringHash(sig, 0x9747b28c)}%08x" +
      f"${scala.util.hashing.MurmurHash3.stringHash(sig, 0x5bd1e995)}%08x"
  }

  /** Idempotent per-JVM [[analyze]]: one ANALYZE per (table, data dir,
    * content stamp) per JVM lifetime — the ingest-schedule contract the
    * CBO-planned registry entry (tp02) relies on. ANALYZE is an OFFLINE
    * step by the same contract as every index build here (Bench stages
    * it in warm-up; Verify pays it once per corpus). Re-pointing a
    * table at a DIFFERENT corpus dir — or regenerating/appending the
    * data under the SAME dir — re-analyzes, so stale stats cannot
    * serve a changed corpus. */
  def ensure(spark: SparkSession, sfDir: String,
             tables: Seq[String]): Unit = tables.foreach { t =>
    val key = s"$sfDir@${contentStamp(s"$sfDir/$t.parquet")}"
    // memo AFTER success, under the per-table lock: a throw leaves the
    // memo unset (retry next call), and concurrent same-JVM callers
    // cannot both run ANALYZE (ADVICE r15 + r16)
    memoized(t, key) { analyze(spark, sfDir, Seq(t)) }
  }

  /** Stage the PLANTED-ZIPF derived table (orders + `skey`, see
    * [[graft.operators.SkewData]]) as a managed [[StatsDb]] table and
    * ANALYZE it — with EQUI-HEIGHT HISTOGRAMS on the skewed key when
    * `histogram` is set (the statistic that corrects range-predicate
    * selectivity on skewed data; basic min/max/NDV stats interpolate
    * uniformly and mis-estimate the hot range ~300×), without them for
    * the basic-stats comparison twin (PlanAuditSpec). Offline by the
    * ingest-schedule contract like every ANALYZE here; content-stamped
    * against the SOURCE table so regenerated data re-stages. Returns
    * the table name. */
  def ensureSkewedOrders(spark: SparkSession, sfDir: String,
                         histogram: Boolean): String = {
    val t = if (histogram) "orders_skewed" else "orders_skewed_basic"
    val key = s"$sfDir@${contentStamp(s"$sfDir/orders.parquet")}@h=$histogram"
    // memo is recorded only after the staging write + ANALYZE complete
    // (end of the memoized block): a throw mid-stage leaves the memo
    // unset so the next same-JVM call re-stages instead of planning
    // tp03 against a partial or stats-less table (ADVICE r15); the
    // per-table lock keeps two concurrent callers from both staging an
    // overwrite write to the same external-table path (ADVICE r16)
    memoized(t, key) {
      // external-table staging (the analyzePath form): a managed
      // saveAsTable trips over a previous JVM's leftover warehouse
      // directory (DROP TABLE clears only the in-memory catalog) —
      // a plain path write overwrites cleanly, then the catalog entry
      // is metadata over it
      val loc = s"${spark.conf.get("spark.sql.warehouse.dir")}" +
        s"/graft_derived/$t"
      spark.read.parquet(s"$sfDir/orders.parquet")
        .withColumn("skey", graft.operators.SkewData.zipfKey(
          org.apache.spark.sql.functions.col("o_orderkey")))
        .write.mode("overwrite").parquet(loc)
      spark.sql(s"CREATE DATABASE IF NOT EXISTS $StatsDb")
      spark.sql(s"DROP TABLE IF EXISTS $StatsDb.$t")
      spark.catalog.createTable(s"$StatsDb.$t", loc, "parquet")
      val conf = spark.conf
      val hk = "spark.sql.statistics.histogram.enabled"
      val saved = conf.getOption(hk)
      conf.set(hk, histogram.toString)
      try spark.sql(s"ANALYZE TABLE $StatsDb.$t COMPUTE STATISTICS " +
                    "FOR COLUMNS skey, o_custkey, o_totalprice")
      finally saved match {
        case Some(v) => conf.set(hk, v)
        case None => conf.unset(hk)
      }
    }
    t
  }

  /** Run `body` with the cost-based optimizer (and its stats-driven
    * join reorder) enabled, restoring the previous configuration
    * after. CBO only acts where catalog stats exist, so flipping it on
    * session-wide is safe — but scoping keeps test plans explicit. */
  def withCbo[T](spark: SparkSession)(body: => T): T = {
    val conf = spark.conf
    val keys = Seq("spark.sql.cbo.enabled",
                   "spark.sql.cbo.joinReorder.enabled")
    val saved = keys.map(k => k -> conf.getOption(k))
    keys.foreach(conf.set(_, "true"))
    try body
    finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
