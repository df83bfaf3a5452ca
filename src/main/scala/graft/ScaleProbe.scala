package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up probe: materializes an N×-replicated copy of the
  * `documents` / `embeddings` tables (ids offset per replica, text
  * salted per replica so replicas are near- but not exact duplicates —
  * the realistic high-dup-rate regime) and times the operators whose
  * cost could grow superlinearly: full-corpus MinHash+LSH, SimHash,
  * clustering, exact dedup, batch ANN.
  *
  * The point is the EXPONENT, not the absolute number: an operator
  * whose time grows ~N× when the corpus grows N× survives the 100 TB
  * scale-up; one that grows N²× does not.
  *
  * Usage: runMain graft.ScaleProbe [baseSfDir] [factor] [workDir]
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val factor = args.lift(1).map(_.toInt).getOrElse(10)
    val workDir = args.lift(2).getOrElse(
      s"${sys.props("java.io.tmpdir")}/graft-scale$factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs0 = spark.read.parquet(s"$baseDir/documents.parquet")
    val emb0 = spark.read.parquet(s"$baseDir/embeddings.parquet")
    // stride by max(id)+1, not count: a sparse id space with
    // max > count would make replica id ranges collide and corrupt
    // the very dedup measurements the probe exists to take
    val nDocs0 = docs0.agg(max("doc_id")).head().getLong(0) + 1
    val nEmb0 = emb0.agg(max("vec_id")).head().getLong(0) + 1

    def replicate(df: DataFrame, idCol: String, idStride: Long,
                  salt: Option[String]): DataFrame = {
      val k = explode(sequence(lit(0), lit(factor - 1))).as("__k")
      val rep = df.select(col("*"), k)
        .withColumn(idCol, col(idCol) + col("__k") * idStride)
      salt.fold(rep.drop("__k")) { textCol =>
        // distinct replica suffix: near-dup of the original, so fuzzy
        // dedup has real work (realistic crawl-duplication shape)
        rep.withColumn(textCol,
            concat(col(textCol), lit(" replica"), col("__k")))
          .drop("__k")
      }
    }

    replicate(docs0, "doc_id", nDocs0, Some("text"))
      .write.mode("overwrite").parquet(s"$workDir/documents.parquet")
    replicate(emb0, "vec_id", nEmb0, None)
      .write.mode("overwrite").parquet(s"$workDir/embeddings.parquet")
    // events scale by adding USERS (ids offset per replica), keeping
    // per-user event density constant — the realistic growth axis for
    // sessionization / as-of / window pipelines
    val ev0 = graft.queries.QueryDef.eventsTable(spark, baseDir)
    val evStride = ev0.agg(max("event_id")).head().getLong(0) + 1
    val userStride = ev0.agg(max("user_id")).head().getLong(0) + 1
    ev0.select(col("*"),
        explode(sequence(lit(0), lit(factor - 1))).as("__k"))
      .withColumn("event_id", col("event_id") + col("__k") * evStride)
      .withColumn("user_id", col("user_id") + col("__k") * userStride)
      .drop("__k")
      .write.mode("overwrite").parquet(s"$workDir/events.parquet")

    def time(name: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"$name","sec":$dt%.2f,"rows":$n,"factor":$factor}""")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
    }

    val names = if (args.length > 3) args.drop(3).toSet else Set.empty[String]
    def enabled(n: String) = names.isEmpty || names.contains(n)
    import graft.analytics.{Dedup, IvfIndex, Similarity}
    import graft.queries.QueryDef.table

    if (enabled("dd01")) time("dd01_exact_dedup") {
      SparkEntry.queries("dd01_exact_dedup")(spark, workDir).count()
    }
    if (enabled("dd02")) time("dd02_minhash_lsh") {
      Dedup.minhashPairs(table(spark, workDir, "documents"),
                         shingleN = 3, minJaccard = 0.3).count()
    }
    if (enabled("dd03")) time("dd03_simhash") {
      Dedup.simhashPairs(spark, table(spark, workDir, "documents"),
                         maxHamming = 7).count()
    }
    if (enabled("dd06")) time("dd06_clusters") {
      Dedup.clusterPairs(
        Dedup.minhashPairs(table(spark, workDir, "documents"),
                           shingleN = 3, minJaccard = 0.3)
          .select("id_a", "id_b")).count()
    }
    if (enabled("ivf")) time("ivf_build") {
      IvfIndex.ensure(spark, workDir, IvfIndex.DefaultLists); 1L
    }
    if (enabled("ss04")) time("ss04_batch_ann") {
      Similarity.batchAnnTopK(spark, workDir, queryMaxId = 32L, k = 10,
        nLists = IvfIndex.DefaultLists, nProbe = IvfIndex.DefaultLists).count()
    }
    if (enabled("aj01")) time("aj01_asof_join") {
      SparkEntry.queries("aj01_asof_join")(spark, workDir).count()
    }
    if (enabled("st03")) time("st03_session_window") {
      SparkEntry.queries("st03_session_window")(spark, workDir).count()
    }
    if (enabled("st08")) time("st08_sessionize") {
      SparkEntry.queries("st08_sessionize")(spark, workDir).count()
    }
    spark.stop()
  }
}
