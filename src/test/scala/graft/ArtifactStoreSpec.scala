package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sinks.ArtifactStore

/** K1/K2 store semantics: partitioned layout, idempotent re-ingest,
  * partition pruning visible in the physical plan. */
class ArtifactStoreSpec extends SparkSpec {
  import spark.implicits._

  private def batch(ids: Seq[Long], cls: String) =
    ids.map(i => (i, s"title$i", cls)).toDF("id", "title", "classification")

  test("append-ignore drops PK duplicates across batches and within a batch") {
    val path = Files.createTempDirectory("store").toString + "/meta"
    ArtifactStore.create(batch(Seq(1L, 2L, 3L), "Coins"), path)
    // second batch: 2,3 already exist; 4 is new and duplicated in-batch
    ArtifactStore.appendIgnore(spark,
      batch(Seq(2L, 3L, 4L, 4L), "Paintings"), path)
    val stored = ArtifactStore.read(spark, path)
    assert(stored.count() == 4)
    assert(stored.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L, 4L))
    // replay of the whole second batch is a no-op (idempotent)
    ArtifactStore.appendIgnore(spark, batch(Seq(2L, 3L, 4L), "Paintings"), path)
    assert(ArtifactStore.read(spark, path).count() == 4)
  }

  test("compaction collapses per-batch small files, preserves rows and layout") {
    val path = Files.createTempDirectory("store").toString + "/meta"
    ArtifactStore.create(batch(Seq(1L), "Coins"), path)
    // many tiny incremental loads → many small files
    (2L to 9L).foreach(i => ArtifactStore.appendIgnore(spark, batch(Seq(i), "Coins"), path))
    def dataFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
    }
    val before = dataFiles().size
    assert(before >= 9, s"expected many small files, saw $before")
    ArtifactStore.compact(spark, path)
    assert(dataFiles().size < before)
    val stored = ArtifactStore.read(spark, path)
    assert(stored.count() == 9)
    assert(stored.select("id").as[Long].collect().sorted.toSeq == (1L to 9L))
    assert(stored.columns.contains("classification")) // layout preserved
  }

  test("interrupted compaction is recoverable at every step") {
    import org.apache.hadoop.fs.Path
    def freshStore() = {
      val path = Files.createTempDirectory("store").toString + "/meta"
      ArtifactStore.create(batch(Seq(1L, 2L, 3L), "Coins"), path)
      path
    }
    def fs(path: String) =
      new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def assertIntact(path: String): Unit = {
      val stored = ArtifactStore.read(spark, path)
      assert(stored.select("id").as[Long].collect().sorted.toSeq == Seq(1L, 2L, 3L))
      assert(!fs(path).exists(new Path(path + "__old")))
      assert(!fs(path).exists(new Path(path + "__compacting")))
    }

    // state A: crash after staging, before any rename (live + staged)
    val a = freshStore()
    ArtifactStore.read(spark, a).write.parquet(a + "__compacting")
    ArtifactStore.recoverCompaction(spark, a)
    assertIntact(a)

    // state B: crash between the renames with a COMPLETE staged copy
    // (no live, __old + __compacting) → recovery finishes the swap
    val b = freshStore()
    ArtifactStore.read(spark, b).write.parquet(b + "__compacting")
    assert(fs(b).rename(new Path(b), new Path(b + "__old")))
    ArtifactStore.recoverCompaction(spark, b)
    assertIntact(b)

    // state C: crash between the renames with an INCOMPLETE staged copy
    // (no _SUCCESS) → recovery restores the pre-compaction copy
    val c = freshStore()
    ArtifactStore.read(spark, c).write.parquet(c + "__compacting")
    fs(c).delete(new Path(c + "__compacting/_SUCCESS"), false)
    assert(fs(c).rename(new Path(c), new Path(c + "__old")))
    ArtifactStore.recoverCompaction(spark, c)
    assertIntact(c)

    // state D: crash after the swap, before the __old cleanup
    val d = freshStore()
    ArtifactStore.read(spark, d).write.parquet(d + "__old")
    ArtifactStore.recoverCompaction(spark, d)
    assertIntact(d)

    // compact() fails fast on leftovers instead of clobbering them, and
    // leaves the live store readable
    val e = freshStore()
    ArtifactStore.read(spark, e).write.parquet(e + "__old")
    intercept[IllegalStateException] { ArtifactStore.compact(spark, e) }
    assert(ArtifactStore.read(spark, e).count() == 3)
    // after recovery, compact proceeds normally
    ArtifactStore.recoverCompaction(spark, e)
    ArtifactStore.compact(spark, e)
    assertIntact(e)
  }

  test("classification filter prunes partitions at the scan") {
    val path = Files.createTempDirectory("store").toString + "/meta"
    ArtifactStore.create(
      batch(Seq(1L, 2L), "Coins").union(batch(Seq(3L, 4L), "Paintings")), path)
    val q = ArtifactStore.read(spark, path)
      .filter(col("classification") === "Coins")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
           plan.contains("classification"))
    assert(q.count() == 2)
    // pruned scan reads only the Coins directory
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .map(_.toString).mkString
    assert(scanned.contains("classification=Coins") ||
           scanned.contains("PartitionFilters: [isnotnull(classification"))
  }
}
