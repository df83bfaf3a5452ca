package graft.analytics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Guarded broadcast for frames that are fixed-size BY CONVENTION —
  * benchmark/eval-suite sides (gram tables, embedding sets) that every
  * decon/audit plan forces through the driver. Nothing structural
  * enforces that convention: a "bench" frame wired to something that
  * scales with the corpus would sail through `broadcast()` locally and
  * OOM the driver at 100×. This seam makes the convention a CONTRACT:
  * the frame is counted once per (tag, plan) per JVM — bench frames
  * are per-corpus static, so a registry run pays one count per corpus,
  * not per entry — and a frame past the cap fails loudly with the
  * remediation (use the banded/shuffled path) instead of broadcasting.
  */
object Bounded {

  /** Default cap: ~2M rows of 64-float embeddings is ~600 MB — far
    * above any real eval suite, comfortably below the 8 GB broadcast
    * ceiling and a production driver heap. */
  val MaxBenchRows = 2000000L

  private val checked = new ConcurrentHashMap[String, java.lang.Long]()

  /** `broadcast(df)` with the bounded-bench contract asserted. The
    * cache key includes the logical plan's semantic hash AND a content
    * stamp of the scanned files (path + mtime + length), so the same
    * tag over different data (tests, multiple corpora in one JVM)
    * re-counts — and so does data REGENERATED IN PLACE at the same
    * path, which the plan hash alone cannot see. The count (a Spark
    * job) runs OUTSIDE the map's compute lambda: get-then-putIfAbsent
    * instead of computeIfAbsent, so no ConcurrentHashMap bin lock is
    * held for the job's duration (a concurrent duplicate count is
    * harmless; a stalled bin is not).
    *
    * The stamp resolves each file through Hadoop's `FileSystem` — not
    * `java.io.File`, which silently returns 0 for every non-local
    * scheme (hdfs://, s3a://) and would reduce the regenerated-in-place
    * guard to a no-op off local disk. `getModificationTime` is ms
    * precision from the store's own metadata; a file the stamp cannot
    * stat (deleted between planning and stamping) contributes a
    * distinct marker rather than a fake zero, so the key still changes
    * when the data does. */
  def broadcastBench(df: DataFrame, tag: String,
                     maxRows: Long = MaxBenchRows): DataFrame = {
    checkedRowCount(df, tag, maxRows)
    broadcast(df)
  }

  /** The count-and-assert half of [[broadcastBench]], exposed for
    * callers that need the bounded frame's ROW COUNT as well as the
    * contract (e.g. the decon serve sizing its band-bucket map chunks,
    * [[DataQuality.deconBenchBucketChunks]]) — same content-stamped
    * cache, so asking for the count and then broadcasting under the
    * same tag pays one count job, not two. */
  /** Identity of a frame's PLAN + DATA: the logical plan's semantic
    * hash joined with a content stamp of every scanned file (path,
    * mtime, length via Hadoop FileSystem — java.io.File returns fake
    * zeros off local disk). The key the bounded-count cache uses, and
    * the key any driver-side memo of a frame-derived value must use —
    * data regenerated in place changes the stamp, so a memo can never
    * serve a stale value for a changed corpus. */
  private[analytics] def planStamp(df: DataFrame): String = {
    val hconf = df.sparkSession.sparkContext.hadoopConfiguration
    val files = df.inputFiles.sorted.map { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      try {
        val st = path.getFileSystem(hconf).getFileStatus(path)
        s"$p@${st.getModificationTime}:${st.getLen}"
      } catch {
        case _: java.io.FileNotFoundException => s"$p@missing"
      }
    }
    df.queryExecution.logical.semanticHash() +
      ":" + java.util.Arrays.hashCode(files.asInstanceOf[Array[AnyRef]])
  }

  def checkedRowCount(df: DataFrame, tag: String,
                      maxRows: Long = MaxBenchRows): Long = {
    val key = tag + ":" + planStamp(df)
    val n = {
      val cached = checked.get(key)
      if (cached != null) cached.longValue()
      else {
        val counted = java.lang.Long.valueOf(df.count())
        val prev = checked.putIfAbsent(key, counted)
        (if (prev != null) prev else counted).longValue()
      }
    }
    require(n <= maxRows,
      s"bench/eval frame '$tag' has $n rows (bound $maxRows): a frame " +
        "that scales with the corpus must not be broadcast — route it " +
        "through the banded/shuffled path instead")
    n
  }
}
