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
    * cache key includes the logical plan's semantic hash, so the same
    * tag over different data (tests, multiple corpora in one JVM)
    * re-counts. */
  def broadcastBench(df: DataFrame, tag: String,
                     maxRows: Long = MaxBenchRows): DataFrame = {
    val key = tag + ":" + df.queryExecution.logical.semanticHash()
    val n = checked
      .computeIfAbsent(key, _ => java.lang.Long.valueOf(df.count()))
      .longValue()
    require(n <= maxRows,
      s"bench/eval frame '$tag' has $n rows (bound $maxRows): a frame " +
        "that scales with the corpus must not be broadcast — route it " +
        "through the banded/shuffled path instead")
    broadcast(df)
  }
}
