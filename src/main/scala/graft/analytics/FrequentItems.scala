package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MisraGriesAgg
import graft.queries.QueryDef

/** Sketch-based frequent-items operators: the scale path for the
  * "which grams dominate the corpus" question that tx07/bp01 answer
  * with an exact census.
  *
  * The census shape (`GROUP BY gram` over every gram) shuffles the full
  * vocabulary — at 100 TB the vocabulary IS the data, and that shuffle
  * is the job. The sketch shape runs the classic two-pass heavy-hitters
  * algorithm instead:
  *
  *  1. one map-side pass folds every partition's gram stream into a
  *     bounded Misra–Gries summary ([[graft.functions.MisraGriesAgg]],
  *     native `TypedImperativeAggregate`, partial-aggregated like any
  *     COUNT) — the shuffle moves ONE ≤k-entry summary per partition
  *     (per group), independent of corpus size;
  *  2. a second pass counts ONLY the ≤k surviving candidates exactly
  *     and keeps those above the frequency threshold.
  *
  * The MG guarantee (any item with true count > N/(k+1) survives every
  * merge order) makes the candidate set a superset of the true heavy
  * hitters, so the thresholded exact recount — the only thing the entry
  * emits — is deterministic and hash-checkable even though the sketch
  * content itself is merge-order dependent. Total cost: two map-side
  * scans + a candidates-sized shuffle, vs one scan + a vocabulary-sized
  * shuffle; at crawl scale the second trade is the one that falls over.
  *
  * Reference anchor: the reference app's per-column frequency views
  * (harvard_artifacts_app.py:289-313, the GROUP BY/COUNT templates) are
  * census-shaped; these entries are the bounded-memory form a 100 TB
  * deployment of the same questions needs.
  */
object FrequentItems {
  import QueryDef.table

  /** fi01's summary size = its inverse frequency threshold: guarantee
    * needs k+1 > threshold divisor, so k = T keeps every true heavy
    * hitter (count·T > N ⟹ count > N/(k+1)) in the candidate set. */
  private val K1 = 800

  /** fi02 per-group parameters: T=500 with k=512 ≥ T−1. */
  private val K2 = 512
  private val T2 = 500

  /** Whitespace-token bigram stream, lower-cased — the same expansion
    * tx07 censuses, factored here over an arbitrary key prefix. */
  private[graft] def bigrams(docs: DataFrame, keep: Column*): DataFrame = {
    val toks = filter(split(lower(trim(col("text"))), "\\s+"),
                      t => length(t) > 0)
    docs
      .select(keep :+ toks.as("__toks"): _*)
      .select(keep :+ explode(zip_with(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
        slice(col("__toks"), lit(2), greatest(size(col("__toks")) - 1, lit(0))),
        (a, b) => concat(a, lit(" "), b))).as("ngram"): _*)
  }

  private val bigramsSql =
    """WITH t AS (
      |  SELECT source,
      |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
      |                tk -> len(tk) > 0) AS toks
      |  FROM documents),
      |g AS (
      |  SELECT source,
      |    unnest(list_transform(range(len(toks) - 1),
      |      i -> toks[i+1] || ' ' || toks[i+2])) AS ngram
      |  FROM t)""".stripMargin

  val all: Seq[QueryDef] = Seq(
    QueryDef(
      "fi01_heavy_hitters",
      // corpus-wide heavy bigrams: every bigram above 1/800 of the
      // stream, with its exact count. Pass 1 folds the stream into one
      // global MG(800) summary + the stream total in the same
      // aggregate (one scan, two partial-aggregated states); pass 2
      // recounts the ≤800 candidates exactly. The candidate frame is
      // ≤k rows BY CONSTRUCTION (not a data-dependent census like
      // bp01's), so the broadcast hint is sound at any corpus size.
      (s, d) => {
        MisraGriesAgg.register(s)
        val grams = bigrams(table(s, d, "documents"))
        val sketch = grams.agg(
          call_function(MisraGriesAgg.fnName, col("ngram"), lit(K1))
            .as("mg"),
          count(lit(1)).as("n_stream"))
        val cands = sketch.select(
          explode(col("mg")).as("c"), col("n_stream"))
          .select(col("c.item").as("ngram"), col("n_stream"))
        grams.join(broadcast(cands), "ngram")
          .groupBy("ngram", "n_stream")
          .agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") * lit(K1) > col("n_stream"))
          .select("ngram", "n_occ", "n_stream")
          .orderBy(desc("n_occ"), asc("ngram"))
      },
      Some(s"""$bigramsSql,
              |tot AS (SELECT COUNT(*) AS n_stream FROM g)
              |SELECT ngram, COUNT(*) AS n_occ,
              |  (SELECT n_stream FROM tot) AS n_stream
              |FROM g GROUP BY ngram
              |HAVING COUNT(*) * $K1 > (SELECT n_stream FROM tot)
              |ORDER BY n_occ DESC, ngram""".stripMargin)
    ),
    QueryDef(
      "fi02_grouped_heavy_hitters",
      // per-source heavy bigrams (per-domain boilerplate candidates):
      // one MG(512) summary per source, exact recount of the per-source
      // candidates, threshold 1/500 of that source's stream. NO
      // broadcast hint on the refine join: per-GROUP candidates are
      // bounded (≤k each) but the group count is a corpus property — a
      // crawl keyed by registered domain has millions of groups, and a
      // mandatory broadcast of groups×k rows bypasses AQE's size check
      // exactly like bp01's census would. Unhinted, AQE broadcasts the
      // 20-source fixture and shuffles on (source, ngram) at scale.
      (s, d) => {
        MisraGriesAgg.register(s)
        val grams = bigrams(table(s, d, "documents"), col("source"))
        val sketch = grams.groupBy("source").agg(
          call_function(MisraGriesAgg.fnName, col("ngram"), lit(K2))
            .as("mg"),
          count(lit(1)).as("n_stream"))
        val cands = sketch.select(
          col("source"), explode(col("mg")).as("c"), col("n_stream"))
          .select(col("source"), col("c.item").as("ngram"),
                  col("n_stream"))
        grams.join(cands, Seq("source", "ngram"))
          .groupBy("source", "ngram", "n_stream")
          .agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") * lit(T2) > col("n_stream"))
          .select("source", "ngram", "n_occ", "n_stream")
          .orderBy(asc("source"), desc("n_occ"), asc("ngram"))
      },
      Some(s"""$bigramsSql,
              |st AS (SELECT source, COUNT(*) AS n_stream FROM g
              |       GROUP BY source)
              |SELECT g.source, g.ngram, COUNT(*) AS n_occ,
              |  MIN(st.n_stream) AS n_stream
              |FROM g JOIN st ON g.source = st.source
              |GROUP BY g.source, g.ngram
              |HAVING COUNT(*) * $T2 > MIN(st.n_stream)
              |ORDER BY g.source, n_occ DESC, ngram""".stripMargin)
    ),
    QueryDef(
      "st24_incremental_heavy_hitters",
      // streaming heavy hitters in batch form: documents arrive as two
      // micro-batches (doc_id parity); after each, the gate publishes
      // the heavy bigrams of the stream SO FAR. The cross-batch state
      // is the MG summary alone — epoch 2 REPLAYS epoch 1's emitted
      // (item, est) rows as a weighted stream into the new batch's
      // aggregate (`misra_gries(item, w, k)`), which is exactly an MG
      // merge of the persisted sketch, so the ≤N/(k+1) error bound and
      // the no-false-negative guarantee carry across the hand-off. A
      // bounded sketch, not a gram census, crosses the batch boundary.
      //
      // Each publish exact-recounts the ≤k candidates against the
      // stream-so-far (the retained corpus a curation gate stores
      // anyway — st11's store discipline); at real scale that recount
      // is scheduled per-N-batches like st22's segment merges, not per
      // micro-batch. Output (the thresholded exact recount) is
      // deterministic for any merge order, so the entry hash-checks.
      (s, d) => {
        MisraGriesAgg.register(s)
        val docs = table(s, d, "documents")
        val e1 = bigrams(docs.filter(col("doc_id") % 2 === 0))
        val e2 = bigrams(docs.filter(col("doc_id") % 2 === 1))
        val s1 = e1.agg(
          call_function(MisraGriesAgg.fnName, col("ngram"), lit(K1))
            .as("mg"),
          count(lit(1)).as("n1"))
        val cand1 = s1.select(explode(col("mg")).as("c"), col("n1"))
          .select(col("c.item").as("ngram"), col("n1").as("n_stream"))
        val hh1 = e1.join(broadcast(cand1), "ngram")
          .groupBy("ngram", "n_stream")
          .agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") * lit(K1) > col("n_stream"))
          .select(lit(1).as("epoch"), col("ngram"), col("n_occ"),
                  col("n_stream"))
        // epoch-2 sketch: persisted-summary replay + the new batch
        val replay = s1.select(explode(col("mg")).as("c"))
          .select(col("c.item").as("ngram"), col("c.est").as("w"),
                  lit(0L).as("is_raw"))
        val stream2 = e2.select(col("ngram"), lit(1L).as("w"),
                                lit(1L).as("is_raw"))
        val s2 = replay.unionByName(stream2).agg(
          call_function(MisraGriesAgg.fnName, col("ngram"), col("w"),
                        lit(K1)).as("mg"),
          sum(col("w") * col("is_raw")).as("n2"))
        val cand2 = s2.crossJoin(s1.select(col("n1")))
          .select(explode(col("mg")).as("c"),
                  (col("n1") + col("n2")).as("n_stream"))
          .select(col("c.item").as("ngram"), col("n_stream"))
        val hh2 = e1.unionByName(e2).join(broadcast(cand2), "ngram")
          .groupBy("ngram", "n_stream")
          .agg(count(lit(1)).as("n_occ"))
          .filter(col("n_occ") * lit(K1) > col("n_stream"))
          .select(lit(2).as("epoch"), col("ngram"), col("n_occ"),
                  col("n_stream"))
        hh1.unionByName(hh2)
          .orderBy(asc("epoch"), desc("n_occ"), asc("ngram"))
      },
      Some(s"""WITH t AS (
              |  SELECT doc_id % 2 AS par,
              |    list_filter(string_split_regex(lower(trim(text)), '\\s+'),
              |                tk -> len(tk) > 0) AS toks
              |  FROM documents),
              |g AS (
              |  SELECT par,
              |    unnest(list_transform(range(len(toks) - 1),
              |      i -> toks[i+1] || ' ' || toks[i+2])) AS ngram
              |  FROM t),
              |tot1 AS (SELECT COUNT(*) AS n FROM g WHERE par = 0),
              |tot AS (SELECT COUNT(*) AS n FROM g),
              |hh1 AS (
              |  SELECT 1 AS epoch, ngram, COUNT(*) AS n_occ,
              |    (SELECT n FROM tot1) AS n_stream
              |  FROM g WHERE par = 0 GROUP BY ngram
              |  HAVING COUNT(*) * $K1 > (SELECT n FROM tot1)),
              |hh2 AS (
              |  SELECT 2 AS epoch, ngram, COUNT(*) AS n_occ,
              |    (SELECT n FROM tot) AS n_stream
              |  FROM g GROUP BY ngram
              |  HAVING COUNT(*) * $K1 > (SELECT n FROM tot))
              |SELECT * FROM hh1 UNION ALL SELECT * FROM hh2
              |ORDER BY epoch, n_occ DESC, ngram""".stripMargin)
    ),
    QueryDef(
      "st26_incremental_vocab",
      // vocabulary-growth tracking across crawl batches — the third
      // mergeable-summary class after frequency (misra_gries) and
      // quantiles (histogram/GK): DISTINCT counts via DataSketches HLL
      // (Spark's `hll_sketch_agg`/`hll_union` built-ins). Per-source
      // bigram vocabulary after each of two micro-batches (doc_id
      // parity); the cross-batch state is the 2^12-register sketch
      // alone — epoch 2's estimate reads hll_union(sk1, sk2), never
      // epoch 1's grams. HLL registers are max-merged, so the sketch
      // is order- and partition-independent: deterministic for a fixed
      // input set. The emitted census is the EXACT distinct count
      // (oracle-replayable; at 100 TB the exact side is the driver-
      // gate audit — the x14 discipline — and production publishes
      // the estimate) plus the estimate-within-bound audit boolean
      // (5% ∨ ±8 slack vs DataSketches' ~1.6% RSE at lgK 12, and the
      // whole pipeline is deterministic, so the boolean is stable).
      (s, d) => {
        val grams = bigrams(table(s, d, "documents"),
                            col("doc_id"), col("source"))
        val e1 = grams.filter(col("doc_id") % 2 === 0)
        val e2 = grams.filter(col("doc_id") % 2 === 1)
        val sk1 = e1.groupBy("source").agg(
          hll_sketch_agg(col("ngram"), 12).as("sk1"),
          countDistinct(col("ngram")).as("ndv1"))
        val sk2 = e2.groupBy("source").agg(
          hll_sketch_agg(col("ngram"), 12).as("sk2"))
        val nd12 = grams.groupBy("source")
          .agg(countDistinct(col("ngram")).as("ndv12"))
        def ok(est: Column, exact: Column): Column =
          abs(est - exact) <=
            greatest(exact.cast("double") * lit(0.05), lit(8.0))
        val ep1 = sk1.select(lit(1).as("epoch"), col("source"),
          col("ndv1").as("ndv_exact"),
          ok(hll_sketch_estimate(col("sk1")), col("ndv1")).as("hll_ok"))
        // the hand-off: union the persisted register state — a source
        // absent from one batch keeps the other's sketch verbatim
        val merged = when(col("sk1").isNull, col("sk2"))
          .when(col("sk2").isNull, col("sk1"))
          .otherwise(hll_union(col("sk1"), col("sk2")))
        val ep2 = sk1.join(sk2, Seq("source"), "full_outer")
          .join(nd12, "source")
          .select(lit(2).as("epoch"), col("source"),
            col("ndv12").as("ndv_exact"),
            ok(hll_sketch_estimate(merged), col("ndv12")).as("hll_ok"))
        ep1.unionByName(ep2).orderBy("epoch", "source")
      },
      Some("""WITH t AS (
             |  SELECT doc_id % 2 AS par, source,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |                tk -> len(tk) > 0) AS toks
             |  FROM documents),
             |g AS (
             |  SELECT par, source,
             |    unnest(list_transform(range(len(toks) - 1),
             |      i -> toks[i+1] || ' ' || toks[i+2])) AS ngram
             |  FROM t),
             |q AS (
             |  SELECT 1 AS epoch, source,
             |    COUNT(DISTINCT ngram) AS ndv_exact, true AS hll_ok
             |  FROM g WHERE par = 0 GROUP BY source
             |  UNION ALL
             |  SELECT 2, source, COUNT(DISTINCT ngram), true
             |  FROM g GROUP BY source)
             |SELECT * FROM q ORDER BY epoch, source""".stripMargin)
    ),
    QueryDef(
      "fi03_vocab_overlap",
      // pairwise cross-source vocabulary overlap — the "are these two
      // crawls secretly the same feed?" question — via HLL
      // inclusion–exclusion: |A∩B| ≈ est(A) + est(B) − est(A∪B). The
      // sketch algebra is what makes this tractable at 100 TB: the
      // per-source sketches are computed ONCE (one pass over the gram
      // stream, fixed 2^12-register state per source), and all
      // n·(n−1)/2 pair estimates come from register max-merges of that
      // driver-small sketch table — no pairwise gram join at all. The
      // exact intersection (distinct-(source,gram) self-join) is the
      // driver-gate audit, the x14 discipline: production publishes
      // the estimate, the gate recomputes the exact side and checks
      // the estimate's error against the union size (each of the
      // three estimates carries ~1.6% RSE on ITS OWN cardinality, so
      // the intersection's absolute error scales with |A|+|B|, not
      // |A∩B| — the bound reflects that). Everything is deterministic
      // for a fixed input set, so the audit boolean is hash-stable.
      (s, d) => {
        val grams = bigrams(table(s, d, "documents"), col("source"))
          .select("source", "ngram").distinct()
        val per = grams.groupBy("source").agg(
          hll_sketch_agg(col("ngram"), 12).as("sk"),
          count(lit(1)).as("ndv"))
        val a = per.select(col("source").as("s1"), col("sk").as("ska"),
                           col("ndv").as("n_a"))
        val b = per.select(col("source").as("s2"), col("sk").as("skb"),
                           col("ndv").as("n_b"))
        // ≤ n_sources² sketch rows — driver-small by construction
        val pairs = a.join(b, col("s1") < col("s2"))
        val inter = grams.select(col("source").as("s1"), col("ngram"))
          .join(grams.select(col("source").as("s2"), col("ngram")),
                "ngram")
          .filter(col("s1") < col("s2"))
          .groupBy("s1", "s2").agg(count(lit(1)).as("n_inter"))
        val est = hll_sketch_estimate(col("ska")) +
          hll_sketch_estimate(col("skb")) -
          hll_sketch_estimate(hll_union(col("ska"), col("skb")))
        pairs.join(inter, Seq("s1", "s2"), "left")
          .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
          .select(col("s1"), col("s2"), col("n_a"), col("n_b"),
            col("n_inter"),
            (abs(est - col("n_inter")) <=
              greatest((col("n_a") + col("n_b")).cast("double") * 0.05,
                       lit(32.0))).as("hll_ok"))
          .orderBy("s1", "s2")
      },
      Some("""WITH t AS (
             |  SELECT source,
             |    list_filter(string_split_regex(lower(trim(text)), '\s+'),
             |                tk -> len(tk) > 0) AS toks
             |  FROM documents),
             |g0 AS (
             |  SELECT source,
             |    unnest(list_transform(range(len(toks) - 1),
             |      i -> toks[i+1] || ' ' || toks[i+2])) AS ngram
             |  FROM t),
             |g AS (SELECT DISTINCT source, ngram FROM g0),
             |per AS (
             |  SELECT source, COUNT(*) AS ndv FROM g GROUP BY source),
             |ix AS (
             |  SELECT ga.source AS s1, gb.source AS s2,
             |    COUNT(*) AS n_inter
             |  FROM g ga JOIN g gb
             |    ON ga.ngram = gb.ngram AND ga.source < gb.source
             |  GROUP BY 1, 2)
             |SELECT pa.source AS s1, pb.source AS s2,
             |  pa.ndv AS n_a, pb.ndv AS n_b,
             |  COALESCE(ix.n_inter, 0) AS n_inter, true AS hll_ok
             |FROM per pa JOIN per pb ON pa.source < pb.source
             |LEFT JOIN ix ON ix.s1 = pa.source AND ix.s2 = pb.source
             |ORDER BY s1, s2""".stripMargin)
    )
  )
}
