package graft.analytics

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.QueryDef

/** Training-data curation operators over the `documents` and `events`
  * tables: C4-style heuristic quality filters, Gopher-style repetition
  * metrics, benchmark decontamination via n-gram overlap, and log/PII
  * scrubbing with stable pseudonyms.
  *
  * These are the filter passes a pretraining pipeline runs between raw
  * crawl and tokenization (reference behavior: the app's quality gate is
  * a SQL WHERE; these generalize it to the document-curation family).
  * Scale shape: the per-doc metrics are map-only projections over a
  * column-pruned scan; the n-gram passes explode → one partially
  * aggregated groupBy; decontamination broadcast-joins the (small,
  * distinct) benchmark n-gram set against the corpus — no all-pairs
  * stage anywhere.
  */
object DataQuality {
  import QueryDef.table

  /** Shard count of the id03 sharded bloom gate — small here (the
    * fixture corpus is nowhere near the ~10⁹-gram single-filter
    * ceiling); the design is shard-count-agnostic and the anchor pins
    * correctness at any K. */
  val ShardedK = 4

  /** Whitespace word list (empty-token filtered, so both engines agree
    * on leading/trailing whitespace). */
  private val wordsExpr =
    "filter(split(text, '\\\\s+'), w -> length(w) > 0)"

  /** DuckDB replay of [[wordsExpr]] (string_split_regex keeps empty
    * leading tokens; filter them identically). */
  private val wordsSql =
    """list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0)"""

  /** DuckDB CTE chain replaying [[qualityFlags]]'s keep bit over the
    * documents matching `pred` — ends in `qk(doc_id, keep_quality)`.
    * Shared by oracles that compose the quality gate with other stages
    * (st20x); the standalone dq02/cp05 oracles keep their own inline
    * copies of the same text. */
  def qualityKeepCtesSql(pred: String): String =
    s"""qbase AS (
       |  SELECT doc_id, text, $wordsSql AS words,
       |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_word_chars
       |  FROM documents WHERE $pred),
       |qst AS (
       |  SELECT doc_id, text, n_word_chars,
       |    len(words) AS n_words, len(list_distinct(words)) AS n_distinct
       |  FROM qbase),
       |qk AS (
       |  SELECT doc_id,
       |    CAST(CAST(n_words BETWEEN 20 AND 10000 AS INT)
       |       * CAST(n_word_chars * 1.0 / greatest(n_words, 1) BETWEEN 3.0 AND 10.0 AS INT)
       |       * CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to|in)\\b')) > 0 AS INT)
       |       * CAST(NOT contains(text, '{') AS INT)
       |       * CAST(NOT contains(lower(text), 'lorem ipsum') AS INT)
       |       * CAST((n_words - n_distinct) * 1.0 / greatest(n_words, 1) <= 0.5 AS INT)
       |       AS INT) AS keep_quality
       |  FROM qst)""".stripMargin

  /** dq05: minimum per-source dq02 keep-rate for the source to survive
    * the reputation gate (the fixture's rates span 0.08–0.48, so 0.3
    * exercises both branches). */
  val SourceKeepRateMin = 0.3

  /** dc02: max-cosine-vs-benchmark threshold above which a corpus
    * vector is dropped as semantically contaminated (the fixture's
    * max-cos distribution has p90 ≈ 0.355, so 0.35 drops a real
    * ~10% tail). */
  val SemanticDeconTau = 0.35

  /** Size cap of the PRODUCTION benchmark suite (dc02/cp05/cp06's
    * vector-decon side). A real decontamination gate checks the corpus
    * against a FIXED eval suite — benchmarks do not grow with the
    * crawl, so the gate's cost is corpus × |suite|, LINEAR in the
    * corpus with a broadcastable constant side. The fixture's label-0
    * set scales with SF (a staging artifact no production system has),
    * which previously made the production-named entries quadratic in
    * SF; pinning the suite to a deterministic fixed-size hash-ordered
    * sample models the real invariant. NOT a silent cap: the full
    * label-0 set remains first-class in the exhaustive anchors
    * (dc02x/cp05x) and in dc03's banded serve + audits. Banding the
    * production gate instead was measured and rejected: sign-LSH at
    * 12×4-bit bands passes ~53% of UNIFORM 64-dim pairs as candidates
    * (the fixture's embeddings are hash noise — the adversarial case
    * for any geometric pruning), and any LSH gate at tau = 0.35
    * forfeits decision exactness, so the banded route is neither
    * faster here nor hash-replayable. */
  val BenchSuiteCap = 500

  /** The fixed-size suite: label-0 vectors in md5(vec_id) order (the
    * engine-portable deterministic shuffle every sampling gate here
    * uses — dm09/x21), first [[BenchSuiteCap]] rows. Below the cap
    * (small fixtures) this is the whole label-0 set, so sf0.01
    * results are unchanged from the uncapped form. */
  def benchSuite(emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    emb.filter(col("label") === 0)
      .orderBy(md5(col("vec_id").cast("string").cast("binary")),
               col("vec_id"))
      .limit(BenchSuiteCap)

  /** DuckDB replay of [[benchSuite]] as a CTE body (columns:
    * vec_id, embedding). */
  def benchSuiteSql: String =
    s"""SELECT vec_id, embedding FROM embeddings WHERE label = 0
       |  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
       |  LIMIT $BenchSuiteCap""".stripMargin

  /** dc03 banded-LSH config: `DeconLshBands` bands of `DeconLshRows`
    * sign bits each, carved out of ONE simhash signature (48 bits
    * total). At the recall-anchor stratum s = 0.9 the per-hyperplane
    * collision odds are p = 1 − acos(s)/π ≈ 0.856, so a ≥ 0.9-cosine
    * (corpus, bench) pair misses every band with probability
    * (1 − p⁴)¹² ≈ 9.5e-5 — the dd02r-style derived bound dc03r pins. */
  val DeconLshBands = 12
  val DeconLshRows = 4

  /** SELECTIVITY serving config (dc05, and the opt-in knob on the
    * streaming/curation gates): 8 bands × 7 rows = 56 sign bits.
    * FIXTURES.md §D measured the boundary this config serves: 12×4 is
    * a recall-anchor shape whose ~54 % candidate rate is CONFIG-bound
    * (no data distribution makes it prune), while 8×7 passes ~6.9 %
    * of pairs on clustered data (~6 % on noise — also config-bound)
    * at 99.94–99.96 % strong recall, 7.2× over exact at the 20 k
    * bench. Guidance: serve 12×4 when the drop set must be
    * anchor-exact (the dc03r 9.5e-5 miss bound), 8×7 when the bench
    * is ≥ ~10⁴ rows and order-of-magnitude pruning pays; 6×8 prunes
    * ~36× more at 99.2–99.6 % recall on CLUSTERED data only. */
  val DeconSelBands = 8
  val DeconSelRows = 7

  /** Bench-size boundary where the selectivity config starts winning
    * (FIXTURES.md §D item 3): cost_exact ∝ corpus × bench while
    * cost_banded ∝ corpus × (signature + cand_rate × bench), so at an
    * eval-suite-sized bench (~500) the recall-anchor shape costs the
    * same as any other and its 9.5e-5 miss bound is free, while past
    * ~10⁴ bench rows the 8×7 config's ~7 % candidate rate is an
    * order-of-magnitude wall-clock win (12.7× measured at 20 k). */
  val DeconAutoBenchThreshold = 10000L

  /** The measured config choice for a bench of `nBench` rows — the §D
    * crossover boundary as code, used by the STREAMING gate's auto
    * default ([[graft.streaming.EventStreams.deconGate]] with
    * bands = 0). The registry entries keep their EXPLICIT configs:
    * dc03/st18/st20 pin the 12×4 recall-anchor shape (their audit
    * bounds derive from it, and the scale gates replay them at corpora
    * whose bench crosses this threshold), dc05 pins 8×7. */
  def deconConfigFor(nBench: Long): (Int, Int) =
    if (nBench >= DeconAutoBenchThreshold) (DeconSelBands, DeconSelRows)
    else (DeconLshBands, DeconLshRows)

  /** dc02's LSH prefilter — the scale path for benchmark sets past
    * ~10⁵ rows (dc02's exact corpus×benchmark pass stays the small-set
    * fast path). Both sides hash once to a 48-bit sign signature
    * (map-only, no weight broadcast), split into [[DeconLshBands]]
    * band keys; candidates are (corpus, bench) pairs sharing ANY band
    * bucket, refined with EXACT cosine, dropped at the same
    * [[SemanticDeconTau]] gate. Refinement is exact, so the drop set is
    * always a SUBSET of dc02's (precision 1 by construction — dc03p);
    * recall is the banded-LSH bound above (dc03r). Scale shape: the
    * bench BAND INDEX is one broadcast row (a map from band key to its
    * bucket of (bench_id, qvec) entries — eval-suite-sized by the
    * [[Bounded]] contract); the corpus is a single MAP-ONLY projection
    * that looks up its 12 buckets per row, dedups the union, and takes
    * the exact-cosine max in-place. ZERO shuffle on candidate pairs —
    * the r12 100× gate killed the previous shuffled band equi-join: on
    * the fixture's hash-noise vectors ~54 % of all (corpus, bench)
    * pairs share a band, so the join materialized ~1.9e9 pair rows
    * (each carrying both 256-byte vectors, countDistinct forcing the
    * full pair set through an Exchange) and filled the disk at
    * sf10. The pair SCORING cost is inherent to banding noise; the
    * pair SHUFFLE never was. */
  def semanticDeconLshDrops(s: org.apache.spark.sql.SparkSession,
                            emb: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    semanticDeconLshDropsOf(s,
      emb.filter(col("label") =!= 0).select("vec_id", "embedding"),
      emb.filter(col("label") === 0)
        .select(col("vec_id").as("bench_id"), col("embedding")))

  /** [[semanticDeconLshDrops]] with the two sides passed explicitly —
    * the form the STREAMING gate needs (arriving corpus batch vs a
    * static benchmark frame, st18 / EventStreams.deconGate). `corpus`
    * carries (vec_id, embedding), `bench` (bench_id, embedding).
    * One-shot convenience: builds the bench bucket chunks inline.
    * Callers that score MANY slices against the same bench (streaming
    * gates, multi-batch chains) must prebuild with
    * [[deconBenchBucketChunks]] and call [[semanticDeconLshDropsWith]]
    * instead — rebuilding the bucket map per call was the structural
    * cause of st18's r12 2.7× regression. */
  def semanticDeconLshDropsOf(s: org.apache.spark.sql.SparkSession,
                              corpus: org.apache.spark.sql.DataFrame,
                              benchIn: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    semanticDeconLshDropsWith(s, corpus, deconBenchBucketChunks(benchIn))

  /** Rows per band-bucket map CHUNK. Each bench vector costs ~3 KB in
    * the map row (64-float qvec struct duplicated across its 12 band
    * entries' buckets amortizes to ~2.6 KB + key overhead), so 10 k
    * rows ≈ 30 MB — the largest SINGLE ROW we let a broadcast carry.
    * r12 built one map over the whole bench, which at [[Bounded]]'s
    * 100 k cap would have been a ~300 MB row on every task (latent:
    * production suites are [[BenchSuiteCap]]-sized). Larger benches now
    * split into ⌈n/chunk⌉ id-disjoint chunks, each its own one-row
    * broadcast crossJoined into the SAME map-only pass — max-cosine is
    * associative and the chunks partition bench ids, so per-chunk
    * distinct-candidate counts ADD: results are bit-identical to the
    * single-map form at any chunk size (pinned in DataQualitySpec).
    * The TOTAL broadcast footprint stays ~3 KB × bench rows (map-only
    * scoring requires every task to see every bench vector); that is
    * what the 100 k [[Bounded]] cap bounds at ~300 MB — a bench that
    * scales with the corpus must use the exact shuffled path, where
    * selectivity comes from data structure, not banding. */
  val DeconMapChunkRows = 10000L

  /** The bench side of the map-only banded decon serve, prebuilt: a
    * sequence of ONE-ROW frames, each a DENSE bucket table
    * `bkts: array<array<struct<bench_id, qvec>>>` of length
    * bands·2^rows indexed by slot = band·2^rows + bandKey (missing
    * slots null), over an id-disjoint chunk of the bench (see
    * [[DeconMapChunkRows]]). Dense indexing replaces the r12
    * string-keyed map: the scorer does an O(1) array load per band per
    * row instead of an O(#keys) UTF8String map scan. The bench-side
    * signature is the native [[graft.functions.SimhashSig]] (r15; the
    * HOF [[graft.functions.VectorOps.simhashBucket]] stays the
    * independent REFERENCE both the native sig and the corpus-side
    * scorer ([[graft.functions.DeconScore]]) are spec-pinned against).
    * Build ONCE per gate/stream, then score any number of slices with
    * [[semanticDeconLshDropsWith]]; callers that serve many batches
    * should `.localCheckpoint(true)` each frame so the simhash →
    * band-explode → groupBy → dense-table aggregation runs once, not
    * per micro-batch. */
  def deconBenchBucketChunks(benchIn: org.apache.spark.sql.DataFrame,
                             chunkRows: Long = DeconMapChunkRows,
                             bands: Int = DeconLshBands,
                             rows: Int = DeconLshRows)
      : Seq[org.apache.spark.sql.DataFrame] = {
    // (bands, rows) defaults to dc03's recall-anchored 12×4 config; the
    // clustered-fixture crossover probe (graft.DeconCrossover) passes
    // selectivity configs (e.g. 6×8) — same machinery, same scorer.
    val nBits = bands * rows
    require(nBits <= 63, s"signature does not fit one long: $nBits bits")
    // nSlots = bands << rows and the per-band slot base are Int
    // arithmetic: without this bound, e.g. (bands=2, rows=31) passes
    // the nBits check yet overflows to a negative slot base and a
    // silently broken bucket table. Mirrors DeconScore's guard.
    require(bands >= 1 && rows >= 1 && rows <= 24,
      s"need 1 <= rows <= 24 (slot arithmetic is Int), got " +
        s"($bands bands, $rows rows)")
    require(chunkRows >= 1, s"chunkRows must be positive: $chunkRows")
    val mask = (1L << rows) - 1
    val nSlots = bands << rows
    // bench-side signature: the native twin of the scorer's signature
    // (r15 — the HOF reference form evaluated nBits × dim interpreted
    // lambdas per row: invisible at a 199-row bench, two 7.6 s
    // single-task stages at dc06's 10⁴-row bench and worse at the 100×
    // corpus' organic 2·10⁴ bench; SimhashSigSpec pins native ≡ HOF
    // bit-for-bit, nulls and empties included)
    graft.functions.SimhashSig.register(benchIn.sparkSession)
    val benchSel = benchIn.select(col("bench_id"), col("embedding"))
    // same tag + content-stamped cache as a broadcastBench call, so
    // the count job is shared with any broadcast of the same frame
    val n = Bounded.checkedRowCount(benchSel, "decon.band-index",
                                    maxRows = 100000L)
    val k = math.max(1L, (n + chunkRows - 1) / chunkRows).toInt
    (0 until k).map { c =>
      val side =
        if (k == 1) benchSel
        else benchSel.filter(
          pmod(xxhash64(col("bench_id")), lit(k.toLong)) === c)
      side
        .withColumn("__sig",
          call_function(graft.functions.SimhashSig.fnName,
                        col("embedding"), lit(nBits)))
        .select(explode(array((0 until bands).map { b =>
          struct((lit(b << rows) +
                  shiftright(col("__sig"), b * rows)
                    .bitwiseAND(lit(mask)).cast("int")).as("slot"),
                 struct(col("bench_id"),
                        col("embedding").as("qvec")).as("e"))
        }: _*)).as("x"))
        .groupBy(col("x.slot").as("slot"))
        .agg(collect_list(col("x.e")).as("bucket"))
        .agg(map_from_entries(collect_list(struct(col("slot"), col("bucket"))))
               .as("m"))
        .select(transform(sequence(lit(0), lit(nSlots - 1)),
                          sl => element_at(col("m"), sl))
          // the chunk frame CARRIES its (bands, rows) in the column
          // metadata so the scorer can verify them: a config mismatch
          // between build and score silently empties every bucket
          // (total recall loss), and before this stamp the contract
          // was a doc comment only (ADVICE r15)
          .as("bkts", new org.apache.spark.sql.types.MetadataBuilder()
            .putLong(ChunkBandsKey, bands.toLong)
            .putLong(ChunkRowsKey, rows.toLong).build()))
    }
  }

  /** Column-metadata keys [[deconBenchBucketChunks]] stamps onto each
    * chunk's `bkts` column and [[semanticDeconScoredWith]] verifies. */
  private[graft] val ChunkBandsKey = "graft.decon.bands"
  private[graft] val ChunkRowsKey = "graft.decon.rows"

  /** The map-only scoring pass against PREBUILT bench bucket chunks:
    * ONE native [[graft.functions.DeconScore]] eval per corpus row per
    * chunk — signature, O(1) dense bucket loads, in-place exact-cosine
    * max and distinct-candidate count in a single primitive loop (the
    * r12 `transform`-lambda formulation evaluated interpreted at
    * ~76 ms/row — 136 s of executor CPU for 1 801 fixture rows). The
    * max over candidates is duplicate-insensitive so nothing is ever
    * materialized per row beyond the score struct; per-chunk maxima
    * combine with `greatest` (null-skipping, NaN-greatest — the same
    * double ordering as the scorer) and per-chunk distinct counts ADD
    * because the chunks partition bench ids. A corpus row whose
    * buckets are all empty yields a null max and falls out of the tau
    * filter, matching dc02's inner join. ZERO shuffle on candidate
    * pairs — the r12 100× gate killed the previous shuffled band
    * equi-join: on the fixture's hash-noise vectors ~54 % of all
    * (corpus, bench) pairs share a band, so the join materialized
    * ~1.9e9 pair rows and filled the disk at sf10. The pair SCORING
    * cost is inherent to banding noise; the pair SHUFFLE never was. */
  def semanticDeconLshDropsWith(s: org.apache.spark.sql.SparkSession,
                                corpus: org.apache.spark.sql.DataFrame,
                                chunks: Seq[org.apache.spark.sql.DataFrame],
                                bands: Int = DeconLshBands,
                                rows: Int = DeconLshRows)
      : org.apache.spark.sql.DataFrame =
    semanticDeconScoredWith(s, corpus, chunks, bands, rows)
      .filter(col("mc") >= SemanticDeconTau)
      .select(col("vec_id"), round(col("mc"), 6).as("max_cand_sim"),
              col("n_cand"))

  /** The scoring pass WITHOUT the tau filter: every corpus row's
    * (vec_id, mc, n_cand) — mc null when no band bucket held a
    * candidate. The drop gate above is a filter over this frame; the
    * crossover probe reads it directly to measure CANDIDATE RATES
    * (Σ n_cand / (corpus × bench)) per (bands, rows) config, which the
    * filtered form hides. `chunks` must be built with the same
    * (bands, rows) via [[deconBenchBucketChunks]]. */
  def semanticDeconScoredWith(s: org.apache.spark.sql.SparkSession,
                              corpus: org.apache.spark.sql.DataFrame,
                              chunks: Seq[org.apache.spark.sql.DataFrame],
                              bands: Int = DeconLshBands,
                              rows: Int = DeconLshRows)
      : org.apache.spark.sql.DataFrame = {
    require(chunks.nonEmpty, "at least one bench bucket chunk required")
    // Loud config check (ADVICE r15): score with the SAME (bands, rows)
    // the chunks were built with, or every dense-table slot lookup
    // lands in the wrong band partition and the gate silently passes
    // everything. Chunks built before the stamp existed (no metadata)
    // pass — the check tightens, never breaks, old callers.
    chunks.foreach { ch =>
      val md = ch.schema("bkts").metadata
      // both stamp keys or neither: a chunk carrying one but not the
      // other is a corrupt stamp, and reading the missing key would
      // throw a bare NoSuchElementException instead of the intended
      // loud message (ADVICE r16)
      require(md.contains(ChunkBandsKey) == md.contains(ChunkRowsKey),
        s"corrupt decon chunk stamp: bands key present=" +
          s"${md.contains(ChunkBandsKey)}, rows key present=" +
          s"${md.contains(ChunkRowsKey)} — rebuild the chunks via " +
          "deconBenchBucketChunks, which always writes both")
      if (md.contains(ChunkBandsKey)) {
        val (cb, cr) = (md.getLong(ChunkBandsKey), md.getLong(ChunkRowsKey))
        require(cb == bands && cr == rows,
          s"decon config mismatch: chunks built with (bands=$cb, " +
            s"rows=$cr) but scoring with (bands=$bands, rows=$rows) — " +
            "this would empty every bucket silently; thread the " +
            "RESOLVED config to both deconBenchBucketChunks and the " +
            "scoring call")
      }
    }
    graft.functions.DeconScore.register(s)
    // analysis resolves against the ROOT frame's session, which in the
    // streaming gates is the driving session, not the micro-batch
    // clone `s` — register on both (the CosineSim session-guard lesson)
    graft.functions.DeconScore.register(corpus.sparkSession)
    // The scoring pass is COMPUTE-dense (~bench/2 cosines per corpus
    // row), so byte-sized parquet splits starve it: at sf10 the whole
    // 200k-row corpus is two 128 MB splits = two tasks for 2.7e9
    // cosines. One linear round-robin shuffle of the (tiny) corpus
    // rows buys full-width parallelism at any scale.
    val joined = chunks.zipWithIndex.foldLeft(
      corpus.select(col("vec_id"), col("embedding"))
        .repartition(s.sparkContext.defaultParallelism)) {
      case (acc, (ch, c)) =>
        acc.crossJoin(broadcast(ch.select(col("bkts").as(s"__bkts_$c"))))
    }
    def score(c: Int) = call_function(
      graft.functions.DeconScore.fnName,
      col("embedding"), col(s"__bkts_$c"),
      lit(bands), lit(rows))
    val scored = joined.select(
      col("vec_id") +: chunks.indices.map(c => score(c).as(s"__s_$c")): _*)
    val mcs = chunks.indices.map(c => col(s"__s_$c").getField("mc"))
    val mc = if (mcs.size == 1) mcs.head else greatest(mcs: _*)
    val nCand = chunks.indices.map(c => col(s"__s_$c").getField("n_cand"))
      .reduce(_ + _)
    scored.select(col("vec_id"), mc.as("mc"), nCand.as("n_cand"))
  }

  /** (doc_id, g) rows: md5 keys of word `n`-grams of `docs.text` — the
    * shared gram pipeline behind the batch ingest gate (id01), the
    * incremental two-batch form (st11), and the streaming gate. Docs
    * shorter than `n` words contribute no rows (callers anchor their
    * output on a doc census so such docs still get a decision). */
  def gramKeys(docs: org.apache.spark.sql.DataFrame, n: Int = 5)
      : org.apache.spark.sql.DataFrame = {
    val gramsN =
      s"""CASE WHEN size(words) >= $n THEN
         |  transform(sequence(0, size(words) - $n),
         |            i -> md5(cast(concat_ws(' ', slice(words, i + 1, $n)) as binary)))
         |ELSE cast(array() as array<string>) END""".stripMargin
    docs.select(col("doc_id"), expr(wordsExpr).as("words"))
      .select(col("doc_id"), explode(expr(gramsN)).as("g"))
  }

  /** dq02's C4/Gopher per-document flag columns, shared with the
    * source-reputation gate (dq05). Mean word length is defined over
    * WORD characters (alphanumerics) per the C4/Gopher heuristic —
    * counting punctuation would shift the 3.0–10.0 band on
    * punctuation-heavy real corpora. The explicit [A-Za-z0-9] class
    * (not \w) keeps Java-regex and DuckDB-RE2 semantics identical.
    * Map-only: one codegen'd projection over the pruned scan. */
  def qualityFlags(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val base = docs
      .select(col("doc_id"), col("source"), col("text"),
              expr(wordsExpr).as("words"),
              length(regexp_replace(col("text"), "[^A-Za-z0-9]", ""))
                .as("n_word_chars"))
      .select(col("doc_id"), col("source"), col("text"), col("n_word_chars"),
              size(col("words")).as("n_words"),
              size(array_distinct(col("words"))).as("n_distinct"))
    base.select(
        col("doc_id"), col("source"), col("n_words"),
        round(col("n_word_chars") * lit(1.0) /
              greatest(col("n_words"), lit(1)), 4).as("mean_word_len"),
        round((col("n_words") - col("n_distinct")) * lit(1.0) /
              greatest(col("n_words"), lit(1)), 6).as("dup_word_frac"),
        col("n_words").between(20, 10000).cast("int").as("f_word_count"),
        (col("n_word_chars") * lit(1.0) /
          greatest(col("n_words"), lit(1))).between(3.0, 10.0)
          .cast("int").as("f_mean_word_len"),
        (regexp_count(col("text"), lit("\\b(the|a|and|of|to|in)\\b")) > 0)
          .cast("int").as("f_stopword"),
        (!col("text").contains("{")).cast("int").as("f_no_brace"),
        (!lower(col("text")).contains("lorem ipsum"))
          .cast("int").as("f_no_lorem"),
        ((col("n_words") - col("n_distinct")) * lit(1.0) /
          greatest(col("n_words"), lit(1)) <= 0.5)
          .cast("int").as("f_low_repetition"))
      .withColumn("keep",
        (col("f_word_count") * col("f_mean_word_len") * col("f_stopword") *
         col("f_no_brace") * col("f_no_lorem") * col("f_low_repetition"))
          .cast("int"))
  }

  /** NEAR-dup ingest gate against a standing corpus GRAM table — the
    * containment tier of the incremental gate (the exact-fingerprint
    * tier is `EventStreams.ingestGate`). For every doc in `newDocs`
    * (anchored on the full census, so docs too short to form a 5-gram
    * still get a decision): the fraction of its distinct word 5-grams
    * already present in `corpusGrams` (column `g`), and
    * keep = containment < `threshold` (the Lee et al. near-dup cut).
    * Backs the id01 registry entry, the two-batch incremental st11
    * form, and the streaming `EventStreams.incrementalGramGate`.
    *
    * Scale shape: the batch gram set broadcasts onto the corpus gram
    * scan; the corpus side flows map-only through one semi-join and is
    * never re-shuffled — duplicate rows in `corpusGrams` are harmless
    * (membership semantics), which is what lets the streaming form
    * append accepted grams without ever re-deduplicating the store. */
  def gramGate(newDocs: org.apache.spark.sql.DataFrame,
               corpusGrams: org.apache.spark.sql.DataFrame,
               threshold: Double = 0.5): org.apache.spark.sql.DataFrame = {
    val newG = gramKeys(newDocs).distinct()
    val batchGramSet = newG.select("g").distinct()
    val matched = corpusGrams.select("g")
      .join(broadcast(batchGramSet), Seq("g"), "left_semi").distinct()
    val hits = newG.join(broadcast(matched), Seq("g"), "left_semi")
      .groupBy("doc_id").agg(count(lit(1)).as("n_hit"))
    newDocs.select("doc_id")
      .join(newG.groupBy("doc_id").agg(count(lit(1)).as("n_grams")),
            Seq("doc_id"), "left")
      .join(hits, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
              round(col("n_hit") * lit(1.0) /
                    greatest(col("n_grams"), lit(1L)), 6).as("containment"),
              (col("n_hit") * lit(1.0) /
               greatest(col("n_grams"), lit(1L)) < threshold)
                .cast("int").as("keep"))
  }

  /** Bloom-filter tier of the ingest gate: same census-anchored
    * containment contract as [[gramGate]], but membership is a probe of
    * a prebuilt corpus-gram bloom filter ([[BloomGramIndex]]) instead
    * of a semi-join against the corpus gram table — the arriving batch
    * is the ONLY data scanned, so per-batch cost is independent of
    * corpus size (id01 re-scans the corpus every batch; at 100 TB that
    * scan dominates each ingest tick).
    *
    * One-sided error: `bloom_might_contain` is never false for an
    * inserted gram, so per-doc n_hit here ≥ the exact gate's n_hit and
    * keep = 1 here implies keep = 1 there (bloom-keep ⊆ exact-keep —
    * the gate can over-drop at the filter's fpp, never under-drop).
    * The id02x anchor pins both the subset direction and the realized
    * false-positive rate.
    *
    * Plan shape: the plan carries only the filter's PATH — the filter
    * itself loads once per executor through
    * [[graft.functions.BloomFilterCache]] (an in-plan literal filter is
    * re-deserialized per task: measured 2.7 s → 17.1 s on a fixed batch
    * as the filter grew 12 → 36 MB). The probe folds into the
    * batch-gram groupBy map-side, so the only shuffle carries one
    * (doc_id, counts) row per batch doc. */
  def bloomGate(spark: org.apache.spark.sql.SparkSession,
                newDocs: org.apache.spark.sql.DataFrame,
                filterPath: String, threshold: Double = 0.5)
      : org.apache.spark.sql.DataFrame =
    probeGate(newDocs,
      graft.functions.BloomProbeFile.probe(
        spark, lit(filterPath), xxhash64(col("g"))),
      threshold)

  /** [[bloomGate]] against a K-sharded filter family
    * ([[BloomGramIndex.ensureSharded]]): identical census-anchored
    * containment contract and one-sided error direction — each gram
    * probes the single shard its hash routes to, so the per-row cost
    * matches the single-filter gate while every filter buffer is 1/K
    * the size (the past-10⁹-grams growth path). */
  def bloomGateSharded(spark: org.apache.spark.sql.SparkSession,
                       newDocs: org.apache.spark.sql.DataFrame,
                       basePath: String, k: Int,
                       threshold: Double = 0.5)
      : org.apache.spark.sql.DataFrame =
    probeGate(newDocs,
      graft.functions.BloomProbeSharded.probe(
        spark, lit(basePath), lit(k), xxhash64(col("g"))),
      threshold)

  /** lm01's scored frame, one row per corpus document: `(doc_id, lang,
    * n_bigrams, fam_micro, p25_micro, p75_micro, bin)`. `fam_micro` is
    * the exact integer micro-score `(Σ corpus-bigram-count · 10⁶) div
    * n_bigrams` (see the lm01 entry for why integers); the cutoff
    * columns are the per-language P25/P75 over it (exact dyadic
    * doubles); `bin` ∈ head/middle/tail, or 'short' for docs with no
    * bigram (NULL fam_micro/cutoffs — the census anchor). Shared by
    * the lm01 report and the cp03 curriculum ordering. */
  def familiarityBins(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    val docs = table(s, d, "documents")
      .select(col("doc_id"), col("lang"), expr(wordsExpr).as("w"))
    val bigrams = docs.select(col("doc_id"), col("lang"),
      explode(expr(
        """zip_with(slice(w, 1, greatest(size(w) - 1, 0)),
          |         slice(w, 2, greatest(size(w) - 1, 0)),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
    val dict = bigrams.groupBy("bg").agg(count(lit(1)).as("n"))
    val fam = bigrams.join(dict, Seq("bg"))
      .groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"),
           expr("(sum(n) * 1000000L) div count(1)").as("fam_micro"))
    val cuts = fam.groupBy("lang")
      .agg(expr("percentile(fam_micro, 0.25)").as("p25m"),
           expr("percentile(fam_micro, 0.75)").as("p75m"))
    // cutoffs stay RAW micro-score doubles: quartiles of integers at
    // dyadic fractions are exact dyadic doubles, so no rounding is
    // needed — and rounding would REINTRODUCE the engine split (a
    // cutoff of x.5 µ lands exactly on a decimal tie, where Spark's
    // BigDecimal HALF_UP and DuckDB's double-rounding disagree).
    // fam_micro/10⁶ has exactly 6 decimal digits: no tie possible.
    val scored = fam.join(broadcast(cuts), Seq("lang"))
      .select(col("doc_id"), col("n_bigrams"), col("fam_micro"),
              col("p25m").as("p25_micro"), col("p75m").as("p75_micro"),
              when(col("fam_micro") < col("p25m"), "tail")
                .when(col("fam_micro") >= col("p75m"), "head")
                .otherwise("middle").as("bin"))
    docs.select("doc_id", "lang")
      .join(scored, Seq("doc_id"), "left")
      .withColumn("bin", coalesce(col("bin"), lit("short")))
  }

  /** Word-bigram rows `(doc_id, lang, bg)` of a documents frame — the
    * shared explode behind lm01's corpus scoring and the st15 routing
    * of arriving docs. */
  private def bigramsOf(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.select(col("doc_id"), col("lang"), expr(wordsExpr).as("w"))
      .select(col("doc_id"), col("lang"), explode(expr(
        """zip_with(slice(w, 1, greatest(size(w) - 1, 0)),
          |         slice(w, 2, greatest(size(w) - 1, 0)),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))

  /** The EPOCH ARTIFACT of familiarity routing: the corpus' bigram
    * dictionary and the per-language P25/P75 cutoffs of the corpus
    * docs' own scores (lm01's integer micro-score discipline). In a
    * continuously-fed pipeline this pair is computed once per corpus
    * epoch and persisted; every arriving batch scores against it with
    * no corpus IO ([[familiarityRouteFromModel]]). */
  def familiarityModel(corpusDocs: org.apache.spark.sql.DataFrame)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val dict = bigramsOf(corpusDocs).groupBy("bg")
      .agg(count(lit(1)).as("n"))
    val corpusFam = bigramsOf(corpusDocs).join(dict, Seq("bg"))
      .groupBy("doc_id", "lang")
      .agg(expr("(sum(n) * 1000000L) div count(1)").as("fam_micro"))
    val cuts = corpusFam.groupBy("lang")
      .agg(expr("percentile(fam_micro, 0.25)").as("p25m"),
           expr("percentile(fam_micro, 0.75)").as("p75m"))
    (dict, cuts)
  }

  /** Routes `newDocs` head/middle/tail/short under a corpus familiarity
    * model ([[familiarityModel]]): score = mean corpus frequency of the
    * doc's bigrams, bigrams ABSENT from the corpus dictionary counting
    * zero — novel text scores low and routes 'tail', which is the
    * point of the gate. A language with no cutoffs (never seen in the
    * corpus) routes 'tail' for the same reason. Census-anchored.
    *
    * Scale shape: the batch's bigram frame BROADCASTS onto the
    * dictionary scan (st11's discipline — the dictionary is 10⁹+ rows
    * at web scale and must never re-shuffle per batch); per-doc
    * aggregates shuffle only batch-sized frames; cutoffs broadcast. */
  def familiarityRouteFromModel(newDocs: org.apache.spark.sql.DataFrame,
                                dict: org.apache.spark.sql.DataFrame,
                                cuts: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val newBg = bigramsOf(newDocs)
    val counts = newBg.groupBy("doc_id")
      .agg(count(lit(1)).as("n_bigrams"))
    val sums = dict.join(broadcast(newBg), Seq("bg"))
      .groupBy("doc_id").agg(sum("n").as("s"))
    newDocs.select("doc_id", "lang")
      .join(counts, Seq("doc_id"), "left")
      .join(sums, Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"),
              coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
              when(coalesce(col("n_bigrams"), lit(0L)) > 0,
                   expr("(coalesce(s, 0L) * 1000000L) div n_bigrams"))
                .as("fam_micro"))
      .join(broadcast(cuts), Seq("lang"), "left")
      .select(col("doc_id"), col("lang"), col("n_bigrams"),
              round(col("fam_micro") / 1e6, 6).as("familiarity"),
              col("p25m").as("p25_micro"), col("p75m").as("p75_micro"),
              when(col("n_bigrams") === 0, "short")
                .when(col("p25m").isNull, "tail")
                .when(col("fam_micro") < col("p25m"), "tail")
                .when(col("fam_micro") >= col("p75m"), "head")
                .otherwise("middle").as("route"))
  }

  /** Shared tail of the membership-probe gates: per-doc gram census +
    * hit count under `hit`, containment, keep decision — anchored on
    * the full `newDocs` census so gram-less docs still decide. */
  private def probeGate(newDocs: org.apache.spark.sql.DataFrame,
                        hit: org.apache.spark.sql.Column,
                        threshold: Double)
      : org.apache.spark.sql.DataFrame = {
    val newG = gramKeys(newDocs).distinct()
    val per = newG.groupBy("doc_id").agg(
      count(lit(1)).as("n_grams"),
      sum(when(hit, 1L).otherwise(0L)).as("n_hit"))
    newDocs.select("doc_id")
      .join(per, Seq("doc_id"), "left")
      .na.fill(0L, Seq("n_grams", "n_hit"))
      .select(col("doc_id"), col("n_grams"), col("n_hit"),
              round(col("n_hit") * lit(1.0) /
                    greatest(col("n_grams"), lit(1L)), 6).as("containment"),
              (col("n_hit") * lit(1.0) /
               greatest(col("n_grams"), lit(1L)) < threshold)
                .cast("int").as("keep"))
  }

  def all: Seq[QueryDef] = Seq(

    // ---- C4/Gopher-style heuristic quality filters --------------------
    // Per-document boolean rule flags + the conjunctive keep gate. Rules
    // with fixture variance (word-count band, mean word length, stopword
    // presence, duplicate-word ratio) sit alongside the classic C4
    // constants (no '{', no 'lorem ipsum') that this clean synthetic
    // corpus trivially passes — the flags still assert the rule ran.
    // Map-only: one projection over the pruned (doc_id, text) scan.
    QueryDef(
      "dq02_quality_filters",
      (s, d) =>
        qualityFlags(table(s, d, "documents"))
          .drop("source")
          .orderBy("doc_id"),
      Some(s"""WITH base AS (
              |  SELECT doc_id, text, $wordsSql AS words,
              |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_word_chars
              |  FROM documents),
              |st AS (
              |  SELECT doc_id, text, n_word_chars,
              |    len(words) AS n_words, len(list_distinct(words)) AS n_distinct
              |  FROM base)
              |SELECT doc_id, n_words,
              |  round(n_word_chars * 1.0 / greatest(n_words, 1), 4) AS mean_word_len,
              |  round((n_words - n_distinct) * 1.0 / greatest(n_words, 1), 6) AS dup_word_frac,
              |  CAST(n_words BETWEEN 20 AND 10000 AS INT) AS f_word_count,
              |  CAST(n_word_chars * 1.0 / greatest(n_words, 1) BETWEEN 3.0 AND 10.0
              |       AS INT) AS f_mean_word_len,
              |  CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to|in)\\b')) > 0
              |       AS INT) AS f_stopword,
              |  CAST(NOT contains(text, '{') AS INT) AS f_no_brace,
              |  CAST(NOT contains(lower(text), 'lorem ipsum') AS INT) AS f_no_lorem,
              |  CAST((n_words - n_distinct) * 1.0 / greatest(n_words, 1) <= 0.5
              |       AS INT) AS f_low_repetition,
              |  CAST(CAST(n_words BETWEEN 20 AND 10000 AS INT)
              |     * CAST(n_word_chars * 1.0 / greatest(n_words, 1) BETWEEN 3.0 AND 10.0 AS INT)
              |     * CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to|in)\\b')) > 0 AS INT)
              |     * CAST(NOT contains(text, '{') AS INT)
              |     * CAST(NOT contains(lower(text), 'lorem ipsum') AS INT)
              |     * CAST((n_words - n_distinct) * 1.0 / greatest(n_words, 1) <= 0.5 AS INT)
              |     AS INT) AS keep
              |FROM st ORDER BY doc_id""".stripMargin)
    ),

    // ---- source reputation: the domain-level quality gate --------------
    // RefinedWeb-style two-level filtering: a page from a low-quality
    // domain is suspect even when the page itself passes the per-doc
    // rules, so the gate (a) scores every doc with dq02's flags,
    // (b) aggregates a keep-rate per source, (c) drops WHOLE sources
    // whose rate is below threshold, and (d) ands the two levels into
    // the final per-doc decision. Scale shape: flags are map-only; the
    // per-source aggregate is dictionary-sized and partially aggregated
    // map-side; the rates join back onto the doc frame AQE-decided
    // (broadcast when the source census is small, shuffle when source =
    // crawl domains at 10^7-10^8 rows), so the reputation tier costs
    // one small aggregate more than dq02 itself at any corpus size.
    QueryDef(
      "dq05_source_reputation",
      (s, d) => {
        // the narrow flag frame feeds BOTH the per-source aggregate and
        // the final join; without materialization Spark recomputes the
        // whole regex flag suite on each side (measured 9.9 s vs dq02's
        // own 7 s at sf1 — i.e. 2× the dominant map cost). An eager
        // localCheckpoint (the dd06 pattern) runs the expensive pass
        // once and both consumers read its blocks; at 100 TB this is
        // the persisted narrow intermediate a two-pass algorithm wants.
        val flags = qualityFlags(table(s, d, "documents"))
          .select("doc_id", "source", "keep")
          .localCheckpoint(true)
        val srcStats = flags.groupBy("source")
          .agg(count(lit(1)).as("n_docs"), sum("keep").as("n_keep"))
          .select(col("source"),
                  round(col("n_keep") * lit(1.0) / col("n_docs"), 6)
                    .as("keep_rate"),
                  (col("n_keep") * lit(1.0) / col("n_docs")
                     >= SourceKeepRateMin).cast("int").as("source_ok"))
        // no broadcast hint: per-SOURCE reputation is domain-cardinality
        // state (10^7-10^8 rows in a real crawl) — a mandatory hint is a
        // multi-GB driver broadcast at 100 TB. AQE broadcasts when the
        // source census is genuinely small and shuffles otherwise; the
        // no-hint plan is pinned in PlanAuditSpec.
        flags.join(srcStats, Seq("source"))
          .select(col("doc_id"), col("source"),
                  col("keep").as("keep_doc"),
                  col("keep_rate"), col("source_ok"),
                  (col("keep") * col("source_ok")).cast("int")
                    .as("keep_final"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, source, text, $wordsSql AS words,
              |    length(regexp_replace(text, '[^A-Za-z0-9]', '', 'g')) AS n_word_chars
              |  FROM documents),
              |st AS (
              |  SELECT doc_id, source, text, n_word_chars,
              |    len(words) AS n_words, len(list_distinct(words)) AS n_distinct
              |  FROM base),
              |k AS (
              |  SELECT doc_id, source,
              |    CAST(CAST(n_words BETWEEN 20 AND 10000 AS INT)
              |       * CAST(n_word_chars * 1.0 / greatest(n_words, 1) BETWEEN 3.0 AND 10.0 AS INT)
              |       * CAST(len(regexp_extract_all(text, '\\b(the|a|and|of|to|in)\\b')) > 0 AS INT)
              |       * CAST(NOT contains(text, '{') AS INT)
              |       * CAST(NOT contains(lower(text), 'lorem ipsum') AS INT)
              |       * CAST((n_words - n_distinct) * 1.0 / greatest(n_words, 1) <= 0.5 AS INT)
              |       AS INT) AS keep
              |  FROM st),
              |srcs AS (
              |  SELECT source,
              |    round(sum(keep) * 1.0 / count(*), 6) AS keep_rate,
              |    CAST(sum(keep) * 1.0 / count(*) >= $SourceKeepRateMin
              |         AS INT) AS source_ok
              |  FROM k GROUP BY source)
              |SELECT k.doc_id, k.source, k.keep AS keep_doc,
              |  s.keep_rate, s.source_ok,
              |  CAST(k.keep * s.source_ok AS INT) AS keep_final
              |FROM k JOIN srcs s USING (source)
              |ORDER BY k.doc_id""".stripMargin)
    ),

    // ---- model-based quality score (fastText-style linear gate) -------
    // The most common real curation filter after C4 rules: a linear
    // classifier over hashed bigram features. Features: word bigrams
    // hashed to 4096 buckets (md5 digits, engine-neutral); weights: a
    // deterministic pseudo-trained integer vector derived per bucket
    // (stands in for trained weights — the PLAN is the deliverable);
    // score: integer logit = Σ w[bucket(bigram)]. Two-level gate in
    // dq05's shape: per-doc keep_model = score ≥ 0, per-source mean
    // score reputation, keep_final = both. Scale shape: the 4096-row
    // weight vector broadcasts onto the exploded-bigram scan (never a
    // corpus shuffle); the per-doc sum partial-aggregates map-side so
    // the only exchanges carry (doc_id, partial-logit) scalars; docs
    // with < 2 words anchor through the census left-join with score 0.
    QueryDef(
      "ql01_model_quality_score",
      (s, d) => {
        val D = 4096
        def conv4(c: org.apache.spark.sql.Column) =
          conv(substring(md5(c.cast("binary")), 1, 4), 16, 10).cast("int")
        val docs = table(s, d, "documents")
          .select(col("doc_id"), col("source"), expr(wordsExpr).as("words"))
        val bigrams = docs.select(col("doc_id"), explode(expr(
            """zip_with(slice(words, 1, greatest(size(words) - 1, 0)),
              |         slice(words, 2, greatest(size(words) - 1, 0)),
              |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("bg"))
          .withColumn("bucket", conv4(col("bg")) % D)
        val weights = s.range(D).select(
          col("id").cast("int").as("bucket"),
          (conv4(concat(lit("w:"), col("id").cast("string"))) - 32768)
            .as("w"))
        val scores = bigrams.join(broadcast(weights), Seq("bucket"))
          .groupBy("doc_id").agg(sum("w").as("score"))
        val scored = docs.select("doc_id", "source")
          .join(scores, Seq("doc_id"), "left")
          .withColumn("score", coalesce(col("score"), lit(0L)))
          .withColumn("keep_model", (col("score") >= 0).cast("int"))
        val srcStats = scored.groupBy("source")
          .agg(round(avg("score"), 6).as("src_mean"),
               (avg("score") >= 0).cast("int").as("source_ok"))
        // no hint on the reputation join (dq05's rationale: source
        // cardinality grows with the corpus; AQE decides). The 4096-row
        // weights broadcast above stays — that frame is bounded by D.
        scored.join(srcStats, Seq("source"))
          .select(col("doc_id"), col("source"), col("score"),
                  col("keep_model"), col("src_mean"), col("source_ok"),
                  (col("keep_model") * col("source_ok")).cast("int")
                    .as("keep_final"))
          .orderBy("doc_id")
      },
      Some {
        def dd(e: String, i: Int) =
          s"(strpos('0123456789abcdef', substring(md5($e), $i, 1)) - 1)"
        val bgB =
          s"(${dd("bg", 2)} * 256 + ${dd("bg", 3)} * 16 + ${dd("bg", 4)})"
        val wE = "'w:' || CAST(i AS VARCHAR)"
        val wW = s"(${dd(wE, 1)} * 4096 + ${dd(wE, 2)} * 256 " +
          s"+ ${dd(wE, 3)} * 16 + ${dd(wE, 4)}) - 32768"
        s"""WITH docs AS (
           |  SELECT doc_id, source, $wordsSql AS words FROM documents),
           |bg AS (
           |  SELECT doc_id, unnest(list_transform(
           |    range(greatest(len(words) - 1, 0)),
           |    i -> words[i + 1] || ' ' || words[i + 2])) AS bg
           |  FROM docs),
           |bk AS (SELECT doc_id, $bgB AS bucket FROM bg),
           |w AS (SELECT CAST(i AS INT) AS bucket, CAST($wW AS INT) AS w
           |      FROM range(4096) t(i)),
           |scores AS (
           |  SELECT doc_id, CAST(SUM(w.w) AS BIGINT) AS score
           |  FROM bk JOIN w USING (bucket) GROUP BY doc_id),
           |scored AS (
           |  SELECT d.doc_id, d.source, COALESCE(s.score, 0) AS score,
           |    CAST(COALESCE(s.score, 0) >= 0 AS INT) AS keep_model
           |  FROM (SELECT doc_id, source FROM documents) d
           |  LEFT JOIN scores s USING (doc_id)),
           |srcs AS (
           |  SELECT source, round(avg(score), 6) AS src_mean,
           |    CAST(avg(score) >= 0 AS INT) AS source_ok
           |  FROM scored GROUP BY source)
           |SELECT sc.doc_id, sc.source, sc.score, sc.keep_model,
           |  s.src_mean, s.source_ok,
           |  CAST(sc.keep_model * s.source_ok AS INT) AS keep_final
           |FROM scored sc JOIN srcs s USING (source)
           |ORDER BY sc.doc_id""".stripMargin
      }
    ),

    // ---- Gopher repetition metrics ------------------------------------
    // Per-document duplicate-word fraction plus the "fraction of
    // characters inside occurrences of the most frequent word / bigram"
    // family (Gopher Rule group 2). The scalar stats are map-only; the
    // the per-doc mode (most frequent word / bigram) is computed
    // ENTIRELY map-side: sort the gram array, then a single
    // run-length fold (`aggregate` HOF) finds the longest run — ties
    // resolve to the lexicographically smallest gram for free because
    // runs arrive in sorted order and only a STRICTLY longer run
    // replaces the champion. Zero shuffles, zero joins: the whole
    // operator is one codegen'd projection over the pruned scan — the
    // plan shape that makes per-doc repetition stats a free pass even
    // at 100 TB (the first cut explode→groupBy→window formulation
    // shuffled 9M gram rows at the 10× probe; this shuffles none).
    QueryDef(
      "dq03_repetition_stats",
      (s, d) => {
        // (gram, run) champion after walking `arr` in sorted order —
        // native since r16 ([[graft.functions.TopRun]]): the
        // interpreted fold cost ~0.25 s PER FOLD of this entry's 1.8 s
        // at sf0.1 (Dq03Prof), ∝ corpus tokens; the HOF form stays the
        // spec-pinned reference (TopRunSpec, walk-for-walk equality)
        def topRun(arr: org.apache.spark.sql.Column) = {
          graft.functions.TopRun.register(s)
          call_function(graft.functions.TopRun.fnName, arr)
        }
        val bigramsCol =
          expr("""zip_with(slice(words, 1, greatest(size(words) - 1, 0)),
                 |         slice(words, 2, greatest(size(words) - 1, 0)),
                 |         (a, b) -> concat(a, ' ', b))""".stripMargin)
        table(s, d, "documents")
          .select(col("doc_id"), expr(wordsExpr).as("words"),
                  length(regexp_replace(col("text"), "\\s", ""))
                    .as("n_word_chars"))
          .select(col("doc_id"), col("n_word_chars"),
                  size(col("words")).as("n_words"),
                  size(array_distinct(col("words"))).as("n_distinct"),
                  topRun(col("words")).as("tw"),
                  topRun(bigramsCol).as("tb"))
          .select(
            col("doc_id"), col("n_words"),
            round((col("n_words") - col("n_distinct")) * lit(1.0) /
                  greatest(col("n_words"), lit(1)), 6).as("dup_word_frac"),
            // a doc with no words (or < 2 for the bigram side) has no
            // mode — surface NULL, matching the oracle's LEFT JOIN, so
            // degenerate docs keep their row instead of silently
            // diverging between engines
            when(col("n_words") >= 1, col("tw.gram")).as("top_word"),
            when(col("n_words") >= 1,
              round(col("tw.n") * length(col("tw.gram")) * lit(1.0) /
                    greatest(col("n_word_chars"), lit(1)), 6))
              .as("top_word_char_frac"),
            when(col("n_words") >= 2, col("tb.gram")).as("top_bigram"),
            when(col("n_words") >= 2,
              round(col("tb.n") * (length(col("tb.gram")) - lit(1)) *
                    lit(1.0) / greatest(col("n_word_chars"), lit(1)), 6))
              .as("top_bigram_char_frac"))
          .orderBy("doc_id")
      },
      Some(s"""WITH base AS (
              |  SELECT doc_id, $wordsSql AS words,
              |    length(regexp_replace(text, '\\s', '', 'g')) AS n_word_chars
              |  FROM documents),
              |stats AS (
              |  SELECT doc_id, n_word_chars, len(words) AS n_words,
              |    len(list_distinct(words)) AS n_distinct
              |  FROM base),
              |wgram AS (SELECT doc_id, unnest(words) AS gram FROM base),
              |bgram AS (
              |  SELECT doc_id, unnest(list_transform(range(1, len(words)),
              |    i -> words[i] || ' ' || words[i + 1])) AS gram
              |  FROM base),
              |wtop AS (
              |  SELECT doc_id, gram AS top_word, n AS top_word_n FROM (
              |    SELECT doc_id, gram, count(*) AS n,
              |      row_number() OVER (PARTITION BY doc_id
              |        ORDER BY count(*) DESC, gram) AS rk
              |    FROM wgram GROUP BY doc_id, gram) WHERE rk = 1),
              |btop AS (
              |  SELECT doc_id, gram AS top_bigram, n AS top_bigram_n FROM (
              |    SELECT doc_id, gram, count(*) AS n,
              |      row_number() OVER (PARTITION BY doc_id
              |        ORDER BY count(*) DESC, gram) AS rk
              |    FROM bgram GROUP BY doc_id, gram) WHERE rk = 1)
              |SELECT s.doc_id, s.n_words,
              |  round((s.n_words - s.n_distinct) * 1.0 /
              |        greatest(s.n_words, 1), 6) AS dup_word_frac,
              |  w.top_word,
              |  round(w.top_word_n * length(w.top_word) * 1.0 /
              |        greatest(s.n_word_chars, 1), 6) AS top_word_char_frac,
              |  b.top_bigram,
              |  round(b.top_bigram_n * (length(b.top_bigram) - 1) * 1.0 /
              |        greatest(s.n_word_chars, 1), 6) AS top_bigram_char_frac
              |FROM stats s
              |LEFT JOIN wtop w ON s.doc_id = w.doc_id
              |LEFT JOIN btop b ON s.doc_id = b.doc_id
              |ORDER BY s.doc_id""".stripMargin)
    ),

    // ---- benchmark decontamination ------------------------------------
    // GPT-3-style eval-set decontamination: flag corpus documents that
    // share any word 5-gram with the benchmark set (here: the
    // deterministic source='src0' slice stands in for the eval suite).
    // Plan: both sides explode to md5(5-gram) keys; the benchmark side
    // is DISTINCT and tiny → broadcast; one equi-join + per-doc count.
    // At 100 TB the corpus side stays map-only into the join (no
    // self-join, no shuffle of text — only (doc_id, 16-byte key)).
    QueryDef(
      "dc01_decontaminate",
      (s, d) => {
        val grams5 =
          """CASE WHEN size(words) >= 5 THEN
            |  transform(sequence(0, size(words) - 5),
            |            i -> md5(cast(concat_ws(' ', slice(words, i + 1, 5)) as binary)))
            |ELSE cast(array() as array<string>) END""".stripMargin
        val grams = table(s, d, "documents")
          .select(col("doc_id"), col("source"), expr(wordsExpr).as("words"))
          .select(col("doc_id"), col("source"),
                  explode(expr(grams5)).as("g"))
        val bench = grams.filter(col("source") === "src0")
          .select("g").distinct()
        // corpus grams flow map-only into the broadcast join — no
        // corpus-wide distinct (that would shuffle every gram of the
        // corpus; the per-doc countDistinct after the join shuffles
        // MATCHES only, which is what decontamination hit rates are)
        grams.filter(col("source") =!= "src0")
          .join(Bounded.broadcastBench(bench, "dc01.bench-grams"), Seq("g"))
          .groupBy("doc_id")
          .agg(countDistinct("g").as("n_hit"))
          .orderBy("doc_id")
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |bench AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'),
              |corpus AS (
              |  SELECT DISTINCT doc_id, g FROM grams WHERE source <> 'src0')
              |SELECT doc_id, count(*) AS n_hit
              |FROM corpus JOIN bench USING (g)
              |GROUP BY doc_id ORDER BY doc_id""".stripMargin)
    ),

    // dc01 TRANSPOSED — the report the EVAL OWNER reads: for each
    // benchmark document, how much of it leaks into the training
    // corpus — distinct corpus docs sharing a 5-gram with it, how many
    // of its own grams are exposed anywhere in the corpus, and the
    // exposure fraction (1.0 = every gram of the eval item appears in
    // training data; its score is meaningless). Census-anchored: every
    // benchmark doc reports, clean ones as zeros. Same scale shape as
    // dc01 — the benchmark side is the (guarded) broadcast, corpus
    // grams flow map-only through the join, and the shuffle carries
    // match pairs only, never corpus grams.
    QueryDef(
      "dc04_benchmark_exposure",
      (s, d) => {
        val grams5 =
          """CASE WHEN size(words) >= 5 THEN
            |  transform(sequence(0, size(words) - 5),
            |            i -> md5(cast(concat_ws(' ', slice(words, i + 1, 5)) as binary)))
            |ELSE cast(array() as array<string>) END""".stripMargin
        val grams = table(s, d, "documents")
          .select(col("doc_id"), col("source"), expr(wordsExpr).as("words"))
          .select(col("doc_id"), col("source"),
                  explode(expr(grams5)).as("g"))
        val bench = grams.filter(col("source") === "src0")
          .select(col("doc_id").as("bench_id"), col("g")).distinct()
        val benchSize = bench.groupBy("bench_id")
          .agg(count(lit(1)).as("n_grams"))
        val agg = grams.filter(col("source") =!= "src0")
          .join(Bounded.broadcastBench(bench, "dc04.bench-grams"), Seq("g"))
          .groupBy("bench_id")
          .agg(countDistinct("doc_id").as("n_corpus_docs"),
               countDistinct("g").as("n_exposed_grams"))
        table(s, d, "documents").filter(col("source") === "src0")
          .select(col("doc_id").as("bench_id"))
          .join(benchSize, Seq("bench_id"), "left")
          .join(agg, Seq("bench_id"), "left")
          .select(col("bench_id"),
                  coalesce(col("n_grams"), lit(0L)).as("n_grams"),
                  coalesce(col("n_corpus_docs"), lit(0L))
                    .as("n_corpus_docs"),
                  coalesce(col("n_exposed_grams"), lit(0L))
                    .as("n_exposed_grams"),
                  round(coalesce(col("n_exposed_grams"), lit(0L)) * lit(1.0) /
                        greatest(coalesce(col("n_grams"), lit(0L)), lit(1L)),
                        6).as("exposure_frac"))
          .orderBy("bench_id")
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |bench AS (
              |  SELECT DISTINCT doc_id AS bench_id, g FROM grams
              |  WHERE source = 'src0'),
              |bsize AS (
              |  SELECT bench_id, count(*) AS n_grams FROM bench
              |  GROUP BY bench_id),
              |m AS (
              |  SELECT b.bench_id,
              |    count(DISTINCT c.doc_id) AS n_corpus_docs,
              |    count(DISTINCT b.g) AS n_exposed_grams
              |  FROM (SELECT doc_id, g FROM grams WHERE source <> 'src0') c
              |  JOIN bench b USING (g)
              |  GROUP BY b.bench_id)
              |SELECT d.doc_id AS bench_id,
              |  coalesce(bs.n_grams, 0) AS n_grams,
              |  coalesce(m.n_corpus_docs, 0) AS n_corpus_docs,
              |  coalesce(m.n_exposed_grams, 0) AS n_exposed_grams,
              |  round(coalesce(m.n_exposed_grams, 0) * 1.0 /
              |        greatest(coalesce(bs.n_grams, 0), 1), 6)
              |    AS exposure_frac
              |FROM (SELECT doc_id FROM documents WHERE source = 'src0') d
              |LEFT JOIN bsize bs ON bs.bench_id = d.doc_id
              |LEFT JOIN m ON m.bench_id = d.doc_id
              |ORDER BY bench_id""".stripMargin)
    ),

    // ---- SEMANTIC decontamination -------------------------------------
    // dc01 catches verbatim benchmark overlap (shared 5-grams); a
    // paraphrased eval item shares no grams, so the semantic tier scores
    // every corpus vector's max cosine against the benchmark SUITE's
    // embeddings ([[benchSuite]] — the fixed-size hash-ordered sample
    // of label-0 rows standing in for the eval suite) and drops
    // anything above tau. Census-anchored: one decision per vector.
    // Scale shape (the PRODUCTION invariant — see [[BenchSuiteCap]]):
    // the suite side is FIXED-SIZE by nature (an eval suite, not a
    // corpus) — it broadcasts, the corpus flows map-only through the
    // dot products, and the max-aggregate is partial map-side so the
    // shuffle carries ONE row per corpus vector. Cost is linear in the
    // corpus at every scale; the full-label-0 exact form (which the
    // fixture's SF-scaling label-0 set made quadratic) is the dc02x
    // anchor below.
    QueryDef(
      "dc02_semantic_decon",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val bench = benchSuite(emb).select(col("embedding").as("qvec"))
        emb.filter(col("label") =!= 0)
          .crossJoin(Bounded.broadcastBench(bench, "dc02.bench-vecs"))
          .groupBy("vec_id")
          .agg(max(graft.functions.VectorOps.cosineNative(
                 s, col("embedding"), col("qvec"))).as("mc"))
          .select(col("vec_id"),
                  round(col("mc"), 6).as("max_benchmark_sim"),
                  (col("mc") < SemanticDeconTau).cast("int").as("keep"))
          .orderBy("vec_id")
      },
      Some(s"""WITH b AS (
              |  SELECT embedding AS qvec FROM ($benchSuiteSql)),
              |c AS (
              |  SELECT vec_id, embedding FROM embeddings WHERE label <> 0),
              |m AS (
              |  SELECT c.vec_id, max(
              |    list_sum(list_transform(list_zip(c.embedding, b.qvec),
              |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              |      / (sqrt(list_sum(list_transform(c.embedding,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              |       * sqrt(list_sum(list_transform(b.qvec,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              |    ) AS mc
              |  FROM c, b GROUP BY c.vec_id)
              |SELECT vec_id, round(mc, 6) AS max_benchmark_sim,
              |  CAST(mc < $SemanticDeconTau AS INT) AS keep
              |FROM m ORDER BY vec_id""".stripMargin)
    ),

    // dc02x: the exhaustive anchor — exact max cosine of EVERY corpus
    // vector against the WHOLE label-0 set (the pre-r12 dc02 body,
    // verbatim). Quadratic in SF on the fixture by construction;
    // anchors are allowed to be expensive — this keeps the uncapped
    // exact relation hash-checked so the suite cap can never silently
    // change what "contaminated vs the full set" means.
    QueryDef(
      "dc02x_semantic_decon_full",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val bench = emb.filter(col("label") === 0)
          .select(col("embedding").as("qvec"))
        emb.filter(col("label") =!= 0)
          .crossJoin(Bounded.broadcastBench(bench, "dc02x.bench-vecs"))
          .groupBy("vec_id")
          .agg(max(graft.functions.VectorOps.cosineNative(
                 s, col("embedding"), col("qvec"))).as("mc"))
          .select(col("vec_id"),
                  round(col("mc"), 6).as("max_benchmark_sim"),
                  (col("mc") < SemanticDeconTau).cast("int").as("keep"))
          .orderBy("vec_id")
      },
      Some(s"""WITH b AS (
              |  SELECT embedding AS qvec FROM embeddings WHERE label = 0),
              |c AS (
              |  SELECT vec_id, embedding FROM embeddings WHERE label <> 0),
              |m AS (
              |  SELECT c.vec_id, max(
              |    list_sum(list_transform(list_zip(c.embedding, b.qvec),
              |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              |      / (sqrt(list_sum(list_transform(c.embedding,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              |       * sqrt(list_sum(list_transform(b.qvec,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              |    ) AS mc
              |  FROM c, b GROUP BY c.vec_id)
              |SELECT vec_id, round(mc, 6) AS max_benchmark_sim,
              |  CAST(mc < $SemanticDeconTau AS INT) AS keep
              |FROM m ORDER BY vec_id""".stripMargin)
    ),

    // ---- semantic decon, LSH-prefiltered (dc02's scale path) ----------
    // The banded-LSH prefilter dc02's comment promises for benchmark
    // sets past ~10⁵ rows: candidates from shared sign-hash band
    // buckets, exact cosine refine, same tau gate. Engine-specific
    // hashing → rows-only here; bracketed exactly like dd02 by the two
    // anchors below.
    // SELF-AUDITING ([[SelfAudit]] discipline): the banded-LSH decon
    // serves the full corpus; the same plan recomputes the EXACT
    // benchmark max-cosine for a deterministic quarter of the corpus
    // (vec_id % 4 = 1 — full exact recall would re-run dc02 inside the
    // serve) and audits: every served drop in the slice is an exact
    // drop with its candidate-max bounded by the true max (precision by
    // construction — the refine is exact cosine over a candidate
    // subset), and the slice's ≥ 0.9 stratum is recalled within the
    // dc03r count bound. The slice's exact drop/strong counts are the
    // oracle's recomputable scalars; dc03p/dc03r stay as full anchors.
    QueryDef(
      "dc03_semantic_decon_lsh",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val served = SelfAudit.once(semanticDeconLshDrops(s, emb))
        val audit = emb.filter(col("label") =!= 0 && col("vec_id") % 4 === 1)
        val exact = SelfAudit.once(
          audit.crossJoin(Bounded.broadcastBench(
              emb.filter(col("label") === 0)
                .select(col("embedding").as("qvec")), "dc03.bench-vecs"))
            .groupBy("vec_id")
            .agg(max(graft.functions.VectorOps.cosineNative(
                   s, col("embedding"), col("qvec"))).as("mc"))
            .filter(col("mc") >= SemanticDeconTau)
            .select(col("vec_id"), round(col("mc"), 6).as("emc")))
        val sAud = served.filter(col("vec_id") % 4 === 1)
        val precEsc = sAud.select("vec_id")
          .join(exact.select("vec_id"), Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__p"))
        val simBound = sAud.select(col("vec_id"), col("max_cand_sim"))
          .join(exact, Seq("vec_id"))
          .agg(coalesce(bool_and(col("max_cand_sim") <= col("emc") + lit(1e-9)),
                        lit(true)).as("sim_bounded_ok"))
        val strong = exact.filter(col("emc") >= 0.9)
        val missed = strong.select("vec_id")
          .join(sAud.select("vec_id"), Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__m"))
        served.agg(count(lit(1)).as("__n"))
          .crossJoin(exact.agg(count(lit(1)).as("n_exact_drops_audit")))
          .crossJoin(strong.agg(count(lit(1)).as("n_strong_audit")))
          .crossJoin(precEsc).crossJoin(simBound).crossJoin(missed)
          .select(col("n_exact_drops_audit"), col("n_strong_audit"),
                  (col("__n") > 0).as("nonempty_ok"),
                  (col("__p") === 0).as("precision_ok"),
                  col("sim_bounded_ok"),
                  (col("__m") <= ceil(col("n_strong_audit") * lit(2e-4)))
                    .as("recall_bound_ok"))
      },
      Some(s"""WITH b AS (
              |  SELECT embedding AS qvec FROM embeddings WHERE label = 0),
              |c AS (
              |  SELECT vec_id, embedding FROM embeddings
              |  WHERE label <> 0 AND vec_id % 4 = 1),
              |m AS (
              |  SELECT c.vec_id, max(
              |    list_sum(list_transform(list_zip(c.embedding, b.qvec),
              |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              |      / (sqrt(list_sum(list_transform(c.embedding,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              |       * sqrt(list_sum(list_transform(b.qvec,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              |    ) AS mc
              |  FROM c, b GROUP BY c.vec_id),
              |dr AS (SELECT vec_id, round(mc, 6) AS emc FROM m
              |       WHERE mc >= $SemanticDeconTau)
              |SELECT (SELECT COUNT(*) FROM dr) AS n_exact_drops_audit,
              |  (SELECT COUNT(*) FROM dr WHERE emc >= 0.9) AS n_strong_audit,
              |  true AS nonempty_ok, true AS precision_ok,
              |  true AS sim_bounded_ok, true AS recall_bound_ok""".stripMargin)
    ),

    // dc03 precision anchor: the refine stage scores candidates with
    // EXACT cosine at the same tau, so every dc03 drop must be a dc02
    // drop (a candidate's max-over-candidates never exceeds the true
    // max). Empty anti-join, hash-checkable oracle.
    QueryDef(
      "dc03p_decon_precision",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val exactDrops = emb.filter(col("label") =!= 0)
          .crossJoin(Bounded.broadcastBench(
            emb.filter(col("label") === 0)
              .select(col("embedding").as("qvec")), "dc03p.bench-vecs"))
          .groupBy("vec_id")
          .agg(max(graft.functions.VectorOps.cosineNative(
                 s, col("embedding"), col("qvec"))).as("mc"))
          .filter(col("mc") >= SemanticDeconTau)
          .select("vec_id")
        semanticDeconLshDrops(s, emb).select("vec_id")
          .except(exactDrops)
          .orderBy("vec_id")
      },
      Some("SELECT CAST(NULL AS BIGINT) AS vec_id WHERE false")
    ),

    // dc03 recall anchor: a corpus vector whose true max benchmark
    // cosine is ≥ 0.9 shares a band bucket with that benchmark vector
    // unless all DeconLshBands bands miss — probability (1 − p^Rows)^
    // Bands ≈ 9.5e-5 at p = 1 − acos(0.9)/π (derived below from the
    // config, dd02r discipline, so the bound can't drift). The anchor
    // asserts the bound, NOT strict emptiness: the expected number of
    // escapes grows linearly with the strong stratum, so an exact-empty
    // pin would be fixture-fragile — on a larger or regenerated corpus
    // it could go red with no real regression. Output is one row of
    // (n_strong, within_bound): DuckDB re-derives n_strong from exact
    // cosine (cross-engine stratum check) and pins within_bound = 1,
    // where the Spark side computes within_bound as
    // n_missed ≤ ceil(2e-4 · n_strong) — roughly 2× the per-pair miss
    // probability, scaled to the stratum.
    QueryDef(
      "dc03r_decon_recall",
      (s, d) => {
        val p = 1.0 - math.acos(0.9) / math.Pi
        val missBound =
          math.pow(1.0 - math.pow(p, DeconLshRows), DeconLshBands)
        require(missBound < 1e-4,
          s"band config too weak for a recall anchor: miss=$missBound")
        val emb = table(s, d, "embeddings")
        val strongDrops = emb.filter(col("label") =!= 0)
          .crossJoin(Bounded.broadcastBench(
            emb.filter(col("label") === 0)
              .select(col("embedding").as("qvec")), "dc03r.bench-vecs"))
          .groupBy("vec_id")
          .agg(max(graft.functions.VectorOps.cosineNative(
                 s, col("embedding"), col("qvec"))).as("mc"))
          .filter(col("mc") >= 0.9)
          .select("vec_id")
        val missed = strongDrops
          .except(semanticDeconLshDrops(s, emb).select("vec_id"))
        strongDrops.agg(count(lit(1)).as("n_strong"))
          .crossJoin(missed.agg(count(lit(1)).as("n_missed")))
          .select(col("n_strong"),
                  (col("n_missed") <=
                    ceil(col("n_strong") * lit(2e-4))).cast("int")
                    .as("within_bound"))
      },
      Some("""WITH b AS (
             |  SELECT embedding AS qvec FROM embeddings WHERE label = 0),
             |c AS (
             |  SELECT vec_id, embedding FROM embeddings WHERE label <> 0),
             |m AS (
             |  SELECT c.vec_id, max(
             |    list_sum(list_transform(list_zip(c.embedding, b.qvec),
             |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |      / (sqrt(list_sum(list_transform(c.embedding,
             |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |       * sqrt(list_sum(list_transform(b.qvec,
             |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
             |    ) AS mc
             |  FROM c, b GROUP BY c.vec_id)
             |SELECT CAST(COUNT(*) AS BIGINT) AS n_strong,
             |  1 AS within_bound
             |FROM m WHERE mc >= 0.9""".stripMargin)
    ),

    // ---- semantic decon, SELECTIVITY config (the measured 8×7 win) ----
    // dc03 serves the 12×4 recall-anchor shape: its ~54 % candidate
    // rate is CONFIG-bound (identical on noise and clustered data —
    // FIXTURES.md §D), so it prunes nothing on ANY distribution. This
    // entry SERVES the measured selectivity config ([[DeconSelBands]]
    // × [[DeconSelRows]] = 8×7: 7.2× over exact at the 20 k bench,
    // 99.96 % strong recall on clustered data) through the identical
    // machinery, and self-audits in-plan (dm10 discipline):
    //  - banded ⊆ exact on the deterministic quarter slice (precision
    //    by construction — the refine is exact cosine over a candidate
    //    subset), banded max bounded by the true max;
    //  - the slice's ≥ 0.9 stratum recalled within the CONFIG-derived
    //    bound (miss ≈ (1−p⁷)⁸ ≈ 3.7 % per pair at s = 0.9; the
    //    clustered stratum at ≈ 0.978 misses ~5e-4 — the spec pins
    //    that regime on the ClusteredEmbeddings fixture; this corpus'
    //    hash noise has NO ≥ 0.9 pairs, so the scalar documents its
    //    own vacuity exactly as dc03p/r do);
    //  - candidate PRUNING actually happened: Σ n_cand ≤ 15 % of the
    //    corpus × bench product (config-bound ~6 % on noise, ~6.9 % on
    //    clustered — the one audit 12×4 would FAIL, which is the
    //    point of serving this config).
    QueryDef(
      "dc05_decon_selective",
      (s, d) => {
        val pStrong = 1.0 - math.acos(0.9) / math.Pi
        val missAt09 = math.pow(
          1.0 - math.pow(pStrong, DeconSelRows), DeconSelBands)
        val emb = table(s, d, "embeddings")
        val corpus = emb.filter(col("label") =!= 0)
          .select("vec_id", "embedding")
        val bench = emb.filter(col("label") === 0)
          .select(col("vec_id").as("bench_id"), col("embedding"))
        val chunks = deconBenchBucketChunks(
          bench, bands = DeconSelBands, rows = DeconSelRows)
        val scored = SelfAudit.once(semanticDeconScoredWith(
          s, corpus, chunks, DeconSelBands, DeconSelRows))
        val served = scored.filter(col("mc") >= SemanticDeconTau)
          .select(col("vec_id"), round(col("mc"), 6).as("max_cand_sim"))
        val exact = SelfAudit.once(
          corpus.filter(col("vec_id") % 4 === 1)
            .crossJoin(Bounded.broadcastBench(
              emb.filter(col("label") === 0)
                .select(col("embedding").as("qvec")), "dc05.bench-vecs"))
            .groupBy("vec_id")
            .agg(max(graft.functions.VectorOps.cosineNative(
                   s, col("embedding"), col("qvec"))).as("emc")))
        val exactDrops = exact.filter(col("emc") >= SemanticDeconTau)
        val sAud = served.filter(col("vec_id") % 4 === 1)
        val precEsc = sAud.select("vec_id")
          .join(exactDrops.select("vec_id"), Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__p"))
        val simBound = sAud
          .join(exact.select(col("vec_id"),
                             round(col("emc"), 6).as("emc6")),
                Seq("vec_id"))
          .agg(coalesce(
            bool_and(col("max_cand_sim") <= col("emc6") + lit(1e-9)),
            lit(true)).as("sim_bounded_ok"))
        val strong = exact.filter(col("emc") >= 0.9)
        val missed = strong.select("vec_id")
          .join(sAud.select("vec_id"), Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__m"))
        val cand = scored.agg(
          coalesce(sum(col("n_cand")), lit(0L)).as("__cand"),
          count(lit(1)).as("__n"))
        cand
          .crossJoin(bench.agg(count(lit(1)).as("__nb")))
          .crossJoin(exactDrops.agg(count(lit(1)).as("n_exact_drops_audit")))
          .crossJoin(strong.agg(count(lit(1)).as("n_strong_audit")))
          .crossJoin(precEsc).crossJoin(simBound).crossJoin(missed)
          .select(col("n_exact_drops_audit"), col("n_strong_audit"),
                  (col("__n") > 0).as("nonempty_ok"),
                  (col("__p") === 0).as("precision_ok"),
                  col("sim_bounded_ok"),
                  (col("__m") <= ceil(col("n_strong_audit")
                                        * lit(2 * missAt09))).as("recall_ok"),
                  (col("__cand") <= col("__n") * col("__nb") * lit(0.15))
                    .as("pruned_ok"))
      },
      Some(s"""WITH b AS (
              |  SELECT embedding AS qvec FROM embeddings WHERE label = 0),
              |c AS (
              |  SELECT vec_id, embedding FROM embeddings
              |  WHERE label <> 0 AND vec_id % 4 = 1),
              |m AS (
              |  SELECT c.vec_id, max(
              |    list_sum(list_transform(list_zip(c.embedding, b.qvec),
              |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              |      / (sqrt(list_sum(list_transform(c.embedding,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              |       * sqrt(list_sum(list_transform(b.qvec,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              |    ) AS mc
              |  FROM c, b GROUP BY c.vec_id)
              |SELECT
              |  (SELECT COUNT(*) FROM m WHERE mc >= $SemanticDeconTau)
              |    AS n_exact_drops_audit,
              |  (SELECT COUNT(*) FROM m WHERE mc >= 0.9) AS n_strong_audit,
              |  true AS nonempty_ok, true AS precision_ok,
              |  true AS sim_bounded_ok, true AS recall_ok,
              |  true AS pruned_ok""".stripMargin)
    ),

    // ---- semantic decon, AUTO config (the crossover boundary served) --
    // dc05 proves the 8×7 selectivity config; deconConfigFor encodes
    // WHEN to pick it (≥ 10⁴ bench rows). This entry drives that
    // boundary itself through the oracle (VERDICT r14 missing #1: the
    // decision that sets production behavior was invisible to the
    // driver): the fixture bench is replicated into k id-disjoint
    // copies — the smallest k that crosses the threshold — and the
    // gate serves via deconConfigFor with NO pinned config. Replicas
    // carry identical embeddings, so the exact-side audit scalars are
    // UNCHANGED (max cosine over replicated bench = max over the
    // original; the oracle replays against label = 0 alone), while the
    // serve is genuinely threshold-sized: bucket maps, chunking, and
    // the pruning audit all see the k·n bench. Every audit bound below
    // derives from the RESOLVED config, not a constant:
    //  - recall bound: 2 × (1 − p^rows)^bands at the resolved (b, r);
    //  - pruning: Σ n_cand ≤ 15 % of corpus × (k·n) — the resolved
    //    8×7's config-bound ~6 % rate passes; the 12×4 shape the auto
    //    boundary must NOT pick here would fail it;
    //  - crossed_ok / auto_selective_ok pin that the bench really
    //    crossed and the boundary really flipped.
    QueryDef(
      "dc06_decon_auto",
      (s, d) => {
        val emb = table(s, d, "embeddings")
        val corpus = emb.filter(col("label") =!= 0)
          .select("vec_id", "embedding")
        val bench0 = emb.filter(col("label") === 0)
          .select(col("vec_id").as("bench_id"), col("embedding"))
        // same tag + plan as the gate chains' auto count — one shared
        // content-stamped count job per corpus per JVM
        val nb0 = Bounded.checkedRowCount(bench0, "decon.band-index",
                                          maxRows = 100000L)
        val k = math.max(1L, (DeconAutoBenchThreshold + nb0 - 1) / nb0)
        val bench =
          if (k == 1) bench0
          else bench0
            .withColumn("__r", explode(sequence(lit(0L), lit(k - 1))))
            .select((col("bench_id") * k + col("__r")).as("bench_id"),
                    col("embedding"))
        val nb = nb0 * k
        val (b, r) = deconConfigFor(nb) // the boundary under test
        val missAt09 = {
          val p = 1.0 - math.acos(0.9) / math.Pi
          math.pow(1.0 - math.pow(p, r), b)
        }
        val chunks = deconBenchBucketChunks(bench, bands = b, rows = r)
        val scored = SelfAudit.once(semanticDeconScoredWith(
          s, corpus, chunks, b, r))
        val served = scored.filter(col("mc") >= SemanticDeconTau)
          .select(col("vec_id"), round(col("mc"), 6).as("max_cand_sim"))
        // exact audit side scores the ORIGINAL bench: replicas cannot
        // change a max, so this is the same frame at 1/k the cost
        val exact = SelfAudit.once(
          corpus.filter(col("vec_id") % 4 === 1)
            .crossJoin(Bounded.broadcastBench(
              emb.filter(col("label") === 0)
                .select(col("embedding").as("qvec")), "dc06.bench-vecs"))
            .groupBy("vec_id")
            .agg(max(graft.functions.VectorOps.cosineNative(
                   s, col("embedding"), col("qvec"))).as("emc")))
        val exactDrops = exact.filter(col("emc") >= SemanticDeconTau)
        val sAud = served.filter(col("vec_id") % 4 === 1)
        val precEsc = sAud.select("vec_id")
          .join(exactDrops.select("vec_id"), Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__p"))
        val simBound = sAud
          .join(exact.select(col("vec_id"),
                             round(col("emc"), 6).as("emc6")),
                Seq("vec_id"))
          .agg(coalesce(
            bool_and(col("max_cand_sim") <= col("emc6") + lit(1e-9)),
            lit(true)).as("sim_bounded_ok"))
        val strong = exact.filter(col("emc") >= 0.9)
        val missed = strong.select("vec_id")
          .join(sAud.select("vec_id"), Seq("vec_id"), "left_anti")
          .agg(count(lit(1)).as("__m"))
        val cand = scored.agg(
          coalesce(sum(col("n_cand")), lit(0L)).as("__cand"),
          count(lit(1)).as("__n"))
        cand
          .crossJoin(exactDrops.agg(count(lit(1)).as("n_exact_drops_audit")))
          .crossJoin(strong.agg(count(lit(1)).as("n_strong_audit")))
          .crossJoin(precEsc).crossJoin(simBound).crossJoin(missed)
          .select(col("n_exact_drops_audit"), col("n_strong_audit"),
                  (col("__n") > 0).as("nonempty_ok"),
                  (col("__p") === 0).as("precision_ok"),
                  col("sim_bounded_ok"),
                  (col("__m") <= ceil(col("n_strong_audit")
                                        * lit(2 * missAt09))).as("recall_ok"),
                  (col("__cand") <= col("__n") * lit(nb) * lit(0.15))
                    .as("pruned_ok"),
                  lit(nb >= DeconAutoBenchThreshold).as("crossed_ok"),
                  lit(b == DeconSelBands && r == DeconSelRows)
                    .as("auto_selective_ok"))
      },
      Some(s"""WITH b AS (
              |  SELECT embedding AS qvec FROM embeddings WHERE label = 0),
              |c AS (
              |  SELECT vec_id, embedding FROM embeddings
              |  WHERE label <> 0 AND vec_id % 4 = 1),
              |m AS (
              |  SELECT c.vec_id, max(
              |    list_sum(list_transform(list_zip(c.embedding, b.qvec),
              |            p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
              |      / (sqrt(list_sum(list_transform(c.embedding,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
              |       * sqrt(list_sum(list_transform(b.qvec,
              |                x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))
              |    ) AS mc
              |  FROM c, b GROUP BY c.vec_id)
              |SELECT
              |  (SELECT COUNT(*) FROM m WHERE mc >= $SemanticDeconTau)
              |    AS n_exact_drops_audit,
              |  (SELECT COUNT(*) FROM m WHERE mc >= 0.9) AS n_strong_audit,
              |  true AS nonempty_ok, true AS precision_ok,
              |  true AS sim_bounded_ok, true AS recall_ok,
              |  true AS pruned_ok, true AS crossed_ok,
              |  true AS auto_selective_ok""".stripMargin)
    ),

    // ---- boilerplate n-gram detection ---------------------------------
    // Cross-document repeated spans: word 8-grams occurring in >= 3
    // DISTINCT documents — the RefinedWeb/Gopher boilerplate-removal
    // primitive (navigation chrome, license headers, templated spans
    // repeat across pages; prose doesn't). Two passes so the
    // corpus-wide shuffle never carries gram TEXT: pass 1 censuses on a
    // 128-bit hash pair (16-byte key vs ~50-byte grams; two independent
    // xxhash64 seeds ⇒ collision odds ~n²/2¹²⁹, negligible even at
    // 10¹² grams) and keeps the >= 3-doc survivors; pass 2 re-scans and
    // recovers the text for the flagged set via an AQE-decided join —
    // the boilerplate list a cleaning pass needs, at the shuffle cost
    // of a census. No pairwise stage anywhere.
    QueryDef(
      "bp01_boilerplate_ngrams",
      (s, d) => {
        val grams8 =
          """CASE WHEN size(words) >= 8 THEN
            |  transform(sequence(0, size(words) - 8),
            |            i -> concat_ws(' ', slice(words, i + 1, 8)))
            |ELSE cast(array() as array<string>) END""".stripMargin
        // one-split fixture scan feeding the 8-gram explode (an
        // expensive per-row concat_ws pass) — spread under the
        // ScanSpread size guard; downstream is the map-side census
        // aggregation and an AQE-decided join on 16-byte keys.
        // AbProf r17: 1.97 -> 1.20 s.
        val grams = ScanSpread.forMapPass(table(s, d, "documents"))
          .select(col("doc_id"), expr(wordsExpr).as("words"))
          .select(col("doc_id"), explode(expr(grams8)).as("gram"))
          .withColumn("h1", xxhash64(col("gram")))
          .withColumn("h2", xxhash64(col("gram"), lit(1)))
        val flagged = grams
          .groupBy("h1", "h2")
          .agg(countDistinct("doc_id").as("n_docs"),
               count(lit(1)).as("n_occ"))
          .filter(col("n_docs") >= 3)
        // no broadcast hint: the >= 3-doc census of a 100 TB crawl is an
        // unbounded corpus statistic — a mandatory broadcast bypasses
        // AQE's size check and OOMs the driver at real scale. Unhinted,
        // AQE broadcasts when the flagged set is genuinely small and
        // otherwise shuffles on the 16-byte (h1, h2) keys.
        grams.select("gram", "h1", "h2")
          .join(flagged, Seq("h1", "h2"))
          .select("gram", "n_docs", "n_occ")
          .distinct()
          .orderBy(desc("n_docs"), desc("n_occ"), asc("gram"))
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id,
              |    unnest(list_transform(range(greatest(len(w) - 7, 0)),
              |      i -> array_to_string(w[i + 1:i + 8], ' '))) AS gram
              |  FROM words)
              |SELECT gram, count(DISTINCT doc_id) AS n_docs, count(*) AS n_occ
              |FROM grams GROUP BY gram HAVING count(DISTINCT doc_id) >= 3
              |ORDER BY n_docs DESC, n_occ DESC, gram""".stripMargin)
    ),

    // ---- boilerplate REMOVAL (the transform downstream of bp01) ------
    // bp01 finds the cross-document repeated 8-grams; this entry
    // actually strips them: every word position covered by a flagged
    // gram's [p, p+7] span is removed and the surviving words are
    // re-joined — RefinedWeb's boilerplate-removal step as a transform,
    // not just a census. Plan: positioned-gram explode → 128-bit hash
    // census (bp01 discipline, 16-byte shuffle keys) → AQE-decided
    // semi-join keeps flagged positions → ONE O(n) map-side fold per
    // doc rebuilds the text: flagged starts are distinct sorted
    // positions, so walking positions 0..n-1 needs at most one pointer
    // advance per step (no per-word interval scan — that would be
    // O(n²) on long docs). Census-anchored: clean docs pass through
    // verbatim with n_removed = 0.
    QueryDef(
      "bp02_boilerplate_strip",
      (s, d) => {
        val L = 8
        val grams8 =
          s"""CASE WHEN size(words) >= $L THEN
             |  transform(sequence(0, size(words) - $L),
             |            i -> concat_ws(' ', slice(words, i + 1, $L)))
             |ELSE cast(array() as array<string>) END""".stripMargin
        val words = table(s, d, "documents")
          .select(col("doc_id"), expr(wordsExpr).as("words"))
        val grams = words
          .select(col("doc_id"), posexplode(expr(grams8)).as(Seq("p", "gram")))
          .withColumn("h1", xxhash64(col("gram")))
          .withColumn("h2", xxhash64(col("gram"), lit(1)))
          .select("doc_id", "p", "h1", "h2")
        val flagged = grams.groupBy("h1", "h2")
          .agg(countDistinct("doc_id").as("n_docs"))
          .filter(col("n_docs") >= 3)
          .select("h1", "h2")
        // unhinted (AQE-decided) semi-join: see bp01's census note — the
        // flagged set is corpus-sized in the worst case, never forced
        // through the driver
        val starts = grams
          .join(flagged, Seq("h1", "h2"), "left_semi")
          .groupBy("doc_id")
          .agg(sort_array(collect_list(col("p"))).as("ps"))
        // Native codegen'd two-pointer scan (graft.functions.SpanStrip):
        // identical kept-set to the interpreted HOF fold it replaced
        // (equality pinned in DataQualitySpec), O(n + |ps|) per doc vs
        // the fold's O(n²) element copies from concat-per-kept-word.
        graft.functions.SpanStrip.register(s)
        words.join(starts, Seq("doc_id"), "left")
          .withColumn("ps",
            coalesce(col("ps"), expr("cast(array() as array<int>)")))
          .withColumn("cleaned",
            call_function(graft.functions.SpanStrip.fnName,
                          col("words"), col("ps"), lit(L)))
          .select(col("doc_id"),
                  size(col("words")).cast("long").as("n_tokens"),
                  (size(col("words")) - size(col("cleaned"))).cast("long")
                    .as("n_removed"),
                  concat_ws(" ", col("cleaned")).as("cleaned_text"))
          .orderBy("doc_id")
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, $wordsSql AS w FROM documents),
              |pos AS (
              |  SELECT doc_id, w,
              |    CAST(unnest(range(greatest(len(w) - 7, 0))) AS INT) AS p
              |  FROM words),
              |g2 AS (
              |  SELECT doc_id, p, array_to_string(w[p + 1:p + 8], ' ') AS g
              |  FROM pos),
              |census AS (
              |  SELECT g FROM g2 GROUP BY g HAVING count(DISTINCT doc_id) >= 3),
              |dup AS (
              |  SELECT doc_id, p FROM g2 WHERE g IN (SELECT g FROM census)),
              |marked AS (
              |  SELECT doc_id, p,
              |    CASE WHEN lag(p) OVER win IS NULL OR p > lag(p) OVER win + 7
              |         THEN 1 ELSE 0 END AS brk
              |  FROM dup WINDOW win AS (PARTITION BY doc_id ORDER BY p)),
              |numbered AS (
              |  SELECT doc_id, p,
              |    SUM(brk) OVER (PARTITION BY doc_id ORDER BY p
              |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
              |  FROM marked),
              |islands AS (
              |  SELECT doc_id, min(p) AS mn, max(p) + 7 AS mx
              |  FROM numbered GROUP BY doc_id, isl),
              |wp AS (
              |  SELECT doc_id, w, CAST(unnest(range(len(w))) AS INT) AS j
              |  FROM words),
              |keptw AS (
              |  SELECT wp.doc_id, wp.w[wp.j + 1] AS word, wp.j
              |  FROM wp
              |  WHERE NOT EXISTS (
              |    SELECT 1 FROM islands i
              |    WHERE i.doc_id = wp.doc_id AND wp.j BETWEEN i.mn AND i.mx)),
              |agg AS (
              |  SELECT doc_id, count(*) AS n_kept,
              |    string_agg(word, ' ' ORDER BY j) AS cleaned_text
              |  FROM keptw GROUP BY doc_id)
              |SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
              |  CAST(len(d.w) - coalesce(a.n_kept, 0) AS BIGINT) AS n_removed,
              |  coalesce(a.cleaned_text, '') AS cleaned_text
              |FROM words d LEFT JOIN agg a USING (doc_id)
              |ORDER BY d.doc_id""".stripMargin)
    ),

    // ---- incremental ingest gate --------------------------------------
    // Dedup of a NEW batch against the standing corpus — the shape every
    // continuously-fed training pipeline runs per ingest: for each new
    // document (source='src19' stands in for the arriving batch), the
    // fraction of its distinct 5-grams already present in the corpus
    // (containment). keep = containment < 0.5 (the Lee et al. near-dup
    // cut). The batch side is tiny relative to the corpus, so the
    // semi-join ships batch grams to the corpus partitions — the corpus
    // is never re-shuffled, which is what makes per-batch incremental
    // runs affordable at 100 TB.
    QueryDef(
      "id01_incremental_gate",
      // the shared [[gramGate]] (census-anchored containment; batch
      // gram set broadcasts onto the corpus scan, corpus never
      // re-shuffled) applied to the src19 arriving batch vs the rest
      (s, d) => {
        val docs = table(s, d, "documents")
        gramGate(docs.filter(col("source") === "src19"),
                 gramKeys(docs.filter(col("source") =!= "src19")))
          .orderBy("doc_id")
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |newg AS (SELECT DISTINCT doc_id, g FROM grams WHERE source = 'src19'),
              |corp AS (SELECT DISTINCT g FROM grams WHERE source <> 'src19'),
              |per AS (
              |  SELECT doc_id, count(*) AS n_grams,
              |    CAST(count(*) FILTER (g IN (SELECT g FROM corp)) AS BIGINT) AS n_hit
              |  FROM newg GROUP BY doc_id),
              |census AS (SELECT doc_id FROM documents WHERE source = 'src19')
              |SELECT c.doc_id,
              |  CAST(coalesce(p.n_grams, 0) AS BIGINT) AS n_grams,
              |  CAST(coalesce(p.n_hit, 0) AS BIGINT) AS n_hit,
              |  round(coalesce(p.n_hit, 0) * 1.0 /
              |        greatest(coalesce(p.n_grams, 0), 1), 6) AS containment,
              |  CAST(coalesce(p.n_hit, 0) * 1.0 /
              |       greatest(coalesce(p.n_grams, 0), 1) < 0.5 AS INT) AS keep
              |FROM census c LEFT JOIN per p USING (doc_id)
              |ORDER BY c.doc_id""".stripMargin)
    ),

    // ---- bloom-filter ingest gate -------------------------------------
    // id01's containment semantics with the corpus distilled into a
    // prebuilt bloom filter ([[BloomGramIndex]]): per-batch cost is
    // independent of corpus size — the batch is the only data scanned;
    // the corpus contributes a fixed-size probe literal. Bloom hits are
    // engine-specific (DuckDB cannot replay Spark's filter), so the
    // entry is rows-only; `id02x_bloom_anchor` (bench-excluded)
    // hash-pins the subset direction and the realized fp rate.
    // SELF-AUDITING ([[SelfAudit]] discipline): the bloom gate serves
    // the full batch; the same plan re-runs the EXACT gram gate for a
    // deterministic quarter of the batch (doc_id % 4 = 0) and audits
    // the sketch's one-sided error — bloom-keeps ⊆ exact-keeps on the
    // slice (no false negatives in membership ⇒ bloom containment ≥
    // exact containment) — plus the realized fp rate over the slice's
    // truly-absent grams against the filter's sizing. The slice's exact
    // keep count, absent-gram count, and the batch census are the
    // oracle's recomputable scalars; id02x stays the full anchor.
    QueryDef(
      "id02_bloom_gate",
      (s, d) => {
        val docs = table(s, d, "documents")
        val batch = docs.filter(col("source") === "src19")
        val bf = BloomGramIndex.ensure(s, d)
        val served = SelfAudit.once(bloomGate(s, batch, bf))
        val audBatch = batch.filter(col("doc_id") % 4 === 0)
        val corpusGrams = gramKeys(docs.filter(col("source") =!= "src19"))
        val exactKeep = SelfAudit.once(
          gramGate(audBatch, corpusGrams).filter(col("keep") === 1)
            .select("doc_id"))
        val leaked = served
          .filter(col("keep") === 1 && col("doc_id") % 4 === 0)
          .select("doc_id")
          .join(exactKeep, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("__l"))
        val newGset = gramKeys(audBatch).select("g").distinct()
        val matched = corpusGrams.select("g")
          .join(broadcast(newGset), Seq("g"), "left_semi").distinct()
        val absent = newGset.join(broadcast(matched), Seq("g"), "left_anti")
        val hit = graft.functions.BloomProbeFile.probe(
          s, lit(bf), xxhash64(col("g")))
        val fp = absent.agg(
          count(lit(1)).as("n_absent_audit"),
          coalesce(avg(when(hit, 1.0).otherwise(0.0)) <= 0.05, lit(true))
            .as("fp_ok"))
        served.agg(count(lit(1)).as("n_batch"))
          .crossJoin(exactKeep.agg(count(lit(1)).as("n_exact_keep_audit")))
          .crossJoin(leaked).crossJoin(fp)
          .select(col("n_batch"), col("n_exact_keep_audit"),
                  col("n_absent_audit"),
                  (col("__l") === 0).as("no_leak_ok"), col("fp_ok"))
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |corp AS (SELECT DISTINCT g FROM grams WHERE source <> 'src19'),
              |newg AS (SELECT DISTINCT doc_id, g FROM grams
              |         WHERE source = 'src19' AND doc_id % 4 = 0),
              |per AS (
              |  SELECT doc_id, count(*) AS n_grams,
              |    CAST(count(*) FILTER (g IN (SELECT g FROM corp)) AS BIGINT)
              |      AS n_hit
              |  FROM newg GROUP BY doc_id),
              |census AS (SELECT doc_id FROM documents
              |           WHERE source = 'src19' AND doc_id % 4 = 0)
              |SELECT
              |  (SELECT count(*) FROM documents WHERE source = 'src19')
              |    AS n_batch,
              |  (SELECT count(*) FROM census c LEFT JOIN per p USING (doc_id)
              |   WHERE coalesce(p.n_hit, 0) * 1.0 /
              |         greatest(coalesce(p.n_grams, 0), 1) < 0.5)
              |    AS n_exact_keep_audit,
              |  (SELECT count(*) FROM (SELECT DISTINCT g FROM newg) n
              |   WHERE n.g NOT IN (SELECT g FROM corp)) AS n_absent_audit,
              |  true AS no_leak_ok, true AS fp_ok""".stripMargin)
    ),
    // Correctness anchor for id02, hash-exact against DuckDB:
    //   leaked   = docs the bloom gate keeps that the exact gate drops
    //              — MUST be 0 (no false negatives in membership ⇒
    //              bloom containment ≥ exact containment ⇒ bloom-keep ⊆
    //              exact-keep);
    //   n_absent = batch grams truly absent from the corpus (exact,
    //              data-dependent — pins the absent-set construction);
    //   fp_ok    = realized false-positive rate over those absent grams
    //              ≤ 5× the filter's configured 1% — the sketch honors
    //              its sizing;
    //   n_batch  = batch census (both gates decided every doc).
    // Re-runs the exact id01 machinery to compare against — that cost
    // is the anchor's point, so it sits outside the bench total.
    QueryDef(
      "id02x_bloom_anchor",
      (s, d) => {
        val docs = table(s, d, "documents")
        val batch = docs.filter(col("source") === "src19")
        val corpusGrams = gramKeys(docs.filter(col("source") =!= "src19"))
        val bf = BloomGramIndex.ensure(s, d)
        val bloomKeep = bloomGate(s, batch, bf)
          .filter(col("keep") === 1).select("doc_id")
        val exactKeep = gramGate(batch, corpusGrams)
          .filter(col("keep") === 1).select("doc_id")
        val leaked = bloomKeep
          .join(exactKeep, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("leaked"))
        // absent set via id01's broadcast discipline: batch gram set
        // onto the corpus scan, never the reverse
        val newGset = gramKeys(batch).select("g").distinct()
        val matched = corpusGrams.select("g")
          .join(broadcast(newGset), Seq("g"), "left_semi").distinct()
        val absent = newGset.join(broadcast(matched), Seq("g"), "left_anti")
        val hit = graft.functions.BloomProbeFile.probe(
          s, lit(bf), xxhash64(col("g")))
        val fp = absent.agg(
          count(lit(1)).as("n_absent"),
          coalesce(avg(when(hit, 1.0).otherwise(0.0)) <= 0.05, lit(true))
            .as("fp_ok"))
        val census = batch.agg(count(lit(1)).as("n_batch"))
        leaked.crossJoin(fp).crossJoin(census)
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |newg AS (SELECT DISTINCT g FROM grams WHERE source = 'src19'),
              |corp AS (SELECT DISTINCT g FROM grams WHERE source <> 'src19')
              |SELECT CAST(0 AS BIGINT) AS leaked,
              |  CAST((SELECT count(*) FROM newg
              |        WHERE g NOT IN (SELECT g FROM corp)) AS BIGINT)
              |    AS n_absent,
              |  true AS fp_ok,
              |  CAST((SELECT count(*) FROM documents
              |        WHERE source = 'src19') AS BIGINT) AS n_batch""".stripMargin)
    ),

    // ---- sharded bloom ingest gate ------------------------------------
    // id02's design past the single-filter ceiling: ~10⁹ corpus grams
    // make one filter ~1.2 GB — too big for a comfortable per-executor
    // buffer or a driver-side merge. The K-sharded family
    // ([[BloomGramIndex.ensureSharded]]) routes each gram to
    // `pmod(xxhash64, K)`; every buffer is 1/K the size, membership is
    // a disjoint union (no semantics change), and the probe
    // ([[graft.functions.BloomProbeSharded]]) still costs one bit-array
    // probe per gram. Same rows-only status as id02 (bloom hits are
    // engine-specific); `id03x_sharded_anchor` hash-pins the subset
    // direction, fp bound, and census — which jointly pin that probe
    // routing equals build routing (a mis-route would leak instantly).
    // SELF-AUDITING: id02's audit shape against the K-sharded family —
    // the same one-sided-error and fp-rate claims, which jointly also
    // pin that probe routing equals build routing (a gram mis-routed at
    // probe time misses its inserted shard, under-counts containment,
    // and surfaces as a leak). id03x stays the full anchor.
    QueryDef(
      "id03_sharded_bloom_gate",
      (s, d) => {
        val docs = table(s, d, "documents")
        val batch = docs.filter(col("source") === "src19")
        val base = BloomGramIndex.ensureSharded(s, d, ShardedK)
        val served = SelfAudit.once(
          bloomGateSharded(s, batch, base, ShardedK))
        val audBatch = batch.filter(col("doc_id") % 4 === 0)
        val corpusGrams = gramKeys(docs.filter(col("source") =!= "src19"))
        val exactKeep = SelfAudit.once(
          gramGate(audBatch, corpusGrams).filter(col("keep") === 1)
            .select("doc_id"))
        val leaked = served
          .filter(col("keep") === 1 && col("doc_id") % 4 === 0)
          .select("doc_id")
          .join(exactKeep, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("__l"))
        val newGset = gramKeys(audBatch).select("g").distinct()
        val matched = corpusGrams.select("g")
          .join(broadcast(newGset), Seq("g"), "left_semi").distinct()
        val absent = newGset.join(broadcast(matched), Seq("g"), "left_anti")
        val hit = graft.functions.BloomProbeSharded.probe(
          s, lit(base), lit(ShardedK), xxhash64(col("g")))
        val fp = absent.agg(
          count(lit(1)).as("n_absent_audit"),
          coalesce(avg(when(hit, 1.0).otherwise(0.0)) <= 0.05, lit(true))
            .as("fp_ok"))
        served.agg(count(lit(1)).as("n_batch"))
          .crossJoin(exactKeep.agg(count(lit(1)).as("n_exact_keep_audit")))
          .crossJoin(leaked).crossJoin(fp)
          .select(col("n_batch"), col("n_exact_keep_audit"),
                  col("n_absent_audit"),
                  (col("__l") === 0).as("no_leak_ok"), col("fp_ok"))
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |corp AS (SELECT DISTINCT g FROM grams WHERE source <> 'src19'),
              |newg AS (SELECT DISTINCT doc_id, g FROM grams
              |         WHERE source = 'src19' AND doc_id % 4 = 0),
              |per AS (
              |  SELECT doc_id, count(*) AS n_grams,
              |    CAST(count(*) FILTER (g IN (SELECT g FROM corp)) AS BIGINT)
              |      AS n_hit
              |  FROM newg GROUP BY doc_id),
              |census AS (SELECT doc_id FROM documents
              |           WHERE source = 'src19' AND doc_id % 4 = 0)
              |SELECT
              |  (SELECT count(*) FROM documents WHERE source = 'src19')
              |    AS n_batch,
              |  (SELECT count(*) FROM census c LEFT JOIN per p USING (doc_id)
              |   WHERE coalesce(p.n_hit, 0) * 1.0 /
              |         greatest(coalesce(p.n_grams, 0), 1) < 0.5)
              |    AS n_exact_keep_audit,
              |  (SELECT count(*) FROM (SELECT DISTINCT g FROM newg) n
              |   WHERE n.g NOT IN (SELECT g FROM corp)) AS n_absent_audit,
              |  true AS no_leak_ok, true AS fp_ok""".stripMargin)
    ),
    QueryDef(
      "id03x_sharded_anchor",
      // id02x's contract verbatim, against the sharded family: leaked
      // (sharded-keep \ exact-keep) MUST be 0 — a gram mis-routed at
      // probe time would miss its inserted shard and under-count
      // containment, surfacing here; fp rate over truly-absent grams
      // bounded; full batch census. Bench-excluded like every anchor
      // that re-runs the exact machinery it compares against.
      (s, d) => {
        val docs = table(s, d, "documents")
        val batch = docs.filter(col("source") === "src19")
        val corpusGrams = gramKeys(docs.filter(col("source") =!= "src19"))
        val base = BloomGramIndex.ensureSharded(s, d, ShardedK)
        val bloomKeep = bloomGateSharded(s, batch, base, ShardedK)
          .filter(col("keep") === 1).select("doc_id")
        val exactKeep = gramGate(batch, corpusGrams)
          .filter(col("keep") === 1).select("doc_id")
        val leaked = bloomKeep
          .join(exactKeep, Seq("doc_id"), "left_anti")
          .agg(count(lit(1)).as("leaked"))
        val newGset = gramKeys(batch).select("g").distinct()
        val matched = corpusGrams.select("g")
          .join(broadcast(newGset), Seq("g"), "left_semi").distinct()
        val absent = newGset.join(broadcast(matched), Seq("g"), "left_anti")
        val hit = graft.functions.BloomProbeSharded.probe(
          s, lit(base), lit(ShardedK), xxhash64(col("g")))
        val fp = absent.agg(
          count(lit(1)).as("n_absent"),
          coalesce(avg(when(hit, 1.0).otherwise(0.0)) <= 0.05, lit(true))
            .as("fp_ok"))
        val census = batch.agg(count(lit(1)).as("n_batch"))
        leaked.crossJoin(fp).crossJoin(census)
      },
      Some(s"""WITH words AS (
              |  SELECT doc_id, source, $wordsSql AS w FROM documents),
              |grams AS (
              |  SELECT doc_id, source,
              |    unnest(list_transform(range(greatest(len(w) - 4, 0)),
              |      i -> md5(array_to_string(w[i + 1:i + 5], ' ')))) AS g
              |  FROM words),
              |newg AS (SELECT DISTINCT g FROM grams WHERE source = 'src19'),
              |corp AS (SELECT DISTINCT g FROM grams WHERE source <> 'src19')
              |SELECT CAST(0 AS BIGINT) AS leaked,
              |  CAST((SELECT count(*) FROM newg
              |        WHERE g NOT IN (SELECT g FROM corp)) AS BIGINT)
              |    AS n_absent,
              |  true AS fp_ok,
              |  CAST((SELECT count(*) FROM documents
              |        WHERE source = 'src19') AS BIGINT) AS n_batch""".stripMargin)
    ),

    // ---- adaptive (percentile-derived) quality gate -------------------
    // dq02's fixed constants (word-count band 20–10000, dup ratio 0.5)
    // assume the corpus looks like C4's; a real curation pass derives
    // its cutoffs from the corpus itself — keep docs at or above the
    // 25th percentile of length and at or below the 75th percentile of
    // duplicate-word fraction. The thresholds are ONE tiny exact-
    // percentile aggregate (x15's interpolated-percentile machinery)
    // broadcast back over the map-only per-doc stats — the same
    // one-aggregate + broadcast-gate shape as dm01/dm03, so the corpus
    // is never shuffled. Gate compares UNROUNDED thresholds (identical
    // IEEE interpolation in both engines); rounded copies are emitted
    // for display.
    QueryDef(
      "dq04_adaptive_quality_gate",
      (s, d) => {
        val stats = table(s, d, "documents")
          .select(col("doc_id"), expr(wordsExpr).as("words"))
          .select(col("doc_id"), size(col("words")).as("n_words"),
                  size(array_distinct(col("words"))).as("n_distinct"))
          .select(col("doc_id"), col("n_words"),
                  round((col("n_words") - col("n_distinct")) * lit(1.0) /
                        greatest(col("n_words"), lit(1)), 6)
                    .as("dup_word_frac"))
        val th = stats.agg(
          expr("percentile(n_words, 0.25)").as("p25w"),
          expr("percentile(dup_word_frac, 0.75)").as("p75d"))
        stats.crossJoin(broadcast(th))
          .select(col("doc_id"), col("n_words"), col("dup_word_frac"),
                  round(col("p25w"), 4).as("p25_words"),
                  round(col("p75d"), 6).as("p75_dup"),
                  (col("n_words") >= col("p25w") &&
                   col("dup_word_frac") <= col("p75d"))
                    .cast("int").as("keep"))
          .orderBy("doc_id")
      },
      Some(s"""WITH st AS (
              |  SELECT doc_id, len(w) AS n_words,
              |    round((len(w) - len(list_distinct(w))) * 1.0 /
              |          greatest(len(w), 1), 6) AS dup_word_frac
              |  FROM (SELECT doc_id, $wordsSql AS w FROM documents)),
              |th AS (
              |  SELECT quantile_cont(n_words, 0.25) AS p25w,
              |         quantile_cont(dup_word_frac, 0.75) AS p75d
              |  FROM st)
              |SELECT doc_id, n_words, dup_word_frac,
              |  round(p25w, 4) AS p25_words, round(p75d, 6) AS p75_dup,
              |  CAST(n_words >= p25w AND dup_word_frac <= p75d AS INT) AS keep
              |FROM st CROSS JOIN th ORDER BY doc_id""".stripMargin)
    ),

    // ---- LM-familiarity quality bins (CCNet-style) --------------------
    // CCNet buckets a crawl into head/middle/tail by language-model
    // perplexity and keeps the head for training. This is that gate
    // with the corpus' own bigram statistics as the LM and a RATIONAL
    // familiarity score standing in for perplexity: familiarity(doc) =
    // mean corpus frequency of the doc's bigrams = sum(n_bg)/count(bg)
    // — integer-derived, so both engines agree bit-for-bit (the tx08/
    // tx11 no-transcendental discipline; log-perplexity is monotone-
    // decreasing in geometric-mean frequency, and this arithmetic-mean
    // form ranks repetitive/familiar text above novel text the same
    // way). Cutoffs are per-language P25/P75 quartiles DERIVED from the
    // corpus (dq04's adaptive-threshold discipline).
    //
    // The score is carried as an exact INTEGER micro-score
    // (`(sum·10⁶) div count`) rather than a rounded double: quartile
    // interpolation over integer order statistics at dyadic fractions
    // (0.25·(n−1) mod 1 ∈ {0, ¼, ½, ¾}) is EXACT in IEEE arithmetic,
    // so both engines' interpolation formulas produce the identical
    // double — measured: P75 over the rounded-double score differed in
    // the last ulp between Spark and DuckDB at sf0.001 (a + f·(b−a) vs
    // (1−f)·a + f·b), flipping the 6-dp rounding. Headroom: the
    // micro-score numerator is ≤ doc_bigrams · max_gram_count · 10⁶ —
    // at 3·10² bigrams/doc over a 10⁹-max-count corpus that is ~3·10¹⁷,
    // inside int64.
    //
    // Scale shape: one explode → dictionary-sized bigram counts
    // (partially aggregated); the bigram⋈dictionary join stays a
    // SHUFFLE join keyed on the bigram (a web corpus' bigram vocabulary
    // is 10^9+ — broadcasting it is the scale bug, tx11's note); one
    // per-doc aggregate; per-language cutoffs are language-cardinality-
    // sized and broadcast back. Census-anchored: docs with < 2 words
    // have no bigrams and bin as 'short' (NULL familiarity) instead of
    // vanishing.
    QueryDef(
      "lm01_familiarity_bins",
      (s, d) =>
        familiarityBins(s, d)
          .select(col("doc_id"), col("lang"),
                  coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
                  round(col("fam_micro") / 1e6, 6).as("familiarity"),
                  col("p25_micro"), col("p75_micro"),
                  col("bin"))
          .orderBy("doc_id"),
      Some(s"""WITH d AS (SELECT doc_id, lang, $wordsSql AS w FROM documents),
              |bgp AS (SELECT doc_id, lang,
              |          unnest(w[1:len(w) - 1]) AS a,
              |          unnest(w[2:len(w)]) AS b
              |        FROM d),
              |bg AS (SELECT doc_id, lang, a || ' ' || b AS bg FROM bgp),
              |dict AS (SELECT bg, count(*) AS n FROM bg GROUP BY bg),
              |fam AS (
              |  SELECT doc_id, lang, count(*) AS n_bigrams,
              |    CAST((sum(n) * 1000000) // count(*) AS BIGINT) AS fam_micro
              |  FROM bg JOIN dict USING (bg) GROUP BY doc_id, lang),
              |cuts AS (
              |  SELECT lang, quantile_cont(fam_micro, 0.25) AS p25m,
              |         quantile_cont(fam_micro, 0.75) AS p75m
              |  FROM fam GROUP BY lang),
              |sc AS (
              |  SELECT f.doc_id, f.n_bigrams,
              |    round(f.fam_micro / 1e6, 6) AS familiarity,
              |    c.p25m AS p25_micro, c.p75m AS p75_micro,
              |    CASE WHEN f.fam_micro < c.p25m THEN 'tail'
              |         WHEN f.fam_micro >= c.p75m THEN 'head'
              |         ELSE 'middle' END AS bin
              |  FROM fam f JOIN cuts c ON f.lang = c.lang)
              |SELECT d0.doc_id, d0.lang,
              |  coalesce(sc.n_bigrams, 0) AS n_bigrams,
              |  sc.familiarity, sc.p25_micro, sc.p75_micro,
              |  coalesce(sc.bin, 'short') AS bin
              |FROM documents d0 LEFT JOIN sc ON d0.doc_id = sc.doc_id
              |ORDER BY d0.doc_id""".stripMargin)
    ),

    // ---- log scrubbing / pseudonymization -----------------------------
    // PII-style cleanup of event logs before they can feed a training
    // corpus: numeric identifiers in the payload are masked, the user
    // key is replaced by a stable one-way pseudonym (md5 prefix — same
    // user always maps to the same token, original never recoverable
    // from the output), and the redaction count is reported per event.
    // Map-only projection; at 100 TB this is an embarrassingly parallel
    // pass with zero shuffle.
    QueryDef(
      "pii01_scrub_logs",
      (s, d) =>
        table(s, d, "events")
          .select(
            col("event_id"),
            concat(lit("u_"),
                   substring(md5(col("user_id").cast("string")
                     .cast("binary")), 1, 8)).as("user_pseudo"),
            regexp_count(col("props"), lit("[0-9]+")).cast("int")
              .as("n_redactions"),
            regexp_replace(col("props"), "[0-9]+", "[NUM]").as("scrubbed"))
          .orderBy("event_id"),
      Some("""SELECT event_id,
             |  'u_' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8) AS user_pseudo,
             |  CAST(len(regexp_extract_all(props, '[0-9]+')) AS INT) AS n_redactions,
             |  regexp_replace(props, '[0-9]+', '[NUM]', 'g') AS scrubbed
             |FROM events ORDER BY event_id""".stripMargin)
    )
  )
}
