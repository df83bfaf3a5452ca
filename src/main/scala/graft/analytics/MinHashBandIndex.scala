package graft.analytics

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.MinHashSig
import graft.queries.QueryDef

/** Persisted MinHash band index over the existing corpus, and the
  * near-dup INGEST gate probed against it — the fuzzy twin of the exact
  * bloom ingest gate (id02/[[BloomGramIndex]]): "reject an arriving doc
  * if the corpus already contains a near-duplicate of it", where
  * near-duplicate means word-2-gram Jaccard ≥ [[MinJaccard]] (dd02's
  * metric, same shingling, same signatures).
  *
  * Index layout (content-stamped dir, built once offline):
  *  - `bands/`  — one row per (corpus doc × LSH band): (corpus_id,
  *    band, key), written PARTITIONED BY `kp = key mod [[KeyParts]]`.
  *    A small arriving batch probes few distinct keys, so its kp set
  *    (collected driver-side, ≤ [[KeyParts]] ints — metadata) prunes
  *    the bands scan to the touched partitions: per-batch probe cost
  *    follows the batch, not the corpus.
  *  - `shingles/` — (corpus_id, sh): the shingle-hash sets used by the
  *    exact-Jaccard refine; only rows for surviving CANDIDATES are ever
  *    joined (an equi-join on corpus_id after LSH has pruned the
  *    corpus to a bounded candidate set).
  *  - `append_log/` — one provenance row per appended batch (count,
  *    id bounds, order-independent content stamp), extending the
  *    build-time content-stamp discipline to appended segments.
  *
  * Gate semantics (deterministic end to end): candidates = arrivals
  * sharing ANY of the 12 LSH band keys with a corpus doc, hot buckets
  * (> [[MaxBucket]] corpus rows for one (band, key)) dropped BEFORE
  * the candidate join exactly like dd02's skew guard; refine = exact
  * Jaccard on the shingle sets, reject iff best ≥ [[MinJaccard]]; the
  * reported match is (max jaccard, then min corpus_id) — precision 1
  * vs the exhaustive gate by construction, recall bounded by the LSH
  * band miss probability (dd09r pins it on the ≥ 0.9 stratum, where
  * one band of 4 rows collides with prob 0.9⁴ and all 12 miss with
  * prob (1 − 0.9⁴)¹² ≈ 2.7e-6).
  *
  * Scale shape: the batch side is the arriving micro-batch (small by
  * definition); the corpus side is touched only through (a) the
  * kp-pruned bands scan and (b) the candidate-id equi-join into
  * `shingles/` — never a full-corpus scan per batch. Appends are
  * map-only writes of the accepted docs' bands + shingles (cost ∝
  * batch), so the index chains across ingest epochs the same way the
  * bloom gate's filter does (id03's discipline; chain property pinned
  * in DedupSpec).
  */
object MinHashBandIndex {
  import QueryDef.table

  /** Refine threshold — dd02's near-dup bar. */
  val MinJaccard = 0.3

  /** Skew guard: (band, key) buckets with more corpus rows than this
    * are dropped before the candidate join (dd02's maxBucket). */
  val MaxBucket = 500

  /** Number of `kp = key mod KeyParts` partitions of `bands/`. */
  val KeyParts = 64

  /** Fixture convention for the ingest split: arrivals are the docs a
    * crawl delivers this epoch, the rest is the standing corpus. */
  def arrivalsOf(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(10)) === 0)
  def corpusOf(docs: DataFrame): DataFrame =
    docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)

  private val built = new ConcurrentHashMap[String, String]()

  /** Content fingerprint of the documents table (per-part name, length,
    * mtime) — a regenerated dataset at the same path can never silently
    * reuse a stale index. */
  private def contentStamp(sfDir: String): String = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).map(_.toSeq).getOrElse(Seq.empty).flatMap(walk)
      else Seq(f)
    val sig = walk(new java.io.File(s"$sfDir/documents.parquet"))
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}")
      .sorted.mkString("|")
    Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sig, 0x9747b28c))
  }

  def indexDir(sfDir: String): String = {
    val key = Integer.toHexString(
      scala.util.hashing.MurmurHash3.stringHash(sfDir, 0x9747b28c))
    s"${sys.props("java.io.tmpdir")}/graft-mhband-$key-${contentStamp(sfDir)}-v1"
  }

  /** (doc_id, sh, band, key) — shingle set + the 12 LSH band keys of
    * each doc; one row per (doc, band). */
  private def bandRows(spark: SparkSession, docs: DataFrame): DataFrame = {
    MinHashSig.register(spark)
    docs
      .select(col("doc_id"),
              Dedup.shingleHashes(spark, col("text"), 2).as("sh"))
      .withColumn("sig", call_function(MinHashSig.fnName, col("sh")))
      .select(col("doc_id"), col("sh"),
              posexplode(Dedup.bandKeys(col("sig"))).as(Seq("band", "key")))
  }

  /** Index-side band rows of `docs` — (corpus_id, band, key, kp), the
    * payload a build/append/streaming-delta write lands. */
  def segmentBands(spark: SparkSession, docs: DataFrame): DataFrame =
    bandRows(spark, docs)
      .select(col("doc_id").as("corpus_id"), col("band"), col("key"),
              pmod(col("key"), lit(KeyParts.toLong)).cast("int").as("kp"))

  /** Index-side shingle rows of `docs` — (corpus_id, sh). */
  def segmentShingles(spark: SparkSession, docs: DataFrame): DataFrame =
    bandRows(spark, docs)
      .select(col("doc_id").as("corpus_id"), col("sh"))
      .dropDuplicates("corpus_id")

  /** Both index-side frames from ONE materialized SHINGLE pass — for
    * IN-PLAN (unpersisted) corpora, where calling [[segmentBands]] and
    * [[segmentShingles]] separately re-tokenizes and re-hashes the
    * whole corpus twice (the persisted-index path never hits this: the
    * build writes both frames from one pass and gates read parquet).
    * What is checkpointed is the per-DOC (doc_id, sh) frame — NOT the
    * exploded band rows, whose 12×-duplicated shingle payload made a
    * first cut of this helper SLOWER than the two-pass form it
    * replaces (measured 3.98 vs 3.51 s on sk03: columnar pruning had
    * let each lazy pass drop the fat column the other needed). r16,
    * for sk03's two derived-corpus gate stages. */
  def segmentFrames(spark: SparkSession, docs: DataFrame)
      : (DataFrame, DataFrame) = {
    MinHashSig.register(spark)
    // persist with lineage INTACT, not localCheckpoint: callers pass
    // corpus-scale frames here (dm10's train side, sk03's derived
    // corpus), and a lineage-truncated corpus-wide frame turns an
    // executor loss into a dead query at cluster scale (VERDICT r17
    // #2 / guide §5). Both returned frames still derive from ONE
    // materialized pass — the first consumer fills the blocks.
    val base = docs
      .select(col("doc_id"), Dedup.shingleHashes(spark, col("text"), 2).as("sh"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bands = base
      .withColumn("sig", call_function(MinHashSig.fnName, col("sh")))
      .select(col("doc_id"),
              posexplode(Dedup.bandKeys(col("sig"))).as(Seq("band", "key")))
      .select(col("doc_id").as("corpus_id"), col("band"), col("key"),
              pmod(col("key"), lit(KeyParts.toLong)).cast("int").as("kp"))
    (bands, base.select(col("doc_id").as("corpus_id"), col("sh")))
  }

  /** Build + persist the index over `sfDir`'s standing corpus if
    * absent; returns the index dir. */
  def ensure(spark: SparkSession, sfDir: String): String = {
    val dir = indexDir(sfDir)
    built.computeIfAbsent(dir, { _ =>
      if (!new java.io.File(s"$dir/bands/_SUCCESS").exists())
        buildFrom(spark, dir, corpusOf(table(spark, sfDir, "documents")))
      dir
    })
  }

  /** Build the index into `dir` from an explicit corpus frame (the
    * spec's chain probes rebuild over corpus+accepted this way). */
  def buildFrom(spark: SparkSession, dir: String, corpus: DataFrame): Unit = {
    val rows = bandRows(spark, corpus).persist()
    try {
      rows.select(col("doc_id").as("corpus_id"), col("band"), col("key"),
                  pmod(col("key"), lit(KeyParts.toLong)).cast("int").as("kp"))
        .repartition(KeyParts, col("kp")) // one file per kp dir; hash
                                          // collisions leave ~1/e of the
                                          // 64 tasks empty, so writer
                                          // parallelism is ~40-way, not
                                          // 64 (see mergeSegments)
        .write.mode("overwrite").partitionBy("kp").parquet(s"$dir/bands")
      rows.select(col("doc_id").as("corpus_id"), col("sh"))
        .dropDuplicates("corpus_id")
        .write.mode("overwrite").parquet(s"$dir/shingles")
    } finally { rows.unpersist(false); () }
  }

  /** Assignment-only APPEND of accepted docs: their bands + shingles
    * land as new files (cost ∝ batch; the standing index is never read
    * or rewritten), plus one provenance row in `append_log/`. Returns
    * the number of appended docs.
    *
    * Caller contract: `docs` must be MATERIALIZED (collected, written,
    * or checkpointed) if it was derived from a [[gate]] result — gate
    * outputs are lazy plans over this same index dir, so re-evaluating
    * one after the append would see the mutated index (an appended doc
    * then rejects against itself). The streaming driver satisfies this
    * naturally (each micro-batch is materialized before its append). */
  def appendAccepted(spark: SparkSession, dir: String,
                     docs: DataFrame): Long = {
    val rows = bandRows(spark, docs).persist()
    try {
      rows.select(col("doc_id").as("corpus_id"), col("band"), col("key"),
                  pmod(col("key"), lit(KeyParts.toLong)).cast("int").as("kp"))
        .repartition(KeyParts, col("kp")) // one file per kp dir, ~40-way
                                          // writers (see buildFrom note)
        .write.mode("append").partitionBy("kp").parquet(s"$dir/bands")
      val sh = rows.select(col("doc_id").as("corpus_id"), col("sh"))
        .dropDuplicates("corpus_id")
      sh.write.mode("append").parquet(s"$dir/shingles")
      val prov = sh.agg(
        count(lit(1)).as("n_docs"),
        min("corpus_id").as("min_doc_id"),
        max("corpus_id").as("max_doc_id"),
        bit_xor(xxhash64(col("corpus_id"), to_json(col("sh"))))
          .as("batch_stamp"))
      prov.coalesce(1).write.mode("append").parquet(s"$dir/append_log")
      prov.head().getLong(0)
    } finally { rows.unpersist(false); () }
  }

  /** Fold streaming delta SEGMENTS (st19/st20's accepted-doc state,
    * batch-id-partitioned under the two delta roots) into the seed
    * index: segment rows append into `seedDir/bands` (same kp
    * partitioning — the merged index keeps its pruning layout) and
    * `seedDir/shingles`, then the delta roots are dropped. Cost ∝ the
    * segments, never the seed. This is the checkpoint step of a
    * long-running ingest stream — without it the per-batch gate reads
    * an ever-growing list of segment files; after it the stream
    * restarts from an empty delta with identical gate semantics
    * (spec-pinned: gate-against-merged ≡ gate-against-seed+deltas).
    * Returns the number of docs folded in. Run it only while the
    * stream is DOWN (it mutates state the running query reads). */
  def mergeSegments(spark: SparkSession, seedDir: String,
                    bandsDeltaDir: String, shinglesDeltaDir: String): Long = {
    def rmrf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete(); ()
    }
    val bandsDelta = new java.io.File(bandsDeltaDir)
    val shDelta = new java.io.File(shinglesDeltaDir)
    if (!bandsDelta.exists()) return 0L
    // the two delta reads, and then the two seed appends, are
    // independent action pairs — overlap each pair (ParActions; the
    // jobs are small and nowhere near fill the executor slots)
    val (segBands, segSh) = ParActions.both(
      () => spark.read.parquet(bandsDeltaDir)
        .select("corpus_id", "band", "key", "kp")
        .localCheckpoint(true), // sever from the dirs we are about to drop
      () => spark.read.parquet(shinglesDeltaDir)
        .select("corpus_id", "sh")
        .localCheckpoint(true))
    // spread the append across the kp dirs it lands in: a delta read
    // back from few landed files is 1-2 partitions, so the partitioned
    // write was ONE task sequentially opening all 64 kp writers (r17
    // JobProf: a 1.1 s single-task job inside st22's fold). Hashing on
    // the partition column keeps exactly one file per kp dir per fold
    // (each kp lives in one task) while the opens run in parallel —
    // same file count, same rows, straggler gone at every scale.
    ParActions.both(
      () => segBands.repartition(KeyParts, col("kp"))
        .write.mode("append").partitionBy("kp")
        .parquet(s"$seedDir/bands"),
      () => segSh.write.mode("append").parquet(s"$seedDir/shingles"))
    val n = segSh.count()
    rmrf(bandsDelta); rmrf(shDelta)
    n
  }

  /** Segment-RETENTION policy — the scheduler [[mergeSegments]] was
    * missing: the streaming gates land one batch-id-partitioned delta
    * segment per micro-batch, so a long-lived stream accumulates
    * segments without bound (every micro-batch re-lists and re-reads
    * them all). Same trigger discipline as [[IvfIndex.compactLists]]:
    * past `maxSegments` landed batch partitions, fold the deltas into
    * the seed (gate semantics unchanged — the merge spec pins
    * gate-against-merged ≡ gate-against-seed+deltas) and restart from
    * an empty delta. MAINTENANCE-WINDOW contract: call only after a
    * CLEAN stop (checkpoint committed for every landed batch) — the
    * batch-id replay guard (`batch_id < current`) is what keeps an
    * uncommitted batch from gating against its own landed segment, and
    * the merge erases that distinction. Returns the docs folded in
    * (0 while under the threshold). */
  def maintainSegments(spark: SparkSession, seedDir: String,
                       bandsDeltaDir: String, shinglesDeltaDir: String,
                       maxSegments: Int = 8): Long =
    if (segmentCount(bandsDeltaDir) > maxSegments)
      mergeSegments(spark, seedDir, bandsDeltaDir, shinglesDeltaDir)
    else 0L

  /** Landed batch partitions in a delta dir (the retention trigger). */
  def segmentCount(deltaDir: String): Int =
    Option(new java.io.File(deltaDir).listFiles()).getOrElse(Array.empty)
      .count(f => f.isDirectory && f.getName.startsWith("batch_id="))

  /** Tombstone DELETE ([[Tombstones]] parity with the serving
    * indexes): a RETRACTED corpus doc must stop gating arrivals — its
    * near-dups are no longer duplicates of anything the corpus keeps.
    * Deleted corpus_ids land as the append-only side segment
    * (replay-idempotent batch stamps); [[gate]] anti-joins them out of
    * the bands side, so no candidate can arise against a retracted doc.
    * [[purgeTombstones]] applies them physically. */
  def deleteDocs(spark: SparkSession, dir: String, ids: DataFrame): Long =
    Tombstones.delete(spark, dir, ids, idCol = "corpus_id")

  /** Physically apply the tombstones: the BANDS (the gating state) are
    * rewritten kp-partition-locally — only partitions holding a
    * tombstoned row — and the SHINGLES (the retracted docs' derived
    * content, which a takedown must not outlive) in one filtered
    * staging rewrite, each swapped in via [[StagedSwap]]'s move-first
    * protocol; tombstones cleared last, so a crash at any point leaves
    * rows still masked by the gate and never a state where data exists
    * only in a reader-invisible staging dir. The shingles rewrite is
    * decided INDEPENDENTLY of the bands (its own tombstone semi-join +
    * staging-leftover check) — a purge replayed after all band
    * partitions were already rewritten still rewrites the shingles, so
    * purge convergence holds for both segments. Batch takedowns
    * amortize: many tombstones, one rewrite. Returns the number of
    * band partitions rewritten. */
  def purgeTombstones(spark: SparkSession, dir: String): Int = {
    val bandsBase = new java.io.File(s"$dir/bands")
    // complete interrupted swaps first; recovered targets may hold
    // old ∪ staged duplicates, so they are force-rewritten below and
    // the rewrites' natural-key dedup converges their row sets
    val recoveredKps = StagedSwap.recover(bandsBase, "purge")
      .filter(_.startsWith("kp=")).map(_.stripPrefix("kp=").toInt)
    val recoveredSh =
      StagedSwap.recover(new java.io.File(dir), "purge").contains("shingles")
    val tombs = Tombstones.read(spark, dir, "corpus_id").persist()
    val touched =
      (spark.read.parquet(s"$dir/bands")
        .join(tombs, Seq("corpus_id"), "left_semi")
        .select("kp").distinct().collect().map(_.getInt(0)) ++
        recoveredKps).distinct
    touched.foreach { kp =>
      val leaf = new java.io.File(bandsBase, s"kp=$kp")
      val tmp = StagedSwap.stagingFor(bandsBase, "purge", s"kp=$kp")
      spark.read.parquet(leaf.getPath)
        .join(tombs, Seq("corpus_id"), "left_anti")
        .distinct() // converges a crash-recovered duplicate partition
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp.getPath)
      StagedSwap.swapIn(leaf, tmp)
    }
    // shingles decided on their OWN evidence, never the bands-derived
    // touched set: after a crash between the band and shingle rewrites
    // the replayed purge finds no touched band partition but the
    // retracted docs' shingles still need to go
    val shDir = new java.io.File(s"$dir/shingles")
    val needShingles = recoveredSh ||
      spark.read.parquet(shDir.getPath)
        .join(tombs, Seq("corpus_id"), "left_semi")
        .limit(1).count() > 0
    if (needShingles) {
      val tmp = StagedSwap.stagingFor(new java.io.File(dir), "purge", "shingles")
      spark.read.parquet(shDir.getPath)
        .join(tombs, Seq("corpus_id"), "left_anti")
        .dropDuplicates("corpus_id") // converges a crash-recovered duplicate dir
        .write.mode("overwrite").parquet(tmp.getPath)
      StagedSwap.swapIn(shDir, tmp)
    }
    tombs.unpersist(false)
    Tombstones.clear(dir)
    touched.length
  }

  /** Gate an arriving batch against the persisted index.
    * Output: (doc_id, keep, match_id, match_jaccard) — keep = 0 iff a
    * corpus near-dup with Jaccard ≥ `minJaccard` was found, match = the
    * (max jaccard, min corpus_id) witness; accepted rows carry NULLs.
    * The bands side is the LIVE view: tombstoned (retracted) corpus
    * docs are anti-joined out before candidate generation — with no
    * tombstones the anti-join is against an empty frame (free). */
  def gate(spark: SparkSession, dir: String, batch: DataFrame,
           minJaccard: Double = MinJaccard,
           maxBucket: Int = MaxBucket): DataFrame =
    gateFrames(spark,
      spark.read.parquet(s"$dir/bands")
        .join(Tombstones.read(spark, dir, "corpus_id"),
              Seq("corpus_id"), "left_anti"),
      spark.read.parquet(s"$dir/shingles"),
      batch, minJaccard, maxBucket)

  /** [[gate]] with the index passed as FRAMES — the seam the streaming
    * gate (st19 / EventStreams.neardupIngestGate) needs: its index side
    * is the seed scan UNIONED with the accepted-segment delta table, and
    * the kp filter applied here still prunes partitions of every member
    * scan of the union. `bands` carries (corpus_id, band, key, kp),
    * `shingles` (corpus_id, sh). */
  def gateFrames(spark: SparkSession, bands: DataFrame, shingles: DataFrame,
                 batch: DataFrame,
                 minJaccard: Double = MinJaccard,
                 maxBucket: Int = MaxBucket): DataFrame =
    verdicts(batch,
             scoredPairs(spark, bands, shingles, batch, minJaccard, maxBucket))

  /** Banded candidate pairs with their EXACT Jaccard — the stage
    * [[gateFrames]] folds into per-arrival verdicts, exposed for
    * pair-level consumers (the dm10 split-leakage audit reports every
    * leaking (eval, train) pair, not just each doc's best witness).
    * Returns (doc_id, corpus_id, j) for every banded candidate whose
    * exact Jaccard clears `minJaccard`; the refine is exact, so each
    * returned pair is a TRUE match regardless of what banding missed. */
  def scoredPairs(spark: SparkSession, bands: DataFrame, shingles: DataFrame,
                  batch: DataFrame,
                  minJaccard: Double = MinJaccard,
                  maxBucket: Int = MaxBucket): DataFrame = {
    val rows = bandRows(spark, batch)
      .persist() // two consumers (kp set + candidate join); tiny frame
    try {
      // kp partitions this batch actually probes — driver-side metadata
      // (≤ KeyParts ints); isin on the partition column prunes the
      // bands scan to those directories.
      val kps = rows
        .select(pmod(col("key"), lit(KeyParts.toLong)).cast("int").as("kp"))
        .distinct().collect().map(_.getInt(0)).toSeq
      val ib = bands.filter(col("kp").isin(kps: _*))
      // corpus rows in probed buckets; hot buckets capped BEFORE the
      // candidate join (map-side-combinable census over matched rows).
      val probed = ib.join(
        rows.select("band", "key").distinct(), Seq("band", "key"))
      val small = probed.groupBy("band", "key")
        .agg(count(lit(1)).as("__bn"))
        .filter(col("__bn") <= maxBucket)
        .select("band", "key")
      val cand = rows.select(col("doc_id"), col("band"), col("key"))
        .join(probed.join(small, Seq("band", "key")), Seq("band", "key"))
        .select(col("doc_id"), col("corpus_id")).distinct()
      // exact-Jaccard refine on candidates only; shingles of the few
      // candidate corpus docs come from the persisted set via equi-join.
      val shC = shingles.withColumnRenamed("sh", "sh_c")
      cand
        .join(rows.select(col("doc_id"), col("sh")).dropDuplicates("doc_id"),
              Seq("doc_id"))
        .join(shC, Seq("corpus_id"))
        .select(col("doc_id"), col("corpus_id"),
                round(Dedup.jaccard(col("sh"), col("sh_c")), 6).as("j"))
        .filter(col("j") >= minJaccard)
    } finally { rows.unpersist(false); () }
  }

  /** Exhaustive reference gate (no banding): candidates are every
    * (arrival, corpus) pair sharing at least one shingle — generated by
    * the shared-gram equi-join (never a cross join), then the same
    * exact-Jaccard refine. This is dd09x's fully-SQL-replayable form
    * and the ground truth dd09p/dd09r compare the banded gate against. */
  def exhaustiveGate(spark: SparkSession, corpus: DataFrame,
                     batch: DataFrame,
                     minJaccard: Double = MinJaccard): DataFrame = {
    // NB the two side materializations stay SEQUENTIAL: a ParActions
    // overlap was measured a regression here (dd09x 2.59 → 3.56 s warm
    // median, r18) — both passes are single-task at fixture scale and
    // the concurrent planning contends on session state for no overlap
    // gain; callers that want overlap get it one level up (dd09's
    // serve ∥ audit pair)
    val bsh = batch // batch-sized (an arriving micro-batch) — the eager
      // checkpoint is bounded state, fine to pin (VERDICT r17 #2)
      .select(col("doc_id"), Dedup.shingleHashes(spark, col("text"), 2).as("sh"))
      .localCheckpoint(true)
    val csh = corpus // CORPUS-wide — lineage stays intact (guide §5)
      .select(col("doc_id").as("corpus_id"),
              Dedup.shingleHashes(spark, col("text"), 2).as("sh_c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val inter = bsh.select(col("doc_id"), explode(col("sh")).as("g"))
      .join(csh.select(col("corpus_id"), explode(col("sh_c")).as("g")),
            Seq("g"))
      .groupBy("doc_id", "corpus_id").agg(count(lit(1)).as("__i"))
    val scored = inter
      .join(bsh.select(col("doc_id"), size(col("sh")).as("__na")), Seq("doc_id"))
      .join(csh.select(col("corpus_id"), size(col("sh_c")).as("__nb")),
            Seq("corpus_id"))
      .select(col("doc_id"), col("corpus_id"),
              round(col("__i") * lit(1.0) /
                    (col("__na") + col("__nb") - col("__i")), 6).as("j"))
      .filter(col("j") >= minJaccard)
    verdicts(batch, scored)
  }

  /** Fold scored (doc_id, corpus_id, j) matches into per-arrival
    * verdicts: one row per batch doc, reject iff any match, witness =
    * (max j, then min corpus_id) via a partial-aggregable struct max. */
  private def verdicts(batch: DataFrame, scored: DataFrame): DataFrame = {
    val best = scored
      .groupBy("doc_id")
      .agg(max(struct(col("j"), (-col("corpus_id")).as("__nid"))).as("__b"))
      .select(col("doc_id"), (-col("__b.__nid")).as("match_id"),
              col("__b.j").as("match_jaccard"))
    batch.select("doc_id")
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"),
              col("match_id").isNull.cast("int").as("keep"),
              col("match_id"), col("match_jaccard"))
      .orderBy("doc_id")
  }
}
