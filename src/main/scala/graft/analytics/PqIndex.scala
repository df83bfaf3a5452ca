package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (PQ) over the `embeddings` table — the
  * compressed-vector ANN primitive (SURVEY §8 round-3/4 candidate:
  * "PQ residuals on the IVF lists").
  *
  * Build (offline): the D-dim space splits into `SubSpaces` contiguous
  * subvectors; each subspace learns its own `CodebookSize`-centroid
  * codebook with the SAME deterministic machinery as [[IvfIndex.fit]]
  * (hashed-id seed sample + Lloyd, centroids rounded to 6 dp — so
  * codebooks never depend on partitioning). A vector encodes to
  * `SubSpaces` small codes: 64 floats (256 bytes) become 8 bytes — the
  * 32× compression that lets a 100 TB corpus's vectors live in memory.
  *
  * Query (ADC — asymmetric distance computation): the query stays
  * uncompressed; a (SubSpaces × CodebookSize) lookup table of
  * query-subvector → centroid distances is computed DRIVER-side (index
  * metadata, not data) and inlined as a literal, so the scan-side work
  * per vector is `SubSpaces` array lookups + a sum — all codegen'd
  * built-in HOFs, map-only, top-k via TakeOrderedAndProject. No shuffle
  * of the corpus, nothing trained at query time.
  *
  * Approximate by construction (quantization error), so the driver
  * entry is rows-only; `DedupSpec` pins the exact invariants: codebook
  * determinism, the ADC identity (table-lookup distance ≡ distance to
  * the reconstructed vector), and a recall floor against brute force.
  */
object PqIndex {

  // standard PQ8x8: 8 subspaces × 8-bit codebooks — each 64-float
  // (256-byte) vector compresses to 8 one-byte codes. Smaller codebooks
  // (e.g. 16) measurably collapse top-10 recall on this corpus: the
  // synthetic embeddings are near-random, so pairwise distances
  // concentrate and quantization error above ~the neighbor-gap scale
  // destroys the ordering — the standard 256-centroid codebook keeps
  // per-subspace distortion below it.
  val SubSpaces = 8
  val CodebookSize = 256

  /** Per-subspace codebooks: `SubSpaces` × `CodebookSize` × dSub
    * doubles, learned JOINTLY — one corpus pass per Lloyd iteration for
    * ALL subspaces (a per-subspace loop would scan the training sample
    * `SubSpaces`× per iteration; at a 10× probe that tripled the build
    * into the minute range). Deterministic like [[IvfIndex.fit]]: the
    * seed rows are the hashed-id spread sample (value-independent
    * ordering, so slicing them per subspace equals seeding each
    * subspace independently), Lloyd statistics are partial-aggregated
    * map-side, and centroids round to 6 dp at the end. */
  def fitCodebooks(emb: DataFrame, subSpaces: Int = SubSpaces,
                   codebookSize: Int = CodebookSize,
                   lloydIters: Int = 2): Seq[Seq[Array[Double]]] = {
    val spark = emb.sparkSession
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    require(dim % subSpaces == 0, s"dim $dim not divisible by $subSpaces")
    val dSub = dim / subSpaces
    val seedRows = emb.select(col("vec_id"), col("embedding"))
      .orderBy(xxhash64(col("vec_id")), col("vec_id"))
      .limit(codebookSize).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    var cbs: Seq[Seq[Array[Double]]] = (0 until subSpaces).map(m =>
      seedRows.map(v => v.slice(m * dSub, (m + 1) * dSub)).toSeq)
    val n = emb.count()
    val trainSet =
      if (n <= IvfIndex.FitSampleCap) emb
      else emb.filter(
        pmod(xxhash64(col("vec_id")), lit(n / IvfIndex.FitSampleCap + 1)) === 0)
    for (_ <- 1 to lloydIters) {
      // one aggregate for every (subspace, code, position) mean: codes
      // for all subspaces are computed map-side in a single projection,
      // the vector explodes once, and pos//dSub recovers the subspace
      val means = trainSet
        .withColumn("__codes", encodeExpr(spark, col("embedding"), cbs))
        .select(col("__codes"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .withColumn("m", (col("pos") / dSub).cast("int"))
        .groupBy(col("m"),
                 element_at(col("__codes"), col("m") + 1).as("code"),
                 pmod(col("pos"), lit(dSub)).cast("int").as("p"))
        .agg(avg(col("x").cast("double")).as("mean"))
        .collect()
        .groupBy(r => (r.getInt(0), r.getInt(1)))
        .map { case (k, rows) =>
          k -> rows.sortBy(_.getInt(2)).map(_.getDouble(3)).toArray
        }
      // round EVERY iteration's centroids, not just the final ones:
      // avg() means are float-summation-order dependent (last-ulp
      // differences across partitionings), and an unrounded mean fed to
      // the next iteration's argmin can flip a near-tied code — which
      // shifts that cell's mean and breaks build determinism
      cbs = cbs.zipWithIndex.map { case (cb, m) =>
        cb.zipWithIndex.map { case (c, j) =>
          means.getOrElse((m, j), c) // empty code cell: keep old centroid
            .map(IvfIndex.round6)
        }
      }
    }
    cbs
  }

  /** Code-array expression over any `array<float>` vector column: one
    * nearest-centroid argmin per subspace — the same native expression
    * the IVF assignment uses, over sliced subvectors. */
  def encodeExpr(spark: org.apache.spark.sql.SparkSession, vec: Column,
                 codebooks: Seq[Seq[Array[Double]]]): Column = {
    val dSub = codebooks.head.head.length
    array(codebooks.zipWithIndex.map { case (cb, m) =>
      IvfIndex.nearestList(spark, slice(vec, m * dSub + 1, dSub), cb)
    }: _*)
  }

  /** Map-side PQ encoding of the `embedding` column into a `codes`
    * column. */
  def encode(emb: DataFrame, codebooks: Seq[Seq[Array[Double]]]): DataFrame =
    emb.withColumn("codes",
      encodeExpr(emb.sparkSession, col("embedding"), codebooks))

  /** ADC distance column: sum over subspaces of the precomputed
    * query-to-centroid table entry selected by each code. `table` is
    * driver-side metadata (SubSpaces × CodebookSize doubles) inlined as
    * a literal — per-row work is 8 array lookups and a sum. */
  def adcDistance(codes: Column, table: Seq[Array[Double]]): Column = {
    val tLit = array(table.map(t => array(t.map(lit): _*)): _*)
    aggregate(
      zip_with(sequence(lit(0), lit(table.size - 1)), codes,
        (m, c) => element_at(element_at(tLit, m + 1), c + 1)),
      lit(0.0), (acc, d) => acc + d)
  }

  /** The driver-side ADC lookup table for one query vector. */
  def adcTable(qvec: Array[Double],
               codebooks: Seq[Seq[Array[Double]]]): Seq[Array[Double]] = {
    val dSub = codebooks.head.head.length
    codebooks.zipWithIndex.map { case (cb, m) =>
      val q = qvec.slice(m * dSub, (m + 1) * dSub)
      cb.map(c => c.zip(q).map { case (ci, qi) =>
        (ci - qi) * (ci - qi) }.sum).toArray
    }
  }

  /** PQ ANN top-k for the vector with id `queryId`: encode once
    * (in production the codes are persisted next to the ids), then one
    * map-only ADC scan + TakeOrderedAndProject. */
  def pqTopK(emb: DataFrame, codebooks: Seq[Seq[Array[Double]]],
             queryId: Long, k: Int): DataFrame = {
    val qvec = Similarity.cachedQueryVec(emb, queryId).map(_.toDouble)
    val table = adcTable(qvec, codebooks)
    encode(emb, codebooks)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"),
              round(adcDistance(col("codes"), table), 6).as("adc_dist"))
      .orderBy(asc("adc_dist"), asc("vec_id"))
      .limit(k)
  }

  /** Exact L2 re-rank of a shortlist: broadcast the shortlist ids back
    * onto the full vectors, order by rounded exact distance with the
    * canonical vec_id tie-break. SHARED by every ANN serving path
    * (ss05/ss06 single-query; the batch path inlines the same metric
    * with per-query windows) so metric, rounding, and tie-break can
    * never diverge between an operator and the anchor that pins it. */
  def rerankExact(emb: DataFrame, shortlistIds: DataFrame,
                  qvec: Array[Double], k: Int): DataFrame = {
    val qLit = array(qvec.map(lit): _*)
    emb.join(broadcast(shortlistIds), Seq("vec_id"))
      .select(col("vec_id"),
              round(IvfIndex.sqDistCol(col("embedding"), qLit), 6).as("l2_dist"))
      .orderBy(asc("l2_dist"), asc("vec_id"))
      .limit(k)
  }

  /** PQ ANN with exact re-ranking — the standard serving pattern: the
    * map-only ADC scan over compressed codes prunes the corpus to a
    * `shortlist` (cheap — 8 table lookups per vector), then ONLY the
    * shortlist's full vectors are fetched and re-ranked by exact
    * distance. At 100 TB the codes fit in memory while the full vectors
    * stay on disk; the re-rank touches `shortlist` rows, not the corpus.
    * Recall is governed by shortlist/k (quantization error must only
    * keep a true neighbor inside the shortlist, not rank it exactly). */
  def pqTopKRefined(emb: DataFrame, codebooks: Seq[Seq[Array[Double]]],
                    queryId: Long, k: Int, shortlistFactor: Int = 8): DataFrame = {
    val spark = emb.sparkSession
    val qvec = Similarity.cachedQueryVec(emb, queryId).map(_.toDouble)
    val table = adcTable(qvec, codebooks)
    val shortlist = encode(emb, codebooks)
      .filter(col("vec_id") =!= queryId)
      .select(col("vec_id"), adcDistance(col("codes"), table).as("adc"))
      .orderBy(asc("adc"), asc("vec_id"))
      .limit(k * shortlistFactor)
      .select("vec_id")
    rerankExact(emb, shortlist, qvec, k)
  }

  /** Reconstruction of a coded vector (concatenated chosen centroids) —
    * test-side reference for the ADC identity: the table-lookup distance
    * must equal the distance from the query to this reconstruction. */
  def reconstruct(codes: Seq[Int],
                  codebooks: Seq[Seq[Array[Double]]]): Array[Double] =
    codes.zipWithIndex.flatMap { case (c, m) => codebooks(m)(c) }.toArray
}
