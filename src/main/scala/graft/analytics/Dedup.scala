package graft.analytics

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.queries.QueryDef

/** Deduplication operators for a training-data pipeline over the
  * `documents` / `embeddings` tables: exact (hash-groupBy), MinHash+LSH,
  * SimHash, n-gram Jaccard, and embedding-cosine near-dup.
  *
  * Scale design (the 100 TB path): every fuzzy variant is
  * candidate-generation-by-equi-join — shingle/band/chunk keys are
  * computed map-side with built-in higher-order functions, the only
  * shuffle is the equi-join on those compact keys, and exact similarity
  * is verified on the surviving candidate pairs only. No O(n²) stage
  * ever materializes (the brute-force cosine variant exists as the
  * correctness baseline; [[Similarity]] holds the LSH scale path).
  */
object Dedup {
  import QueryDef.table

  // --- shingling --------------------------------------------------------

  private def tokens(text: Column): Column =
    filter(split(lower(text), "\\s+"), t => length(t) > 0)

  /** Distinct xxhash64 hashes of word n-gram shingles; docs shorter than
    * `n` tokens fall back to a single whole-text shingle. */
  def shingleHashes(text: Column, n: Int): Column = {
    val ts = tokens(text)
    when(size(ts) >= n,
      array_distinct(transform(sequence(lit(0), size(ts) - n),
        i => xxhash64(array_join(slice(ts, i + 1, lit(n)), " ")))))
      .otherwise(array(xxhash64(lower(text))))
  }

  /** Exact Jaccard similarity of two pre-computed shingle-hash sets. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    inter * lit(1.0) / (size(a) + size(b) - inter)
  }

  // --- MinHash ----------------------------------------------------------

  /** numPerm universal-hash parameters, fixed seed — identical on every
    * executor, no broadcast needed. h_i(x) = (a_i·x32 + b_i) mod p with
    * p = 2^31-1 and x32 the 32-bit-masked shingle hash, so products stay
    * well inside a long. */
  private val MinhashP = 2147483647L // 2^31 - 1, Mersenne prime
  private val NumPerm = 48
  private val Bands = 12
  private val Rows = NumPerm / Bands // LSH threshold ≈ (1/b)^(1/r) ≈ 0.54
  private val (permA, permB) = {
    val rnd = new scala.util.Random(42)
    (Array.fill(NumPerm)(1L + rnd.nextInt(Int.MaxValue - 1)),
     Array.fill(NumPerm)(rnd.nextInt(Int.MaxValue).toLong))
  }

  /** MinHash signature (array of NumPerm longs) from shingle hashes. */
  def minhashSignature(shingles: Column): Column = {
    val aLit = array(permA.map(lit): _*)
    val bLit = array(permB.map(lit): _*)
    val masked = transform(shingles, h => h.bitwiseAND(lit(0xFFFFFFFFL)))
    transform(sequence(lit(0), lit(NumPerm - 1)), i =>
      array_min(transform(masked, x =>
        pmod(element_at(aLit, i + 1) * x + element_at(bLit, i + 1), lit(MinhashP)))))
  }

  /** LSH band keys: one xxhash64 per `Bands` contiguous signature slice;
    * docs sharing ANY band key become candidate pairs. */
  def bandKeys(sig: Column): Column =
    transform(sequence(lit(0), lit(Bands - 1)), b =>
      xxhash64(b, slice(sig, b * Rows + 1, lit(Rows))))

  /** Full MinHash+LSH near-dup pipeline: shingle → sign → band →
    * equi-join on (band, key) → exact-Jaccard verify ≥ minJaccard. */
  def minhashPairs(docs: DataFrame, shingleN: Int, minJaccard: Double): DataFrame = {
    val prepared = docs
      .select(col("doc_id"), shingleHashes(col("text"), shingleN).as("sh"))
      .withColumn("sig", minhashSignature(col("sh")))
      .select(col("doc_id"), col("sh"), posexplode(bandKeys(col("sig"))).as(Seq("band", "key")))
    val a = prepared.select(col("doc_id").as("id_a"), col("sh").as("sh_a"),
                            col("band"), col("key"))
    val b = prepared.select(col("doc_id").as("id_b"), col("sh").as("sh_b"),
                            col("band"), col("key"))
    a.join(b, Seq("band", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "sh_a", "sh_b").distinct()
      .select(col("id_a"), col("id_b"),
              round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  // --- SimHash ----------------------------------------------------------

  /** 64-bit SimHash over whitespace tokens: per-token xxhash64, signed
    * bit-vote accumulation, sign → bit. Pure SQL higher-order folds —
    * map-side only.
    *
    * The fingerprint is a 64-char '0'/'1' string: it chunk-blocks with
    * plain substring and keeps every HOF single-level. Escaping note:
    * this is a triple-quoted Scala string, so `'\\s+'` already reaches
    * the SQL parser as `\\s+` and the regex as `\s+` — do NOT "fix" it
    * to four backslashes (that splits on a literal backslash and turns
    * each doc into one giant token, which silently randomizes every
    * fingerprint). */
  val simhashVotesExpr: String =
    """aggregate(
      |  transform(filter(split(lower(text), '\\s+'), tk -> length(tk) > 0),
      |            tok -> xxhash64(tok)),
      |  transform(sequence(0, 63), z -> 0L),
      |  (acc, h) -> zip_with(acc,
      |     transform(sequence(0, 63), i -> IF(((h >> i) & 1) = 1, 1L, -1L)),
      |     (va, vb) -> va + vb))""".stripMargin

  /** doc_id + 64-char `bits` fingerprint column. */
  def simhashFingerprints(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", s"$simhashVotesExpr AS votes")
      .selectExpr("doc_id",
        "array_join(transform(votes, vt -> IF(vt > 0, '1', '0')), '') AS bits")

  /** SimHash near-dup pairs: block on 8×8-bit fingerprint chunks — by
    * pigeonhole any pair within Hamming distance 7 shares at least one
    * unchanged chunk — then verify with bit_count(xor) ≤ maxHamming.
    * Guaranteed recall for maxHamming ≤ 7; probabilistic above. */
  def simhashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int): DataFrame = {
    // bits string → packed long via conv() on two 32-bit halves: plain
    // codegen'd scalar functions (no nested HOF folds), so candidate
    // verification is a single bit_count(xor) per pair.
    val fp = simhashFingerprints(docs)
      .selectExpr("doc_id",
        """shiftleft(cast(conv(substring(bits,  1, 32), 2, 10) AS BIGINT), 32)
          | | cast(conv(substring(bits, 33, 32), 2, 10) AS BIGINT) AS fp""".stripMargin)
      .selectExpr("doc_id", "fp",
        "posexplode(transform(sequence(0, 7), c -> (fp >> (c * 8)) & 255))")
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "key")
    val a = fp.select(col("doc_id").as("id_a"), col("fp").as("fp_a"),
                      col("chunk"), col("key"))
    val b = fp.select(col("doc_id").as("id_b"), col("fp").as("fp_b"),
                      col("chunk"), col("key"))
    a.join(b, Seq("chunk", "key"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "fp_a", "fp_b").distinct()
      .select(col("id_a"), col("id_b"),
              bit_count(col("fp_a").bitwiseXOR(col("fp_b"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  // --- query surface ----------------------------------------------------

  def all: Seq[QueryDef] = Seq(
    // exact dedup: hash-groupBy on the canonical fingerprint; keeper is
    // the smallest doc_id (deterministic INSERT-IGNORE semantics).
    QueryDef(
      "dd01_exact_dedup",
      (s, d) =>
        table(s, d, "documents")
          .groupBy(TextAnalysis.fingerprint(col("text")).as("content_hash"))
          .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))
          .orderBy("keeper_id"),
      Some("""SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash,
             |  min(doc_id) AS keeper_id, COUNT(*) AS n_copies
             |FROM documents
             |GROUP BY content_hash ORDER BY keeper_id""".stripMargin)
    ),

    // MinHash+LSH near-dup candidates, Jaccard-verified. Engine-specific
    // hashing → no SQL oracle (rows-only check).
    QueryDef(
      "dd02_minhash_lsh",
      (s, d) =>
        minhashPairs(table(s, d, "documents"), shingleN = 3, minJaccard = 0.3)
          .orderBy("id_a", "id_b"),
      None
    ),

    // SimHash near-dup pairs (Hamming ≤ 7 on 64-bit fingerprints —
    // within the chunk-blocking recall guarantee).
    QueryDef(
      "dd03_simhash",
      (s, d) =>
        simhashPairs(s, table(s, d, "documents"), maxHamming = 7)
          .orderBy("id_a", "id_b"),
      None
    ),

    // n-gram Jaccard with exact verification. The candidate join blocks
    // on shared 2-gram shingle hash, so only docs sharing at least one
    // bigram are compared — oracle replays the same pairs in DuckDB via
    // its list functions.
    //
    // Bounded to a deterministic 500-doc slice: exact all-pairs Jaccard
    // is quadratic by nature, and this synthetic corpus draws from a
    // ~30-word vocabulary, so EVERY doc pair shares bigrams and no
    // exact blocking scheme (including rarest-first prefix filtering)
    // can prune it below O(n²). The operator stays fully exact on its
    // slice and anchors the MinHash path (dd02), which is the
    // sub-quadratic full-corpus variant.
    QueryDef(
      "dd04_ngram_jaccard",
      (s, d) => {
        val docs = table(s, d, "documents")
          .filter(col("doc_id") < 500)
          .select(col("doc_id"), shingleHashes(col("text"), 2).as("sh"))
        val exploded = docs.select(col("doc_id"), col("sh"), explode(col("sh")).as("g"))
        val a = exploded.select(col("doc_id").as("id_a"), col("sh").as("sh_a"), col("g"))
        val b = exploded.select(col("doc_id").as("id_b"), col("sh").as("sh_b"), col("g"))
        a.join(b, Seq("g")).filter(col("id_a") < col("id_b"))
          .select("id_a", "id_b", "sh_a", "sh_b").distinct()
          .select(col("id_a"), col("id_b"),
                  round(jaccard(col("sh_a"), col("sh_b")), 6).as("jaccard"))
          .filter(col("jaccard") >= 0.3)
          .orderBy("id_a", "id_b")
      },
      Some("""WITH t AS (
             |  SELECT doc_id, list_distinct(list_transform(
             |    range(len(string_split_regex(lower(text), '\s+')) - 1),
             |    i -> string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
             |         string_split_regex(lower(text), '\s+')[i+2])) AS ngrams
             |  FROM documents WHERE doc_id < 500)
             |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             |  round(len(list_intersect(a.ngrams, b.ngrams)) * 1.0 /
             |    (len(a.ngrams) + len(b.ngrams) - len(list_intersect(a.ngrams, b.ngrams))), 6) AS jaccard
             |FROM t a JOIN t b ON a.doc_id < b.doc_id
             |WHERE round(len(list_intersect(a.ngrams, b.ngrams)) * 1.0 /
             |      (len(a.ngrams) + len(b.ngrams) - len(list_intersect(a.ngrams, b.ngrams))), 6) >= 0.3
             |ORDER BY id_a, id_b""".stripMargin)
    ),

    // embedding-cosine near-dup, brute-force baseline (correctness
    // anchor for the LSH scale path in Similarity).
    QueryDef(
      "dd05_embedding_neardup",
      (s, d) => {
        // Bounded to a deterministic 1000-vector slice: the brute-force
        // all-pairs form is the CORRECTNESS anchor for the LSH scale
        // path (ss02/dd02), and quadratic by construction — unbounded
        // it was 118 s of the sf0.1 bench by itself. Per-pair math is
        // the codegen'd native cosine (bit-identical to the HOF form).
        val e = table(s, d, "embeddings").filter(col("vec_id") < 1000)
        val a = e.select(col("vec_id").as("id_a"), col("embedding").as("va"))
        val b = e.select(col("vec_id").as("id_b"), col("embedding").as("vb"))
        a.join(b, col("id_a") < col("id_b"))
          .select(col("id_a"), col("id_b"),
                  round(VectorOps.cosineNative(s, col("va"), col("vb")), 6)
                    .as("cos_sim"))
          .filter(col("cos_sim") >= 0.35)
          .orderBy("id_a", "id_b")
      },
      Some("""SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
             |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) AS cos_sim
             |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
             |WHERE b.vec_id < 1000
             |  AND round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
             |          p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
             |    / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
             |     * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))), 6) >= 0.35
             |ORDER BY id_a, id_b""".stripMargin)
    )
  )
}
