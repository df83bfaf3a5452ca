package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic mixture-of-centroids embedding fixture — the
  * STRUCTURED counterpart to ScaleProbe's hash-noise replicas.
  *
  * The driver fixture's embeddings are uniform per-dim hash noise: the
  * adversarial case for every geometric pruning strategy (all pairwise
  * cosines concentrate at 0 ± 1/√dim, so no bucketing separates
  * anything — the measured reason r12 rejected banding for the
  * production decon gate). Real embedding corpora are the opposite:
  * points concentrate on a bounded number of semantic clusters, and
  * near-duplicate / contaminated pairs are NEAR (cosine ≳ 0.95), not
  * borderline. This generator produces that regime deterministically,
  * with no driver-side random state and no broadcast weight matrix:
  *
  *  - `nClusters` centroids, each dim value uniform in [-1, 1] derived
  *    from `xxhash64("c:" ++ cluster ++ ":" ++ dim)`;
  *  - each vector = its cluster's centroid + `sigma` × per-(vec, dim)
  *    hash noise. Expected same-cluster cosine = 1/(1 + sigma²)
  *    (≈ 0.978 at the 0.15 default); cross-cluster cosines stay at
  *    0 ± 1/√dim like the noise fixture;
  *  - cluster assignment and the bench flag are independent id hashes,
  *    so a 1-in-`benchOdds` bench sample (`label` 0) lands in ~bench/
  *    nClusters of the clusters — corpus rows in THOSE clusters are the
  *    genuinely contaminated stratum, everything else is clean. With
  *    nClusters ≫ bench size most of the corpus is clean, the realistic
  *    decon selectivity regime.
  *
  * Schema matches the driver's `embeddings` table (vec_id BIGINT,
  * embedding ARRAY<FLOAT>, label INT) so every decon/ANN operator runs
  * on it unchanged. Used by [[graft.DeconCrossover]] to measure the
  * banded-vs-exact crossover on structured data (FIXTURES.md §D).
  */
object ClusteredEmbeddings {

  /** uniform [-1, 1] from a seed column, the ScaleProbe hash-noise
    * quantization: (xxhash64(seed) mod 2001 - 1000) / 1000. */
  private def u(seed: org.apache.spark.sql.Column) =
    (pmod(xxhash64(seed), lit(2001)) - lit(1000)) / lit(1000.0)

  def generate(spark: SparkSession, nVecs: Long, dim: Int = 64,
               nClusters: Int = 20000, sigma: Double = 0.15,
               benchOdds: Int = 400): DataFrame = {
    require(nVecs > 0 && dim > 0 && nClusters > 0 && benchOdds > 1)
    val cluster = pmod(xxhash64(concat(lit("cl:"), col("vec_id"))),
                       lit(nClusters.toLong))
    spark.range(nVecs).toDF("vec_id")
      .withColumn("__cluster", cluster)
      .withColumn("embedding",
        transform(sequence(lit(0), lit(dim - 1)), i =>
          (u(concat(lit("c:"), col("__cluster"), lit(":"), i)) +
           lit(sigma) * u(concat(lit("n:"), col("vec_id"), lit(":"), i)))
            .cast("float")))
      .withColumn("label",
        when(pmod(xxhash64(concat(lit("b:"), col("vec_id"))),
                  lit(benchOdds.toLong)) === 0, lit(0))
          .otherwise((pmod(col("__cluster"), lit(9)) + 1).cast("int")))
      .select(col("vec_id"), col("embedding"), col("label").cast("int"))
  }

  /** The contamination ground truth for a generated corpus: corpus
    * (label ≠ 0) vec_ids sharing a CLUSTER with ≥ 1 bench (label 0)
    * vector — by construction these are the rows whose max bench cosine
    * sits at the 1/(1+sigma²) stratum; everything else is cross-cluster
    * noise. Derived from the same id hash, no stored state. */
  def contaminatedIds(emb: DataFrame, nClusters: Int = 20000): DataFrame = {
    val withCluster = emb.withColumn("__cluster",
      pmod(xxhash64(concat(lit("cl:"), col("vec_id"))), lit(nClusters.toLong)))
    val benchClusters = withCluster.filter(col("label") === 0)
      .select("__cluster").distinct()
    withCluster.filter(col("label") =!= 0)
      .join(benchClusters, Seq("__cluster"), "left_semi")
      .select("vec_id")
  }
}
