package graft.analytics

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.queries.QueryDef

/** Approximate-nearest-neighbor search over the `embeddings` table's
  * `array<float>` column.
  *
  *  - Brute-force cosine top-k is the correctness baseline: one
  *    broadcast of the query vector, a map-side cosine per row, and a
  *    TakeOrderedAndProject top-k — no shuffle of the corpus at all, so
  *    even this "naive" plan scans 100 TB in one pass.
  *  - The LSH-bucketed variant is the scale path: random-hyperplane
  *    signs bucket the corpus (computed map-side, deterministic on every
  *    executor); probing compares only the query's bucket — the
  *    per-query cost drops from |corpus| to |bucket|. An IVF layout is
  *    the same plan with learned centroids as bucket keys.
  */
object Similarity {
  import QueryDef.table

  /** Brute-force cosine top-k against the vector with id `queryId`:
    * broadcast of one query row, codegen'd per-row cosine, top-k via
    * TakeOrderedAndProject — a single scan, no shuffle of the corpus. */
  def bruteForceTopK(emb: DataFrame, queryId: Long, k: Int): DataFrame = {
    val spark = emb.sparkSession
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
              round(VectorOps.cosineNative(spark, col("embedding"), col("qvec")), 6)
                .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  /** LSH-bucketed ANN: both corpus and query are bucketed by
    * random-hyperplane sign bits; only the query's bucket is scanned.
    * Returns the approximate top-k (exact within the probed bucket). */
  def lshTopK(emb: DataFrame, queryId: Long, k: Int, nBits: Int): DataFrame = {
    val bucketed = emb
      .withColumn("bucket", VectorOps.simhashBucket(col("embedding"), nBits))
    val spark = emb.sparkSession
    val q = bucketed.filter(col("vec_id") === queryId)
      .select(col("bucket").as("qbucket"), col("embedding").as("qvec"))
    bucketed.filter(col("vec_id") =!= queryId)
      .join(broadcast(q), col("bucket") === col("qbucket"))
      .select(col("vec_id"),
              round(VectorOps.cosineNative(spark, col("embedding"), col("qvec")), 6)
                .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  /** IVF (inverted-file) ANN: MLlib KMeans learns `nLists` centroids
    * (the "coarse quantizer"), every vector is assigned to its nearest
    * centroid's list, and a query probes only the `nProbe` nearest
    * lists with exact cosine inside them. With nProbe = nLists this
    * degenerates to exact brute force (the property `DedupSpec` pins).
    *
    * Scale shape: training aggregates sketch-sized state; assignment is
    * a map-side transform; the probe filter prunes (nLists−nProbe)/
    * nLists of the corpus before any pairwise math — same plan as the
    * LSH variant with learned instead of random buckets. Centroid
    * selection happens driver-side over nLists rows (index metadata,
    * not data). */
  def ivfTopK(emb: DataFrame, queryId: Long, k: Int,
              nLists: Int, nProbe: Int): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.{Vector, Vectors}
    val spark = emb.sparkSession
    val withVec = emb.withColumn("features", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nLists).setSeed(42L)
      .setFeaturesCol("features").fit(withVec)
    val assigned = model.transform(withVec)
    val qVec = assigned.filter(col("vec_id") === queryId)
      .select("features").head().getAs[Vector]("features")
    val probes = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, Vectors.sqdist(c, qVec)) }
      .sortBy(_._2).take(nProbe).map(_._1).toSeq
    val q = assigned.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"))
    assigned
      .filter(col("prediction").isin(probes: _*) && col("vec_id") =!= queryId)
      .crossJoin(broadcast(q))
      .select(col("vec_id"),
              round(VectorOps.cosineNative(spark, col("embedding"), col("qvec")), 6)
                .as("cos_sim"))
      .orderBy(desc("cos_sim"), asc("vec_id"))
      .limit(k)
  }

  private val cosSql =
    """list_sum(list_transform(list_zip(e.embedding, q.qvec),
      |        p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))
      |  / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(q.qvec, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  def all: Seq[QueryDef] = Seq(
    QueryDef(
      "ss01_cosine_topk",
      (s, d) => bruteForceTopK(table(s, d, "embeddings"), queryId = 0L, k = 10),
      Some(s"""WITH q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 0)
              |SELECT e.vec_id, round($cosSql, 6) AS cos_sim
              |FROM embeddings e, q WHERE e.vec_id <> 0
              |ORDER BY cos_sim DESC, vec_id LIMIT 10""".stripMargin)
    ),
    QueryDef(
      "ss02_ann_lsh",
      // approximate by construction — no SQL oracle (rows-only check);
      // dd05/ss01 anchor the exact-cosine math this variant approximates.
      (s, d) => lshTopK(table(s, d, "embeddings"), queryId = 0L, k = 10, nBits = 4),
      None
    ),
    QueryDef(
      "ss03_ann_ivf",
      // learned-bucket variant; approximate for nProbe < nLists.
      (s, d) => ivfTopK(table(s, d, "embeddings"), queryId = 0L, k = 10,
                        nLists = 16, nProbe = 4),
      None
    )
  )
}
