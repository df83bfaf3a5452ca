package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's ETL operators (SURVEY.md §2.2-2.3, reference
  * `harvard_artifacts_app.py:157-278`) as verifiable queries over the
  * driver test tables. The artifact-schema versions of the same operators
  * live in [[graft.etl.ArtifactEtl]]; these entries prove the operator
  * semantics against the DuckDB oracle.
  */
object EtlOps {
  import QueryDef.table

  def all: Seq[QueryDef] = Seq(
    // ---- T1 project + rename (`:167-180`) -----------------------------
    QueryDef(
      "t1_project_rename",
      (s, d) =>
        table(s, d, "orders")
          .select(col("o_orderkey").as("id"),
                  col("o_orderpriority").as("priority"),
                  col("o_totalprice").as("total"))
          .orderBy("id"),
      Some("""SELECT o_orderkey AS id, o_orderpriority AS priority,
             |       o_totalprice AS total
             |FROM orders ORDER BY id""".stripMargin)
    ),

    // ---- T2/T3 default-fill strings + ints (`:169-189`) ---------------
    QueryDef(
      "t2_t3_default_fill",
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"),
                  coalesce(col("lang"), lit("")).as("lang_filled"),
                  coalesce(col("n_chars"), lit(0L)).as("nchars_filled"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, coalesce(lang, '') AS lang_filled,
             |       coalesce(n_chars, 0) AS nchars_filled
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // ---- T5 string truncate (`:175` — description[:500]) --------------
    QueryDef(
      "t5_truncate",
      (s, d) =>
        table(s, d, "documents")
          .select(col("doc_id"),
                  substring(coalesce(col("text"), lit("")), 1, 120).as("snippet"))
          .orderBy("doc_id"),
      Some("""SELECT doc_id, substring(coalesce(text, ''), 1, 120) AS snippet
             |FROM documents ORDER BY doc_id""".stripMargin)
    ),

    // ---- T7 array slice + unnest (`:197-206` — colors[:5] flatten) ----
    // posexplode(slice(...)) ≙ the reference's `for color in colors[:5]`;
    // plain explode (not _outer) matches "no colors ⇒ no child rows".
    QueryDef(
      "t7_explode_slice",
      (s, d) =>
        table(s, d, "embeddings")
          .select(col("vec_id"), posexplode(slice(col("embedding"), 1, 5)))
          .select(col("vec_id"), col("pos").cast("long").as("pos"),
                  col("col").cast("double").as("val"))
          .orderBy("vec_id", "pos"),
      Some("""SELECT vec_id, i AS pos, CAST(embedding[i + 1] AS DOUBLE) AS val
             |FROM embeddings, (SELECT unnest(range(5)) AS i) idx
             |WHERE i < least(5, len(embedding))
             |ORDER BY vec_id, pos""".stripMargin)
    ),

    // ---- K2 upsert-ignore / deterministic keep-first dedup ------------
    // MySQL INSERT IGNORE keeps the first-arriving PK row
    // (`:239-272`); the deterministic Spark equivalent is a window rank
    // over an explicit arrival order (SURVEY.md §7.5.4).
    QueryDef(
      "k2_dedup_keepfirst",
      // The synthetic lineitem has duplicate (l_orderkey, l_linenumber)
      // pairs, so the arrival order ranks over the full candidate key —
      // exactly the determinism pitfall SURVEY.md §7.5.4 warns about.
      (s, d) => {
        val w = Window.partitionBy("l_orderkey")
          .orderBy("l_linenumber", "l_partkey", "l_suppkey", "l_quantity")
        table(s, d, "lineitem")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
          .orderBy("l_orderkey")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_partkey, l_quantity FROM (
             |  SELECT *, row_number() OVER (
             |    PARTITION BY l_orderkey
             |    ORDER BY l_linenumber, l_partkey, l_suppkey, l_quantity) AS rn
             |  FROM lineitem) t
             |WHERE rn = 1 ORDER BY l_orderkey""".stripMargin)
    ),

    // ---- K3 NaN/±inf → NULL normalization (`:226-233`) ----------------
    QueryDef(
      "k3_nan_cleanse",
      (s, d) =>
        table(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_linenumber"),
                  when(isnan(col("l_quantity")) ||
                       col("l_quantity") === Double.PositiveInfinity ||
                       col("l_quantity") === Double.NegativeInfinity, lit(null))
                    .otherwise(col("l_quantity")).as("qty_clean"))
          .orderBy("l_orderkey", "l_linenumber"),
      Some("""SELECT l_orderkey, l_linenumber,
             |  CASE WHEN isnan(l_quantity) OR isinf(l_quantity) THEN NULL
             |       ELSE l_quantity END AS qty_clean
             |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin)
    )
  )
}
