package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.etl.ArtifactEtl
import graft.model.ArtifactSchemas

/** Property tests for the ETL invariants (SURVEY.md §5.3): explode+slice
  * never yields >5 children per id; truncate ⇒ length ≤ 500; cleanse ⇒
  * no NaN/inf survives. Plain-ScalaCheck sampling (only scalatest +
  * scalacheck are on the classpath, no scalatestplus bridge); fixed
  * seeds keep runs deterministic. */
class EtlPropertySpec extends SparkSpec {

  /** Draw `n` deterministic samples from `g` and assert on each. */
  private def forAllSampled[A](g: Gen[A], n: Int = 5)(body: A => Unit): Unit =
    (0 until n).foreach { i =>
      body(g.apply(Gen.Parameters.default, Seed(42L + i))
        .getOrElse(fail(s"generator failed at sample $i")))
    }

  private val colorGen: Gen[Row] = for {
    hue <- Gen.oneOf("Grey", "Brown", "Blue", null)
    pct <- Gen.chooseNum(-1.0, 2.0)
  } yield Row("#abc", hue, "#def", pct, "#123")

  private val recordGen: Gen[Row] = for {
    id <- Gen.chooseNum(1L, 50L)
    desc <- Gen.option(Gen.stringOfN(700, Gen.alphaChar))
    nColors <- Gen.chooseNum(0, 9)
    colors <- Gen.listOfN(nColors, colorGen)
    useNullColors <- Gen.oneOf(true, false)
  } yield Row(id, "t", "c", "p", "ce", "m", "d", desc.orNull, "dept", "cls",
              null, "am", 1L, 2L, 3L, 4L, 5L, 6L,
              if (useNullColors && nColors == 0) null else colors)

  test("T7 invariant: at most 5 color rows per object, regardless of input fanout") {
    forAllSampled(Gen.listOfN(12, recordGen)) { rows =>
      // pipeline order: PK-dedup the batch (K2) before the vertical
      // split — the generator may collide ids, like a real re-ingest.
      val raw = ArtifactEtl.dedupKeepFirst(
        spark.createDataFrame(
          spark.sparkContext.parallelize(rows), ArtifactSchemas.rawApiSchema),
        "id", col("id"))
      val maxFan = ArtifactEtl.toColors(raw)
        .groupBy("objectid").count().agg(max("count")).head()
      assert(maxFan.isNullAt(0) || maxFan.getLong(0) <= 5L)
    }
  }

  test("T5 invariant: description always ≤ 500 chars and never NULL") {
    forAllSampled(Gen.listOfN(12, recordGen)) { rows =>
      val raw = spark.createDataFrame(
        spark.sparkContext.parallelize(rows), ArtifactSchemas.rawApiSchema)
      val bad = ArtifactEtl.toMetadata(raw)
        .filter(col("description").isNull || length(col("description")) > 500)
      assert(bad.count() == 0)
    }
  }

  test("K3 invariant: no NaN or ±inf survives the cleanse") {
    val doubleGen = Gen.oneOf(
      Gen.chooseNum(-1e300, 1e300),
      Gen.const(Double.NaN),
      Gen.const(Double.PositiveInfinity),
      Gen.const(Double.NegativeInfinity))
    forAllSampled(Gen.listOfN(50, doubleGen)) { xs =>
      import spark.implicits._
      val cleaned = ArtifactEtl.cleanseDoubles(xs.toDF("v"))
      val bad = cleaned.filter(isnan(col("v")) ||
        col("v") === Double.PositiveInfinity || col("v") === Double.NegativeInfinity)
      assert(bad.count() == 0)
    }
  }
}
