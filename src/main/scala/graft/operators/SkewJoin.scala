package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join splitting isn't available (e.g. the skew is in a
  * broadcast-ineligible dimension or a non-shuffle stage feeds the
  * join).
  *
  * The fact side gets a uniform random-ish salt derived from stable row
  * content (no `rand()`: deterministic retries matter at 100 TB); the
  * dimension side is exploded `saltFactor`× so every salted fact key
  * finds its match. Shuffle keys become (key, salt), spreading one hot
  * key over `saltFactor` reducers.
  */
object SkewJoin {

  /** Inner equi-join `facts ⋈ dims` on `key`, salted `saltFactor` ways.
    * `saltSource` seeds the fact-side salt (pick a high-cardinality
    * stable column, e.g. the fact PK). */
  def saltedJoin(facts: DataFrame, dims: DataFrame, key: String,
                 saltSource: Column, saltFactor: Int): DataFrame = {
    val saltedFacts = facts.withColumn("__salt",
      pmod(xxhash64(saltSource), lit(saltFactor)).cast("int"))
    val saltedDims = dims.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedFacts.join(saltedDims, Seq(key, "__salt")).drop("__salt")
  }
}
