package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.{CosineSim, MinHashSig, NearestCentroid, SimHash64}

/** SparkSessionExtensions entry point: makes the engine's native
  * functions available to ANY session (including pure-SQL users) via
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Injects `cosine_sim(array<float>, array<float>) → double` and
  * `minhash_sig(array<bigint>) → array<bigint>`. Sessions built without
  * the config can call the companions' `register(spark)` instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSim.fnName),
      CosineSim.info,
      exprs => CosineSim(exprs(0), exprs(1))))
    ext.injectFunction((
      FunctionIdentifier(MinHashSig.fnName),
      MinHashSig.info,
      exprs => MinHashSig(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(SimHash64.fnName),
      SimHash64.info,
      exprs => SimHash64(exprs.head)))
    ext.injectFunction((
      FunctionIdentifier(NearestCentroid.fnName),
      NearestCentroid.info,
      exprs => NearestCentroid(exprs(0), exprs(1))))
  }
}
