package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier

import graft.functions.CosineSim

/** SparkSessionExtensions entry point: makes the engine's native
  * functions available to ANY session (including pure-SQL users) via
  *
  * {{{
  *   spark.sql.extensions=graft.GraftExtensions
  * }}}
  *
  * Currently injects `cosine_sim(array<float>, array<float>) → double`
  * (see [[graft.functions.CosineSim]]). Sessions built without the
  * config can call `CosineSim.register(spark)` instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier(CosineSim.fnName),
      CosineSim.info,
      exprs => CosineSim(exprs(0), exprs(1))))
  }
}
