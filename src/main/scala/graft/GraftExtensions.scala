package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{GraftFunctions, SimplifyGraftHamming, ThresholdLevenshtein}

/** Canonical extension wiring: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the graft SQL functions and optimizer rules available in every
  * session of the cluster (SURVEY §7.2's extension point). The same
  * functions can be added to an existing session with
  * `GraftFunctions.register(spark)`; both paths iterate the one
  * `GraftFunctions.builders` list so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft.functions.GraftFunctions", name),
        builder))
    }
    ext.injectOptimizerRule(_ => SimplifyGraftHamming)
    ext.injectOptimizerRule(_ => ThresholdLevenshtein)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}
