package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{GraftFunctions, HammingDistance}

/** Canonical extension wiring: `--conf spark.sql.extensions=graft.GraftExtensions`
  * makes the graft SQL functions available in every session of the cluster
  * (SURVEY §7.2's extension point). The same functions can be added to an
  * existing session with `GraftFunctions.register(spark)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_clean_nb"),
      new ExpressionInfo("graft.functions.GraftFunctions", "graft_clean_nb"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.cleanNbExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_clean_svm"),
      new ExpressionInfo("graft.functions.GraftFunctions", "graft_clean_svm"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        GraftFunctions.cleanSvmExpr(args.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_hamming"),
      new ExpressionInfo("graft.functions.GraftFunctions", "graft_hamming"),
      (args: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        HammingDistance(args(0), args(1))))
  }
}
