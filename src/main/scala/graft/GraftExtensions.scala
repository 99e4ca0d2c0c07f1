package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.RollingFingerprint

/** SparkSessionExtensions wiring (SURVEY.md §7.3 path (c) registration):
  * makes the engine's native expressions available to plain SQL users.
  *
  * Activate with either:
  * {{{
  *   SparkSession.builder().withExtensions(new GraftExtensions) ...
  *   // or config-driven (spark-submit / cluster default):
  *   --conf spark.sql.extensions=graft.GraftExtensions
  * }}}
  * then `SELECT rolling_fingerprint(text) FROM docs`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // range-theta → bucketed equi-join rewrite (opt-in by
    // graft.rangeJoin.bucketWidth; no-op otherwise)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinRewrite)
    // physical planning for the custom as-of join operator
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    ext.injectFunction((
      FunctionIdentifier("rolling_fingerprint"),
      new ExpressionInfo(classOf[RollingFingerprint].getName, "rolling_fingerprint"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "rolling_fingerprint(str) takes exactly one argument")
        RollingFingerprint(children.head)
      }))
  }
}
