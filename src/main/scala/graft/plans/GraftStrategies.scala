package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}

/** The one planner strategy covering every custom graft physical
  * operator, registered once per session (idempotently) instead of
  * per call site — the r16 ADVICE nit about [[GlobalCumsum.cumsum]]
  * mutating `experimental.extraStrategies` at call time.
  * [[graft.Sessions.build]] registers it eagerly; the operator
  * builders still call [[register]] defensively so a session built
  * outside Sessions (tests, shells) works too.
  */
object GraftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalCumsumNode(sortOrder, valueAttrs, cumAttrs, agg, excl,
        child) =>
      GlobalCumsumExec(sortOrder, valueAttrs, cumAttrs, agg, excl,
        planLater(child)) :: Nil
    case RangeForwardFillNode(sortOrder, keyAttrs, valueAttr, fillAttr,
        child) =>
      RangeForwardFillExec(sortOrder, keyAttrs, valueAttr, fillAttr,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

object GraftStrategies {
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(GraftStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GraftStrategy
}
