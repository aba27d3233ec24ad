package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.CustomFunctions

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions into any session built with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `builder.withExtensions(new GraftExtensions())`), so SQL users
  * get the full native-function surface without imperative
  * registration — the deployment-grade path for a shared cluster,
  * where per-session `CustomFunctions.register` (still available for
  * ad-hoc sessions) doesn't reach every notebook. Both paths iterate
  * ONE builder list (CustomFunctions.builders), so they cannot drift.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression,
      clazz: Class[_]): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    CustomFunctions.builders.foreach { case (name, builder, clazz) =>
      ext.injectFunction(fn(name, builder, clazz))
    }
    // slot predicates → slot_group partition pruning (SURVEY.md §4)
    ext.injectOptimizerRule(_ =>
      graft.plans.SlotGroupPruning(graft.ingest.CardanoWriter.SlotGroupSize))
    // native AS-OF JOIN physical operator (graft.plans.AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
