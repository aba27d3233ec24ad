package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{ArrayCountIn, ArrayDot, CustomFunctions, MinHashAgg, RollingHash, SimHashAgg}

/** SparkSessionExtensions entry point: injects the engine's native
  * expressions into any session built with
  *
  *   spark.sql.extensions=graft.GraftExtensions
  *
  * (or `builder.withExtensions(new GraftExtensions())`), so SQL users
  * get `rolling_hash` / `minhash128` / `simhash64` / `array_dot`
  * without imperative registration — the deployment-grade path for a
  * shared cluster, where per-session `CustomFunctions.register` (still
  * available for ad-hoc sessions) doesn't reach every notebook.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def fn(name: String, builder: Seq[Expression] => Expression,
      clazz: Class[_]): (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name), new ExpressionInfo(clazz.getName, name), builder)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction(fn("rolling_hash",
      exprs => RollingHash(exprs.head,
        CustomFunctions.RollingHashBase, CustomFunctions.RollingHashMod),
      classOf[RollingHash]))
    ext.injectFunction(fn("minhash128",
      exprs => MinHashAgg(exprs.head, 128), classOf[MinHashAgg]))
    ext.injectFunction(fn("simhash64",
      exprs => SimHashAgg(exprs.head), classOf[SimHashAgg]))
    ext.injectFunction(fn("array_dot",
      exprs => ArrayDot(exprs(0), exprs(1)), classOf[ArrayDot]))
    ext.injectFunction(fn("array_count_in",
      ArrayCountIn.fromExprs, classOf[ArrayCountIn]))
    ext.injectFunction(fn("topk_agg",
      graft.functions.TopKAgg.fromExprs, classOf[graft.functions.TopKAgg]))
    // slot predicates → slot_group partition pruning (SURVEY.md §4)
    ext.injectOptimizerRule(_ =>
      graft.plans.SlotGroupPruning(graft.ingest.CardanoWriter.SlotGroupSize))
    // native AS-OF JOIN physical operator (graft.plans.AsOfJoinExec)
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
  }
}
