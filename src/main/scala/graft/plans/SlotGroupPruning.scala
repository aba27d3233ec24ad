package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: derive `slot_group` partition predicates from `slot`
  * predicates — the custom `Rule[LogicalPlan]` SURVEY.md §4 sketches.
  *
  * The storage contract (graft.ingest.CardanoWriter) partitions every
  * Cardano table by `slot_group = floor(slot / 200000) * 200000`. A
  * user filtering on `slot` alone would scan every partition; this rule
  * rewrites
  *
  *   Filter(slot >= lo && slot <= hi, scan)
  *   → Filter(slot >= lo && slot <= hi
  *            && slot_group >= grp(lo) && slot_group <= grp(hi), scan)
  *
  * whenever the child exposes BOTH columns, after which Spark's
  * built-in partition pruning skips the untouched slot-group
  * directories before any I/O. Injected cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions`; `readSlotRange` stays
  * as the explicit API for sessions without the extension.
  *
  * Conservative by construction: only conjunct-level comparisons of the
  * raw `slot` attribute against integral literals produce derived
  * predicates (always implied supersets — `slot ∈ [lo,hi] ⇒ slot_group
  * ∈ [grp(lo), grp(hi)]`), and the rule is idempotent (it skips filters
  * that already constrain `slot_group`), so the optimizer's fixed-point
  * batch terminates.
  */
case class SlotGroupPruning(groupSize: Long) extends Rule[LogicalPlan] {

  /** Literal typed to the slot_group column (partition columns infer as
    * IntegerType for small values — a mistyped comparison would leave
    * the plan unresolved).
    */
  private def grp(v: Long, dt: org.apache.spark.sql.types.DataType): Literal = {
    val g = v / groupSize * groupSize
    dt match {
      case IntegerType => Literal(g.toInt)
      case _ => Literal(g)
    }
  }

  private object IntegralLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _ => None
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val slot = child.output.find(a => a.name == "slot" && a.dataType == LongType)
      val sg = child.output.find(a => a.name == "slot_group" &&
        (a.dataType == LongType || a.dataType == IntegerType))
      (slot, sg) match {
        case (Some(s), Some(g)) =>
          val cs = conjuncts(cond)
          if (cs.exists(_.references.contains(g))) f // already constrained
          else {
            val derived = cs.flatMap {
              case GreaterThanOrEqual(a: AttributeReference, IntegralLit(v))
                  if a.semanticEquals(s) => Some(GreaterThanOrEqual(g, grp(v, g.dataType)))
              case GreaterThan(a: AttributeReference, IntegralLit(v))
                  if a.semanticEquals(s) => Some(GreaterThanOrEqual(g, grp(v, g.dataType)))
              case LessThanOrEqual(a: AttributeReference, IntegralLit(v))
                  if a.semanticEquals(s) => Some(LessThanOrEqual(g, grp(v, g.dataType)))
              case LessThan(a: AttributeReference, IntegralLit(v))
                  if a.semanticEquals(s) => Some(LessThanOrEqual(g, grp(v, g.dataType)))
              case EqualTo(a: AttributeReference, IntegralLit(v))
                  if a.semanticEquals(s) => Some(EqualTo(g, grp(v, g.dataType)))
              case _ => None
            }
            if (derived.isEmpty) f
            else Filter(And(cond, derived.reduce(And)), child)
          }
        case _ => f
      }
  }
}
