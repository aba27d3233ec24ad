package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType}

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
  * after which Spark's built-in partition pruning skips the untouched
  * slot-group directories before any I/O. Injected cluster-wide via
  * `spark.sql.extensions=graft.GraftExtensions`; `readSlotRange` stays
  * as the explicit API for sessions without the extension.
  *
  * Gated on EVIDENCE of the storage contract, not column names alone: a
  * table that merely happens to carry `slot`/`slot_group` columns with a
  * different (or no) grouping relationship must not receive derived
  * predicates — they would be implied-false and silently drop rows. The
  * rewrite therefore fires only when `slot_group` is a PARTITION column
  * of the underlying file relation (the layout only CardanoWriter's
  * contract produces — and the only case where the derived predicate
  * buys anything, since its sole purpose is directory pruning) and
  * `slot` is a data column of that same relation. A session-level
  * kill-switch (`spark.graft.slotGroupPruning=false`) covers the
  * residual case of a foreign table partitioned by an unrelated
  * `slot_group` granularity.
  *
  * Conservative by construction: only conjunct-level comparisons of the
  * raw `slot` attribute against integral literals produce derived
  * predicates (always implied supersets — `slot ∈ [lo,hi] ⇒ slot_group
  * ∈ [grp(lo), grp(hi)]`), group arithmetic uses floorDiv (exact for
  * negative slots too), an IntegerType `slot_group` outside Int range
  * derives nothing rather than overflowing, and the rule is idempotent
  * (it skips filters that already constrain `slot_group`), so the
  * optimizer's fixed-point batch terminates.
  */
case class SlotGroupPruning(groupSize: Long) extends Rule[LogicalPlan] {

  /** Literal typed to the slot_group column (partition columns infer as
    * IntegerType for small values — a mistyped comparison would leave
    * the plan unresolved). None when the group value can't be
    * represented in the column's type.
    */
  private def grp(v: Long, dt: DataType): Option[Literal] = {
    val g = Math.floorDiv(v, groupSize) * groupSize
    dt match {
      case IntegerType if g >= Int.MinValue && g <= Int.MaxValue =>
        Some(Literal(g.toInt))
      case IntegerType => None
      case _ => Some(Literal(g))
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

  /** The storage-contract evidence: some file relation under `child`
    * has `slot_group` as a partition column and `slot` as a data
    * column, and both attributes resolve to THAT relation's output.
    */
  private def contractRelation(child: LogicalPlan,
      slot: Attribute, sg: Attribute): Boolean =
    child.collectLeaves().exists {
      case lr: LogicalRelation => lr.relation match {
        case fs: HadoopFsRelation =>
          fs.partitionSchema.fieldNames.contains(sg.name) &&
            fs.dataSchema.fieldNames.contains(slot.name) &&
            lr.output.exists(_.exprId == sg.exprId) &&
            lr.output.exists(_.exprId == slot.exprId)
        case _ => false
      }
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.slotGroupPruning", "true").toBoolean)
      return plan
    plan.transform {
      case f @ Filter(cond, child) =>
        val slot = child.output.find(a => a.name == "slot" && a.dataType == LongType)
        val sg = child.output.find(a => a.name == "slot_group" &&
          (a.dataType == LongType || a.dataType == IntegerType))
        (slot, sg) match {
          case (Some(s), Some(g)) if contractRelation(child, s, g) =>
            val cs = conjuncts(cond)
            if (cs.exists(_.references.contains(g))) f // already constrained
            else {
              val derived = cs.flatMap {
                case GreaterThanOrEqual(a: AttributeReference, IntegralLit(v))
                    if a.semanticEquals(s) => grp(v, g.dataType).map(GreaterThanOrEqual(g, _))
                case GreaterThan(a: AttributeReference, IntegralLit(v))
                    if a.semanticEquals(s) => grp(v, g.dataType).map(GreaterThanOrEqual(g, _))
                case LessThanOrEqual(a: AttributeReference, IntegralLit(v))
                    if a.semanticEquals(s) => grp(v, g.dataType).map(LessThanOrEqual(g, _))
                case LessThan(a: AttributeReference, IntegralLit(v))
                    if a.semanticEquals(s) => grp(v, g.dataType).map(LessThanOrEqual(g, _))
                case EqualTo(a: AttributeReference, IntegralLit(v))
                    if a.semanticEquals(s) => grp(v, g.dataType).map(EqualTo(g, _))
                case _ => None
              }
              if (derived.isEmpty) f
              else Filter(And(cond, derived.reduce(And)), child)
            }
          case _ => f
        }
    }
  }
}
