package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftInternal, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, Ascending, Attribute, BindReferences, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native AS-OF JOIN as a whole custom operator — the full Catalyst
  * extension ladder in one place: a [[LogicalPlan]] node, a
  * [[SparkStrategy]], and a [[SparkPlan]] with distribution/ordering
  * requirements, reachable from the DataFrame API via [[AsOf.join]].
  *
  * Semantics (matching DuckDB's `ASOF LEFT JOIN`, the oracle for
  * q21/q30): every probe row joins the single build row with equal keys
  * and the greatest timestamp at-or-before the probe's timestamp;
  * probes with no such build row keep null build columns. Build rows
  * must be unique per (keys, ts) — as-of is ambiguous otherwise (q21's
  * checkpoint dedup applies).
  *
  * Why a custom physical operator (preference order (c) — (a)/(b) fall
  * short): Spark's built-ins express as-of either as a range-predicate
  * join (plans BroadcastNestedLoop / cartesian — O(probes×builds)) or
  * as the union + double-window forward-fill idiom (q21 — correct and
  * scalable, but it shuffles the PROBE side twice: once to sort the
  * merged timeline, once more if downstream needs a different order,
  * and it pays a window sort over probes+builds combined). This exec
  * declares ClusteredDistribution on the keys for both children and a
  * per-child (keys, ts) sort, so Catalyst's EnsureRequirements plans
  * exactly ONE shuffle per side with co-partitioned outputs; the join
  * itself is a single forward pass over the two sorted partition
  * iterators — O(probes + builds), no per-key state beyond one build
  * row, no memory proportional to the partition.
  *
  * 100 TB posture: identical to sort-merge join — both sides hash-
  * partition on the key, each partition streams once; the only retained
  * state is the current build row (one row). Skewed keys behave exactly
  * like SMJ skew (AQE skew handling does not split custom joins, so a
  * pathological single user key is the same hot partition SMJ would
  * have; salting applies unchanged).
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinPlan]] into [[AsOfJoinExec]]. Injected via
  * `GraftExtensions` (deployment path) or `spark.experimental.
  * extraStrategies` ([[AsOf.ensureRegistered]], ad-hoc path).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lts, rts) =>
      AsOfJoinExec(lk, rk, lts, rts, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Attribute],
    rightKeys: Seq[Attribute],
    leftTs: Attribute,
    rightTs: Attribute,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // one hash shuffle per side, co-partitioned by EnsureRequirements
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // per-partition (keys, ts) sort — EnsureRequirements inserts SortExec
  // only where the child isn't already sorted
  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTs, Ascending),
      rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTs, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTs = leftTs
    val rTs = rightTs
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (probeIter, buildIter) =>
      val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
      val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
      val lTsEval = BindReferences.bindReference(lTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], leftOut)
      val rTsEval = BindReferences.bindReference(rTs.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression], rightOut)
      // binding outAttrs against themselves keeps the build side's
      // forced nullability, so the projection null-checks the null row
      val outProj = UnsafeProjection.create(
        outAttrs.map(a => a.asInstanceOf[org.apache.spark.sql.catalyst.expressions.Expression]), outAttrs)
      val keyOrd = {
        val ords = lKeys.map(a => PhysicalDataType.ordering(a.dataType)
          .asInstanceOf[Ordering[Any]])
        new Ordering[InternalRow] {
          override def compare(x: InternalRow, y: InternalRow): Int = {
            var i = 0
            while (i < ords.length) {
              val l = if (x.isNullAt(i)) null else x.get(i, lKeys(i).dataType)
              val r = if (y.isNullAt(i)) null else y.get(i, lKeys(i).dataType)
              val c =
                if (l == null && r == null) 0
                else if (l == null) -1
                else if (r == null) 1
                else ords(i).compare(l, r)
              if (c != 0) return c
              i += 1
            }
            0
          }
        }
      }
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightOut.length)

      new Iterator[InternalRow] {
        // the single unconsumed build row (copied: sorter iterators
        // reuse their row buffer)
        private var bRow: InternalRow = _
        private var bKey: UnsafeRow = _
        private var bTsV: Long = 0L
        // the last build row for the CURRENT key run with ts <= probe ts
        private var mRow: InternalRow = _
        private var mKey: UnsafeRow = _
        advanceBuild()

        private def advanceBuild(): Unit =
          if (buildIter.hasNext) {
            bRow = buildIter.next().copy()
            bKey = rKeyProj(bRow).copy()
            bTsV = rTsEval.eval(bRow).asInstanceOf[Long]
          } else bRow = null

        override def hasNext: Boolean = probeIter.hasNext

        override def next(): InternalRow = {
          val p = probeIter.next()
          val pKey = lKeyProj(p)
          if (pKey.anyNull) return outProj(joined(p, nullRight))
          val pTsV = lTsEval.eval(p).asInstanceOf[Long]
          // consume every build row at-or-before (pKey, pTsV); rows of
          // an earlier key are discarded, rows of THIS key become the
          // running match (last one wins — the greatest ts <= probe ts)
          var cmp = if (bRow == null) 1 else keyOrd.compare(bKey, pKey)
          while (bRow != null && (cmp < 0 || (cmp == 0 && bTsV <= pTsV))) {
            if (cmp == 0 && !bKey.anyNull) { mRow = bRow; mKey = bKey }
            advanceBuild()
            cmp = if (bRow == null) 1 else keyOrd.compare(bKey, pKey)
          }
          if (mKey != null && keyOrd.compare(mKey, pKey) == 0)
            outProj(joined(p, mRow))
          else outProj(joined(p, nullRight))
        }
      }
    }
  }
}

/** DataFrame-level entry point for the native as-of join. */
object AsOf {

  /** Idempotently add [[AsOfJoinStrategy]] to the session's planner
    * (the imperative twin of GraftExtensions' injectPlannerStrategy).
    */
  def ensureRegistered(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  /** probe AS-OF LEFT JOIN build: for each probe row, the build row
    * with matching keys and the greatest `buildTs` <= `probeTs`
    * (inclusive), or nulls. Output = probe columns ++ build columns
    * (made nullable); name them apart before joining. Timestamps must
    * be LongType (the engine's µs event-time axis, Functions.tsUs).
    */
  def join(probe: DataFrame, build: DataFrame, leftKeys: Seq[String],
      rightKeys: Seq[String], probeTs: String, buildTs: String): DataFrame = {
    require(leftKeys.nonEmpty && leftKeys.length == rightKeys.length,
      "as-of join requires one or more equi-key pairs")
    val spark = probe.sparkSession
    ensureRegistered(spark)
    val lPlan = probe.queryExecution.analyzed
    // fresh exprIds on the build side so self-joins (both sides derived
    // from one table — the common case) bind unambiguously
    val rAliased = Project(
      build.queryExecution.analyzed.output.map(a => Alias(a, a.name)()),
      build.queryExecution.analyzed)
    val rOut: Seq[Attribute] = rAliased.projectList.map(_.toAttribute)
    def attr(out: Seq[Attribute], n: String, side: String): Attribute =
      out.find(_.name == n).getOrElse(throw new IllegalArgumentException(
        s"as-of join: no column '$n' on the $side side (${out.map(_.name).mkString(", ")})"))
    val lk = leftKeys.map(attr(lPlan.output, _, "probe"))
    val rk = rightKeys.map(attr(rOut, _, "build"))
    lk.zip(rk).foreach { case (a, b) =>
      require(a.dataType == b.dataType,
        s"as-of key type mismatch: ${a.name}:${a.dataType.sql} vs ${b.name}:${b.dataType.sql}")
    }
    val lt = attr(lPlan.output, probeTs, "probe")
    val rt = attr(rOut, buildTs, "build")
    require(lt.dataType == org.apache.spark.sql.types.LongType &&
      rt.dataType == org.apache.spark.sql.types.LongType,
      "as-of timestamps must be LongType (µs axis)")
    GraftInternal.ofRows(spark, AsOfJoinPlan(lPlan, rAliased, lk, rk, lt, rt))
  }
}
