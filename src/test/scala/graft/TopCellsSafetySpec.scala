package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

import graft.functions.{CustomFunctions, TopCells}

/** TopCells is exposed cluster-wide through the extension SQL surface,
  * so its inputs are USER input: short vectors, null components, and
  * NULL literals must produce deterministic results or a typed error —
  * never an out-of-bounds Unsafe read (silent garbage cells) or an NPE
  * from the builder. Pins the round-6 verdict's two holes.
  */
class TopCellsSafetySpec extends SparkSpec {

  private val cs = Array(
    Array(1.0, 0.0, 0.0), Array(0.0, 1.0, 0.0), Array(0.5, 0.5, 0.5))

  /** Reference model: clamp to the vector's length, null components
    * contribute 0; select k cells by (dot, id) lexicographic descending
    * — exactly TopCells' documented order.
    */
  private def model(v: Seq[Option[Double]], k: Int): Seq[Int] = {
    val dots = cs.map { c =>
      v.take(c.length).zipWithIndex
        .collect { case (Some(x), i) => x * c(i) }.sum
    }
    val used = Array.fill(cs.length)(false)
    (0 until k).map { _ =>
      val best = dots.indices.filterNot(used).maxBy(i =>
        (dots(i), i))(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
      used(best) = true
      best
    }
  }

  private def evalOn(v: Seq[Option[Double]], k: Int): Seq[Int] = {
    val arr = new GenericArrayData(
      v.map(_.map(Double.box).orNull).toArray[Any])
    TopCells(Literal(arr, ArrayType(DoubleType)), cs, k)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toIntArray().toSeq
  }

  test("TopCells clamps short vectors and skips null components (eval = model)") {
    // short vector: only dim 0 present → dots (5, 0, 2.5) → ranked 0,2,1
    assert(evalOn(Seq(Some(5.0)), 3) === Seq(0, 2, 1))
    assert(evalOn(Seq(Some(5.0)), 3) === model(Seq(Some(5.0)), 3))
    // null component in slot 0 → dots (0, 1, 0.5) → best is cell 1
    val withNull = Seq(None, Some(1.0))
    assert(evalOn(withNull, 1) === Seq(1))
    assert(evalOn(withNull, 3) === model(withNull, 3))
    // empty vector: all dots 0 → ties resolve to larger id first
    assert(evalOn(Seq.empty, 3) === Seq(2, 1, 0))
    // over-long vector: extra components ignored (clamped to dim)
    val long = Seq(Some(1.0), Some(0.0), Some(0.0), Some(99.0))
    assert(evalOn(long, 1) === Seq(0))
    // randomized sweep against the model
    val rnd = new scala.util.Random(11)
    (1 to 200).foreach { _ =>
      val v = Seq.fill(rnd.nextInt(6))(
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 2 - 1))
      val k = 1 + rnd.nextInt(3)
      assert(evalOn(v, k) === model(v, k), s"v=$v k=$k")
    }
  }

  private def messageChain(t: Throwable): String = {
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }

  test("top_cells SQL surface rejects malformed literals with typed errors, not NPE") {
    CustomFunctions.register(spark)
    def fails(sql: String, expect: String): Unit = {
      val e = intercept[Throwable] { spark.sql(sql).collect() }
      assert(messageChain(e).contains(expect),
        s"wanted '$expect' in: ${messageChain(e)}")
    }
    fails("SELECT top_cells(array(1.0d), CAST(NULL AS ARRAY<ARRAY<DOUBLE>>), 1)",
      "must not be NULL")
    fails("SELECT top_cells(array(1.0d), array(array(1.0d), CAST(NULL AS ARRAY<DOUBLE>)), 1)",
      "must not be NULL")
    fails("SELECT top_cells(array(1.0d,0.0d), array(array(1.0d, CAST(NULL AS DOUBLE))), 1)",
      "NULL component")
    fails("SELECT top_cells(array(1.0d), array(array(1.0d,0.0d)), CAST(NULL AS INT))",
      "non-NULL integer literal")
    fails("SELECT top_cells(array(1.0d), array(array(1.0d,0.0d)), 5)",
      "must be in [1, 1]")
    fails("SELECT top_cells(array(1.0d), array(array(1.0d), array(1.0d,2.0d)), 1)",
      "share one dimension")
  }

  test("top_cells SQL surface clamps short and null-holding vectors (codegen path)") {
    CustomFunctions.register(spark)
    // goes through the dataframe/codegen route: non-literal input column
    import spark.implicits._
    val df = Seq(
      (1L, Seq[java.lang.Double](5.0)),                // short
      (2L, Seq[java.lang.Double](null, 1.0)),          // null component
      (3L, Seq[java.lang.Double](0.0, 0.0, 0.0, 9.9)), // over-long
      (4L, Seq.empty[java.lang.Double])                // empty
    ).toDF("id", "v")
    df.createOrReplaceTempView("tc_probe")
    val got = spark.sql(
      """SELECT id, top_cells(v,
        |  array(array(1.0d,0.0d,0.0d), array(0.0d,1.0d,0.0d), array(0.5d,0.5d,0.5d)),
        |  1)[0] AS cell
        |FROM tc_probe ORDER BY id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 2))
    // wrong element type is an analysis error, not runtime garbage
    val e = intercept[Throwable] {
      spark.sql("SELECT top_cells(array('a'), array(array(1.0d)), 1)").collect()
    }
    assert(messageChain(e).toLowerCase.contains("array<double>") ||
      messageChain(e).contains("DATATYPE_MISMATCH"))
  }

  // -------------------------------------------------------------------
  // Two-level routing (numCells ≥ TopCells.hierMin): the sf10 probe's
  // fix for the O(N·numCells) assignment quadratic. The rule — top-P
  // coarse groups by (dot, groupId) desc, P = min(max(2,k), groups),
  // then top-k member cells by (dot, cellId) desc among those groups —
  // is DETERMINISTIC and index-defining, so both the eval and codegen
  // paths must match an independent re-implementation of the two
  // ranking stages bit-for-bit on adversarial inputs: clustered
  // centroids, exact-duplicate centroids (id tie-breaks), short /
  // null-holding / empty vectors (clamp semantics).
  // -------------------------------------------------------------------

  /** Independent two-level reference model. Shares ONLY the group
    * partition with the engine (the grouping is index data, not the
    * routing rule under test); both ranking stages are re-derived with
    * plain Scala orderings.
    */
  private def hierModel(cs: Array[Array[Double]], v: Seq[Option[Double]],
      k: Int): Seq[Int] = {
    val dim = cs(0).length
    val h = TopCells.buildHier(cs)
    def dotTo(c: IndexedSeq[Double]): Double = {
      var s = 0.0
      v.take(dim).zipWithIndex.foreach {
        case (Some(x), i) => s += x * c(i)
        case _ => ()
      }
      s
    }
    val ord = Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int)
    val groups = (0 until h.numGroups).sortBy(gi =>
      (dotTo((0 until dim).map(d => h.coarseFlat(gi * dim + d))), gi))(ord.reverse)
    val p = math.min(math.max(2, k), h.numGroups)
    val cand = groups.take(p).flatMap(gi =>
      (h.groupStart(gi) until h.groupStart(gi + 1)).map(h.memberIds))
    cand.sortBy(cell => (dotTo(cs(cell)), cell))(ord.reverse).take(k)
  }

  private def evalLarge(cs: Array[Array[Double]], v: Seq[Option[Double]],
      k: Int): Seq[Int] = {
    val arr = new GenericArrayData(v.map(_.map(Double.box).orNull).toArray[Any])
    TopCells(Literal(arr, ArrayType(DoubleType)), cs, k)
      .eval(InternalRow.empty).asInstanceOf[ArrayData].toIntArray().toSeq
  }

  test("two-level routing (≥ hierMin cells) matches the independent rule model") {
    val rnd = new scala.util.Random(23)
    val dim = 8
    val n = TopCells.hierMin + 72 // 200 cells → two-level path active
    // clustered centroids plus exact duplicates so id-tie-breaking is
    // exercised within a candidate set
    val anchors = Array.fill(10)(Array.fill(dim)(rnd.nextGaussian() * 5))
    val cs = Array.tabulate(n) { i =>
      if (i >= n - 8) anchors(i % 4).clone() // exact duplicate centroids
      else {
        val a = anchors(i % 10)
        Array.tabulate(dim)(d => a(d) + rnd.nextGaussian() * 0.1)
      }
    }
    assert(n >= TopCells.hierMin)
    (1 to 300).foreach { trial =>
      val len = rnd.nextInt(dim + 3) // short, exact and over-long vectors
      val v = Seq.fill(len)(
        if (rnd.nextInt(8) == 0) None else Some(rnd.nextDouble() * 4 - 2))
      val k = 1 + rnd.nextInt(5)
      assert(evalLarge(cs, v, k) === hierModel(cs, v, k), s"trial=$trial v=$v k=$k")
    }
    // a vector EQUAL to a duplicated anchor: duplicate cells tie at the
    // top of their group → larger id must win
    val dup = anchors(1).map(Option(_)).toSeq
    assert(evalLarge(cs, dup, 3) === hierModel(cs, dup, 3))
    // empty vector: all dots 0 → both stages are pure id-desc order
    assert(evalLarge(cs, Seq.empty, 4) === hierModel(cs, Seq.empty, 4))
  }

  test("two-level routing below hierMin is exactly the historic flat loop") {
    // the flat model from the small-centroid tests, at a count just
    // under the threshold — pins that the regime boundary changes
    // nothing for every driver-tested index size
    val rnd = new scala.util.Random(29)
    val dim = 5
    val n = TopCells.hierMin - 1
    val csBig = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
    def flatModel(v: Seq[Option[Double]], k: Int): Seq[Int] = {
      val dots = csBig.map { c =>
        var s = 0.0
        v.take(dim).zipWithIndex.foreach {
          case (Some(x), i) => s += x * c(i)
          case _ => ()
        }
        s
      }
      val used = Array.fill(n)(false)
      (0 until k).map { _ =>
        val best = dots.indices.filterNot(used).maxBy(i =>
          (dots(i), i))(Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Int))
        used(best) = true
        best
      }
    }
    (1 to 100).foreach { trial =>
      val v = Seq.fill(dim)(Some(rnd.nextDouble() * 2 - 1))
      val k = 1 + rnd.nextInt(4)
      assert(evalLarge(csBig, v, k) === flatModel(v, k), s"trial=$trial")
    }
  }

  test("two-level routing codegen path equals eval on a ≥ hierMin centroid literal") {
    CustomFunctions.register(spark)
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val dim = 6
    val n = TopCells.hierMin
    val cs = Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
    val csSql = cs.map(_.mkString("array(", "d,", "d)")).mkString("array(", ",", ")")
    val rows = (0 until 64).map(i =>
      (i.toLong, Seq.fill(dim)(rnd.nextDouble() * 2 - 1)))
    rows.toDF("id", "v").createOrReplaceTempView("tc_hier_probe")
    val got = spark.sql(
      s"SELECT id, top_cells(v, $csSql, 3) AS cells FROM tc_hier_probe ORDER BY id")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1).toList).toMap
    rows.foreach { case (id, v) =>
      assert(got(id) === hierModel(cs, v.map(Some(_)), 3), s"id=$id")
    }
  }
}
