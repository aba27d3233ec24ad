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
}
