package graft

import org.apache.spark.sql.functions._

import graft.functions.DecimalMicros
import graft.functions.Functions.{dec, decMicros, microsDouble}
import graft.io.Tables.table

/** Pins the long-micros accumulator (`micros_double(SUM(decimal_micros(
  * d)))`) bit-identical to the DECIMAL(38,6) path (`CAST(SUM(CAST(d AS
  * DECIMAL(38,6))) AS DOUBLE)`) — the q03 hot-sum rewrite. Three layers:
  * scalar equivalence of `decimal_micros` vs the decimal cast's unscaled
  * value on adversarial doubles (shortest-repr HALF_UP boundaries, ±,
  * subnormal-ish tails), null/overflow contracts, and whole-query
  * raw-double-bit equality on the real tables (every grouped sum q03
  * computes, plus events.value for q35's shape).
  */
class DecimalSumSpec extends SparkSpec {

  private lazy val registered: Unit =
    graft.functions.CustomFunctions.register(spark)

  private def castUnscaled(d: Double): Option[Long] = {
    // the reference model: Spark's Cast(double -> decimal(38,6)) is
    // BigDecimal.valueOf (shortest decimal repr) then setScale(6,
    // HALF_UP); its unscaled value is what decimal_micros must return
    if (d.isNaN || d.isInfinite) None
    else
      try Some(java.math.BigDecimal.valueOf(d)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact())
      catch { case _: ArithmeticException => None }
  }

  test("decimal_micros equals the decimal(38,6) cast's unscaled value on boundary doubles") {
    val cases = Seq(
      0.0, -0.0, 1.0, -1.0, 0.04, -0.04, 0.1 + 0.2, // 0.30000000000000004
      0.0000005, -0.0000005, 1.0000005, -1.0000005, // HALF_UP at the 6th place
      0.00000049999, 0.00000050001, 123456.789012, -123456.789012,
      9.2e12, -9.2e12, 1e-300, -1e-300, 4.9e-324, Double.MinPositiveValue,
      94949.5, 0.015, 0.025, 0.035, 2.675, 1.005 // classic shortest-repr rounding traps
    )
    cases.foreach { d =>
      val got = Option(DecimalMicros.microsOrNull(d)).map(_.longValue())
      assert(got == castUnscaled(d), s"input $d")
    }
  }

  test("fast path equals the BigDecimal construction on ties, near-ties and random doubles") {
    // the rint fast path must be indistinguishable from the two-step
    // BigDecimal construction everywhere; ties and near-boundary values
    // are routed to the exact path by the 4-ULP margin — sweep a dense
    // grid of exact .5-micro ties, offsets a few ULP either side, the
    // fast-path cutoff region, and seeded random magnitudes
    val rnd = new scala.util.Random(42)
    val crafted = Seq.newBuilder[Double]
    (0 until 2000).foreach { i =>
      val tie = (i * 2 + 1) * 5e-7 // x.5 micro ties: 0.0000005, 0.0000015, ...
      crafted += tie += -tie
      crafted += Math.nextUp(tie) += Math.nextDown(tie)
      crafted += Math.nextUp(Math.nextUp(tie)) += Math.nextDown(Math.nextDown(tie))
    }
    (0 until 2000).foreach { _ =>
      val mag = math.pow(10, rnd.nextDouble() * 19 - 7) // 1e-7 .. 1e12
      val v = (rnd.nextDouble() * 2 - 1) * mag
      crafted += v
      val tie = Math.floor(v * 1e6) / 1e6 + 5e-7
      crafted += tie += Math.nextUp(tie) += Math.nextDown(tie)
    }
    // the |p| ~ 4.5e15 fast-path cutoff and the margin>=0.25 guard region
    Seq(4.4e9, 4.5e9, 4.6e9, 2.8e8, 2.9e8, 9.19e12, 9.2e12).foreach { m =>
      crafted += m += -m += Math.nextUp(m) += Math.nextDown(m)
    }
    crafted.result().foreach { d =>
      assert(Option(DecimalMicros.microsOrNull(d)).map(_.longValue()) == castUnscaled(d),
        s"input ${java.lang.Double.toHexString(d)} ($d)")
    }
  }

  test("decimal_micros returns null exactly where the cast overflows or is non-finite") {
    Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      9.3e12, -9.3e12, 1e30).foreach { d =>
      assert(DecimalMicros.microsOrNull(d) == null, s"input $d")
      assert(castUnscaled(d).isEmpty, s"model input $d")
    }
  }

  test("micros roundtrip matches the decimal cast end-to-end through Spark plans") {
    registered
    import spark.implicits._
    val ds = Seq(0.04, -1.0000005, 0.1 + 0.2, 123456.789012, 0.0).toDF("d")
    val viaDec = ds.select(dec(col("d")).cast("double")).as[Double].collect()
    val viaMicros = ds.select(microsDouble(decMicros(col("d")))).as[Double].collect()
    assert(viaDec.map(java.lang.Double.doubleToRawLongBits).toSeq ==
      viaMicros.map(java.lang.Double.doubleToRawLongBits).toSeq)
  }

  test("every q03 grouped sum is raw-bit identical on real lineitem data") {
    registered
    val li = table(spark, sf, "lineitem")
    val exprs = Seq[org.apache.spark.sql.Column](
      col("l_quantity"),
      col("l_extendedprice"),
      col("l_extendedprice") * (lit(1d) - col("l_discount")),
      col("l_extendedprice") * (lit(1d) - col("l_discount")) * (lit(1d) + col("l_tax")),
      col("l_discount"))
    exprs.zipWithIndex.foreach { case (e, i) =>
      val a = li.groupBy("l_returnflag", "l_linestatus")
        .agg(sum(dec(e)).cast("double").as("s"))
        .orderBy("l_returnflag", "l_linestatus")
        .select("s").collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
      val b = li.groupBy("l_returnflag", "l_linestatus")
        .agg(microsDouble(sum(decMicros(e))).as("s"))
        .orderBy("l_returnflag", "l_linestatus")
        .select("s").collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
      assert(a.toSeq == b.toSeq, s"sum expr #$i")
    }
  }

  test("two-level cube totals are raw-bit identical via microsDec (q37's shape)") {
    registered
    import graft.functions.Functions.microsDec
    val o = table(spark, sf, "orders")
    val a = o.groupBy("o_orderstatus", "o_orderpriority")
      .agg(sum(dec(col("o_totalprice"))).as("sum0"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sum("sum0").cast("double").as("s"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      .select("s").collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    val b = o.groupBy("o_orderstatus", "o_orderpriority")
      .agg(sum(decMicros(col("o_totalprice"))).as("sum0"))
      .cube("o_orderstatus", "o_orderpriority")
      .agg(sum(microsDec(col("sum0"))).cast("double").as("s"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
      .select("s").collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    assert(a.toSeq == b.toSeq)
  }

  test("events.value grouped sum is raw-bit identical (q35's shape)") {
    registered
    val ev = table(spark, sf, "events")
    val a = ev.groupBy(col("user_id") % 7).agg(sum(dec(col("value"))).cast("double").as("s"))
      .orderBy(col("user_id") % 7)
      .select("s").collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    val b = ev.groupBy(col("user_id") % 7).agg(microsDouble(sum(decMicros(col("value")))).as("s"))
      .orderBy(col("user_id") % 7)
      .select("s").collect().map(r => java.lang.Double.doubleToRawLongBits(r.getDouble(0)))
    assert(a.toSeq == b.toSeq)
  }
}
