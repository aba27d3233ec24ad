package graft

import org.apache.spark.sql.functions._

import graft.functions.Functions._

/** Scalar function semantics: the era-aware slot clock at its boundary,
  * dynamic range-filter composition, and the exact-decimal accumulator.
  */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def refSlotToPosixMs(slot: Long): Long =
    if (slot >= ShelleyStartSlot) ShelleyStartPosixMs + (slot - ShelleyStartSlot) * 1000L
    else ByronStartPosixMs + slot * 20000L

  test("slotToPosixMs: Byron/Shelley boundary and era arms") {
    val slots = Seq(0L, 1L, 4492799L, 4492800L, 4492801L, 170099400L)
    val got = slots.toDF("slot")
      .select(col("slot"), slotToPosixMs(col("slot")).as("ms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    slots.foreach { s =>
      assert(got(s) === refSlotToPosixMs(s), s"slot $s")
    }
    // the boundary slots are 20s apart on the Byron side, 1s on Shelley
    assert(got(4492800L) - refSlotToPosixMs(4492799L) ===
      ShelleyStartPosixMs - refSlotToPosixMs(4492799L))
  }

  test("slotToPosixMs agrees with the reference for arbitrary slots (property)") {
    val rnd = new scala.util.Random(7)
    val slots = Seq.fill(500)(math.abs(rnd.nextLong() % 200000000L))
    val got = slots.toDF("slot")
      .select(col("slot"), slotToPosixMs(col("slot")).as("ms"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    slots.foreach(s => assert(got(s) === refSlotToPosixMs(s)))
  }

  test("rangeFilter composes optional bounds like the reference's slot filter") {
    val df = (1L to 100L).toDF("v")
    def n(min: Option[Long], max: Option[Long]) =
      df.filter(rangeFilter(col("v"), min.map(lit(_)), max.map(lit(_)))).count()
    assert(n(None, None) === 100)
    assert(n(Some(41L), None) === 60)   // inclusive lower
    assert(n(None, Some(40L)) === 40)   // inclusive upper
    assert(n(Some(11L), Some(20L)) === 10)
    assert(n(Some(90L), Some(10L)) === 0)
  }

  test("dec: DECIMAL accumulation is exact where double accumulation drifts") {
    val df = Seq.fill(10000)(0.1).toDF("x")
    val exact = df.agg(sum(dec(col("x"))).cast("double")).collect()(0).getDouble(0)
    assert(exact === 1000.0)
  }

  test("lovelaceToAda") {
    val got = Seq(2500000L).toDF("l").select(lovelaceToAda(col("l"))).collect()(0).getDouble(0)
    assert(got === 2.5)
  }
}
