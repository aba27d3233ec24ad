package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The events.ts physical-encoding seam: the testdata generator has
  * shipped the column as parquet TIMESTAMP(NANOS) (rounds 1-7) and as
  * TIMESTAMP(MICROS) (round-8 regeneration). Tables.table normalizes
  * BOTH to the engine's long nanoseconds-since-epoch axis at the read
  * site; this spec pins that the two encodings of the same instants
  * read back as identical longs, so a future regeneration flipping the
  * type again cannot silently shift the event-time axis.
  */
class TablesEncodingSpec extends SparkSpec {

  // NB: the long-ns axis spans ±292 years around 1970 (Long.Max ns ≈
  // year 2262) — instants outside that range are unrepresentable by
  // design, and the µs→ns widening correctly overflows loudly (ANSI)
  // rather than wrapping. Edges below stay inside the axis.
  private val instantsUs: Seq[Long] = Seq(
    0L, // epoch
    1705276800000000L, // 2024-01-15T00:00:00Z — q15's as-of cutoff
    1705276800123456L, // sub-second µs component
    -9000000000000000000L / 1000L, // ≈ 1684, near the axis floor
    9000000000000000000L / 1000L // ≈ 2255, near the axis ceiling
  )

  test("TIMESTAMP(MICROS) events read as the same long ns the raw-long encoding gives") {
    val dir = Files.createTempDirectory("enc").toFile.getAbsolutePath

    // micros encoding: what pyarrow timestamp[us] round-trips to — a
    // Spark TIMESTAMP_NTZ column written as parquet TIMESTAMP(MICROS,
    // isAdjustedToUTC=false)
    val micros = spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.zipWithIndex.map { case (us, i) =>
        org.apache.spark.sql.Row(i.toLong, java.time.LocalDateTime.ofEpochSecond(
          math.floorDiv(us, 1000000L), (math.floorMod(us, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC))
      }),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", TimestampNTZType))))
    micros.write.mode("overwrite").parquet(s"$dir/micros/events.parquet")

    // raw-long encoding: the nanosAsLong read of TIMESTAMP(NANOS) is a
    // plain int64 ns column; writing longs directly models it exactly
    // from the reader's point of view
    val longs = spark.createDataFrame(
      spark.sparkContext.parallelize(instantsUs.zipWithIndex.map { case (us, i) =>
        org.apache.spark.sql.Row(i.toLong, us * 1000L)
      }),
      StructType(Seq(StructField("event_id", LongType),
        StructField("ts", LongType))))
    longs.write.mode("overwrite").parquet(s"$dir/longs/events.parquet")

    def read(sub: String): Map[Long, Long] =
      graft.io.Tables.table(spark, s"$dir/$sub", "events")
        .select(col("event_id"), col("ts"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val m = read("micros")
    val l = read("longs")
    assert(m === l)
    assert(m(instantsUs.indexOf(1705276800123456L).toLong) === 1705276800123456000L)
    // both normalize to LongType — the single axis every consumer sees
    Seq("micros", "longs").foreach { sub =>
      val dt = graft.io.Tables.table(spark, s"$dir/$sub", "events").schema("ts").dataType
      assert(dt === LongType, s"$sub: ts read as $dt")
    }
  }
}
