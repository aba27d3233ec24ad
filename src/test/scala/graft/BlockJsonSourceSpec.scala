package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.ingest.Fixture
import graft.schema.Schemas

/** DataSourceV2 block-JSON connector: row parity with the
  * text+from_json path, column pruning reaching the scan, exact
  * slot-filter pushdown, and per-file partition planning.
  */
class BlockJsonSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-blocks")
    Files.write(d.resolve("blocks-000.jsonl"),
      Fixture.block1.getBytes("UTF-8"))
    Files.write(d.resolve("blocks-001.jsonl"),
      Fixture.block2.getBytes("UTF-8"))
    // hidden/metadata files must be ignored by planning
    Files.write(d.resolve("_SUCCESS"), Array.empty[Byte])
    Files.write(d.resolve(".crc"), Array.empty[Byte])
    d.toString
  }

  private def ds: DataFrame =
    spark.read.format("graft.sources.BlockJsonSource").load(dir)

  private def viaFromJson: DataFrame =
    spark.read.text(dir)
      .select(from_json(col("value"), Schemas.blockSchema).as("b"))
      .select("b.*")

  private def scanOf(df: DataFrame) =
    df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan
    }.getOrElse(fail("no BatchScan in the executed plan"))

  test("full read matches the text+from_json composition row-for-row") {
    val got = ds.orderBy("slot").collect().toSeq
    val expect = viaFromJson.orderBy("slot").collect().toSeq
    assert(got == expect)
    assert(got.size == 2)
  }

  test("ingest over the connector yields the same tables as the text path") {
    import graft.ingest.Extract
    // the connector replaces parse()'s from_json half: exploding its
    // (slot, tx) pairs must agree with Extract.parse on the raw text
    val parsed = ds.select(col("slot"), explode(col("transactions")).as("tx"))
    val expected = Extract.parse(spark.read.text(dir).toDF("json"))
    assert(Extract.tx(parsed).orderBy("tx_id").collect().toSeq ==
      Extract.tx(expected).orderBy("tx_id").collect().toSeq)
  }

  test("column pruning reaches the scan (ReadSchema is the projection)") {
    val df = ds.select("slot", "height")
    val schema = scanOf(df).readSchema()
    assert(schema.fieldNames.toSeq == Seq("slot", "height"),
      s"scan read schema not pruned: $schema")
    assert(df.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
      == Seq((100L, 1L), (250000L, 2L)))
  }

  test("slot range filters push into the scan and evaluate exactly") {
    val df = ds.filter(col("slot") > 100L).select("slot")
    assert(scanOf(df).description().contains("GreaterThan(slot,100)"),
      s"slot filter not pushed: ${scanOf(df).description()}")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(250000L))
    // inclusive bound form too (ChainPoints.slotBounds uses <=)
    val both = ds.filter(col("slot") > 100L && col("slot") <= 250000L)
    assert(both.count() == 1)
    // a non-slot predicate stays residual and still evaluates correctly
    val res = ds.filter(col("height") === 2L)
    assert(!scanOf(res).description().contains("height"))
    assert(res.count() == 1)
  }

  test("partition planning is one partition per visible file") {
    val parts = ds.select("slot").rdd.getNumPartitions
    assert(parts == 2, s"expected 2 file partitions, got $parts")
  }
}
