package graft.ops

import org.apache.spark.sql.functions._

import graft.Q
import graft.ingest.{Extract, Fixture}

/** Cardano-fidelity queries: drive the full ingest analogue (block JSON
  * → 11 tables) inside the verified query surface. The fixture chain is
  * deterministic, so the expected per-table row counts and the fee sum
  * are constants the DuckDB oracle states literally.
  */
object CardanoQueries {

  val c01 = Q("c01_cardano_ingest",
    Fixture.expectedCounts
      .map { case (t, n) => s"SELECT '$t' AS tbl, CAST($n AS BIGINT) AS n" }
      .mkString("", " UNION ALL ", " ORDER BY tbl")
  ) { (spark, _) =>
    import spark.implicits._
    // one JSON parse shared by the ten per-table projections; the
    // fixture is 2 rows, so a single partition avoids 10 fan-out jobs
    val parsed = Extract.parse(Fixture.blocks.toDF("json").coalesce(1)).cache()
    // Union the LABELED ROWS first, then count in ONE aggregate — not
    // one grouped aggregate per table then union: that shape plans an
    // exchange per table (10 tiny stages of pure scheduling), while
    // this one plans a single exchange for the whole census. The left
    // join from the literal table list keeps empty tables at n=0 (a
    // grouped count over the union alone would drop them).
    val labeled = Extract.allTables(parsed)
      .map { case (t, df) => df.select(lit(t).as("tbl")) }
      .reduce(_ unionByName _)
      .groupBy("tbl").agg(count(lit(1)).as("n"))
    Extract.tableNames.toDF("tbl")
      .join(labeled, Seq("tbl"), "left")
      .select(col("tbl"), coalesce(col("n"), lit(0L)).as("n"))
      .orderBy("tbl")
  }

  val c02 = Q("c02_cardano_fees",
    // tx_fee sum/count over the extracted fixture: 500000+170000+0
    "SELECT CAST(3 AS BIGINT) AS n_tx, CAST(670000 AS BIGINT) AS total_fee, " +
      "CAST(2 AS BIGINT) AS n_paying"
  ) { (spark, _) =>
    import spark.implicits._
    val parsed = Extract.parse(Fixture.blocks.toDF("json"))
    Extract.tx(parsed).agg(
      count(lit(1)).as("n_tx"),
      sum(col("tx_fee")).as("total_fee"),
      count(when(col("tx_fee") > 0, 1)).as("n_paying"))
  }

  /** Fixture chain written once as block-JSON files — the input the
    * DataSourceV2 connector (c03) reads. Lazy so sessions that never run
    * c03 touch no disk.
    */
  private lazy val blocksDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-c03-blocks")
    java.nio.file.Files.write(d.resolve("blocks-000.jsonl"),
      Fixture.block1.getBytes("UTF-8"))
    java.nio.file.Files.write(d.resolve("blocks-001.jsonl"),
      Fixture.block2.getBytes("UTF-8"))
    d.toString
  }

  /** The DataSourceV2 connector surface (graft.sources.BlockJsonSource)
    * under the driver gate: per-file partition planning, slot-filter
    * pushdown (evaluated against the raw JSON scalar before any row is
    * built) and nested-projection pruning, over the same deterministic
    * fixture chain — so the oracle states the expected blocks literally.
    */
  val c03 = Q("c03_block_source",
    "SELECT CAST(100 AS BIGINT) AS slot, CAST(1 AS BIGINT) AS height, " +
      "CAST(1 AS BIGINT) AS n_tx " +
      "UNION ALL SELECT CAST(250000 AS BIGINT), CAST(2 AS BIGINT), " +
      "CAST(2 AS BIGINT) ORDER BY slot"
  ) { (spark, _) =>
    spark.read.format("graft.sources.BlockJsonSource").load(blocksDir)
      .filter(col("slot") >= 100L)
      .select(col("slot"), col("height"),
        size(col("transactions")).cast("long").as("n_tx"))
      .orderBy("slot")
  }

  // ---------------------------------------------------------------------
  // c04 — UTxO-set reconstruction / address balances at the chain tip:
  // the README community ask the reference documents but never built
  // (/root/reference/README.md:124-147 "balance/history"), realized with
  // the reference's own join pattern (inputs array resolved against
  // produced outputs, /root/reference/token_fee_analysis.py:215-227):
  // unspent = outputs ANTI JOIN exploded spend outpoints on the
  // composite (tx_id, output_index) key, then balance per address. At
  // 100 TB both sides shuffle once on the outpoint key (or zero times
  // from bucketed storage); the fixture chain is deterministic so the
  // oracle states the expected balances literally.
  // ---------------------------------------------------------------------
  val c04 = Q("c04_utxo_balances",
    Seq(("addr1dat", 1L, 1L), ("addr1q", 999L, 1L),
      ("addr1tok", 1500000L, 1L), ("addr1xyz", 2000000L, 1L))
      .map { case (a, b, n) =>
        s"SELECT '$a' AS address, CAST($b AS BIGINT) AS balance, " +
          s"CAST($n AS BIGINT) AS n_utxos"
      }
      .mkString("", " UNION ALL ", " ORDER BY address")
  ) { (spark, _) =>
    import spark.implicits._
    val parsed = Extract.parse(Fixture.blocks.toDF("json").coalesce(1))
    val utxo = Extract.utxo(parsed)
    val spent = Extract.tx(parsed)
      .select(explode(col("inputs")).as("in"))
      .select(col("in.tx_id").as("s_tx"), col("in.output_index").as("s_idx"))
    utxo
      .join(spent, utxo("tx_id") === col("s_tx") &&
        utxo("output_index") === col("s_idx"), "left_anti")
      .groupBy("address")
      .agg(sum(col("lovelace")).as("balance"),
        count(lit(1)).cast("long").as("n_utxos"))
      .orderBy("address")
  }

  val all: Seq[Q] = Seq(c01, c02, c03, c04)
}
