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
    Extract.allTables(parsed)
      .map { case (t, df) => df.groupBy(lit(t).as("tbl")).agg(count(lit(1)).as("n")) }
      .reduce(_ unionByName _)
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

  val all: Seq[Q] = Seq(c01, c02)
}
