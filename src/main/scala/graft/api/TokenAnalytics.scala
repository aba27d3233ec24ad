package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Functions.rangeFilter

/** The user-facing analytics API over the Cardano tables — the
  * capability surface of the reference's `TokenFeeAnalyzer` and
  * `main.py query` CLI, re-expressed as DataFrame programs over tables
  * produced by `graft.ingest` (or any parquet with the same schemas).
  *
  * Where the reference builds SQL strings over DuckDB views
  * (/root/reference/token_fee_analysis.py:107-252, main.py:21-65), each
  * step here is a composable DataFrame: Catalyst pushes the token
  * predicate and column pruning into the asset scan (the reference's
  * manual "temp view with only the required columns" optimization,
  * :142-151, is automatic), and slot predicates prune slot-group
  * partitions before any I/O.
  */
object TokenAnalytics {

  /** Summary statistics of `analyzeTokenFees` — the reference's result
    * dict (/root/reference/token_fee_analysis.py:330-343).
    */
  final case class TokenFeeStats(
      totalTransactions: Long,
      totalFeesLovelace: Long,
      avgFeeLovelace: Double,
      minSlot: Option[Long],
      maxSlot: Option[Long])

  /** UTxOs holding the given token, optionally slot-bounded — the
    * pre-filtered projection of token_fee_analysis.py:107-152. Note the
    * reference renders an empty asset name as `= NULL` (matches
    * nothing, :131); we expose the sane isNull semantics via
    * `assetName = None` and document the quirk (SURVEY.md §2.2 P6).
    */
  def tokenUtxos(asset: DataFrame, policyIdHex: String,
      assetNameHex: Option[String], minSlot: Option[Long] = None,
      maxSlot: Option[Long] = None): DataFrame = {
    val assetPred = assetNameHex match {
      case Some(hex) => col("asset_name") === unhex(lit(hex))
      case None => col("asset_name").isNull
    }
    asset
      .filter(col("policy_id") === unhex(lit(policyIdHex)) && assetPred &&
        rangeFilter(col("slot"), minSlot.map(lit(_)), maxSlot.map(lit(_))))
      .select("tx_id", "output_index", "address")
  }

  /** The flagship: transactions whose sorted-distinct token-holding
    * input address set differs (null-safely) from the output address
    * set — token ownership changes
    * (/root/reference/token_fee_analysis.py:154-261).
    *
    * Output: (slot, tx_id, tx_fee, input_addr_set, output_addr_set),
    * slot-ascending. The token-UTxO side broadcasts when small (the
    * usual case for a single asset) — but it is data-dependent (a
    * popular token's UTxO set grows with the chain), so the choice is
    * left to AQE's runtime sizing rather than a static hint: at 100 TB
    * a hot asset degrades to a shuffled join instead of OOMing the
    * driver.
    */
  def findTokenTransfers(tx: DataFrame, asset: DataFrame,
      policyIdHex: String, assetNameHex: Option[String],
      minSlot: Option[Long] = None, maxSlot: Option[Long] = None): DataFrame = {
    val tu = tokenUtxos(asset, policyIdHex, assetNameHex, minSlot, maxSlot)

    // relevant_txs: txs that created a token output (IN-subquery ≡ semi join)
    val relevant = tx
      .join(tu.select("tx_id").distinct(), Seq("tx_id"), "left_semi")
      .select("slot", "tx_id", "tx_fee", "inputs")

    // input_addresses: UNNEST(inputs) resolved against token UTxOs on the
    // composite outpoint key, canonicalized to a sorted-distinct set,
    // grouped by the CONSUMING tx (in.tx_id is the spent outpoint's tx)
    val inAddr = relevant
      .select(col("tx_id").as("consumer_tx"), explode(col("inputs")).as("in"))
      .join(tu,
        col("in.tx_id") === tu("tx_id") &&
          col("in.output_index") === tu("output_index"))
      .groupBy("consumer_tx")
      .agg(sort_array(collect_set(col("address"))).as("input_addr_set"))
      .withColumnRenamed("consumer_tx", "tx_id")

    val outAddr = tu.groupBy("tx_id")
      .agg(sort_array(collect_set(col("address"))).as("output_addr_set"))

    relevant
      .join(inAddr, Seq("tx_id"), "left")
      .join(outAddr, Seq("tx_id"), "left")
      .filter(!(col("input_addr_set") <=> col("output_addr_set")))
      .select("slot", "tx_id", "tx_fee", "input_addr_set", "output_addr_set")
      .orderBy(col("slot").asc)
  }

  /** Fee statistics over the transfers — the pandas post-aggregation
    * (/root/reference/token_fee_analysis.py:310-329) folded into one
    * distributed agg; only the 5 scalars reach the driver.
    */
  def analyzeTokenFees(tx: DataFrame, asset: DataFrame, policyIdHex: String,
      assetNameHex: Option[String], minSlot: Option[Long] = None,
      maxSlot: Option[Long] = None): TokenFeeStats =
    feeStats(findTokenTransfers(tx, asset, policyIdHex, assetNameHex,
      minSlot, maxSlot))

  /** The same statistics over an already-computed transfer frame (so a
    * caller materializing transfers once — e.g. the CLI showing, CSV-ing
    * AND summarizing them — doesn't recompute the pipeline).
    */
  def feeStats(transfers: DataFrame): TokenFeeStats = {
    val row = transfers.agg(
      count(lit(1)).as("n"),
      coalesce(sum("tx_fee"), lit(0L)).as("total"),
      avg("tx_fee").as("avg"),
      min("slot").as("minSlot"),
      max("slot").as("maxSlot")).collect()(0)
    TokenFeeStats(
      totalTransactions = row.getAs[Long]("n"),
      totalFeesLovelace = row.getAs[Long]("total"),
      avgFeeLovelace = if (row.isNullAt(2)) 0.0 else row.getAs[Double]("avg"),
      minSlot = if (row.isNullAt(3)) None else Some(row.getAs[Long]("minSlot")),
      maxSlot = if (row.isNullAt(4)) None else Some(row.getAs[Long]("maxSlot")))
  }

  /** Name-based entry — the reference's `analyze_token_fees("hosky")`
    * path (/root/reference/token_fee_analysis.py:283-307): resolve a
    * well-known token name via the curated registry and run the
    * transfer analysis. None when the name is unknown (the caller falls
    * back to raw hex, where the reference raises).
    */
  def findTokenTransfersByName(tx: DataFrame, asset: DataFrame, name: String,
      minSlot: Option[Long] = None, maxSlot: Option[Long] = None): Option[DataFrame] =
    Registry.tokenInfo(name).map { t =>
      findTokenTransfers(tx, asset, t.policyIdHex, Some(t.assetNameHex),
        minSlot, maxSlot)
    }

  def analyzeTokenFeesByName(tx: DataFrame, asset: DataFrame, name: String,
      minSlot: Option[Long] = None, maxSlot: Option[Long] = None): Option[TokenFeeStats] =
    Registry.tokenInfo(name).map { t =>
      analyzeTokenFees(tx, asset, t.policyIdHex, Some(t.assetNameHex),
        minSlot, maxSlot)
    }

  /** CSV-friendly rendering of the transfer frame — the reference's
    * `transfers.to_csv(...)` detail export
    * (/root/reference/token_fee_analysis.py:346-350): binary tx_id →
    * lower-case hex, address sets → ';'-joined strings (CSV has no
    * array type), routed through the S7 sink (`Tables.writeCsv`).
    */
  def transfersForCsv(transfers: DataFrame): DataFrame =
    transfers.select(
      col("slot"),
      lower(hex(col("tx_id"))).as("tx_id"),
      col("tx_fee"),
      concat_ws(";", col("input_addr_set")).as("input_addr_set"),
      concat_ws(";", col("output_addr_set")).as("output_addr_set"))

  /** One ownership-changing transaction — the typed row of
    * [[findTokenTransfersTyped]].
    */
  final case class TokenTransfer(
      slot: Long,
      tx_id: Array[Byte],
      tx_fee: Long,
      input_addr_set: Option[Seq[String]],
      output_addr_set: Option[Seq[String]])

  /** The flagship as a typed `Dataset[TokenTransfer]` — the
    * case-class-Encoder surface for callers that want compile-time
    * field safety over the transfer frame (downstream Scala pipelines,
    * not SQL). Same plan as [[findTokenTransfers]]; the Encoder maps
    * columns by name, and the NULL input set of a mint becomes None.
    */
  def findTokenTransfersTyped(tx: DataFrame, asset: DataFrame,
      policyIdHex: String, assetNameHex: Option[String],
      minSlot: Option[Long] = None, maxSlot: Option[Long] = None)
      : org.apache.spark.sql.Dataset[TokenTransfer] = {
    val df = findTokenTransfers(tx, asset, policyIdHex, assetNameHex,
      minSlot, maxSlot)
    import df.sparkSession.implicits._
    df.as[TokenTransfer]
  }

  /** Per-transfer-type fee breakdown — the reference's conditional
    * `transfer_type` groupby (/root/reference/token_fee_analysis.py:
    * 317-325; its own query never materializes the column, so the
    * breakdown is always empty there). Here the type is derived from
    * the transfer itself: a NULL input address set means the token came
    * from nowhere (`mint`); anything else is an ownership `transfer`.
    */
  def transferTypeBreakdown(transfers: DataFrame): DataFrame =
    transfers
      .withColumn("transfer_type",
        when(col("input_addr_set").isNull, "mint").otherwise("transfer"))
      .groupBy("transfer_type")
      .agg(count(lit(1)).as("count"), sum("tx_fee").as("total_fee"),
        avg("tx_fee").as("avg_fee"))
      .orderBy("transfer_type")

  /** `main.py query` part 1: top-K transactions by fee above a threshold
    * (/root/reference/main.py:24-38), with a deterministic tiebreak.
    */
  def highFeeTransactions(tx: DataFrame, minFeeLovelace: Long = 2000000L,
      k: Int = 100): DataFrame =
    tx.filter(col("tx_fee") > minFeeLovelace)
      .select("slot", "tx_id", "tx_fee", "input_count", "output_count")
      .orderBy(col("tx_fee").desc, col("slot").asc, col("tx_id").asc)
      .limit(k)

  /** `main.py query` part 2: the 4-way ungrouped fee aggregate
    * (/root/reference/main.py:45-57).
    */
  def feeStatistics(tx: DataFrame, minFeeLovelace: Long = 2000000L): DataFrame =
    tx.filter(col("tx_fee") > minFeeLovelace)
      .agg(count(lit(1)).as("count"), avg("tx_fee").as("avg_fee"),
        max("tx_fee").as("max_fee"), min("tx_fee").as("min_fee"))
}
