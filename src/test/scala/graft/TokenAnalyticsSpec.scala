package graft

import org.apache.spark.sql.Row

import graft.api.TokenAnalytics
import graft.ingest.{Extract, Fixture}

/** Drives the user-facing token-transfer analysis over an extracted
  * chain with a real ownership story:
  *
  *   txA mints the token to addr1tok           → kept (mint: NULL ≠ set)
  *   txD spends (txA,1), sends to addr1new     → kept (ownership change)
  *   txE spends (txD,0), back to addr1new      → dropped (same owner)
  */
class TokenAnalyticsSpec extends SparkSpec {
  import spark.implicits._
  import Fixture.{hx, policy, txA}

  private val txD = hx("d0", 32)
  private val txE = hx("e0", 32)
  private val tokenHex = "746f6b656e"

  private val block3 =
    s"""{"slot": 300, "id": "${hx("03", 32)}", "transactions": [
       |  {"id": "$txD", "fee": {"ada": {"lovelace": 200000}},
       |   "inputs": [{"transaction": {"id": "$txA"}, "index": 1}],
       |   "outputs": [{"address": "addr1new",
       |     "value": {"ada": {"lovelace": 1400000}, "$policy": {"$tokenHex": 42}}}]}
       |]}""".stripMargin.replaceAll("\n", " ")

  private val block4 =
    s"""{"slot": 400, "id": "${hx("04", 32)}", "transactions": [
       |  {"id": "$txE", "fee": {"ada": {"lovelace": 180000}},
       |   "inputs": [{"transaction": {"id": "$txD"}, "index": 0}],
       |   "outputs": [{"address": "addr1new",
       |     "value": {"ada": {"lovelace": 1200000}, "$policy": {"$tokenHex": 42}}}]}
       |]}""".stripMargin.replaceAll("\n", " ")

  private lazy val parsed =
    Extract.parse((Fixture.blocks ++ Seq(block3, block4)).toDF("json")).cache()
  private lazy val tx = Extract.tx(parsed)
  private lazy val asset = Extract.asset(parsed)

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString

  test("findTokenTransfers keeps mints and ownership changes, drops same-owner moves") {
    val rows = TokenAnalytics
      .findTokenTransfers(tx, asset, policy, Some(tokenHex))
      .collect()
    val byTx = rows.map(r => hex(r.getAs[Array[Byte]]("tx_id")) -> r).toMap

    assert(byTx.keySet === Set(txA, txD))
    // mint: no token inputs → NULL input set, kept by IS DISTINCT FROM
    assert(byTx(txA).isNullAt(byTx(txA).fieldIndex("input_addr_set")))
    assert(byTx(txA).getSeq[String](byTx(txA).fieldIndex("output_addr_set"))
      === Seq("addr1tok"))
    // transfer: addr1tok → addr1new
    assert(byTx(txD).getSeq[String](byTx(txD).fieldIndex("input_addr_set"))
      === Seq("addr1tok"))
    assert(byTx(txD).getSeq[String](byTx(txD).fieldIndex("output_addr_set"))
      === Seq("addr1new"))
    // slot-ascending order
    assert(rows.map(_.getAs[Long]("slot")).toSeq === rows.map(_.getAs[Long]("slot")).sorted.toSeq)
  }

  test("slot range filter prunes transfers") {
    val rows = TokenAnalytics
      .findTokenTransfers(tx, asset, policy, Some(tokenHex),
        minSlot = Some(200L), maxSlot = Some(350L))
      .collect()
    assert(rows.length === 1)
    assert(hex(rows.head.getAs[Array[Byte]]("tx_id")) === txD)
    // with only (txD,0,addr1new) in range, txD's input outpoint (txA,1)
    // no longer resolves → NULL input set vs [addr1new]
    assert(rows.head.isNullAt(rows.head.fieldIndex("input_addr_set")))
  }

  test("analyzeTokenFees folds the pandas post-stats into one agg") {
    val stats = TokenAnalytics.analyzeTokenFees(tx, asset, policy, Some(tokenHex))
    assert(stats.totalTransactions === 2)
    assert(stats.totalFeesLovelace === 700000L) // 500000 (txA) + 200000 (txD)
    assert(stats.avgFeeLovelace === 350000.0)
    assert(stats.minSlot === Some(100L))
    assert(stats.maxSlot === Some(300L))
  }

  test("analyzeTokenFees on a token with no UTxOs returns the empty stats") {
    val stats = TokenAnalytics.analyzeTokenFees(tx, asset, hx("99", 28), Some("00"))
    assert(stats === TokenAnalytics.TokenFeeStats(0L, 0L, 0.0, None, None))
  }

  test("registry internal consistency: asset units = token policy ++ asset name") {
    import graft.api.Registry
    // the KNOWN_ASSETS units (config.py:88-92) are the concatenated
    // (policy id ++ asset name) of the corresponding KNOWN_TOKENS entry
    Seq("snek", "hosky").foreach { name =>
      val t = Registry.KnownTokens(name)
      assert(Registry.KnownAssets(name) === t.policyIdHex + t.assetNameHex, name)
      assert(t.policyIdHex.length === 56, s"$name: policy id must be 28 bytes")
      assert(t.policyIdHex.matches("[0-9a-f]+") && t.assetNameHex.matches("[0-9a-f]+"))
    }
    assert(Registry.KnownAssets("ada") === "") // ADA is the empty unit
    Registry.KnownAddresses.values.foreach(a => assert(a.startsWith("addr1")))
  }

  test("named-token registry resolves hosky/snek case-insensitively; unknown → None") {
    import graft.api.Registry
    val hosky = Registry.tokenInfo("HOSKY")
    assert(hosky === Some(Registry.TokenInfo(
      "a0028f350aaabe0545fdcb56b039bfb08e4bb4d8c4d7c3c7d481c235", "484f534b59")))
    assert(Registry.tokenInfo("snek").isDefined)
    assert(Registry.tokenInfo("dogecoin") === None)
    assert(TokenAnalytics.analyzeTokenFeesByName(tx, asset, "dogecoin") === None)
  }

  test("findTokenTransfersByName runs the analysis from a token name") {
    import graft.api.Registry
    val h = Registry.KnownTokens("hosky")
    // a chain where the real HOSKY unit is minted then moved
    val txH1 = hx("a1", 32); val txH2 = hx("a2", 32)
    val b1 =
      s"""{"slot": 500, "id": "${hx("05", 32)}", "transactions": [
         |  {"id": "$txH1", "fee": {"ada": {"lovelace": 300000}}, "inputs": [],
         |   "outputs": [{"address": "addr1whale",
         |     "value": {"ada": {"lovelace": 1000000}, "${h.policyIdHex}": {"${h.assetNameHex}": 7}}}]}
         |]}""".stripMargin.replaceAll("\n", " ")
    val b2 =
      s"""{"slot": 600, "id": "${hx("06", 32)}", "transactions": [
         |  {"id": "$txH2", "fee": {"ada": {"lovelace": 250000}},
         |   "inputs": [{"transaction": {"id": "$txH1"}, "index": 0}],
         |   "outputs": [{"address": "addr1shrimp",
         |     "value": {"ada": {"lovelace": 900000}, "${h.policyIdHex}": {"${h.assetNameHex}": 7}}}]}
         |]}""".stripMargin.replaceAll("\n", " ")
    val p = Extract.parse(Seq(b1, b2).toDF("json"))
    val rows = TokenAnalytics
      .findTokenTransfersByName(Extract.tx(p), Extract.asset(p), "Hosky")
      .get.collect()
    assert(rows.map(r => hex(r.getAs[Array[Byte]]("tx_id"))).toSet === Set(txH1, txH2))
    val stats = TokenAnalytics
      .analyzeTokenFeesByName(Extract.tx(p), Extract.asset(p), "hosky").get
    assert(stats.totalTransactions === 2)
    assert(stats.totalFeesLovelace === 550000L)
  }

  test("typed Dataset surface maps transfers to case classes, mint input set = None") {
    val ds = TokenAnalytics.findTokenTransfersTyped(tx, asset, policy, Some(tokenHex))
    val byTx = ds.collect().map(t => hex(t.tx_id) -> t).toMap
    assert(byTx.keySet === Set(txA, txD))
    assert(byTx(txA).input_addr_set === None) // mint
    assert(byTx(txA).output_addr_set === Some(Seq("addr1tok")))
    assert(byTx(txD).input_addr_set === Some(Seq("addr1tok")))
    assert(byTx(txD).tx_fee === 200000L)
  }

  test("transferTypeBreakdown splits mint (null input set) from transfer") {
    val transfers = TokenAnalytics.findTokenTransfers(tx, asset, policy, Some(tokenHex))
    val rows = TokenAnalytics.transferTypeBreakdown(transfers).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(rows === Map(
      "mint" -> (1L, 500000L), // txA
      "transfer" -> (1L, 200000L))) // txD
  }

  test("transfersForCsv renders a CSV-safe frame and writeCsv round-trips it") {
    val transfers = TokenAnalytics.findTokenTransfers(tx, asset, policy, Some(tokenHex))
    val csvDf = TokenAnalytics.transfersForCsv(transfers)
    assert(csvDf.columns.toSeq ===
      Seq("slot", "tx_id", "tx_fee", "input_addr_set", "output_addr_set"))
    val out = java.nio.file.Files.createTempDirectory("graft-csv").toString + "/transfers"
    graft.io.Tables.writeCsv(csvDf, out)
    val back = spark.read.option("header", "true").csv(out).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(3), r.getString(4)))
      .sortBy(_._1)
    assert(back.length === 2)
    assert(back(0) === ("100", txA, null, "addr1tok")) // mint: null input set
    assert(back(1) === ("300", txD, "addr1tok", "addr1new"))
  }

  test("highFeeTransactions and feeStatistics mirror the main.py query") {
    val top = TokenAnalytics.highFeeTransactions(tx, minFeeLovelace = 150000L, k = 2)
      .collect()
    assert(top.map(_.getAs[Long]("tx_fee")).toSeq === Seq(500000L, 200000L))
    val s = TokenAnalytics.feeStatistics(tx, minFeeLovelace = 150000L).collect()(0)
    assert(s.getAs[Long]("count") === 4L) // txA, txB, txD, txE
    assert(s.getAs[Long]("max_fee") === 500000L)
    assert(s.getAs[Long]("min_fee") === 170000L)
  }
}
