package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.Blake2b256
import graft.ingest.{CardanoWriter, Extract}
import graft.schema.Schemas

/** Drives the ingest analogue over a hand-built two-block fixture chain
  * covering every extractor family, and the slot-group-partitioned
  * writer roundtrip with partition pruning.
  */
class ExtractSpec extends SparkSpec {
  import spark.implicits._

  import graft.ingest.Fixture
  import Fixture.{hx, txA, txC, policy, datumHashHex, inlineDatumHex}
  private val spent = Fixture.spentTx

  private lazy val parsed =
    Extract.parse(Fixture.blocks.toDF("json")).cache()

  private def hex(bs: Array[Byte]): String = bs.map("%02x".format(_)).mkString

  test("compact merges a slot group's micro-batch files, preserving rows") {
    import graft.ingest.Fixture
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString
    // two appends → at least two file sets in each touched slot group
    val tx = Extract.tx(parsed)
    CardanoWriter.write(tx, dir, "tx", mode = "append")
    CardanoWriter.write(tx, dir, "tx", mode = "append")
    def filesIn(group: String) = new java.io.File(s"$dir/tx/$group")
      .listFiles().filter(f => f.isFile && f.getName.endsWith(".parquet")).length
    def snapshot() = spark.read.parquet(s"$dir/tx")
      .collect()
      .map(r => (r.getAs[Long]("slot"), hex(r.getAs[Array[Byte]]("tx_id")),
        r.getAs[Long]("tx_fee")))
      .sorted.toSeq
    val before = snapshot()
    assert(filesIn("slot_group=0") >= 2)

    CardanoWriter.compact(spark, dir, "tx")
    assert(filesIn("slot_group=0") === 1)
    assert(filesIn("slot_group=200000") === 1)
    val after = snapshot()
    assert(after === before)
    // idempotent: second compaction is a no-op
    CardanoWriter.compact(spark, dir, "tx")
    assert(filesIn("slot_group=0") === 1)
  }

  test("chain-point presets resolve and bound an extraction run") {
    import graft.ingest.ChainPoints
    // every reference preset is present (config.py:32-73) + origin
    assert(ChainPoints.Presets.size === 11)
    assert(ChainPoints.resolve("last_byron").get.slot === 4492799L)
    assert(ChainPoints.resolve("LAST_BYRON").get.slot === 4492799L)
    // mixed-case preset names (the reference's exact spelling) resolve too
    assert(ChainPoints.resolve("snek_mint_plus_100K_blocks").get.slot === 92961183L)
    assert(ChainPoints.resolve("snek_mint_plus_100k_blocks").get.slot === 92961183L)
    assert(ChainPoints.resolve("12345").get === ChainPoints.ChainPoint(12345L, ""))
    assert(ChainPoints.resolve("nonsense") === None)

    // find_intersection semantics: start-exclusive, stop-inclusive —
    // a run from point(slot=100) keeps ONLY blocks after block1
    val from = Some(ChainPoints.ChainPoint(100L, ""))
    val bounded = parsed.filter(ChainPoints.slotBounds(from, None)(col("slot")))
    assert(bounded.select("slot").distinct().collect().map(_.getLong(0)).toSeq
      === Seq(250000L))
    // ... and a stop at 250000 includes that block
    val both = parsed.filter(ChainPoints.slotBounds(
      from, Some(ChainPoints.ChainPoint(250000L, "")))(col("slot")))
    assert(both.count() === 2) // block2's two txs
    // origin → everything
    val all = parsed.filter(ChainPoints.slotBounds(
      Some(ChainPoints.Origin), None)(col("slot")))
    assert(all.count() === parsed.count())
  }

  test("tx extraction: counts, flags, fee, nested inputs array") {
    val rows = Extract.tx(parsed).orderBy("slot").collect()
    assert(rows.length === 3)
    val a = rows(0)
    assert(hex(a.getAs[Array[Byte]]("tx_id")) === txA)
    assert(a.getAs[Long]("tx_fee") === 500000L)
    assert(a.getAs[Int]("input_count") === 1)
    assert(a.getAs[Int]("output_count") === 3)
    assert(a.getAs[Int]("redeemer_count") === 1)
    assert(a.getAs[Int]("witness_datum_count") === 1)
    assert(a.getAs[Boolean]("has_mint") && a.getAs[Boolean]("has_cert"))
    assert(!a.getAs[Boolean]("has_withdrawal"))
    assert(a.getAs[Boolean]("has_vote") && a.getAs[Boolean]("has_proposal"))
    val inputs = a.getSeq[Row](a.fieldIndex("inputs"))
    assert(inputs.length === 1)
    assert(hex(inputs.head.getAs[Array[Byte]]("tx_id")) === spent)
    assert(inputs.head.getAs[Int]("output_index") === 1)
    // minimal tx: missing fee → 0, empty inputs array (not null)
    val c = rows.find(r => hex(r.getAs[Array[Byte]]("tx_id")) === txC).get
    assert(c.getAs[Long]("tx_fee") === 0L)
    assert(c.getSeq[Row](c.fieldIndex("inputs")) !== null)
  }

  test("utxo extraction: per-output rows with token/datum/script flags") {
    val rows = Extract.utxo(parsed)
      .filter(hex(col("tx_id")) === txA).orderBy("output_index").collect()

    assert(rows.length === 3)
    assert(rows(0).getAs[Long]("lovelace") === 2000000L)
    assert(!rows(0).getAs[Boolean]("has_token") && !rows(0).getAs[Boolean]("has_datum"))
    assert(rows(1).getAs[Boolean]("has_token") && rows(1).getAs[Boolean]("has_datum"))
    assert(rows(1).getAs[String]("address") === "addr1tok")
    assert(rows(2).getAs[Boolean]("has_datum") && !rows(2).getAs[Boolean]("has_token"))
  }

  test("mint extraction: map flatten preserves signed burn quantities") {
    val rows = Extract.mint(parsed).collect()
      .map(r => (hex(r.getAs[Array[Byte]]("asset_name")), r.getAs[Long]("quantity")))
      .toMap
    assert(rows === Map("746f6b656e" -> 42L, "6275726e" -> -7L))
  }

  test("asset extraction: only non-ADA policies, address duplicated") {
    val rows = Extract.asset(parsed).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(hex(r.getAs[Array[Byte]]("policy_id")) === policy)
    assert(r.getAs[Long]("amount") === 42L)
    assert(r.getAs[String]("address") === "addr1tok")
    assert(r.getAs[Int]("output_index") === 1)
  }

  test("datum extraction: verbatim hash vs blake2b-256 of inline CBOR") {
    val rows = Extract.datum(parsed).orderBy("output_index").collect()
    assert(rows.length === 2)
    assert(hex(rows(0).getAs[Array[Byte]]("datum_hash")) === datumHashHex)
    assert(!rows(0).getAs[Boolean]("is_inline"))
    assert(rows(0).getAs[Array[Byte]]("inline_datum") === null)
    val expected = Blake2b256.digest(
      inlineDatumHex.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray)
    assert(hex(rows(1).getAs[Array[Byte]]("datum_hash")) === hex(expected))
    assert(rows(1).getAs[Boolean]("is_inline"))
  }

  test("certificate extraction: base table plus all four family tables") {
    assert(Extract.cert(parsed).count() === 4)

    val st = Extract.certStake(parsed).collect()
    assert(st.length === 1)
    assert(st.head.getAs[String]("pool_id") === "pool1abc")
    assert(st.head.getAs[String]("drep_id") === "drep1xyz")
    assert(hex(st.head.getAs[Array[Byte]]("credential")) === hx("11", 28))

    val p = Extract.certPool(parsed).collect().head
    assert(p.getAs[Long]("margin_numerator") === 3L)
    assert(p.getAs[Long]("margin_denominator") === 100L)
    assert(p.getAs[Long]("pledge") === 1000000L)
    assert(p.getAs[String]("metadata_url") === "https://pool.example/m.json")

    val cc = Extract.certCc(parsed).collect().head
    assert(hex(cc.getAs[Array[Byte]]("member_id")) === hx("22", 28))
    assert(hex(cc.getAs[Array[Byte]]("delegate_id")) === hx("33", 28))

    val d = Extract.certDrep(parsed).collect().head
    assert(d.getAs[String]("drep_type") === "verificationKey")
    assert(d.getAs[String]("metadata_url") === "https://drep.example")
  }

  test("governance extraction: vote, proposal, redeemer tables") {
    val v = Extract.vote(parsed).collect()
    assert(v.length === 1)
    assert(hex(v.head.getAs[Array[Byte]]("tx_id")) === txA)
    assert(v.head.getAs[String]("voter") === "delegateRepresentative:drep1xyz")
    assert(hex(v.head.getAs[Array[Byte]]("action_id_tx")) === hx("66", 32))
    assert(v.head.getAs[Int]("action_id_index") === 0)
    assert(v.head.getAs[Int]("vote") === 1) // yes
    assert(v.head.getAs[String]("anchor") === "https://vote.example")

    val p = Extract.proposal(parsed).collect()
    assert(p.length === 1)
    assert(p.head.getAs[Int]("proposal_index") === 0)
    assert(p.head.getAs[Long]("deposit") === 100000000000L)
    assert(p.head.getAs[String]("return_account") === "stake1ret")
    assert(p.head.getAs[Int]("type") === 2) // treasuryWithdrawals
    assert(p.head.getAs[String]("anchor") === "https://prop.example")

    val r = Extract.redeemer(parsed).collect()
    assert(r.length === 1)
    assert(r.head.getAs[Int]("tag") === 0) // spend
    assert(r.head.getAs[Int]("redeemer_index") === 0)
    assert(hex(r.head.getAs[Array[Byte]]("data")) === "9f01ff")
    assert(r.head.getAs[Long]("mem") === 1000L)
    assert(r.head.getAs[Long]("steps") === 500000L)
  }

  test("extracted frames conform to the declared Cardano schemas") {
    Extract.allTables(parsed).foreach { case (name, df) =>
      val declared = Schemas.cardanoTables(name)
      assert(df.schema.fields.map(f => f.name -> f.dataType).toSeq ===
        declared.fields.map(f => f.name -> f.dataType).toSeq, s"table $name")
    }
  }

  test("slot-group partitioned write: layout, roundtrip, partition pruning") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cardano").toString
    CardanoWriter.write(Extract.tx(parsed), dir, "tx")
    val groups = new java.io.File(s"$dir/tx").listFiles()
      .filter(_.isDirectory).map(_.getName).sorted
    assert(groups.toSeq === Seq("slot_group=0", "slot_group=200000"))

    val back = CardanoWriter.read(spark, dir, "tx")
    assert(back.count() === 3)

    // slot range entirely inside the second group: the scan must only
    // touch that partition's files
    val pruned = CardanoWriter.readSlotRange(spark, dir, "tx",
      minSlot = Some(240000L), maxSlot = None)
    assert(pruned.count() === 2)
    // inspect the physical scan: only the second group's files selected
    val scanned: Seq[String] =
      pruned.queryExecution.executedPlan.collectLeaves().flatMap {
        case f: org.apache.spark.sql.execution.FileSourceScanExec =>
          f.selectedPartitions.toPartitionArray.toSeq.map(_.filePath.toString)
        case _ => Seq.empty
      }
    assert(scanned.nonEmpty)
    assert(scanned.forall(_.contains("slot_group=200000")), scanned.mkString(","))
  }

  test("overwriteSlotGroups replaces only the touched partitions (rollback remedy)") {
    import org.apache.spark.sql.functions.{col, lit}
    val dir = java.nio.file.Files.createTempDirectory("graft-reorg").toString
    CardanoWriter.write(Extract.tx(parsed), dir, "tx") // groups 0 and 200000
    // "reorg" of the second group: re-extract block2 with one tx dropped
    val reparsed = Extract.parse(Seq(Fixture.block2).toDF("json"))
    val fixed = Extract.tx(reparsed).filter(hex(col("tx_id")) === Fixture.txB)
    CardanoWriter.overwriteSlotGroups(fixed, dir, "tx")
    val back = CardanoWriter.read(spark, dir, "tx")
    // group 0 untouched (1 tx), group 200000 rewritten (2 txs -> 1)
    assert(back.filter(col("slot_group") === 0).count() === 1)
    assert(back.filter(col("slot_group") === lit(200000)).count() === 1)
    assert(back.count() === 2)
  }

  private def hex(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    lower(org.apache.spark.sql.functions.hex(c))
}