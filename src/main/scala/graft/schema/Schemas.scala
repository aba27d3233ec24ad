package graft.schema

import org.apache.spark.sql.types._

/** Explicit StructTypes for the eleven Cardano tables, mapped from the
  * reference's PyArrow schemas (/root/reference/ogmios_parquet.py:14-173)
  * per the type mapping in SURVEY.md §1.3:
  *
  *  - fixed/variable binary → BinaryType (length is a data-quality
  *    check, not a type — Spark has no fixed-length binary)
  *  - uint64 → LongType (all real values < 2^63: max ADA supply
  *    4.5e16 lovelace), uint16 → IntegerType
  *  - dictionary-encoded strings → StringType (dictionary encoding is a
  *    parquet page encoding, on by default in Spark's writer)
  *
  * Plus the input contract: the Ogmios-style chain-sync block JSON the
  * ingest analogue parses (field shapes per the extractors at
  * /root/reference/ogmios_parquet.py:227-486).
  */
object Schemas {

  private def f(name: String, t: DataType) = StructField(name, t, nullable = true)

  val inputRef: StructType = StructType(Seq(
    f("tx_id", BinaryType), f("output_index", IntegerType)))

  /** tx — /root/reference/ogmios_parquet.py:25-52 */
  val tx: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("tx_fee", LongType),
    f("input_count", IntegerType), f("output_count", IntegerType),
    f("redeemer_count", IntegerType), f("witness_datum_count", IntegerType),
    f("has_mint", BooleanType), f("has_withdrawal", BooleanType),
    f("has_cert", BooleanType), f("has_vote", BooleanType),
    f("has_proposal", BooleanType),
    f("inputs", ArrayType(inputRef))))

  /** tx_raw — /root/reference/ogmios_parquet.py:17-23 (extraction exists
    * but is disabled in the reference, :693-695; schema kept for parity).
    */
  val txRaw: StructType = StructType(Seq(
    f("tx_id", BinaryType), f("slot", LongType), f("raw_cbor", BinaryType)))

  /** utxo — /root/reference/ogmios_parquet.py:54-67 */
  val utxo: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("output_index", IntegerType),
    f("address", StringType), f("lovelace", LongType),
    f("has_token", BooleanType), f("has_datum", BooleanType),
    f("has_ref_script", BooleanType)))

  /** mint — /root/reference/ogmios_parquet.py:69-78 (quantity signed:
    * burns are negative).
    */
  val mint: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("policy_id", BinaryType),
    f("asset_name", BinaryType), f("quantity", LongType)))

  /** asset — /root/reference/ogmios_parquet.py:80-91 (address duplicated
    * by design, README.md:59-61 — the flagship query needs it).
    */
  val asset: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("output_index", IntegerType),
    f("address", StringType), f("policy_id", BinaryType),
    f("asset_name", BinaryType), f("amount", LongType)))

  /** datum — /root/reference/ogmios_parquet.py:93-103 */
  val datum: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("output_index", IntegerType),
    f("datum_hash", BinaryType), f("is_inline", BooleanType),
    f("inline_datum", BinaryType)))

  /** cert — /root/reference/ogmios_parquet.py:105-112 */
  val cert: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("type", StringType)))

  /** cert_stake — /root/reference/ogmios_parquet.py:114-124 */
  val certStake: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("type", StringType),
    f("credential", BinaryType), f("pool_id", StringType),
    f("drep_id", StringType)))

  /** cert_pool — /root/reference/ogmios_parquet.py:126-142 */
  val certPool: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("type", StringType),
    f("pool_id", StringType), f("reward_account", StringType),
    f("pledge", LongType), f("margin_numerator", LongType),
    f("margin_denominator", LongType), f("cost", LongType),
    f("metadata_hash", BinaryType), f("metadata_url", StringType),
    f("retirement_epoch", LongType)))

  /** cert_cc — /root/reference/ogmios_parquet.py:144-156 */
  val certCc: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("type", StringType),
    f("member_id", BinaryType), f("delegate_id", BinaryType),
    f("metadata_hash", BinaryType), f("metadata_url", StringType)))

  /** cert_drep — /root/reference/ogmios_parquet.py:158-170 */
  val certDrep: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("type", StringType),
    f("drep_id", BinaryType), f("drep_type", StringType),
    f("metadata_hash", BinaryType), f("metadata_url", StringType)))

  /** vote — planned by the reference (README.md:74-80) but never
    * built there (no extractor exists); forward-parity table. `vote`
    * is the INT32 the reference's TODO asks for: no=0, yes=1,
    * abstain=2.
    */
  val vote: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("voter", StringType),
    f("action_id_tx", BinaryType), f("action_id_index", IntegerType),
    f("vote", IntegerType), f("anchor", StringType)))

  /** proposal — planned by the reference (README.md:82-88); `type` is
    * the INT32 code of the governance-action type (see
    * Extract.proposalTypeCode).
    */
  val proposal: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType),
    f("proposal_index", IntegerType), f("deposit", LongType),
    f("return_account", StringType), f("type", IntegerType),
    f("anchor", StringType)))

  /** redeemer — planned by the reference (README.md:98-104); `tag` is
    * the Plutus redeemer-tag code (spend=0, mint=1, publish=2,
    * withdraw=3, vote=4, propose=5 — the Conway ledger order).
    */
  val redeemer: StructType = StructType(Seq(
    f("slot", LongType), f("tx_id", BinaryType), f("tag", IntegerType),
    f("redeemer_index", IntegerType), f("data", BinaryType),
    f("mem", LongType), f("steps", LongType)))

  val cardanoTables: Map[String, StructType] = Map(
    "tx_raw" -> txRaw, "tx" -> tx, "utxo" -> utxo, "mint" -> mint,
    "asset" -> asset, "datum" -> datum, "cert" -> cert,
    "cert_stake" -> certStake, "cert_pool" -> certPool,
    "cert_cc" -> certCc, "cert_drep" -> certDrep,
    "vote" -> vote, "proposal" -> proposal, "redeemer" -> redeemer)

  // -------------------------------------------------------------------
  // Input contract: Ogmios-style chain-sync block JSON
  // -------------------------------------------------------------------

  private val lovelaceAmount = StructType(Seq(
    f("ada", StructType(Seq(f("lovelace", LongType))))))

  private val metadataRef = StructType(Seq(
    f("hash", StringType), f("url", StringType)))

  val certificateSchema: StructType = StructType(Seq(
    f("type", StringType),
    // NB: the reference reads `credential` from the *tx* object
    // (ogmios_parquet.py:401) — an apparent bug since Ogmios carries it
    // on the certificate; we read it from the certificate.
    f("credential", StringType),
    f("stakePool", StructType(Seq(
      f("id", StringType), f("rewardAccount", StringType),
      f("pledge", lovelaceAmount), f("cost", lovelaceAmount),
      f("margin", StringType), f("metadata", metadataRef),
      f("retirementEpoch", LongType)))),
    f("delegateRepresentative", StructType(Seq(
      f("type", StringType), f("id", StringType), f("from", StringType)))),
    f("member", StructType(Seq(f("id", StringType)))),
    f("delegate", StructType(Seq(f("id", StringType)))),
    f("metadata", metadataRef)))

  val transactionSchema: StructType = StructType(Seq(
    f("id", StringType),
    f("fee", lovelaceAmount),
    f("inputs", ArrayType(StructType(Seq(
      f("transaction", StructType(Seq(f("id", StringType)))),
      f("index", IntegerType))))),
    f("outputs", ArrayType(StructType(Seq(
      f("address", StringType),
      // value: {"ada": {"lovelace": N}, "<policyHex>": {"<assetHex>": N}}
      f("value", MapType(StringType, MapType(StringType, LongType))),
      f("datumHash", StringType), f("datum", StringType),
      f("script", StructType(Seq(f("language", StringType)))))))),
    f("mint", MapType(StringType, MapType(StringType, LongType))),
    f("withdrawals", MapType(StringType, lovelaceAmount)),
    f("certificates", ArrayType(certificateSchema)),
    // Ogmios v6 script-evaluation shape: {"validator": {"index": N,
    // "purpose": "spend"|...}, "redeemer": "<cbor hex>",
    // "executionUnits": {"memory": N, "cpu": N}}
    f("redeemers", ArrayType(StructType(Seq(
      f("validator", StructType(Seq(
        f("index", IntegerType), f("purpose", StringType)))),
      f("redeemer", StringType),
      f("executionUnits", StructType(Seq(
        f("memory", LongType), f("cpu", LongType)))))))),
    f("datums", MapType(StringType, StringType)),
    // Ogmios v6 governance vote: issuer role+id, the governance-action
    // pointer being voted on, the vote itself, and the anchor metadata
    f("votes", ArrayType(StructType(Seq(
      f("issuer", StructType(Seq(f("role", StringType), f("id", StringType)))),
      f("proposal", StructType(Seq(
        f("transaction", StructType(Seq(f("id", StringType)))),
        f("index", IntegerType)))),
      f("vote", StringType),
      f("metadata", metadataRef))))),
    // Ogmios v6 governance proposal: deposit, return account, the
    // action type, and the anchor metadata
    f("proposals", ArrayType(StructType(Seq(
      f("deposit", lovelaceAmount),
      f("returnAccount", StringType),
      f("action", StructType(Seq(f("type", StringType)))),
      f("metadata", metadataRef)))))))

  val blockSchema: StructType = StructType(Seq(
    f("slot", LongType), f("id", StringType), f("height", LongType),
    f("transactions", ArrayType(transactionSchema))))
}
