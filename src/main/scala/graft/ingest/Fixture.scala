package graft.ingest

/** Deterministic two-block fixture chain (Ogmios block-JSON shape)
  * covering every extractor family: inputs/outputs/fee, token values,
  * mint+burn, datum hash + inline datum, and all four certificate
  * families. Used by the c01 ingest query and the ExtractSpec.
  */
object Fixture {

  def hx(b: String, n: Int): String = b * n
  val txA: String = hx("aa", 32)
  val txB: String = hx("ab", 32)
  val txC: String = hx("cd", 32)
  val spentTx: String = hx("bb", 32)
  val policy: String = hx("cc", 28)
  val datumHashHex: String = hx("dd", 32)
  val inlineDatumHex: String = "82d87980"

  val block1: String =
    s"""{"slot": 100, "id": "${hx("01", 32)}", "height": 1, "transactions": [
       |  {"id": "$txA", "fee": {"ada": {"lovelace": 500000}},
       |   "inputs": [{"transaction": {"id": "$spentTx"}, "index": 1}],
       |   "outputs": [
       |     {"address": "addr1xyz", "value": {"ada": {"lovelace": 2000000}}},
       |     {"address": "addr1tok",
       |      "value": {"ada": {"lovelace": 1500000}, "$policy": {"746f6b656e": 42}},
       |      "datumHash": "$datumHashHex"},
       |     {"address": "addr1dat", "value": {"ada": {"lovelace": 1}},
       |      "datum": "$inlineDatumHex"}],
       |   "mint": {"$policy": {"746f6b656e": 42, "6275726e": -7}},
       |   "datums": {"${hx("ee", 32)}": "9f01ff"},
       |   "redeemers": [{"validator": {"index": 0, "purpose": "spend"},
       |     "redeemer": "9f01ff",
       |     "executionUnits": {"memory": 1000, "cpu": 500000}}],
       |   "votes": [{"issuer": {"role": "delegateRepresentative", "id": "drep1xyz"},
       |     "proposal": {"transaction": {"id": "${hx("66", 32)}"}, "index": 0},
       |     "vote": "yes",
       |     "metadata": {"url": "https://vote.example", "hash": "${hx("77", 32)}"}}],
       |   "proposals": [{"deposit": {"ada": {"lovelace": 100000000000}},
       |     "returnAccount": "stake1ret",
       |     "action": {"type": "treasuryWithdrawals"},
       |     "metadata": {"url": "https://prop.example", "hash": "${hx("88", 32)}"}}],
       |   "certificates": [
       |     {"type": "stakeDelegation", "credential": "${hx("11", 28)}",
       |      "stakePool": {"id": "pool1abc"},
       |      "delegateRepresentative": {"type": "registered", "id": "drep1xyz"}},
       |     {"type": "stakePoolRegistration",
       |      "stakePool": {"id": "pool1abc", "rewardAccount": "stake1r",
       |        "pledge": {"ada": {"lovelace": 1000000}},
       |        "cost": {"ada": {"lovelace": 340000000}}, "margin": "3/100",
       |        "metadata": {"hash": "${hx("ff", 32)}", "url": "https://pool.example/m.json"}}},
       |     {"type": "constitutionalCommitteeDelegation",
       |      "member": {"id": "${hx("22", 28)}"}, "delegate": {"id": "${hx("33", 28)}"}},
       |     {"type": "delegateRepresentativeRegistration",
       |      "delegateRepresentative": {"id": "${hx("44", 28)}", "from": "verificationKey"},
       |      "metadata": {"hash": "${hx("55", 32)}", "url": "https://drep.example"}}]}
       |]}""".stripMargin.replaceAll("\n", " ")

  val block2: String =
    s"""{"slot": 250000, "id": "${hx("02", 32)}", "height": 2, "transactions": [
       |  {"id": "$txB", "fee": {"ada": {"lovelace": 170000}}, "inputs": [],
       |   "outputs": [{"address": "addr1q", "value": {"ada": {"lovelace": 999}}}]},
       |  {"id": "$txC"}
       |]}""".stripMargin.replaceAll("\n", " ")

  val blocks: Seq[String] = Seq(block1, block2)

  /** Expected per-table row counts — the c01 oracle. */
  val expectedCounts: Seq[(String, Long)] = Seq(
    "asset" -> 1L, "cert" -> 4L, "cert_cc" -> 1L, "cert_drep" -> 1L,
    "cert_pool" -> 1L, "cert_stake" -> 1L, "datum" -> 2L, "mint" -> 2L,
    "proposal" -> 1L, "redeemer" -> 1L, "tx" -> 3L, "utxo" -> 4L,
    "vote" -> 1L)
}
