package graft.api

/** Curated well-known-entity registries shipped with the engine — the
  * counterpart of the reference's curated tables
  * (/root/reference/config.py:78-92 known addresses/assets,
  * /root/reference/token_fee_analysis.py:93-105 named tokens): every
  * reference user starts an analysis from "hosky", not a 56-char hex
  * string. All values are public Cardano mainnet facts.
  */
object Registry {

  /** A named token: (policy id, asset name), both hex — the unit the
    * asset table keys on.
    */
  final case class TokenInfo(policyIdHex: String, assetNameHex: String)

  /** Well-known token names → on-chain identity
    * (token_fee_analysis.py:93-105).
    */
  val KnownTokens: Map[String, TokenInfo] = Map(
    "snek" -> TokenInfo(
      policyIdHex = "279c909f348e533da5808898f87f9a14bb2c3dfbbacccd631d927a3f",
      assetNameHex = "534e454b"), // 'SNEK'
    "hosky" -> TokenInfo(
      policyIdHex = "a0028f350aaabe0545fdcb56b039bfb08e4bb4d8c4d7c3c7d481c235",
      assetNameHex = "484f534b59")) // 'HOSKY'

  /** Case-insensitive name lookup; None → caller must supply raw hex
    * (the reference raises, token_fee_analysis.py:285-287 — we let the
    * CLI fall through to hex arguments instead).
    */
  def tokenInfo(name: String): Option[TokenInfo] =
    KnownTokens.get(name.toLowerCase)

  /** Common Cardano addresses for reference (config.py:79-85). */
  val KnownAddresses: Map[String, String] = Map(
    "minswap_v1" -> ("addr1zxn9efv2f6w82hagxqtn62ju4m293tqvw0uhmdl64ch8uw6j2c79" +
      "gy9l76sdg0xwhd7r0c0kna0tycz4y5s6mlenh8pq6s3z70"),
    "sundaeswap_v1" -> "addr1w9qzpelu9hn45pefc0xr4ac4kdxeswq7pndul2vuj59u8tqaxdznu",
    "wingriders_v1" -> "addr1w8nvjzjeydcn4atcd93aac8allvrpjn7lx9cyh3rgjgqmrqk5r9ep",
    "snek_mint" -> ("addr1q9jsu6z9sedfksdrhkpmcgvcjf9m6vhd2wn3huxy0s8cwq7k2tc80" +
      "wsaltznwlfpe7vncdkhcgngll32v22m3g80luvqxjahsf"))

  /** Common asset units for reference (config.py:88-92) — the full unit
    * string (policy id, plus asset name hex for non-ADA assets); ADA is
    * the empty unit.
    */
  val KnownAssets: Map[String, String] = Map(
    "ada" -> "",
    "snek" -> "279c909f348e533da5808898f87f9a14bb2c3dfbbacccd631d927a3f534e454b",
    "hosky" -> "a0028f350aaabe0545fdcb56b039bfb08e4bb4d8c4d7c3c7d481c235484f534b59",
    "min" -> "29d222ce763455e3d7a09a665ce554f00ac89d2e99a1a83d267170c6",
    "sundae" -> "9a9693a9a37912a5097918f97918d15240c92ab729a0b7c4aa144d77")
}
