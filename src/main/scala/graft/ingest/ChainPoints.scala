package graft.ingest

/** Extraction-cursor modeling — the counterpart of the reference's
  * chain-point presets and `find_intersection` cursor
  * (/root/reference/config.py:32-73, ogmios_parquet.py:635-651): an
  * extraction run is bounded by a start point (exclusive — chain-sync
  * resumes AFTER the intersection point, which is why every preset is
  * the LAST block before an era) and an optional stop point
  * (inclusive). The offline sandbox has no live WebSocket, so the
  * cursor is realized as a slot-range filter over whatever block source
  * feeds the run (a JSON directory for `Main extract`, any streaming
  * source for `StreamIngest.start`) — the pure-logic surface the
  * transport would plug into.
  */
object ChainPoints {

  /** A point on the chain: absolute slot + block header hash (hex). */
  final case class ChainPoint(slot: Long, id: String)

  /** The chain origin — extraction from genesis (slot filter ≥ 0). */
  val Origin: ChainPoint = ChainPoint(-1L, "origin")

  /** Predefined starting points — the last block before each era
    * (config.py:32-73; public mainnet facts).
    */
  val Presets: Map[String, ChainPoint] = Map(
    "origin" -> Origin,
    "last_byron" -> ChainPoint(4492799L,
      "f8084c61b6a238acec985b59310b6ecec49c0ab8352249afd7268da5cff2a457"),
    "last_shelley" -> ChainPoint(16588737L,
      "4e9bbbb67e3ae262133d94c3da5bffce7b1127fc436e7433b87668dba34c354a"),
    "last_allegra" -> ChainPoint(23068793L,
      "69c44ac1dda2ec74646e4223bc804d9126f719b1c245dadc2ad65e8de1b276d7"),
    "last_mary" -> ChainPoint(39916796L,
      "e72579ff89dc9ed325b723a33624b596c08141c7bd573ecfff56a1f7229e4d09"),
    "last_alonzo" -> ChainPoint(72316796L,
      "c58a24ba8203e7629422a24d9dc68ce2ed495420bf40d9dab124373655161a20"),
    "snek_mint" -> ChainPoint(90914081L,
      "2f7784ab8eee0e3d81223b9bd482195617cbee662ed6c412b123568251aac67a"),
    "snek_mint_plus_100K_blocks" -> ChainPoint(92961183L,
      "055d7e5660fcfb8bede7eee40d55456030ba51a41d57d85fcea9a820644991b2"),
    "last_babbage" -> ChainPoint(133660799L,
      "e757d57eb8dc9500a61c60a39fadb63d9be6973ba96ae337fd24453d4d15c343"),
    "last_babbage_plus_200K_blocks" -> ChainPoint(137747713L,
      "1a599f87191e73b43e71751ece3666ede768c07fd664b85056306d656b022bcc"),
    "block_2025_10_28" -> ChainPoint(170099400L,
      "a603a4b4ac4b077596bfa551648ba1f3fd3f8fd4f8f7818cea8dc917ea1cfd4c"))

  /** Resolve a CLI cursor argument: a preset name (case-insensitive —
    * some preset names contain uppercase, e.g. `…_100K_blocks`), or a
    * bare slot number (point id unknown — slot-only cursor).
    */
  def resolve(arg: String): Option[ChainPoint] =
    Presets.collectFirst { case (k, p) if k.equalsIgnoreCase(arg) => p }
      .orElse(arg.toLongOption.map(s => ChainPoint(s, "")))

  /** The cursor's slot predicate over parsed blocks: start-exclusive,
    * stop-inclusive — `find_intersection` semantics (the node streams
    * blocks AFTER the intersection point).
    */
  def slotBounds(from: Option[ChainPoint], to: Option[ChainPoint])(
      slot: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.lit
    val lo = from.map(p => slot > p.slot).getOrElse(lit(true))
    val hi = to.map(p => slot <= p.slot).getOrElse(lit(true))
    lo && hi
  }
}
