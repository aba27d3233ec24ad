package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The driver captures a bounded 2000-char stdout TAIL and parses the
  * last line as JSON — three rounds of `"parsed": null` came from lines
  * that overflowed the tail or got sbt-wrapped. Pins the renderLine
  * contract: always valid JSON; per-query map when it fits the
  * 1950-char budget (adaptive precision); per-FAMILY rollup once the
  * suite outgrows the tail (at 84 query names the map alone exceeds
  * 2000 chars at any precision); total-only fallback last.
  */
class BenchArtifactSpec extends AnyFunSuite {

  private val mapper = new ObjectMapper()

  test("the real suite renders as one parseable line within the tail budget") {
    // the actual registry names — the binding constraint is their length
    val results = SparkEntry.queries.keys.map(_ -> 1.234567).toMap
    assert(results.size >= 84)
    val line = Bench.renderLine(results, "/root/testdata/sf0.1", maxLen = 1950)
    assert(line.length <= 1950, s"line is ${line.length} chars")
    assert(!line.contains('\n'))
    val node = mapper.readTree(line)
    assert(node.get("metric").asText() === "total")
    assert(node.get("unit").asText() === "sec")
    assert(node.get("sf").asText() === "sf0.1") // basename, not the path
    // 84 names can no longer fit as a map — the family rollup carries
    // the per-family totals and the exact query count instead
    assert(node.get("queries") === null)
    assert(node.get("n").asInt() === results.size)
    val fams = node.get("families")
    assert(fams.size() === 7) // q, d, t, p, s, m, c
    Seq("q", "d", "t", "p", "s", "m", "c").foreach(f =>
      assert(fams.get(f) !== null, s"family $f missing"))
    // family values sum to the total at the emitted precision
    val famSum = Seq("q", "d", "t", "p", "s", "m", "c")
      .map(fams.get(_).asDouble()).sum
    assert(math.abs(famSum - node.get("value").asDouble()) < 0.5)
    assert(math.abs(node.get("value").asDouble() - results.size * 1.234567) < 0.5)
  }

  test("precision degrades before the map is dropped; map drops before validity") {
    val results = SparkEntry.queries.keys.map(_ -> 1.234567).toMap
    // unconstrained → full 3-decimal precision per-query map
    val wide = Bench.renderLine(results, "sf0.1", maxLen = Int.MaxValue)
    assert(wide.contains("\":1.235")) // 3-decimal rounding
    assert(mapper.readTree(wide).get("queries").size() === results.size)
    // one char below the 3-decimal length → still the full map, coarser
    val mid = Bench.renderLine(results, "sf0.1", maxLen = wide.length - 1)
    assert(mid.length < wide.length)
    assert(mapper.readTree(mid).get("queries").size() === results.size)
    // family-rollup budget → families present, still valid JSON
    val fam = Bench.renderLine(results, "sf0.1", maxLen = 300)
    val fnode = mapper.readTree(fam)
    assert(fnode.get("queries") === null)
    assert(fnode.get("families").size() === 7)
    assert(fam.length <= 300)
    // impossible budget → total-only fallback, still valid JSON
    val tiny = Bench.renderLine(results, "sf0.1", maxLen = 120)
    val node = mapper.readTree(tiny)
    assert(node.get("queries") === null)
    assert(node.get("families") === null)
    assert(node.get("n").asInt() === results.size)
    assert(tiny.length <= 120)
  }

  test("all-pass failures surface as errs; clean runs emit no errs field") {
    // The dead-SparkContext mode (executor OOM under an undersized
    // heap, disk-full shuffle spill — both hit in round 10): every
    // save fails in ~10 ms and the artifact looks plausibly FAST.
    // renderLine must mark those rows so a consumer can reject the run.
    // At a generous budget errs carries the NAMES (sorted array) — a
    // consumer of the persisted artifact must be able to tell which rows
    // are missing, not just how many.
    val results = Map("q01_x" -> 0.011, "d01_y" -> 0.009)
    val dirty = Bench.renderLine(results, "sf10", maxLen = 1950,
      failed = Set("q01_x", "d01_y"))
    val dnode = mapper.readTree(dirty)
    assert(dnode.get("errs").isArray)
    assert(dnode.get("errs").size() === 2)
    assert(dnode.get("errs").get(0).asText() === "d01_y")
    assert(dnode.get("errs").get(1).asText() === "q01_x")
    assert(dnode.get("sf").asText() === "sf10")
    // errs survives every degradation tier, including total-only, where
    // it degrades to a count (the unconditional fallback stays minimal)
    val tiny = Bench.renderLine(results, "sf10", maxLen = 60,
      failed = Set("q01_x"))
    assert(mapper.readTree(tiny).get("errs").asInt() === 1)
    // a clean run's line is byte-identical to the pre-round-10 format
    val clean = Bench.renderLine(results, "sf10", maxLen = 1950)
    assert(mapper.readTree(clean).get("errs") === null)
  }

  test("empty and zero-valued results stay parseable") {
    val none = Bench.renderLine(Map.empty, "sf0.1", maxLen = 1950)
    assert(mapper.readTree(none).get("value").asDouble() === 0.0)
    val zeros = Bench.renderLine(Map("a" -> 0.0, "b" -> 0.0004), "sf0.1", maxLen = 1950)
    val node = mapper.readTree(zeros)
    assert(node.get("queries").get("a").asDouble() === 0.0)
    assert(node.get("queries").get("b").asDouble() === 0.0)
  }
}
