package graft

import org.scalatest.funsuite.AnyFunSuite

/** CLI argument handling — pure logic, no Spark session (running
  * `Main.main` in-process would stop the shared test session).
  */
class MainArgsSpec extends AnyFunSuite {

  test("splitArgs separates --flag value pairs from positionals, order-independent") {
    val ft = Set("from", "to")
    assert(Main.splitArgs(List("a", "--from", "last_byron", "b", "--to", "123"), ft)
      === Right((List("a", "b"), Map("from" -> "last_byron", "to" -> "123"))))
    assert(Main.splitArgs(List("--output", "x.csv"), Set("output"))
      === Right((Nil, Map("output" -> "x.csv"))))
    assert(Main.splitArgs(List("a", "b"), ft) === Right((List("a", "b"), Map.empty[String, String])))
    assert(Main.splitArgs(Nil, ft) === Right((Nil, Map.empty[String, String])))
  }

  test("splitArgs rejects unknown flags and trailing valueless flags") {
    assert(Main.splitArgs(List("a", "--form", "last_byron"), Set("from", "to")).isLeft)
    assert(Main.splitArgs(List("a", "--from"), Set("from", "to")).isLeft)
    assert(Main.splitArgs(List("--verbose", "x"), Set("output")).isLeft)
  }

  test("splitArgs never consumes a following flag as a value") {
    // `--from --to x` is a missing value for --from, not from="--to"
    assert(Main.splitArgs(List("a", "--from", "--to", "x"), Set("from", "to")).isLeft)
    assert(Main.splitArgs(List("--output", "--output", "y"), Set("output")).isLeft)
  }

  test("resolveTokenArgs: registry name, raw hex pair, and rejection of numeric policy") {
    val hosky = Main.resolveTokenArgs(List("/t", "hosky", "100", "200"))
    assert(hosky === Some(("/t",
      "a0028f350aaabe0545fdcb56b039bfb08e4bb4d8c4d7c3c7d481c235",
      Some("484f534b59"), List("100", "200"))))
    // raw hex policy + asset; empty asset hex → None (ADA-style)
    assert(Main.resolveTokenArgs(List("/t", "aabb", "ccdd"))
      === Some(("/t", "aabb", Some("ccdd"), Nil)))
    assert(Main.resolveTokenArgs(List("/t", "aabb", ""))
      === Some(("/t", "aabb", None, Nil)))
    // a bare number where a policy should be is not a valid form
    assert(Main.resolveTokenArgs(List("/t", "12345", "ccdd")) === None)
    assert(Main.resolveTokenArgs(List("/t")) === None)
  }
}
