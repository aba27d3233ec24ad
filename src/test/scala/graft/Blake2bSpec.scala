package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Blake2b256

/** RFC 7693 vectors for BLAKE2b-256 plus multi-block boundary lengths
  * (values cross-checked against Python hashlib.blake2b).
  */
class Blake2bSpec extends AnyFunSuite {

  test("known vectors") {
    assert(Blake2b256.hex(Array.empty) ===
      "0e5751c026e543b2e8ab2eb06099daa1d1e5df47778f7787faab45cdf12fe3a8")
    assert(Blake2b256.hex("abc".getBytes("UTF-8")) ===
      "bddd813c634239723171ef3fee98579b94964e3bb1cb3e427262c8c068d52319")
    assert(Blake2b256.hex(Array.fill(200)('a'.toByte)) ===
      "6b6e59aaf00eb730cf93de53560846722184bbd92f8368c21ffa95380c2f9fe6")
  }

  test("block-boundary lengths produce distinct stable digests") {
    val ds = Seq(127, 128, 129, 256, 257)
      .map(n => Blake2b256.hex(Array.fill(n)('x'.toByte)))
    assert(ds.distinct.length === ds.length)
    // determinism
    assert(Blake2b256.hex(Array.fill(129)('x'.toByte)) === ds(2))
  }
}
