package graft.functions

/** BLAKE2b-256 (RFC 7693), implemented from the spec — the one scalar
  * function in the reference surface with no Spark builtin
  * (`blake2b_256`, /root/reference/ogmios_parquet.py:333-334; used to
  * derive datum_hash from inline datum CBOR, :337-343). Pure JVM, no
  * dependencies; exposed to queries as the `blake2b256` UDF.
  */
object Blake2b256 {

  private val IV: Array[Long] = Array(
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val Sigma: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))

  private val DigestBytes = 32

  private def rotr64(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr64(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = rotr64(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = rotr64(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr64(v(b) ^ v(c), 63)
  }

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
      t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // message length below 2^64: high word stays 0
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = Sigma(r % 10)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** 32-byte BLAKE2b digest (unkeyed, sequential). */
  def digest(data: Array[Byte]): Array[Byte] = {
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ DigestBytes.toLong // param: fanout=1, depth=1
    val len = data.length
    if (len > 128) {
      var off = 0
      // all full blocks except the last (the final block, full or
      // partial, is compressed with the finalization flag)
      while (len - off > 128) {
        compress(h, data, off, off + 128L, last = false)
        off += 128
      }
      val pad = new Array[Byte](128)
      System.arraycopy(data, off, pad, 0, len - off)
      compress(h, pad, 0, len.toLong, last = true)
    } else {
      val pad = new Array[Byte](128)
      if (len > 0) System.arraycopy(data, 0, pad, 0, len)
      compress(h, pad, 0, len.toLong, last = true)
    }
    val out = new Array[Byte](DigestBytes)
    var i = 0
    while (i < DigestBytes) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }

  def hex(data: Array[Byte]): String =
    digest(data).map("%02x".format(_)).mkString
}
