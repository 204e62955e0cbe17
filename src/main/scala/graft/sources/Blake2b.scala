package graft.sources

/** Pure-JVM BLAKE2b (RFC 7693) — unkeyed, variable digest length.
  *
  * Cardano identifies blocks and transactions by BLAKE2b-256 over their
  * CBOR bytes (block hash = digest of the HEADER item, tx hash = digest
  * of the TX BODY item); the JDK ships no BLAKE2 provider, so the
  * reference's Chrysalis hashing is re-expressed here from the public
  * RFC. Used by [[CborBlock]]; validated in CborCodecSpec against the
  * published BLAKE2b-256 vectors and, when the reference's real
  * preview-network corpus is on disk, by re-deriving its prev-hash
  * chain linkage end-to-end.
  */
object Blake2b {

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

  def hash256(msg: Array[Byte]): Array[Byte] = hash(msg, 32)

  def hash256Hex(msg: Array[Byte]): String =
    CborBlock.hex(hash256(msg)) // one hex spelling in the package

  def hash(msg: Array[Byte], outLen: Int): Array[Byte] = {
    require(outLen >= 1 && outLen <= 64, s"digest length $outLen")
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ outLen.toLong // no key, fanout=depth=1
    var t = 0L
    var off = 0
    // every full block EXCEPT a final exact-fit one goes through the
    // not-last path; the last (possibly empty) block is padded
    while (msg.length - off > 128) {
      t += 128
      compress(h, msg, off, t, last = false)
      off += 128
    }
    val rem = msg.length - off
    val tail = new Array[Byte](128)
    System.arraycopy(msg, off, tail, 0, rem)
    t += rem
    compress(h, tail, 0, t, last = true)
    val out = new Array[Byte](outLen)
    var i = 0
    while (i < outLen) {
      out(i) = ((h(i >> 3) >>> (8 * (i & 7))) & 0xff).toByte
      i += 1
    }
    out
  }

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
      t: Long, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      val p = off + 8 * i
      m(i) = (block(p) & 0xffL) | ((block(p + 1) & 0xffL) << 8) |
        ((block(p + 2) & 0xffL) << 16) | ((block(p + 3) & 0xffL) << 24) |
        ((block(p + 4) & 0xffL) << 32) | ((block(p + 5) & 0xffL) << 40) |
        ((block(p + 6) & 0xffL) << 48) | ((block(p + 7) & 0xffL) << 56)
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t // message bytes compressed so far (t1 high word is 0
    //            for any JVM array — length is bounded by Int)
    if (last) v(14) = ~v(14)

    @inline def g(r: Array[Int], a: Int, b: Int, c: Int, d: Int,
        x: Int, y: Int): Unit = {
      v(a) = v(a) + v(b) + m(r(x))
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + m(r(y))
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
    }
    var round = 0
    while (round < 12) {
      val s = Sigma(round % 10)
      g(s, 0, 4, 8, 12, 0, 1)
      g(s, 1, 5, 9, 13, 2, 3)
      g(s, 2, 6, 10, 14, 4, 5)
      g(s, 3, 7, 11, 15, 6, 7)
      g(s, 0, 5, 10, 15, 8, 9)
      g(s, 1, 6, 11, 12, 10, 11)
      g(s, 2, 7, 8, 13, 12, 13)
      g(s, 3, 4, 9, 14, 14, 15)
      round += 1
    }
    i = 0
    while (i < 8) {
      h(i) ^= v(i) ^ v(i + 8)
      i += 1
    }
  }
}
