package graft.functions

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{array, udf}

/** Pure-Scala BLAKE2b (RFC 7693) for bit-exact compat with the reference's
  * content ids: blake2b(digest_size=8).hexdigest() over the sorted,
  * stringified record values (/root/reference/utils.py:125-136). The JDK has
  * no BLAKE2 provider, hence this implementation.
  *
  * Compat tier only (SURVEY.md §7.3): engine-internal keys use
  * [[HashFunctions]] (md5 / xxhash64, codegen'd); this UDF exists so a user
  * migrating an existing `irclog` index can reproduce its exact ids.
  * Goldens pinned against CPython hashlib in Blake2bSpec.
  */
object Blake2b {

  private val IV = Array(
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

  private def readLE(b: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = 7
    while (i >= 0) { v = (v << 8) | (b(off + i) & 0xffL); i -= 1 }
    v
  }

  private def compress(h: Array[Long], block: Array[Byte], off: Int,
      t: Long, last: Boolean): Unit = {
    val v = new Array[Long](16)
    val m = new Array[Long](16)
    var i = 0
    while (i < 8) { v(i) = h(i); v(i + 8) = IV(i); i += 1 }
    v(12) ^= t
    // t_hi stays 0 for inputs < 2^64 bytes
    if (last) v(14) = ~v(14)
    i = 0
    while (i < 16) { m(i) = readLE(block, off + i * 8); i += 1 }

    @inline def g(a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
      v(a) = v(a) + v(b) + x
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 32)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 24)
      v(a) = v(a) + v(b) + y
      v(d) = java.lang.Long.rotateRight(v(d) ^ v(a), 16)
      v(c) = v(c) + v(d)
      v(b) = java.lang.Long.rotateRight(v(b) ^ v(c), 63)
    }

    var r = 0
    while (r < 12) {
      val s = Sigma(r % 10)
      g(0, 4, 8, 12, m(s(0)), m(s(1)))
      g(1, 5, 9, 13, m(s(2)), m(s(3)))
      g(2, 6, 10, 14, m(s(4)), m(s(5)))
      g(3, 7, 11, 15, m(s(6)), m(s(7)))
      g(0, 5, 10, 15, m(s(8)), m(s(9)))
      g(1, 6, 11, 12, m(s(10)), m(s(11)))
      g(2, 7, 8, 13, m(s(12)), m(s(13)))
      g(3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  /** Unkeyed BLAKE2b digest of `digestSize` bytes (1..64). */
  def digest(input: Array[Byte], digestSize: Int = 8): Array[Byte] = {
    require(digestSize >= 1 && digestSize <= 64)
    val h = IV.clone()
    h(0) ^= 0x01010000L ^ digestSize.toLong
    var t = 0L
    var off = 0
    while (input.length - off > 128) {
      t += 128
      compress(h, input, off, t, last = false)
      off += 128
    }
    val lastBlock = new Array[Byte](128)
    val rem = input.length - off
    System.arraycopy(input, off, lastBlock, 0, rem)
    t += rem
    compress(h, lastBlock, 0, t, last = true)
    val out = new Array[Byte](digestSize)
    var i = 0
    while (i < digestSize) {
      out(i) = (h(i / 8) >>> (8 * (i % 8))).toByte
      i += 1
    }
    out
  }

  def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString

  /** The reference's gen_key: stringify values, sort, join with "", blake2b-8
    * hex (utils.py:131-136). Value-sort means swapped field values collide —
    * a faithful quirk, pinned in Blake2bSpec. Python's `"%s" % None` yields
    * "None", so null values hash as the string "None" (utils.py:131-134),
    * not NPE.
    */
  def genKey(values: Seq[String], digestSize: Int = 8): String =
    hex(digest(
      values.map(v => if (v == null) "None" else v).sorted.mkString("").getBytes(UTF_8),
      digestSize))

  private val genKeyUdf = udf((vals: Seq[String]) => genKey(vals))

  /** Column form: reference-compatible content id over the given columns. */
  def compatKey(cols: Column*): Column = genKeyUdf(array(cols: _*))
}
