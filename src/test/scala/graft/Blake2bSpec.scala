package graft

import graft.functions.Blake2b

/** Goldens computed with CPython hashlib.blake2b (the reference's exact
  * library, utils.py:9,125-136).
  */
class Blake2bSpec extends SparkSuite {

  test("blake2b-8 primitive matches hashlib goldens") {
    def d(s: String) = Blake2b.hex(Blake2b.digest(s.getBytes("UTF-8")))
    assert(d("") == "e4a6a0577479b2b4")
    assert(d("abc") == "d8bb14d833d59559")
    assert(d("hello world") == "878633aa32a3b150")
    assert(d("#heat/me wavesbob") == "b6ed42d761b759e6")
  }

  test("multi-block input (> 128 bytes) matches hashlib") {
    // python: blake2b(b'x'*1000, digest_size=8).hexdigest()
    val big = "x" * 1000
    assert(Blake2b.hex(Blake2b.digest(big.getBytes("UTF-8"))) == pyBlake8XTimes1000)
  }
  // pinned from: python3 -c "from hashlib import blake2b;
  //   print(blake2b(b'x'*1000, digest_size=8).hexdigest())"
  private val pyBlake8XTimes1000 = "9a306b894c158617"

  test("gen_key: sorted-values pre-image (utils.py:131-136)") {
    assert(Blake2b.genKey(Seq("#openstack-dev", "alice",
      "2024-01-01T12:00:00", "hello world")) == "4dc8acb1cf7e71a1")
    assert(Blake2b.genKey(Seq("#heat", "bob", "/me waves")) == "b6ed42d761b759e6")
  }

  test("gen_key quirk: swapped field values collide (faithful to the reference)") {
    assert(Blake2b.genKey(Seq("#x", "carol", "ok")) ==
      Blake2b.genKey(Seq("#x", "ok", "carol")))
    assert(Blake2b.genKey(Seq("#x", "carol", "ok")) == "efc2a5e8d01e5210")
  }

  test("gen_key hashes null as the string 'None' like CPython (%s % None)") {
    // python: gen_key over ['#x', 'alice', None] / [None, None]
    assert(Blake2b.genKey(Seq("#x", "alice", null)) == "9ad7edfe2fc4691d")
    assert(Blake2b.genKey(Seq(null, null)) == "e0cee8aef264f0b0")
  }

  test("gen_key handles non-ASCII like CPython") {
    assert(Blake2b.genKey(Seq("unicode ✓ test", "dave", "#zh")) == "63a2403194299323")
    // 4-byte UTF-8 (emoji, surrogate pair in UTF-16) + CJK in one value
    assert(Blake2b.genKey(Seq("#chat", "carol", "emoji 🎉 and 中文 mixed"))
      == "0ef0bb905fbe146e")
  }

  test("compatKey column form matches genKey") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("#heat", "bob", "/me waves")).toDF("channel", "nick", "remark")
    val got = df.select(Blake2b.compatKey(col("channel"), col("nick"), col("remark")))
      .collect().head.getString(0)
    assert(got == "b6ed42d761b759e6")
  }
}
