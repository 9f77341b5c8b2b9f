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

  test("v1 (posted-inclusive) key matches CPython and differs from v2 (SURVEY §1.1)") {
    // irclogbot.py:41-44 hashes {channel, nick, posted, remark}; the
    // round-robin bot (logbot_roundrobin.py:48-54) deliberately drops
    // `posted` so cross-observer duplicates collide. Pin BOTH shapes of the
    // same record to CPython goldens so the variant distinction is a test,
    // not a comment.  python3: gen_key({"channel":"#heat","nick":"bob",
    // "posted":"2018-07-09T17:15:32","remark":"/me waves"})
    val v1 = Blake2b.genKey(Seq("#heat", "bob", "2018-07-09T17:15:32", "/me waves"))
    val v2 = Blake2b.genKey(Seq("#heat", "bob", "/me waves"))
    assert(v1 == "cabe01eb2ba2beaa")
    assert(v2 == "b6ed42d761b759e6")
    assert(v1 != v2)
    // and the md5-based engine keys preserve the same distinction on columns
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, to_timestamp}
    import graft.functions.HashFunctions
    val df = Seq(("#heat", "bob", "2018-07-09 17:15:32", "/me waves"))
      .toDF("channel", "nick", "p", "remark")
      .withColumn("posted", to_timestamp(col("p")))
    val keys = df.select(
      HashFunctions.keyV1(col("channel"), col("nick"), col("posted"), col("remark")).as("k1"),
      HashFunctions.keyV2(col("channel"), col("nick"), col("remark")).as("k2"))
      .collect().head
    assert(keys.getString(0) != keys.getString(1),
      "keyV1 must differ from keyV2 on the same record (posted-inclusive vs not)")
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
