package graft

import org.apache.spark.sql.functions._

import graft.ingest.IrcParser

/** FIXTURES.md §B — one assertion per pinned reference behavior. */
class IrcParserSpec extends SparkSuite {
  import spark.implicits._

  private def parseOne(lines: String*) =
    IrcParser.parse(IrcParser.splitLines(lines.toDF("value"), "value"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))

  test("plain PRIVMSG parses nick/channel/remark (irclogbot.py:131-136)") {
    val got = parseOne(":alice!~auser@host.example PRIVMSG #openstack-dev :hello world")
    assert(got.toSeq == Seq(("alice", "#openstack-dev", "hello world")))
  }

  test("tilde before user is optional") {
    val got = parseOne(":bob!buser@10.0.0.1 PRIVMSG #heat :ok")
    assert(got.toSeq == Seq(("bob", "#heat", "ok")))
  }

  test("ACTION emote rewritten to /me (irclogbot.py:137-138)") {
    val got = parseOne(":carol!~c@h PRIVMSG #heat :ACTION waves")
    assert(got.toSeq == Seq(("carol", "#heat", "/me waves")))
  }

  test("ACTION rewrite replaces EVERY occurrence like str.replace " +
    "(irclogbot.py:137-138 byte-compat)") {
    val got = parseOne(":carol!~c@h PRIVMSG #heat :ACTION waves ACTION again")
    assert(got.toSeq == Seq(("carol", "#heat", "/me waves /me again")))
    // no leading ACTION → untouched even if it appears mid-string
    val guarded = parseOne(":carol!~c@h PRIVMSG #heat :she typed ACTION loudly")
    assert(guarded.toSeq == Seq(("carol", "#heat", "she typed ACTION loudly")))
  }

  test("17-char nick dropped, 16-char kept (irclogbot.py:139-141)") {
    val got = parseOne(
      ":abcdefghijklmnopq!~u@h PRIVMSG #x :hi",
      ":abcdefghijklmnop!~u@h PRIVMSG #x :hi")
    assert(got.map(_._1).toSeq == Seq("abcdefghijklmnop"))
  }

  test("PING routed out of the data path (irclogbot.py:126-130)") {
    assert(parseOne("PING :hitchcock.freenode.net").isEmpty)
  }

  test("non-PRIVMSG traffic dropped (irclogbot.py:131)") {
    assert(parseOne(":svc!s@h MODE #x +o alice").isEmpty)
  }

  test("empty / whitespace lines dropped (irclogbot.py:118,123-124)") {
    assert(parseOne("  \r\n", "", "   ").isEmpty)
  }

  test("multi-line chunk: ALL lines parsed (deliberate fix of irclogbot.py:112-131)") {
    val chunk = ":a!~u@h PRIVMSG #x :one\r\n:b!~u@h PRIVMSG #y :two"
    val got = parseOne(chunk)
    assert(got.map(_._3).sorted.toSeq == Seq("one", "two"))
  }

  test("v2 dedup: same nick/channel/remark at different seconds collapses " +
    "(logbot_roundrobin.py:46-54)") {
    val lines = Seq(
      ":a!~u@h PRIVMSG #x :same msg",
      ":a!~u@h PRIVMSG #x :same msg").toDF("value")
    val out = IrcParser.pipeline(lines)
    assert(out.count() == 1)
  }

  test("same text in different channels gets different ids (utils.py:125-136)") {
    val lines = Seq(
      ":a!~u@h PRIVMSG #x :same msg",
      ":a!~u@h PRIVMSG #y :same msg").toDF("value")
    val out = IrcParser.pipeline(lines)
    assert(out.count() == 2)
    assert(out.select("id").distinct().count() == 2)
  }

  test("undecodable bytes are dropped, not reprocessed (S2 fix of irclogbot.py:113-118)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_utf8")
    java.nio.file.Files.write(dir.resolve("raw.txt"),
      (":a!".getBytes("UTF-8") ++ Array[Byte](-1, -2) ++
        "@h PRIVMSG #x :bad\n:ok!~u@h PRIVMSG #x :good".getBytes("UTF-8")))
    val got = IrcParser.parse(
      IrcParser.splitLines(spark.read.text(dir.toString), "value"))
      .collect()
    assert(got.map(_.getString(2)).toSeq == Seq("good"))
  }

  test("record stamps second-truncated posted (irclogbot.py:41)") {
    val lines = Seq(":a!~u@h PRIVMSG #x :m").toDF("value")
    val posted = IrcParser.pipeline(lines).select(
      (unix_micros(col("posted")) % 1000000L).as("micros_within_second"))
      .collect().head.getLong(0)
    assert(posted == 0L)
  }
}
