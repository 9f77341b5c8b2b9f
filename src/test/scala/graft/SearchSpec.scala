package graft

import org.apache.spark.sql.functions._

import graft.search.IrcSearch

class SearchSpec extends SparkSuite {
  import spark.implicits._

  private lazy val logs = Seq(
    ("#x", "alice", "deploy failed on node 3", "2024-01-01 10:00:00", "id1"),
    ("#x", "bob", "deploy ok", "2024-01-01 11:00:00", "id2"),
    ("#y", "alice", "lunch?", "2024-01-02 12:00:00", "id3"))
    .toDF("channel", "nick", "remark", "p", "id")
    .select(col("channel"), col("nick"), col("remark"),
      col("p").cast("timestamp").as("posted"), col("id"))

  test("filterLog ANDs channel/nick/time filters (ES bool filter analog)") {
    assert(IrcSearch.filterLog(logs, channel = Some("#x")).count() == 2)
    assert(IrcSearch.filterLog(logs, channel = Some("#x"), nick = Some("alice")).count() == 1)
    assert(IrcSearch.filterLog(logs,
      fromPosted = Some("2024-01-01 10:30:00"),
      untilPosted = Some("2024-01-02 00:00:00")).count() == 1)
    assert(IrcSearch.filterLog(logs).count() == 3)
  }

  test("searchText ranks docs matching more query terms higher (BM25 OR-match)") {
    val docs = Seq(
      (1L, "merge scan fast merge scan"),
      (2L, "merge only here"),
      (3L, "scan only words"),
      (4L, "nothing relevant at all"))
      .toDF("doc_id", "text")
    val got = IrcSearch.searchText(docs, "doc_id", "text", "merge scan", 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(got.head == 1L) // both terms, highest tf
    assert(got.toSet == Set(1L, 2L, 3L)) // doc 4 matches nothing
  }

  test("searchText handles query terms with column-syntax metachars ('.', '`')") {
    val docs = Seq(
      (1L, "see foo.bar for details"),
      (2L, "nothing here")).toDF("doc_id", "text")
    val got = IrcSearch.searchText(docs, "doc_id", "text", "foo.bar `tick", 10)
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(1L)) // would throw AnalysisException with term-named cols
  }

  test("searchText on the fixture corpus returns deterministic top-k") {
    val docs = Tables(spark, sf, "documents")
    val a = IrcSearch.searchText(docs, "doc_id", "text", "merge scan hash", 5)
      .collect().map(_.toString).toSeq
    val b = IrcSearch.searchText(docs, "doc_id", "text", "merge scan hash", 5)
      .collect().map(_.toString).toSeq
    assert(a == b && a.size == 5)
  }

  test("facets aggregates the ES aggs panel in one pass") {
    val f = IrcSearch.facets(logs).orderBy("channel").collect()
    assert(f.length == 2)
    assert(f(0).getString(0) == "#x" && f(0).getLong(1) == 2 && f(0).getLong(2) == 2)
  }

  test("stream-static enrich joins a broadcast dim onto live records") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val ctx = classic.sqlContext
    val dim = Seq(("#x", "openstack"), ("#y", "general")).toDF("channel", "topic")
    val ms = MemoryStream[String]
    ms.addData(":alice!~a@h PRIVMSG #x :hello")
    val q = graft.streaming.IrcStream.enrich(
        graft.streaming.IrcStream.records(ms.toDF()), dim, "channel")
      .writeStream.format("memory").queryName("enrich_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val out = spark.table("enrich_out").select("channel", "topic").collect()
    assert(out.length == 1 && out.head.getString(1) == "openstack")
  }
}
