package graft

import org.apache.spark.sql.functions._

import graft.search.{IrcSearch, QueryString}
import graft.search.QueryString._

class QueryStringSpec extends SparkSuite {
  import spark.implicits._

  private def t(v: String) = Term(None, v, phrase = false)

  // ---- parser shape ----

  test("precedence: OR binds looser than AND; parens override") {
    assert(parse("a OR b AND c") == Or(t("a"), And(t("b"), t("c"))))
    assert(parse("(a OR b) AND c") == And(Or(t("a"), t("b")), t("c")))
    assert(parse("a AND b AND c") == And(And(t("a"), t("b")), t("c")))
  }

  test("whitespace adjacency builds a Lucene boolean group") {
    assert(parse("+a b -c") ==
      Group(Seq(t("a")), Seq(t("b")), Seq(t("c"))))
    // NOT is a must_not clause modifier, like '-'
    assert(parse("NOT a b") == Group(Nil, Seq(t("b")), Seq(t("a"))))
    // a single unmodified clause collapses to the bare node
    assert(parse("a") == t("a"))
    assert(parse("(a)") == t("a"))
  }

  test("fields, phrases, and field-phrases") {
    assert(parse("nick:foo") == Term(Some("nick"), "foo", phrase = false))
    assert(parse("\"exact phrase\"") == Term(None, "exact phrase", phrase = true))
    assert(parse("nick:\"a b\"") == Term(Some("nick"), "a b", phrase = true))
    assert(parse("""nick:foo AND "exact phrase" -spam""") ==
      And(Term(Some("nick"), "foo", phrase = false),
        Group(Nil, Seq(Term(None, "exact phrase", phrase = true)),
          Seq(t("spam")))))
  }

  test("escaping: \\: \\\" \\+ keep characters literal; \\* disables the wildcard") {
    assert(parse("""foo\:bar""") == t("foo:bar"))
    assert(parse("""\+x""") == t("+x"))
    // escaped star is NOT a wildcard: lowering compares the literal token
    val pred = predicate("""foo\*""", "text", _ => TextField)
    val df = Seq((1L, "foo* here"), (2L, "foobar here")).toDF("id", "text")
    assert(df.filter(pred).select("id").as[Long].collect().toSet == Set(1L))
  }

  test("parse errors: unterminated phrase, dangling paren, empty field/value") {
    assert(intercept[ParseException](parse("\"oops")).getMessage
      .contains("unterminated"))
    assert(intercept[ParseException](parse("(a OR b")).getMessage
      .contains("missing ')'"))
    assert(intercept[ParseException](parse(":x")).getMessage
      .contains("empty field"))
    assert(intercept[ParseException](parse("nick: AND x")).getMessage
      .contains("no value"))
    assert(intercept[ParseException](parse("")).getMessage
      .contains("empty query"))
  }

  // ---- lowering semantics ----

  private lazy val docs = Seq(
    (1L, "merge scan is fast", "en", "web"),
    (2L, "hash probe build", "en", "web"),
    (3L, "merge sort external", "en", "forum"),
    (4L, "merge scan again", "de", "web"),
    (5L, "hash join lanes", "en", "forum"),
    (6L, "nothing relevant", "en", "forum"))
    .toDF("doc_id", "text", "lang", "source")

  private val types: String => FieldType = {
    case "text" => TextField
    case "lang" | "source" => KeywordField
    case f => throw ParseException(s"unknown field '$f'")
  }

  private def ids(q: String): Set[Long] =
    docs.filter(predicate(q, "text", types))
      .select("doc_id").as[Long].collect().toSet

  test("term / phrase / keyword / wildcard lowering") {
    assert(ids("merge") == Set(1L, 3L, 4L))
    assert(ids("\"merge scan\"") == Set(1L, 4L))       // token-boundary phrase
    assert(ids("\"scan merge\"") == Set.empty)          // order matters
    assert(ids("lang:en") == Set(1L, 2L, 3L, 5L, 6L))
    assert(ids("ha*") == Set(2L, 5L))                   // token wildcard
    assert(ids("h?sh") == Set(2L, 5L))                  // single-char wildcard
    assert(ids("source:w*") == Set(1L, 2L, 4L))         // keyword LIKE
  }

  test("boolean semantics: AND/OR/NOT, must/should/must_not groups") {
    assert(ids("merge AND lang:de") == Set(4L))
    assert(ids("probe OR join") == Set(2L, 5L))
    // should-group: default operator OR
    assert(ids("probe join") == Set(2L, 5L))
    // must + should: shoulds become optional (Lucene filter context)
    assert(ids("+hash probe") == Set(2L, 5L))
    // pure negative matches the complement (ES q=-term behavior)
    assert(ids("-merge") == Set(2L, 5L, 6L))
    assert(ids("NOT merge") == Set(2L, 5L, 6L))
    // mixed group
    assert(ids("+hash -probe") == Set(5L))
  }

  test("modifiers bind to phrases and groups: -\"phrase\" and -(a b) exclude " +
      "(r15 advice #1 — these lexed as a literal '-' word + SHOULD clause)") {
    // lexer shape: Minus token, not a '-' term
    assert(parse("""-"exact phrase" x""") ==
      Group(Nil, Seq(t("x")), Seq(Term(None, "exact phrase", phrase = true))))
    assert(parse("-(a b) x") ==
      Group(Nil, Seq(t("x")), Seq(Group(Nil, Seq(t("a"), t("b")), Nil))))
    assert(parse("""+"a b"""") == Group(Seq(Term(None, "a b", phrase = true)), Nil, Nil))
    // semantics: the phrase/group is EXCLUDED, not or'd in
    assert(ids("""-"merge scan" hash""") == Set(2L, 5L))
    assert(ids("""-"merge scan"""") == Set(2L, 3L, 5L, 6L))
    assert(ids("-(probe join) merge") == Set(1L, 3L, 4L))
    assert(ids("+(hash) -(probe build)") == Set(5L))
  }

  test("truncated input throws the typed ParseException, not " +
      "NoSuchElementException (r15 advice #3)") {
    for (q <- Seq("foo AND", "(a OR", "foo OR", "a AND NOT"))
      assert(intercept[ParseException](parse(q)).getMessage
        .contains("unexpected end of query"), s"query: '$q'")
  }

  test("the registered t34 query string lowers to the documented predicate") {
    val q = """lang:en AND ("merge scan" OR +has* -probe) source:web"""
    // lang=en AND (phrase OR (has* AND NOT probe) OR source=web)
    assert(ids(q) == Set(1L, 2L, 5L))
  }

  test("IrcSearch.searchAfter: consecutive cursor pages tile the full sort " +
      "with no gap or overlap (the t27 split, parameterized)") {
    val all = Tables(spark, sf, "documents")
    val full = all.select(col("n_chars").cast("long"), col("doc_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .as[(Long, Long)].collect().toSeq
    def page(cursor: Option[(Long, Long)]) =
      IrcSearch.searchAfter(all.select(col("n_chars").cast("long").as("n_chars"),
          col("doc_id")), "n_chars", "doc_id", cursor, 20)
        .as[(Long, Long)].collect().toSeq
    val p1 = page(None)
    assert(p1 == full.take(20))
    val p2 = page(Some(p1.last))
    assert(p2 == full.slice(20, 40), "page 2 from page 1's last row as cursor")
    val p3 = page(Some(p2.last))
    assert(p3 == full.slice(40, 60))
  }

  test("Percolator.matchQueryStrings: full query_string queries as a " +
      "percolation store — batch and streaming hits agree") {
    val store = Seq(
      "q_phrase" -> "\"merge scan\"",
      "q_bool" -> "+hash -probe",
      "q_field" -> "lang:de merge",          // should-group: lang=de OR merge
      "q_wild" -> "h?sh AND lang:en")
    val hits = graft.streaming.Percolator
      .matchQueryStrings(docs, store, "text", types)
      .as[(String, Long)].collect().toSet
    assert(hits == Set(
      ("q_phrase", 1L), ("q_phrase", 4L),
      ("q_bool", 5L),
      ("q_field", 1L), ("q_field", 3L), ("q_field", 4L),
      ("q_wild", 2L), ("q_wild", 5L)))
    // streaming: stateless matcher ⇒ chunking-independent, equals batch
    implicit val ctx = classic.sqlContext
    val rows = docs.select(col("doc_id"), col("text"), col("lang"),
      col("source")).as[(Long, String, String, String)].collect()
    val ms = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String, String)]
    val q = graft.streaming.Percolator.matchQueryStrings(
        ms.toDF().toDF("doc_id", "text", "lang", "source"),
        store, "text", types)
      .writeStream.format("memory").queryName("qs_perc_out")
      .outputMode("append").start()
    rows.grouped(2).foreach { c => ms.addData(c.toIndexedSeq); q.processAllAvailable() }
    q.stop()
    val streamed = spark.table("qs_perc_out").as[(String, Long)].collect().toSet
    assert(streamed == hits)
  }

  test("IrcSearch.queryString: the verdict's day-one example over the log schema") {
    val logs = Seq(
      ("#x", "foo", "an exact phrase here", "id1"),
      ("#x", "foo", "exact phrase plus spam", "id2"),
      ("#x", "bar", "an exact phrase here", "id3"))
      .toDF("channel", "nick", "remark", "id")
    val got = IrcSearch.queryString(logs, """nick:foo AND "exact phrase" -spam""")
      .select("id").as[String].collect().toSet
    assert(got == Set("id1"))
    assert(intercept[ParseException](
      IrcSearch.queryString(logs, "bogusfield:x")).getMessage
      .contains("unknown field"))
  }
}
