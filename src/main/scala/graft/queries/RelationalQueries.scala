package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HashFunctions
import graft.ingest.IrcParser
import graft.operators.IncrementalAgg

/** Scans, projections, filters, per-row rewrites and scalar functions —
  * SURVEY.md §2.1 (S6), §2.3 (P1-P8), §2.4 (F2/F3/F5/F8).
  *
  * The IRC-specific ops (P1/P5) have no raw-line fixture, so the queries
  * *construct* wire lines deterministically from `events` columns and then
  * run the real [[IrcParser]] expressions over them — the oracle rebuilds the
  * same lines in SQL. This keeps the literal reference semantics under the
  * DuckDB differential gate instead of scalatest only.
  */
object RelationalQueries extends QueryGroup {

  def all: Seq[Q] = Seq(

    Q("s6_scan_project",
      (s, d) => Tables(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1996-06-01").cast("timestamp"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * 100).cast("long").as("price_cents"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
      Some("""SELECT l_orderkey, l_linenumber,
             |       CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents
             |FROM lineitem
             |WHERE l_shipdate < TIMESTAMP '1996-06-01'
             |ORDER BY l_orderkey, l_linenumber""".stripMargin)),

    Q("p1_regex_extract",
      (s, d) => {
        val lines = Tables(s, d, "events").select(
          col("event_id"),
          concat(
            lit(":u"), col("user_id").cast("string"),
            lit("!~user@10.0.0."), (col("user_id") % 256).cast("string"),
            lit(" PRIVMSG #"), col("event_type"),
            lit(" :msg "), col("event_id").cast("string")).as("line"))
        // one-pass group extract (r21): the per-group regexp_extract form
        // ran the same anchored match FIVE times per line
        lines.select(col("event_id"),
            IrcParser.extractGroups(col("line")).as("g"))
          .select(
            col("event_id"),
            element_at(col("g"), 1).as("nick"),
            element_at(col("g"), 2).as("username"),
            element_at(col("g"), 3).as("host"),
            element_at(col("g"), 4).as("channel"),
            element_at(col("g"), 5).as("remark"))
          .orderBy(col("event_id"))
      },
      Some("""WITH lines AS (
             |  SELECT event_id,
             |         concat(':u', user_id, '!~user@10.0.0.', user_id % 256,
             |                ' PRIVMSG #', event_type, ' :msg ', event_id) AS line
             |  FROM events)
             |SELECT event_id,
             |       regexp_extract(line, '^:([^!]+)!~?([^@]+)@(\S+) PRIVMSG (\S+) :(.+)$', 1) AS nick,
             |       regexp_extract(line, '^:([^!]+)!~?([^@]+)@(\S+) PRIVMSG (\S+) :(.+)$', 2) AS username,
             |       regexp_extract(line, '^:([^!]+)!~?([^@]+)@(\S+) PRIVMSG (\S+) :(.+)$', 3) AS host,
             |       regexp_extract(line, '^:([^!]+)!~?([^@]+)@(\S+) PRIVMSG (\S+) :(.+)$', 4) AS channel,
             |       regexp_extract(line, '^:([^!]+)!~?([^@]+)@(\S+) PRIVMSG (\S+) :(.+)$', 5) AS remark
             |FROM lines
             |ORDER BY event_id""".stripMargin)),

    // The reference's ENTIRE batch job as one differential query: construct
    // wire lines, run the real IrcParser (regex extract, filters, ACTION
    // rewrite), key with the v2 content hash, dedup, count per channel. The
    // oracle rebuilds the same records directly from the source columns —
    // any parser deviation breaks the hash match.
    Q("i1_ingest_pipeline",
      (s, d) => {
        val lines = Tables(s, d, "events").select(
          concat(
            lit(":u"), col("user_id").cast("string"),
            lit("!~user@h PRIVMSG #"), col("event_type"),
            when(col("event_id") % 7 === 0, lit(" :ACTION msg "))
              .otherwise(lit(" :msg ")),
            (col("event_id") % 500).cast("string")).as("line"))
        val parsed = IrcParser.parse(lines)
        parsed
          .withColumn("id", HashFunctions.keyV2(col("channel"), col("nick"), col("remark")))
          .groupBy(col("channel"))
          .agg(countDistinct(col("id")).as("n_unique"), count(lit(1)).as("n_msgs"))
          .orderBy(col("channel"))
      },
      Some("""WITH rec AS (
             |  SELECT '#' || event_type AS channel,
             |         'u' || user_id AS nick,
             |         CASE WHEN event_id % 7 = 0
             |              THEN '/me msg ' || (event_id % 500)
             |              ELSE 'msg ' || (event_id % 500) END AS remark
             |  FROM events)
             |SELECT channel,
             |       count(DISTINCT md5(concat_ws('|', channel, nick, remark))) AS n_unique,
             |       count(*) AS n_msgs
             |FROM rec GROUP BY channel ORDER BY channel""".stripMargin)),

    // Incremental rollup maintenance: the stored-state + delta merge that
    // replaces full recompute at scale. The fact stream is split by id
    // parity so EVERY key appears in both slices — the merge must combine
    // partial states, not just concatenate disjoint ones — and the oracle
    // is the full recompute, pinning state(old ∪ new) = merge(state(old),
    // state(new)) bit-exactly.
    Q("i2_incremental_rollup",
      (s, d) => {
        val e = Tables(s, d, "events").select(
          col("event_id"), col("event_type"), to_date(col("ts")).as("day"),
          round(col("value") * 100).cast("long").as("vc"))
        val keys = Seq(col("event_type"), col("day"))
        val hist = IncrementalAgg.state(
          e.filter(col("event_id") % 2 === 0), keys, col("vc"))
        val delta = IncrementalAgg.state(
          e.filter(col("event_id") % 2 === 1), keys, col("vc"))
        IncrementalAgg.finalize(
            IncrementalAgg.merge(hist, delta, Seq("event_type", "day")))
          .orderBy(col("event_type"), col("day"))
      },
      Some("""SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
             |       min(CAST(round(value * 100) AS BIGINT)) AS min_cents,
             |       max(CAST(round(value * 100) AS BIGINT)) AS max_cents,
             |       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             |             / count(*), 6) AS avg_cents
             |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    Q("p2_filter_chain",
      (s, d) => Tables(s, d, "documents")
        .filter(length(trim(col("text"))) > 0)
        .filter(!col("text").contains("PING :"))
        .filter(length(col("source")) < IrcParser.MaxNickLen)
        .filter(col("text").contains("scan"))
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id, lang, source
             |FROM documents
             |WHERE length(trim(text)) > 0
             |  AND NOT contains(text, 'PING :')
             |  AND length(source) < 17
             |  AND contains(text, 'scan')
             |ORDER BY doc_id""".stripMargin)),

    Q("p5_conditional_rewrite",
      (s, d) => {
        val remarks = Tables(s, d, "events").select(
          col("event_id"),
          when(col("event_id") % 3 === 0, concat(lit("ACTION "), col("event_type")))
            .otherwise(col("event_type")).as("remark"))
        remarks
          .withColumn("rewritten", IrcParser.rewriteAction(col("remark")))
          .orderBy(col("event_id"))
      },
      Some("""WITH r AS (
             |  SELECT event_id,
             |         CASE WHEN event_id % 3 = 0 THEN 'ACTION ' || event_type
             |              ELSE event_type END AS remark
             |  FROM events)
             |SELECT event_id, remark,
             |       CASE WHEN starts_with(remark, 'ACTION ')
             |            THEN replace(remark, 'ACTION ', '/me ')
             |            ELSE remark END AS rewritten
             |FROM r
             |ORDER BY event_id""".stripMargin)),

    Q("f2_time_format",
      (s, d) => Tables(s, d, "orders")
        .select(
          col("o_orderkey"),
          date_format(col("o_orderdate"), "yyyy-MM-dd'T'HH:mm:ss").as("posted"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS posted
             |FROM orders
             |ORDER BY o_orderkey""".stripMargin)),

    Q("f3_content_hash",
      (s, d) => Tables(s, d, "events")
        .select(
          col("event_id"),
          HashFunctions.contentKey(col("user_id"), col("event_type"), col("props")).as("id"))
        .orderBy(col("event_id")),
      Some("""SELECT event_id,
             |       md5(concat_ws('|', CAST(user_id AS VARCHAR), event_type, props)) AS id
             |FROM events
             |ORDER BY event_id""".stripMargin)),

    Q("f5_human_bytes",
      (s, d) => {
        val b = (col("n_chars") * 8192L).as("n_bytes")
        Tables(s, d, "documents")
          .select(col("doc_id"), b)
          .withColumn("unit",
            when(col("n_bytes") < 1024L, "B")
              .when(col("n_bytes") < 1048576L, "KB")
              .when(col("n_bytes") < 1073741824L, "MB")
              .otherwise("GB"))
          .withColumn("scaled",
            when(col("n_bytes") < 1024L, col("n_bytes").cast("double"))
              .when(col("n_bytes") < 1048576L, round(col("n_bytes") / 1024.0, 2))
              .when(col("n_bytes") < 1073741824L, round(col("n_bytes") / 1048576.0, 2))
              .otherwise(round(col("n_bytes") / 1073741824.0, 2)))
          .orderBy(col("doc_id"))
      },
      Some("""WITH b AS (SELECT doc_id, n_chars * 8192 AS n_bytes FROM documents)
             |SELECT doc_id, n_bytes,
             |       CASE WHEN n_bytes < 1024 THEN 'B'
             |            WHEN n_bytes < 1048576 THEN 'KB'
             |            WHEN n_bytes < 1073741824 THEN 'MB'
             |            ELSE 'GB' END AS unit,
             |       CASE WHEN n_bytes < 1024 THEN CAST(n_bytes AS DOUBLE)
             |            WHEN n_bytes < 1048576 THEN round(n_bytes / 1024.0, 2)
             |            WHEN n_bytes < 1073741824 THEN round(n_bytes / 1048576.0, 2)
             |            ELSE round(n_bytes / 1073741824.0, 2) END AS scaled
             |FROM b
             |ORDER BY doc_id""".stripMargin)),

    // F6/F7 — string formatting / suffix extraction / repeat
    // (utils.py:39-40, irclogbot.py:107,227-233: nick[-1] * N banners).
    Q("f6_string_ops",
      (s, d) => Tables(s, d, "documents")
        .select(
          col("doc_id"),
          concat_ws(":", col("lang"), col("source")).as("tag"),
          substring(col("source"), -1, 1).as("last_ch"),
          repeat(substring(col("source"), -1, 1), 5).as("banner"),
          format_string("%s/%s", col("lang"), col("source")).as("fmt"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       concat_ws(':', lang, source) AS tag,
             |       substr(source, length(source), 1) AS last_ch,
             |       repeat(substr(source, length(source), 1), 5) AS banner,
             |       printf('%s/%s', lang, source) AS fmt
             |FROM documents
             |ORDER BY doc_id""".stripMargin)),

    // F1/F2 adjacent — calendar part extraction (year/month/day/hour agree
    // across engines; day-of-week deliberately excluded: DuckDB dow is
    // 0-Sunday vs Spark 1-Sunday).
    Q("f9_date_parts",
      (s, d) => Tables(s, d, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("dom"),
          quarter(col("o_orderdate")).as("q"),
          date_trunc("month", col("o_orderdate")).cast("date").as("month_start"))
        .orderBy(col("o_orderkey")),
      Some("""SELECT o_orderkey,
             |       CAST(year(o_orderdate) AS INTEGER) AS y,
             |       CAST(month(o_orderdate) AS INTEGER) AS m,
             |       CAST(day(o_orderdate) AS INTEGER) AS dom,
             |       CAST(quarter(o_orderdate) AS INTEGER) AS q,
             |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start
             |FROM orders ORDER BY o_orderkey""".stripMargin)),

    Q("f7_string_extra",
      (s, d) => Tables(s, d, "documents")
        .select(col("doc_id"),
          upper(col("lang")).as("lang_up"),
          lpad(col("doc_id").cast("string"), 6, "0").as("padded"),
          reverse(col("source")).as("rev"),
          translate(col("source"), "src", "SRC").as("xlat"),
          left(col("text"), lit(12)).as("prefix"))
        .orderBy(col("doc_id")),
      Some("""SELECT doc_id,
             |       upper(lang) AS lang_up,
             |       lpad(CAST(doc_id AS VARCHAR), 6, '0') AS padded,
             |       reverse(source) AS rev,
             |       translate(source, 'src', 'SRC') AS xlat,
             |       left(text, 12) AS prefix
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // F8 — JSON → MapType with map functions (keys/values/element_at).
    Q("f8_map_functions",
      (s, d) => {
        // Parse the JSON ONCE into a map column, then derive everything from
        // it — three independent from_json copies defeat codegen subexpression
        // elimination and parse per-row 3× (30.8s → ~1s at sf0.1).
        val parsed = Tables(s, d, "events")
          .select(col("event_id"),
            from_json(col("props"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.LongType)).as("m"))
        parsed
          .select(col("event_id"),
            element_at(map_keys(col("m")), 1).as("first_key"),
            size(map_keys(col("m"))).as("n_keys"),
            element_at(col("m"), "k").as("k_value"))
          .orderBy(col("event_id"))
      },
      Some("""SELECT event_id,
             |       json_keys(props)[1] AS first_key,
             |       len(json_keys(props)) AS n_keys,
             |       CAST(props ->> '$.k' AS BIGINT) AS k_value
             |FROM events ORDER BY event_id""".stripMargin)),

    Q("f8_json_extract",
      (s, d) => Tables(s, d, "events")
        .groupBy(col("event_type"))
        .agg(
          sum(get_json_object(col("props"), "$.k").cast("long")).as("k_sum"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
      Some("""SELECT event_type,
             |       CAST(sum(CAST(props ->> '$.k' AS BIGINT)) AS BIGINT) AS k_sum,
             |       count(*) AS n
             |FROM events
             |GROUP BY event_type
             |ORDER BY event_type""".stripMargin)),

    // i5 — SCD Type-2 dimension build: collapse each user's event stream
    // into versioned state intervals (state = event_type, valid_from/
    // valid_to = [this change, next change)), the slowly-changing-dimension
    // maintenance job every warehouse ingest runs. Two windows over the
    // same (user_id | us, event_id) order: a lag() change-detect, then
    // lead() on the surviving change rows to close each interval; the last
    // version per user stays open (valid_to NULL). Both windows partition
    // by user_id — no global sort, the per-user history is the only
    // window state, and at 100 TB the shuffle key is user_id exactly once
    // (Spark reuses the partitioning across the two windows and the
    // row_number, one Exchange total).
    Q("i5_scd2_dim",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("us"), col("event_type"))
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("version", row_number().over(w).cast("long"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .select(col("user_id"), col("version"),
            col("event_type").as("state"),
            col("us").as("valid_from_us"), col("valid_to_us"))
          .orderBy(col("user_id"), col("version"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             |           FROM events),
             |c AS (SELECT *, lag(event_type) OVER
             |               (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |      FROM e),
             |f AS (SELECT user_id, event_id, us, event_type
             |      FROM c WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id,
             |       row_number() OVER (PARTITION BY user_id
             |                          ORDER BY us, event_id) AS version,
             |       event_type AS state,
             |       us AS valid_from_us,
             |       lead(us) OVER (PARTITION BY user_id
             |                      ORDER BY us, event_id) AS valid_to_us
             |FROM f ORDER BY user_id, version""".stripMargin)),

    // I6 — EQL sequence with maxspan (ES EQL: `sequence by user_id
    // [view] [click] [purchase] with maxspan=48h`): a10's funnel chain with
    // each step REQUIRED within 48 hours of the previous (the fixture's
    // median first-step gap is ~32 h, so the bound genuinely prunes), emitting the
    // matched sequences themselves (first-match-per-user semantics: each
    // stage binds to its earliest qualifying event — deterministic, the
    // EQL engine's own binding order). Times stay in exact epoch-micros;
    // the span bound is an integer comparison. Scale shape = a10's:
    // user-keyed semi-join chain, each stage one filtered min-aggregate.
    Q("i6_eql_sequence",
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"))
        val span = 172800000000L
        val v = e.filter(col("event_type") === "view")
          .groupBy(col("user_id")).agg(min(col("us")).as("tv"))
        val c = e.filter(col("event_type") === "click")
          .join(v, "user_id")
          .filter(col("us") > col("tv") and col("us") <= col("tv") + span)
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("tc"), min(col("tv")).as("tv"))
        val p = e.filter(col("event_type") === "purchase")
          .join(c, "user_id")
          .filter(col("us") > col("tc") and col("us") <= col("tc") + span)
          .groupBy(col("user_id"))
          .agg(min(col("us")).as("tp"), min(col("tv")).as("tv"),
            min(col("tc")).as("tc"))
        p.select(col("user_id"), col("tv").as("view_us"),
            col("tc").as("click_us"), col("tp").as("purchase_us"),
            (col("tp") - col("tv")).as("total_span_us"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
             |           FROM events),
             |v AS (SELECT user_id, min(us) AS tv FROM e
             |      WHERE event_type = 'view' GROUP BY 1),
             |c AS (SELECT e.user_id, min(us) AS tc, min(tv) AS tv
             |      FROM e JOIN v USING (user_id)
             |      WHERE event_type = 'click'
             |        AND us > tv AND us <= tv + 172800000000
             |      GROUP BY 1),
             |p AS (SELECT e.user_id, min(us) AS tp, min(tv) AS tv,
             |             min(tc) AS tc
             |      FROM e JOIN c USING (user_id)
             |      WHERE event_type = 'purchase'
             |        AND us > tc AND us <= tc + 172800000000
             |      GROUP BY 1)
             |SELECT user_id, tv AS view_us, tc AS click_us,
             |       tp AS purchase_us, tp - tv AS total_span_us
             |FROM p ORDER BY user_id""".stripMargin)),

    // I7 — CDC MERGE apply (the Delta/Iceberg `MERGE INTO` contract as a
    // plain co-partitioned join): a target state table (latest per-user
    // state before the cut) absorbs a change batch (latest post-cut event
    // per user; 'error' is the delete marker) — matched+U updates,
    // unmatched inserts, matched+D deletes, absent keys pass through
    // unchanged. Executed as ONE full-outer equi-join on the key: both
    // sides shuffle on user_id once, the merge decision is a map-side CASE
    // — the 100 TB shape (no per-row lookups, no driver loop; at lake
    // scale the same plan runs against the target's files with the change
    // batch broadcast when small). The oracle mirrors target, batch,
    // join, and action logic, so matched/unmatched routing itself is under
    // the hash. Cut = 2024-01-16T00:00:00Z in exact epoch-micros.
    Q("i7_cdc_merge",
      (s, d) => {
        val cut = 1705363200000000L
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("us"), col("event_type"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us").desc, col("event_id").desc)
        val target = e.filter(col("us") < cut)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"), col("event_type").as("state"),
            col("us").as("state_us"))
        val cdc = e.filter(col("us") >= cut)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("user_id"),
            when(col("event_type") === "error", lit("D"))
              .otherwise(lit("U")).as("op"),
            col("event_type").as("new_state"), col("us").as("change_us"))
        target.join(cdc, Seq("user_id"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("user_id"),
            coalesce(col("new_state"), col("state")).as("state"),
            coalesce(col("change_us"), col("state_us")).as("state_us"),
            when(col("op").isNull, lit("unchanged"))
              .when(col("state").isNull, lit("inserted"))
              .otherwise(lit("updated")).as("merge_action"))
          .orderBy(col("user_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
             |                  event_type
             |           FROM events),
             |t AS (SELECT user_id, event_type AS state, us AS state_us
             |      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |                      ORDER BY us DESC, event_id DESC) AS rn
             |            FROM e WHERE us < 1705363200000000)
             |      WHERE rn = 1),
             |c AS (SELECT user_id,
             |             CASE WHEN event_type = 'error' THEN 'D'
             |                  ELSE 'U' END AS op,
             |             event_type AS new_state, us AS change_us
             |      FROM (SELECT *, row_number() OVER (PARTITION BY user_id
             |                      ORDER BY us DESC, event_id DESC) AS rn
             |            FROM e WHERE us >= 1705363200000000)
             |      WHERE rn = 1)
             |SELECT user_id, coalesce(c.new_state, t.state) AS state,
             |       coalesce(c.change_us, t.state_us) AS state_us,
             |       CASE WHEN c.op IS NULL THEN 'unchanged'
             |            WHEN t.state IS NULL THEN 'inserted'
             |            ELSE 'updated' END AS merge_action
             |FROM t FULL OUTER JOIN c USING (user_id)
             |WHERE c.op IS NULL OR c.op <> 'D'
             |ORDER BY user_id""".stripMargin))
  )
}
