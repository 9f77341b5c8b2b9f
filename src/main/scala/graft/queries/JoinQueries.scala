package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Joins — SURVEY.md §2.6 (J1-J7).
  *
  * Scale posture: dimension tables (region/nation/supplier/part at TPC-H
  * proportions) are explicitly `broadcast()` so the fact side never shuffles
  * for them; fact-fact joins (lineitem ⋈ orders) are left to
  * sort-merge/shuffled-hash with AQE free to re-plan. The as-of join (J6) is
  * the documented composition (equi-join + range filter + ranking window) —
  * no native as-of exists in Spark SQL; at 100 TB the same shape holds
  * because the window partitions by the left key (no global sort).
  */
object JoinQueries extends QueryGroup {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  def all: Seq[Q] = Seq(

    // J1 — broadcast hash join: fact × two broadcast dims.
    Q("j1_broadcast_join",
      (s, d) => Tables(s, d, "customer")
        .join(broadcast(Tables(s, d, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables(s, d, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(
          count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy(col("r_name")),
      Some("""SELECT r_name, count(*) AS n_customers,
             |       CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS acctbal_cents
             |FROM customer
             |JOIN nation ON c_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY r_name ORDER BY r_name""".stripMargin)),

    // J2 — fact × fact shuffle join with post-join aggregation.
    Q("j2_shuffle_join",
      (s, d) => Tables(s, d, "lineitem")
        .join(Tables(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(
          count(lit(1)).as("n_items"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("revenue_cents"))
        .orderBy(col("o_orderpriority")),
      Some("""SELECT o_orderpriority, count(*) AS n_items,
             |       CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
             |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
             |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)),

    // J3 — left outer: customers with zero orders keep a 0 count.
    Q("j3_left_outer",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("o_custkey") === col("c_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey, count(o_orderkey) AS n_orders
             |FROM customer LEFT JOIN orders ON o_custkey = c_custkey
             |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin)),

    Q("j3_full_outer",
      (s, d) => Tables(s, d, "nation")
        .join(Tables(s, d, "supplier"), col("s_nationkey") === col("n_nationkey"), "full_outer")
        .select(col("n_nationkey"), col("n_name"), col("s_suppkey"))
        .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("s_suppkey")),
      Some("""SELECT n_nationkey, n_name, s_suppkey
             |FROM nation FULL OUTER JOIN supplier ON s_nationkey = n_nationkey
             |ORDER BY n_nationkey ASC NULLS FIRST, s_suppkey ASC NULLS FIRST""".stripMargin)),

    // J4 — existence joins (EXISTS / NOT EXISTS).
    Q("j4_semi_join",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
             |ORDER BY c_custkey""".stripMargin)),

    // The anti side is the RECENT orders slice, not all orders: every fixture
    // customer has some order, so an unrestricted NOT EXISTS verifies on 0
    // rows — and an operator that always returned empty would still
    // hash-match (r17 verdict #1). The date cutoff leaves 27/255 orderless
    // customers at sf0.001/sf0.01, so the anti-join's keep-side logic is
    // actually evidenced. Semantics unchanged: "customers with no order
    // since mid-2000", the churn query every retention pipeline runs.
    Q("j4_anti_join",
      (s, d) => Tables(s, d, "customer")
        .join(Tables(s, d, "orders")
            .filter(col("o_orderdate") >= lit("2000-06-01").cast("timestamp")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"))
        .orderBy(col("c_custkey")),
      Some("""SELECT c_custkey FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
             |                  AND o_orderdate >= TIMESTAMP '2000-06-01 00:00:00')
             |ORDER BY c_custkey""".stripMargin)),

    // J8 — bloom-pruned semi-join (the 100 TB shuffle-shrinker): a compact
    // bloom over the filter side's keys prunes the fact scan BEFORE the
    // shuffle; the exact semi-join afterwards removes the bounded false
    // positives, so the RESULT equals the plain semi-join — which is the
    // oracle. Demonstrates Spark's bloom_filter_agg/might_contain machinery
    // under the hash gate.
    Q("j8_bloom_semi",
      (s, d) => {
        val hi = Tables(s, d, "orders")
          .filter(col("o_totalprice") > 200000.0)
          .select(col("o_orderkey"))
        val pruned = graft.operators.BloomPrune.pruned(
          Tables(s, d, "lineitem"), col("l_orderkey"), hi, col("o_orderkey"),
          expectedItems = 100000L, numBits = 1000000L)
        pruned.join(hi, col("l_orderkey") === col("o_orderkey"), "left_semi")
          .groupBy(col("l_returnflag"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("l_quantity") * 100).cast("long")).as("qty_cents"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag, count(*) AS n,
             |       CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_cents
             |FROM lineitem
             |WHERE l_orderkey IN
             |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 200000.0)
             |GROUP BY 1 ORDER BY l_returnflag""".stripMargin)),

    // J5 — non-equi (range) join; broadcast NL over the 10-row dim.
    Q("j5_range_join",
      (s, d) => Tables(s, d, "part")
        .join(broadcast(Tables(s, d, "supplier")),
          col("p_size") >= col("s_suppkey") && col("p_size") <= col("s_suppkey") + 4)
        .select(col("p_partkey"), col("s_suppkey"))
        .orderBy(col("p_partkey"), col("s_suppkey")),
      Some("""SELECT p_partkey, s_suppkey
             |FROM part JOIN supplier
             |  ON p_size BETWEEN s_suppkey AND s_suppkey + 4
             |ORDER BY p_partkey, s_suppkey""".stripMargin)),

    // J6 — as-of join composition: for each purchase, the user's latest
    // click at or before it (equi-join on key + range + ranking window).
    Q("j6_asof_join",
      (s, d) => {
        val e = Tables(s, d, "events")
        val p = e.filter(col("event_type") === "purchase").select(
          col("event_id").as("pid"), col("user_id"),
          expr("unix_micros(ts)").as("pus"))
        val c = e.filter(col("event_type") === "click").select(
          col("event_id").as("cid"), col("user_id"),
          expr("unix_micros(ts)").as("cus"))
        graft.operators.AsOfJoin.latestAtOrBefore(
            p, c, leftId = "pid", key = "user_id",
            leftTime = "pus", rightTime = "cus")
          .select(
            col("left.pid").as("pid"), col("left.user_id").as("user_id"),
            col("right.cid").as("last_click_id"),
            (col("left.pus") - col("right.cus")).as("gap_us"))
          .orderBy(col("pid"))
      },
      Some("""WITH p AS (SELECT event_id AS pid, user_id, epoch_us(ts) AS pus
             |           FROM events WHERE event_type = 'purchase'),
             |     c AS (SELECT event_id AS cid, user_id AS cu, epoch_us(ts) AS cus
             |           FROM events WHERE event_type = 'click'),
             |     j AS (SELECT pid, user_id, cid, pus, cus,
             |                  row_number() OVER (PARTITION BY pid
             |                                     ORDER BY cus DESC NULLS LAST,
             |                                              cid DESC NULLS LAST) AS rn
             |           FROM p LEFT JOIN c ON user_id = cu AND cus <= pus)
             |SELECT pid, user_id, cid AS last_click_id, pus - cus AS gap_us
             |FROM j WHERE rn = 1 ORDER BY pid""".stripMargin)),

    // J5 at fact×fact scale — binned range join (operators/RangeJoin.scala):
    // purchases within ±30 s of each error, both sides the full events
    // table. The raw BETWEEN predicate would plan as a broadcast
    // nested-loop; binning the time axis at the window width turns it into
    // a hash join on the bin key (asserted BNLJ/cartesian-free in
    // RangeJoinSpec) with the exact predicate re-checked on co-binned
    // candidates. Inner join ⇒ errors with no nearby purchase drop out,
    // keeping the result deterministic.
    Q("j10_range_join_binned",
      (s, d) => {
        val e = Tables(s, d, "events")
        val errs = e.filter(col("event_type") === "error").select(
          col("event_id").as("err_id"),
          (expr("unix_micros(ts)") - 30000000L).as("lo"),
          (expr("unix_micros(ts)") + 30000000L).as("hi"))
        val purch = e.filter(col("event_type") === "purchase").select(
          col("event_id").as("p_id"), expr("unix_micros(ts)").as("pus"))
        graft.operators.RangeJoin.pointInRange(purch, "pus", errs, "lo", "hi",
            binWidth = 30000000L)
          .groupBy(col("err_id"))
          .agg(count(lit(1)).as("n_nearby"), min(col("p_id")).as("first_pid"))
          .orderBy(col("err_id"))
      },
      Some("""SELECT e.event_id AS err_id, count(*) AS n_nearby,
             |       min(p.event_id) AS first_pid
             |FROM events e JOIN events p
             |  ON e.event_type = 'error' AND p.event_type = 'purchase'
             | AND epoch_us(p.ts) BETWEEN epoch_us(e.ts) - 30000000
             |                        AND epoch_us(e.ts) + 30000000
             |GROUP BY 1 ORDER BY 1""".stripMargin)),

    // J7 — explicit cross join (5×5).
    Q("j7_cross_join",
      (s, d) => {
        val r1 = Tables(s, d, "region").select(col("r_name").as("a"))
        val r2 = Tables(s, d, "region").select(col("r_name").as("b"))
        r1.crossJoin(r2).orderBy(col("a"), col("b"))
      },
      Some("""SELECT r1.r_name AS a, r2.r_name AS b
             |FROM region r1 CROSS JOIN region r2
             |ORDER BY a, b""".stripMargin)),

    // J11 — exact fuzzy self-join (edit distance 1) by deletion-neighborhood
    // blocking: the shuffle carries O(names × length) variant keys, never
    // the O(n²) pair space — while the ORACLE does the honest brute-force
    // levenshtein join, so blocking completeness itself is under the hash
    // gate (a missed candidate = missing row = hash mismatch).
    Q("j11_fuzzy_join",
      (s, d) => graft.operators.FuzzyJoin.editDistance1Pairs(
        Tables(s, d, "customer").select(col("c_name")).distinct())
        .orderBy(col("term_a"), col("term_b")),
      Some("""WITH v AS (SELECT DISTINCT c_name AS term FROM customer)
             |SELECT a.term AS term_a, b.term AS term_b
             |FROM v a JOIN v b
             |  ON a.term < b.term AND levenshtein(a.term, b.term) = 1
             |ORDER BY term_a, term_b""".stripMargin)),

    // J12 — point-in-time (temporal) join: each probe row picks the
    // dimension version whose [valid_from, valid_to) interval contains its
    // timestamp — the SCD2 lookup every feature-store / training-snapshot
    // pipeline runs (no leakage: a probe never sees a state from its
    // future). Dim = i5_scd2_dim's intervals built from the full event
    // stream; probes = the 'error' events. Executed as an equi-join on
    // user_id with the interval predicate as join filter: the pair space is
    // user-local (bounded by that user's state-change count), so it
    // shuffles on user_id like any fact-fact join — the j10 bin rewrite is
    // the fallback for dims with huge per-key histories, and j6's as-of
    // window the alternative when the dim is the same stream. Intervals
    // partition each user's timeline, so every probe matches exactly once;
    // no post-join dedup.
    Q("j12_point_in_time",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
        val e = Tables(s, d, "events")
          .select(col("user_id"), col("event_id"),
            expr("unix_micros(ts)").as("us"), col("event_type"))
        val dim = e
          .withColumn("prev", lag(col("event_type"), 1).over(w))
          .filter(col("prev").isNull || col("prev") =!= col("event_type"))
          .withColumn("valid_to_us", lead(col("us"), 1).over(w))
          .select(col("user_id"), col("event_type").as("state"),
            col("us").as("valid_from_us"), col("valid_to_us"))
          .as("dm")
        val probe = e.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id"), col("us"))
          .as("p")
        probe.join(dim,
            col("p.user_id") === col("dm.user_id") &&
              col("p.us") >= col("dm.valid_from_us") &&
              (col("dm.valid_to_us").isNull ||
                col("p.us") < col("dm.valid_to_us")))
          .select(col("p.event_id").as("event_id"),
            col("p.user_id").as("user_id"), col("p.us").as("us"),
            col("dm.state").as("state"),
            col("dm.valid_from_us").as("valid_from_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us, event_type
             |           FROM events),
             |c AS (SELECT *, lag(event_type) OVER
             |               (PARTITION BY user_id ORDER BY us, event_id) AS prev
             |      FROM e),
             |f AS (SELECT user_id, event_id, us, event_type
             |      FROM c WHERE prev IS NULL OR prev <> event_type),
             |dim AS (SELECT user_id, event_type AS state, us AS valid_from_us,
             |               lead(us) OVER (PARTITION BY user_id
             |                              ORDER BY us, event_id) AS valid_to_us
             |        FROM f),
             |p AS (SELECT user_id, event_id, us FROM e WHERE event_type = 'error')
             |SELECT p.event_id, p.user_id, p.us, dim.state, dim.valid_from_us
             |FROM p JOIN dim ON p.user_id = dim.user_id
             |  AND p.us >= dim.valid_from_us
             |  AND (dim.valid_to_us IS NULL OR p.us < dim.valid_to_us)
             |ORDER BY p.event_id""".stripMargin)),

    // J13 — interval-overlap join (both sides ranges; the interval join of
    // the streaming engines): competing shipments of the SAME part from
    // DIFFERENT suppliers whose shipping windows overlap. The window is
    // [shipdate, shipdate + quantity days] — the fixture carries no
    // receiptdate, so quantity stands in for transit days (deterministic;
    // a real TPC-H would use l_receiptdate). Plan shape is the part that
    // matters: both sides explode to 32-day bins, the hash join runs on
    // (partkey, bin), and each pair is emitted exactly once in its
    // overlap-start bin — no distinct, no cartesian, no nested loop (see
    // RangeJoin.intervalOverlap). The oracle runs the brute-force theta
    // self-join, so the binned rewrite's completeness is oracle-gated.
    Q("j13_interval_overlap",
      (s, d) => {
        val li = Tables(s, d, "lineitem")
        def iv(p: String) = li.select(
            col("l_partkey").as(s"${p}part"), col("l_suppkey").as(s"${p}supp"),
            (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as(s"${p}id"),
            datediff(col("l_shipdate").cast("date"),
              to_date(lit("1970-01-01"))).cast("long").as(s"${p}lo"),
            col("l_quantity").cast("long").as(s"${p}q"))
          .withColumn(s"${p}hi", col(s"${p}lo") + col(s"${p}q"))
          .drop(s"${p}q")
        graft.operators.RangeJoin.intervalOverlap(
            iv("a"), "alo", "ahi", iv("b"), "blo", "bhi", 32L,
            Seq(("apart", "bpart")))
          .filter(col("asupp") =!= col("bsupp") && col("aid") < col("bid"))
          .select(col("apart").as("p_key"), col("aid").as("ida"),
            col("bid").as("idb"),
            (least(col("ahi"), col("bhi")) -
              greatest(col("alo"), col("blo")) + 1).as("overlap_days"))
          .orderBy(col("ida"), col("idb"))
      },
      Some("""WITH l AS (
             |  SELECT l_partkey, l_suppkey,
             |         CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS id,
             |         CAST(datediff('day', DATE '1970-01-01',
             |                       CAST(l_shipdate AS DATE)) AS BIGINT) AS lo,
             |         CAST(datediff('day', DATE '1970-01-01',
             |                       CAST(l_shipdate AS DATE))
             |              + CAST(l_quantity AS BIGINT) AS BIGINT) AS hi
             |  FROM lineitem)
             |SELECT a.l_partkey AS p_key, a.id AS ida, b.id AS idb,
             |       CAST(least(a.hi, b.hi) - greatest(a.lo, b.lo) + 1 AS BIGINT)
             |         AS overlap_days
             |FROM l a JOIN l b
             |  ON a.l_partkey = b.l_partkey AND a.id < b.id
             |WHERE a.l_suppkey <> b.l_suppkey
             |  AND a.lo <= b.hi AND b.lo <= a.hi
             |ORDER BY ida, idb""".stripMargin))
  )
}
