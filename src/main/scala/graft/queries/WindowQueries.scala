package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Window functions — SURVEY.md §2.8 (W1-W3): ranking, lag/lead gap
  * analysis (the sessionization basis), running frames. All window specs
  * partition by a key so state stays per-partition at scale — no global
  * ordering is ever required.
  */
object WindowQueries extends QueryGroup {

  private def cents(c: Column): Column = round(c * 100).cast("long")

  def all: Seq[Q] = Seq(

    Q("w1_ranking",
      (s, d) => {
        val wTies = Window.partitionBy(col("event_type")).orderBy(col("user_id"))
        val wUniq = Window.partitionBy(col("event_type"))
          .orderBy(col("user_id"), col("event_id"))
        Tables(s, d, "events")
          .select(col("event_id"), col("event_type"), col("user_id"))
          .withColumn("rn", row_number().over(wUniq))
          .withColumn("rk", rank().over(wTies))
          .withColumn("drk", dense_rank().over(wTies))
          .withColumn("quartile", ntile(4).over(wUniq))
          .orderBy(col("event_type"), col("rn"))
      },
      Some("""SELECT event_id, event_type, user_id,
             |       row_number() OVER (PARTITION BY event_type ORDER BY user_id, event_id) AS rn,
             |       rank() OVER (PARTITION BY event_type ORDER BY user_id) AS rk,
             |       dense_rank() OVER (PARTITION BY event_type ORDER BY user_id) AS drk,
             |       ntile(4) OVER (PARTITION BY event_type ORDER BY user_id, event_id) AS quartile
             |FROM events
             |ORDER BY event_type, rn""".stripMargin)),

    // W2 — inter-event gap per user in exact microseconds (lag + lead).
    Q("w2_lag_gap",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
        Tables(s, d, "events")
          .select(col("event_id"), col("user_id"), expr("unix_micros(ts)").as("us"))
          .withColumn("gap_us", col("us") - lag(col("us"), 1).over(w))
          .withColumn("next_gap_us", lead(col("us"), 1).over(w) - col("us"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS us,
             |       epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
             |       lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS next_gap_us
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY event_id)
             |ORDER BY user_id, event_id""".stripMargin)),

    // W3 — running totals (unbounded preceding frame) in exact cents.
    Q("w3_running_sum",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "events")
          .select(col("event_id"), col("event_type"), cents(col("value")).as("vc"))
          .withColumn("running_cents", sum(col("vc")).over(w))
          .withColumn("running_n", count(lit(1)).over(w))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""SELECT event_id, event_type,
             |       CAST(round(value * 100) AS BIGINT) AS vc,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS running_cents,
             |       count(*) OVER w AS running_n
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY event_type, event_id""".stripMargin)),

    // W3 — moving average over a bounded 4-row frame; exact integer sum then
    // one double division keeps FP deterministic.
    Q("w3_moving_avg",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("event_id"))
          .rowsBetween(-3, Window.currentRow)
        Tables(s, d, "events")
          .select(col("event_id"), col("event_type"), cents(col("value")).as("vc"))
          .withColumn("mavg",
            round(sum(col("vc")).over(w).cast("double") / count(lit(1)).over(w) / 100.0, 6))
          .orderBy(col("event_type"), col("event_id"))
      },
      Some("""SELECT event_id, event_type,
             |       CAST(round(value * 100) AS BIGINT) AS vc,
             |       round(CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS DOUBLE)
             |             / count(*) OVER w / 100.0, 6) AS mavg
             |FROM events
             |WINDOW w AS (PARTITION BY event_type ORDER BY event_id
             |             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
             |ORDER BY event_type, event_id""".stripMargin)),

    // W5 — SLIDING time windows (ST5's batch mirror): 10-minute windows
    // advancing every minute, so each event contributes to size/slide = 10
    // overlapping buckets. Spark's `window()` aligns starts to epoch
    // multiples of the slide, which DuckDB mirrors as
    // date_trunc('minute', ts) - k minutes for k in 0..9. Sum goes through
    // exact integer cents; (ws, event_type) is a unique total order.
    Q("w5_sliding_window",
      (s, d) => Tables(s, d, "events")
        .groupBy(window(col("ts"), "10 minutes", "1 minute"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("cents"))
        .select(
          date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
          col("event_type"), col("n"), col("cents"))
        .orderBy(col("ws"), col("event_type")),
      Some("""WITH w AS (
             |  SELECT date_trunc('minute', ts) - to_minutes(g.k) AS ws, event_type,
             |         CAST(round(value * 100) AS BIGINT) AS vc
             |  FROM events CROSS JOIN (SELECT unnest(range(0, 10)) AS k) g)
             |SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS ws, event_type,
             |       count(*) AS n, CAST(sum(vc) AS BIGINT) AS cents
             |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)),

    // W4 — batch sessionization: the lag-gap → session-start flag →
    // running-sum session id pattern (30-minute inactivity gap). This is the
    // batch mirror of the streaming session_window (ST5).
    Q("w4_sessionize",
      (s, d) => {
        val wOrd = Window.partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "events")
          .select(col("user_id"), col("event_id"), expr("unix_micros(ts)").as("us"))
          .withColumn("prev", lag(col("us"), 1).over(wOrd))
          .withColumn("is_start",
            when(col("prev").isNull || col("us") - col("prev") > 1800000000L, 1)
              .otherwise(0))
          .withColumn("session_id", sum(col("is_start")).over(wRun))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n"), min(col("us")).as("start_us"),
            max(col("us")).as("end_us"))
          .orderBy(col("user_id"), col("session_id"))
      },
      Some("""WITH o AS (SELECT user_id, event_id, epoch_us(ts) AS us,
             |                  lag(epoch_us(ts)) OVER (PARTITION BY user_id
             |                                          ORDER BY epoch_us(ts), event_id) AS prev
             |           FROM events),
             |     m AS (SELECT user_id, event_id, us,
             |                  CASE WHEN prev IS NULL OR us - prev > 1800000000
             |                       THEN 1 ELSE 0 END AS is_start
             |           FROM o),
             |     s AS (SELECT user_id, us,
             |                  CAST(sum(is_start) OVER (PARTITION BY user_id
             |                                           ORDER BY us, event_id
             |                                           ROWS BETWEEN UNBOUNDED PRECEDING
             |                                           AND CURRENT ROW) AS BIGINT) AS session_id
             |           FROM m)
             |SELECT user_id, session_id, count(*) AS n,
             |       min(us) AS start_us, max(us) AS end_us
             |FROM s GROUP BY user_id, session_id
             |ORDER BY user_id, session_id""".stripMargin)),

    // W6 — distribution + frame-edge windows: percent_rank / cume_dist over
    // a total per-partition order (cents, event_id — unique, so both are
    // deterministic), plus first/last_value over the running frame. Doubles
    // rounded to 6 after the (exact-rank / exact-count) division.
    Q("w6_distribution",
      (s, d) => {
        val wOrd = Window.partitionBy(col("event_type"))
          .orderBy(col("vc"), col("event_id"))
        val wRun = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables(s, d, "events")
          .select(col("event_id"), col("event_type"), cents(col("value")).as("vc"))
          .withColumn("pr", round(percent_rank().over(wOrd), 6))
          .withColumn("cd", round(cume_dist().over(wOrd), 6))
          .withColumn("first_vc", first(col("vc")).over(wRun))
          .withColumn("last_vc", last(col("vc")).over(wRun))
          .orderBy(col("event_type"), col("vc"), col("event_id"))
      },
      Some("""WITH c AS (SELECT event_id, event_type,
             |                  CAST(round(value * 100) AS BIGINT) AS vc
             |           FROM events)
             |SELECT event_id, event_type, vc,
             |       round(percent_rank() OVER w, 6) AS pr,
             |       round(cume_dist() OVER w, 6) AS cd,
             |       first_value(vc) OVER wr AS first_vc,
             |       last_value(vc) OVER wr AS last_vc
             |FROM c
             |WINDOW w AS (PARTITION BY event_type ORDER BY vc, event_id),
             |       wr AS (PARTITION BY event_type ORDER BY vc, event_id
             |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             |ORDER BY event_type, vc, event_id""".stripMargin)),

    // W7 — RANGE frames (vs w3's ROW frames): per-user trailing 10-minute
    // value window keyed on event TIME, not row position — the frame an
    // alerting/rate query actually means. RANGE includes all peers of the
    // current ORDER BY value on both engines, so ties in `us` are
    // deterministic by definition.
    Q("w7_range_frame",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
          .rangeBetween(-600000000L, Window.currentRow)
        Tables(s, d, "events")
          .select(col("event_id"), col("user_id"),
            expr("unix_micros(ts)").as("us"), cents(col("value")).as("vc"))
          .withColumn("trail_cents", sum(col("vc")).over(w))
          .withColumn("trail_n", count(lit(1)).over(w))
          .orderBy(col("user_id"), col("us"), col("event_id"))
      },
      Some("""SELECT event_id, user_id, epoch_us(ts) AS us,
             |       CAST(round(value * 100) AS BIGINT) AS vc,
             |       CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS trail_cents,
             |       count(*) OVER w AS trail_n
             |FROM events
             |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
             |ORDER BY user_id, us, event_id""".stripMargin)),

    // W8 — time-series resampling with forward fill: build the full hourly
    // spine (sequence over the global min..max hour), outer-join each
    // type's last-observed state per hour, and carry it across gaps with
    // last(IGNORE NULLS) — the gap-filling every dashboard/feature-join
    // needs. State is an exact bigint (the max event_id in the hour), so
    // the fill is deterministic; leading hours before a type's first
    // event stay null on both engines.
    Q("w8_resample_ffill",
      (s, d) => {
        val e = Tables(s, d, "events")
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            col("event_id"))
        val hourly = e.groupBy(col("event_type"), col("h"))
          .agg(max(col("event_id")).as("last_id"))
        // spine bounds and the type list both derive from `hourly` (every
        // type has >= 1 event, and min/max of the truncated hours are the
        // same over e and hourly) — this avoids two extra full scans of
        // events, and AQE's ReuseExchange serves all three consumers from
        // the one hourly aggregation
        val spine = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val types = hourly.select(col("event_type")).distinct()
        spine.crossJoin(broadcast(types))
          .join(hourly, Seq("event_type", "h"), "left_outer")
          .withColumn("filled_id",
            last(col("last_id"), ignoreNulls = true).over(
              org.apache.spark.sql.expressions.Window
                .partitionBy(col("event_type")).orderBy(col("h"))
                .rowsBetween(Long.MinValue, 0)))
          .select(col("event_type"), col("h"), col("filled_id"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h, event_id
             |           FROM events),
             |hourly AS (SELECT event_type, h, max(event_id) AS last_id
             |           FROM e GROUP BY 1, 2),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM e),
             |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             |          FROM b),
             |ty AS (SELECT DISTINCT event_type FROM e),
             |g AS (SELECT ty.event_type, spine.h, hourly.last_id
             |      FROM spine CROSS JOIN ty
             |      LEFT JOIN hourly ON hourly.event_type = ty.event_type
             |                      AND hourly.h = spine.h)
             |SELECT event_type, h,
             |       last_value(last_id IGNORE NULLS) OVER (
             |         PARTITION BY event_type ORDER BY h
             |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_id
             |FROM g ORDER BY event_type, h""".stripMargin)),

    // W9 — resample with LINEAR INTERPOLATION, the w8 twin for continuous
    // metrics: gaps in the hourly per-type value series are filled by the
    // straight line between the flanking observed hours (edges take the
    // nearest observed value). Same spine/type scaffolding as w8 (one
    // hourly aggregate feeds spine bounds, type list and values through
    // AQE exchange reuse); the interpolation is two IGNORE NULLS window
    // probes per direction over the CALENDAR-BOUNDED spine (hours × types
    // — thousands of rows regardless of corpus size), and the arithmetic
    // runs one mirrored IEEE sequence over exact integer cents and
    // floor-epoch second positions.
    Q("w9_resample_interpolate",
      (s, d) => {
        val W = org.apache.spark.sql.expressions.Window
        val e = Tables(s, d, "events")
          .select(col("event_type"), date_trunc("hour", col("ts")).as("h"),
            round(col("value") * 100).cast("long").as("vc"))
        val hourly = e.groupBy(col("event_type"), col("h"))
          .agg(sum(col("vc")).as("v"))
        val spine = hourly.agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
          .select(explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
        val types = hourly.select(col("event_type")).distinct()
        val back = W.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(Long.MinValue, 0)
        val fwd = W.partitionBy(col("event_type")).orderBy(col("h"))
          .rowsBetween(0, Long.MaxValue)
        val hs = unix_timestamp(col("h"))
        val obsH = when(col("v").isNotNull, hs)
        val g = spine.crossJoin(broadcast(types))
          .join(hourly, Seq("event_type", "h"), "left_outer")
          .withColumn("pv", last(col("v"), ignoreNulls = true).over(back))
          .withColumn("ph", last(obsH, ignoreNulls = true).over(back))
          .withColumn("nv", first(col("v"), ignoreNulls = true).over(fwd))
          .withColumn("nh", first(obsH, ignoreNulls = true).over(fwd))
        g.select(col("event_type"), col("h"),
            round(
              when(col("v").isNotNull, col("v").cast("double"))
                .when(col("pv").isNull, col("nv").cast("double"))
                .when(col("nv").isNull, col("pv").cast("double"))
                .otherwise(col("pv").cast("double") +
                  (col("nv").cast("double") - col("pv").cast("double")) *
                    ((hs - col("ph")) / (col("nh") - col("ph")))),
              6).as("v_interp"))
          .orderBy(col("event_type"), col("h"))
      },
      Some("""WITH e AS (SELECT event_type, date_trunc('hour', ts) AS h,
             |                  CAST(round(value * 100) AS BIGINT) AS vc
             |           FROM events),
             |hourly AS (SELECT event_type, h, CAST(sum(vc) AS BIGINT) AS v
             |           FROM e GROUP BY 1, 2),
             |b AS (SELECT min(h) AS h0, max(h) AS h1 FROM hourly),
             |spine AS (SELECT unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
             |          FROM b),
             |ty AS (SELECT DISTINCT event_type FROM hourly),
             |g AS (SELECT ty.event_type, spine.h, hourly.v,
             |             CAST(floor(epoch(spine.h)) AS BIGINT) AS hs,
             |             CASE WHEN hourly.v IS NOT NULL
             |                  THEN CAST(floor(epoch(spine.h)) AS BIGINT) END AS oh
             |      FROM spine CROSS JOIN ty
             |      LEFT JOIN hourly ON hourly.event_type = ty.event_type
             |                      AND hourly.h = spine.h),
             |w AS (SELECT event_type, h, v, hs,
             |             last_value(v IGNORE NULLS) OVER wb AS pv,
             |             last_value(oh IGNORE NULLS) OVER wb AS ph,
             |             first_value(v IGNORE NULLS) OVER wf AS nv,
             |             first_value(oh IGNORE NULLS) OVER wf AS nh
             |      FROM g
             |      WINDOW wb AS (PARTITION BY event_type ORDER BY h
             |                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
             |             wf AS (PARTITION BY event_type ORDER BY h
             |                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
             |SELECT event_type, h,
             |       round(CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
             |                  WHEN pv IS NULL THEN CAST(nv AS DOUBLE)
             |                  WHEN nv IS NULL THEN CAST(pv AS DOUBLE)
             |                  ELSE CAST(pv AS DOUBLE)
             |                       + (CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
             |                         * ((hs - ph) / (nh - ph)) END,
             |             6) AS v_interp
             |FROM w ORDER BY event_type, h""".stripMargin)),

    // W10 — gaps-and-islands: longest consecutive-active-day streak per
    // user (the classic island trick: epochday − row_number is constant
    // within a run, so islands fall out of ONE ranking window + ONE hash
    // agg — no self-join, no iteration). Tie-break: equal-length streaks
    // resolve to the earliest start. All integers; the per-user cut is a
    // second (tiny, user-keyed) window over the island frame.
    Q("w10_longest_streak",
      (s, d) => {
        val days = Tables(s, d, "events")
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val islands = days
          .withColumn("grp",
            datediff(col("day"), lit("1970-01-01")).cast("long")
              - row_number().over(w))
          .groupBy(col("user_id"), col("grp"))
          .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
        val pick = Window.partitionBy(col("user_id"))
          .orderBy(col("len").desc, col("start_day"))
        islands.withColumn("rk", row_number().over(pick))
          .filter(col("rk") === 1)
          .groupBy(col("user_id"))
          .agg(max(col("len")).as("longest_streak"),
            min(col("start_day")).as("streak_start"))
          .join(days.groupBy(col("user_id"))
            .agg(count(lit(1)).as("n_active_days")), "user_id")
          .select(col("user_id"), col("n_active_days"),
            col("longest_streak"), col("streak_start"))
          .orderBy(col("user_id"))
      },
      Some("""WITH days AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
             |              FROM events),
             |g AS (SELECT user_id, day,
             |             CAST(datediff('day', DATE '1970-01-01', day)
             |                  AS BIGINT)
             |               - row_number() OVER (PARTITION BY user_id
             |                   ORDER BY day) AS grp
             |      FROM days),
             |isl AS (SELECT user_id, grp, count(*) AS len,
             |               min(day) AS start_day
             |        FROM g GROUP BY 1, 2),
             |pick AS (SELECT *, row_number() OVER (PARTITION BY user_id
             |                ORDER BY len DESC, start_day) AS rk
             |         FROM isl),
             |act AS (SELECT user_id, count(*) AS n_active_days
             |        FROM days GROUP BY 1)
             |SELECT p.user_id, act.n_active_days,
             |       p.len AS longest_streak, p.start_day AS streak_start
             |FROM pick p JOIN act USING (user_id)
             |WHERE rk = 1 ORDER BY p.user_id""".stripMargin)),

    // W11 — cume_dist / percent_rank: the two distribution window
    // functions W1's ranking family left out (ES exposes the same pair
    // as the `percentile_rank` view of a bucket ordering). Both are
    // tie-stable by definition — every row of a tie group gets the same
    // value — so ordering by the non-unique vc is deterministic and no
    // synthetic tie-break can change the payload. One partition-local
    // sort per event_type, zero joins; at 100 TB this is the same
    // per-key sorted window every w-query pays, nothing more.
    Q("w11_cume_dist",
      (s, d) => {
        val w = Window.partitionBy(col("event_type")).orderBy(col("vc"))
        Tables(s, d, "events")
          .select(col("event_id"), col("event_type"),
            cents(col("value")).as("vc"))
          .withColumn("pr", round(percent_rank().over(w), 6))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .orderBy(col("event_type"), col("vc"), col("event_id"))
      },
      Some("""WITH v AS (SELECT event_id, event_type,
             |                  CAST(round(value * 100) AS BIGINT) AS vc
             |           FROM events)
             |SELECT event_id, event_type, vc,
             |       round(percent_rank() OVER (PARTITION BY event_type
             |               ORDER BY vc), 6) AS pr,
             |       round(cume_dist() OVER (PARTITION BY event_type
             |               ORDER BY vc), 6) AS cd
             |FROM v ORDER BY event_type, vc, event_id""".stripMargin)),

    // W12 — last-touch attribution: every purchase is attributed to the
    // SAME USER's most recent strictly-preceding click (id + exact-µs
    // gap), null when no click precedes — the standard conversion
    // attribution shape. One per-user ordered window carrying
    // last(click, ignoreNulls) over ROWS … AND 1 PRECEDING; no join, no
    // second scan — at 100 TB this is the same per-key sorted pass every
    // w-query pays, and the carried state is two longs per row. (The
    // as-of JOIN family j6/j12 solves the two-table version; this is the
    // single-timeline version a funnel pipeline runs in place.)
    Q("w12_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables(s, d, "events")
          .select(col("event_id"), col("user_id"), col("event_type"),
            expr("unix_micros(ts)").as("us"))
          .withColumn("click_id",
            last(when(col("event_type") === "click", col("event_id")),
              ignoreNulls = true).over(w))
          .withColumn("click_us",
            last(when(col("event_type") === "click", col("us")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(col("event_id"), col("user_id"), col("us"),
            col("click_id"), (col("us") - col("click_us")).as("gap_us"))
          .orderBy(col("event_id"))
      },
      Some("""WITH t AS (
             |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us,
             |         last_value(CASE WHEN event_type = 'click'
             |                         THEN event_id END IGNORE NULLS)
             |           OVER w AS click_id,
             |         last_value(CASE WHEN event_type = 'click'
             |                         THEN epoch_us(ts) END IGNORE NULLS)
             |           OVER w AS click_us
             |  FROM events
             |  WINDOW w AS (PARTITION BY user_id
             |               ORDER BY epoch_us(ts), event_id
             |               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
             |SELECT event_id, user_id, us, click_id,
             |       us - click_us AS gap_us
             |FROM t WHERE event_type = 'purchase'
             |ORDER BY event_id""".stripMargin))
  )
}
