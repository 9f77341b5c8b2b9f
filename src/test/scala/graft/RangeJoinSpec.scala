package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin
import graft.queries.Registry

/** Binned range join (operators/RangeJoin.scala): exact equivalence to the
  * naive theta join, exactly-once pair production across bin boundaries,
  * and the plan claim — an equi-join on the bin key, never a broadcast
  * nested-loop or cartesian.
  */
class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def naive(points: org.apache.spark.sql.DataFrame,
      ranges: org.apache.spark.sql.DataFrame) =
    points.join(ranges, col("p") >= col("lo") && col("p") <= col("hi"))

  test("matches the theta join across bin widths (boundary straddles included)") {
    // points on and around bin edges; ranges spanning 0, 1, 2+ bins
    val points = Seq(0L, 1L, 9L, 10L, 11L, 19L, 20L, 25L, 99L, 100L, -5L, -10L)
      .zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("pid", "p")
    val ranges = Seq((0L, 0L), (0L, 9L), (5L, 14L), (10L, 30L), (-12L, -1L),
      (95L, 105L), (20L, 20L), (7L, 7L), (50L, 40L)) // last one is empty (lo>hi)
      .zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
      .toDF("rid", "lo", "hi")
    val exp = naive(points, ranges)
      .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", w)
        .select("pid", "rid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet === exp, s"binWidth=$w")
    }
  }

  test("intervalOverlap matches the theta join, exactly once, across bin widths") {
    // intervals spanning 0/1/2/many bins, inclusive-endpoint touches,
    // negatives, an empty (lo > hi) row, and pairs sharing MANY bins (the
    // dedup-free exactly-once claim is only interesting when they do)
    val a = Seq((0L, 0L, 0L), (1L, 0L, 9L), (2L, 5L, 40L), (3L, -12L, -1L),
      (4L, 95L, 105L), (5L, 50L, 40L)).toDF("aid", "alo", "ahi")
    val b = Seq((10L, 9L, 9L), (11L, 10L, 39L), (12L, 0L, 100L),
      (13L, -20L, -12L), (14L, 41L, 44L), (15L, 60L, 50L)).toDF("bid", "blo", "bhi")
    val exp = a.filter(col("alo") <= col("ahi"))   // empty intervals drop,
      .join(b.filter(col("blo") <= col("bhi")),    // same as the operator
        col("alo") <= col("bhi") && col("blo") <= col("ahi"))
      .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (w <- Seq(1L, 3L, 10L, 1000L)) {
      val got = RangeJoin.intervalOverlap(a, "alo", "ahi", b, "blo", "bhi", w)
        .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.length === got.toSet.size, s"duplicate pairs at binWidth=$w")
      assert(got.toSet === exp, s"binWidth=$w")
    }
  }

  test("plan: equi-join on the bin key, no BNLJ / cartesian") {
    val e = Tables(spark, sf, "events")
    val errs = e.filter(col("event_type") === "error").select(
      col("event_id").as("err_id"),
      (expr("unix_micros(ts)") - 30000000L).as("lo"),
      (expr("unix_micros(ts)") + 30000000L).as("hi"))
    val purch = e.filter(col("event_type") === "purchase").select(
      col("event_id").as("p_id"), expr("unix_micros(ts)").as("pus"))
    val joined = RangeJoin.pointInRange(purch, "pus", errs, "lo", "hi", 30000000L)
    joined.collect()
    val plan = df2FinalPlan(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("__bin"), plan)
  }

  test("intervalOverlap plan: hash join on (key, bin), no BNLJ / cartesian") {
    // the j13 registry query's structural claim — AQE may pick broadcast
    // (fixture scale) or sort-merge (100 TB), but the join must stay a
    // HASH-keyed strategy on the extracted (partkey, bin) equalities and
    // never degenerate to a nested loop over the exploded sides
    val joined = Registry.byName("j13_interval_overlap").run(spark, sf)
    joined.collect()
    val plan = df2FinalPlan(joined)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("empty intervals (lo > hi) produce no pairs") {
    val points = Seq((1L, 5L)).toDF("pid", "p")
    val ranges = Seq((1L, 9L, 3L)).toDF("rid", "lo", "hi")
    assert(RangeJoin.pointInRange(points, "p", ranges, "lo", "hi", 4L).count() === 0)
  }

  test("negative binWidth rejected") {
    val df = Seq((1L, 1L)).toDF("a", "b")
    intercept[IllegalArgumentException] {
      RangeJoin.pointInRange(df, "a", df.toDF("lo", "hi"), "lo", "hi", 0L)
    }
  }

  private def df2FinalPlan(df: org.apache.spark.sql.DataFrame): String =
    (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }).toString
}
