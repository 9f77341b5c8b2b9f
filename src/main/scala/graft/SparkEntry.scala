package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query (SURVEY.md §7.2): messages per channel-analog per hour,
    * deduplicated by content key — the reference's entire semantic chain
    * (stamp → key → dedup → histogram) on fixture data. Driver smoke-checks
    * rows > 0 on sf0.001.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    Tables(spark, dir, "events")
      .withColumn("id", functions.HashFunctions.contentKey(
        col("user_id"), col("event_type"), col("props")))
      .dropDuplicates("id")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"), col("hour"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Registry.all.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (seeded
    * LSH / approximate) → driver records a weaker rows-only check.
    */
  def oracleSql: Map[String, String] =
    Registry.all.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Truth-definition baselines excluded from the BENCHED set (r14 verdict
    * #2): each is an intentionally quadratic oracle/recall reference whose
    * production counterpart (the banded-LSH / prefix-filtered twin, which
    * STAYS benched) is the plan you would run at 100×. They remain in
    * [[queries]]/[[oracleSql]] — the correctness gate still runs all of
    * them — but the bench measures the scale paths, not the truth
    * definitions: FOUR driver windows in a row (r10/r12/r14/r15)
    * hard-flagged this family under host contention because the unpruned
    * postings self-join's pair stream cliffs when execution memory shrinks,
    * and the 2 GiB canary reproduces 5-90 s swings on an idle host.
    * d12_containment joined the excluded set in r16 (r15 verdict #1: it
    * ran the same unpruned pairIntersections core and was the last benched
    * member — median 7.6× in the driver's r15 window). Benched twins:
    * d2_minhash_lsh / d2_minhash_md5 / d2_jaccard_prefix (near-dup pairs),
    * d12_containment_prefix (containment), d3_dedup_groups_lsh (clusters),
    * d10_dedup_yield_lsh (yield report). Bench includes them anyway under
    * SPARK_GRAFT_BENCH_ALL=1 or an explicit SPARK_GRAFT_BENCH_ONLY filter.
    *
    * m3_phash_pairs joined in r20 (r19 verdict #2): its doc-level pair
    * enumeration measured 36.9× at 10× data (BENCH_sf1_full.json) and was
    * excluded from the 30× artifact by its own documented cliff (459 s in
    * the 10× probe on the low-entropy fixture) — same truth-definition
    * shape as the d2/d3/d10/d12 family. Its distinct-hash scale twin
    * m3_phash_pairs_distinct (flat 2.35 → 2.14 s at 30×) stays benched.
    */
  val benchExcluded: Set[String] =
    Set("d2_jaccard_neardup", "d3_dedup_groups", "d10_dedup_yield",
      "d12_containment", "m3_phash_pairs")
}
