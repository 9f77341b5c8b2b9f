package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental rollup maintenance — the materialized-view pattern every
  * 100 TB pipeline runs: a stored pre-aggregate absorbs each new partition
  * by MERGING PARTIAL STATES instead of re-scanning history. Sound for
  * algebraic aggregates only (count/sum/min/max merge; avg derives from
  * (n, sum) at read time — never merge averages).
  *
  * The scale math: a day's delta is ~1/365 of the corpus, and the merge
  * shuffles only the rollup keys (already aggregated — tiny), so daily
  * maintenance costs O(delta) instead of O(history). The `i2` oracle pins
  * the invariant that makes that legal: state(old ∪ new) =
  * merge(state(old), state(new)), checked bit-exactly against the
  * full-recompute SQL.
  */
object IncrementalAgg {

  /** Partial state for one slice of the fact stream: per-key
    * (n, sum_cents, min_cents, max_cents). `valueCents` must already be an
    * exact integer column — merging float partials would make the result
    * depend on merge order.
    */
  def state(df: DataFrame, keys: Seq[Column], valueCents: Column): DataFrame =
    df.groupBy(keys: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(valueCents).as("sum_cents"),
        min(valueCents).as("min_cents"),
        max(valueCents).as("max_cents"))

  /** Merge partial states (same schema, same key columns). Associative and
    * commutative, so states can arrive per-partition, per-day, or per-shard
    * in any order.
    */
  def merge(a: DataFrame, b: DataFrame, keyNames: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy(keyNames.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))

  /** Read-time finalization: derive the non-mergeable average from the
    * mergeable (n, sum) pair — one double divide, round 6.
    */
  def finalize(state: DataFrame): DataFrame =
    state.withColumn("avg_cents",
      round(col("sum_cents").cast("double") / col("n"), 6))
}
