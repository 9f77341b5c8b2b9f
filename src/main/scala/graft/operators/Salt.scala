package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by salting (SURVEY.md §4 "optimize for scale"): a
  * two-phase aggregation that spreads one hot key over `buckets` shuffle
  * partitions, then merges the partials. Results are identical to the direct
  * aggregation (oracle-paired in a1_count_salted); only the shuffle shape
  * changes. AQE's skew handling covers joins; salting covers skewed
  * *aggregations*, where a single hot group would otherwise serialize on one
  * task.
  */
object Salt {

  /** count + long-sum aggregation over `key`, salted into `buckets`.
    * `sums` maps output column name → long column to sum.
    *
    * The salt must be DETERMINISTIC per row: it is derived from the full row
    * content (or `saltOn`, e.g. a unique id column), never from
    * monotonically_increasing_id(), which is nondeterministic under shuffle
    * fetch-failure retries — a re-executed map task could assign rows to
    * different buckets than the attempt other reducers already consumed,
    * double-counting or dropping rows. Duplicate rows share a bucket, which
    * only narrows the spread, never changes the result.
    */
  def saltedCountSum(
      df: DataFrame, key: Column, buckets: Int,
      sums: Map[String, Column] = Map.empty,
      saltOn: Option[Column] = None): DataFrame = {
    val salt = saltOn.getOrElse(xxhash64(df.columns.map(col).toSeq: _*))
    val salted = df.select(
      key.as("__key") +:
        (pmod(salt, lit(buckets)).as("__salt")) +:
        sums.map { case (n, c) => c.as(s"__v_$n") }.toSeq: _*)
    val partial = salted
      .groupBy(col("__key"), col("__salt"))
      .agg(count(lit(1)).as("__pn"),
        sums.keys.map(n => sum(col(s"__v_$n")).as(s"__ps_$n")).toSeq: _*)
    partial
      .groupBy(col("__key"))
      .agg(sum(col("__pn")).as("n"),
        sums.keys.map(n => sum(col(s"__ps_$n")).as(n)).toSeq: _*)
      .withColumnRenamed("__key", "key")
  }

  /** Skew-join salting: spread a hot join key over `buckets` partitions by
    * salting the SKEWED (fact) side deterministically and replicating the
    * other side once per bucket, then joining on (key, salt). Result is
    * row-identical to the plain join (asserted in OperatorSpec); only the
    * shuffle shape changes — no single reducer owns a hot key. Use when AQE
    * skew handling can't kick in (e.g. the skew only materializes after
    * upstream transforms, or the join is wrapped in a cogroup). The
    * replicated side grows ×buckets — size it like a broadcast budget.
    */
  def saltedJoin(
      skewed: DataFrame, other: DataFrame, key: String, buckets: Int,
      joinType: String = "inner"): DataFrame = {
    val salt = pmod(xxhash64(skewed.columns.map(col).toSeq: _*), lit(buckets))
    val l = skewed.withColumn("__salt", salt)
    val r = other
      .withColumn("__salt", explode(sequence(lit(0L), lit(buckets - 1L))))
    l.join(r, Seq(key, "__salt"), joinType).drop("__salt")
  }
}
