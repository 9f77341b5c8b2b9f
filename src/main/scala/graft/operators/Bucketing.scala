package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (co-located) joins — SURVEY.md §4's "pre-partitioning" lever.
  * Writing both fact tables bucketed+sorted on the join key lets repeated
  * joins run with ZERO shuffle: the scan is already hash-partitioned and
  * sorted, so SortMergeJoin consumes it directly (no Exchange in the plan —
  * asserted in BucketingSpec). At 100 TB this converts the recurring
  * join-shuffle of a pipeline's hottest key into a one-time write cost.
  */
object Bucketing {

  /** `path = Some(dir)` writes an external table there instead of the
    * session warehouse — Verify/Bench sessions run with the default
    * warehouse (the repo cwd), so registry queries keep their bucket files
    * in the system temp dir.
    */
  def writeBucketed(df: DataFrame, table: String, nBuckets: Int,
      key: String, sortCols: Seq[String] = Seq.empty,
      path: Option[String] = None): Unit = {
    val sorted = if (sortCols.isEmpty) Seq(key) else sortCols
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(nBuckets, key)
      .sortBy(sorted.head, sorted.tail: _*)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket key (shuffle-free when both
    * sides were written with the same bucket count on `key`).
    */
  def bucketJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)
}
