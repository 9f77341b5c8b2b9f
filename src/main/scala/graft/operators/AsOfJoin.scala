package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generalized as-of join (SURVEY.md J6): for each left row, the single
  * latest right row with the same key and rightTime ≤ leftTime (optionally
  * within a tolerance window). Spark has no native as-of operator; this is
  * the documented composition — equi-join on key + time-range predicate +
  * per-left-row ranking window.
  *
  * Scale notes: the join is a plain equi-join on `key`, so it shuffles both
  * sides once by key (or broadcasts a small right side); the window
  * partitions by the left row id, so ranking state never exceeds one left
  * row's candidate set. For dense right sides, pass `tolerance` to bound
  * candidates per left row.
  */
object AsOfJoin {

  /** @param left       left rows; must contain `leftId` (unique), `key`, `leftTime`
    * @param right      right rows; must contain `key`, `rightTime`
    * @param tolerance  max leftTime - rightTime (same unit as the time
    *                   columns) or None for unbounded lookback
    */
  def latestAtOrBefore(
      left: DataFrame, right: DataFrame,
      leftId: String, key: String, leftTime: String,
      rightTime: String, tolerance: Option[Column] = None): DataFrame = {
    val l = left.select(
      col(leftId).as("__lid"), col(key).as("__lkey"), col(leftTime).as("__lt"),
      struct(left.columns.map(col): _*).as("left"))
    val r = right.select(
      col(key).as("__rkey"), col(rightTime).as("__rt"),
      struct(right.columns.map(col): _*).as("right"))
    val range = tolerance match {
      case Some(tol) => col("__rt") <= col("__lt") && col("__rt") >= col("__lt") - tol
      case None => col("__rt") <= col("__lt")
    }
    // full-row tiebreak keeps the pick deterministic when right times tie
    val w = Window.partitionBy(col("__lid"))
      .orderBy(col("__rt").desc_nulls_last, col("right").desc_nulls_last)
    // left_outer: conventional as-of semantics — every left row survives;
    // a left row with no qualifying right row carries a null `right` struct
    // (its partition holds exactly that one row, so __rn = 1 keeps it).
    l.join(r, col("__lkey") === col("__rkey") && range, "left_outer")
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col("left"), col("right"))
  }
}
