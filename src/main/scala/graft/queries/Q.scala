package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine query.
  *
  * @param name   stable id, prefixed with the SURVEY.md §2 inventory row it
  *               implements (e.g. `a2_date_histogram` = row A2)
  * @param run    the Spark-first implementation
  * @param oracle equivalent ANSI SQL for the driver's DuckDB differential
  *               check; None for ops DuckDB can't mirror (hash-seeded LSH,
  *               approximate ops) — those get a rows-only check + scalatest.
  *
  * Determinism rules (SURVEY.md §5.2): every oracle-paired query ends in a
  * total ORDER BY over a unique key; double aggregates go through exact
  * integer cents (`round(x*100)::bigint`) or `round(_, 6)`; null sort order
  * pinned NULLS FIRST on both sides.
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryGroup {
  def all: Seq[Q]
}
