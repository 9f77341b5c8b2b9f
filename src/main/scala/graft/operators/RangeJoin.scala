package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned (equi-join-shaped) range join — SURVEY §2.6 J5 at fact×fact
  * scale.
  *
  * A range predicate between two LARGE tables defeats every hash strategy:
  * Catalyst can only plan `p BETWEEN lo AND hi` as a broadcast nested-loop
  * or cartesian join, both of which are O(|L|·|R|) row comparisons and a
  * single-executor wall at 100 TB (the broadcast variant additionally
  * requires one side to fit in memory — j5_range_join gets away with it
  * only because its build side is a dimension table).
  *
  * The standard fix (Databricks' range-join optimization, the interval-join
  * of the streaming engines) recovers an equi-join by quantizing the range
  * dimension into fixed-width bins: each range row is exploded to every bin
  * it overlaps, each point row lands in exactly one bin, the bin id becomes
  * a shuffle key for an ordinary hash join, and the exact predicate is
  * re-checked on the candidates. Each matching pair is produced exactly
  * once — a point belongs to one bin and a range covers that bin once — so
  * no dedup pass is needed. Cost: |R| × (span/binWidth + 1) exploded rows
  * and candidate pairs confined to co-binned rows; pick `binWidth` ≈ the
  * typical range span so the explosion factor stays ~2 and the join stays
  * shuffle-parallel on the bin key however large both sides grow.
  */
object RangeJoin {

  /** Exact floor division on integral columns (`div` truncates toward zero
    * and `floor(a / b)` detours through doubles; pmod keeps it integral and
    * correct for negative values, e.g. pre-1970 epochs).
    */
  private def floorDiv(c: Column, w: Long): Column =
    ((c - pmod(c, lit(w))) / w).cast("long")

  /** Join `points` to every `ranges` row whose `[loCol, hiCol]` interval
    * (inclusive) contains `pointCol`. All three columns must be integral
    * (epoch micros, sizes, keys). Rows with `lo > hi` are empty intervals
    * and dropped. Column names must be disjoint across the two inputs —
    * callers alias, same as any self-join.
    */
  def pointInRange(points: DataFrame, pointCol: String,
      ranges: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val p = points.withColumn("__bin", floorDiv(col(pointCol), binWidth))
    val r = ranges
      .filter(col(loCol) <= col(hiCol))
      .withColumn("__bin", explode(sequence(
        floorDiv(col(loCol), binWidth), floorDiv(col(hiCol), binWidth))))
    p.join(r, Seq("__bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }

  /** Join every `left` interval `[lLo, lHi]` to every `right` interval
    * `[rLo, rHi]` that OVERLAPS it (inclusive ends; the interval-join of
    * the streaming engines, both sides ranges). Same binning idea as
    * [[pointInRange]], with both sides exploded to their covered bins and
    * an equi-join on (equiKeys, bin).
    *
    * Exactly-once without a dedup shuffle: a pair whose intervals share k
    * bins would surface k times, so candidates are kept only in the bin of
    * the OVERLAP'S START, `floorDiv(greatest(lLo, rLo))` — that bin is
    * covered by both sides of a true overlap (the overlap start lies in
    * both intervals) and is unique per pair, so each match is emitted in
    * exactly one bin and `.distinct()` never runs. Empty intervals
    * (lo > hi) drop. Column names must be disjoint across inputs.
    *
    * Scale: shuffle key is (equiKeys, bin) — pick `binWidth` ≈ the typical
    * interval span so each side explodes ~2× and candidate pairs stay
    * co-binned instead of quadratic; the exact overlap predicate re-checks
    * candidates map-side after the hash join.
    */
  def intervalOverlap(left: DataFrame, lLo: String, lHi: String,
      right: DataFrame, rLo: String, rHi: String, binWidth: Long,
      equiKeys: Seq[(String, String)] = Seq.empty): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    val l = left.filter(col(lLo) <= col(lHi)).withColumn("__lbin",
      explode(sequence(floorDiv(col(lLo), binWidth), floorDiv(col(lHi), binWidth))))
    val r = right.filter(col(rLo) <= col(rHi)).withColumn("__rbin",
      explode(sequence(floorDiv(col(rLo), binWidth), floorDiv(col(rHi), binWidth))))
    val joinCond = equiKeys.map { case (a, b) => col(a) === col(b) }
      .foldLeft(col("__lbin") === col("__rbin"))(_ && _)
    l.join(r, joinCond)
      .filter(col(lLo) <= col(rHi) && col(rLo) <= col(lHi))
      .filter(col("__lbin") === floorDiv(greatest(col(lLo), col(rLo)), binWidth))
      .drop("__lbin", "__rbin")
  }
}
