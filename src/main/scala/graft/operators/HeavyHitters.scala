package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Misra-Gries heavy hitters (SURVEY §2.5 extension — the frequency-sketch
  * family next to HLL cardinality).
  *
  * The 100 TB shape: a full `groupBy(term)` over a web-scale token stream
  * shuffles the ENTIRE vocabulary — billions of distinct keys, almost all of
  * which are irrelevant to a "terms with frequency > N/φ" question. The
  * classic two-pass answer (Misra-Gries '82):
  *
  *  1. one map-side pass builds a k-counter MG sketch per partition
  *     (`treeAggregate` — partial sketches merge pairwise up a tree, the
  *     driver receives ONE k-entry map, never the vocabulary). The MG
  *     guarantee: every term with true count > N/k survives in the sketch,
  *     regardless of partitioning or merge order.
  *  2. a second exact pass counts ONLY the ≤ k surviving candidates (a
  *     broadcast hash-set filter — the shuffle now carries at most k keys).
  *
  * With k ≥ φ the candidate set provably contains every true heavy hitter,
  * so pass 2's output is bit-identical to the exact full-shuffle query —
  * which is why `a12_heavy_hitters_mg` sits under the full DuckDB hash gate
  * rather than a weaker rows-only check, sketch notwithstanding.
  *
  * Merge rule (Agarwal et al., "Mergeable Summaries", PODS'12): sum counts,
  * then subtract the (k+1)-th largest count and drop non-positive entries —
  * keeps the sketch size ≤ k and preserves the undercount bound N/k.
  */
object HeavyHitters {

  /** One MG sketch: term → lower-bound count, at most k entries. */
  def misraGries(terms: Dataset[String], k: Int): Map[String, Long] = {
    require(k >= 1, s"misraGries: k must be >= 1, got $k")
    val zero = mutable.HashMap.empty[String, Long]
    val sketch = terms.rdd.treeAggregate(zero)(
      seqOp = (m, t) => insert(m, t, k),
      combOp = (a, b) => merge(a, b, k))
    sketch.toMap
  }

  private[graft] def insert(
      m: mutable.HashMap[String, Long], t: String, k: Int): mutable.HashMap[String, Long] = {
    m.get(t) match {
      case Some(c) => m.update(t, c + 1)
      case None if m.size < k => m.update(t, 1L)
      case None =>
        // decrement-all: the classic MG step — one miss pays one count from
        // every live counter; entries hitting zero free their slot
        val dead = mutable.ListBuffer.empty[String]
        m.mapValuesInPlace((_, c) => c - 1)
        m.foreach { case (key, c) => if (c <= 0) dead += key }
        dead.foreach(m.remove)
    }
    m
  }

  private[graft] def merge(
      a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long],
      k: Int): mutable.HashMap[String, Long] = {
    b.foreach { case (t, c) => a.update(t, a.getOrElse(t, 0L) + c) }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, drop <= 0
      val kth = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.mapValuesInPlace((_, c) => c - kth)
      val dead = a.collect { case (t, c) if c <= 0 => t }.toSeq
      dead.foreach(a.remove)
    }
    a
  }

  /** Exact heavy hitters via sketch-prune + recount: terms whose exact
    * count × phi exceeds the stream length. `k` must be ≥ phi for the MG
    * containment guarantee (enforced). Output: (term, cnt), exact.
    */
  def exactViaSketch(df: DataFrame, term: Column, phi: Int, k: Int): DataFrame = {
    require(k >= phi, s"exactViaSketch: need k >= phi for containment, got k=$k phi=$phi")
    val spark = df.sparkSession
    import spark.implicits._
    val terms = df.select(term.cast("string").as("term"))
    val candidates = misraGries(terms.as[String], k).keySet
    // pass 2: broadcast the <= k candidate terms, count them exactly, and
    // apply the threshold against the exact total (integer compare — no
    // division, so the oracle mirrors it exactly)
    val total = terms.count()
    terms
      .filter(col("term").isInCollection(candidates))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") * phi > total)
      .orderBy(col("cnt").desc, col("term"))
  }
}
