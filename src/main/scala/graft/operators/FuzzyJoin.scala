package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact edit-distance-1 self-join via deletion-neighborhood blocking
  * (the FastSS family): the scale answer to "which terms are one typo
  * apart" that never compares all pairs.
  *
  * Completeness argument (why the candidate set misses nothing):
  *  - insertion/deletion pair (|a| = |b|±1): the shorter string IS a
  *    one-char deletion of the longer → matched by joining whole terms
  *    against deletion variants.
  *  - substitution pair (|a| = |b|, differ at position i): deleting
  *    position i from BOTH yields the same string → matched by joining
  *    deletion variants on (position, variant).
  * Soundness comes from a final `levenshtein == 1` filter over candidates
  * only (a variant collision can also be produced by equal strings;
  * nothing at distance ≥ 2 can collide under either rule).
  *
  * Cost: a term of length L explodes to L variants, so the shuffle carries
  * O(corpus × avg_len) keyed rows instead of the O(|vocab|²) pair space —
  * the same explode-then-equi-join shape as the MinHash band join (D2),
  * applied to string similarity.
  */
object FuzzyJoin {

  /** One-char-deletion variants with their positions: array<struct<pos,del>>. */
  private def delVariants(term: Column): Column =
    transform(sequence(lit(0), length(term) - 1), i =>
      struct(i.as("pos"),
        concat(term.substr(lit(1), i), term.substr(i + 2, lit(1000000))).as("del")))

  /** Distinct unordered pairs (term_a < term_b) at edit distance exactly 1.
    * `terms` must be a single-column frame of distinct strings.
    */
  def editDistance1Pairs(terms: DataFrame): DataFrame = {
    val t = terms.toDF("term")
    val variants = t.select(col("term"),
      posexplode(delVariants(col("term"))).as(Seq("ord", "v")))
      .select(col("term"), col("v.pos").as("pos"), col("v.del").as("del"))
    // substitution (and nothing else of same length): same deletion at the
    // SAME position on both sides
    val subst = variants.as("a")
      .join(variants.as("b"),
        col("a.pos") === col("b.pos") && col("a.del") === col("b.del") &&
          col("a.term") < col("b.term"))
      .select(col("a.term").as("term_a"), col("b.term").as("term_b"))
    // insertion/deletion: the whole shorter term equals a deletion variant
    // of the longer
    val insDel = t.as("s")
      .join(variants.as("l"), col("s.term") === col("l.del"))
      .select(
        least(col("s.term"), col("l.term")).as("term_a"),
        greatest(col("s.term"), col("l.term")).as("term_b"))
    subst.unionByName(insDel)
      .distinct()
      .filter(levenshtein(col("term_a"), col("term_b")) === 1)
  }
}
