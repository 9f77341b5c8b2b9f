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

  /** One-char-deletion variants with their positions: array<struct<pos,del>>.
    * Guarded for the empty term: Spark's `sequence(0, -1)` counts DOWN to
    * [0, -1] instead of yielding empty (the same trap Bpe.pairCounts
    * documents), which would fabricate bogus variants — an empty term has no
    * deletions, and its edit-distance-1 partners (single chars) are still
    * found by the insertion/deletion branch, whose variant side comes from
    * the longer term.
    */
  private def delVariants(term: Column): Column =
    when(length(term) > 0,
      transform(sequence(lit(0), length(term) - 1), i =>
        struct(i.as("pos"),
          concat(term.substr(lit(1), i), term.substr(i + 2, lit(1000000))).as("del"))))
      .otherwise(expr("array()").cast("array<struct<pos:int,del:string>>"))

  /** Distinct unordered pairs (term_a < term_b) at edit distance exactly 1.
    * `terms` must be a single-column frame of distinct strings.
    */
  def editDistance1Pairs(terms: DataFrame): DataFrame = {
    val t = terms.toDF("term")
    val variants = t.select(col("term"),
      posexplode(delVariants(col("term"))).as(Seq("ord", "v")))
      .select(col("term"), col("v.pos").as("pos"), col("v.del").as("del"))
    // substitution (and nothing else of same length): same deletion at the
    // SAME position on both sides. Pair WITHIN each (pos, del) bucket after
    // one groupBy shuffle of the variant stream — a variants⋈variants
    // self-join makes AQE broadcast the full corpus×len variant relation
    // (48 MiB at sf0.1, twice) and recompute the explode per branch, which
    // benched 5.5 s; this shape runs the same candidate set in <1 s. Bucket
    // membership is bounded by the alphabet (one term per substituted char),
    // so the within-bucket pair fan-out can't go quadratic in the corpus.
    val subst = variants.groupBy(col("pos"), col("del"))
      .agg(sort_array(collect_list(col("term"))).as("ts"))
      .filter(size(col("ts")) >= 2)
      .select(explode(expr(
        BucketPairs.pairExpr("ts", "term_a", "term_b"))).as("p"))
      .select(col("p.term_a").as("term_a"), col("p.term_b").as("term_b"))
    // insertion/deletion: the whole shorter term equals a deletion variant
    // of the longer. The raw term list is ×len smaller than the variant
    // stream it probes — broadcast it.
    val insDel = variants.as("l")
      .join(broadcast(t.select(col("term").as("sterm"))),
        col("sterm") === col("l.del"))
      .select(
        least(col("sterm"), col("l.term")).as("term_a"),
        greatest(col("sterm"), col("l.term")).as("term_b"))
    // No corpus-wide distinct: a substitution pair differing at exactly
    // position i collides in bucket (i, del_i) and no other (any other
    // deletion preserves the differing position), and subst/insDel outputs
    // are length-disjoint — only insDel can self-duplicate (a pair like
    // "ab"/"aab" matches at two deletion positions) and it is the tiny
    // branch. The levenshtein gate stays as the documented soundness check.
    subst.unionByName(insDel.distinct())
      .filter(levenshtein(col("term_a"), col("term_b")) === 1)
  }
}
