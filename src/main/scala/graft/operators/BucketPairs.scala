package graft.operators

/** Shared within-bucket pair enumeration: given a sorted array column,
  * expand the i < j pairs as structs — the common kernel of every
  * blocked-candidate generator (FuzzyJoin (pos,del) buckets, phash band
  * buckets). One definition so a pairing-order or slicing fix cannot
  * silently diverge between call sites.
  */
object BucketPairs {

  /** SQL expr producing array<struct<aField, bField>> of ordered pairs
    * from the sorted array column `arr`; explode it at the call site.
    */
  private[graft] def pairExpr(arr: String, aField: String, bField: String): String =
    s"flatten(transform(sequence(1, size($arr) - 1), " +
      s"i -> transform(slice($arr, i + 1, size($arr)), " +
      s"x -> struct(element_at($arr, i) AS $aField, x AS $bField))))"
}
