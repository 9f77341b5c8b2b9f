package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** MinHash + LSH near-duplicate detection (SURVEY.md D2; the standard
  * shingle → minhash → band → bucket-join pipeline from Broder's resemblance
  * work, composed entirely from Spark higher-order functions — no UDFs, so
  * signature computation stays in whole-stage codegen and the only shuffle is
  * the band-bucket self-join.
  *
  * Scale posture (100 TB): signatures are fixed-width (`numHashes` longs) per
  * document regardless of text size; the bucket join shuffles (band,
  * bandHash, doc_id) tuples only; quadratic blowup is confined to documents
  * sharing a band bucket (true near-dups + controllable false positives via
  * bands/rows). The k seeded hash family is xxhash64(seed=i, shingle).
  */
object MinHashDedup {

  /** k-minhash signature: array<long> of length numHashes. Empty-shingle
    * docs get Long.MaxValue sentinels (array_min of empty is null →
    * coalesced).
    */
  def signature(text: Column, numHashes: Int = 64, shingleWidth: Int = 3): Column = {
    val sh = array_distinct(TextFunctions.shingles(text, shingleWidth))
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => coalesce(array_min(transform(sh, t => xxhash64(i, t))), lit(Long.MaxValue)))
  }

  /** Estimated Jaccard from two signatures = fraction of agreeing positions. */
  def estimateJaccard(sa: Column, sb: Column, numHashes: Int = 64): Column =
    aggregate(
      zip_with(sa, sb, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0),
      (acc, v) => acc + v).cast("double") / numHashes

  /** (doc_id, sig, band, band_hash) — one row per band per document. */
  def banded(
      df: DataFrame, id: Column, text: Column,
      numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must be divisible by bands")
    val rows = numHashes / bands
    df.select(id.as("doc_id"), signature(text, numHashes, shingleWidth).as("sig"))
      .select(col("doc_id"), col("sig"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          j => xxhash64(j, slice(col("sig"), j * lit(rows) + 1, lit(rows))))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "band_hash")
  }

  /** Candidate near-dup pairs (da < db) with the signature-estimated
    * Jaccard. Pairs collide in ≥1 band ⇒ LSH S-curve recall.
    */
  def candidatePairs(
      df: DataFrame, id: Column, text: Column,
      numHashes: Int = 64, bands: Int = 16, shingleWidth: Int = 3): DataFrame = {
    val bd = banded(df, id, text, numHashes, bands, shingleWidth)
    val a = bd.select(col("band"), col("band_hash"),
      col("doc_id").as("da"), col("sig").as("sa"))
    val b = bd.select(col("band").as("band_b"), col("band_hash").as("band_hash_b"),
      col("doc_id").as("db"), col("sig").as("sb"))
    a.join(b,
        col("band") === col("band_b") && col("band_hash") === col("band_hash_b") &&
          col("da") < col("db"))
      .select(col("da"), col("db"), col("sa"), col("sb"))
      .distinct()
      .select(col("da"), col("db"),
        round(estimateJaccard(col("sa"), col("sb"), numHashes), 6).as("est_jaccard"))
  }
}
