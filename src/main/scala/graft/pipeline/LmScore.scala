package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Corpus-LM quality scoring (CCNet-style): score each document by its
  * mean token log-probability under a language model trained on the corpus
  * itself — unigram ([[unigramAvgLogProb]]) or bigram-conditional
  * ([[bigramAvgLogProb]], the order-sensitive fluency signal). Low scores
  * mark rare-token soup (mojibake, boilerplate IDs); the bigram variant
  * additionally craters on scrambled word order that unigram stats can't
  * see.
  *
  * Determinism contract (shared with the x12/x14 oracle queries): each
  * per-token log-prob is quantized to integer MICROS with tie-free
  * floor(x·1e6 + 0.5), so the per-doc sum is exact integer arithmetic —
  * associative and partition-order-proof; only the final average performs
  * a float divide. The count models are tiny aggregates of the token
  * stream and broadcast into the scoring join.
  */
object LmScore {

  private val Micro = lit(1000000.0)

  private def quantLog(p: Column): Column =
    floor(log(p) * Micro + lit(0.5)).cast("long")

  /** (doc_id, n_toks, sum_lp_micro, avg_lp) per document with ≥1 token. */
  def unigramAvgLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), explode(TextFunctions.tokens(text)).as("term"))
    val uni = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val n = uni.agg(sum(col("cnt")).cast("long").as("n"))
    toks
      .join(broadcast(uni), "term")
      .crossJoin(broadcast(n))
      .select(col("doc_id"),
        quantLog(col("cnt") * lit(1.0) / col("n")).as("lp_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("lp_micro")).as("sum_lp_micro"))
      .select(col("doc_id"), col("n_toks"), col("sum_lp_micro"),
        round((col("sum_lp_micro") * lit(1.0) / Micro) / col("n_toks"), 6).as("avg_lp"))
  }

  /** (doc_id, n_bigrams, sum_lp_micro, avg_lp) per document with ≥2 tokens;
    * P(tᵢ | tᵢ₋₁) = c(bigram) / c(prefix position) from the bigram stream
    * itself, so the conditionals sum to 1 per prefix.
    */
  def bigramAvgLogProb(df: DataFrame, id: Column, text: Column): DataFrame = {
    val bg = df.select(id.as("doc_id"), explode(TextFunctions.bigrams(text)).as("bigram"))
    val bgc = bg.groupBy(col("bigram")).agg(count(lit(1)).as("bc"))
    val pc = bg.select(substring_index(col("bigram"), " ", 1).as("prefix"))
      .groupBy(col("prefix")).agg(count(lit(1)).as("pcnt"))
    bg
      .join(broadcast(bgc), "bigram")
      .select(col("doc_id"), col("bc"),
        substring_index(col("bigram"), " ", 1).as("prefix"))
      .join(broadcast(pc), "prefix")
      .select(col("doc_id"),
        quantLog(col("bc") * lit(1.0) / col("pcnt")).as("lp_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp_micro")).as("sum_lp_micro"))
      .select(col("doc_id"), col("n_bigrams"), col("sum_lp_micro"),
        round((col("sum_lp_micro") * lit(1.0) / Micro) / col("n_bigrams"), 6).as("avg_lp"))
  }
}
