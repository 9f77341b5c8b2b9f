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

  /** DSIR-style importance weight (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling"): per-document
    * log(p_target(x) / p_raw(x)) under two unigram models — target trained
    * on the `isTarget` in-domain subset, raw on the full corpus. High
    * weights mark documents whose token mix resembles the target domain;
    * resampling by weight shifts a 100 TB corpus toward the domain without
    * hard filtering. Both models are Laplace-smoothed with the RAW vocab
    * size v — p(t) = (cnt + 1) / (n + v) — so target-unseen tokens carry a
    * finite penalty and every token of every document is scorable.
    *
    * Determinism: each side's log-prob is quantized to integer micros
    * separately (two mirrored IEEE sequences), the per-token weight is
    * their exact integer difference, and the per-doc sum is integer —
    * associative, partition-order-proof. Count models are tiny → broadcast.
    * Output: (doc_id, n_toks, w_micro, avg_w) per document with ≥1 token.
    */
  def dsirWeight(df: DataFrame, id: Column, text: Column,
      isTarget: Column): DataFrame = {
    val toks = df.select(id.as("doc_id"), isTarget.as("tgt"),
      explode(TextFunctions.tokens(text)).as("term"))
    val raw = toks.groupBy(col("term")).agg(count(lit(1)).as("rc"))
    val tgt = toks.filter(col("tgt")).groupBy(col("term"))
      .agg(count(lit(1)).as("tc"))
    val consts = raw.agg(
      sum(col("rc")).cast("long").as("n_raw"),
      count(lit(1)).cast("long").as("v"))
      .crossJoin(toks.filter(col("tgt"))
        .agg(count(lit(1)).cast("long").as("n_tgt")))
    toks
      .join(broadcast(raw), "term")
      .join(broadcast(tgt), Seq("term"), "left_outer")
      .crossJoin(broadcast(consts))
      .select(col("doc_id"),
        (quantLog((coalesce(col("tc"), lit(0L)) + lit(1L)) * lit(1.0)
            / (col("n_tgt") + col("v")))
          - quantLog((col("rc") + lit(1L)) * lit(1.0)
            / (col("n_raw") + col("v")))).as("w_tok_micro"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_toks"), sum(col("w_tok_micro")).as("w_micro"))
      .select(col("doc_id"), col("n_toks"), col("w_micro"),
        round((col("w_micro") * lit(1.0) / Micro) / col("n_toks"), 6).as("avg_w"))
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
