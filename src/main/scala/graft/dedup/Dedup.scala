package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{HashFunctions, TextFunctions}

/** One front door for the dedup family (the LLM-pipeline operator set):
  * exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding-cosine —
  * pick by cost/quality; all return either a deduped frame or candidate
  * pairs with a score, on the same column conventions.
  */
object Dedup {

  /** Exact dedup by content key over `cols`: keeps one deterministic
    * representative per key (min of `orderCol`). The reference's
    * upsert-by-id semantics as a batch op.
    */
  def exact(df: DataFrame, orderCol: Column, cols: Column*): DataFrame = {
    val w = Window.partitionBy(HashFunctions.contentKey(cols: _*)).orderBy(orderCol)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Exact-duplicate groups by normalized-text fingerprint. */
  def exactTextGroups(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(TextFunctions.fingerprint(text).as("fp"))
      .agg(sort_array(collect_list(id)).as("doc_ids"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** MinHash-LSH near-dup candidate pairs (estimated Jaccard). */
  def minhashPairs(df: DataFrame, id: Column, text: Column,
      minEstJaccard: Double = 0.5): DataFrame =
    MinHashDedup.candidatePairs(df, id, text, minEstJaccard = minEstJaccard)

  /** SimHash near-dup candidate pairs (Hamming distance). */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int = 3): DataFrame =
    SimHashDedup.candidatePairs(df, id, text, maxHamming)

  /** Exact n-gram Jaccard pairs within (blockCols) blocks. */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
      minJaccard: Double, blockCols: Seq[Column] = Seq.empty): DataFrame = {
    val block = if (blockCols.isEmpty) Seq(lit(1).as("__b")) else
      blockCols.zipWithIndex.map { case (c, i) => c.as(s"__b$i") }
    val toks = df.select((id.as("doc_id") +: block) :+
        explode(TextFunctions.bigrams(text)).as("term"): _*)
      .distinct()
    val bnames = toks.columns.filter(_.startsWith("__b"))
    val sizes = toks.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val right = toks.select(col("doc_id").as("db") +:
      col("term").as("tb") +: bnames.map(b => col(b).as(s"${b}_r")): _*)
    val joinCond = bnames.map(b => col(b) === col(s"${b}_r"))
      .foldLeft(col("term") === col("tb") && col("doc_id") < col("db"))(_ && _)
    toks.join(right, joinCond)
      .groupBy(col("doc_id").as("da"), col("db"))
      .agg(count(lit(1)).as("i"))
      .join(sizes.select(col("doc_id").as("da"), col("sz").as("sa")), "da")
      .join(sizes.select(col("doc_id").as("db"), col("sz").as("sb")), "db")
      .withColumn("jaccard", col("i").cast("double") / (col("sa") + col("sb") - col("i")))
      .filter(col("jaccard") >= minJaccard)
      .select(col("da"), col("db"), col("jaccard"))
  }

  /** Embedding-cosine near-dup pairs (exact baseline; LSH/IVF pruned
    * variants live in graft.similarity.Ann).
    */
  def embeddingPairs(df: DataFrame, id: Column, vec: Column,
      minCosine: Double): DataFrame =
    graft.similarity.Ann.pairsExact(df, id, vec, minCosine)
}
