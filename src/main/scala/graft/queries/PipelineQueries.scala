package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.pipeline.DataSplit

/** Dataset-preparation operators (the training-pipeline north star):
  * deterministic content-hash sampling, stable train/valid/test splits,
  * token-budget chunk packing. All pure functions of the data (md5 of the
  * id, never rand()), so every op carries an exact DuckDB mirror — and
  * re-runs reproduce the same assignment bit-for-bit at any scale.
  */
object PipelineQueries extends QueryGroup {

  /** DuckDB mirror of [[DataSplit.hashBucket]]. */
  private def duckBucket(salt: String): String =
    s"CAST(('0x' || substr(md5('$salt:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100"

  def all: Seq[Q] = Seq(

    // x5 — deterministic ~10% sample by id hash (map-side, no shuffle; the
    // sampling every corpus-scale experiment needs to be repeatable).
    Q("x5_hash_sample",
      (s, d) => DataSplit.sample(Tables(s, d, "documents"), col("doc_id"), 10)
        .select(col("doc_id"), col("lang"))
        .orderBy(col("doc_id")),
      Some(s"""SELECT doc_id, lang
              |FROM documents
              |WHERE ${duckBucket("sample")} < 10
              |ORDER BY doc_id""".stripMargin)),

    // x5 — stable train/valid/test assignment: adding documents never
    // reshuffles existing rows (hash of id, not position).
    Q("x5_hash_split",
      (s, d) => Tables(s, d, "documents")
        .select(col("lang"), DataSplit.split(col("doc_id")).as("split"))
        .groupBy(col("lang"), col("split"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("split")),
      Some(s"""WITH b AS (
              |  SELECT lang, ${duckBucket("split")} AS bkt FROM documents)
              |SELECT lang,
              |       CASE WHEN bkt < 80 THEN 'train'
              |            WHEN bkt < 90 THEN 'valid'
              |            ELSE 'test' END AS split,
              |       count(*) AS n
              |FROM b GROUP BY 1, 2 ORDER BY lang, split""".stripMargin)),

    // x6 — token-budget chunk packing: cumsum window per lang, chunk id =
    // tokens-before / budget. One shuffle on the group key.
    Q("x6_token_packing",
      (s, d) => DataSplit.packChunks(Tables(s, d, "documents"),
        col("lang"), col("doc_id"), col("text"), budget = 512)
        .select(col("grp"), col("doc_id"), col("n_tok").cast("long").as("n_tok"),
          col("chunk"))
        .orderBy(col("grp"), col("doc_id")),
      Some("""WITH t AS (
             |  SELECT lang AS grp, doc_id,
             |         len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_tok
             |  FROM documents)
             |SELECT grp, doc_id, n_tok,
             |       CAST(floor((sum(n_tok) OVER (PARTITION BY grp ORDER BY doc_id)
             |                   - n_tok) / 512) AS BIGINT) AS chunk
             |FROM t ORDER BY grp, doc_id""".stripMargin))
  )
}
