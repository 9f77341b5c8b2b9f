package graft.queries

import org.apache.spark.sql.functions._

import graft.Tables
import graft.multimodal.Multimodal

/** Multimodal-column pipeline (SURVEY.md north-star): binary payloads +
  * typed metadata, batched decode via mapPartitions, frame sampling. The
  * codec is a deterministic stub (see graft.multimodal.MediaCodec) — the
  * fixture `documents.text` UTF-8 bytes stand in for media payloads, which
  * makes the whole plumbing DuckDB-oracle-checkable: byte lengths, stub
  * dimensions and mean intensity are pure arithmetic over the same bytes.
  */
object MultimodalQueries extends QueryGroup {

  def all: Seq[Q] = Seq(

    // M1 — binary ingestion + batched feature extraction (decode stub).
    Q("m1_media_features",
      (s, d) => {
        implicit val sp = s
        val media = Multimodal.toMedia(Tables(s, d, "documents"), "doc_id", "text")
        Multimodal.extractFeatures(media)
          .toDF()
          .select(col("doc_id"), col("kind"), col("n_bytes"),
            col("width"), col("height"), round(col("mean_intensity"), 6).as("mean_intensity"))
          .orderBy(col("doc_id"))
      },
      // ASCII fixture text ⇒ bytes == chars; the stub's geometry and mean
      // intensity are reproducible in SQL.
      Some("""WITH m AS (
             |  SELECT doc_id,
             |         ['image','audio','video'][(doc_id % 3) + 1] AS kind,
             |         strlen(text) AS n_bytes,
             |         text
             |  FROM documents)
             |SELECT doc_id, kind, n_bytes,
             |       CAST(greatest(1, least(64, n_bytes)) AS INTEGER) AS width,
             |       CAST(greatest(1, n_bytes // greatest(1, least(64, n_bytes))) AS INTEGER) AS height,
             |       round(list_sum(list_transform(string_split(text, ''), c -> ascii(c))) * 1.0
             |             / n_bytes, 6) AS mean_intensity
             |FROM m
             |ORDER BY doc_id""".stripMargin)),

    // M2 — frame sampling: fixed-size strided windows over the payload.
    Q("m2_frame_sample",
      (s, d) => {
        implicit val sp = s
        val media = Multimodal.toMedia(Tables(s, d, "documents"), "doc_id", "text")
          .toDF()
        Multimodal.sampleFrames(media, frameBytes = 16, stride = 64)
          .select(col("doc_id"), col("frame_idx"),
            decode(col("frame"), "UTF-8").as("frame"))
          .orderBy(col("doc_id"), col("frame_idx"))
      },
      Some("""SELECT doc_id, i AS frame_idx, substr(text, i * 64 + 1, 16) AS frame
             |FROM documents,
             |     unnest(generate_series(0, greatest(0, (length(text) - 16) // 64))) AS t(i)
             |ORDER BY doc_id, frame_idx""".stripMargin))
  )
}
