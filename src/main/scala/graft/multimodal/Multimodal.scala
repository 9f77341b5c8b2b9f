package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (SURVEY.md north-star): image/audio/video as opaque
  * `binary` payloads with typed metadata, plus decode / feature-extract /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real and tested (schema, typed Encoders,
  * partition-preserving `mapPartitions` batching — the Scala analog of a
  * Pandas-batch UDF); the *codec* itself is STUBBED with a deterministic
  * fake ([[MediaCodec.decodeStub]]) because no image/audio libraries exist
  * in this container. Swapping in a real codec changes one function, none of
  * the plumbing.
  */
case class MediaRecord(doc_id: Long, kind: String, payload: Array[Byte])

case class MediaFeatures(
    doc_id: Long,
    kind: String,
    n_bytes: Long,
    width: Int,
    height: Int,
    mean_intensity: Double,
    histogram: Array[Long])

object MediaCodec {
  /** STUB: a real implementation would decode the image/audio container.
    * This deterministic fake derives "pixels" from the payload bytes so the
    * downstream plumbing (batching, schema, aggregation) is fully
    * exercisable and reproducible.
    */
  def decodeStub(payload: Array[Byte]): (Int, Int, Array[Int]) = {
    val n = payload.length
    val width = math.max(1, math.min(64, n))
    val height = math.max(1, n / math.max(width, 1))
    val pixels = payload.map(b => b & 0xff)
    (width, height, pixels)
  }
}

object Multimodal {

  /** Wrap a text/binary source into MediaRecords (binary column + metadata).
    * `kind` is derived deterministically so all downstream group-bys have
    * realistic multi-modal shape.
    */
  def toMedia(df: DataFrame, idCol: String, payloadCol: String)(
      implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    df.select(
      col(idCol).cast("long").as("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (pmod(col(idCol), lit(3)) + 1).cast("int")).as("kind"),
      col(payloadCol).cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Batched decode + feature extraction: one partition = one batch loop,
    * no per-row task overhead, executes distributed (never on the driver).
    */
  def extractFeatures(media: Dataset[MediaRecord])(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { batch =>
      batch.map { rec =>
        val (w, h, px) = MediaCodec.decodeStub(rec.payload)
        val hist = new Array[Long](8)
        var sum = 0L
        px.foreach { p => hist(p >> 5) += 1; sum += p }
        MediaFeatures(
          rec.doc_id, rec.kind, rec.payload.length.toLong, w, h,
          if (px.isEmpty) 0.0 else sum.toDouble / px.length, hist)
      }
    }
  }

  /** Frame sampling (video analog): every `stride`-th fixed-size window of
    * the payload as one "frame" — pure column ops, no UDF.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("frame_idx",
        explode(sequence(lit(0),
          greatest(lit(0), ((length(col("payload")) - frameBytes) / stride)).cast("int"))))
      .select(col("doc_id"), col("kind"), col("frame_idx"),
        col("payload").substr(col("frame_idx") * stride + 1, lit(frameBytes)).as("frame"))

  /** Resize stub: truncate/pad the payload to a fixed byte budget (the
    * plumbing for a real resize — fixed-size output per record).
    */
  def resizeStub(media: DataFrame, targetBytes: Int): DataFrame =
    media.withColumn("payload_resized",
      substring(col("payload"), 1, targetBytes))
}
