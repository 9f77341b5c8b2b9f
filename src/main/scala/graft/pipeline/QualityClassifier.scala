package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Classifier-based quality filtering (COVERAGE "Quality filtering"
  * extension): train a tiny logistic-regression scorer IN-ENGINE on
  * rule-derived labels, then score every document — the shape of DCLM /
  * FineWeb-Edu-style model-based curation (a cheap linear probe distills a
  * teacher signal and the corpus is filtered by the probe's score), with
  * the expensive teacher replaced by a deterministic rule so the whole
  * train→score loop sits under the DuckDB hash gate.
  *
  * Determinism protocol (the x12/x16 integer-micros technique): the only
  * order-sensitive float op in full-batch GD is the gradient SUM over
  * docs. Each doc's per-feature contribution (y − σ(w·x))·x_j is quantized
  * to integer micros map-side — floor(g·1e6 + 0.5) — and summed EXACTLY,
  * so the update is addition-order-free. Weights live in integer micros;
  * the dot product scales down once per evaluation. σ's exp() is the
  * single library-float op; it is evaluated per doc on both engines and
  * quantized immediately after, so an engine mismatch needs the exact
  * value within ~1 ulp of a 0.5-micro boundary. Fixed [[Iters]] = 3
  * full-batch rounds, η = [[Eta]] = 4 (a power of two: the learning-rate
  * scaling is EXACT in binary), w₀ = 0. All dot products and gradient
  * products are written with one fixed parenthesization, mirrored
  * literally in the oracle SQL.
  *
  * Scale shape: features are one map-side projection (cached via
  * Caches.track by the caller's composition; here the frame is reused
  * across [[Iters]]+1 passes so [[trainAndScore]] tracks it). Each GD
  * round is ONE partial-aggregable 5-column SUM/COUNT — map-side combine,
  * a handful of longs per partition to the driver — no shuffle of doc
  * rows, no window, constant iteration count. Scoring is map-side with
  * the weights as literals. This is exactly how a linear probe trains at
  * 100 TB: broadcast weights out, integer-exact gradient reduce back.
  */
object QualityClassifier {
  val Eta = 4.0
  val Iters = 3

  /** Feature/label projection: (doc_id, x1 stopword_ratio, x2
    * chars_per_token, x3 n_words/100, y). Ratios round-6 (mirrored); the
    * label is the deterministic "teacher" rule n_words ≥ 40 ∧
    * stopword_ratio ≥ 0.02, evaluated on the RAW divide (one
    * correctly-rounded IEEE op, engine-independent).
    */
  def features(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val toks = expr("filter(split(text, ' '), x -> x != '')")
    val nStop = expr("size(filter(toks, x -> x IN " +
      "('the','be','to','of','and','that','have','with')))")
    docs
      .select(id.as("doc_id"), text.as("text"))
      .withColumn("toks", toks)
      .select(col("doc_id"), size(col("toks")).as("nw"),
        length(col("text")).as("nc"), nStop.as("ns"))
      .filter(col("nw") > 0)
      .select(col("doc_id"),
        round(col("ns").cast("double") / col("nw"), 6).as("x1"),
        round(col("nc").cast("double") / col("nw"), 6).as("x2"),
        round(col("nw").cast("double") / lit(100.0), 6).as("x3"),
        when(col("nw") >= 40 &&
          col("ns").cast("double") / col("nw") >= 0.02, lit(1.0))
          .otherwise(lit(0.0)).as("y"))
  }

  /** σ(w·x) with w in integer micros and the pinned parenthesization
    * (((w0·1 + w1·x1) + w2·x2) + w3·x3) / 1e6.
    */
  private def sigmoid(w: Array[Long]): Column = {
    val z = (lit(w(0)).cast("double") +
      lit(w(1)).cast("double") * col("x1") +
      lit(w(2)).cast("double") * col("x2") +
      lit(w(3)).cast("double") * col("x3")) / lit(1000000.0)
    lit(1.0) / (lit(1.0) + exp(-z))
  }

  /** Train [[Iters]] full-batch rounds; returns the weights in micros. */
  def train(feats: DataFrame): Array[Long] = {
    val w = Array(0L, 0L, 0L, 0L)
    val xs = Seq(lit(1.0), col("x1"), col("x2"), col("x3"))
    var i = 0
    while (i < Iters) {
      val p = sigmoid(w)
      val gs = xs.zipWithIndex.map { case (x, j) =>
        sum(floor((col("y") - p) * x * lit(1000000.0) + lit(0.5))
          .cast("long")).as(s"g$j")
      }
      val row = feats.agg(count(lit(1)).as("n"), gs: _*).head()
      val n = row.getLong(0)
      require(n > 0, "QualityClassifier: empty feature frame")
      var j = 0
      while (j < 4) {
        w(j) += math.floor(Eta * (row.getLong(j + 1).toDouble / n) + 0.5).toLong
        j += 1
      }
      i += 1
    }
    w
  }

  /** Full loop: features → 3 GD rounds → per-doc score. Output
    * (doc_id, label, score, keep) with score = round-6 σ(w·x) and
    * keep = score ≥ 0.5.
    */
  def trainAndScore(docs: DataFrame, id: Column, text: Column): DataFrame = {
    val feats = graft.Caches.track(features(docs, id, text))
    val w = train(feats)
    feats.select(col("doc_id"), col("y").cast("int").as("label"),
        round(sigmoid(w), 6).as("score"))
      .withColumn("keep", col("score") >= 0.5)
  }
}
