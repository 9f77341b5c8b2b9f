package graft

import org.apache.spark.sql.functions._

import graft.similarity.{Ann, Pq}

class PqSpec extends SparkSuite {
  import spark.implicits._

  private lazy val emb = Tables(spark, sf, "embeddings")
  private lazy val cb =
    Pq.train(emb, col("vec_id"), col("embedding"), m = 4, k = 8, iters = 2)

  test("codebooks have the trained shape and codes are valid") {
    assert(cb.length == 4)
    assert(cb.forall(_.length == 8))
    assert(cb.forall(_.forall(_.length == 16)))
    val enc = Pq.encode(emb, col("vec_id"), col("embedding"), cb)
    val bad = enc.filter(size(col("codes")) =!= 4 ||
      exists(col("codes"), c => c < 0 || c >= 8)).count()
    assert(bad == 0)
    assert(enc.count() == emb.count())
  }

  test("encode/ADC are exact when vectors sit on the codebook grid") {
    // 2 subspaces × 2 centroids of dim 2: vectors built by concatenating
    // centroids are reconstructed losslessly, and ADC distance == true L2²
    val grid = Array(
      Array(Array(0.0, 0.0), Array(4.0, 4.0)), // subspace 0
      Array(Array(1.0, 1.0), Array(9.0, 9.0))) // subspace 1
    val vecs = Seq(
      (0L, Seq(0f, 0f, 1f, 1f)), // codes (0, 0)
      (1L, Seq(0f, 0f, 9f, 9f)), // codes (0, 1)
      (2L, Seq(4f, 4f, 9f, 9f))) // codes (1, 1)
      .toDF("vec_id", "embedding")
    val enc = Pq.encode(vecs, col("vec_id"), col("embedding"), grid)
    val codes = enc.orderBy("vec_id").as[(Long, Seq[Int])].collect().toMap
    assert(codes(0L) == Seq(0, 0) && codes(1L) == Seq(0, 1) && codes(2L) == Seq(1, 1))
    // query = vector 0 exactly: ADC distance to v0 must be 0, to v1 the
    // true squared distance 2*(9-1)^2 = 128, to v2 128 + 2*4^2 = 160
    val got = Pq.knnAdc(enc, col("vec_id"), col("codes"),
        Array(0f, 0f, 1f, 1f), grid, topK = 3)
      .as[(Long, Double)].collect().toMap
    assert(got == Map(0L -> 0.0, 1L -> 128.0, 2L -> 160.0))
  }

  test("ADC-shortlist + exact re-rank recalls the exact L2 top-10") {
    val query = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    val enc = Pq.encode(emb, col("vec_id"), col("embedding"), cb)
    // exact L2² top-10: the ground truth
    val qLit = typedLit(query.map(_.toDouble).toSeq)
    val exact = emb.select(col("vec_id"),
        aggregate(zip_with(col("embedding"), qLit,
          (x, q) => { val dd = x.cast("double") - q; dd * dd }),
          lit(0.0), (a, v) => a + v).as("d2"))
      .orderBy(col("d2").asc, col("vec_id")).limit(10)
      .select("vec_id").as[Long].collect().toSet
    // raw ADC@10: coarse (4×8 codebook on near-random vectors) but must
    // still beat chance and must include the query vector itself (dist 0)
    val adc = Pq.knnAdc(enc, col("vec_id"), col("codes"), query, cb, topK = 10)
      .select("vec_id").as[Long].collect().toSet
    assert(adc.contains(0L), s"ADC lost the query vector itself: $adc")
    // two-stage: ADC shortlist of 100 → exact re-rank to 10. Recall is set
    // by the shortlist ratio, not quantization coarseness — the production
    // shape.
    val reranked = Pq.knnAdcRerank(enc, emb, col("vec_id"), col("embedding"),
        col("codes"), query, cb, topK = 10, shortlist = 100)
      .select("vec_id").as[Long].collect().toSet
    val recall = (reranked & exact).size
    assert(recall >= 7,
      s"rerank recall@10 too low: $recall/10 (got=$reranked exact=$exact)")
  }

  test("corpus smaller than k trains a shrunken codebook that still encodes") {
    val tiny = Seq(
      (0L, Seq(0f, 0f, 1f, 1f)), (1L, Seq(2f, 2f, 3f, 3f)), (2L, Seq(9f, 9f, 9f, 9f)))
      .toDF("vec_id", "embedding")
    val cb = Pq.train(tiny, col("vec_id"), col("embedding"), m = 2, k = 8, iters = 1)
    assert(cb.length == 2 && cb.forall(s => s.length >= 1 && s.length <= 3))
    val enc = Pq.encode(tiny, col("vec_id"), col("embedding"), cb)
    assert(enc.count() == 3)
    val bad = enc.filter(
      col("codes").getItem(0) >= cb(0).length ||
        col("codes").getItem(1) >= cb(1).length ||
        exists(col("codes"), _ < 0)).count()
    assert(bad == 0)
  }

  test("reconstruction error beats the zero-information baseline and is deterministic") {
    val enc = Pq.encode(emb, col("vec_id"), col("embedding"), cb)
    val rec = Pq.decode(enc, col("vec_id"), col("codes"), cb)
    val joined = emb.select(col("vec_id"), col("embedding")).join(rec, "vec_id")
    def mse(v: org.apache.spark.sql.Column) = avg(aggregate(
      zip_with(col("embedding"), v, (x, r) => {
        val dd = x.cast("double") - r; dd * dd
      }), lit(0.0), (a, x) => a + x))
    val pqMse = joined.select(mse(col("rvec"))).head().getDouble(0)
    // baseline: reconstruct every vector as the global centroid
    val centroid = Ann.centroidsFrom(
        emb.withColumn("one", lit(1)), col("one"), col("embedding"))
      .select(transform(col("cvec"), _.cast("double")).as("gvec"))
    val baseMse = joined.crossJoin(broadcast(centroid))
      .select(mse(col("gvec"))).head().getDouble(0)
    assert(pqMse < baseMse,
      s"PQ reconstruction ($pqMse) no better than global-centroid baseline ($baseMse)")
    // retrain + re-encode must reproduce identical codes (everything is
    // deterministic: init, tie rules, driver-side table math)
    val cb2 = Pq.train(emb, col("vec_id"), col("embedding"), m = 4, k = 8, iters = 2)
    val enc2 = Pq.encode(emb, col("vec_id"), col("embedding"), cb2)
    assert(enc.exceptAll(enc2).count() == 0 && enc2.exceptAll(enc).count() == 0)
  }
}
