package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions._

class VectorFunctionsSpec extends SparkSuite {

  private lazy val emb = Tables(spark, sf, "embeddings")

  test("native dot is BIT-identical to the HOF fold (same IEEE sequence)") {
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q)).select(
      dot(col("embedding"), col("qv")).as("fold"),
      dotNative(col("embedding"), col("qv")).as("native"))
    assert(both.filter(col("fold") =!= col("native")).count() == 0)
  }

  test("cosine of a vector with itself is 1") {
    val selfCos = emb.select(round(cosineNative(col("embedding"), col("embedding")), 9).as("c"))
    assert(selfCos.filter(col("c") =!= 1.0).count() == 0)
  }

  test("l2 native matches fold") {
    val a = emb.filter(col("vec_id") === 1).select(col("embedding").as("a"))
    val pair = emb.filter(col("vec_id") === 2).select(col("embedding").as("b"))
      .crossJoin(a)
    val r = pair.select(l2(col("a"), col("b")).as("fold"),
      l2Native(col("a"), col("b")).as("native")).collect().head
    assert(r.getDouble(0) == r.getDouble(1))
  }

  test("sign-LSH bucket is deterministic and within range") {
    val b1 = emb.select(signLshBucket(col("embedding"), 8).as("b")).collect().map(_.getLong(0))
    val b2 = emb.select(signLshBucket(col("embedding"), 8).as("b")).collect().map(_.getLong(0))
    assert(b1.toSeq == b2.toSeq)
    assert(b1.forall(b => b >= 0 && b < 256))
    // buckets must actually split the space, not collapse to one value
    assert(b1.distinct.length > 4)
  }
}
