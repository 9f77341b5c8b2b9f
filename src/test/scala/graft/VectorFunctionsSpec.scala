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

  test("vec_agree kernel equals the interpreted zip_with match-count fold") {
    // real minhash signatures (array<long>) from the documents fixture,
    // all-pairs within a small slice — covers agree counts 0..64
    val docs = Tables(spark, sf, "documents").limit(40)
    val sigs = graft.dedup.MinHashDedup.signatures(
      docs, col("doc_id"), col("text"))
    val pairs = sigs.select(col("doc_id").as("da"), col("sig").as("sa"))
      .crossJoin(sigs.select(col("doc_id").as("db"), col("sig").as("sb")))
      .filter(col("da") < col("db"))
    val fold = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v)
    val diff = pairs.select(
      call_function("vec_agree", col("sa"), col("sb")).as("k"),
      fold.as("f")).filter(col("k") =!= col("f"))
    assert(diff.count() == 0)
    // null propagation like the fold
    val n = sigs.select(call_function("vec_agree",
      lit(null).cast("array<bigint>"), col("sig")).as("k"))
      .filter(col("k").isNotNull)
    assert(n.count() == 0)
  }

  test("sorted_isect_count on sorted distinct arrays equals array_intersect") {
    import graft.functions.TextFunctions
    val docs = Tables(spark, sf, "documents").limit(60)
    val arr = docs.select(col("doc_id"),
      sort_array(array_distinct(TextFunctions.bigrams(col("text")))).as("ta"))
    val pairs = arr.select(col("doc_id").as("da"), col("ta"))
      .crossJoin(arr.select(col("doc_id").as("db"), col("ta").as("tb")))
      .filter(col("da") < col("db"))
    val diff = pairs.select(
      call_function("sorted_isect_count", col("ta"), col("tb")).as("k"),
      size(array_intersect(col("ta"), col("tb"))).as("s"))
      .filter(col("k") =!= col("s"))
    assert(diff.count() == 0)
    // empty-array and self-intersection edges
    val edge = spark.sql(
      """SELECT sorted_isect_count(cast(array() AS array<string>), array('a')) AS e1,
        |       sorted_isect_count(array('a','b'), array('a','b')) AS e2,
        |       sorted_isect_count(array('a'), array('b')) AS e3""".stripMargin)
      .collect().head
    assert(edge.getInt(0) == 0 && edge.getInt(1) == 2 && edge.getInt(2) == 0)
  }
}
