package graft

import org.apache.spark.sql.functions._

/** SURVEY §5.2(3): algebraic laws of the set ops vs Scala collection
  * semantics, parse∘render time roundtrip, dedup idempotence — on seeded
  * generated data (one Spark job per law, not per case).
  */
class LawsSpec extends SparkSuite {
  import spark.implicits._

  private val rng = new scala.util.Random(7)
  private val xs = Seq.fill(400)(rng.nextInt(40).toLong)
  private val ys = Seq.fill(300)(rng.nextInt(40).toLong)
  private lazy val a = xs.toDF("k")
  private lazy val b = ys.toDF("k")

  test("union all = multiset concat; union distinct = set union") {
    assert(a.union(b).count() == xs.size + ys.size)
    assert(a.union(b).distinct().as[Long].collect().toSet == (xs.toSet ++ ys.toSet))
  }

  test("intersect = set intersection; except = set difference") {
    assert(a.intersect(b).as[Long].collect().toSet == xs.toSet.intersect(ys.toSet))
    assert(a.except(b).as[Long].collect().toSet == (xs.toSet -- ys.toSet))
  }

  test("exceptAll/intersectAll follow multiset counts") {
    val xc = xs.groupBy(identity).view.mapValues(_.size).toMap
    val yc = ys.groupBy(identity).view.mapValues(_.size).toMap
    val expectExceptAll = xc.map { case (k, n) => k -> math.max(0, n - yc.getOrElse(k, 0)) }
      .values.sum
    val expectIntersectAll = xc.map { case (k, n) => math.min(n, yc.getOrElse(k, 0)) }.sum
    assert(a.exceptAll(b).count() == expectExceptAll)
    assert(a.intersectAll(b).count() == expectIntersectAll)
  }

  test("dropDuplicates is idempotent and equals distinct key count") {
    val once = a.dropDuplicates("k")
    val twice = once.dropDuplicates("k")
    assert(once.count() == xs.distinct.size)
    assert(twice.count() == once.count())
  }

  test("F2 roundtrip: to_timestamp(date_format(ts)) is identity at second grain") {
    val bad = Tables(spark, sf, "events")
      .select(date_trunc("second", col("ts")).as("s"))
      .withColumn("rt", to_timestamp(
        date_format(col("s"), "yyyy-MM-dd'T'HH:mm:ss"), "yyyy-MM-dd'T'HH:mm:ss"))
      .filter(col("s") =!= col("rt"))
    assert(bad.count() == 0)
  }
}
