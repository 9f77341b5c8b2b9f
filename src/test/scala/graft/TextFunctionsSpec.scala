package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSuite {
  import spark.implicits._

  test("native n-gram kernel equals the HOF reference composition (n=2,3,5)") {
    val docs = Tables(spark, sf, "documents")
    Seq(2, 3, 5).foreach { n =>
      val diff = docs.select(
        TextFunctions.shingles(col("text"), n).as("native"),
        TextFunctions.shinglesRef(col("text"), n).as("ref"))
        .filter(not(col("native") === col("ref")))
      assert(diff.count() == 0, s"n=$n differs")
    }
  }

  test("n-grams of short token lists are empty") {
    val df = Seq("one two", "one", "").toDF("text")
    val got = df.select(size(TextFunctions.shingles(col("text"), 3)).as("n"))
      .as[Int].collect().toSeq
    assert(got == Seq(0, 0, 0))
  }

  test("fingerprint is whitespace/case insensitive") {
    val df = Seq(("A", "Hello  World "), ("B", "hello world")).toDF("k", "text")
    val fps = df.select(TextFunctions.fingerprint(col("text"))).as[String].collect()
    assert(fps(0) == fps(1))
  }

  test("tokenCount drops empty tokens from repeated spaces") {
    val df = Seq("a  b   c").toDF("text")
    assert(df.select(TextFunctions.tokenCount(col("text"))).as[Int].collect().head == 3)
  }
}
