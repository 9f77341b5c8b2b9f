package graft

import org.apache.spark.sql.functions._

import graft.pipeline.DataSplit

class DataSplitSpec extends SparkSuite {
  import spark.implicits._

  test("split assignment is stable under corpus growth (hash of id, not position)") {
    val docs = Tables(spark, sf, "documents")
    val half = docs.filter(col("doc_id") % 2 === 0)
    def asg(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), DataSplit.split(col("doc_id")).as("s"))
        .as[(Long, String)].collect().toMap
    val full = asg(docs)
    val part = asg(half)
    // every doc present in both corpora got the SAME split
    assert(part.forall { case (id, s) => full(id) == s })
  }

  test("sample keeps roughly pct% and is deterministic") {
    val docs = Tables(spark, sf, "documents")
    val n = docs.count().toDouble
    val s1 = DataSplit.sample(docs, col("doc_id"), 10).select("doc_id")
      .as[Long].collect().sorted.toSeq
    val s2 = DataSplit.sample(docs, col("doc_id"), 10).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(s1 == s2)
    assert(math.abs(s1.size / n - 0.10) < 0.06, s"sampled ${s1.size} of $n")
  }

  test("train/valid/test cover everything and land near 80/10/10") {
    val docs = Tables(spark, sf, "documents")
    val byS = docs.select(DataSplit.split(col("doc_id")).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    val n = byS.values.sum.toDouble
    assert(byS.keySet == Set("train", "valid", "test"))
    assert(math.abs(byS("train") / n - 0.8) < 0.1)
  }

  test("k-fold assignment covers all folds and stays stable under growth") {
    val docs = Tables(spark, sf, "documents")
    val folds = docs.select(col("doc_id"), DataSplit.fold(col("doc_id"), 5).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(folds.values.toSet == Set(0L, 1L, 2L, 3L, 4L))
    val half = docs.filter(col("doc_id") % 2 === 0)
      .select(col("doc_id"), DataSplit.fold(col("doc_id"), 5).as("f"))
      .as[(Long, Long)].collect().toMap
    assert(half.forall { case (id, f) => folds(id) == f })
  }

  test("mixture sampling honors per-stratum rates, drops unlisted strata, stays growth-stable") {
    val docs = Tables(spark, sf, "documents")
    val rates = Map("src0" -> 1.0, "src1" -> 0.5, "src5" -> 0.0)
    val kept = DataSplit.mixtureSample(docs, col("doc_id"), col("source"), rates)
    val bySrc = kept.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val totals = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // rate 1.0 keeps everything; rate 0.0 and unlisted sources keep nothing
    assert(bySrc("src0") == totals("src0"))
    assert(!bySrc.contains("src5") && !bySrc.contains("src9"))
    // rate 0.5 keeps roughly half (hash-uniform; generous tolerance at sf0.001)
    val frac = bySrc("src1").toDouble / totals("src1")
    assert(frac > 0.2 && frac < 0.8, s"src1 kept fraction $frac")
    // growth stability: the same doc keeps its decision in a half corpus
    val half = docs.filter(col("doc_id") % 2 === 0)
    val keptHalf = DataSplit.mixtureSample(half, col("doc_id"), col("source"), rates)
      .select("doc_id").as[Long].collect().toSet
    val keptFullEven = kept.filter(col("doc_id") % 2 === 0)
      .select("doc_id").as[Long].collect().toSet
    assert(keptHalf == keptFullEven)
  }

  test("mixture thresholds are exact integers — awkward rates can't round off-by-one-bucket") {
    // 0.07*10000 is not exact in binary64 (699.9999...); the integer-threshold
    // form must behave as bkt < 700 — the same semantics an exact-DECIMAL
    // engine (the DuckDB oracle) computes — not as bkt < the IEEE product.
    val docs = Tables(spark, sf, "documents")
    val kept = DataSplit.mixtureSample(docs, col("doc_id"), col("source"),
      Map("src0" -> 0.07)).select("doc_id").as[Long].collect().toSet
    val expected = docs.filter(col("source") === "src0")
      .filter(DataSplit.hashBucket10k(col("doc_id"), "mix") < 700)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == expected)
  }

  test("packChunks: empty text contributes zero tokens, never breaks a chunk") {
    val docs = Seq(("en", 1L, "a b"), ("en", 2L, ""), ("en", 3L, "c d e"))
      .toDF("lang", "doc_id", "text")
    val got = DataSplit.packChunks(docs, col("lang"), col("doc_id"), col("text"), 4)
      .orderBy("doc_id").select("doc_id", "n_tok", "chunk")
      .as[(Long, Int, Long)].collect().toSeq
    // tokens 2,0,3 → before-sums 0,2,2 → chunks 0,0,0 (empty doc is free)
    assert(got == Seq((1L, 2, 0L), (2L, 0, 0L), (3L, 3, 0L)))
  }

  test("packChunks: chunks are contiguous in id order and reset per group") {
    val docs = Seq(
      ("en", 1L, "a b c d"), ("en", 2L, "e f g"), ("en", 3L, "h i j k l"),
      ("de", 10L, "x y z"))
      .toDF("lang", "doc_id", "text")
    val got = DataSplit.packChunks(docs, col("lang"), col("doc_id"), col("text"), 5)
      .orderBy("grp", "doc_id")
      .as[(String, Long, Int, Long)].collect().toSeq
    // en: tokens 4,3,5 → before-sums 0,4,7 → chunks 0,0,1; de restarts at 0
    assert(got == Seq(("de", 10L, 3, 0L), ("en", 1L, 4, 0L),
      ("en", 2L, 3, 0L), ("en", 3L, 5, 1L)))
  }

  test("stratifiedExact: exact per-stratum counts, partition-invariant, quota-capped") {
    val docs = Tables(spark, sf, "documents")
    val got = DataSplit.stratifiedExact(docs, col("source"), col("doc_id"), 10)
    val counts = got.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val sizes = docs.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    // exactly min(n, |stratum|) rows per stratum — the quota contract
    assert(counts == sizes.map { case (s, n) => s -> math.min(10L, n) })
    // same members regardless of physical partitioning (rank is over a
    // total deterministic order, not arrival order)
    val re = DataSplit.stratifiedExact(
      docs.repartition(7, col("lang")), col("source"), col("doc_id"), 10)
    assert(got.select("doc_id").exceptAll(re.select("doc_id")).count() == 0)
    assert(re.select("doc_id").exceptAll(got.select("doc_id")).count() == 0)
  }

  test("shardManifest matches a sequential golden hierarchy and is partition-invariant") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), length(col("text")).as("n_tok"))
    val ids = docs.select(col("doc_id"), col("n_tok"))
      .as[(Long, Int)].collect().toSeq
    // sequential reference: same prefix hierarchy, computed in plain Scala
    val byShard = ids.groupBy { case (id, _) =>
      (BigInt(md5hex(s"shard:$id").take(15), 16) % 8).toLong
    }
    val golden = byShard.map { case (shard, rows) =>
      val tagged = rows.map { case (id, nt) => (md5hex(s"shard-ord:$id"), id.toString, nt) }
      def roll(level: Map[String, String], plen: Int): Map[String, String] =
        level.groupBy { case (k, _) => k.take(plen) }
          .map { case (kp, m) =>
            kp -> md5hex(m.toSeq.sortBy(_._1).map(_._2).mkString(","))
          }
      val leaf = tagged.groupBy(_._1.take(6)).map { case (k, rs) =>
        k -> md5hex(rs.sortBy(r => (r._1, r._2)).map(_._2).mkString(","))
      }
      val root = roll(roll(roll(leaf, 4), 2), 0)("")
      shard -> (rows.size.toLong, rows.map(_._2.toLong).sum, root)
    }
    val got = DataSplit.shardManifest(docs, col("doc_id"), nShards = 8,
      sums = Seq("n_tokens" -> col("n_tok")))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == golden)
    // bit-identical under a different physical partitioning — the digest is
    // a pure function of the id set, not of task layout
    val re = DataSplit.shardManifest(docs.repartition(13), col("doc_id"),
      nShards = 8, sums = Seq("n_tokens" -> col("n_tok")))
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(re == golden)
  }
}
