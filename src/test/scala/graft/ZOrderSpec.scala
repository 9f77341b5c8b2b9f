package graft

import org.apache.spark.sql.functions._

import graft.operators.ZOrder

class ZOrderSpec extends SparkSuite {
  import spark.implicits._

  /** Reference Morton interleave on the JVM — the spec's independent mirror
    * of the Column fold (the DuckDB mirror is exercised by the
    * s12_zorder_cluster oracle).
    */
  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var j = 0
    while (j < 16) {
      z |= ((x >> j) & 1L) << (2 * j)
      z |= ((y >> j) & 1L) << (2 * j + 1)
      j += 1
    }
    z
  }

  test("zValue matches the reference interleave bit for bit") {
    val cases = Seq(
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (43690L, 21845L),
      (12345L, 54321L), (70000L, 131071L) // masked down to 16 bits
    )
    val got = cases.toDF("x", "y")
      .select(ZOrder.zValue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    val want = cases.map { case (x, y) => mortonRef(x & 0xffff, y & 0xffff) }
    assert(got.toSeq == want)
    // spot values: interleave of all-ones is all-ones over 32 bits
    assert(mortonRef(0xffffL, 0xffffL) == 0xffffffffL)
    assert(mortonRef(0xffffL, 0L) == 0x55555555L)
  }

  test("z-order layout narrows per-file bounds on BOTH dimensions; " +
    "lexicographic narrows only its leading key") {
    // two independent uniform dims, deliberately uncorrelated
    val n = 4096
    val df = (0 until n).map { i =>
      (i.toLong, (i * 2654435761L) & 0xffffL, (i * 40503L) & 0xffffL)
    }.toDF("id", "x", "y")
    val files = 16

    def bounds(clustered: org.apache.spark.sql.DataFrame) =
      clustered
        .select(spark_partition_id().as("p"), col("x"), col("y"))
        .groupBy("p")
        .agg(min("x").as("x0"), max("x").as("x1"),
          min("y").as("y0"), max("y").as("y1"))
        .as[(Int, Long, Long, Long, Long)].collect()

    // fraction of files a point-slice on each dim would have to open,
    // averaged over 32 probe points (file min/max containment — exactly
    // what parquet footer pruning checks)
    def touchFrac(bs: Array[(Int, Long, Long, Long, Long)], onX: Boolean): Double = {
      val probes = (0 until 32).map(i => (i * 2048 + 1024).toLong)
      val hits = probes.map { v =>
        bs.count { case (_, x0, x1, y0, y1) =>
          if (onX) x0 <= v && v <= x1 else y0 <= v && v <= y1
        }
      }.sum
      hits.toDouble / (probes.size * bs.length)
    }

    val zb = bounds(ZOrder.cluster(df, col("x"), col("y"), files))
    val lexb = bounds(df.repartitionByRange(files, col("x"), col("y"))
      .sortWithinPartitions(col("x"), col("y")))

    assert(zb.length > 1 && lexb.length > 1)
    // lexicographic: x prunes hard, y not at all (every file spans ~full y)
    assert(touchFrac(lexb, onX = true) <= 0.25)
    assert(touchFrac(lexb, onX = false) >= 0.9)
    // z-order: BOTH dims prune — each z-range file covers a bounded quadrant
    assert(touchFrac(zb, onX = true) <= 0.5)
    assert(touchFrac(zb, onX = false) <= 0.5)
  }
}
