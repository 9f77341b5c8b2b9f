package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-listing paths once so per-query timings
    // measure the queries, not first-touch session setup.
    graft.Tables.names.foreach { t =>
      try graft.Tables(spark, sfDir, t).count() catch { case _: Throwable => () }
    }
    // Time a full materialization of every query via the noop sink: unlike
    // `count()` (which lets Catalyst prune projections and skip expression
    // work), the noop write evaluates every output column. Each query runs
    // `reps` times and reports the MEDIAN — single-run numbers on this box
    // have ±50% noise, which drowned round-over-round comparisons.
    def once(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Option[Double] = {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        Some(math.rint((System.nanoTime() - t0) / 1e6) / 1e3)
      } catch { case _: Throwable => None }
    }
    // Optional comma-separated name filter for local iteration
    // (SPARK_GRAFT_BENCH_ONLY=d2_simhash,f8_map_functions).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val timed = selected.map { case (name, fn) =>
      val runs = (1 to reps).flatMap(_ => once(fn))
      // A failed run poisons the query: report -1 rather than folding a
      // partial time-to-failure into the totals.
      val median =
        if (runs.size < reps) -1.0
        else runs.sorted.apply(runs.size / 2)
      name -> median
    }
    val errors = timed.collect { case (n, t) if t < 0 => n }
    val ok = timed.filter(_._2 >= 0)
    val qs = timed
      .map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errsJson = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = math.rint(ok.map(_._2).sum * 1000) / 1000
    // Per-query detail first (may exceed the driver's tail window), then the
    // compact headline as the LAST line so it always lands inside the
    // driver's 2 KB tail capture.
    println(s"""{"metric":"per_query","unit":"sec","reps":$reps,"queries":$qs,"errors":$errsJson}""")
    println(s"""{"metric":"total","value":$total,"unit":"sec","bench_total_s":$total,"n_queries":${ok.size},"n_errors":${errors.size},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}
