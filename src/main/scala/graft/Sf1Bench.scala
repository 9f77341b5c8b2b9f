package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf1 END-TO-END spot bench (r17 verdict "next" #5): run the top-10 most
  * expensive BENCHED registry queries — the actual `SparkEntry.queries`
  * code, not re-derived shapes — at 10× the gate scale, with per-query
  * SHUFFLE BYTE counts, so the "linear" scaling claims carry measured
  * exponents instead of shape-level inference.
  *
  * No sf1 fixture exists, so the tables are derived from sf0.1 by the same
  * key-offset replication ScaleProbe uses (facts ×xf with join keys
  * remapped `k -> k*xf + rep`; dims stay dims) — but MATERIALIZED to
  * parquet so each query runs end-to-end from disk through its registered
  * `(spark, dir)` entry point, exactly as the driver runs it at sf0.1.
  * Deliberate density choices inherited from ScaleProbe: each document
  * copy appends a distinct token (docs become 10-member near-dup
  * families — worst case for the pair family), each embedding copy
  * perturbs one rep-indexed dimension, events remap BOTH keys (10× users
  * at original per-user density).
  *
  * Shuffle bytes come from a stage-completion listener (read = local +
  * remote fetched bytes, write = bytes written); counters reset per query
  * and the listener bus is drained by a short settle wait before reading.
  * This is a PERFORMANCE artifact only — correctness stays with Verify.
  *
  * Output: one JSON line (also BENCH_sf1_full.json): per query the sf0.1
  * and sf1 wall seconds, the sec ratio, and both shuffle byte totals.
  */
object Sf1Bench {

  // top-10 by committed-window cost, plus m3_phash_pairs_distinct — the
  // scale twin of m3_phash_pairs, included so the artifact carries the
  // doc-level-vs-distinct-hash contrast at 10× (the documented m3 cliff).
  // r19 additions: x34_html_extract (the costliest map-side query — its
  // shuffle bytes must read ZERO at both scales, the whole point of the
  // per-row design) and d14_dup_span_removal (d6's span shuffle + keyed
  // join-back — bytes must step linearly).
  // r20 additions (r19 verdict #8): the agg-heavy families were the one
  // shape class the e2e artifacts didn't cover — a38_frequent_pairs (the
  // only agg with a pair space: user-co-partitioned self-join over
  // distinct (user, event_type)) and a51_ks_test (per-type replicated
  // baseline + one windowed ecdf sort).
  private val TopQueries = Seq(
    "d12_containment_prefix", "d2_jaccard_prefix", "j13_interval_overlap",
    "v11_pq_adc", "a41_variable_width_histogram", "x13_bpe_apply",
    "j11_fuzzy_join", "j9_bucketed_join", "k1_es_upsert_roundtrip",
    "m3_phash_pairs", "m3_phash_pairs_distinct",
    "x34_html_extract", "d14_dup_span_removal",
    "a38_frequent_pairs", "a51_ks_test",
    // r21: the percolator e2e row (r20 verdict #7 — the fleet-scale claim
    // rides the same refreshed artifact as the other headline shapes), the
    // a41 approx twin (benched scale path vs the exact single-partition
    // init above), and the x36 curation chain (the round's biggest
    // duplicated-subtree fix).
    "t31_percolate_selective", "a41_vw_histogram_approx",
    "x36_curation_from_html")

  private def expand(df: DataFrame, xf: Int, keyCols: Seq[String]): DataFrame = {
    val withRep = df.withColumn("rep", explode(sequence(lit(0L), lit(xf - 1L))))
    keyCols.foldLeft(withRep)((d, k) => d.withColumn(k, col(k) * xf + col("rep")))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val xf = sys.env.getOrElse("SPARK_GRAFT_SCALE_X", "10").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.cleaner.periodicGC.interval", "30s")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // ---- shuffle-byte listener ----
    val readB = new AtomicLong(0L)
    val writeB = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          readB.addAndGet(
            m.shuffleReadMetrics.localBytesRead + m.shuffleReadMetrics.remoteBytesRead)
          writeB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })

    // ---- stage the derived sf1 tables (untimed) ----
    val sf1Dir = s"${System.getProperty("java.io.tmpdir")}/graft_sf1_x${xf}" +
      s"_p${ProcessHandle.current().pid()}"
    // crash-safe scratch cleanup (same r20 fix as ScaleProbe): the staged
    // tables are multi-GB and pid-suffixed — a killed run must not leak them
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rmq(f: java.io.File): Unit = {
        val kids = f.listFiles(); if (kids != null) kids.foreach(rmq)
        f.delete(); ()
      }
      rmq(new java.io.File(sf1Dir))
    }))
    def stage(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$sf1Dir/$name.parquet")
    // dims copy through unchanged (dims stay dims at any SF)
    Seq("region", "nation", "customer", "supplier", "part")
      .foreach(t => stage(t, Tables(spark, sfDir, t)))
    stage("lineitem", expand(Tables(spark, sfDir, "lineitem"), xf, Seq("l_orderkey")).drop("rep"))
    stage("orders", expand(Tables(spark, sfDir, "orders"), xf, Seq("o_orderkey")).drop("rep"))
    stage("events", expand(Tables(spark, sfDir, "events"), xf, Seq("event_id", "user_id")).drop("rep"))
    stage("documents", expand(Tables(spark, sfDir, "documents"), xf, Seq("doc_id"))
      .withColumn("text", concat(col("text"), lit(" variant"), col("rep"))).drop("rep"))
    stage("embeddings", expand(Tables(spark, sfDir, "embeddings"), xf, Seq("vec_id"))
      .withColumn("embedding", transform(col("embedding"), (x, i) =>
        when(i === col("rep").cast("int"), x + lit(0.01f)).otherwise(x)))
      .drop("rep"))
    println(s"[sf1bench] staged xf=$xf tables at $sf1Dir")

    // Drain the async listener bus by POLLING the counters until they stop
    // moving for a settle window (ADVICE r18: the former fixed 500 ms sleep
    // let late stage-completed events land AFTER the reset and be credited
    // to the NEXT rep/query on a loaded machine). 400 ms of quiet with a
    // 5 s cap: stage events arrive in bursts ms apart, so "quiet for 400 ms"
    // means the bus is empty in practice, and the cap bounds a pathological
    // firehose without hanging the bench.
    def settle(): Unit = {
      var prev = (readB.get(), writeB.get())
      var quietMs = 0
      var waitedMs = 0
      while (quietMs < 400 && waitedMs < 5000) {
        Thread.sleep(100); waitedMs += 100
        val cur = (readB.get(), writeB.get())
        if (cur == prev) quietMs += 100 else { quietMs = 0; prev = cur }
      }
    }

    // one timed run: (seconds, shuffleReadB, shuffleWriteB)
    def run(name: String, dir: String): Option[(Double, Long, Long)] = {
      val fn = SparkEntry.queries(name)
      System.gc()
      settle() // flush any straggler events onto the PREVIOUS reading
      readB.set(0L); writeB.set(0L)
      val t0 = System.nanoTime()
      try {
        fn(spark, dir).write.mode("overwrite").format("noop").save()
        val sec = math.rint((System.nanoTime() - t0) / 1e6) / 1e3
        settle()
        Some((sec, readB.get(), writeB.get()))
      } catch { case _: Throwable => None }
      finally Caches.unpersistAll()
    }

    // warm the file-listing/codegen paths once per dir
    Tables.names.foreach { t =>
      try { Tables(spark, sfDir, t).count(); Tables(spark, sf1Dir, t).count(); () }
      catch { case _: Throwable => () }
    }

    // comma-separated name filter for local iteration; a filtered run only
    // writes its artifact when SPARK_GRAFT_SF1_OUT is set explicitly
    // (mirrors Bench's BENCH_ONLY contract)
    val only = sys.env.get("SPARK_GRAFT_SF1_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val rows = TopQueries.filter(n => only.forall(_.contains(n))).map { name =>
      def best(dir: String) = {
        val rs = (1 to reps).flatMap(_ => run(name, dir))
        if (rs.isEmpty) None
        // min wall, with that run's bytes (bytes are plan-determined and
        // stable across reps; wall min is the least-contended measurement)
        else Some(rs.minBy(_._1))
      }
      val s01 = best(sfDir)
      val s1 = best(sf1Dir)
      println(s"[sf1bench] $name sf0.1=${s01.map(_._1).getOrElse(-1.0)}s " +
        s"sf1=${s1.map(_._1).getOrElse(-1.0)}s " +
        s"shuffleR ${s01.map(_._2 / 1048576).getOrElse(-1L)}MB -> " +
        s"${s1.map(_._2 / 1048576).getOrElse(-1L)}MB")
      (name, s01, s1)
    }

    val qJson = rows.map { case (name, s01, s1) =>
      def part(tag: String, r: Option[(Double, Long, Long)]) = r match {
        case Some((sec, rb, wb)) =>
          s""""${tag}_sec":$sec,"${tag}_shuffle_read_b":$rb,"${tag}_shuffle_write_b":$wb"""
        case None => s""""${tag}_sec":-1"""
      }
      val ratio = (for { a <- s01; b <- s1 }
        yield math.rint(b._1 / a._1 * 100) / 100).getOrElse(-1.0)
      s""""$name":{${part("sf01", s01)},${part("sf1", s1)},"sec_ratio":$ratio}"""
    }.mkString("{", ",", "}")
    val json = s"""{"metric":"sf1_full","unit":"sec","xf":$xf,""" +
      s""""base_sf":"$sfDir","cpus":$cpus,"reps":$reps,"queries":$qJson}"""
    println(json)
    if (only.isEmpty || sys.env.contains("SPARK_GRAFT_SF1_OUT")) {
      val w = new java.io.PrintWriter(
        sys.env.getOrElse("SPARK_GRAFT_SF1_OUT", "BENCH_sf1_full.json"), "UTF-8")
      try w.println(json) finally w.close()
    }
    // the staged tables are multi-GB scratch — remove on exit
    def rm(f: java.io.File): Unit = {
      val kids = f.listFiles(); if (kids != null) kids.foreach(rm); f.delete(); ()
    }
    rm(new java.io.File(sf1Dir))
    spark.stop()
  }
}
