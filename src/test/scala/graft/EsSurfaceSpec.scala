package graft

import org.apache.spark.sql.functions._

import graft.queries.Registry

/** Structural invariants for the ES-surface + temporal batch (a15-a17,
  * i5/j12, t15/t16, v14, x23/x24, s13) — contracts the DuckDB hash gate
  * implies but doesn't state: interval partitioning, exactly-once probe
  * coverage, rank-fusion algebra, attribution exclusivity.
  */
class EsSurfaceSpec extends SparkSuite {

  test("i5: SCD2 intervals partition each user's timeline") {
    val rows = Registry.byName("i5_scd2_dim").run(spark, sf)
      .collect().groupBy(_.getAs[Long]("user_id"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, vs) =>
      val sorted = vs.sortBy(_.getAs[Long]("version"))
      // versions are 1..n dense
      assert(sorted.map(_.getAs[Long]("version")).toSeq ==
        (1L to sorted.length).toSeq)
      // each interval closes exactly where the next opens; only the last is open
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("valid_to_us") == b.getAs[Long]("valid_from_us"))
          assert(a.getAs[String]("state") != b.getAs[String]("state"))
        case _ =>
      }
      assert(sorted.init.forall(!_.isNullAt(sorted.head.fieldIndex("valid_to_us"))))
      assert(sorted.last.isNullAt(sorted.head.fieldIndex("valid_to_us")))
    }
  }

  test("j12: every probe event matches exactly one dimension interval") {
    val out = Registry.byName("j12_point_in_time").run(spark, sf)
    val nProbes = Tables(spark, sf, "events")
      .filter(col("event_type") === "error").count()
    assert(out.count() == nProbes)
    assert(out.select("event_id").distinct().count() == nProbes)
    // a probe's own event is a candidate change row, so state at probe time
    // for an 'error' probe whose event IS a change must be 'error'
    val own = out.filter(col("us") === col("valid_from_us"))
    assert(own.count() > 0)
  }

  test("v14: rrf column equals the 1/(60+rank) sum and ranking is consistent") {
    val rows = Registry.byName("v14_hybrid_rrf").run(spark, sf).collect()
    assert(rows.nonEmpty)
    def contrib(r: org.apache.spark.sql.Row, f: String): Double =
      if (r.isNullAt(r.fieldIndex(f))) 0.0 else 1.0 / (60 + r.getAs[Long](f))
    val raws = rows.map { r =>
      val raw = contrib(r, "r_lex") + contrib(r, "r_dense")
      assert(math.abs(r.getAs[Double]("rrf") - raw) < 1e-6)
      assert(!r.isNullAt(r.fieldIndex("r_lex")) || !r.isNullAt(r.fieldIndex("r_dense")))
      raw
    }
    assert(raws.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("t16: foreground doc frequency never exceeds background") {
    val rows = Registry.byName("t16_significant_terms").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("df_fg") >= 5)
      assert(r.getAs[Long]("df_fg") <= r.getAs[Long]("df_bg"))
    }
  }

  test("t15: MLT excludes the source doc and matches within the 5-term query") {
    val rows = Registry.byName("t15_more_like_this").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_id") != 0L)
      val m = r.getAs[Long]("n_matched")
      assert(m >= 1 && m <= 5)
    }
    val scores = rows.map(_.getAs[Long]("score_micro"))
    assert(scores.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("x24: stage attribution is exhaustive and exclusive") {
    val out = Registry.byName("x24_curation_pipeline").run(spark, sf).collect()
    val total = Tables(spark, sf, "documents").count()
    assert(out.map(_.getAs[Long]("n_docs")).sum == total)
    val stages = Set("1_rules", "2_repetition", "3_lang_mismatch",
      "4_duplicate", "5_kept")
    assert(out.map(_.getAs[String]("stage")).toSet.subsetOf(stages))
    // the chain must actually keep something on the fixtures
    assert(out.filter(_.getAs[String]("stage") == "5_kept")
      .map(_.getAs[Long]("n_docs")).sum > 0)
  }

  test("a16: composite page lies strictly after the cursor, in key order") {
    val rows = Registry.byName("a16_composite_paging").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val keys = rows.map(r => (r.getAs[String]("event_type"), r.getAs[Long]("user_id")))
    keys.foreach { case (t, u) => assert(t > "error" || (t == "error" && u > 25)) }
    assert(keys.sliding(2).forall { case Array(a, b) => implicitly[Ordering[(String, Long)]].lt(a, b); case _ => true })
  }

  test("a17: cumulative sum closes at the per-type total; derivative nulls only open each series") {
    val rows = Registry.byName("a17_derivative").run(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val totals = Tables(spark, sf, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    byType.foreach { case (t, vs) =>
      assert(vs.last.getAs[Long]("cum_n") == totals(t))
      val derivIdx = vs.head.fieldIndex("deriv")
      assert(vs.head.isNullAt(derivIdx))
      assert(vs.tail.forall(!_.isNullAt(derivIdx)))
    }
  }

  test("s13: evolved column is null exactly for pre-evolution files") {
    val rows = Registry.byName("s13_schema_merge").run(spark, sf).collect()
    val idx = rows.head.fieldIndex("n_chars")
    rows.foreach { r =>
      assert(r.isNullAt(idx) == (r.getAs[Long]("doc_id") % 2 == 0))
    }
  }

  test("x23: modal-gram shares are in (0, 1] and widths are consistent") {
    val rows = Registry.byName("x23_top_ngram_share").run(spark, sf).collect()
    assert(rows.nonEmpty)
    Seq("top2_share", "top3_share", "top4_share").foreach { c =>
      rows.foreach { r =>
        val v = r.getAs[Double](c)
        assert(v > 0.0 && v <= 1.0)
      }
    }
  }

  test("a19: diversity quota holds — at most 3 per user, page ordered by value") {
    val rows = Registry.byName("a19_diversified_sample").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (u, vs) =>
      assert(vs.length <= 3, s"user $u over quota")
    }
    val vcs = rows.map(_.getAs[Long]("vc"))
    assert(vcs.sliding(2).forall { case Array(a, b) => a >= b; case _ => true })
  }

  test("a19 plan: the quota is a WindowGroupLimit pushed below the exchange") {
    // Spark 4's rank-limit pushdown must keep kicking in for the row_number
    // <= k filter: a PARTIAL WindowGroupLimit before the user_id Exchange
    // prunes each map partition to its local top-3-per-user, so the shuffle
    // carries ~3·|users| rows, not the corpus. If a refactor ever breaks
    // the rank-filter pattern Catalyst matches on, this assert fails.
    val df = Registry.byName("a19_diversified_sample").run(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      "expected WindowGroupLimit in the final plan:\n" + plan)
    val firstExchange = plan.indexOf("Exchange")
    val lastWgl = plan.lastIndexOf("WindowGroupLimit")
    assert(firstExchange >= 0 && lastWgl > firstExchange,
      "expected a partial WindowGroupLimit BELOW the exchange (printed after " +
        "it in the tree):\n" + plan)
  }

  test("a18: rate normalizer is the true month length") {
    val rows = Registry.byName("a18_rate").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val month = r.getAs[java.sql.Date]("month").toLocalDate
      val days = month.lengthOfMonth()
      val n = r.getAs[Long]("n")
      val epd = r.getAs[Double]("events_per_day")
      assert(math.abs(epd - n.toDouble / days) < 1e-6,
        s"month $month: $epd vs $n/$days")
    }
  }

  test("a20: auto interval lands under the bucket target and loses no events") {
    val rows = Registry.byName("a20_auto_date_histogram").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    assert(rows.map(_.getAs[String]("unit")).distinct.length == 1)
    val total = Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
  }

  test("a21: one row per unordered type pair; t sign follows the mean gap") {
    val rows = Registry.byName("a21_welch_ttest").run(spark, sf).collect()
    val k = Tables(spark, sf, "events").select("event_type").distinct().count()
    assert(rows.length == k * (k - 1) / 2)
    rows.foreach { r =>
      assert(r.getAs[String]("ta") < r.getAs[String]("tb"))
      assert(r.getAs[Long]("na") >= 2 && r.getAs[Long]("nb") >= 2)
      val gap = r.getAs[Double]("mean_a") - r.getAs[Double]("mean_b")
      val t = r.getAs[Double]("t_stat")
      assert(!t.isNaN && !t.isInfinite)
      assert(math.signum(gap) == math.signum(t) || t == 0.0)
    }
  }

  test("a22: intersection cells never exceed their margins") {
    val rows = Registry.byName("a22_adjacency_matrix").run(spark, sf).collect()
      .map(r => r.getAs[String]("bucket") -> r.getAs[Long]("n")).toMap
    assert(rows.size == 6)
    assert(rows("error&high_value") <= math.min(rows("error"), rows("high_value")))
    assert(rows("error&weekend") <= math.min(rows("error"), rows("weekend")))
    assert(rows("high_value&weekend") <= math.min(rows("high_value"), rows("weekend")))
    assert(rows.values.forall(_ >= 0))
  }

  test("a23/a24: moving median and EWMA stay within their frame's min/max") {
    // the convexity invariant every windowed smoother must satisfy — a
    // violated bound means the frame collection or the fold read rows
    // outside the 7-day window (or in the wrong order, for the EWMA)
    for (name <- Seq("a23_moving_median" -> "mov_median",
                     "a24_moving_ewma" -> "ewma")) {
      val (qname, colName) = name
      val rows = Registry.byName(qname).run(spark, sf).collect()
      val byType = rows.groupBy(_.getAs[String]("event_type"))
      byType.foreach { case (_, vs) =>
        val ordered = vs.sortBy(_.getAs[java.sql.Date]("day").toString)
        ordered.zipWithIndex.foreach { case (r, i) =>
          val frame = ordered.slice(math.max(0, i - 6), i + 1)
            .map(_.getAs[Long]("n"))
          val v = r.getAs[Double](colName)
          assert(v >= frame.min - 1e-6 && v <= frame.max + 1e-6,
            s"$qname row $i: $v outside [${frame.min}, ${frame.max}]")
        }
      }
    }
  }

  test("t18: suggestions are within distance 2, ranked (dist, freq desc, term)") {
    val rows = Registry.byName("t18_term_suggest").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("probe")).foreach { case (_, vs) =>
      assert(vs.length <= 3)
      val ranked = vs.sortBy(_.getAs[Int]("rn"))
      val keys = ranked.map(r => (r.getAs[Int]("dist"),
        -r.getAs[Long]("freq"), r.getAs[String]("term")))
      assert(keys.sliding(2).forall {
        case Array(a, b) => implicitly[Ordering[(Int, Long, String)]].lteq(a, b)
        case _ => true
      })
      ranked.foreach(r => assert(r.getAs[Int]("dist") <= 2))
    }
  }

  test("a26: moment identities — std² = variance, bounds bracket the mean, " +
    "constant group nulls the standardized moments") {
    val rows = Registry.byName("a26_extended_stats").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val avg = r.getAs[Double]("avg_v"); val std = r.getAs[Double]("std_v")
      assert(math.abs(std * std - r.getAs[Double]("var_pop")) < 1e-3)
      assert(r.getAs[Double]("std_lower") <= avg && avg <= r.getAs[Double]("std_upper"))
      assert(r.getAs[Long]("min_v") <= avg && avg <= r.getAs[Long]("max_v"))
    }
    // the std>0 guard: a constant column must yield NULL skew/kurt on the
    // Spark side (matching DuckDB's ELSE-less CASE), never NaN
    import spark.implicits._
    val const = Seq(("a", 5.0), ("a", 5.0), ("a", 5.0)).toDF("event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("graft_a26").toString
    const.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Registry.byName("a26_extended_stats").run(spark, tmp).collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(out.head.fieldIndex("skewness")))
    assert(out.head.isNullAt(out.head.fieldIndex("kurtosis")))
  }

  test("a27: correlations are bounded and invariant to field scaling") {
    val rows = Registry.byName("a27_matrix_stats").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("corr_qp", "corr_qd", "corr_pd").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"$c=$v out of [-1,1]")
      }
      // the synthetic fixture draws the three measures independently, so
      // |corr| should sit near 0 — a strict-bound regression canary that
      // would catch a partial-sum mixup (which drives |corr| toward 1)
      Seq("corr_qp", "corr_qd", "corr_pd").foreach { c =>
        assert(math.abs(r.getAs[Double](c)) < 0.5, s"$c suspiciously large")
      }
    }
  }

  test("a28: entropy bounded by log2(alphabet), avg_len within min/max") {
    val rows = Registry.byName("a28_string_stats").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ent = r.getAs[Double]("entropy_bits")
      assert(ent > 0.0)
      // uniform over the full fixture alphabet is the upper bound
      assert(ent <= math.log(128.0) / math.log(2.0))
      val avg = r.getAs[Double]("avg_len")
      assert(r.getAs[Int]("min_len") <= avg && avg <= r.getAs[Int]("max_len"))
    }
    // distribution identity: per-lang char mass equals summed text length
    // (the empty-string filter must drop ONLY the trailing split artifact)
    val docs = Tables(spark, sf, "documents")
    val lens = docs.groupBy(col("lang"))
      .agg(sum(length(col("text"))).as("s")).collect()
      .map(r => r.getAs[String]("lang") -> r.getAs[Long]("s")).toMap
    rows.foreach { r =>
      assert(r.getAs[Long]("n_chars") == lens(r.getAs[String]("lang")))
    }
  }

  test("a29: bucket stats bracket, sum closes at the type total, argmax day is real") {
    val rows = Registry.byName("a29_stats_bucket").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val totals = Tables(spark, sf, "events").groupBy(col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    val daily = Tables(spark, sf, "events")
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[java.sql.Date]("day").toString) -> r.getAs[Long]("n"))
      .toMap
    rows.foreach { r =>
      val t = r.getAs[String]("event_type")
      assert(r.getAs[Long]("sum_buckets") == totals(t))
      assert(r.getAs[Long]("min_bucket") <= r.getAs[Double]("avg_bucket"))
      assert(r.getAs[Double]("avg_bucket") <= r.getAs[Long]("max_bucket"))
      // the reported argmax day really holds the maximal bucket count
      val d = r.getAs[java.sql.Date]("max_bucket_day").toString
      assert(daily((t, d)) == r.getAs[Long]("max_bucket"))
    }
  }

  test("a30: cumulative cardinality is nondecreasing and closes at the distinct total") {
    val rows = Registry.byName("a30_cumulative_cardinality").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.zip(cums.tail).forall { case (a, b) => a <= b })
    val total = Tables(spark, sf, "events")
      .select(col("user_id")).distinct().count()
    assert(cums.last == total)
    assert(rows.map(_.getAs[Long]("new_users")).sum == total)
  }

  test("a35/a34: quartiles are monotone, q2 equals the rank-based median, outliers bounded") {
    val box = Registry.byName("a35_boxplot").run(spark, sf).collect()
    val mad = Registry.byName("a34_median_abs_deviation").run(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    assert(box.nonEmpty)
    box.foreach { r =>
      val qs = Seq("q_min", "q1", "q2", "q3", "q_max").map(r.getAs[Double])
      assert(qs.zip(qs.tail).forall { case (a, b) => a <= b })
      // cross-query identity: boxplot's q2 IS a34's rank median
      val m = mad(r.getAs[String]("event_type"))
      assert(r.getAs[Double]("q2") == m.getAs[Double]("median_value"))
      assert(m.getAs[Double]("mad_value") >= 0.0)
      assert(r.getAs[Long]("n_outliers") <= r.getAs[Long]("n"))
    }
  }

  test("a37: the reported split maximizes |mean_after - mean_before| over all splits") {
    val r = Registry.byName("a37_change_point").run(spark, sf).collect()
    assert(r.length == 1)
    val daily = Tables(spark, sf, "events")
      .groupBy(to_date(col("ts")).as("day")).agg(count(lit(1)).as("n"))
      .orderBy(col("day")).collect()
      .map(x => (x.getAs[java.sql.Date]("day").toString, x.getAs[Long]("n")))
    val ns = daily.map(_._2)
    val best = (1 until ns.length).map { k =>
      val (l, rr) = ns.splitAt(k)
      (math.abs(rr.sum.toDouble / rr.length - l.sum.toDouble / l.length), k)
    }.maxBy(_._1)
    assert(daily(best._2 - 1)._1 ==
      r.head.getAs[java.sql.Date]("split_day").toString)
  }

  test("a38: pair support never exceeds either margin; confidence/lift identities hold") {
    val rows = Registry.byName("a38_frequent_pairs").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val items = Tables(spark, sf, "events")
      .select(col("user_id"), col("event_type")).distinct()
    val nUsers = items.select(col("user_id")).distinct().count()
    val margins = items.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n"))
      .toMap
    rows.foreach { r =>
      val (na, nb) = (margins(r.getAs[String]("item_a")),
        margins(r.getAs[String]("item_b")))
      val nab = r.getAs[Long]("n_ab")
      assert(nab <= math.min(na, nb))
      assert(math.abs(r.getAs[Double]("confidence") - nab.toDouble / na) < 1e-6)
      assert(math.abs(r.getAs[Double]("lift")
        - nab.toDouble * nUsers / (na.toDouble * nb)) < 1e-6)
    }
  }

  test("g1/g2: grid cells stay in the zoom-4 range and rings partition the corpus") {
    val total = Tables(spark, sf, "events").count()
    val cells = Registry.byName("g1_geotile_grid").run(spark, sf).collect()
    assert(cells.nonEmpty)
    cells.foreach { r =>
      assert(r.getAs[Long]("cell_x") >= 0 && r.getAs[Long]("cell_x") <= 15)
      assert(r.getAs[Long]("cell_y") >= 0 && r.getAs[Long]("cell_y") <= 15)
    }
    assert(cells.map(_.getAs[Long]("n")).sum == total)
    val rings = Registry.byName("g2_geo_distance").run(spark, sf).collect()
    assert(rings.map(_.getAs[Long]("n")).sum == total)
  }

  test("t27: keyset page 3 equals offset rows 41-60 of the full listing") {
    val page = Registry.byName("t27_search_after").run(spark, sf)
      .collect().map(_.getAs[Long]("doc_id")).toSeq
    val offset = Tables(spark, sf, "documents")
      .orderBy(col("n_chars").desc, col("doc_id")).limit(60)
      .collect().map(_.getAs[Long]("doc_id")).toSeq.drop(40)
    assert(page == offset)
  }

  test("t24: every expansion is an 's'-prefixed continuation of an anchor") {
    val rows = Registry.byName("t24_match_phrase_prefix").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_matches") >= 1)
      val exps = r.getAs[String]("expansions").split(",")
      assert(exps.nonEmpty && exps.forall(_.startsWith("s")))
    }
  }

  test("a41: histogram buckets partition the corpus into ordered, disjoint ranges") {
    val rows = Registry.byName("a41_variable_width_histogram").run(spark, sf)
      .collect()
    assert(rows.nonEmpty)
    val total = Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    // 1-D nearest-centroid cells are intervals: consecutive buckets must
    // not overlap and must be ordered by cid
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a.getAs[Long]("max_cents") < b.getAs[Long]("min_cents"))
      case _ =>
    }
    rows.foreach(r =>
      assert(r.getAs[Long]("min_cents") <= r.getAs[Long]("max_cents")))
  }

  test("a41 approx twin: same Lloyd machinery, fixture bucket agreement") {
    // The _approx twin reseeds the SAME two-iteration Lloyd core from
    // approx_percentile instead of the exact-rank window (r20 verdict #1).
    // GK at accuracy 10000 is exact below 10k distinct ranks, and the
    // fixture is far below that — so on the fixture the seeds coincide and
    // the buckets must agree EXACTLY; at scale only the init differs and
    // the partition invariants below are the contract.
    val exact = Registry.byName("a41_variable_width_histogram").run(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val approx = Registry.byName("a41_vw_histogram_approx").run(spark, sf)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(approx.nonEmpty)
    // partition invariants hold independently of the seed
    val total = Tables(spark, sf, "events").count()
    assert(approx.map(_._2).sum == total)
    approx.sliding(2).foreach {
      case Array(a, b) => assert(a._4 < b._3)
      case _ =>
    }
    assert(approx.sameElements(exact),
      s"approx=${approx.mkString(";")} exact=${exact.mkString(";")}")
  }

  test("v18: pre-filtered knn returns only candidates passing the filter, in order") {
    val rows = Registry.byName("v18_filtered_knn").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getAs[String]("lang") == "en"))
    val cs = rows.map(_.getAs[Double]("cos"))
    assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
    val en = Tables(spark, sf, "documents").filter(col("lang") === "en")
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(rows.forall(r => en(r.getAs[Long]("vec_id"))))
  }

  // ---- r15 batch B: a46-a49, g5-g7, t37-t39 ----

  test("a46: top_metrics last_* agrees with a5's row_number answer") {
    val tm = Registry.byName("a46_top_metrics").run(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("last_user"))
      .toMap
    val a5 = Registry.byName("a5_latest_per_key").run(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("user_id"))
      .toMap
    assert(tm.nonEmpty && tm == a5)
  }

  test("a47: categories partition the corpus and mask the closed class") {
    val rows = Registry.byName("a47_categorize_text").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val c = r.getAs[String]("category")
      val toks = c.split(" ").filter(_.nonEmpty)
      assert(toks.length <= 3)
      assert(!toks.contains("a") && !toks.contains("the"))
    }
    // top-20 only, so a lower bound: no category exceeds the corpus size
    val total = Tables(spark, sf, "documents").count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum <= total)
    assert(rows.map(_.getAs[Long]("n_docs")).max <= total)
  }

  test("a48: moving median lies within the trailing window's min/max " +
    "and equals n on each key's first day") {
    val rows = Registry.byName("a48_moving_percentiles").run(spark, sf)
      .collect().groupBy(_.getAs[String]("event_type"))
    assert(rows.nonEmpty)
    rows.foreach { case (_, vs) =>
      val s = vs.sortBy(_.getAs[java.sql.Date]("day").toString)
      assert(s.head.getAs[Double]("p50_7d") ==
        s.head.getAs[Long]("n").toDouble)
      s.indices.foreach { i =>
        val win = s.slice(math.max(0, i - 6), i + 1).map(_.getAs[Long]("n"))
        val m = s(i).getAs[Double]("p50_7d")
        assert(m >= win.min && m <= win.max)
      }
    }
  }

  test("a49: bucket correlation is a valid Pearson r") {
    val rows = Registry.byName("a49_bucket_correlation").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("corr_weekend"))) {
        val c = r.getAs[Double]("corr_weekend")
        assert(c >= -1.0 && c <= 1.0)
      }
      assert(r.getAs[Long]("nb") > 0)
    }
  }

  test("g5: geo_bounds boxes are well-formed and cover g3's centroids") {
    val rows = Registry.byName("g5_geo_bounds").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = Tables(spark, sf, "events").count()
    assert(rows.map(_.getAs[Long]("n")).sum == total)
    rows.foreach { r =>
      assert(r.getAs[Double]("top_lat") >= r.getAs[Double]("bottom_lat"))
      assert(r.getAs[Double]("right_lon") >= r.getAs[Double]("left_lon"))
      assert(r.getAs[Double]("top_lat") <= 90.0 &&
        r.getAs[Double]("bottom_lat") >= -90.0)
      assert(r.getAs[Double]("right_lon") <= 180.0 &&
        r.getAs[Double]("left_lon") >= -180.0)
    }
  }

  test("g6: polygon membership matches a brute-force reference") {
    val rows = Registry.byName("g6_geo_polygon").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val sh = r.getAs[Double]("share")
      assert(sh >= 0.0 && sh <= 1.0)
    }
    // brute-force recompute of the total inside count (exact integers)
    val ids = Tables(spark, sf, "events").select(col("event_id"))
      .collect().map(_.getLong(0))
    val brute = ids.count { id =>
      val x = (id * 73) % 36000 - 18000
      val y = (id * 37) % 18000 - 9000
      9000 * y + 6000 * (x + 9000) >= 0 &&
      9000 * (y + 6000) - 6000 * x >= 0 &&
      -9000 * y - 6000 * (x - 9000) >= 0 &&
      -9000 * (y - 6000) + 6000 * x >= 0
    }
    assert(rows.map(_.getAs[Long]("n_inside")).sum == brute)
  }

  test("g7: geohash cells match an independent bit-twiddling reference") {
    // reference: classic per-bit interleave over the SAME integer
    // quantization, written value-at-a-time (independent of the SQL
    // expression generator under test)
    val alpha = "0123456789bcdefghjkmnpqrstuvwxyz"
    def ref(lon100: Long, lat100: Long): String = {
      val lonI = lon100 * 256 / 36000
      val latI = lat100 * 128 / 18000
      var bits = 0L
      var k = 0
      var li = 7; var ti = 6
      while (k < 15) {
        bits <<= 1
        if (k % 2 == 0) { bits |= (lonI >> li) & 1; li -= 1 }
        else { bits |= (latI >> ti) & 1; ti -= 1 }
        k += 1
      }
      (0 to 2).map(c => alpha(((bits >> (10 - 5 * c)) & 31).toInt)).mkString
    }
    val expected = Tables(spark, sf, "events").select(col("event_id"))
      .collect().map(_.getLong(0))
      .groupBy(id => ref((id * 73) % 36000, (id * 37) % 18000))
      .map { case (g, v) => g -> v.length.toLong }
    val got = Registry.byName("g7_geohash_grid").run(spark, sf).collect()
      .map(r => r.getAs[String]("geohash") -> r.getAs[Long]("n")).toMap
    assert(got.nonEmpty && got == expected)
    got.keys.foreach { g =>
      assert(g.length == 3 && g.forall(alpha.contains(_)))
    }
  }

  test("t37: function_score ranks by the composed score, en boost visible") {
    val rows = Registry.byName("t37_function_score").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val ss = rows.map(_.getAs[Double]("score"))
    assert(ss.zip(ss.tail).forall { case (a, b) => a >= b })
    assert(ss.forall(_ > 0.0) && rows.forall(_.getAs[Long]("tf") > 0))
  }

  test("t38: span_first matches only within the first 10 positions") {
    val rows = Registry.byName("t38_span_first").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("first_pos") >= 0 &&
        r.getAs[Long]("first_pos") <= 9)
      assert(r.getAs[Long]("n_in_window") >= 1 &&
        r.getAs[Long]("n_in_window") <= 10)
    }
  }

  test("t39: phrase suggester recovers the dropped-character term") {
    val rows = Registry.byName("t39_phrase_suggest").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val mis = r.getAs[String]("misspelled")
      val sug = r.getAs[String]("suggestion")
      // candidate contract: within edit distance 1
      assert(lev(mis, sug) <= 1)
      // LM contract: the winning candidate restores a real collocation
      assert(r.getAs[Long]("bigram_count") >= 0)
    }
    // recovery rate: the dropped character came from a real top bigram, so
    // the LM should restore the original tail for the large majority
    val recovered = rows.count { r =>
      r.getAs[String]("suggestion") ==
        r.getAs[String]("misspelled") + r.getAs[String]("suggestion").last
    }
    assert(recovered * 2 > rows.length,
      s"only $recovered/${rows.length} misspellings recovered")
  }

  test("h14: unpivot(pivot(x)) round-trips to the long form exactly") {
    val got = Registry.byName("h14_unpivot").run(spark, sf)
      .collect().map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
    val direct = Tables(spark, sf, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type")) -> r.getAs[Long]("n")).toMap
    assert(got.nonEmpty && got == direct)
  }

  test("a50: random_sampler estimates track the exact aggregate") {
    val est = Registry.byName("a50_random_sampler").run(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_sampled"), r.getAs[Long]("est_n"))).toMap
    val exact = Tables(spark, sf, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n")).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("n")).toMap
    assert(est.nonEmpty)
    est.foreach { case (t, (ns, en)) =>
      assert(en == ns * 8)
      // p=1/8 hash sample at fixture scale: estimate within 2x of truth
      assert(en >= exact(t) / 2 && en <= exact(t) * 2,
        s"$t: est $en vs exact ${exact(t)}")
    }
  }

  test("g8: per-bucket centroid lies strictly inside that bucket's bounds") {
    val cent = Registry.byName("g8_geo_centroid").run(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("centroid_lon"), r.getAs[Double]("centroid_lat"),
          r.getAs[Long]("n"))).toMap
    val bounds = Registry.byName("g5_geo_bounds").run(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("left_lon"), r.getAs[Double]("right_lon"),
          r.getAs[Double]("bottom_lat"), r.getAs[Double]("top_lat"))).toMap
    assert(cent.nonEmpty && cent.keySet == bounds.keySet)
    cent.foreach { case (t, (lon, lat, _)) =>
      val (l, r, b, u) = bounds(t)
      assert(lon >= l && lon <= r && lat >= b && lat <= u,
        s"$t centroid ($lon,$lat) outside bounds")
    }
    assert(cent.values.map(_._3).sum == Tables(spark, sf, "events").count())
  }

  test("a53: nested explode + reverse_nested equals the flat computation") {
    val got = Registry.byName("a53_nested_reverse").run(spark, sf)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("nested_count"), r.getAs[Long]("parent_count"))).toMap
    val flat = Tables(spark, sf, "events")
      .select(col("event_type"), col("user_id"),
        round(col("value") * 100).cast("long").as("vc"))
      .filter(col("vc") > 5000L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nc"), countDistinct(col("user_id")).as("pc"))
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("nc"), r.getAs[Long]("pc"))).toMap
    assert(got.nonEmpty && got == flat)
    // reverse_nested invariant: parents never outnumber nested matches
    got.values.foreach { case (nc, pc) => assert(pc <= nc && pc >= 1L) }
  }

  test("t40: significant_text scores are finite; the match term saturates fg") {
    val rows = Registry.byName("t40_significant_text").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    rows.foreach { r =>
      val (fg, bg) = (r.getAs[Long]("df_fg"), r.getAs[Long]("df_bg"))
      assert(fg >= 5L && bg >= fg)
      assert(r.getAs[Double]("chi2") >= 0.0)
    }
    // the foreground-defining term must appear in every fg doc by
    // construction: its df_fg is the fg corpus size, the maximum possible
    val join = rows.find(_.getAs[String]("term") == "join")
    assert(join.isDefined, "match term absent from significant terms")
    val maxFg = rows.map(_.getAs[Long]("df_fg")).max
    assert(join.get.getAs[Long]("df_fg") == maxFg)
  }

  test("t41: sampler bounds the significance foreground at shard_size") {
    val rows = Registry.byName("t41_sampler_sigterms").run(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 15)
    rows.foreach { r =>
      val (smp, bg) = (r.getAs[Long]("df_smp"), r.getAs[Long]("df_bg"))
      assert(smp >= 5L && smp <= 200L, s"sample count $smp outside bounds")
      assert(bg >= smp)
    }
    // the scoring term itself must saturate the sample: every sampled doc
    // contains 'join' by construction of the score
    val join = rows.find(_.getAs[String]("term") == "join")
    assert(join.isDefined &&
      join.get.getAs[Long]("df_smp") == rows.map(_.getAs[Long]("df_smp")).max)
  }

  test("w12: every attribution is the user's most recent preceding click") {
    val rows = Registry.byName("w12_attribution").run(spark, sf).collect()
    assert(rows.nonEmpty)
    val clicks = Tables(spark, sf, "events")
      .filter(col("event_type") === "click")
      .selectExpr("user_id", "event_id", "unix_micros(ts) AS us")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    var attributed = 0
    rows.foreach { r =>
      val (u, us) = (r.getAs[Long]("user_id"), r.getAs[Long]("us"))
      val preceding = clicks.getOrElse(u, Array.empty[(Long, Long, Long)])
        .filter { case (_, cid, cus) => cus < us || (cus == us && cid < r.getAs[Long]("event_id")) }
      if (r.isNullAt(r.fieldIndex("click_id"))) {
        assert(preceding.isEmpty, s"purchase ${r.getAs[Long]("event_id")}: " +
          "null attribution despite a preceding click")
      } else {
        attributed += 1
        val best = preceding.maxBy(c => (c._3, c._2))
        assert(r.getAs[Long]("click_id") == best._2)
        assert(r.getAs[Long]("gap_us") == us - best._3 &&
          r.getAs[Long]("gap_us") >= 0L)
      }
    }
    assert(attributed > 0, "no purchase had a preceding click at fixture scale")
  }

  test("w11: cume_dist dominates percent_rank; both hit the [0,1] ends") {
    val rows = Registry.byName("w11_cume_dist").run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (pr, cd) = (r.getAs[Double]("pr"), r.getAs[Double]("cd"))
      assert(pr >= 0.0 && pr <= 1.0 && cd > 0.0 && cd <= 1.0)
      assert(cd >= pr, s"cume_dist $cd below percent_rank $pr")
    }
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.values.foreach { vs =>
      assert(vs.map(_.getAs[Double]("pr")).min == 0.0)
      assert(vs.map(_.getAs[Double]("cd")).max == 1.0)
    }
  }

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }
}
