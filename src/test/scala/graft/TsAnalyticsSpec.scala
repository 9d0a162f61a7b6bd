package graft

import org.apache.spark.sql.functions._

import graft.operators.TsAnalytics

class TsAnalyticsSpec extends SparkSpec {

  private def series(rows: Seq[(Long, Long, Double)]) = {
    import spark.implicits._
    rows.toDF("user_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("value"))
  }

  test("counterAgg: reset-adjusted delta, reset count, endpoint rate") {
    // counter 10 → 25 → 5 (reset) → 9: delta = 15 + 5 + 4 = 24, 1 reset,
    // span 30 s, rate 0.8/s
    val df = series(Seq((1L, 0L, 10.0), (1L, 10L, 25.0), (1L, 20L, 5.0), (1L, 30L, 9.0)))
    val out = TsAnalytics.counterAgg(df, Seq("user_id"), "ts", "value").collect().head
    assert(out.getAs[Long]("n_points") === 4L)
    assert(out.getAs[Long]("n_resets") === 1L)
    assert(out.getAs[Double]("first_v") === 10.0)
    assert(out.getAs[Double]("last_v") === 9.0)
    assert(out.getAs[Double]("delta") === 24.0)
    assert(out.getAs[Long]("span_s") === 30L)
    assert(out.getAs[Double]("rate_per_s") === 0.8)
  }

  test("counterAggBucketed: segment increase splits across bucket edges, resets carry") {
    // 10 s buckets. 5.0@0s → 8.0@15s: Δ = 30000 e4 over 15 s, bucket 0
    // gets 10/15 (= 20000), bucket 1 gets 5/15 (= 10000). Then a reset
    // 8.0 → 2.0@20s: carry 80000, adjusted Δ = 20000 inside bucket 1's
    // [15,20) remainder; the reset reading itself lands in bucket 2.
    val df = series(Seq((1L, 0L, 5.0), (1L, 15L, 8.0), (1L, 20L, 2.0)))
    val out = TsAnalytics
      .counterAggBucketed(df, Seq("user_id"), "ts", "value", 10L)
      .collect().map(r => r.getAs[Long]("bucket_s") -> r).toMap
    assert(out.keySet === Set(0L, 10L, 20L))
    assert(out(0L).getAs[Long]("n_points") === 1L)
    assert(out(0L).getAs[Long]("covered_us") === 10000000L)
    assert(out(0L).getAs[Long]("delta_interp_e4") === 20000L)
    assert(out(0L).getAs[Double]("rate_per_s") === 0.2)
    assert(out(10L).getAs[Long]("covered_us") === 10000000L)
    assert(out(10L).getAs[Long]("delta_interp_e4") === 10000L + 20000L)
    assert(out(10L).getAs[Long]("delta_in_e4") === 0L) // single interior point
    assert(out(20L).getAs[Long]("n_resets") === 1L)
    assert(out(20L).isNullAt(out(20L).fieldIndex("covered_us"))) // no outgoing segment
    assert(out(20L).isNullAt(out(20L).fieldIndex("rate_per_s")))
  }

  test("counterAggBucketed: gap buckets spanned by one segment appear with n_points 0") {
    // one segment 0s → 35s over 10 s buckets: buckets 1 and 2 have no
    // readings but carry their apportioned share of the increase
    val df = series(Seq((1L, 0L, 0.0), (1L, 35L, 7.0)))
    val out = TsAnalytics
      .counterAggBucketed(df, Seq("user_id"), "ts", "value", 10L)
      .collect().map(r => r.getAs[Long]("bucket_s") -> r).toMap
    assert(out.keySet === Set(0L, 10L, 20L, 30L))
    assert(out(10L).getAs[Long]("n_points") === 0L)
    assert(out(10L).getAs[Long]("delta_interp_e4") === 20000L) // 70000·10/35
    assert(out(30L).getAs[Long]("n_points") === 1L)
    assert(out(30L).getAs[Long]("covered_us") === 5000000L)
    // total increase is conserved across the split (truncation ≤ 1 e-4/term)
    assert(out.values.map(r => Option(r.getAs[Any]("delta_interp_e4"))
      .fold(0L)(_.asInstanceOf[Long])).sum === 70000L)
  }

  test("gaugeAggBucketed: negative deltas split with sign-safe truncation") {
    // 10 s buckets, falling gauge 8.0@0s → 5.0@15s: Δ = −30000 e4 over
    // 15 s; |Δ| splits 10/15 then 5/15 and the sign re-applies —
    // bucket 0 gets −20000, bucket 1 −10000 (floor division on −Δ·ov
    // would give −20001/−10001 on non-exact splits; this fixture's
    // follow-up segment 5.0 → 6.0@20s lands +20000 in bucket 1)
    val df = series(Seq((1L, 0L, 8.0), (1L, 15L, 5.0), (1L, 20L, 6.0)))
    val out = TsAnalytics
      .gaugeAggBucketed(df, Seq("user_id"), "ts", "value", 10L)
      .collect().map(r => r.getAs[Long]("bucket_s") -> r).toMap
    assert(out(0L).getAs[Long]("delta_interp_e4") === -20000L)
    assert(out(0L).getAs[Double]("rate_per_s") === -0.2)
    assert(out(10L).getAs[Long]("delta_interp_e4") === -10000L + 10000L)
    assert(out(20L).getAs[Long]("n_points") === 1L)
    assert(out(20L).isNullAt(out(20L).fieldIndex("covered_us")))
    // truncation-toward-zero parity: a non-exact negative split must not
    // overshoot — one-third of −10000 e4 over 3 covered buckets
    val odd = series(Seq((2L, 0L, 1.0), (2L, 30L, 0.0)))
    val o = TsAnalytics
      .gaugeAggBucketed(odd, Seq("user_id"), "ts", "value", 9L)
      .collect().map(r => r.getAs[Long]("bucket_s") -> r.getAs[Long]("delta_interp_e4")).toMap
    // buckets [0,9) [9,18) [18,27) [27,30): 9/30, 9/30, 9/30, 3/30 of −10000
    assert(o === Map(0L -> -3000L, 9L -> -3000L, 18L -> -3000L, 27L -> -1000L))
  }

  test("counterAgg: single-point key has zero delta and null rate") {
    val out = TsAnalytics.counterAgg(series(Seq((7L, 5L, 42.0))), Seq("user_id"), "ts", "value")
      .collect().head
    assert(out.getAs[Long]("n_points") === 1L)
    assert(out.getAs[Long]("n_resets") === 0L)
    assert(out.getAs[Double]("delta") === 0.0)
    assert(out.getAs[Long]("span_s") === 0L)
    assert(out.isNullAt(out.fieldIndex("rate_per_s")))
  }

  test("timeWeightedAvg: LOCF weighting over the observed interval") {
    // v=10 holds 10 s, v=20 holds 30 s, v=0 terminal (weight 0):
    // twa = (10·10 + 20·30) / 40 = 17.5
    val df = series(Seq((1L, 0L, 10.0), (1L, 10L, 20.0), (1L, 40L, 0.0)))
    val out = TsAnalytics.timeWeightedAvg(df, Seq("user_id"), "ts", "value").collect().head
    assert(out.getAs[Long]("n_points") === 3L)
    assert(out.getAs[Long]("sum_dur_ms") === 40000L)
    assert(out.getAs[Long]("wsum_e4ms") === (100000L * 10000L + 200000L * 30000L))
    assert(out.getAs[Double]("twa") === 17.5)
  }

  test("timeWeightedAvg: null values are not observations; single point → null twa") {
    val df = series(Seq((1L, 0L, 3.0), (2L, 0L, 1.0), (2L, 10L, Double.NaN)))
      .withColumn("value", when(isnan(col("value")), lit(null)).otherwise(col("value")))
    val out = TsAnalytics.timeWeightedAvg(df, Seq("user_id"), "ts", "value")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).isNullAt(out(1L).fieldIndex("twa")))
    // user 2's null row dropped → single observation → null twa, 0 duration
    assert(out(2L).getAs[Long]("n_points") === 1L)
    assert(out(2L).getAs[Long]("sum_dur_ms") === 0L)
    assert(out(2L).isNullAt(out(2L).fieldIndex("twa")))
  }

  test("histogram: width_bucket layout with under/overflow buckets") {
    val df = series(Seq(
      (1L, 0L, -5.0),  // underflow → 0
      (1L, 1L, 0.0),   // [0,10) → 1
      (1L, 2L, 9.99),  // → 1
      (1L, 3L, 10.0),  // [10,20) → 2
      (1L, 4L, 99.9),  // [90,100) → 10
      (1L, 5L, 100.0), // overflow → 11
      (1L, 6L, 250.0)  // overflow → 11
    ))
    val out = TsAnalytics.histogram(df, Seq("user_id"), "value", lo = 0.0, hi = 100.0, nBuckets = 10)
      .collect().map(r => r.getAs[Int]("bucket") -> r.getAs[Long]("n")).toMap
    assert(out === Map(0 -> 1L, 1 -> 2L, 2 -> 1L, 10 -> 1L, 11 -> 2L))
  }

  test("lttb: endpoints always kept, spike point survives, ties keep earliest") {
    // 10-point series, downsample to 5: the v=100 spike at t=5 must be
    // selected (largest triangle in its bucket by a wide margin)
    val pts = (0L until 10L).map(t => (1L, t, if (t == 5L) 100.0 else t.toDouble))
    val out = TsAnalytics.lttb(series(pts), "user_id", "ts", "value", nOut = 5)
      .orderBy("t_us").collect()
    assert(out.length === 5)
    assert(out.head.getAs[Long]("t_us") === 0L && out.last.getAs[Long]("t_us") === 9000000L)
    assert(out.exists(r => r.getAs[Double]("v") === 100.0), "spike must survive downsampling")
  }

  test("lttb: short series pass through; nOut=2 keeps only endpoints") {
    val df = series(Seq((1L, 0L, 1.0), (1L, 5L, 2.0), (1L, 9L, 3.0)))
    assert(TsAnalytics.lttb(df, "user_id", "ts", "value", nOut = 10).count() === 3)
    val two = TsAnalytics.lttb(df, "user_id", "ts", "value", nOut = 2)
      .orderBy("t_us").collect()
    assert(two.map(_.getAs[Long]("t_us")).toSeq === Seq(0L, 9000000L))
  }

  test("lttbSelect matches a brute-force check on bucket structure") {
    // downsampling n=102 to 12 keeps 102-2 interior buckets of 10 → every
    // interior pick must come from its own bucket, strictly increasing t
    val s = (0 until 102).map(i => (i.toLong, math.sin(i / 7.0) * 10 + (i % 13))).toArray
    val out = TsAnalytics.lttbSelect(s, 12)
    assert(out.length === 12)
    assert(out.head === s.head && out.last === s.last)
    val ts = out.map(_._1)
    assert(ts.zip(ts.tail).forall { case (a, b) => a < b }, "selection must be time-ordered")
    val every = 100.0 / 10
    out.slice(1, 11).zipWithIndex.foreach { case ((t, _), i) =>
      val lo = (i * every).toInt + 1
      val hi = ((i + 1) * every).toInt + 1
      assert(t >= lo && t < hi, s"interior pick $i at t=$t escaped bucket [$lo,$hi)")
    }
  }

  test("gaugeAgg: bidirectional delta, final-step idelta and irate") {
    // gauge 10 → 25 → 5 → 9: delta = last−first = −1 (no reset logic),
    // idelta_right = 9−5 = 4 over a 10 s gap → irate 0.4/s
    val df = series(Seq((1L, 0L, 10.0), (1L, 10L, 25.0), (1L, 20L, 5.0), (1L, 30L, 9.0)))
    val out = TsAnalytics.gaugeAgg(df, Seq("user_id"), "ts", "value").collect().head
    assert(out.getAs[Long]("n_points") === 4L)
    assert(out.getAs[Double]("first_v") === 10.0)
    assert(out.getAs[Double]("last_v") === 9.0)
    assert(out.getAs[Double]("delta") === -1.0)
    assert(out.getAs[Double]("idelta_right") === 4.0)
    assert(out.getAs[Long]("span_s") === 30L)
    assert(out.getAs[Double]("irate_per_s") === 0.4)
  }

  test("gaugeAgg: single-point key → zero delta, null instantaneous accessors") {
    val out = TsAnalytics.gaugeAgg(series(Seq((7L, 5L, 42.0))), Seq("user_id"), "ts", "value")
      .collect().head
    assert(out.getAs[Double]("delta") === 0.0)
    assert(out.isNullAt(out.fieldIndex("idelta_right")))
    assert(out.isNullAt(out.fieldIndex("irate_per_s")))
  }

  test("statsRegr: exact sufficient statistics and OLS on a known line") {
    // y = 2x + 3 at x = 0,10,20,30 s → slope 2, intercept 3, corr 1
    val df = series(Seq((1L, 0L, 3.0), (1L, 10L, 23.0), (1L, 20L, 43.0), (1L, 30L, 63.0)))
    val out = TsAnalytics.statsRegr(df, Seq("user_id"), "ts", "value").collect().head
    assert(out.getAs[Long]("n") === 4L)
    assert(out.getAs[Long]("sum_x") === 60L)
    assert(out.getAs[Long]("sum_y") === 30000L + 230000L + 430000L + 630000L)
    assert(out.getAs[Double]("slope") === 2.0)
    assert(out.getAs[Double]("intercept") === 3.0)
    assert(out.getAs[Double]("corr") === 1.0)
  }

  test("statsAgg1d: exact power sums and population moments on a known set") {
    // values 1,2,3,4 → mean 2.5, pop var 1.25, skew 0, Pearson kurtosis
    // m4/m2² = 2.5625/1.5625 = 1.64, sample stddev √(5/3)
    val df = series(Seq((1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 20L, 3.0), (1L, 30L, 4.0)))
    val out = TsAnalytics.statsAgg1d(df, Seq("user_id"), "value").collect().head
    assert(out.getAs[Long]("n") === 4L)
    assert(out.getAs[Long]("sum_y") === 100000L)
    assert(out.getAs[java.math.BigDecimal]("sum_y2").longValueExact() ===
      (1L + 4 + 9 + 16) * 100000000L)
    assert(out.getAs[java.math.BigDecimal]("sum_y3").longValueExact() ===
      (1L + 8 + 27 + 64) * 1000000000000L)
    assert(out.getAs[java.math.BigDecimal]("sum_y4").longValueExact() ===
      (1L + 16 + 81 + 256) * 10000000000000000L)
    assert(out.getAs[Double]("average") === 2.5)
    assert(math.abs(out.getAs[Double]("stddev_pop") - math.sqrt(1.25)) < 1e-9)
    assert(math.abs(out.getAs[Double]("stddev_samp") - math.sqrt(5.0 / 3.0)) < 1e-9)
    assert(math.abs(out.getAs[Double]("skewness")) < 1e-9)
    assert(math.abs(out.getAs[Double]("kurtosis") - 1.64) < 1e-9)
  }

  test("statsAgg1d: constant series → zero spread, null skew/kurtosis (not NaN)") {
    val df = series(Seq((1L, 0L, 7.0), (1L, 10L, 7.0), (2L, 0L, 9.0)))
    val out = TsAnalytics.statsAgg1d(df, Seq("user_id"), "value")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).getAs[Double]("stddev_pop") === 0.0)
    assert(out(1L).isNullAt(out(1L).fieldIndex("skewness")))
    assert(out(1L).isNullAt(out(1L).fieldIndex("kurtosis")))
    assert(out(2L).getAs[Double]("average") === 9.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("stddev_samp")))
  }

  test("statsRollup1d: daily-from-hourly equals daily-from-raw exactly") {
    // integer power sums add exactly, so the re-derived moments must be
    // bit-identical however the children are grouped
    val rows = (0 until 50).map(i => (1L + i % 3, i * 977L, (i * 7 % 23) + 0.25 * (i % 5)))
    val df = series(rows)
      .withColumn("hour_s", expr("(unix_micros(ts) div 3600000000L) * 3600"))
    val hourly = TsAnalytics.statsAgg1d(df, Seq("user_id", "hour_s"), "value")
    val rolled = TsAnalytics
      .statsRollup1d(hourly.withColumn("day_s", expr("(hour_s div 86400) * 86400")),
        Seq("user_id", "day_s"))
    val direct = TsAnalytics.statsAgg1d(
      df.withColumn("day_s", expr("((hour_s div 86400) * 86400)")),
      Seq("user_id", "day_s"), "value")
    val cols = Seq("user_id", "day_s", "n", "sum_y", "sum_y2", "sum_y3", "sum_y4",
      "average", "stddev_pop", "stddev_samp", "skewness", "kurtosis")
    val a = rolled.select(cols.map(col): _*).orderBy("user_id", "day_s").collect().toSeq
    val b = direct.select(cols.map(col): _*).orderBy("user_id", "day_s").collect().toSeq
    assert(a === b)
  }

  test("statsRolling1d: trailing RANGE frame covers observed buckets only, equals per-row direct aggregate") {
    // hours 0, 1, 2, then a gap to hour 30: the 24 h frame at hour 30
    // must contain ONLY hour 30 (time-correct RANGE, not 24 rows back)
    val rows = Seq(
      (1L, 0L, 1.0), (1L, 100L, 3.0), // hour 0
      (1L, 3600L, 5.0),               // hour 1
      (1L, 7200L, 7.0),               // hour 2
      (1L, 108000L, 11.0)             // hour 30
    )
    val df = series(rows)
      .withColumn("hour_s", expr("(unix_micros(ts) div 3600000000L) * 3600"))
    val hourly = TsAnalytics.statsAgg1d(df, Seq("user_id", "hour_s"), "value")
    val rolled = TsAnalytics.statsRolling1d(hourly, Seq("user_id"), "hour_s", 86400L)
      .collect().map(r => r.getAs[Long]("hour_s") -> r).toMap
    assert(rolled(0L).getAs[Long]("n") === 2L)      // hour 0: its own 2 points
    assert(rolled(3600L).getAs[Long]("n") === 3L)   // hours 0-1
    assert(rolled(7200L).getAs[Long]("n") === 4L)   // hours 0-2
    assert(rolled(108000L).getAs[Long]("n") === 1L) // gap: hour 30 alone
    assert(rolled(108000L).getAs[Double]("average") === 11.0)
    assert(rolled(7200L).getAs[Double]("average") === 4.0) // (1+3+5+7)/4
    // the frame's moments equal a direct aggregate over the frame's rows
    val direct = TsAnalytics.statsAgg1d(
        df.where(col("hour_s") <= 7200L), Seq("user_id"), "value")
      .collect().head
    val at2 = rolled(7200L)
    for (c <- Seq("stddev_pop", "stddev_samp", "skewness", "kurtosis"))
      assert(at2.getAs[Double](c) === direct.getAs[Double](c), c)
  }

  test("statsAgg2d/statsRolling2d: known line recovered; slope/corr agree with statsRegr; gapped RANGE frame time-correct") {
    // y = 2x + 3 at x = 0,10,20,30 s (all inside hour 0)
    val df = series(Seq((1L, 0L, 3.0), (1L, 10L, 23.0), (1L, 20L, 43.0), (1L, 30L, 63.0)))
      .withColumn("hour_s", expr("(unix_micros(ts) div 3600000000L) * 3600"))
    val hourly = TsAnalytics.statsAgg2d(df, Seq("user_id", "hour_s"), "ts", "value")
    val rolled = TsAnalytics.statsRolling2d(hourly, Seq("user_id"), "hour_s", 86400L)
      .collect().head
    assert(rolled.getAs[Long]("n") === 4L)
    assert(rolled.getAs[Double]("slope") === 2.0)
    // x here IS the absolute epoch second, so the epoch-0 intercept is 3
    assert(rolled.getAs[Double]("intercept") === 3.0)
    assert(rolled.getAs[Double]("corr") === 1.0)
    // shift invariance: statsRegr (x relative to the key min) must agree
    // on slope and corr — the cross-terms are identical integers
    val regr = TsAnalytics.statsRegr(df, Seq("user_id"), "ts", "value").collect().head
    assert(regr.getAs[Double]("slope") === rolled.getAs[Double]("slope"))
    assert(regr.getAs[Double]("corr") === rolled.getAs[Double]("corr"))
    // time-correct frame: a point 30 h later must see ONLY its own bucket
    // in a 24 h trailing window (RANGE, not 24 rows back)
    val gapped = series(Seq(
      (2L, 0L, 1.0), (2L, 10L, 2.0), (2L, 30L * 3600L, 9.0), (2L, 30L * 3600L + 10L, 11.0)))
      .withColumn("hour_s", expr("(unix_micros(ts) div 3600000000L) * 3600"))
    val g = TsAnalytics.statsRolling2d(
      TsAnalytics.statsAgg2d(gapped, Seq("user_id", "hour_s"), "ts", "value"),
      Seq("user_id"), "hour_s", 86400L)
      .collect().map(r => r.getAs[Long]("hour_s") -> r).toMap
    assert(g(30L * 3600L).getAs[Long]("n") === 2L)
    // and the degenerate single-point frame yields nulls, not NaN
    val one = TsAnalytics.statsRolling2d(
      TsAnalytics.statsAgg2d(
        series(Seq((3L, 0L, 5.0))).withColumn("hour_s", lit(0L)),
        Seq("user_id", "hour_s"), "ts", "value"),
      Seq("user_id"), "hour_s", 86400L).collect().head
    assert(one.isNullAt(one.fieldIndex("slope")))
    assert(one.isNullAt(one.fieldIndex("corr")))
  }

  test("statsRegr: degenerate keys yield null slope/corr, not NaN") {
    // user 1: single point (sxx = 0); user 2: constant value (syy = 0)
    val df = series(Seq((1L, 0L, 5.0), (2L, 0L, 7.0), (2L, 10L, 7.0)))
    val out = TsAnalytics.statsRegr(df, Seq("user_id"), "ts", "value")
      .collect().map(r => r.getAs[Long]("user_id") -> r).toMap
    assert(out(1L).isNullAt(out(1L).fieldIndex("slope")))
    assert(out(1L).isNullAt(out(1L).fieldIndex("corr")))
    assert(out(2L).getAs[Double]("slope") === 0.0)
    assert(out(2L).isNullAt(out(2L).fieldIndex("corr")))
  }

  test("stateAgg: LOCF durations, run-compressed entries, terminal row weighs zero") {
    import spark.implicits._
    // a(0) a(5) b(10) a(20): 'a' holds 0→5 and 5→10 (10 s total) plus the
    // terminal 20→end segment (0 s), entered twice (the a,a run is one
    // entry); 'b' holds 10→20 (10 s), one entry
    val df = Seq((1L, 0L, "a"), (1L, 5L, "a"), (1L, 10L, "b"), (1L, 20L, "a"))
      .toDF("user_id", "sec", "state")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("state"))
    val out = TsAnalytics.stateAgg(df, Seq("user_id"), "ts", "state")
      .collect().map(r => r.getAs[String]("state") -> r).toMap
    assert(out("a").getAs[Long]("n_obs") === 3L)
    assert(out("a").getAs[Long]("n_entries") === 2L)
    assert(out("a").getAs[Long]("dur_ms") === 10000L)
    assert(out("b").getAs[Long]("n_obs") === 1L)
    assert(out("b").getAs[Long]("n_entries") === 1L)
    assert(out("b").getAs[Long]("dur_ms") === 10000L)
  }

  test("candlestick: OHLC picks by time, exact e4 volume") {
    // one hour bucket: open = first value, close = last, high/low extremes
    val df = series(Seq((1L, 0L, 5.0), (1L, 60L, 9.5), (1L, 120L, 1.25), (1L, 180L, 7.0)))
    val out = TsAnalytics.candlestick(df, Seq("user_id"), "ts", "value", bucket = "hour")
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[Long]("n_trades") === 4L)
    assert(r.getAs[Double]("open") === 5.0)
    assert(r.getAs[Double]("high") === 9.5)
    assert(r.getAs[Double]("low") === 1.25)
    assert(r.getAs[Double]("close") === 7.0)
    assert(r.getAs[Long]("volume_e4") === 50000L + 95000L + 12500L + 70000L)
  }

  test("heartbeatAgg: gaps past liveness split uptime, final beat adds its window") {
    // liveness 10 s, beats at 0, 5, 30: gaps 5 (covered), 25 (10 up + 15
    // down) + trailing 10 → up = 5+10+10 = 25 s, down = 15 s, 1 gap
    val df = series(Seq((1L, 0L, 1.0), (1L, 5L, 1.0), (1L, 30L, 1.0)))
    val out = TsAnalytics.heartbeatAgg(df, Seq("user_id"), "ts", livenessS = 10L)
      .collect().head
    assert(out.getAs[Long]("n_beats") === 3L)
    assert(out.getAs[Long]("n_gaps") === 1L)
    assert(out.getAs[Long]("up_ms") === 25000L)
    assert(out.getAs[Long]("down_ms") === 15000L)
    assert(out.getAs[Long]("span_ms") === 40000L)
  }

  test("heartbeatAgg: single beat is alive for exactly the liveness window") {
    val out = TsAnalytics.heartbeatAgg(series(Seq((1L, 0L, 1.0))), Seq("user_id"), "ts", 10L)
      .collect().head
    assert(out.getAs[Long]("up_ms") === 10000L)
    assert(out.getAs[Long]("down_ms") === 0L)
    assert(out.getAs[Long]("n_gaps") === 0L)
  }

  test("hierarchical rollup equals a direct aggregate of the raw series") {
    import spark.implicits._
    // 3 days × uneven hourly coverage; daily-from-hourly must equal
    // daily-from-raw exactly (exact-long sums decompose)
    val rows = for {
      d <- 0 until 3; h <- 0 until 24 by (d + 1); m <- Seq(0, 17, 49)
    } yield (1L, d * 86400L + h * 3600L + m * 60L, (h * 100 + m) / 7.0)
    val df = series(rows)
    val hourly = TsAnalytics.bucketRollup(df, Seq("user_id"), "ts", "value", "hour")
    val daily = TsAnalytics.rerollup(hourly, Seq("user_id"), "day")
      .select("bucket_ts", "n", "sum_e4", "min_v", "max_v")
    val direct = df
      .groupBy(date_trunc("day", col("ts")).as("bucket_ts"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("value") * 10000 + 0.5).cast("long")).as("sum_e4"),
        min(col("value")).as("min_v"),
        max(col("value")).as("max_v"))
    assert(daily.exceptAll(direct).isEmpty && direct.exceptAll(daily).isEmpty)
    // and the hourly level genuinely fed the daily one: n_child counts hours
    val d0 = TsAnalytics.rerollup(hourly, Seq("user_id"), "day")
      .orderBy("bucket_ts").collect()
    assert(d0.map(_.getAs[Long]("n_child")).toSeq === Seq(24L, 12L, 8L))
  }

  test("timeBucket: arbitrary width with phase origin; pre-origin timestamps floor") {
    val df = series(Seq((1L, 0L, 1.0), (1L, 29L, 1.0), (1L, 30L, 1.0), (1L, 119L, 1.0), (1L, 120L, 1.0)))
    val out = df
      .select(
        unix_seconds(col("ts")).as("s"),
        unix_seconds(TsAnalytics.timeBucket(col("ts"), 90L, 30L)).as("b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // 90 s buckets anchored at +30 s: [-60, 30), [30, 120), [120, 210)…
    assert(out === Map(0L -> -60L, 29L -> -60L, 30L -> 30L, 119L -> 30L, 120L -> 120L))
  }

  test("asapSelect: periodic noise picks a window at the period; smoothing cuts roughness") {
    // period-12 sine + deterministic high-frequency jitter: the ACF peaks
    // at lag 12, and a 12-wide SMA should crush the jitter
    val v = Array.tabulate(240) { i =>
      math.sin(i * 2 * math.Pi / 12) * 10 + (if (i % 2 == 0) 1.5 else -1.5)
    }
    val w = TsAnalytics.asapSelect(v, maxLagCap = 100)
    assert(w > 1, "periodic jittery series must choose to smooth")
    val sm = TsAnalytics.asapSma(v, w)
    assert(TsAnalytics.asapRoughness(sm) < TsAnalytics.asapRoughness(v))
    assert(TsAnalytics.asapKurtosis(sm) >= TsAnalytics.asapKurtosis(v))
  }

  test("asapSelect: constant and tiny series do not smooth") {
    assert(TsAnalytics.asapSelect(Array.fill(50)(3.0), 100) === 1)
    assert(TsAnalytics.asapSelect(Array(1.0, 2.0, 3.0), 100) === 1)
  }

  test("asapSma: window-start alignment and exact means") {
    val sm = TsAnalytics.asapSma(Array(1.0, 2.0, 3.0, 4.0), 2)
    assert(sm.toSeq === Seq(1.5, 2.5, 3.5))
    assert(TsAnalytics.asapSma(Array(1.0, 2.0), 1).toSeq === Seq(1.0, 2.0))
  }

  test("asapSmooth: distributed path equals the driver replay, per key") {
    val pts = (0L until 120L).flatMap { t =>
      val periodic = math.sin(t * 2 * math.Pi / 12) * 10 + (if (t % 2 == 0) 1.5 else -1.5)
      Seq((1L, t, periodic), (2L, t, 5.0))
    }
    val out = TsAnalytics.asapSmooth(series(pts), "user_id", "ts", "value")
      .orderBy("key", "t_us").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val expected = pts.groupBy(_._1).toSeq.flatMap { case (k, rows) =>
      val s = rows.map(p => (p._2 * 1000000L, p._3)).sortBy(_._1).toArray
      TsAnalytics.asapReplay(s, 400).map { case (t, v, w) => (k.toString, t, v, w) }
    }.sortBy(r => (r._1, r._2))
    assert(out.toSeq === expected, "flatMapGroups path must reproduce the sequential core exactly")
    // the constant key must pass through unsmoothed
    assert(out.filter(_._1 == "2").forall(r => r._4 === 1 && r._3 === 5.0))
  }

  test("timeWeightedBucketed: segments split across bucket edges, exact overlap weighting") {
    // v=10 held [0, 5400s), v=20 held [5400s, 7200s): hour 0 is pure 10,
    // hour 1 is half 10 / half 20 → twa 15; the terminal obs ends coverage
    val df = series(Seq((1L, 0L, 10.0), (1L, 5400L, 20.0), (1L, 7200L, 99.0)))
    val out = TsAnalytics.timeWeightedBucketed(df, Seq("user_id"), "ts", "value", 3600L)
      .orderBy("bucket_s").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getDouble(4)))
    assert(out.toSeq === Seq((0L, 3600000000L, 10.0), (3600L, 3600000000L, 15.0)))
  }

  test("bucketed explodes: duplicate per-key timestamps yield no phantom buckets or NaN") {
    import spark.implicits._
    // duplicate ts at 100 s: the zero-length segment must be dropped, not
    // exploded into a DESCENDING sequence of phantom (key,bucket) rows
    // with covered_us = 0 and twa = 0/0
    val df = series(Seq((1L, 100L, 10.0), (1L, 100L, 12.0), (1L, 200L, 20.0)))
    val twa = TsAnalytics.timeWeightedBucketed(df, Seq("user_id"), "ts", "value", 3600L).collect()
    assert(twa.length === 1)
    assert(twa.head.getAs[Long]("covered_us") === 100000000L)
    assert(!twa.head.getAs[Double]("twa").isNaN)
    val hb = TsAnalytics.heartbeatUptimeBucketed(df, Seq("user_id"), "ts", 600L, 3600L).collect()
    assert(hb.length === 1 && hb.head.getAs[Long]("up_ms") === 700000L)
    val sdf = Seq((1L, 100L, "A"), (1L, 100L, "A"), (1L, 200L, "B"))
      .toDF("user_id", "sec", "state")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("state"))
    val sd = TsAnalytics.stateDurationBucketed(sdf, Seq("user_id"), "ts", "state", 3600L).collect()
    assert(sd.length === 1 && sd.head.getAs[Long]("dur_ms") === 100000L)
  }

  test("heartbeatUptimeBucketed: clamp then split — gaps, edges, final-beat window") {
    // liveness 600 s, hour buckets. Beat 3000 clamps at the next beat
    // (3500): 500 s in hour0. Beat 3500 covers [3500, 4100): 100 s in
    // hour0 + 500 s across the edge into hour1. Final beat 7000 covers
    // its full window [7000, 7600): 200 s in hour1 + 400 s in hour2.
    val df = series(Seq((1L, 3000L, 1.0), (1L, 3500L, 1.0), (1L, 7000L, 1.0)))
    val out = TsAnalytics.heartbeatUptimeBucketed(df, Seq("user_id"), "ts", 600L, 3600L)
      .orderBy("bucket_s").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq === Seq((0L, 600000L), (3600L, 700000L), (7200L, 400000L)))
  }

  test("stateDurationBucketed: state held across a bucket edge charges both sides") {
    import spark.implicits._
    // state A [0, 5400s), B [5400, 7200): hour0 = A 3600s; hour1 = A 1800s + B 1800s
    val df = Seq((1L, 0L, "A"), (1L, 5400L, "B"), (1L, 7200L, "C"))
      .toDF("user_id", "sec", "state")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("state"))
    val out = TsAnalytics.stateDurationBucketed(df, Seq("user_id"), "ts", "state", 3600L)
      .orderBy("state", "bucket_s").collect()
      .map(r => (r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq(("A", 0L, 3600000L), ("A", 3600L, 1800000L), ("B", 3600L, 1800000L)))
  }

  test("candlestick rollup equals a direct daily aggregate") {
    // two users, 44 hours of alternating values spanning two days
    val pts = (0 until 44).flatMap { h =>
      Seq((1L, h * 3600L + 60L, (h % 7).toDouble + 0.25), (2L, h * 3600L + 120L, 50.0 - h))
    }
    val df = series(pts)
    val hourly = TsAnalytics.candlestick(df, Seq("user_id"), "ts", "value", bucket = "hour")
    val daily = TsAnalytics.rerollupCandlestick(hourly, Seq("user_id"), bucket = "day")
      .select("user_id", "bucket_ts", "n_trades", "open", "high", "low", "close", "volume_e4")
    val direct = TsAnalytics.candlestick(df, Seq("user_id"), "ts", "value", bucket = "day")
      .select("user_id", "bucket_ts", "n_trades", "open", "high", "low", "close", "volume_e4")
    assert(daily.exceptAll(direct).isEmpty && direct.exceptAll(daily).isEmpty)
  }

  test("plans stay key-partitioned — no single-partition window or sort") {
    val df = series((0L until 50L).flatMap(t => Seq((1L, t, t.toDouble), (2L, t, 1.0))))
    for (
      plan <- Seq(
        TsAnalytics.counterAgg(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.timeWeightedAvg(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.histogram(df, Seq("user_id"), "value", 0.0, 100.0, 10),
        TsAnalytics.gaugeAgg(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.statsRegr(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.stateAgg(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.heartbeatAgg(df, Seq("user_id"), "ts", 10L),
        TsAnalytics.rerollup(
          TsAnalytics.bucketRollup(df, Seq("user_id"), "ts", "value", "hour"),
          Seq("user_id"), "day"),
        TsAnalytics.rerollupCandlestick(
          TsAnalytics.candlestick(df, Seq("user_id"), "ts", "value", "hour"),
          Seq("user_id"), "day"),
        TsAnalytics.timeWeightedBucketed(df, Seq("user_id"), "ts", "value", 3600L),
        df.groupBy(col("user_id"), TsAnalytics.timeBucket(col("ts"), 90L, 30L).as("b"))
          .agg(count(lit(1)).as("n"))
      )
    ) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange SinglePartition"), s"single-partition stage:\n$p")
    }
  }
}
