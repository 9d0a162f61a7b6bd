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

  test("plans stay key-partitioned — no single-partition window or sort") {
    val df = series((0L until 50L).flatMap(t => Seq((1L, t, t.toDouble), (2L, t, 1.0))))
    for (
      plan <- Seq(
        TsAnalytics.counterAgg(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.timeWeightedAvg(df, Seq("user_id"), "ts", "value"),
        TsAnalytics.histogram(df, Seq("user_id"), "value", 0.0, 100.0, 10)
      )
    ) {
      val p = plan.queryExecution.executedPlan.toString
      assert(!p.contains("Exchange SinglePartition"), s"single-partition stage:\n$p")
    }
  }
}
