package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.RollupRewrite

/** The transparent continuous-aggregate rewrite: a coarse time-bucket
  * aggregate over the RAW table is answered from the registered hourly
  * rollup — same results (the rerollup algebra is exact), rollup-sized
  * scan. Negative space matters as much: unsupported shapes must be left
  * untouched.
  */
class RollupRewriteSpec extends SparkSpec {

  private def measure = floor(col("value") * 10000 + 0.5).cast("long")

  /** Build + materialize + register an hourly rollup over sf0.001 events;
    * returns (raw, rollup parquet dir).
    */
  private def registered(): (DataFrame, String) = {
    RollupRewrite.clear()
    val raw = Tables.load(spark, sf0001, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_rw").toString
    RollupRewrite.buildRollup(raw, Seq("event_type"), "ts", measure, "hour")
      .write.mode("overwrite").parquet(dir)
    val rollup = spark.read.parquet(dir)
    RollupRewrite.register("events_hourly", RollupRewrite.Spec(
      raw.inputFiles.toSet,
      rollup.queryExecution.analyzed,
      Seq("event_type"),
      "ts",
      "hour",
      RollupRewrite.canonicalMeasure(raw, measure)))
    RollupRewrite.install(spark)
    (raw, dir)
  }

  private def dailyAgg(raw: DataFrame): DataFrame =
    raw
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(
        count(lit(1)).as("n"),
        sum(measure).as("s"),
        min(measure).as("mn"),
        max(measure).as("mx"))

  test("daily aggregate over raw rewrites to the hourly rollup with identical results") {
    RollupRewrite.clear()
    val raw = Tables.load(spark, sf0001, "events")
    val expected = dailyAgg(raw).collect().toSet // specs empty → no rewrite
    val (raw2, dir) = registered()
    val q = dailyAgg(raw2)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains(new java.io.File(dir).getName),
      s"rewrite did not fire — plan still scans raw:\n$physical")
    assert(!physical.contains("events.parquet"),
      "rewritten plan must not scan the raw events file")
    assert(q.collect().toSet === expected, "rewritten results must equal the raw aggregate")
  }

  test("coarser levels (month) rewrite too; finer (minute) does not") {
    val (raw, dir) = registered()
    val rollupName = new java.io.File(dir).getName
    val monthly = raw
      .groupBy(date_trunc("month", col("ts")).as("m"))
      .agg(sum(measure).as("s"))
    assert(monthly.queryExecution.executedPlan.toString.contains(rollupName),
      "month-over-hour must be served")
    val byMinute = raw
      .groupBy(date_trunc("minute", col("ts")).as("m"))
      .agg(sum(measure).as("s"))
    assert(!byMinute.queryExecution.executedPlan.toString.contains(rollupName),
      "minute is finer than the rollup and must scan raw")
    // and correctness of the served coarser level
    RollupRewrite.clear()
    val expected = raw.groupBy(date_trunc("month", col("ts")).as("m"))
      .agg(sum(measure).as("s")).collect().toSet
    registered()
    assert(monthly.collect().toSet === expected)
  }

  test("avg of the measure is served via sum/cnt decomposition; avg of anything else is not") {
    RollupRewrite.clear()
    val rawPre = Tables.load(spark, sf0001, "events")
    val avgQ = (df: DataFrame) => df
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(avg(measure).as("a"), count(lit(1)).as("n"))
    val expected = avgQ(rawPre).collect()
      .map(r => (r.getString(0), r.getTimestamp(1), math.round(r.getDouble(2) * 1e6), r.getLong(3)))
      .toSet
    val (raw, dir) = registered()
    val rollupName = new java.io.File(dir).getName
    val served = avgQ(raw)
    assert(served.queryExecution.executedPlan.toString.contains(rollupName),
      "avg(measure) must be served from sum_e/cnt_e")
    val got = served.collect()
      .map(r => (r.getString(0), r.getTimestamp(1), math.round(r.getDouble(2) * 1e6), r.getLong(3)))
      .toSet
    assert(got === expected, "decomposed avg must equal the raw avg (to 1e-6)")
    // avg over a non-measure expression is refused
    val withOtherAvg = raw
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(avg(col("value")).as("a"))
    assert(!withOtherAvg.queryExecution.executedPlan.toString.contains(rollupName),
      "avg over a non-measure expression must scan raw")
  }

  test("a scan whose file-set differs from the registration is never served") {
    RollupRewrite.clear()
    val raw = Tables.load(spark, sf0001, "events")
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_stale").toString
    RollupRewrite.buildRollup(raw, Seq("event_type"), "ts", measure, "hour")
      .write.mode("overwrite").parquet(dir)
    val rollup = spark.read.parquet(dir)
    // registration claims one MORE file than the scan covers — as if the
    // raw table gained a file after the rollup snapshot was taken (the
    // driver-side view: rollup no longer covers the table). Equality is
    // required, so the query must fall through to the raw scan.
    RollupRewrite.register("events_hourly_stale", RollupRewrite.Spec(
      raw.inputFiles.toSet + "file:/nonexistent/just-registered.parquet",
      rollup.queryExecution.analyzed,
      Seq("event_type"), "ts", "hour",
      RollupRewrite.canonicalMeasure(raw, measure)))
    RollupRewrite.install(spark)
    val q = dailyAgg(raw)
    assert(!q.queryExecution.executedPlan.toString.contains(new java.io.File(dir).getName),
      "stale registration (file-set mismatch) must not serve the query")
    RollupRewrite.clear()
  }

  test("non-matching measure and distinct aggregates are left on the raw scan") {
    val (raw, dir) = registered()
    val rollupName = new java.io.File(dir).getName
    val otherMeasure = raw
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(sum(col("value")).as("s")) // plain double sum ≠ registered measure
    assert(!otherMeasure.queryExecution.executedPlan.toString.contains(rollupName))
    val distinctCount = raw
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(countDistinct(col("user_id")).as("u"))
    assert(!distinctCount.queryExecution.executedPlan.toString.contains(rollupName))
  }

  test("sketch aggregates are served by state merge; UDD bit-exact, t-digest in-bound, non-registered refuses") {
    RollupRewrite.clear()
    graft.functions.GraftFunctions.register(spark)
    import graft.functions.GraftFunctions._
    val raw = Tables.load(spark, sf0001, "events")
    val sm = col("value").cast("double")
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_sk").toString
    RollupRewrite.buildSketchRollup(raw, Seq("event_type"), "ts", measure, sm, "hour")
      .write.mode("overwrite").parquet(dir)
    val rollup = spark.read.parquet(dir)
    def q(r: DataFrame): DataFrame = r
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(
        udd_quantile(udd_sketch_agg(col("value").cast("double")), 0.5).as("u50"),
        tdigest_quantile(tdigest_agg(col("value").cast("double")), 0.5).as("t50"))
    val direct = q(raw).collect()
      .map(r => (r.getString(0), r.getTimestamp(1)) -> (r.getDouble(2), r.getDouble(3))).toMap
    RollupRewrite.register("events_hourly_sk", RollupRewrite.Spec(
      raw.inputFiles.toSet, rollup.queryExecution.analyzed,
      Seq("event_type"), "ts", "hour",
      RollupRewrite.canonicalMeasure(raw, measure),
      sketchSql = Some(RollupRewrite.canonicalMeasure(raw, sm))))
    RollupRewrite.install(spark)
    val served = q(raw)
    val phys = served.queryExecution.executedPlan.toString
    assert(phys.contains(new java.io.File(dir).getName),
      s"sketch rewrite did not fire:\n$phys")
    assert(!phys.contains("events.parquet"), "served plan must not scan raw")
    served.collect().foreach { r =>
      val (du, dt) = direct((r.getString(0), r.getTimestamp(1)))
      // UDDSketch merge is per-bucket count addition — the served state is
      // the SAME state the direct aggregate builds, so the quantile is
      // bit-identical
      assert(r.getDouble(2) === du, s"UDD served quantile must be exact (got ${r.getDouble(2)} vs $du)")
      // t-digest merge re-compresses: same rank bound, not same bits
      assert(math.abs(r.getDouble(3) - dt) <= 0.05 * (math.abs(dt) + 1.0),
        s"t-digest served p50 ${r.getDouble(3)} drifted from direct $dt")
    }
    // a sketch over a NON-registered expression refuses back to raw
    val other = raw
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(udd_quantile(udd_sketch_agg(col("value") * 2.0), 0.5).as("u"))
    assert(!other.queryExecution.executedPlan.toString.contains(new java.io.File(dir).getName),
      "non-registered sketch measure must not be served")
    RollupRewrite.clear()
  }

  // ---- real-time serving (Timescale materialized_only = false) -----------

  /** Write slice A of the events fixture as the raw table, register an
    * hourly rollup over it WITH measureExpr, then append slice B files.
    */
  private def registeredRealtime(realtime: Boolean): (DataFrame, String, Set[String]) = {
    RollupRewrite.clear()
    val all = Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "event_type", "value")
    val rawDir = tempDir("rt_raw") + "/raw"
    all.where(col("event_id") % 4 =!= 0).coalesce(2).write.parquet(rawDir)
    val rawA = spark.read.parquet(rawDir)
    val filesA = rawA.inputFiles.toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_rt").toString
    RollupRewrite.buildRollup(rawA, Seq("event_type"), "ts", measure, "hour")
      .write.mode("overwrite").parquet(dir)
    val rollup = spark.read.parquet(dir)
    RollupRewrite.register("events_hourly_rt", RollupRewrite.Spec(
      filesA,
      rollup.queryExecution.analyzed,
      Seq("event_type"), "ts", "hour",
      RollupRewrite.canonicalMeasure(rawA, measure),
      measureExpr = Some(RollupRewrite.resolvedMeasure(rawA, measure)),
      realtime = realtime))
    RollupRewrite.install(spark)
    all.where(col("event_id") % 4 === 0).coalesce(1).write.mode("append").parquet(rawDir)
    val rawAB = spark.read.parquet(rawDir)
    (rawAB, dir, rawAB.inputFiles.toSet -- filesA)
  }

  test("real-time: a raw table that gained files is served from rollup UNION tail") {
    val (rawAB, dir, tailFiles) = registeredRealtime(realtime = true)
    assert(tailFiles.nonEmpty)
    val q = rawAB
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(
        count(lit(1)).as("n"), sum(measure).as("s"),
        min(measure).as("mn"), max(measure).as("mx"),
        avg(measure).as("a"))
    val physical = q.queryExecution.executedPlan
    assert(physical.toString.contains(new java.io.File(dir).getName),
      s"real-time rewrite did not fire:\n$physical")
    // the raw-side leg must scan ONLY the un-materialized tail files
    // (asserted on the optimized logical plan — the executed plan hides
    // its scans behind AdaptiveSparkPlanExec)
    val rawScans = q.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if !l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.exists(_.contains(new java.io.File(dir).getName)) =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSet
    }
    assert(rawScans.nonEmpty && rawScans.forall(_ == tailFiles),
      s"tail leg must scan exactly the appended files; got $rawScans vs $tailFiles")
    // results equal the TRUE raw aggregate: clear the registry and build
    // a FRESH plan (q's own QueryExecution is already forced — and
    // rewritten — so q.collect() stays the rewritten run; a new DataFrame
    // gets a new, un-rewritten QueryExecution)
    RollupRewrite.clear()
    val expected = rawAB
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(
        count(lit(1)).as("n"), sum(measure).as("s"),
        min(measure).as("mn"), max(measure).as("mx"),
        avg(measure).as("a"))
      .collect().toSet
    assert(expected.nonEmpty)
    assert(q.collect().toSet === expected,
      "real-time union must equal the raw aggregate exactly")
  }

  test("real-time tail on a hive-partitioned raw table keeps partition values") {
    RollupRewrite.clear()
    val all = Tables.load(spark, sf0001, "events")
      .select("event_id", "ts", "event_type", "value")
      .withColumn("pday", to_date(col("ts")))
    val rawDir = tempDir("rt_part") + "/raw"
    all.where(col("event_id") % 4 =!= 0).write.partitionBy("pday").parquet(rawDir)
    val rawA = spark.read.parquet(rawDir)
    val filesA = rawA.inputFiles.toSet
    val dir = java.nio.file.Files.createTempDirectory("graft_rollup_rtp").toString
    RollupRewrite.buildRollup(rawA, Seq("event_type"), "ts", measure, "hour")
      .write.mode("overwrite").parquet(dir)
    RollupRewrite.register("events_hourly_rtp", RollupRewrite.Spec(
      filesA,
      spark.read.parquet(dir).queryExecution.analyzed,
      Seq("event_type"), "ts", "hour",
      RollupRewrite.canonicalMeasure(rawA, measure),
      measureExpr = Some(RollupRewrite.resolvedMeasure(rawA, measure))))
    RollupRewrite.install(spark)
    all.where(col("event_id") % 4 === 0)
      .write.partitionBy("pday").mode("append").parquet(rawDir)
    val rawAB = spark.read.parquet(rawDir)
    val tailFiles = rawAB.inputFiles.toSet -- filesA
    assert(tailFiles.nonEmpty)
    // group by the PARTITION column too: the tail leg can only answer it
    // if the allowlisted index preserved partition values
    def aggOf(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), col("pday"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(measure).as("s"), avg(measure).as("a"))
    // pday is NOT a registered key, so this shape must fall through —
    // while the registered shape (event_type only) is served
    val unserved = aggOf(rawAB)
    assert(!unserved.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "pday is not a registered key; shape must fall through to raw")
    val q = rawAB
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(measure).as("s"), avg(measure).as("a"))
    val physical = q.queryExecution.executedPlan
    assert(physical.toString.contains(new java.io.File(dir).getName),
      s"partitioned real-time rewrite did not fire:\n$physical")
    val rawScans = q.queryExecution.optimizedPlan.collect {
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation
          if !l.relation.asInstanceOf[
            org.apache.spark.sql.execution.datasources.HadoopFsRelation]
            .location.inputFiles.exists(_.contains(new java.io.File(dir).getName)) =>
        l.relation.asInstanceOf[
          org.apache.spark.sql.execution.datasources.HadoopFsRelation]
          .location.inputFiles.toSet
    }
    assert(rawScans.nonEmpty && rawScans.forall(_ == tailFiles),
      s"tail leg must scan exactly the appended partitioned files; got $rawScans vs $tailFiles")
    RollupRewrite.clear()
    val expected = rawAB
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(measure).as("s"), avg(measure).as("a"))
      .collect().toSet
    assert(expected.nonEmpty)
    assert(q.collect().toSet === expected,
      "partitioned real-time union must equal the raw aggregate exactly")
  }

  test("min_by/max_by (OHLC open/close) and min/max(ts) are served from the rollup") {
    RollupRewrite.clear()
    val raw = Tables.load(spark, sf0001, "events")
    def ohlcAgg(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(
        min_by(measure, col("ts")).as("open"),
        max_by(measure, col("ts")).as("close"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        count(lit(1)).as("n"))
    val expected = ohlcAgg(raw).collect().toSet // registry empty → raw plan
    val (raw2, dir) = registered()
    val q = ohlcAgg(raw2)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains(new java.io.File(dir).getName),
      s"OHLC rewrite did not fire:\n$physical")
    assert(q.collect().toSet === expected,
      "rollup-served open/close/first/last must equal the raw aggregate")
    // ordering by anything other than the raw ts column must fall through
    val unserved = raw2
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(min_by(measure, col("value")).as("open_by_value"))
    assert(!unserved.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "min_by ordered by a non-ts column must not be served")
    RollupRewrite.clear()
  }

  test("real-time: OHLC partials flow through the rollup UNION tail leg") {
    val (rawAB, dir, tailFiles) = registeredRealtime(realtime = true)
    assert(tailFiles.nonEmpty)
    def ohlcAgg(df: DataFrame): DataFrame = df
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(
        min_by(measure, col("ts")).as("open"),
        max_by(measure, col("ts")).as("close"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"))
    val q = ohlcAgg(rawAB)
    assert(q.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "real-time OHLC rewrite did not fire")
    RollupRewrite.clear()
    val expected = ohlcAgg(rawAB).collect().toSet
    assert(expected.nonEmpty)
    assert(q.collect().toSet === expected,
      "real-time union open/close must equal the raw aggregate")
  }

  test("WHERE on keys and bucket-aligned ts ranges is served; unaligned bounds refuse") {
    RollupRewrite.clear()
    val raw = Tables.load(spark, sf0001, "events")
    def filteredAgg(df: DataFrame): DataFrame = df
      .where(col("event_type") =!= "error" &&
        col("ts") >= lit("2024-01-08 00:00:00").cast("timestamp") &&
        col("ts") < lit("2024-01-22 00:00:00").cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(measure).as("s"),
        min_by(measure, col("ts")).as("open"))
    val expected = filteredAgg(raw).collect().toSet // registry empty → raw
    val (raw2, dir) = registered()
    val q = filteredAgg(raw2)
    val physical = q.queryExecution.executedPlan.toString
    assert(physical.contains(new java.io.File(dir).getName),
      s"filtered rewrite did not fire:\n$physical")
    assert(!physical.contains("events.parquet"),
      "served filtered plan must not scan the raw events file")
    assert(q.collect().toSet === expected,
      "filtered rollup-served results must equal the raw aggregate")
    // boundaries NOT aligned to the hourly rollup bucket → refuse
    val unaligned = raw2
      .where(col("ts") >= lit("2024-01-08 00:30:00").cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    assert(!unaligned.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "a half-hour bound cannot be served from an hourly rollup")
    // closed upper bound includes a mid-bucket row → refuse
    val closedUpper = raw2
      .where(col("ts") <= lit("2024-01-22 00:00:00").cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    assert(!closedUpper.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "ts <= B is not bucket-expressible and must fall through")
    // filter on a non-key, non-ts column → refuse
    val nonKey = raw2
      .where(col("value") > 500.0)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"))
    assert(!nonKey.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "a measure-column filter must fall through to raw")
    RollupRewrite.clear()
  }

  test("calendar-level rollups: month serves month/quarter at month-aligned bounds; week serves only week") {
    RollupRewrite.clear()
    val raw = Tables.load(spark, sf0001, "events")
    def registeredAt(level: String, name: String): String = {
      val dir = java.nio.file.Files.createTempDirectory(s"graft_rollup_$name").toString
      RollupRewrite.buildRollup(raw, Seq("event_type"), "ts", measure, level)
        .write.mode("overwrite").parquet(dir)
      RollupRewrite.register(name, RollupRewrite.Spec(
        raw.inputFiles.toSet,
        spark.read.parquet(dir).queryExecution.analyzed,
        Seq("event_type"), "ts", level,
        RollupRewrite.canonicalMeasure(raw, measure)))
      dir
    }
    def aggAt(df: DataFrame, level: String, bound: String): DataFrame = df
      .where(col("ts") >= lit(bound).cast("timestamp"))
      .groupBy(col("event_type"), date_trunc(level, col("ts")).as("b"))
      .agg(count(lit(1)).as("n"), sum(measure).as("s"))
    val expectedMonth = aggAt(raw, "month", "2024-01-01 00:00:00").collect().toSet
    val expectedWeek = aggAt(raw, "week", "2024-01-08 00:00:00").collect().toSet
    val monthDir = registeredAt("month", "events_monthly")
    RollupRewrite.install(spark)
    val monthName = new java.io.File(monthDir).getName
    // month dashboard, month-boundary WHERE → served from the month rollup
    val served = aggAt(raw, "month", "2024-01-01 00:00:00")
    assert(served.queryExecution.executedPlan.toString.contains(monthName),
      "month-aligned WHERE over a month rollup must serve")
    assert(served.collect().toSet === expectedMonth)
    // quarter nests over month → served too
    assert(aggAt(raw, "quarter", "2024-01-01 00:00:00")
      .queryExecution.executedPlan.toString.contains(monthName),
      "quarter dashboard must be served from the month rollup")
    // day-aligned but NOT month-aligned bound → refuse
    assert(!aggAt(raw, "month", "2024-01-15 00:00:00")
      .queryExecution.executedPlan.toString.contains(monthName),
      "a mid-month (day-aligned) bound cannot be served from a month rollup")
    RollupRewrite.clear()
    val weekDir = registeredAt("week", "events_weekly")
    val weekName = new java.io.File(weekDir).getName
    // week dashboard at a Monday bound → served
    val servedW = aggAt(raw, "week", "2024-01-08 00:00:00")
    assert(servedW.queryExecution.executedPlan.toString.contains(weekName),
      "Monday-aligned WHERE over a week rollup must serve")
    assert(servedW.collect().toSet === expectedWeek)
    // a Thursday (day-aligned) bound → refuse
    assert(!aggAt(raw, "week", "2024-01-11 00:00:00")
      .queryExecution.executedPlan.toString.contains(weekName),
      "a non-Monday bound cannot be served from a week rollup")
    // month dashboard over a WEEK rollup → refuse (weeks cross months)
    assert(!aggAt(raw, "month", "2024-01-01 00:00:00")
      .queryExecution.executedPlan.toString.contains(weekName),
      "weeks do not nest into months; a week rollup must refuse a month dashboard")
    RollupRewrite.clear()
  }

  test("real-time: WHERE-filtered queries flow through rollup UNION tail exactly") {
    val (rawAB, dir, tailFiles) = registeredRealtime(realtime = true)
    assert(tailFiles.nonEmpty)
    def filteredAgg(df: DataFrame): DataFrame = df
      .where(col("event_type").isin("click", "view") &&
        col("ts") >= lit("2024-01-05 00:00:00").cast("timestamp"))
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("d"))
      .agg(count(lit(1)).as("n"), sum(measure).as("s"), avg(measure).as("a"))
    val q = filteredAgg(rawAB)
    assert(q.queryExecution.executedPlan.toString
      .contains(new java.io.File(dir).getName),
      "real-time filtered rewrite did not fire")
    RollupRewrite.clear()
    val expected = filteredAgg(rawAB).collect().toSet
    assert(expected.nonEmpty)
    assert(q.collect().toSet === expected,
      "real-time filtered union must equal the raw aggregate")
  }

  test("real-time off (or no measureExpr): superset scans fall through to raw") {
    val (rawAB, dir, _) = registeredRealtime(realtime = false)
    val q = dailyAgg(rawAB)
    assert(!q.queryExecution.executedPlan.toString.contains(new java.io.File(dir).getName),
      "realtime=false must refuse a superset scan")
    RollupRewrite.clear()
  }
}
