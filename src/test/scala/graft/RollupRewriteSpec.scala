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

  test("coarser levels (month) rewrite too; finer (minute) and avg do not") {
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
    val withAvg = raw
      .groupBy(date_trunc("day", col("ts")).as("d"))
      .agg(avg(col("value")).as("a"))
    assert(!withAvg.queryExecution.executedPlan.toString.contains(rollupName),
      "avg is not a registered decomposable shape and must scan raw")
    // and correctness of the served coarser level
    RollupRewrite.clear()
    val expected = raw.groupBy(date_trunc("month", col("ts")).as("m"))
      .agg(sum(measure).as("s")).collect().toSet
    registered()
    assert(monthly.collect().toSet === expected)
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
}
