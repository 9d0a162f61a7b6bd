package graft

import org.apache.spark.sql.functions._

import graft.operators.GapFill

class GapFillSpec extends SparkSpec {

  // one key, 10s buckets; actuals in buckets 0, 3, 4 (values 10, 40, 2)
  private def fixture = {
    import spark.implicits._
    Seq(
      (1L, 5L, 10.0),   // bucket 0
      (1L, 31L, 40.0),  // bucket 3
      (1L, 33L, 7.0),   // bucket 3 again — max aggregate keeps 40
      (1L, 45L, 2.0)    // bucket 4
    ).toDF("user_id", "sec", "value")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("value"))
  }

  test("locf carries the last actual forward; interp is linear between actuals") {
    val out = GapFill.fill(fixture, Seq("user_id"), "ts", "value", bucketMicros = 10L * 1000000L)
      .orderBy("bucket")
      .select("bucket", "n_rows", "v_actual", "locf", "interp")
      .collect()
    assert(out.length === 5, "grid must densify buckets 0..4")
    val byBucket = out.map(r => r.getLong(0) -> r).toMap
    // gaps: buckets 1 and 2
    assert(byBucket(1L).getLong(1) === 0L && byBucket(1L).isNullAt(2))
    assert(byBucket(1L).getDouble(3) === 10.0, "locf carries bucket 0's value")
    assert(byBucket(2L).getDouble(3) === 10.0)
    // linear between (0 -> 10) and (3 -> 40): bucket1 = 20, bucket2 = 30
    assert(byBucket(1L).getDouble(4) === 20.0)
    assert(byBucket(2L).getDouble(4) === 30.0)
    // actual rows keep their aggregate value in both fills
    assert(byBucket(3L).getDouble(3) === 40.0 && byBucket(3L).getDouble(4) === 40.0)
    assert(byBucket(4L).getDouble(4) === 2.0)
    // bucket 3 aggregated two rows with max
    assert(byBucket(3L).getLong(1) === 2L)
  }

  test("grids are per-key and the fill windows are key-partitioned") {
    import spark.implicits._
    val two = fixture.union(
      Seq((2L, 100L, 5.0), (2L, 125L, 9.0)).toDF("user_id", "sec", "value")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("value")))
    val out = GapFill.fill(two, Seq("user_id"), "ts", "value", bucketMicros = 10L * 1000000L)
    // user 2 spans buckets 10..12 — its grid must not bleed into user 1's
    assert(out.where(col("user_id") === 2L).count() === 3)
    assert(out.where(col("user_id") === 1L).count() === 5)
    val p = out.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange SinglePartition"), s"fill must never serialize onto one task:\n$p")
  }
}
