package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization onto a fixed grid — the TimescaleDB
  * `time_bucket_gapfill` + `locf` + `interpolate` family (the flagship
  * query surface of the reference's own database; the reference's
  * hypertable layout exists to serve exactly these), re-expressed as
  * key-partitioned Spark plans.
  *
  * Per key: bucket event time to a `bucketMicros` grid, aggregate actuals
  * per bucket, densify the grid between the key's first and last actual
  * bucket, then fill gaps two ways:
  *
  *   - `locf`: last observation carried forward
  *   - `interp`: linear interpolation between the surrounding actuals
  *     (actual rows keep their value; trailing gaps fall back to locf —
  *     the same edge contract as Timescale's interpolate+locf pairing)
  *
  * Scale posture: every stage is keyed — the per-bucket aggregate is a
  * hash aggregate on (key, bucket), the grid densification explodes a
  * `sequence(b0, b1)` from ONE row per key (grid length = span/width,
  * bounded by the caller's bucket choice), and both fill passes are
  * windows partitioned BY KEY, never a global sort. The bucket aggregate
  * is `max` (order-independent), so results reproduce bit-identically
  * across engines and shuffle orders.
  */
object GapFill {

  /** Dense per-(keys, bucket) frame with `v_actual` (null in gaps),
    * `n_rows` (0 in gaps), `locf`, and `interp` columns. `bucket` is the
    * grid index (epoch-micros div bucketMicros); `bucket_start_s` the
    * grid edge in epoch seconds.
    */
  def fill(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      bucketMicros: Long
  ): DataFrame = {
    require(bucketMicros > 0, "bucketMicros must be positive")
    val k = keys.map(col)

    // integral `div` (not `/`, which is double division); epoch-micros are
    // positive for any post-1970 series, where div == floor division and
    // matches DuckDB's `//`
    val raw = df
      .groupBy(k :+ expr(s"unix_micros($tsCol) div ${bucketMicros}L").as("bucket"): _*)
      .agg(max(col(valueCol)).as("v_actual"), count(lit(1)).as("n_rows"))

    // Pin ONE explicit hash(keys) partitioning and reuse it for the rest
    // of the plan: bounds agg, grid explode, grid⋈actual, both fill
    // windows, and the caller's per-key aggregate all cluster by `keys`,
    // so after this exchange none of them shuffles again. The explicit
    // partition count also defuses an AQE trap measured at sf0.1: the
    // bounds aggregate is tiny (one row per key), AQE coalesces its
    // shuffle to ~1 partition, and the sequence() explode then fans out
    // 100-1000× INSIDE that single task — the whole densified series,
    // its windows included, ran single-threaded (23 s; 1.3 s after the
    // pin). AQE respects a user-specified partition count.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val actual = raw.repartition(n, k: _*)

    val grid = actual
      .groupBy(k: _*)
      .agg(min(col("bucket")).as("b0"), max(col("bucket")).as("b1"))
      .select(k :+ explode(sequence(col("b0"), col("b1"))).as("bucket"): _*)

    val joined = grid
      .join(actual, keys :+ "bucket", "left")
      .withColumn("n_rows", coalesce(col("n_rows"), lit(0L)))

    val past = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val future = Window.partitionBy(k: _*).orderBy(col("bucket"))
      .rowsBetween(1, Window.unboundedFollowing)

    val actualBucket = when(col("v_actual").isNotNull, col("bucket"))
    val filled = joined
      .withColumn("locf", last(col("v_actual"), ignoreNulls = true).over(past))
      .withColumn("__pb", last(actualBucket, ignoreNulls = true).over(past))
      .withColumn("__nv", first(col("v_actual"), ignoreNulls = true).over(future))
      .withColumn("__nb", first(actualBucket, ignoreNulls = true).over(future))

    filled
      .withColumn(
        "interp",
        when(col("v_actual").isNotNull, col("v_actual"))
          .when(
            col("__nv").isNotNull,
            col("locf") + (col("__nv") - col("locf")) *
              ((col("bucket") - col("__pb")).cast("double") /
                (col("__nb") - col("__pb")).cast("double"))
          )
          .otherwise(col("locf"))
      )
      .withColumn("bucket_start_s", col("bucket") * (bucketMicros / 1000000L))
      .drop("__pb", "__nv", "__nb")
  }
}
