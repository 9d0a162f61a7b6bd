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
    // matches DuckDB's `//`. Null values are NOT observations (the LOCF
    // contract — an all-null bucket must not reset the carried value to
    // null), so they are dropped before bucketing; n_rows counts actual
    // observations.
    val raw = df
      .where(col(valueCol).isNotNull)
      .groupBy(k :+ expr(s"unix_micros($tsCol) div ${bucketMicros}L").as("bucket"): _*)
      .agg(max(col(valueCol)).as("v_actual"), count(lit(1)).as("n_rows"))

    // Segment layout: every fill value is determined by the SEGMENT
    // between two consecutive actuals, so compute lead(bucket, value)
    // over the (small) actuals frame and explode each half-open segment
    // [b, next_b) with both endpoints already in hand. The dense series
    // is born with its locf/interp columns — no densify-then-join, no
    // window over the million-row grid (the windows run over one row per
    // ACTUAL bucket, ~10× fewer rows than the dense output).
    //
    // The explicit repartition pins hash(keys) with a fixed partition
    // count — the lead window, the explode, and the caller's per-key
    // aggregate all reuse it — and defuses an AQE trap measured at
    // sf0.1: the actuals frame is small in bytes, AQE coalesces its
    // shuffle to ~1 partition, and the sequence() explode then fans out
    // 100-1000× INSIDE that single task (the first densify-then-window
    // form of this operator ran 23 s single-threaded; 3.1 s pinned;
    // this segment form ~1.5 s). AQE respects a user-specified count.
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val actual = raw.repartition(n, k: _*)

    val w = Window.partitionBy(k: _*).orderBy(col("bucket"))
    val seg = actual
      .withColumn("__nb", lead(col("bucket"), 1).over(w))
      .withColumn("__nv", lead(col("v_actual"), 1).over(w))

    seg
      .select(
        k ++ Seq(
          col("bucket").as("__b"), col("v_actual").as("__v"),
          col("n_rows").as("__n"), col("__nb"), col("__nv"),
          // trailing actual (no next): a one-bucket segment
          explode(sequence(col("bucket"), coalesce(col("__nb") - 1, col("bucket"))))
            .as("bucket")
        ): _*)
      .select(
        k ++ Seq(
          col("bucket"),
          when(col("bucket") === col("__b"), col("__v")).as("v_actual"),
          when(col("bucket") === col("__b"), col("__n")).otherwise(lit(0L)).as("n_rows"),
          col("__v").as("locf"),
          when(col("bucket") === col("__b"), col("__v"))
            .otherwise(
              col("__v") + (col("__nv") - col("__v")) *
                ((col("bucket") - col("__b")).cast("double") /
                  (col("__nb") - col("__b")).cast("double"))
            )
            .as("interp"),
          // multiply BEFORE dividing: bucketMicros/1_000_000 truncates to
          // zero for sub-second grids; bucket·width ≈ the epoch µs value,
          // far below Long overflow
          expr(s"(bucket * ${bucketMicros}L) div 1000000L").as("bucket_start_s")
        ): _*)
  }
}
