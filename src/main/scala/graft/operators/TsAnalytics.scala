package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{DataFrame, Row}

/** Time-series analytics over irregular series — the TimescaleDB
  * hyperfunction families the reference's hypertables exist to serve
  * (beside [[GapFill]]'s `time_bucket_gapfill` twin): counter aggregates
  * (`counter_agg` → `delta`/`rate`/`num_resets`), time-weighted averages
  * (`time_weight('LOCF')` → `average`), value histograms (`histogram`),
  * and largest-triangle-three-buckets downsampling (`lttb`; Steinarsson
  * 2013, "Downsampling Time Series for Visual Representation").
  *
  * Scale posture shared by all four: every window is partitioned BY KEY
  * and ordered only within the key — no global sort, no single-partition
  * window anywhere (PlanSpec sweeps for that). The per-key rollups are
  * plain hash aggregates. Only [[lttb]] materializes a key's series in
  * memory (the algorithm is inherently sequential per key); its contract
  * is therefore "series-per-key fits an executor", with the documented
  * 100 TB recipe being to bucket first ([[GapFill]] or `time_bucket`) so
  * the per-key series is bounded by the grid, not the raw event rate.
  *
  * Determinism contract (what lets these carry DuckDB oracles): order-by
  * keys are epoch-microsecond longs (unique per key on the gate data —
  * asserted in ExtSpec), per-segment quantities are fixed-point longs, and
  * per-key sums are long sums — bit-identical across engines and shuffle
  * orders. Doubles appear only in final single-division ratios.
  */
object TsAnalytics {

  /** Per-key counter rollup with reset detection — Timescale
    * `counter_agg` + `delta`/`rate`/`num_resets` semantics: `counterCol`
    * is a cumulative (monotonically non-decreasing) counter; a decrease
    * between consecutive readings means the counter reset, and the new
    * reading counts from zero (the under-estimate Timescale also
    * documents — the pre-reset tail between the two polls is unknowable).
    *
    * Output per key: `n_points`, `n_resets`, `first_v`/`last_v` (the
    * endpoint readings), `delta` (reset-adjusted total increase),
    * `span_s` (last-first observation gap, whole seconds), and
    * `rate_per_s = delta / span_s` (null for single-point keys).
    *
    * One key-partitioned lag window + one hash aggregate; all long
    * arithmetic until the final rate division.
    */
  def counterAgg(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      counterCol: String
  ): DataFrame = {
    val k = keys.map(col)
    val us = expr(s"unix_micros($tsCol)")
    val w = Window.partitionBy(k: _*).orderBy(us)
    val stepped = df
      .withColumn("__us", us)
      .withColumn("__prev", lag(col(counterCol), 1).over(w))
      .withColumn("__raw", col(counterCol) - col("__prev"))
      .withColumn(
        "__adj",
        when(col("__raw") < 0, col(counterCol)).otherwise(col("__raw"))
      )
    stepped
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("n_points"),
        count(when(col("__raw") < 0, lit(1))).as("n_resets"),
        expr(s"min_by($counterCol, __us)").as("first_v"),
        expr(s"max_by($counterCol, __us)").as("last_v"),
        coalesce(sum(col("__adj")), lit(0L)).as("delta"),
        expr("(max(__us) - min(__us)) div 1000000").as("span_s")
      )
      .withColumn(
        "rate_per_s",
        when(col("span_s") > 0, col("delta").cast(DoubleType) / col("span_s"))
      )
  }

  /** Per-key LOCF time-weighted average — Timescale
    * `average(time_weight('LOCF', ts, value))`: each observation holds
    * until the next one, so it weighs by its holding duration; the last
    * observation of a key has no duration and weighs zero (the weight is
    * over the observed interval `[first_ts, last_ts]`).
    *
    * Fixed-point contract: values quantize to 1e-4 (`floor(v·10⁴+0.5)`),
    * durations truncate to whole milliseconds; the weighted sum
    * `Σ v_e4 · dur_ms` is then an exact long (no double-summation order
    * sensitivity) and the average is one final double division. Output
    * per key: `n_points`, `sum_dur_ms`, `wsum_e4ms`, and
    * `twa = round((wsum / 10⁴) / sum_dur_ms, 4)` (null for single-point
    * keys, where no interval was observed).
    */
  def timeWeightedAvg(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val k = keys.map(col)
    val us = expr(s"unix_micros($tsCol)")
    val w = Window.partitionBy(k: _*).orderBy(us)
    val seg = df
      .where(col(valueCol).isNotNull)
      .withColumn("__us", us)
      .withColumn("__v_e4", floor(col(valueCol) * 10000 + 0.5).cast(LongType))
      .withColumn("__dur_us", lead(col("__us"), 1).over(w) - col("__us"))
      .withColumn("__dur_ms", expr("__dur_us div 1000"))
    seg
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("n_points"),
        coalesce(sum(col("__dur_ms")), lit(0L)).as("sum_dur_ms"),
        coalesce(sum(col("__v_e4") * col("__dur_ms")), lit(0L)).as("wsum_e4ms")
      )
      .withColumn(
        "twa",
        when(
          col("sum_dur_ms") > 0,
          round((col("wsum_e4ms").cast(DoubleType) / 10000.0) / col("sum_dur_ms"), 4)
        )
      )
  }

  /** Per-key fixed-bound value histogram — Timescale
    * `histogram(value, lo, hi, nBuckets)` semantics (`width_bucket`
    * layout): bucket 0 is underflow (`v < lo`), buckets `1..nBuckets`
    * split `[lo, hi)` evenly, bucket `nBuckets+1` is overflow
    * (`v ≥ hi`). Emits one row per OBSERVED (key, bucket) — callers
    * wanting dense zero rows can join against a `sequence` grid.
    *
    * One hash aggregate, no window, no shuffle beyond the groupBy. The
    * bucket index is `floor((v-lo)/width)+1` with `width=(hi-lo)/n` —
    * callers' oracles must use the same expression shape (IEEE division
    * then floor), which [[graft.queries.ExtensionQueries]] pins.
    */
  def histogram(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String,
      lo: Double,
      hi: Double,
      nBuckets: Int
  ): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need nBuckets > 0 and hi > lo")
    val width = (hi - lo) / nBuckets
    val v = col(valueCol)
    val idx = when(v < lo, lit(0))
      .when(v >= hi, lit(nBuckets + 1))
      .otherwise((floor((v - lo) / width) + 1).cast("int"))
    df.where(v.isNotNull)
      .groupBy(keys.map(col) :+ idx.as("bucket"): _*)
      .agg(count(lit(1)).as("n"))
  }

  private val lttbOutSchema = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("t_us", LongType, nullable = false),
    StructField("v", DoubleType, nullable = false)
  ))

  /** Largest-Triangle-Three-Buckets downsample (Steinarsson 2013 §4.2):
    * per key, reduce the series to `nOut` visually-representative points —
    * endpoints always kept, interior buckets each contribute the point
    * forming the largest triangle with the previously selected point and
    * the next bucket's centroid. Ties keep the earliest point, so the
    * selection is deterministic.
    *
    * The key is carried as a STRING (grouping key of the typed
    * `flatMapGroups`); callers re-cast on the way out. The algorithm is
    * sequential per key, so each key's series is sorted and scanned in
    * executor memory — bound it by bucketing upstream (see class doc).
    * `flatMapGroups` is the right tool here for the same reason it is in
    * [[graft.ext.Multimodal]]: genuinely imperative per-group logic with
    * no declarative twin.
    */
  def lttb(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      nOut: Int
  ): DataFrame = {
    require(nOut >= 2, "nOut must keep at least both endpoints")
    val spark = df.sparkSession
    import spark.implicits._
    val pts = df
      .where(col(valueCol).isNotNull)
      .select(
        col(keyCol).cast(StringType).as("key"),
        expr(s"unix_micros($tsCol)").as("t_us"),
        col(valueCol).cast(DoubleType).as("v")
      )
      .as[(String, Long, Double)]
    pts
      .groupByKey(_._1)
      .flatMapGroups { (key, it) =>
        val series = it.map(p => (p._2, p._3)).toArray.sortBy(_._1)
        lttbSelect(series, nOut).iterator.map { case (t, v) => Row(key, t, v) }
      }(org.apache.spark.sql.Encoders.row(lttbOutSchema))
      .toDF()
  }

  /** The sequential core, shared shape with the Steinarsson paper's
    * reference pseudocode; `series` must be time-sorted.
    */
  private[graft] def lttbSelect(
      series: Array[(Long, Double)],
      nOut: Int
  ): Array[(Long, Double)] = {
    val n = series.length
    if (n <= nOut || nOut <= 2) {
      if (n <= nOut) series
      else Array(series.head, series.last)
    } else {
      val out = Array.newBuilder[(Long, Double)]
      out.sizeHint(nOut)
      out += series.head
      val every = (n - 2).toDouble / (nOut - 2)
      var a = 0 // index of the previously selected point
      var i = 0
      while (i < nOut - 2) {
        val bStart = (i * every).toInt + 1
        val bEnd = math.min(((i + 1) * every).toInt + 1, n - 1)
        // centroid of the NEXT bucket (the last interior bucket's "next"
        // is the final point's bucket, which may clamp to just that point)
        val nStart = bEnd
        val nEnd = math.min(((i + 2) * every).toInt + 1, n)
        var avgT = 0.0; var avgV = 0.0
        var j = nStart
        while (j < nEnd) { avgT += series(j)._1; avgV += series(j)._2; j += 1 }
        val m = nEnd - nStart
        avgT /= m; avgV /= m
        val (ta, va) = series(a)
        var best = bStart; var bestArea = -1.0
        j = bStart
        while (j < bEnd) {
          val (tj, vj) = series(j)
          val area = math.abs((ta - avgT) * (vj - va) - (ta - tj) * (avgV - va))
          if (area > bestArea) { bestArea = area; best = j } // strict > == earliest on ties
          j += 1
        }
        out += series(best)
        a = best
        i += 1
      }
      out += series(n - 1)
      out.result()
    }
  }
}
