package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.{Column, DataFrame, Row}

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

  /** Per-(key, bucket) counter rollup — Timescale `counter_agg` over
    * `time_bucket` with BOTH accessor flavors: the in-bucket `delta`
    * (last-in-bucket − first-in-bucket on the reset-adjusted counter,
    * points inside the bucket only) and the `interpolated_delta` /
    * `interpolated_rate` pair (counter linearly interpolated at the
    * bucket edges using the neighboring readings — the Prometheus `rate`
    * semantics, so adjacent buckets partition the total increase with no
    * double-counting at edges).
    *
    * Construction: one key-partitioned window computes the monotone
    * reset-adjusted counter `adj = v + Σ prior-reset carry` (e4
    * fixed-point longs — a decrease means reset, and the pre-reset
    * reading is carried forward, [[counterAgg]]'s rule). Each
    * consecutive-reading segment then SPLITS across the buckets it spans
    * ([[timeWeightedBucketed]]'s explode): a segment with increase Δ and
    * length L contributes `Δ·overlap div L` to each covered bucket —
    * exact integer arithmetic (each term truncates at most one e-4 unit,
    * the documented quantum), so the per-bucket sums are shuffle-order
    * independent and oracle-exact. Interior edge contributions telescope
    * to the interpolated edge difference. Overflow contract: Δ·overlap
    * must fit int64 — with e4 values ≤ 1e7 that allows per-key reading
    * gaps up to ~10 days; quantize coarser for sparser series.
    *
    * Timestamp-domain contract (shared by every `time_bucket`-style
    * operator here, [[gaugeAggBucketed]] included): ts ≥ 1970-01-01 UTC.
    * Bucket indices and sequence bounds use integer `div`, which
    * truncates toward zero while the DuckDB oracle's `//` floors — the
    * two agree exactly on non-negative microseconds and diverge one
    * bucket on pre-epoch rows. Timescale's own `time_bucket` origin
    * anchors at 2000-01-03, so real telemetry corpora satisfy this;
    * pre-epoch data needs a pmod-floor variant, not silent use.
    *
    * Output per (key, bucket_s): `n_points`/`n_resets` (readings and
    * resets inside the bucket), `delta_in_e4` (in-bucket increase, null
    * when the bucket has no point), `covered_us` (observed-span overlap),
    * `delta_interp_e4`, and `rate_per_s` (interpolated increase over
    * covered time). Buckets a long segment spans with NO interior
    * readings still appear (n_points = 0) — the gap-bucket rows
    * Prometheus-style dashboards expect.
    *
    * Plan shape — ONE pass, ONE exchange, NO join: each reading's
    * covered-bucket range comes out of a single `posexplode` (a
    * successor-less final reading degenerates to its own bucket alone),
    * and position 0 — always the reading's own bucket — doubles as the
    * POINT marker, so the in-bucket accessors (conditional count /
    * `max_by` over position-0 rows — null ordering keys are ignored,
    * exactly `max(y)`'s null rule) and the interpolated sums land in the
    * SAME (key, bucket) hash aggregate, which reuses the window's key
    * partitioning. Two alternatives measured worse: the two-aggregate
    * ⟗-join costs two extra full-key exchanges
    * (`requireAllClusterKeysForCoPartition`) plus a second scan+window
    * pass (PlanSpec pins ≤ 1 hash exchange against it), and a separate
    * point-marker array (`explode(concat(point, buckets))`) paid struct
    * construction per row and an extra exploded row per reading — ~1.9×
    * the sibling [[timeWeightedBucketed]]'s wall time at sf0.1.
    */
  def counterAggBucketed(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      counterCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val w = bucketSeconds * 1000000L
    val k = keys.map(col)
    val win = Window.partitionBy(k: _*).orderBy(col("__us"))
    val cum = win.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pts = df
      .where(col(counterCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__v4", floor(col(counterCol) * 10000 + 0.5).cast(LongType))
      .withColumn("__prev", lag(col("__v4"), 1).over(win))
      .withColumn(
        "__radd",
        when(col("__v4") < col("__prev"), col("__prev")).otherwise(lit(0L))
      )
      .withColumn("__adj", col("__v4") + sum(col("__radd")).over(cum))
      // second window stage, same partitioning and order — no new
      // exchange, no re-sort; lead(adj) can't join the first stage
      // because adj itself is a window result there
      .withColumn("__nxt", lead(col("__us"), 1).over(win))
      .withColumn("__nadj", lead(col("__adj"), 1).over(win))
      .withColumn("__dd", col("__nadj") - col("__adj"))
      .withColumn("__len", col("__nxt") - col("__us"))
    // one exploded row per covered bucket of the outgoing segment; a
    // final reading with no successor degenerates to its own bucket.
    // Position 0 is ALWAYS the reading's own bucket (`__us div w`), so it
    // carries the point-side contributions — no separate marker rows.
    val hasSeg = col("__nxt") > col("__us")
    val entries = pts
      .select(
        col("*"),
        posexplode(
          coalesce(
            when(hasSeg, sequence(expr(s"__us div ${w}L"), expr(s"(__nxt - 1) div ${w}L"))),
            array(expr(s"__us div ${w}L"))
          )
        ).as(Seq("__p", "__b"))
      )
    val isP = col("__p") === 0
    val ov = when(
      hasSeg,
      least(col("__nxt"), (col("__b") + 1) * w) - greatest(col("__us"), col("__b") * w)
    )
    entries
      .withColumn("__ov", ov)
      .groupBy(k :+ col("__b"): _*)
      .agg(
        count(when(isP, lit(1))).as("n_points"),
        count(when(isP && col("__radd") > 0, lit(1))).as("n_resets"),
        (expr("max_by(CASE WHEN __p = 0 THEN __adj END, CASE WHEN __p = 0 THEN __us END)")
          - expr("min_by(CASE WHEN __p = 0 THEN __adj END, CASE WHEN __p = 0 THEN __us END)"))
          .as("delta_in_e4"),
        sum(col("__ov")).as("covered_us"),
        sum(expr("(__dd * __ov) div __len")).as("delta_interp_e4")
      )
      .withColumn("bucket_s", col("__b") * bucketSeconds)
      .withColumn(
        "rate_per_s",
        when(
          col("covered_us").isNotNull && col("covered_us") > 0,
          col("delta_interp_e4").cast(DoubleType) / col("covered_us").cast(DoubleType) * 100.0
        )
      )
      .drop("__b")
  }

  /** Per-(key, bucket) gauge rollup — [[counterAggBucketed]]'s free-moving
    * twin: Timescale `gauge_agg` per `time_bucket` with the in-bucket
    * `delta` and the `interpolated_delta`/`interpolated_rate` pair. No
    * reset logic — the series is the e4 reading itself, and per-bucket
    * deltas may be NEGATIVE, which is where engine division semantics
    * fork: Spark's `div` truncates toward zero while DuckDB's `//`
    * floors, so the segment-split term computes on |Δ| and re-applies
    * the sign (`sign(Δ)·(|Δ|·overlap div len)`) — both engines then
    * divide non-negative integers, where truncate ≡ floor. Same one-pass
    * posexplode plan as the counter: one scan, one key exchange, no
    * join.
    */
  def gaugeAggBucketed(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val w = bucketSeconds * 1000000L
    val k = keys.map(col)
    val win = Window.partitionBy(k: _*).orderBy(col("__us"))
    val pts = df
      .where(col(valueCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__adj", floor(col(valueCol) * 10000 + 0.5).cast(LongType))
      .withColumn("__nxt", lead(col("__us"), 1).over(win))
      .withColumn("__nadj", lead(col("__adj"), 1).over(win))
      .withColumn("__dd", col("__nadj") - col("__adj"))
      .withColumn("__len", col("__nxt") - col("__us"))
    val hasSeg = col("__nxt") > col("__us")
    val entries = pts
      .select(
        col("*"),
        posexplode(
          coalesce(
            when(hasSeg, sequence(expr(s"__us div ${w}L"), expr(s"(__nxt - 1) div ${w}L"))),
            array(expr(s"__us div ${w}L"))
          )
        ).as(Seq("__p", "__b"))
      )
    val isP = col("__p") === 0
    val ov = when(
      hasSeg,
      least(col("__nxt"), (col("__b") + 1) * w) - greatest(col("__us"), col("__b") * w)
    )
    entries
      .withColumn("__ov", ov)
      .groupBy(k :+ col("__b"): _*)
      .agg(
        count(when(isP, lit(1))).as("n_points"),
        (expr("max_by(CASE WHEN __p = 0 THEN __adj END, CASE WHEN __p = 0 THEN __us END)")
          - expr("min_by(CASE WHEN __p = 0 THEN __adj END, CASE WHEN __p = 0 THEN __us END)"))
          .as("delta_in_e4"),
        sum(col("__ov")).as("covered_us"),
        sum(expr(
          "CASE WHEN __dd >= 0 THEN (__dd * __ov) div __len" +
            " ELSE -(((-__dd) * __ov) div __len) END")).as("delta_interp_e4")
      )
      .withColumn("bucket_s", col("__b") * bucketSeconds)
      .withColumn(
        "rate_per_s",
        when(
          col("covered_us").isNotNull && col("covered_us") > 0,
          col("delta_interp_e4").cast(DoubleType) / col("covered_us").cast(DoubleType) * 100.0
        )
      )
      .drop("__b")
  }

  /** Per-key gauge rollup — Timescale `gauge_agg` + accessors
    * (`delta`/`idelta_right`/`irate_right`): unlike [[counterAgg]] a gauge
    * may move freely in both directions, so there is no reset logic —
    * `delta` is simply `last − first`, and the instantaneous accessors
    * read the final observed step (`idelta_right` = last − previous-last,
    * `irate_right` = that step over its wall-clock gap).
    *
    * Determinism contract: nothing SUMS doubles — every double output is
    * either a value picked by `min_by`/`max_by` over the unique
    * epoch-microsecond key or a single subtraction/division of two such
    * picks, so the result is bit-identical across engines and shuffle
    * orders. One key-partitioned lag window + one hash aggregate.
    */
  def gaugeAgg(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val k = keys.map(col)
    val us = expr(s"unix_micros($tsCol)")
    val w = Window.partitionBy(k: _*).orderBy(col("__us"))
    val stepped = df
      .where(col(valueCol).isNotNull)
      .withColumn("__us", us)
      .withColumn("__step", col(valueCol) - lag(col(valueCol), 1).over(w))
      .withColumn("__gap_us", col("__us") - lag(col("__us"), 1).over(w))
    stepped
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("n_points"),
        expr(s"min_by($valueCol, __us)").as("first_v"),
        expr(s"max_by($valueCol, __us)").as("last_v"),
        expr(s"max_by(__step, __us)").as("__idelta"),
        expr("max_by(__gap_us, __us)").as("__last_gap_us"),
        expr("(max(__us) - min(__us)) div 1000000").as("span_s")
      )
      .withColumn("delta", col("last_v") - col("first_v"))
      .withColumn("idelta_right", col("__idelta"))
      .withColumn(
        "irate_per_s",
        when(
          col("__last_gap_us") > 0,
          col("__idelta") / (col("__last_gap_us").cast(DoubleType) / 1e6)
        )
      )
      .drop("__idelta", "__last_gap_us")
  }

  /** Per-key two-dimensional statistical rollup over (time, value) —
    * Timescale `stats_agg(ts, value)` + `slope`/`intercept`/
    * `corr`: ordinary-least-squares of value against elapsed seconds.
    *
    * Fixed-point contract (the exact-long trick that makes a regression
    * hash-comparable across engines): x = whole seconds since the key's
    * first observation (long), y = value quantized to 1e-4 (long); the six
    * sufficient statistics `n, Σx, Σy, Σxx, Σxy, Σyy` are then exact long
    * sums (order-insensitive), and slope/intercept/corr are derived from
    * them in ONE fixed double expression tree — both engines evaluate the
    * identical IEEE operation sequence on identical integers, so the
    * UNROUNDED doubles match bitwise. The outputs are left unrounded here;
    * callers that need a hash-stable projection quantize with
    * `CAST(floor(x * 1e6 + 0.5) AS BIGINT)` (decimal `round(x, 6)` is NOT
    * portable: Spark routes it through BigDecimal HALF_UP while DuckDB
    * rounds the raw double, and near-tie 7th digits diverge). Casts to
    * double happen BEFORE the cross-products (`n·Σxy` overflows int64 at
    * corpus scale).
    *
    * `slope` is in value-units per second (the e4 scale cancels between
    * numerator and denominator only for corr; slope/intercept divide it
    * back out). One min-window + one hash aggregate, no double summation.
    */
  def statsRegr(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val k = keys.map(col)
    val us = expr(s"unix_micros($tsCol)")
    val pts = df
      .where(col(valueCol).isNotNull)
      .withColumn("__us", us)
      .withColumn("__x", expr("(__us - min(__us) OVER (PARTITION BY " + keys.mkString(", ") + ")) div 1000000"))
      .withColumn("__y", floor(col(valueCol) * 10000 + 0.5).cast(LongType))
    val d = (c: String) => col(c).cast(DoubleType)
    pts
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("sum_x"),
        sum(col("__y")).as("sum_y"),
        sum(col("__x") * col("__x")).as("sum_xx"),
        sum(col("__x") * col("__y")).as("sum_xy"),
        sum(col("__y") * col("__y")).as("sum_yy")
      )
      .withColumn("__sxx", d("n") * d("sum_xx") - d("sum_x") * d("sum_x"))
      .withColumn("__sxy", d("n") * d("sum_xy") - d("sum_x") * d("sum_y"))
      .withColumn("__syy", d("n") * d("sum_yy") - d("sum_y") * d("sum_y"))
      .withColumn(
        "slope",
        when(col("__sxx") > 0, col("__sxy") / col("__sxx") / 10000.0)
      )
      .withColumn(
        "intercept",
        when(
          col("__sxx") > 0,
          (d("sum_y") / d("n") - col("__sxy") / col("__sxx") * (d("sum_x") / d("n"))) / 10000.0
        )
      )
      .withColumn(
        "corr",
        when(
          col("__sxx") > 0 && col("__syy") > 0,
          col("__sxy") / sqrt(col("__sxx")) / sqrt(col("__syy"))
        )
      )
      .drop("__sxx", "__sxy", "__syy")
  }

  /** Per-key one-dimensional statistical rollup — Timescale
    * `stats_agg(value)` + its accessor family `average`/`stddev`/
    * `variance`/`skewness`/`kurtosis`/`sum`/`num_vals` (the 1-D sibling
    * of [[statsRegr]]'s 2-D form).
    *
    * Fixed-point contract: y = value quantized to 1e-4 (long), and the
    * five raw power sums `n, Σy, Σy², Σy³, Σy⁴` are exact integer sums —
    * Σy as a long (y ≤ ~1e7 ⇒ a key needs ~1e11 rows to overflow), and
    * Σy², Σy³, Σy⁴ all as DECIMAL(38,0): with y² ≈ 1e14 a long Σy² would
    * silently wrap past ~10⁵ rows per hot key in non-ANSI mode while the
    * DuckDB oracle auto-promotes to HUGEINT, so the squares go through
    * the same exact decimal chain as the cubes (y⁴ ≤ ~1e28 keeps even a
    * million-row key under the 38-digit cap; DuckDB mirrors with
    * HUGEINT). The derived moments come from ONE
    * fixed double expression tree evaluated on those exact integers —
    * both engines perform the identical IEEE operation sequence, so the
    * doubles match bitwise and `floor(x·1e6 + 0.5)` fixed-point hashing
    * is stable (decimal `round` is NOT — the statsRegr r8 lesson).
    *
    * Accessor definitions (population moments, matching Timescale's
    * `method => 'population'`): m2 = Σy²/n − ȳ², m3/m4 by the binomial
    * expansion around ȳ; `skewness = m3/m2^{3/2}`,
    * `kurtosis = m4/m2²` (Pearson, NOT excess — Timescale's choice),
    * `stddev = √m2`, all divided back to value units by the e4 scale.
    * Sample stddev uses the n−1 denominator. Null when the moment is
    * undefined (n < 2 for stddev, m2 = 0 for skew/kurtosis).
    *
    * One map-side-combinable hash aggregate — no window at all: the
    * partial states are five numbers per key, so at 100 TB this is a
    * single scan with a tiny shuffle (the mergeable-summaries property
    * Timescale's `rollup(stats_agg)` relies on; re-aggregating these
    * sums IS that rollup).
    */
  def statsAgg1d(
      df: DataFrame,
      keys: Seq[String],
      valueCol: String
  ): DataFrame = {
    val k = keys.map(col)
    // y as long for the int64-safe sums; y as DECIMAL(10,0) for the cubes
    // and 4th powers (decimal multiply widens: 10→21→32→38 digits, so the
    // product chain never overflows before the exact decimal sum).
    val pts = df
      .where(col(valueCol).isNotNull)
      .withColumn("__y", floor(col(valueCol) * 10000 + 0.5).cast(LongType))
      .withColumn("__yd", col("__y").cast("decimal(10,0)"))
    val agg = pts
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__y")).as("sum_y"),
        sum(col("__yd") * col("__yd")).as("__s2"),
        sum(col("__yd") * col("__yd") * col("__yd")).as("__s3"),
        sum(col("__yd") * col("__yd") * col("__yd") * col("__yd")).as("__s4")
      )
      .withColumn("sum_y2", col("__s2").cast("decimal(38,0)"))
      .withColumn("sum_y3", col("__s3").cast("decimal(38,0)"))
      .withColumn("sum_y4", col("__s4").cast("decimal(38,0)"))
      .drop("__s2", "__s3", "__s4")
    deriveMoments1d(agg)
  }

  /** Timescale `rollup(stats_agg)` — the coarser statistical level
    * re-aggregated from a finer [[statsAgg1d]] output, never from the raw
    * stream: the five power sums are plain integer sums, so they add
    * exactly across child groups and the re-derived accessors are
    * BIT-IDENTICAL to a direct aggregate over the raw rows (the gate
    * pins daily-from-hourly against daily-from-raw). `finer` must carry
    * the [[statsAgg1d]] sum columns; `keys` are the coarser grouping
    * (e.g. (user, day) over an (user, hour) input). At 100 TB the daily
    * level re-aggregates ~24 tiny rows per key.
    */
  def statsRollup1d(finer: DataFrame, keys: Seq[String]): DataFrame = {
    val agg = finer
      .groupBy(keys.map(col): _*)
      .agg(
        sum(col("n")).as("n"),
        sum(col("sum_y")).as("sum_y"),
        sum(col("sum_y2")).cast("decimal(38,0)").as("sum_y2"),
        sum(col("sum_y3")).cast("decimal(38,0)").as("sum_y3"),
        sum(col("sum_y4")).cast("decimal(38,0)").as("sum_y4")
      )
    deriveMoments1d(agg)
  }

  /** Timescale `rolling(stats_agg)` — the TRAILING-WINDOW moments over a
    * bucketed [[statsAgg1d]] series: for each (key, bucket) row, the five
    * exact power sums re-aggregate over the trailing `windowSeconds` of
    * buckets (a RANGE frame on the epoch-seconds bucket column, so
    * gapped series weigh only observed buckets — the time-correct frame,
    * not a row count), and the same fixed IEEE tree derives the moments.
    * Exactly Timescale's `rolling()` over a continuous aggregate: the
    * mergeable-summaries property again, this time under a sliding
    * frame. One key-partitioned window — no self-join, no re-scan of the
    * raw stream; at 100 TB the input is the tiny bucketed table.
    *
    * `finer` must carry [[statsAgg1d]]'s sum columns plus `bucketCol`
    * (epoch seconds, long). The frame is `[bucket − windowSeconds + 1,
    * bucket]` — inclusive current bucket, trailing window.
    */
  def statsRolling1d(
      finer: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      windowSeconds: Long
  ): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(bucketCol))
      .rangeBetween(-(windowSeconds - 1), Window.currentRow)
    val agg = finer
      .withColumn("n", sum(col("n")).over(w))
      .withColumn("sum_y", sum(col("sum_y")).over(w))
      .withColumn("sum_y2", sum(col("sum_y2")).over(w).cast("decimal(38,0)"))
      .withColumn("sum_y3", sum(col("sum_y3")).over(w).cast("decimal(38,0)"))
      .withColumn("sum_y4", sum(col("sum_y4")).over(w).cast("decimal(38,0)"))
      .drop("average", "stddev_pop", "stddev_samp", "skewness", "kurtosis")
    deriveMoments1d(agg)
  }

  /** The single fixed IEEE double tree shared by [[statsAgg1d]] and
    * [[statsRollup1d]] — divisions by n happen FIRST (sum/n), keeping
    * magnitudes near the data scale; the same operation order is spelled
    * out in the DuckDB oracle so the doubles match bitwise.
    */
  private def deriveMoments1d(agg: DataFrame): DataFrame = {
    val d = (c: String) => col(c).cast(DoubleType)
    val n = d("n")
    val mean = d("sum_y") / n
    val m2 = d("sum_y2") / n - mean * mean
    val m3 = d("sum_y3") / n - lit(3.0) * mean * (d("sum_y2") / n) +
      lit(2.0) * mean * mean * mean
    val m4 = d("sum_y4") / n - lit(4.0) * mean * (d("sum_y3") / n) +
      lit(6.0) * mean * mean * (d("sum_y2") / n) -
      lit(3.0) * mean * mean * mean * mean
    agg
      .withColumn("average", mean / 10000.0)
      .withColumn("stddev_pop", when(col("n") >= 1 && m2 >= 0, sqrt(m2) / 10000.0))
      .withColumn(
        // radicand ≥ 0 guard mirrors stddev_pop's m2 ≥ 0: catastrophic
        // cancellation on a near-constant large-magnitude key can push the
        // difference slightly negative, and the contract is null-when-
        // undefined, never NaN (a NaN would also cast engine-dependently).
        "stddev_samp",
        when(
          col("n") >= 2 && (d("sum_y2") - d("sum_y") * mean) >= 0,
          sqrt((d("sum_y2") - d("sum_y") * mean) / (n - 1.0)) / 10000.0)
      )
      .withColumn("skewness", when(m2 > 0, m3 / sqrt(m2 * m2 * m2)))
      .withColumn("kurtosis", when(m2 > 0, m4 / (m2 * m2)))
  }

  /** Per-key TWO-dimensional statistical rollup — Timescale
    * `stats_agg(y, x)` over a (time, value) series, the bucketed/
    * mergeable sibling of [[statsRegr]]: x is the ABSOLUTE epoch second
    * (no per-key min subtraction — the sums must add across buckets and
    * trailing frames, so the origin cannot depend on the frame), y the
    * e4-quantized value, and the six power sums `n, Σx, Σy, Σx², Σxy,
    * Σy²` are EXACT integer sums (x and y through DECIMAL products —
    * x² ≈ 3·10¹⁸ would wrap a long; DuckDB mirrors with HUGEINT). The
    * regression accessors come from exact decimal cross-terms
    * `Sxx = n·Σx² − (Σx)²` etc. (values ≤ ~10²⁷ — safely inside
    * DECIMAL(38,0)/HUGEINT; computing them in doubles would lose ~9
    * digits to cancellation against absolute-epoch magnitudes) followed
    * by ONE fixed IEEE double tree, so the doubles match DuckDB
    * bitwise — the [[statsAgg1d]] contract in two dimensions.
    *
    * Accessors (nulls when undefined, `Sxx > 0` exact-integer-guarded):
    * `slope` in value-units per second, `intercept` the regression value
    * at epoch 0 of the absolute x-axis (shift x before aggregating if a
    * local origin is wanted), `corr` Pearson's r. One map-side-
    * combinable hash aggregate; keys normally include the time bucket.
    */
  def statsAgg2d(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String
  ): DataFrame = {
    val pts = df
      .where(col(valueCol).isNotNull)
      .withColumn("__x", expr(s"unix_micros($tsCol) div 1000000").cast("decimal(12,0)"))
      .withColumn("__y",
        floor(col(valueCol) * 10000 + 0.5).cast(LongType).cast("decimal(12,0)"))
    val agg = pts
      .groupBy(keys.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(col("__x")).as("__sx"),
        sum(col("__y").cast(LongType)).as("sum_y"),
        sum(col("__x") * col("__x")).as("__sxx"),
        sum(col("__x") * col("__y")).as("__sxy"),
        sum(col("__y") * col("__y")).as("__syy")
      )
      .withColumn("sum_x", col("__sx").cast("decimal(38,0)"))
      .withColumn("sum_xx", col("__sxx").cast("decimal(38,0)"))
      .withColumn("sum_xy", col("__sxy").cast("decimal(38,0)"))
      .withColumn("sum_yy", col("__syy").cast("decimal(38,0)"))
      .drop("__sx", "__sxx", "__sxy", "__syy")
    deriveMoments2d(agg)
  }

  /** Timescale `rolling(stats_agg(y, x))` — the trailing-window
    * regression over a bucketed [[statsAgg2d]] series: the six exact
    * power sums re-aggregate over the trailing `windowSeconds` of
    * buckets via one key-partitioned RANGE frame (gapped buckets weigh
    * nothing — the same time-correct frame as [[statsRolling1d]]), then
    * the same exact-decimal cross-terms + fixed IEEE tree derive
    * slope/intercept/corr. No re-scan of the raw stream; at 100 TB the
    * input is the tiny bucketed table.
    */
  def statsRolling2d(
      finer: DataFrame,
      keys: Seq[String],
      bucketCol: String,
      windowSeconds: Long
  ): DataFrame = {
    require(windowSeconds > 0, "window must be positive")
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(bucketCol))
      .rangeBetween(-(windowSeconds - 1), Window.currentRow)
    val agg = finer
      .withColumn("n", sum(col("n")).over(w))
      .withColumn("sum_x", sum(col("sum_x")).over(w).cast("decimal(38,0)"))
      .withColumn("sum_y", sum(col("sum_y")).over(w))
      .withColumn("sum_xx", sum(col("sum_xx")).over(w).cast("decimal(38,0)"))
      .withColumn("sum_xy", sum(col("sum_xy")).over(w).cast("decimal(38,0)"))
      .withColumn("sum_yy", sum(col("sum_yy")).over(w).cast("decimal(38,0)"))
      .drop("slope", "intercept", "corr")
    deriveMoments2d(agg)
  }

  /** The fixed IEEE tree shared by [[statsAgg2d]] and [[statsRolling2d]]:
    * cross-terms exact in DECIMAL first (no double cancellation), then
    * divisions in a pinned operand order — spelled out identically in
    * the DuckDB oracle so the doubles match bitwise.
    */
  private def deriveMoments2d(agg: DataFrame): DataFrame = {
    val dN = col("n").cast("decimal(10,0)")
    val dY = col("sum_y").cast("decimal(20,0)")
    val sxx = dN * col("sum_xx") - col("sum_x") * col("sum_x")
    val sxy = dN * col("sum_xy") - col("sum_x") * dY
    val syy = dN * col("sum_yy") - dY * dY
    val d = (c: Column) => c.cast(DoubleType)
    val nd = d(col("n"))
    agg
      .withColumn("__cxx", sxx)
      .withColumn("__cxy", sxy)
      .withColumn("__cyy", syy)
      .withColumn(
        "slope",
        when(col("__cxx") > 0, d(col("__cxy")) / d(col("__cxx")) / 10000.0))
      .withColumn(
        "intercept",
        when(
          col("__cxx") > 0,
          (d(col("sum_y")) / nd -
            d(col("__cxy")) / d(col("__cxx")) * (d(col("sum_x")) / nd)) / 10000.0))
      .withColumn(
        "corr",
        when(
          col("__cxx") > 0 && col("__cyy") > 0,
          d(col("__cxy")) / sqrt(d(col("__cxx"))) / sqrt(d(col("__cyy")))))
      .drop("__cxx", "__cxy", "__cyy")
  }

  /** Per-key state-duration rollup — Timescale `state_agg`/
    * `duration_in`: `stateCol` is a discrete state that HOLDS until the
    * next observation (the same LOCF reading as [[timeWeightedAvg]]), so
    * each row contributes its holding time to its state's total. The
    * key's final observation has no successor and contributes no
    * duration (the agg covers the observed interval only).
    *
    * Output per (key, state): `n_obs` (observations in the state),
    * `n_entries` (transitions INTO the state — a run of equal states
    * counts once), and `dur_ms` (total held milliseconds, exact long:
    * per-segment µs truncate to ms before the sum). Two lag/lead reads
    * over one key-partitioned window + one hash aggregate.
    */
  def stateAgg(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      stateCol: String
  ): DataFrame = {
    val k = keys.map(col)
    val us = expr(s"unix_micros($tsCol)")
    val w = Window.partitionBy(k: _*).orderBy(col("__us"))
    val seg = df
      .where(col(stateCol).isNotNull)
      .withColumn("__us", us)
      .withColumn("__dur_ms", expr(s"(lead(__us, 1) OVER (PARTITION BY ${keys.mkString(", ")} ORDER BY __us) - __us) div 1000"))
      .withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .withColumn(
        "__entry",
        when(col("__prev_state").isNull || col("__prev_state") =!= col(stateCol), lit(1L)).otherwise(lit(0L))
      )
    seg
      .groupBy(k :+ col(stateCol).as("state"): _*)
      .agg(
        count(lit(1)).as("n_obs"),
        sum(col("__entry")).as("n_entries"),
        coalesce(sum(col("__dur_ms")), lit(0L)).as("dur_ms")
      )
  }

  /** Per-(key, time-bucket) OHLC rollup — Timescale `candlestick_agg`
    * (`open`/`high`/`low`/`close`/`volume`, plus the trade count):
    * open/close are the first/last observed values in the bucket picked
    * by `min_by`/`max_by` over the unique microsecond key (never a sort),
    * high/low are plain min/max, `n_trades` counts observations and
    * `volume_e4` is the exact-long e4 value sum (the double-free stand-in
    * for a notional volume column, which `events` lacks).
    *
    * One hash aggregate keyed by (keys…, bucket) — no window at all, so
    * the rollup is a pure map-side-combinable aggregation.
    */
  def candlestick(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      bucket: String = "hour"
  ): DataFrame = {
    val k = keys.map(col)
    val v = col(valueCol)
    df.where(v.isNotNull)
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .groupBy(k :+ date_trunc(bucket, col(tsCol)).as("bucket_ts"): _*)
      .agg(
        count(lit(1)).as("n_trades"),
        expr(s"min_by($valueCol, __us)").as("open"),
        max(v).as("high"),
        min(v).as("low"),
        expr(s"max_by($valueCol, __us)").as("close"),
        sum(floor(v * 10000 + 0.5).cast(LongType)).as("volume_e4")
      )
  }

  /** Coarser OHLC derived FROM a finer [[candlestick]] level — Timescale's
    * `rollup(candlestick_agg)`: open nests as the open of the EARLIEST
    * child bucket (`min_by` over the child bucket timestamp, unique per
    * key by construction), close as the latest child's close, high/low as
    * plain max/min, trades and e4 volume as long sums. Like [[rerollup]],
    * the daily level re-aggregates ~24 candle rows per key instead of
    * re-scanning raw trades, and both levels stay map-side-combinable
    * hash aggregates; the decomposition is exact, so daily-from-hourly
    * hash-matches daily-from-raw (the gate's claim).
    */
  def rerollupCandlestick(finer: DataFrame, keys: Seq[String], bucket: String): DataFrame =
    finer
      .withColumn("__bus", expr("unix_micros(bucket_ts)"))
      .groupBy(keys.map(col) :+ date_trunc(bucket, col("bucket_ts")).as("bucket_ts"): _*)
      .agg(
        sum(col("n_trades")).as("n_trades"),
        expr("min_by(open, __bus)").as("open"),
        max(col("high")).as("high"),
        min(col("low")).as("low"),
        expr("max_by(close, __bus)").as("close"),
        sum(col("volume_e4")).as("volume_e4")
      )

  /** Per-key liveness rollup — Timescale `heartbeat_agg` + `uptime`/
    * `downtime`/`interpolated` accessors: each observation asserts the
    * source was alive for `livenessS` seconds; consecutive heartbeats
    * closer than that merge into one covered interval, a larger gap
    * means `gap − liveness` of downtime. The final heartbeat contributes
    * its full liveness window (coverage is over
    * `[first_ts, last_ts + liveness]`).
    *
    * All-long arithmetic: per-gap µs clamp (`least`/`greatest`), exact µs
    * sums, ONE `div 1000` per output column at the end (truncating per
    * gap would drift). Output per key: `n_beats`, `n_gaps` (gaps past
    * liveness), `up_ms`, `down_ms`, and `span_ms` (= up + down, the
    * covered interval length). One lead window + one hash aggregate.
    */
  def heartbeatAgg(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      livenessS: Long
  ): DataFrame = {
    require(livenessS > 0, "liveness window must be positive")
    val k = keys.map(col)
    val lUs = livenessS * 1000000L
    val w = Window.partitionBy(k: _*).orderBy(col("__us"))
    val gaps = df
      .withColumn("__us", expr(s"unix_micros($tsCol)"))
      .withColumn("__gap_us", lead(col("__us"), 1).over(w) - col("__us"))
    gaps
      .groupBy(k: _*)
      .agg(
        count(lit(1)).as("n_beats"),
        count(when(col("__gap_us") > lUs, lit(1))).as("n_gaps"),
        // least/greatest SKIP nulls in both Spark and DuckDB (they don't
        // propagate), so the terminal null gap must be excluded explicitly
        // or it would contribute a phantom full liveness window
        expr(s"(coalesce(sum(CASE WHEN __gap_us IS NOT NULL THEN least(__gap_us, ${lUs}L) END), 0L) + ${lUs}L) div 1000").as("up_ms"),
        expr(s"coalesce(sum(CASE WHEN __gap_us IS NOT NULL THEN greatest(__gap_us - ${lUs}L, 0L) END), 0L) div 1000").as("down_ms")
      )
      .withColumn("span_ms", col("up_ms") + col("down_ms"))
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

  /** Per-(key, bucket) time-weighted average — the CONTINUOUS-AGGREGATE
    * form of [[timeWeightedAvg]] (Timescale `time_bucket` +
    * `average(time_weight('LOCF'))`, the shape dashboards query): each
    * LOCF segment [obs, next-obs) is SPLIT across the fixed-width
    * buckets it spans, contributing its overlap µs × value to every
    * covered bucket, so a reading held across an edge weighs into both
    * sides exactly — the boundary-interpolation the naive per-bucket
    * grouping gets wrong.
    *
    * Shape: one key-partitioned lead window → `sequence` explode of the
    * covered bucket range (a segment touches `len/width + 1` buckets —
    * bounded fan-out, never a grid join) → one hash aggregate on
    * (key, bucket). Exact-long overlap-µs × e4-value products; the one
    * division happens at the end per output row.
    *
    * Output per (key, bucket): `bucket_s` (epoch seconds), `covered_us`
    * (observed µs inside the bucket), `wsum_e4us` (the exact integral),
    * and `twa` (their ratio, rounded 6dp).
    */
  def timeWeightedBucketed(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val w = bucketSeconds * 1000000L
    val k = keys.map(col)
    val win = Window.partitionBy(k: _*).orderBy(col("__us"))
    val seg = df
      .where(col(valueCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__v4", floor(col(valueCol) * 10000 + 0.5).cast(LongType))
      .withColumn("__nxt", lead(col("__us"), 1).over(win))
      // strict: a zero-length segment (duplicate per-key timestamp) would
      // make sequence(start, stop) run DESCENDING (stop < start after the
      // -1), emitting phantom buckets with covered_us = 0 and a 0/0 twa
      .where(col("__nxt") > col("__us"))
    val b = col("__b")
    val overlap = least(col("__nxt"), (b + 1) * w) - greatest(col("__us"), b * w)
    seg
      .withColumn("__b", explode(sequence(expr(s"__us div ${w}L"), expr(s"(__nxt - 1) div ${w}L"))))
      .groupBy(k :+ (b * bucketSeconds).as("bucket_s"): _*)
      .agg(
        sum(overlap).as("covered_us"),
        sum(overlap * col("__v4")).as("wsum_e4us")
      )
      .withColumn("twa",
        round(col("wsum_e4us").cast(DoubleType) / col("covered_us") / 10000.0, 6))
  }

  /** Per-(key, state, bucket) held time — Timescale `state_agg` +
    * `duration_in(state)` per `time_bucket`, the bucketed twin of
    * [[stateAgg]] built on the same segment-split machinery as
    * [[timeWeightedBucketed]]: each LOCF state segment [obs, next-obs)
    * splits across the fixed-width buckets it spans, adding its overlap
    * µs to (key, state, bucket) — so a state held across a bucket edge
    * is charged to both sides exactly. Exact-long µs sums, one truncating
    * div-to-ms per output row. The explode is map-side; the aggregate
    * keys on (key, state, bucket), a superset of the window's key
    * partitioning, so Catalyst reuses the one exchange — same
    * one-shuffle shape as [[timeWeightedBucketed]].
    */
  def stateDurationBucketed(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      stateCol: String,
      bucketSeconds: Long
  ): DataFrame = {
    require(bucketSeconds > 0, "bucket width must be positive")
    val w = bucketSeconds * 1000000L
    val k = keys.map(col)
    val win = Window.partitionBy(k: _*).orderBy(col("__us"))
    val seg = df
      .where(col(stateCol).isNotNull)
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__nxt", lead(col("__us"), 1).over(win))
      // strict (not just non-null): zero-length segments would explode a
      // descending sequence — see [[timeWeightedBucketed]]
      .where(col("__nxt") > col("__us"))
    val b = col("__b")
    val overlap = least(col("__nxt"), (b + 1) * w) - greatest(col("__us"), b * w)
    seg
      .withColumn("__b", explode(sequence(expr(s"__us div ${w}L"), expr(s"(__nxt - 1) div ${w}L"))))
      .groupBy(k ++ Seq(col(stateCol).as("state"), (b * bucketSeconds).as("bucket_s")): _*)
      .agg(sum(overlap).as("__sum_us"))
      .withColumn("dur_ms", expr("__sum_us div 1000"))
      .drop("__sum_us")
  }

  /** Per-(key, bucket) uptime — Timescale `heartbeat_agg` + `uptime` per
    * `time_bucket`, the bucketed member of the liveness family: each
    * heartbeat covers `[beat, beat + min(gap-to-next, liveness))` (the
    * same per-gap clamp as [[heartbeatAgg]]; consecutive beats closer
    * than the liveness window merge seamlessly because each segment ends
    * where the next begins), and that covered interval SPLITS across the
    * fixed-width buckets it spans — the [[timeWeightedBucketed]] edge
    * machinery with the clamp applied before the split. The key's final
    * beat contributes its full liveness window. Exact-long µs sums, one
    * truncating ms division per output row; same one-shuffle plan.
    */
  def heartbeatUptimeBucketed(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      livenessS: Long,
      bucketSeconds: Long
  ): DataFrame = {
    require(livenessS > 0 && bucketSeconds > 0, "liveness and bucket width must be positive")
    val w = bucketSeconds * 1000000L
    val lUs = livenessS * 1000000L
    val k = keys.map(col)
    val win = Window.partitionBy(k: _*).orderBy(col("__us"))
    val seg = df
      .withColumn("__us", unix_micros(col(tsCol)))
      .withColumn("__nxt", lead(col("__us"), 1).over(win))
      // covered interval end: clamp at liveness; the final beat (no next)
      // covers its full window
      .withColumn("__end", least(coalesce(col("__nxt"), lit(Long.MaxValue)), col("__us") + lUs))
      // strict: a duplicate per-key beat (nxt == us) yields a zero-length
      // covered interval whose explode would run descending — drop it;
      // the surviving twin of the duplicate covers the same range
      .where(col("__end") > col("__us"))
    val b = col("__b")
    val overlap = least(col("__end"), (b + 1) * w) - greatest(col("__us"), b * w)
    seg
      .withColumn("__b", explode(sequence(expr(s"__us div ${w}L"), expr(s"(__end - 1) div ${w}L"))))
      .groupBy(k :+ (b * bucketSeconds).as("bucket_s"): _*)
      .agg(sum(overlap).as("__up_us"))
      .withColumn("up_ms", expr("__up_us div 1000"))
      .drop("__up_us")
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

  /** Leaf level of a hierarchical continuous aggregate — Timescale's
    * cagg-on-cagg: the finest rollup keeps DECOMPOSABLE statistics only
    * (count, exact-long e4 sum, min, max), so any coarser level can be
    * derived from it by [[rerollup]] without touching raw data again.
    * `sum_e4` is the fixed-point long sum (order-insensitive, exact), so
    * the whole hierarchy is hash-comparable against a single-level
    * aggregate of the raw table — the equivalence the gate pins.
    */
  def bucketRollup(
      df: DataFrame,
      keys: Seq[String],
      tsCol: String,
      valueCol: String,
      bucket: String
  ): DataFrame = {
    val v = col(valueCol)
    df.where(v.isNotNull)
      .groupBy(keys.map(col) :+ date_trunc(bucket, col(tsCol)).as("bucket_ts"): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(floor(v * 10000 + 0.5).cast(LongType)).as("sum_e4"),
        min(v).as("min_v"),
        max(v).as("max_v")
      )
  }

  /** Coarser level derived FROM a finer [[bucketRollup]] — never from raw
    * data. Counts and sums add, min/max nest, and `n_child` counts the
    * finer buckets folded in. At 100 TB this is the whole point of the
    * hierarchy: the daily level re-aggregates ~24 rows per (key, day)
    * instead of re-scanning the raw event stream, and both levels stay
    * plain map-side-combinable hash aggregates.
    */
  def rerollup(finer: DataFrame, keys: Seq[String], bucket: String): DataFrame =
    finer
      .groupBy(keys.map(col) :+ date_trunc(bucket, col("bucket_ts")).as("bucket_ts"): _*)
      .agg(
        count(lit(1)).as("n_child"),
        sum(col("n")).as("n"),
        sum(col("sum_e4")).as("sum_e4"),
        min(col("min_v")).as("min_v"),
        max(col("max_v")).as("max_v")
      )

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

  /** Timescale `time_bucket(width, ts, origin)` for ARBITRARY widths —
    * the form `date_trunc` cannot express (90-second, 15-minute, 6-hour
    * buckets…). Pure integer µs arithmetic in one codegen'd projection:
    * bucket start = ts − ((ts − origin) mod width), with the mod folded
    * positive so pre-origin timestamps still floor (Timescale's
    * semantics), never truncate toward zero.
    *
    * @param ts            timestamp column
    * @param widthSeconds  bucket width in whole seconds (> 0)
    * @param originEpochS  bucket phase origin, epoch seconds (default 0 —
    *                      Unix-epoch-aligned, Timescale's default for
    *                      sub-month widths)
    */
  def timeBucket(ts: Column, widthSeconds: Long, originEpochS: Long = 0L): Column = {
    require(widthSeconds > 0, "bucket width must be positive")
    val w = widthSeconds * 1000000L
    val o = originEpochS * 1000000L
    val x = unix_micros(ts) - lit(o)
    timestamp_micros(lit(o) + x - ((x % w + w) % w))
  }

  private val asapOutSchema = StructType(Seq(
    StructField("key", StringType, nullable = true),
    StructField("t_us", LongType, nullable = false),
    StructField("v_smooth", DoubleType, nullable = false),
    StructField("window", org.apache.spark.sql.types.IntegerType, nullable = false)
  ))

  /** ASAP smoothing (Rong & Bailis, VLDB 2017 "ASAP: Prioritizing
    * Attention via Time Series Smoothing"): per key, pick the moving-
    * average window that minimizes roughness (stddev of first differences)
    * while preserving kurtosis (so genuine outliers survive smoothing),
    * searching candidate windows at the autocorrelation peaks of the
    * series — the paper's insight that good windows sit at the series'
    * periodicities. Emits the smoothed series (window-start timestamps,
    * `n − w + 1` points) plus the chosen window per key.
    *
    * Input should be a regular grid (bucket upstream — [[bucketRollup]] or
    * [[GapFill]]), matching the paper's fixed-interval model; the window
    * is then a count of grid steps. Same executor-memory contract and
    * typed `flatMapGroups` shape as [[lttb]] — sequential per key by
    * nature, bounded by the upstream grid, never a global window.
    *
    * Determinism: selection and smoothing are pure sequential folds over
    * the time-sorted array (ties in the roughness minimization keep the
    * smallest window), so a single-threaded replay of the same series
    * reproduces the output bit-for-bit — the expected-table gate contract.
    */
  def asapSmooth(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      valueCol: String,
      maxLagCap: Int = 400
  ): DataFrame = {
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
        asapReplay(series, maxLagCap).iterator.map { case (t, v, w) => Row(key, t, v, w) }
      }(org.apache.spark.sql.Encoders.row(asapOutSchema))
      .toDF()
  }

  /** Single-series ASAP: select the window, smooth, stamp the choice —
    * the shared core of the distributed path and the expected-table
    * replay. `series` must be time-sorted.
    */
  private[graft] def asapReplay(
      series: Array[(Long, Double)],
      maxLagCap: Int
  ): Array[(Long, Double, Int)] = {
    val v = series.map(_._2)
    val w = asapSelect(v, maxLagCap)
    val sm = asapSma(v, w)
    Array.tabulate(sm.length)(i => (series(i)._1, sm(i), w))
  }

  /** Window selection: candidates are the autocorrelation peak lags
    * (local maxima above 0.2, the paper's significance floor) capped at
    * `min(n/2, maxLagCap)`; the winner minimizes roughness subject to
    * `kurtosis(smoothed) ≥ kurtosis(original)`, with `1` (no smoothing)
    * as the baseline. Strict `<` keeps the smallest window on ties.
    */
  private[graft] def asapSelect(values: Array[Double], maxLagCap: Int): Int = {
    val n = values.length
    if (n < 8) return 1
    val mean = values.sum / n
    val c = values.map(_ - mean)
    var c0 = 0.0
    c.foreach(x => c0 += x * x)
    if (c0 == 0.0) return 1
    val maxLag = math.min(n / 2, maxLagCap)
    val acf = new Array[Double](maxLag + 1)
    var k = 1
    while (k <= maxLag) {
      var s = 0.0
      var i = 0
      while (i < n - k) { s += c(i) * c(i + k); i += 1 }
      acf(k) = s / c0
      k += 1
    }
    val candidates = (2 until maxLag).filter { lag =>
      acf(lag) > 0.2 && acf(lag) > acf(lag - 1) && acf(lag) >= acf(lag + 1)
    }
    val origKurt = asapKurtosis(values)
    var best = 1
    var bestRough = asapRoughness(values)
    candidates.foreach { w =>
      val sm = asapSma(values, w)
      val r = asapRoughness(sm)
      if (r < bestRough && asapKurtosis(sm) >= origKurt) {
        best = w
        bestRough = r
      }
    }
    best
  }

  /** Simple moving average, window-start aligned (`n − w + 1` points).
    * Each window sums left-to-right independently — O(n·w), chosen over
    * the rolling add/subtract update so executor and replay accumulate in
    * the identical order (bit-determinism beats the constant factor at
    * the bounded per-key series sizes this operator documents).
    */
  private[graft] def asapSma(v: Array[Double], w: Int): Array[Double] = {
    if (w <= 1) return v.clone()
    val out = new Array[Double](v.length - w + 1)
    var i = 0
    while (i < out.length) {
      var s = 0.0
      var j = i
      while (j < i + w) { s += v(j); j += 1 }
      out(i) = s / w
      i += 1
    }
    out
  }

  /** Roughness = population stddev of first differences (paper §3.1). */
  private[graft] def asapRoughness(v: Array[Double]): Double = {
    if (v.length < 2) return 0.0
    val d = new Array[Double](v.length - 1)
    var i = 0
    while (i < d.length) { d(i) = v(i + 1) - v(i); i += 1 }
    val m = d.sum / d.length
    var s2 = 0.0
    d.foreach { x => val e = x - m; s2 += e * e }
    math.sqrt(s2 / d.length)
  }

  /** Excess-free sample kurtosis `n·m4/m2²` (paper §3.1 outlier guard). */
  private[graft] def asapKurtosis(v: Array[Double]): Double = {
    val n = v.length
    if (n == 0) return 0.0
    val mean = v.sum / n
    var m2 = 0.0
    var m4 = 0.0
    v.foreach { x => val d = x - mean; val d2 = d * d; m2 += d2; m4 += d2 * d2 }
    if (m2 == 0.0) 0.0 else n * m4 / (m2 * m2)
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
        // t centroid via EXACT long sum (one rounding at the final
        // divide): epoch-µs sums exceed 2^53 past ~5 points, where a
        // double accumulator would round per step — the exact form is
        // what the independent DuckDB oracle (sum of a BIGINT slice)
        // reproduces bit-for-bit at any bucket size
        var sumT = 0L; var avgV = 0.0
        var j = nStart
        while (j < nEnd) { sumT += series(j)._1; avgV += series(j)._2; j += 1 }
        val m = nEnd - nStart
        val avgT = sumT.toDouble / m; avgV /= m
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
