package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.analysis.MultiInstanceRelation
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions.{col, count, date_trunc, lit, max, max_by, min, min_by, sum}
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Transparent continuous-aggregate query rewrite — TimescaleDB's
  * real-time-aggregate behavior (reference init.sql:70's hypertable is
  * exactly what Timescale points continuous aggregates at; public docs:
  * queries against the raw hypertable are answered from the materialized
  * rollup when their shape allows): a coarse time-bucket aggregate
  * written against the RAW table is rewritten by the optimizer to
  * re-aggregate the registered finer rollup instead — the user keeps the
  * raw-table query, the engine reads ~24 rollup rows per (key, day)
  * rather than the raw event stream. At 100 TB this turns a full-corpus
  * scan into a rollup-table scan thousands of times smaller.
  *
  * Shape contract (checked structurally, never assumed):
  *   - the aggregate's child is a scan of the registered raw files
  *     (bare relation or an attribute-only Project over it);
  *   - groupings are key columns plus exactly one
  *     `date_trunc(level, tsCol)` with `level` calendar-coarser-or-equal
  *     than the rollup's own bucket;
  *   - aggregate functions are `count(lit)` / `sum|min|max|avg(measure)`
  *     where `measure` structurally equals the expression the rollup was
  *     built over (no DISTINCT, no FILTER). `avg` is served by the
  *     Timescale sum/count decomposition — `sum(sum_e) / sum(cnt_e)` —
  *     and only for non-decimal measures from rollups that carry the
  *     `cnt_e = count(measure)` column (count of NON-NULL measure values;
  *     `n = count(*)` would be wrong whenever the measure is nullable).
  * Anything else is left untouched. The rewrite preserves the original
  * output names AND exprIds, so enclosing plans resolve unchanged.
  *
  * Staleness contract: when the query's scan file-set EQUALS the
  * registered `rawFiles`, the rollup alone answers. When the raw table
  * has GAINED files since registration and the spec carries
  * `measureExpr` (with `realtime = true`, the default), the rewrite
  * serves `rollup UNION partial-aggregate(tail files only)` —
  * Timescale's real-time continuous aggregate (`materialized_only =
  * false`): the materialization never goes stale, it just answers less
  * of the query, and the un-materialized tail is aggregated at the
  * rollup's own level from exactly the files registration hasn't seen.
  * Subset scans (the rollup would ADD rows from files outside the scan)
  * and supersets without realtime always refuse and fall through to the
  * raw plan.
  *
  * The decomposition is exact (counts add, long sums add, min/max nest —
  * the [[graft.operators.TsAnalytics.rerollup]] algebra), so a rewritten
  * query is hash-identical to the raw aggregate — the `x_rollup_rewrite`
  * gate computes THROUGH the rewrite against a raw-data DuckDB oracle.
  */
object RollupRewrite extends Rule[LogicalPlan] {

  /** A registered rollup: which raw files it serves, its own (analyzed,
    * materialized) scan plan, the grouping keys, the bucket column
    * produced as `bucket_ts` at `finerLevel`, and the canonical measure
    * SQL (normalized) its sum/min/max columns were built over.
    *
    * `measureExpr` (the resolved measure expression, attribute refs by
    * NAME against the raw schema) enables REAL-TIME serving: when the
    * query's scan holds MORE files than `rawFiles`, the rewrite unions
    * the rollup with a partial aggregate over just the un-materialized
    * tail files — Timescale's real-time continuous aggregate
    * (`materialized_only = false`). Without it (or with
    * `realtime = false`) a superset scan refuses the rewrite and falls
    * through to the raw plan.
    */
  case class Spec(
      rawFiles: Set[String],
      rollup: LogicalPlan,
      keyCols: Seq[String],
      tsCol: String,
      finerLevel: String,
      measureSql: String,
      measureExpr: Option[Expression] = None,
      realtime: Boolean = true,
      // canonical SQL of the SKETCH measure (usually the unscaled double,
      // vs the exact-integer `measureSql` the sum/min/max partials use)
      // when the rollup also carries mergeable sketch states (`sk_td` /
      // `sk_udd` from [[buildSketchRollup]]) — enables serving
      // `tdigest_agg` / `udd_sketch_agg` of that measure by SKETCH MERGE
      // over the rollup (Timescale's percentile_agg-in-a-cagg read path).
      // Exact-coverage serving only: the real-time union plan drops the
      // sketch columns, so a tail-bearing scan refuses sketch queries
      // back to the raw plan rather than serving a stale percentile.
      sketchSql: Option[String] = None
  )

  private val specs = new java.util.concurrent.ConcurrentHashMap[String, Spec]()

  def register(name: String, spec: Spec): Unit = specs.put(name, spec)
  def clear(): Unit = specs.clear()

  /** Canonical structural form for measure matching: SQL text, lowercased,
    * whitespace-stripped. Attribute references render by NAME, which is
    * the contract — the raw attrs and the registration-time attrs carry
    * different exprIds by construction.
    */
  def canonical(e: Expression): String = e.sql.toLowerCase.replaceAll("\\s+", "")

  /** The measure's canonical form as it will appear INSIDE an optimized
    * query plan — resolve against the raw table and run the optimizer
    * over a one-column projection, so analyzer-inserted casts and
    * constant folding render identically on both sides of the match.
    */
  def canonicalMeasure(raw: DataFrame, measure: Column): String =
    canonical(resolvedMeasure(raw, measure))

  /** The measure as a RESOLVED optimized expression over the raw schema —
    * the form [[Spec.measureExpr]] stores for real-time tail
    * aggregation. Attribute refs are re-rooted by name at rewrite time.
    */
  def resolvedMeasure(raw: DataFrame, measure: Column): Expression = {
    val plan = raw.select(measure.as("__graft_m")).queryExecution.optimizedPlan
    plan.collectFirst {
      case Project(projectList, _) =>
        projectList.collectFirst { case Alias(child, "__graft_m") => child }
    }.flatten.getOrElse(
      throw new IllegalArgumentException(s"cannot canonicalize measure over ${raw.schema}"))
  }

  /** Hourly-style rollup the rewrite can serve: n / cnt_e / sum_e / min_e /
    * max_e plus the OHLC partials ts_open / open_e / ts_close / close_e
    * per (keys…, bucket_ts). `cnt_e = count(measure)` (non-null count) is
    * what makes `avg` decomposable; `n = count(*)` serves `count(lit)`;
    * the (argmin-ts, value-at-argmin) pairs make `min_by(measure, ts)` /
    * `max_by(measure, ts)` — Timescale's `first`/`last`, the candlestick
    * open/close — decomposable: buckets occupy disjoint time ranges, so
    * re-aggregating `min_by(open_e, ts_open)` across buckets picks the
    * globally-earliest bucket's open (exact whenever the corpus's ts is
    * unique per (key, ts) — on ties both the raw and the rollup pick are
    * engine-nondeterministic in exactly the same way). Build it,
    * materialize it to parquet, read it back, and register THAT scan.
    */
  def buildRollup(
      raw: DataFrame,
      keys: Seq[String],
      tsCol: String,
      measure: Column,
      level: String
  ): DataFrame =
    raw
      .groupBy(keys.map(col) :+ date_trunc(level, col(tsCol)).as("bucket_ts"): _*)
      .agg(
        count(lit(1)).as("n"),
        count(measure).as("cnt_e"),
        sum(measure).as("sum_e"),
        min(measure).as("min_e"),
        max(measure).as("max_e"),
        min(col(tsCol)).as("ts_open"),
        min_by(measure, col(tsCol)).as("open_e"),
        max(col(tsCol)).as("ts_close"),
        max_by(measure, col(tsCol)).as("close_e"))

  /** [[buildRollup]] extended with per-bucket MERGEABLE SKETCH states —
    * Timescale's `percentile_agg(value)` column inside a continuous
    * aggregate, in both sketch flavors: `sk_td` (t-digest, rank-space,
    * merge within the rank bound) and `sk_udd` (UDDSketch, value-space,
    * merge bit-exact). `sketchMeasure` is typically the UNSCALED double
    * (percentiles of the real value), distinct from the exact-integer
    * `measure` the sum/min/max partials use; register its canonical form
    * as [[Spec.sketchSql]] and the rewrite serves `tdigest_agg` /
    * `udd_sketch_agg` of it by merge. Sketch columns are a few KB per
    * bucket regardless of bucket row count — the whole point: a day
    * percentile over 100 TB of raw rows reads hours × KB of state.
    */
  def buildSketchRollup(
      raw: DataFrame,
      keys: Seq[String],
      tsCol: String,
      measure: Column,
      sketchMeasure: Column,
      level: String
  ): DataFrame = {
    graft.functions.GraftFunctions.register(raw.sparkSession)
    import graft.functions.GraftFunctions.{tdigest_agg, udd_sketch_agg}
    raw
      .groupBy(keys.map(col) :+ date_trunc(level, col(tsCol)).as("bucket_ts"): _*)
      .agg(
        count(lit(1)).as("n"),
        count(measure).as("cnt_e"),
        sum(measure).as("sum_e"),
        min(measure).as("min_e"),
        max(measure).as("max_e"),
        min(col(tsCol)).as("ts_open"),
        min_by(measure, col(tsCol)).as("open_e"),
        max(col(tsCol)).as("ts_close"),
        max_by(measure, col(tsCol)).as("close_e"),
        tdigest_agg(sketchMeasure.cast("double")).as("sk_td"),
        udd_sketch_agg(sketchMeasure.cast("double")).as("sk_udd"))
  }

  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RollupRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RollupRewrite
    }

  /** Calendar-nesting ranks. The serve rule is NESTING, not mere
    * coarseness: `date_trunc(coarse, date_trunc(fine, ts)) ==
    * date_trunc(coarse, ts)` must hold. Sub-day levels (minute/hour/day)
    * nest into EVERY coarser calendar level — week AND month included,
    * whose mutual non-nesting therefore never matters when serving from
    * them. Calendar-level rollups nest only upward along the calendar
    * chain (month → quarter → year); WEEK nests into nothing coarser
    * (ISO weeks cross month/quarter/year boundaries), so a week rollup
    * serves only week dashboards.
    */
  private val levelRank = Map(
    "minute" -> 1, "hour" -> 2, "day" -> 3, "week" -> 4,
    "month" -> 5, "quarter" -> 6, "year" -> 7)

  /** Fixed microsecond widths of the sub-day rollup levels in UTC (no
    * DST; a UTC day is always 86 400 s) — used to test whether a WHERE
    * bound is aligned to a bucket boundary. Calendar levels
    * (week/month/quarter/year) have no fixed width; their alignment test
    * is [[calendarAligned]].
    */
  private val levelWidthUs = Map(
    "minute" -> 60000000L, "hour" -> 3600000000L, "day" -> 86400000000L)

  /** Whether instant `us` sits exactly on a UTC `level` boundary — the
    * alignment test for the variable-width calendar levels: UTC midnight
    * on an ISO Monday (week — Spark's `date_trunc('week')` is
    * Monday-anchored), on day 1 of a month / of a quarter-starting month
    * (Jan/Apr/Jul/Oct), or on Jan 1 (year). Pure integer-calendar
    * arithmetic on the literal — evaluated once per bound at plan time.
    */
  private def calendarAligned(us: Long, level: String): Boolean = {
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(us, 1000000L),
      (Math.floorMod(us, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val midnight = ldt.toLocalTime == java.time.LocalTime.MIDNIGHT
    level match {
      case "week"    => midnight && ldt.getDayOfWeek == java.time.DayOfWeek.MONDAY
      case "month"   => midnight && ldt.getDayOfMonth == 1
      case "quarter" => midnight && ldt.getDayOfMonth == 1 && (ldt.getMonthValue - 1) % 3 == 0
      case "year"    => midnight && ldt.getDayOfYear == 1
      case _         => false
    }
  }

  private def serves(finer: String, coarser: String): Boolean =
    (levelRank.get(finer.toLowerCase), levelRank.get(coarser.toLowerCase)) match {
      case (Some(f), Some(c)) =>
        if (f <= 3) c >= f // fixed sub-day widths divide every coarser level
        else if (f == 4) c == 4 // week nests only into week
        else c >= f // month/quarter/year nest up the calendar chain
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val it = specs.values().iterator()
      var out: LogicalPlan = agg
      while (it.hasNext && (out eq agg)) {
        tryRewrite(agg, it.next()).foreach(r => out = r)
      }
      out
  }

  /** Unwrap alias/projection layers down to the relation, accumulating a
    * substitution map exprId → underlying expression for every projection
    * alias passed on the way (the optimizer's PullOutGroupingExpressions
    * parks `date_trunc` in exactly such a Project below the Aggregate).
    */
  private def unwrapScan(
      plan: LogicalPlan): Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] =
    plan match {
      case r: LogicalRelation => Some((r, Map.empty, Nil))
      case SubqueryAlias(_, child) => unwrapScan(child)
      case Project(projectList, child) =>
        unwrapScan(child).map { case (r, inner, conds) =>
          val m = projectList.collect {
            case a @ Alias(ac, _) => a.exprId -> deref(ac, inner)
          }.toMap
          (r, inner ++ m, conds)
        }
      case Filter(cond, child) =>
        // collect the pushed-down WHERE conjuncts; tryRewrite decides
        // per-conjunct whether the rollup can answer them
        unwrapScan(child).map { case (r, inner, conds) =>
          (r, inner, conds ++ splitConjuncts(cond))
        }
      case _ => None
    }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other => Seq(other)
  }

  private def deref(e: Expression, m: Map[ExprId, Expression]): Expression =
    if (m.isEmpty) e
    else e.transform { case a: AttributeReference if m.contains(a.exprId) => m(a.exprId) }

  private def scanFiles(r: LogicalRelation): Set[String] = r.relation match {
    case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
      fs.location.inputFiles.toSet
    case _ => Set.empty
  }

  private def tryRewrite(agg: Aggregate, spec: Spec): Option[LogicalPlan] = {
    val (scan, aliasMap, whereConds) = unwrapScan(agg.child).getOrElse(return None)
    // Coverage contract per scan file-set:
    //   - EQUAL to the registered rawFiles → serve from the rollup alone.
    //   - STRICT SUPERSET and the spec allows real-time → serve from
    //     rollup UNION a partial aggregate over just the un-materialized
    //     tail files — Timescale's real-time continuous aggregate
    //     (materialized_only = false): the rollup never goes stale, it
    //     just answers less of the query.
    //   - anything else (subset scans — the rollup would ADD rows from
    //     files outside the scan; supersets without realtime/measureExpr)
    //     refuses the rewrite and falls through to the raw plan.
    val files = scanFiles(scan)
    if (files.isEmpty) return None
    val exact = files == spec.rawFiles
    val realtime = !exact && spec.realtime && spec.measureExpr.isDefined &&
      spec.rawFiles.subsetOf(files)
    if (!exact && !realtime) return None

    // classify groupings (dereferenced through the projection aliases):
    // keys by name + exactly one coarser date_trunc over the ts column
    var truncLevel: Option[String] = None
    var truncTz: Option[String] = None
    var truncInner: Option[Expression] = None
    def classifyGrouping(e: Expression): Boolean = deref(stripAlias(e), aliasMap) match {
      case a: AttributeReference => spec.keyCols.contains(a.name)
      case DateTruncOf(level, tsAttr, inner, tz) if tsAttr.name == spec.tsCol &&
          serves(spec.finerLevel, level) && truncLevel.isEmpty =>
        truncLevel = Some(level); truncTz = tz; truncInner = Some(inner); true
      case _ => false
    }
    if (!agg.groupingExpressions.forall(classifyGrouping) || truncLevel.isEmpty) return None

    // fresh instance of the rollup scan so repeated rewrites cannot
    // collide on exprIds
    val rollup = spec.rollup.transform {
      case m: MultiInstanceRelation => m.newInstance().asInstanceOf[LogicalPlan]
    }
    val byNameRollup = rollup.output.map(a => a.name -> a).toMap
    val needed = Seq("bucket_ts", "n", "sum_e", "min_e", "max_e") ++
      (if (realtime) Seq("cnt_e") else Nil) ++ spec.keyCols
    if (!needed.forall(byNameRollup.contains)) return None
    // OHLC partials are optional (rollups materialized before they
    // existed still serve the count/sum/min/max/avg family); when
    // present they additionally serve min_by/max_by(measure, ts) and
    // min/max(ts).
    val ohlcCols = Seq("ts_open", "open_e", "ts_close", "close_e")
    val hasOhlc = ohlcCols.forall(byNameRollup.contains)

    // ---- WHERE-clause serving (the dashboard shape: WHERE key = 'x'
    // AND ts >= A AND ts < B GROUP BY day) --------------------------------
    // A pushed-down conjunct is servable iff it can be re-expressed on
    // the rollup:
    //   - references only key columns → re-root by name (row-level and
    //     bucket-level selection coincide because keys are group keys);
    //   - IsNotNull(ts) (the guard pushdown inserts beside ts bounds) →
    //     IsNotNull(bucket_ts): a null-ts row lands in a null bucket;
    //   - half-open ts bounds `ts >= A` / `ts < B` whose literal is
    //     aligned to the rollup's OWN bucket width in UTC → the same
    //     bound on bucket_ts: at aligned boundaries, bucket membership
    //     and row membership coincide exactly. `ts > A` / `ts <= B`
    //     (boundary row excluded/included inside a bucket) are NOT
    //     bucket-expressible and refuse.
    // Any unservable conjunct refuses the whole rewrite — the raw plan
    // stands.
    // A servable ts bound, normalized for the bucket comparison: the
    // optimizer's UnwrapCastInBinaryComparison folds the load's NTZ→TZ
    // cast into the literal, leaving `ts_ntz >= <ntz literal>` — under
    // the UTC guard an NTZ wall-µs and a TZ instant-µs coincide, so
    // either flavor normalizes to the TimestampType literal bucket_ts
    // needs. Alignment to the rollup's own bucket width is what makes
    // bucket membership and row membership coincide at the bound.
    def alignedBound(l: Literal): Option[Literal] = l.dataType match {
      case org.apache.spark.sql.types.TimestampType |
          org.apache.spark.sql.types.TimestampNTZType =>
        val level = spec.finerLevel.toLowerCase
        val ok = truncTz.forall(tz => tz == "UTC" || tz == "Etc/UTC" || tz == "Z") &&
          l.value != null &&
          (levelWidthUs.get(level) match {
            // sub-day buckets: fixed-width divisibility in UTC µs
            case Some(w) => Math.floorMod(l.value.asInstanceOf[Long], w) == 0L
            // calendar buckets (week/month/quarter/year): boundary test
            // on the UTC calendar — e.g. a month dashboard's
            // `ts >= '2025-06-01'` is served, `>= '2025-06-15'` refuses
            case None => calendarAligned(l.value.asInstanceOf[Long], level)
          })
        if (ok) Some(Literal(l.value, org.apache.spark.sql.types.TimestampType)) else None
      case _ => None
    }
    def mapCondWith(c: Expression, attr: String => Attribute): Option[Expression] = {
      val d = deref(c, aliasMap)
      if (d.references.nonEmpty && d.references.forall(a => spec.keyCols.contains(a.name)))
        Some(d.transform { case a: AttributeReference => attr(a.name) })
      else d match {
        case IsNotNull(TsAttr(a)) if a.name == spec.tsCol =>
          Some(IsNotNull(attr("bucket_ts")))
        case GreaterThanOrEqual(TsAttr(a), l: Literal) if a.name == spec.tsCol =>
          alignedBound(l).map(nl => GreaterThanOrEqual(attr("bucket_ts"), nl))
        case LessThanOrEqual(l: Literal, TsAttr(a)) if a.name == spec.tsCol =>
          alignedBound(l).map(nl => GreaterThanOrEqual(attr("bucket_ts"), nl))
        case LessThan(TsAttr(a), l: Literal) if a.name == spec.tsCol =>
          alignedBound(l).map(nl => LessThan(attr("bucket_ts"), nl))
        case GreaterThan(l: Literal, TsAttr(a)) if a.name == spec.tsCol =>
          alignedBound(l).map(nl => LessThan(attr("bucket_ts"), nl))
        case _ => None
      }
    }
    if (whereConds.exists(c => mapCondWith(c, n => byNameRollup(n)).isEmpty)) return None

    /** Real-time tail: the SAME five-partial rollup shape (buildRollup's
      * algebra — counts add, sums add, min/max nest) aggregated over ONLY
      * the files registration has not materialized, built directly in
      * Catalyst (no nested analysis inside the optimizer). The final
      * re-aggregate over `rollup UNION tail` is then exact by the same
      * rerollup algebra that makes the exact-mode rewrite hash-identical.
      */
    def buildTailAgg(tailFiles: Set[String]): Option[LogicalPlan] = {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex}
      val fsRel = scan.relation match {
        case f: HadoopFsRelation => f
        case _ => return None
      }
      val spark = fsRel.sparkSession
      // Flat layouts: re-list just the tail files. Hive-partitioned
      // layouts (the 100 TB shape — a time-partitioned raw table): a
      // leaf-file InMemoryFileIndex would re-list the files with NO
      // partition columns and the tail scan would silently lose their
      // values, so instead restrict the query's own index to the tail
      // allowlist — partition values (and partition pruning) survive.
      val tailIndex =
        if (fsRel.partitionSchema.isEmpty)
          new InMemoryFileIndex(
            spark, tailFiles.toSeq.map(new org.apache.hadoop.fs.Path(_)),
            Map.empty, Some(fsRel.dataSchema))
        else new FilteredFileIndex(fsRel.location, tailFiles)
      val tailRel = fsRel.copy(location = tailIndex)(spark)
      val tailOut = scan.output.map(_.newInstance())
      val tailScan = scan.copy(relation = tailRel, output = tailOut)
      val byNameTail = tailOut.map(a => a.name -> (a: Attribute)).toMap
      def reroot(e: Expression): Option[Expression] = {
        var ok = true
        val r = e.transform {
          case a: AttributeReference =>
            byNameTail.get(a.name) match {
              case Some(t) => t
              case None => ok = false; a
            }
        }
        if (ok) Some(r) else None
      }
      val keyAttrs = spec.keyCols.map(k => byNameTail.getOrElse(k, return None))
      val m = reroot(spec.measureExpr.get).getOrElse(return None)
      // bucket the tail at the rollup's OWN level over the query's ts
      // expression (cast shape included), re-rooted onto the tail scan;
      // the final aggregate then re-truncates to the query level exactly
      // as it does for rollup rows
      val tsE = reroot(truncInner.get).getOrElse(return None)
      val bucketE = TruncTimestamp(Literal(spec.finerLevel), tsE, truncTz)
      // OHLC tail partials use the query's own ts expression (cast shape
      // included) so the union's ts_open/ts_close types line up with the
      // registration-time rollup columns
      val ohlcOutputs: Seq[NamedExpression] =
        if (!hasOhlc) Nil
        else Seq(
          Alias(Min(tsE).toAggregateExpression(), "ts_open")(),
          Alias(MinBy(m, tsE).toAggregateExpression(), "open_e")(),
          Alias(Max(tsE).toAggregateExpression(), "ts_close")(),
          Alias(MaxBy(m, tsE).toAggregateExpression(), "close_e")())
      val outputs: Seq[NamedExpression] =
        keyAttrs.map(a => a.asInstanceOf[NamedExpression]) ++ Seq(
          Alias(bucketE, "bucket_ts")(),
          Alias(Count(Seq(Literal(1))).toAggregateExpression(), "n")(),
          Alias(Count(Seq(m)).toAggregateExpression(), "cnt_e")(),
          Alias(Sum(m).toAggregateExpression(), "sum_e")(),
          Alias(Min(m).toAggregateExpression(), "min_e")(),
          Alias(Max(m).toAggregateExpression(), "max_e")()) ++ ohlcOutputs
      // the query's WHERE applies to the tail at ROW level (the served
      // bucket-level form above the union is exact too, but row-level
      // filtering here reaches the parquet scan as a pushed filter)
      val tailChild: LogicalPlan =
        if (whereConds.isEmpty) tailScan
        else {
          val rerooted = whereConds.map(c =>
            reroot(deref(c, aliasMap)).getOrElse(return None))
          Filter(rerooted.reduce(And), tailScan)
        }
      Some(Aggregate((keyAttrs: Seq[Expression]) :+ bucketE, outputs, tailChild))
    }

    // The plan the final aggregate reads: the rollup alone (exact) or
    // rollup ∪ tail partials (real-time), positionally aligned
    val servePlan: LogicalPlan =
      if (exact) rollup
      else {
        val order = spec.keyCols ++
          Seq("bucket_ts", "n", "cnt_e", "sum_e", "min_e", "max_e") ++
          (if (hasOhlc) ohlcCols else Nil)
        val rollupProj =
          Project(order.map(c => byNameRollup(c).asInstanceOf[NamedExpression]), rollup)
        val tailAgg = buildTailAgg(files -- spec.rawFiles).getOrElse(return None)
        Union(Seq(rollupProj, tailAgg))
      }
    val byName = servePlan.output.map(a => a.name -> a).toMap
    def rAttr(name: String): Attribute = byName(name)
    val bucketAttr = rAttr("bucket_ts")
    val nAttr = rAttr("n")
    val sumAttr = rAttr("sum_e")
    val minAttr = rAttr("min_e")
    val maxAttr = rAttr("max_e")

    def newTrunc(level: String): Expression =
      TruncTimestamp(Literal(level), bucketAttr, truncTz)

    def isMeasure(e: Expression): Boolean =
      canonical(deref(e, aliasMap)) == spec.measureSql

    // the raw ts column (possibly behind the NTZ→TZ load cast) — the
    // only ordering expression the OHLC partials decompose over
    def isTsColumn(e: Expression): Boolean = deref(e, aliasMap) match {
      case TsAttr(a) => a.name == spec.tsCol
      case _ => false
    }

    // Map one whole AggregateExpression to its rollup-served form — an
    // Expression, not just an AggregateFunction, because count and avg
    // need wrapping: count(lit) becomes coalesce(sum(n), 0) to preserve
    // Count's non-nullable contract (a bare Sum is nullable, and flipping
    // nullability mid-optimization under the original exprId is a latent
    // codegen hazard), and avg becomes the guarded sum/cnt division.
    def mapAgg(ae: AggregateExpression): Option[Expression] = ae.aggregateFunction match {
      case Count(children) if children.forall(_.isInstanceOf[Literal]) =>
        Some(Coalesce(Seq(ae.copy(aggregateFunction = Sum(nAttr)), Literal(0L))))
      // count(measure) — the NON-NULL count — is exactly sum(cnt_e):
      // cnt_e is count(measure) per bucket, and counts add across buckets
      case Count(Seq(e)) if isMeasure(e) && byName.contains("cnt_e") =>
        Some(Coalesce(Seq(
          ae.copy(aggregateFunction = Sum(rAttr("cnt_e"))), Literal(0L))))
      case Sum(e, mode) if isMeasure(e) => Some(ae.copy(aggregateFunction = Sum(sumAttr, mode)))
      case Min(e) if isMeasure(e) => Some(ae.copy(aggregateFunction = Min(minAttr)))
      case Max(e) if isMeasure(e) => Some(ae.copy(aggregateFunction = Max(maxAttr)))
      // Timescale first/last (candlestick open/close): min_by/max_by of
      // the measure ordered by the raw ts decompose over the (argmin-ts,
      // value) partials — buckets occupy disjoint time ranges, so the
      // cross-bucket argmin is the bucket with the smallest ts_open.
      // min/max of the ts itself nest the same way.
      case MinBy(v, o) if hasOhlc && isMeasure(v) && isTsColumn(o) =>
        Some(ae.copy(aggregateFunction = MinBy(rAttr("open_e"), rAttr("ts_open"))))
      case MaxBy(v, o) if hasOhlc && isMeasure(v) && isTsColumn(o) =>
        Some(ae.copy(aggregateFunction = MaxBy(rAttr("close_e"), rAttr("ts_close"))))
      case Min(e) if hasOhlc && isTsColumn(e) &&
          e.dataType == rAttr("ts_open").dataType =>
        Some(ae.copy(aggregateFunction = Min(rAttr("ts_open"))))
      case Max(e) if hasOhlc && isTsColumn(e) &&
          e.dataType == rAttr("ts_close").dataType =>
        Some(ae.copy(aggregateFunction = Max(rAttr("ts_close"))))
      // sketch-state serving (percentile_agg in a continuous aggregate):
      // the raw query's sketch-build aggregate over the registered sketch
      // measure becomes a sketch MERGE over the rollup's per-bucket
      // states. t-digest merge re-compresses within the documented rank
      // bound; UDDSketch merge is per-bucket count addition — bit-exact,
      // so UDD serving is indistinguishable from the raw aggregate.
      case graft.functions.TDigestAgg(e, _, _)
          if byName.contains("sk_td") &&
            spec.sketchSql.contains(canonical(deref(e, aliasMap))) =>
        Some(ae.copy(aggregateFunction = graft.functions.TDigestMergeAgg(rAttr("sk_td"))))
      case graft.functions.UddSketchAgg(e, _, _)
          if byName.contains("sk_udd") &&
            spec.sketchSql.contains(canonical(deref(e, aliasMap))) =>
        Some(ae.copy(aggregateFunction = graft.functions.UddMergeAgg(rAttr("sk_udd"))))
      case Average(e, _) if isMeasure(e) && byName.contains("cnt_e") &&
          !deref(e, aliasMap).dataType.isInstanceOf[DecimalType] =>
        // Timescale's real-time-aggregate decomposition: avg(measure) =
        // sum(sum_e) / sum(cnt_e) — cnt_e counts NON-NULL measures, so
        // all-null groups divide by a guarded zero and yield NULL exactly
        // like the raw Average. Fresh resultIds: the two synthesized
        // aggregates must not collide with each other in the physical
        // aggregate's expression map. Decimal measures are refused
        // (Average's decimal sum type/precision algebra differs).
        val sumA = ae.copy(aggregateFunction = Sum(sumAttr), resultId = NamedExpression.newExprId)
        val cntA = ae.copy(
          aggregateFunction = Sum(rAttr("cnt_e")), resultId = NamedExpression.newExprId)
        Some(If(
          EqualTo(Coalesce(Seq(cntA, Literal(0L))), Literal(0L)),
          Literal(null, DoubleType),
          Divide(Cast(sumA, DoubleType), Cast(cntA, DoubleType))))
      case _ => None
    }

    def isTruncOutput(e: Expression): Boolean = deref(e, aliasMap) match {
      case DateTruncOf(level, tsAttr, _, _) =>
        tsAttr.name == spec.tsCol && truncLevel.contains(level)
      case _ => false
    }

    // Rewrite each output expression inside-out: grouping outputs (the
    // date_trunc — possibly wrapped in arbitrary scalar expressions the
    // optimizer collapsed into the aggregate, e.g. unix_seconds(trunc))
    // re-root onto the rollup's bucket column, key attrs onto the
    // rollup's key columns, aggregate functions onto the rollup measures.
    // Any residual reference to a raw-table attribute means the shape is
    // not served — leave the plan untouched.
    val rollupOutputIds = servePlan.outputSet
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      val body = ne match {
        case a: Alias => a.child
        case other => other
      }
      val rewritten = body.transform {
        case e if isTruncOutput(e) => newTrunc(truncLevel.get)
        case a: AttributeReference if spec.keyCols.contains(a.name) => rAttr(a.name)
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          mapAgg(ae).getOrElse(ae) // unmapped leaves raw references → rejected below
      }
      if (!rewritten.references.subsetOf(rollupOutputIds)) return None
      Alias(rewritten, ne.name)(exprId = ne.exprId)
    }

    val newGroupings: Seq[Expression] = agg.groupingExpressions.map { g =>
      deref(stripAlias(g), aliasMap) match {
        case a: AttributeReference if spec.keyCols.contains(a.name) => rAttr(a.name)
        case DateTruncOf(_, _, _, _) => newTrunc(truncLevel.get)
        case _ => return None
      }
    }

    // re-apply the WHERE on the serve side (bucket-level: keys re-rooted,
    // aligned ts bounds become bucket_ts bounds) — for the real-time
    // union this also prunes ROLLUP rows outside the range, which the
    // tail's row-level filter cannot do
    val filteredServe: LogicalPlan =
      if (whereConds.isEmpty) servePlan
      else {
        val served = whereConds.map(c => mapCondWith(c, rAttr).getOrElse(return None))
        Filter(served.reduce(And), servePlan)
      }

    Some(Aggregate(newGroupings, newAggExprs, filteredServe))
  }

  private def stripAlias(e: Expression): Expression = e match {
    case Alias(child, _) => child
    case other => other
  }

  /** Extractor for `date_trunc(levelLiteral, ts)` where `ts` is the raw
    * timestamp attribute, possibly behind the NTZ→TZ cast Tables.load
    * inserts.
    */
  private object DateTruncOf {
    def unapply(
        e: Expression): Option[(String, AttributeReference, Expression, Option[String])] =
      e match {
        case TruncTimestamp(Literal(fmt, _), inner @ TsAttr(ts), tz) =>
          Some((fmt.toString, ts, inner, tz))
        case _ => None
      }
  }

  private object TsAttr {
    def unapply(e: Expression): Option[AttributeReference] = e match {
      case a: AttributeReference => Some(a)
      case Cast(a: AttributeReference, t, _, _)
          if t == org.apache.spark.sql.types.TimestampType ||
            t == org.apache.spark.sql.types.TimestampNTZType => Some(a)
      case _ => None
    }
  }
}

/** A [[org.apache.spark.sql.execution.datasources.FileIndex]] view
  * restricted to an explicit leaf-file allowlist, PRESERVING the
  * underlying index's partition schema and values — what the real-time
  * tail aggregate needs on a hive-partitioned raw table. Partition
  * pruning still applies: filters are delegated to the underlying index
  * and the allowlist only subtracts files from whatever survives.
  */
final class FilteredFileIndex(
    underlying: org.apache.spark.sql.execution.datasources.FileIndex,
    keep: Set[String])
    extends org.apache.spark.sql.execution.datasources.FileIndex {
  import org.apache.spark.sql.execution.datasources.PartitionDirectory

  // Normalize through hadoop Path: `inputFiles` (where the allowlist
  // comes from) renders `file:///tmp/…` while the FileStatus paths
  // inside `listFiles` render `file:/tmp/…` — a raw string-set filter
  // silently keeps NOTHING at scan time.
  private val keepNorm: Set[String] =
    keep.map(s => new org.apache.hadoop.fs.Path(s).toString)
  private def kept(p: org.apache.hadoop.fs.Path): Boolean = keepNorm(p.toString)

  override def rootPaths: Seq[org.apache.hadoop.fs.Path] = underlying.rootPaths

  override def listFiles(
      partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] =
    underlying
      .listFiles(partitionFilters, dataFilters)
      .map(pd => PartitionDirectory(pd.values, pd.files.filter(f => kept(f.getPath))))
      .filter(_.files.nonEmpty)

  override def inputFiles: Array[String] =
    underlying.inputFiles.filter(s => keepNorm(new org.apache.hadoop.fs.Path(s).toString))

  override def refresh(): Unit = underlying.refresh()

  // exact: the kept files' bytes (drives the tail side's size estimate —
  // an inherited whole-table figure would block broadcast decisions)
  override lazy val sizeInBytes: Long =
    underlying.listFiles(Nil, Nil).iterator
      .flatMap(_.files)
      .filter(f => kept(f.getPath))
      .map(_.getLen)
      .sum

  override def partitionSchema: org.apache.spark.sql.types.StructType =
    underlying.partitionSchema
}
