package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of join: for each left row, the latest right row with the same key
  * and `rightTs <= leftTs` (backward-looking point-in-time join — the
  * operator relational engines ship natively and Spark lacks).
  *
  * Implementation is the merge layout, not a point-in-time self-join:
  * union both sides tagged, one window pass partitioned by key and ordered
  * by (ts, side, tiebreak), carry the last right value forward with
  * `last(..., ignoreNulls)`. One shuffle on the key, linear in rows —
  * versus the range-join form whose candidate pairs are quadratic per key.
  * At equal timestamps the right side sorts first, giving `<=` semantics
  * (DuckDB's ASOF JOIN agrees — see the q_asof_join oracle).
  *
  * Two implementations, both gate-checked against the same DuckDB ASOF
  * JOIN oracle:
  *   - [[backward]] composes from built-ins (preference (a) of the
  *     custom-operator order): union + one window pass.
  *   - [[backwardExec]] runs the custom physical operator
  *     ([[graft.plans.AsOfJoinExec]], preference (c)): each side shuffles
  *     independently (left rows never carry right payload through their
  *     shuffle), and a single sorted-merge pass holds O(1) state instead
  *     of window frames — the shape to prefer as the right side widens.
  */
object AsOfJoin {

  /** @param left      rows to enrich
    * @param right     rows to look up (point-in-time)
    * @param keys      equi-join key columns (same names both sides)
    * @param tsCol     event-time column name (same both sides)
    * @param tieCol    deterministic tie-break column (same both sides)
    * @param rightVals right columns to carry onto left rows, renamed
    *                  `asof_<name>`
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      rightVals: Seq[String]
  ): DataFrame = {
    val leftCols = left.columns.toSeq
    val common = keys :+ tsCol :+ tieCol
    val l = left.withColumn("__side", lit(1))
    // a null-ts right row can never satisfy `rts <= lts` (SQL ASOF
    // semantics, the DuckDB oracle, and AsOfJoinExec agree) — without
    // this filter the NULLS FIRST sort would carry it as a match for
    // every left row of its key
    val r = right
      .where(col(tsCol).isNotNull)
      .select(common.map(col) ++ rightVals.map(c => col(c).as(s"__rv_$c")): _*)
      .withColumn("__side", lit(0))
    // union with null-fill: left rows carry null __rv_*, right rows carry
    // null for left-only columns
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window
      .partitionBy(keys.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc, col(tieCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { case (df, c) =>
      df.withColumn(
        s"asof_$c",
        last(when(col("__side") === 0, col(s"__rv_$c")), ignoreNulls = true).over(w)
      )
    }
    carried
      .where(col("__side") === 1)
      .select(leftCols.map(col) ++ rightVals.map(c => col(s"asof_$c")): _*)
  }

  /** [[backward]] through the custom physical operator
    * ([[graft.plans.AsOfJoinExec]]): identical output contract — left
    * columns plus `asof_<name>` carried values — via a single
    * co-partitioned sorted-merge pass instead of the union + window
    * composition. The right side never rides through the left's shuffle
    * and the merge holds O(1) state, which is what the exec buys at
    * 100 TB; see the plan scaladoc for the full rationale.
    *
    * Installs [[graft.plans.AsOfJoinStrategy]] on the session
    * (idempotent) so the node plans in sessions that didn't register
    * [[graft.functions.GraftExtensions]].
    */
  def backwardExec(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      rightVals: Seq[String]
  ): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.AttributeReference
    val spark = left.sparkSession
    graft.plans.AsOfJoinStrategy.install(spark)
    // re-alias every right column: fresh expression ids, so a self-join
    // (both sides from one table — the common as-of shape) presents
    // disjoint outputs without relying on analyzer deduplication
    val rightFresh = right.select(right.columns.map(c => right(c).as(c)).toSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = rightFresh.queryExecution.analyzed
    // resolve with the session's resolver (case-insensitive by default,
    // like every other column lookup) and refuse ambiguity — a silent
    // first-match on duplicate names would join on the wrong attribute
    val resolver = spark.sessionState.analyzer.resolver
    def attr(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, name: String) =
      plan.output.filter(a => resolver(a.name, name)) match {
        case Seq(one) => one
        case Seq() =>
          throw new IllegalArgumentException(
            s"column $name not found in ${plan.output.map(_.name)}")
        case many =>
          throw new IllegalArgumentException(
            s"column $name is ambiguous: ${many.map(_.name)}")
      }
    val valAttrs = rightVals.map(attr(rp, _))
    val valOut = valAttrs.map(a =>
      AttributeReference(s"asof_${a.name}", a.dataType, nullable = true)())
    val node = graft.plans.AsOfJoinNode(
      lp, rp,
      keys.map(attr(lp, _)), keys.map(attr(rp, _)),
      attr(lp, tsCol), attr(rp, tsCol), attr(rp, tieCol),
      valAttrs, valOut)
    org.apache.spark.sql.GraftSql.ofRows(spark, node)
  }

  /** Backward as-of with a tolerance: matches older than `tolerance`
    * before the left ts are nulled out (the "staleness bound" variant).
    */
  def backwardWithTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      rightVals: Seq[String],
      tolerance: String
  ): DataFrame =
    toleranced(backward)(left, right, keys, tsCol, tieCol, rightVals, tolerance)

  /** [[backwardWithTolerance]] over the custom physical operator path
    * ([[backwardExec]]) — same staleness-bound contract.
    */
  def backwardWithToleranceExec(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      rightVals: Seq[String],
      tolerance: String
  ): DataFrame =
    toleranced(backwardExec)(left, right, keys, tsCol, tieCol, rightVals, tolerance)

  private def toleranced(
      base: (DataFrame, DataFrame, Seq[String], String, String, Seq[String]) => DataFrame
  )(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      tsCol: String,
      tieCol: String,
      rightVals: Seq[String],
      tolerance: String
  ): DataFrame = {
    val withTs = base(
      left, right.withColumn("__rts", col(tsCol)), keys, tsCol, tieCol, rightVals :+ "__rts")
    val bound: Column = col(tsCol) - expr(s"INTERVAL $tolerance")
    rightVals
      .foldLeft(withTs) { case (df, c) =>
        df.withColumn(s"asof_$c", when(col("asof___rts") >= bound, col(s"asof_$c")))
      }
      .drop("asof___rts")
  }
}
