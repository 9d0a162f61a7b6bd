package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The custom physical as-of operator (AsOfJoinNode → AsOfJoinStrategy →
  * AsOfJoinExec) against the composed union+window form — identical
  * semantics, one sorted-merge pass.
  */
class AsOfExecSpec extends SparkSpec {

  private lazy val events = Tables.load(spark, sf0001, "events")

  private def clicks = events.where(col("event_type") === "click")
    .select("user_id", "ts", "event_id")
  private def errors = events.where(col("event_type") === "error")
    .select("user_id", "ts", "event_id")

  test("exec output matches the composed window form on the gate data (self-join shape)") {
    val composed = AsOfJoin
      .backward(clicks, errors, Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("asof_event_id"))
    val exec = AsOfJoin
      .backwardExec(clicks, errors, Seq("user_id"), "ts", "event_id", Seq("event_id"))
      .select(col("event_id"), col("user_id"), col("asof_event_id"))
    assert(exec.count() === composed.count())
    assert(exec.exceptAll(composed).isEmpty && composed.exceptAll(exec).isEmpty)
    // non-trivial: some rows matched, some found no prior error
    assert(exec.where(col("asof_event_id").isNotNull).count() > 0)
    assert(exec.where(col("asof_event_id").isNull).count() > 0)
  }

  test("the physical plan contains the custom exec and co-partitioned sorts, no window") {
    val exec = AsOfJoin
      .backwardExec(clicks, errors, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    // SparkPlan.nodeName strips the Exec suffix: the operator prints as
    // "AsOfJoin"; "!" would mark unresolved missing inputs
    val p = exec.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin ") && !p.contains("!AsOfJoin"), p)
    assert(!p.contains("Window"), s"exec path must not fall back to the window form:\n$p")
    assert("Exchange hashpartitioning".r.findAllIn(p).length === 2, s"both sides co-partition:\n$p")
  }

  test("ties at equal timestamps take the right row (<= semantics) with the greatest tie-break") {
    import spark.implicits._
    val l = Seq((1L, 100L, 10L), (1L, 50L, 11L)).toDF("k", "sec", "lid")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("lid").as("tie"))
    val r = Seq((1L, 100L, 1L), (1L, 100L, 2L), (1L, 99L, 3L), (2L, 10L, 4L))
      .toDF("k", "sec", "rid")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("rid").as("tie"))
      .withColumn("rid", col("tie"))
    val out = AsOfJoin.backwardExec(l, r, Seq("k"), "ts", "tie", Seq("rid"))
      .select("tie", "asof_rid").collect().map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toMap
    assert(out(10L) === 2L, "equal-ts rows qualify; tie-break picks the greatest")
    assert(out(11L) === -1L, "no right row at or before ts=50")
  }

  test("merge is correct across many keys and partitions") {
    import spark.implicits._
    // 200 keys interleaved, values at every 10th second; probes between them
    val r = (1L to 2000L).map(i => (i % 200, i * 10, i)).toDF("k", "sec", "rid")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("rid"), col("rid").as("tie"))
    val l = (1L to 999L).map(i => (i % 200, i * 20 + 5, i)).toDF("k", "sec", "lid")
      .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("lid"), col("lid").as("tie"))
    val exec = AsOfJoin.backwardExec(l, r, Seq("k"), "ts", "tie", Seq("rid"))
      .select("lid", "asof_rid")
    val composed = AsOfJoin.backward(l, r, Seq("k"), "ts", "tie", Seq("rid"))
      .select("lid", "asof_rid")
    assert(exec.exceptAll(composed).isEmpty && composed.exceptAll(exec).isEmpty)
    assert(exec.count() === 999L)
  }

  test("tolerance variant agrees between the composed and exec paths") {
    val composed = AsOfJoin.backwardWithTolerance(
      clicks, errors, Seq("user_id"), "ts", "event_id", Seq("event_id"), "6 HOURS")
      .select(col("event_id"), col("asof_event_id"))
    val exec = AsOfJoin.backwardWithToleranceExec(
      clicks, errors, Seq("user_id"), "ts", "event_id", Seq("event_id"), "6 HOURS")
      .select(col("event_id"), col("asof_event_id"))
    assert(exec.exceptAll(composed).isEmpty && composed.exceptAll(exec).isEmpty)
    // the bound must actually null something relative to the unbounded form
    val unbounded = AsOfJoin.backwardExec(
      clicks, errors, Seq("user_id"), "ts", "event_id", Seq("event_id"))
    assert(exec.where(col("asof_event_id").isNotNull).count() <
      unbounded.where(col("asof_event_id").isNotNull).count())
  }

  test("GraftExtensions injects the strategy: the node plans in an extensions-built session") {
    import org.apache.spark.sql.SparkSession
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      import s2.implicits._
      val l = Seq((1L, 100L, 10L)).toDF("k", "sec", "lid")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("lid"), col("lid").as("tie"))
      val r = Seq((1L, 90L, 7L)).toDF("k", "sec", "rid")
        .select(col("k"), timestamp_seconds(col("sec")).as("ts"), col("rid"), col("rid").as("tie"))
      // bypass install(): the strategy must come from the extension wiring
      val lp = l.queryExecution.analyzed
      val rFresh = r.select(r.columns.map(c => r(c).as(c)).toSeq: _*)
      val rp = rFresh.queryExecution.analyzed
      def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
        p.output.find(_.name == n).get
      val valOut = Seq(org.apache.spark.sql.catalyst.expressions.AttributeReference(
        "asof_rid", attr(rp, "rid").dataType, nullable = true)())
      val node = graft.plans.AsOfJoinNode(lp, rp,
        Seq(attr(lp, "k")), Seq(attr(rp, "k")),
        attr(lp, "ts"), attr(rp, "ts"), attr(rp, "tie"),
        Seq(attr(rp, "rid")), valOut)
      val df = org.apache.spark.sql.GraftSql.ofRows(s2, node)
      assert(df.queryExecution.executedPlan.toString.contains("AsOfJoin "))
      val row = df.select("lid", "asof_rid").head()
      assert(row.getLong(0) === 10L && row.getLong(1) === 7L)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("a non-long-backed ts column fails fast instead of comparing garbage") {
    import spark.implicits._
    // DateType is int-backed: row.getLong over it would read garbage, so
    // node construction must reject it at analysis time
    val l = Seq((1L, "2024-01-02", 10L)).toDF("k", "d", "lid")
      .select(col("k"), to_date(col("d")).as("ts"), col("lid"), col("lid").as("tie"))
    val r = Seq((1L, "2024-01-01", 7L)).toDF("k", "d", "rid")
      .select(col("k"), to_date(col("d")).as("ts"), col("rid"), col("rid").as("tie"))
    val ex = intercept[IllegalArgumentException] {
      graft.operators.AsOfJoin.backwardExec(l, r, Seq("k"), "ts", "tie", Seq("rid"))
    }
    assert(ex.getMessage.contains("must be timestamp"), ex.getMessage)
  }
}
