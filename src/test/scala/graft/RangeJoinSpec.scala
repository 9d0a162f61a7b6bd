package graft

import org.apache.spark.sql.functions._

import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSpec {

  private def mkEvents(rows: Seq[(Long, Long, Long)]) = {
    import spark.implicits._
    rows
      .toDF("user_id", "sec", "event_id")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"), col("event_id"))
  }

  test("bucketed range join matches the naive range predicate exactly") {
    // gaps chosen to land on every boundary case: same bucket, adjacent
    // bucket, exactly == window (inclusive), window+1 (excluded), equal
    // timestamps (strict > excludes), different users (never paired)
    val ev = mkEvents(Seq(
      (1L, 100L, 1L), (1L, 150L, 2L), (1L, 160L, 3L),   // within one bucket
      (1L, 100L + 3600L, 4L),                            // exactly window after id1
      (1L, 100L + 3601L, 5L),                            // window+1 after id1
      (1L, 150L, 6L),                                    // ties id2's ts exactly
      (2L, 120L, 7L), (2L, 3000L, 8L),                   // other user
      (3L, 50L, 9L)                                      // singleton user
    ))
    val got = RangeJoin
      .within(ev, ev, Seq("user_id"), "ts", "ts", windowMicros = 3600L * 1000000L)
      .select(col("a_event_id").as("ida"), col("b_event_id").as("idb"))

    val l = ev.select(col("user_id"), col("ts").as("lts"), col("event_id").as("ida"))
    val r = ev.select(col("user_id"), col("ts").as("rts"), col("event_id").as("idb"))
    val naive = l.join(r, "user_id")
      .where(unix_micros(col("rts")) > unix_micros(col("lts")) &&
        unix_micros(col("rts")) <= unix_micros(col("lts")) + 3600L * 1000000L)
      .select("ida", "idb")

    val g = got.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val n = naive.collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(g === n)
    // the boundary semantics themselves, pinned
    assert(g.contains((1L, 4L)), "== window must be included")
    assert(!g.contains((1L, 5L)), "window+1 must be excluded")
    assert(!g.contains((2L, 6L)) && !g.contains((6L, 2L)), "equal timestamps are excluded (strict >)")
    assert(g.contains((7L, 8L)), "2880s gap is inside the 3600s window — adjacent-bucket probe must find it")
  }

  test("cross-user pairs never appear and each in-window pair appears exactly once") {
    val ev = mkEvents((1L to 40L).map(i => (i % 4, i * 500L, i)))
    val got = RangeJoin
      .within(ev, ev, Seq("user_id"), "ts", "ts", windowMicros = 3600L * 1000000L)
    val rows = got.select("user_id", "a_event_id", "b_event_id").collect()
    val pairs = rows.map(r => (r.getLong(1), r.getLong(2)))
    assert(pairs.length === pairs.distinct.length, "bucket probing must not duplicate pairs")
    // ids share a user iff id % 4 matches — the join key must hold
    assert(pairs.forall { case (a, b) => a % 4 == b % 4 })
  }

  test("the plan is an equi-join: no nested loop, no cartesian") {
    val ev = mkEvents(Seq((1L, 100L, 1L), (1L, 200L, 2L)))
    val p = RangeJoin
      .within(ev, ev, Seq("user_id"), "ts", "ts", windowMicros = 60L * 1000000L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
  }

  private def naiveRangeJoin(n: Int) = {
    import spark.implicits._
    val ev = (1L to n.toLong).map(i => (i, i * 700L * 1000000L)).toDF("event_id", "us")
    val l = ev.select(col("event_id").as("ida"), col("us").as("us_a"))
    val r = ev.select(col("event_id").as("idb"), col("us").as("us_b"))
    l.join(r, col("us_b") > col("us_a") && col("us_b") <= col("us_a") + 3600L * 1000000L)
  }

  test("RangeJoinRewrite turns an equi-keyless interval join into a bucketed equi-join") {
    graft.plans.RangeJoinRewrite.install(spark)
    val joined = naiveRangeJoin(40)
    val p = joined.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"rewrite did not fire:\n$p")
    // correctness: 700s gaps, 3600s window => each row pairs with the next 5
    val got = joined.select("ida", "idb").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for { a <- 1L to 40L; b <- a + 1 to math.min(a + 5, 40L) } yield (a, b)).toSet
    assert(got === want)
  }

  test("GraftExtensions wires the functions AND the range-join rule into a fresh session") {
    import org.apache.spark.sql.SparkSession
    val shared = spark // force the shared session first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate() // fresh session over the same SparkContext
      // injected function resolves by name
      val cos = s2.sql(
        "SELECT cosine_similarity(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT))) AS c"
      ).head().getDouble(0)
      assert(math.abs(cos - 1.0) < 1e-12)
      // injected optimizer rule fires without any install() call
      import s2.implicits._
      val ev = (1L to 30L).map(i => (i, i * 700L * 1000000L)).toDF("event_id", "us")
      val l = ev.select(col("event_id").as("ida"), col("us").as("us_a"))
      val r = ev.select(col("event_id").as("idb"), col("us").as("us_b"))
      val j = l.join(r, col("us_b") > col("us_a") && col("us_b") <= col("us_a") + 3600L * 1000000L)
      val p = j.queryExecution.executedPlan.toString
      assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
      val got = j.select("ida", "idb").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
      val want = (for { a <- 1L to 30L; b <- a + 1 to math.min(a + 5, 30L) } yield (a, b)).toSet
      assert(got === want)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }

  test("RangeJoinRewrite leaves equi-keyed joins alone") {
    graft.plans.RangeJoinRewrite.install(spark)
    import spark.implicits._
    val ev = (1L to 20L).map(i => (i % 3, i, i * 1000000L)).toDF("k", "event_id", "us")
    val l = ev.select(col("k"), col("event_id").as("ida"), col("us").as("us_a"))
    val r = ev.select(col("k").as("k2"), col("event_id").as("idb"), col("us").as("us_b"))
    val j = l.join(r, col("k") === col("k2") && col("us_b") > col("us_a") &&
      col("us_b") <= col("us_a") + 5L * 1000000L)
    val optimized = j.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("__graft_bucket"), s"rule fired on an equi-keyed join:\n$optimized")
    // and the result is still right
    val got = j.select("ida", "idb").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for {
      a <- 1L to 20L; b <- 1L to 20L
      if a % 3 == b % 3 && b * 1000000L > a * 1000000L && b * 1000000L <= a * 1000000L + 5000000L
    } yield (a, b)).toSet
    assert(got === want)
  }

  test("a same-side equality does not suppress the rewrite") {
    graft.plans.RangeJoinRewrite.install(spark)
    import spark.implicits._
    // a.x = a.y is a FILTER, not a join key — the join still has no
    // cross-side equi key, so the interval rewrite must fire
    val ev = (1L to 30L).map(i => (i, i, i * 700L * 1000000L)).toDF("x", "event_id", "us")
    val l = ev.select(col("x"), col("event_id").as("ida"), col("us").as("us_a"))
    val r = ev.select(col("event_id").as("idb"), col("us").as("us_b"))
    val j = l.join(r, col("x") === col("ida") && col("us_b") > col("us_a") &&
      col("us_b") <= col("us_a") + 3600L * 1000000L)
    val p = j.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"same-side equality suppressed the rewrite:\n$p")
    val got = j.select("ida", "idb").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val want = (for { a <- 1L to 30L; b <- a + 1 to math.min(a + 5, 30L) } yield (a, b)).toSet
    assert(got === want)
  }
}
