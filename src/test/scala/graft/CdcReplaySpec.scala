package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.capture.CdcCapture

/** The fundamental CDC invariant (reference readme.md:218 "reconstruct full
  * change histories"): replaying the captured log over the previous
  * snapshot reconstructs the current snapshot exactly — for ANY sequence of
  * inserts/updates/deletes. Property-based over seeded random mutation
  * scripts (deterministic; plain scalacheck-style generation without the
  * scalatestplus bridge, which is not in the offline dependency set).
  */
class CdcReplaySpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2025-06-14T00:00:00Z"))

  private def applyScript(init: Map[Int, String], script: Seq[(String, Int, String)]): Map[Int, String] =
    script.foldLeft(init) {
      case (m, ("ins", k, v)) => m + (k -> v)
      case (m, ("upd", k, v)) => if (m.contains(k)) m + (k -> v) else m
      case (m, ("del", k, _)) => m - k
      case (m, _)             => m
    }

  private def toDf(m: Map[Int, String]): DataFrame =
    if (m.isEmpty) Seq.empty[(Int, String)].toDF("id", "v")
    else m.toSeq.toDF("id", "v")

  private def get(json: String, field: String): String = {
    val pat = ("\"" + field + "\"\\s*:\\s*\"?([^,}\"]*)\"?").r
    pat.findFirstMatchIn(json).map(_.group(1)).getOrElse(sys.error(s"no $field in $json"))
  }

  /** Replay captured events over prev: apply after-images for
    * INSERT/UPDATE, drop keys for DELETE.
    */
  private def replay(prev: Map[Int, String], events: DataFrame): Map[Int, String] = {
    val evs = events.select("operation", "before", "after").collect().map { r =>
      (r.getAs[String]("operation"), Option(r.getAs[String]("before")), Option(r.getAs[String]("after")))
    }
    evs.foldLeft(prev) {
      case (m, ("INSERT", _, Some(after)))  => m + (get(after, "id").toInt -> get(after, "v"))
      case (m, ("UPDATE", _, Some(after)))  => m + (get(after, "id").toInt -> get(after, "v"))
      case (m, ("DELETE", Some(before), _)) => m - get(before, "id").toInt
      case (m, _)                           => m
    }
  }

  test("replaying the captured log reconstructs the final snapshot (15 seeded runs)") {
    val rnd = new scala.util.Random(42)
    def word() = (0 until 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 15).foreach { _ =>
      val init = (0 until rnd.nextInt(10)).map(_ => rnd.nextInt(16) -> word()).toMap
      val script = (0 until 12).map { _ =>
        (Seq("ins", "upd", "del")(rnd.nextInt(3)), rnd.nextInt(16), word())
      }
      val fin = applyScript(init, script)
      val events = CdcCapture.capture(toDf(init), toDf(fin), Seq("id"), "s", "t", lit(t0))
      val rebuilt = replay(init, events)
      assert(rebuilt == fin, s"init=$init script=$script")
    }
  }

  test("distributed CdcApply.applyLog reconstructs the final snapshot (capture ∘ apply = identity)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val rnd = new scala.util.Random(7)
    def word() = (0 until 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 5).foreach { _ =>
      val init = (0 until rnd.nextInt(12)).map(_ => rnd.nextInt(16) -> word()).toMap
      val script = (0 until 10).map { _ =>
        (Seq("ins", "upd", "del")(rnd.nextInt(3)), rnd.nextInt(16), word())
      }
      val fin = applyScript(init, script)
      val events = CdcCapture.assignIds(
        CdcCapture.capture(toDf(init), toDf(fin), Seq("id"), "s", "t", lit(t0)), 0L)
      val rebuilt = graft.capture.CdcApply
        .applyLog(toDf(init), events, Seq("id"), schema)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(rebuilt == fin, s"init=$init script=$script")
    }
  }

  test("stateAsOf reconstructs intermediate states (time travel over the log)") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val s0 = Map(1 -> "a", 2 -> "b")
    val s1 = Map(1 -> "a2", 2 -> "b", 3 -> "c") // upd 1, ins 3
    val s2 = Map(1 -> "a2", 3 -> "c2")          // del 2, upd 3
    val log01 = CdcCapture.assignIds(
      CdcCapture.capture(toDf(s0), toDf(s1), Seq("id"), "s", "t", lit(t0)), 0L)
    val maxId1 = log01.agg(org.apache.spark.sql.functions.max("event_id")).head().getLong(0)
    val log12 = CdcCapture.assignIds(
      CdcCapture.capture(toDf(s1), toDf(s2), Seq("id"), "s", "t", lit(t0)), maxId1)
    val log = log01.unionByName(log12)
    def state(asOf: Long) = graft.capture.CdcApply
      .stateAsOf(toDf(s0), log, Seq("id"), schema, asOf)
      .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(state(0L) == s0)
    assert(state(maxId1) == s1)
    assert(state(Long.MaxValue) == s2)
  }

  test("scd2History: version intervals chain per key and current rows equal applyLog") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("id", IntegerType), StructField("v", StringType)))
    val rnd = new scala.util.Random(11)
    def word() = (0 until 4).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    (0 until 5).foreach { run =>
      val s0 = (0 until rnd.nextInt(12)).map(_ => rnd.nextInt(16) -> word()).toMap
      // three capture phases so keys accumulate multi-version chains
      val states = Iterator.iterate(s0) { st =>
        applyScript(st, (0 until 6).map(_ =>
          (Seq("ins", "upd", "del")(rnd.nextInt(3)), rnd.nextInt(16), word())))
      }.take(4).toSeq
      val log = states.sliding(2).zipWithIndex.map { case (pair, i) =>
        CdcCapture.assignIds(
          CdcCapture.capture(toDf(pair.head), toDf(pair.last), Seq("id"), "s", "t", lit(t0)),
          base = i * 1000L)
      }.reduceLeft(_ unionByName _)
      val hist = graft.capture.CdcApply
        .scd2History(toDf(s0), log, Seq("id"), schema)
        .select("id", "v", "valid_from_id", "valid_to_id", "is_current")
        .collect()
      // the open (is_current) versions ARE the applied state
      val cur = hist.filter(_.getInt(4) == 1).map(r => r.getInt(0) -> r.getString(1)).toMap
      val applied = graft.capture.CdcApply
        .applyLog(toDf(s0), log, Seq("id"), schema)
        .collect().map(r => r.getInt(0) -> r.getString(1)).toMap
      assert(cur == applied, s"run=$run s0=$s0")
      // per key: versions sorted by valid_from (seed first) close strictly
      // before the successor opens, and at most one version stays open
      hist.groupBy(_.getInt(0)).foreach { case (id, vs) =>
        val sorted = vs.sortBy(r => if (r.isNullAt(2)) Long.MinValue else r.getLong(2))
        sorted.init.zip(sorted.tail).foreach { case (a, b) =>
          assert(!a.isNullAt(3), s"run=$run id=$id: non-final version left open")
          assert(a.getLong(3) <= b.getLong(2), s"run=$run id=$id: versions overlap")
        }
        assert(sorted.count(_.isNullAt(3)) <= 1, s"run=$run id=$id: two open versions")
      }
    }
  }

  test("capture of identical snapshots is empty") {
    val m = Map(1 -> "a", 2 -> "b")
    assert(CdcCapture.capture(toDf(m), toDf(m), Seq("id"), "s", "t", lit(t0)).count() == 0)
  }

  test("at-least-once redelivery + event_id dedup is idempotent under replay") {
    val init = Map(1 -> "a", 2 -> "b", 3 -> "c")
    val fin = Map(1 -> "a2", 3 -> "c", 4 -> "d")
    val events = CdcCapture.assignIds(
      CdcCapture.capture(toDf(init), toDf(fin), Seq("id"), "s", "t", lit(t0)), 0L)
    val redelivered = graft.log.CdcLog.dedup(events.union(events))
    assert(replay(init, redelivered) == fin)
  }
}
