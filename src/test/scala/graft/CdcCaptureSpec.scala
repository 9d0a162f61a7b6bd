package graft

import org.apache.spark.sql.functions._

import graft.capture.CdcCapture
import graft.model.ChangeEvent

/** C1-C6 unit tests on the reference-faithful `assets` fixture
  * (FIXTURES.md §A1; reference timescale/init.sql:90-103).
  */
class CdcCaptureSpec extends SparkSpec {
  import spark.implicits._

  private val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2025-06-14T00:00:00Z"))

  private def assets = Seq(
    (1, "Water Pump", "WP001", t0, t0),
    (2, "Steam Trap", "STM002", t0, t0),
    (3, "Compressor", "CMP003", t0, t0)
  ).toDF("id", "name", "serialnumber", "created_at", "updated_at")

  // mutation script (FIXTURES.md A1): insert id=4, rename id=2, delete id=3
  private def assetsAfter = Seq(
    (1, "Water Pump", "WP001", t0, t0),
    (2, "Steam Trap XL", "STM002", t0, t0),
    (4, "Boiler", "BLR004", t0, t0)
  ).toDF("id", "name", "serialnumber", "created_at", "updated_at")

  private def captured = CdcCapture
    .capture(assets, assetsAfter, Seq("id"), "dataschema", "assets", lit(t0))

  test("classifies INSERT/UPDATE/DELETE and suppresses no-ops") {
    val ops = captured.select("operation").as[String].collect().sorted
    assert(ops.toSeq == Seq("DELETE", "INSERT", "UPDATE")) // id=1 unchanged → nothing
  }

  test("nullability contract: before null iff INSERT, after null iff DELETE") {
    val rows = captured.collect()
    rows.foreach { r =>
      val op = r.getAs[String]("operation")
      val before = Option(r.getAs[String]("before"))
      val after = Option(r.getAs[String]("after"))
      op match {
        case ChangeEvent.Insert => assert(before.isEmpty && after.nonEmpty)
        case ChangeEvent.Delete => assert(before.nonEmpty && after.isEmpty)
        case ChangeEvent.Update => assert(before.nonEmpty && after.nonEmpty)
      }
    }
  }

  test("row snapshots carry the full row as JSON (compared structurally)") {
    val upd = captured.where($"operation" === "UPDATE").head()
    def parse(s: String): Map[String, String] = {
      val m = spark.range(1).select(
        from_json(lit(s), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.StringType)).as("m")
      ).head().getAs[Map[String, String]]("m")
      m
    }
    val before = parse(upd.getAs[String]("before"))
    val after = parse(upd.getAs[String]("after"))
    assert(before("id") == "2" && before("name") == "Steam Trap")
    assert(after("id") == "2" && after("name") == "Steam Trap XL")
    assert(before.keySet == Set("id", "name", "serialnumber", "created_at", "updated_at"))
  }

  test("empty prev snapshot => all INSERTs") {
    val events = CdcCapture.capture(
      assets.where(lit(false)), assets, Seq("id"), "dataschema", "assets", lit(t0))
    assert(events.groupBy("operation").count().as[(String, Long)].collect().toMap
      == Map("INSERT" -> 3L))
  }

  test("assignIds is monotone, contiguous above base, and deterministic") {
    val ids = CdcCapture.assignIds(captured, base = 100L)
      .orderBy("event_id").select("event_id").as[Long].collect()
    assert(ids.toSeq == Seq(101L, 102L, 103L))
  }

  test("assignIdsDistributed matches assignIds on the same order columns") {
    val ev = Tables.load(spark, sf0001, "events").select("event_id", "ts").limit(200)
    val a = CdcCapture.assignIds(
      ev.withColumnRenamed("event_id", "orig"), 0L, Seq("ts", "orig"))
      .select($"orig", $"event_id").as[(Long, Long)].collect().toMap
    val b = CdcCapture.assignIdsDistributed(
      ev.withColumnRenamed("event_id", "orig"), 0L, Seq("ts", "orig"))
      .select($"orig", $"event_id").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("bucketed snapshot capture: exchange-free diff, identical events") {
    val ev = Tables.load(spark, sf0001, "events")
      .select("event_id", "user_id", "event_type", "value")
    // mutate: drop every 7th row (DELETEs), bump values on every 5th
    // (UPDATEs), and add fresh ids (INSERTs)
    val cur = ev.where($"event_id" % 7 =!= 0)
      .withColumn("value",
        when($"event_id" % 5 === 0, $"value" * 2).otherwise($"value"))
      .unionByName(ev.limit(10).withColumn("event_id", $"event_id" + 1000000L))
    val base = tempDir("capbucket")
    CdcCapture.writeSnapshotBucketed(ev, "capb_prev", s"$base/prev", Seq("event_id"), 8)
    CdcCapture.writeSnapshotBucketed(cur, "capb_cur", s"$base/cur", Seq("event_id"), 8)
    val bucketed = CdcCapture.captureBucketed(
      spark, "capb_prev", "capb_cur", Seq("event_id"), "s", "t", lit(t0))
    // the whole point: both snapshots co-partition on the PK buckets, so
    // the full-outer diff runs with NO Exchange on either side
    val plan = bucketed.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"bucketed capture diff still shuffles:\n$plan")
    assert(plan.contains("SortMergeJoin"), "expected a bucket-merge diff join")
    val got = bucketed
      .select("operation", "before", "after").as[(String, String, String)]
      .collect().toSet
    val want = CdcCapture.capture(ev, cur, Seq("event_id"), "s", "t", lit(t0))
      .select("operation", "before", "after").as[(String, String, String)]
      .collect().toSet
    assert(got === want, "bucketed capture diverged from the plain diff")
    assert(got.nonEmpty && got.exists(_._1 == "DELETE") && got.exists(_._1 == "INSERT"))
    // snapshot-replacement semantics: re-writing the table swaps content
    CdcCapture.writeSnapshotBucketed(cur, "capb_prev", s"$base/prev2", Seq("event_id"), 8)
    assert(CdcCapture.captureBucketed(
      spark, "capb_prev", "capb_cur", Seq("event_id"), "s", "t", lit(t0)).count() === 0L)
  }
}
