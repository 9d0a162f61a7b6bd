package graft

import java.sql.Timestamp

import graft.poll.IncrementalPoller
import graft.poll.IncrementalPoller.Offset

/** R3-R4 + D3: lexicographic offsets, resume, persistence (FIXTURES.md §A4). */
class PollerSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  // ids 1..10; ids 6 and 7 share the same ts (the straddling pair)
  private def log = Seq(
    (ts("2025-01-01T00:00:01Z"), 1L), (ts("2025-01-01T00:00:02Z"), 2L),
    (ts("2025-01-01T00:00:03Z"), 3L), (ts("2025-01-01T00:00:04Z"), 4L),
    (ts("2025-01-01T00:00:05Z"), 5L), (ts("2025-01-01T00:00:06Z"), 6L),
    (ts("2025-01-01T00:00:06Z"), 7L), (ts("2025-01-01T00:00:08Z"), 8L),
    (ts("2025-01-01T00:00:09Z"), 9L), (ts("2025-01-01T00:00:10Z"), 10L)
  ).toDF("ts", "event_id")

  test("poll after a mid-duplicate-ts checkpoint returns exactly the tail") {
    // checkpoint after id=6: offset (00:06, 6); id=7 shares the ts
    val got = IncrementalPoller.poll(log, Offset(ts("2025-01-01T00:00:06Z"), 6L))
      .select("event_id").as[Long].collect().toSeq
    assert(got == Seq(7L, 8L, 9L, 10L))
  }

  test("null ts / null event_id rows are skipped, never wedge the poll (validate.non.null=false parity)") {
    // the reference disables non-null validation (connector.json:10), so
    // nullable offset columns are legal in the source; rows that cannot
    // form an offset must be silently skipped — not delivered, not
    // allowed to NPE nextOffset, not blocking later rows
    val dirty = Seq(
      (ts("2025-01-01T00:00:01Z"), Option(1L)),
      (null.asInstanceOf[Timestamp], Option(2L)), // null ts
      (ts("2025-01-01T00:00:03Z"), Option.empty[Long]), // null event_id
      (ts("2025-01-01T00:00:04Z"), Option(4L))
    ).toDF("ts", "event_id")
    val off = Offset(ts("2025-01-01T00:00:00Z"), 0L)
    val batch = IncrementalPoller.poll(dirty, off)
    assert(batch.select("event_id").as[Option[Long]].collect().toSeq == Seq(Some(1L), Some(4L)))
    // the advanced offset comes from the clean max row, and a re-poll
    // from it drains clean
    val next = IncrementalPoller.nextOffset(batch, off)
    assert(next == Offset(ts("2025-01-01T00:00:04Z"), 4L))
    assert(IncrementalPoller.poll(dirty, next).count() == 0L)
  }

  test("custom timestamp/incrementing column names (connector.json:8-9)") {
    // the connector names its offset columns explicitly because source
    // tables vary; the poller accepts the same two knobs
    val renamed = log.withColumnRenamed("ts", "committed_at")
      .withColumnRenamed("event_id", "seq_no")
    val off = Offset(ts("2025-01-01T00:00:06Z"), 6L)
    val batch = IncrementalPoller.poll(
      renamed, off, tsCol = "committed_at", idCol = "seq_no")
    assert(batch.select("seq_no").as[Long].collect().toSeq == Seq(7L, 8L, 9L, 10L))
    val next = IncrementalPoller.nextOffset(batch, off, tsCol = "committed_at", idCol = "seq_no")
    assert(next == Offset(ts("2025-01-01T00:00:10Z"), 10L))
  }

  test("initial offset (start.timestamp semantics) fetches everything after it") {
    val got = IncrementalPoller.poll(log, Offset.initial("2025-01-01T00:00:00Z"))
    assert(got.count() == 10)
  }

  test("nextOffset advances to the lexicographic max of the batch") {
    val batch = IncrementalPoller.poll(log, Offset.initial("2025-01-01T00:00:00Z"))
    val next = IncrementalPoller.nextOffset(batch, Offset.initial("2025-01-01T00:00:00Z"))
    assert(next == Offset(ts("2025-01-01T00:00:10Z"), 10L))
  }

  test("nextOffset on an empty batch keeps the current offset") {
    val cur = Offset(ts("2025-01-01T00:00:10Z"), 10L)
    val next = IncrementalPoller.nextOffset(log.where($"event_id" > 100), cur)
    assert(next == cur)
  }

  test("repeated poll from the committed offset loses nothing and reorders nothing") {
    var off = Offset.initial("2025-01-01T00:00:00Z")
    val seen = scala.collection.mutable.ArrayBuffer[Long]()
    (0 until 4).foreach { _ =>
      val batch = IncrementalPoller.poll(log, off).limit(3)
      seen ++= batch.select("event_id").as[Long].collect()
      off = IncrementalPoller.nextOffset(batch, off)
    }
    assert(seen.toSeq == (1L to 10L))
  }

  test("timestamp.delay guard excludes rows inside the delay window") {
    import org.apache.spark.sql.functions.{lit, to_timestamp}
    val now = to_timestamp(lit("2025-01-01 00:00:10"))
    val got = IncrementalPoller.poll(
      log, Offset.initial("2025-01-01T00:00:00Z"),
      delay = Some("3 SECONDS"), now = now)
      .select("event_id").as[Long].collect().toSeq
    // rows with ts >= 00:00:07 are inside the delay window → excluded
    assert(got == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("PollRunner delivers per-relation batches and advances offsets across cycles") {
    val dir = tempDir("pollrunner")
    val delivered = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val runner = new graft.poll.PollRunner(
      spark, dir, Offset.initial("2025-01-01T00:00:00Z"))

    val firstSix = log.where($"event_id" <= 6)
    val r1 = runner.pollOnce(Map("event_log_a" -> firstSix)) {
      (name, batch) => delivered(name) += batch.count()
    }
    assert(r1 == Map("event_log_a" -> 6L))

    // second cycle over the full relation: only the tail is new
    val r2 = runner.pollOnce(Map("event_log_a" -> log)) {
      (name, batch) => delivered(name) += batch.count()
    }
    assert(r2 == Map("event_log_a" -> 4L))
    assert(delivered("event_log_a") == 10L)

    // third cycle: nothing new, no delivery, offset unchanged
    val r3 = runner.pollOnce(Map("event_log_a" -> log))((_, _) => fail("no delivery expected"))
    assert(r3 == Map("event_log_a" -> 0L))
  }

  test("offset persistence round-trips through the checkpoint file") {
    val dir = tempDir("offsets")
    val off = Offset(ts("2025-01-01T00:00:06Z"), 6L)
    IncrementalPoller.commitOffset(spark, dir, "event_log_assets", off)
    val loaded = IncrementalPoller.loadOffset(spark, dir, "event_log_assets",
      Offset.initial("2020-01-01T00:00:00Z"))
    assert(loaded == off)
    val fallback = IncrementalPoller.loadOffset(spark, dir, "missing_relation",
      Offset.initial("2020-01-01T00:00:00Z"))
    assert(fallback == Offset.initial("2020-01-01T00:00:00Z"))
  }
}
