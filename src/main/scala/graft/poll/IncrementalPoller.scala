package graft.poll

import java.nio.charset.StandardCharsets
import java.sql.Timestamp

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}

/** Lexicographic (ts, event_id) incremental polling — the engine's owned
  * implementation of the Aiven JDBC connector's `timestamp+incrementing`
  * mode (reference connectors/cdc-timescale-connector.json:9-15; behavior
  * described reference readme.md:42,54).
  *
  * The poll predicate is strictly-after in lexicographic order:
  * `ts > :t OR (ts = :t AND event_id > :i)`. Combined with the log's
  * event_date partitioning, the `ts > :t` disjunct prunes all partitions
  * before the offset date — the Spark analogue of the connector's btree
  * index scan + Timescale chunk exclusion.
  *
  * Delivery is at-least-once (SURVEY.md §2.4 D4): a crash between emitting
  * a batch and committing its offset re-emits the batch; consumers dedup on
  * `event_id` (CdcLog.dedup).
  */
object IncrementalPoller {

  /** A committed poll position. Initial value mirrors the connector's
    * `start.timestamp = 2025-01-01T00:00:00Z` semantic: everything strictly
    * after (initialTs, 0) is fetched on the first poll (reference
    * connector.json:13).
    */
  final case class Offset(ts: Timestamp, eventId: Long) {
    def lexLessThan(o: Offset): Boolean =
      ts.before(o.ts) || (ts.equals(o.ts) && eventId < o.eventId)
  }

  object Offset {
    def initial(isoTs: String): Offset =
      Offset(Timestamp.from(java.time.Instant.parse(isoTs)), 0L)
  }

  /** The incremental-scan predicate (SURVEY.md §2.3 R3).
    *
    * Null semantics mirror the connector with `validate.non.null = false`
    * (reference connector.json:10 — the reference DISABLES the non-null
    * validation, so rows with a null ts or event_id are legal in the
    * source): such rows can never form an offset, so they are never
    * delivered — the ts comparison already nulls out, and the explicit
    * event_id guard keeps a null id from reaching [[nextOffset]], where
    * it would otherwise throw mid-poll. One extra pushed-down conjunct;
    * the skip is silent by design, exactly like the connector's.
    */
  def afterOffset(off: Offset, tsCol: String = "ts", idCol: String = "event_id"): Column =
    col(idCol).isNotNull && (
      col(tsCol) > lit(off.ts) ||
        (col(tsCol) === lit(off.ts) && col(idCol) > lit(off.eventId)))

  /** The connector's `timestamp.delay` guard: exclude rows newer than
    * `now − delay`, giving in-flight transactions `delay` to commit before
    * the offset passes them. This is the reference-faithful late-data
    * mitigation (SURVEY.md §2.5 streaming row; the Aiven connector's
    * timestamp.delay.interval.ms) — rows that commit with an older ts
    * AFTER the delayed watermark passes are still skipped, which is the
    * reference's documented defect. The streaming path (graft.streaming)
    * has no such loss; this mode exists for connector parity.
    */
  def delayGuard(now: Column, delay: String, tsCol: String = "ts"): Column =
    col(tsCol) < now - expr(s"INTERVAL $delay")

  /** One poll: rows strictly after `off`, in delivery order (ts, event_id)
    * ASC — ordering only within the batch, matching the connector, which
    * also only orders within one poll query (SURVEY.md §2.3 R4).
    *
    * @param delay optional `timestamp.delay` window, e.g. Some("5 SECONDS")
    * @param now   evaluation time for the delay guard (constant in tests)
    * @param tsCol/idCol the connector's `timestamp.column.name` /
    *        `incrementing.column.name` (reference connector.json:8-9 —
    *        it names them explicitly because source tables vary; defaults
    *        are the engine's canonical log schema, which PollRunner's
    *        envelope stage standardizes on)
    */
  def poll(
      relation: DataFrame,
      off: Offset,
      delay: Option[String] = None,
      now: Column = current_timestamp(),
      tsCol: String = "ts",
      idCol: String = "event_id"
  ): DataFrame = {
    val base = relation.where(afterOffset(off, tsCol, idCol))
    val guarded = delay.fold(base)(d => base.where(delayGuard(now, d, tsCol)))
    guarded.orderBy(col(tsCol).asc, col(idCol).asc)
  }

  /** The offset a batch advances to: lexicographic max of (ts, event_id).
    * One small aggregate — never a driver-side scan of the batch.
    */
  def nextOffset(
      batch: DataFrame,
      current: Offset,
      tsCol: String = "ts",
      idCol: String = "event_id"
  ): Offset = {
    val top = batch
      .select(col(tsCol), col(idCol))
      .orderBy(col(tsCol).desc, col(idCol).desc)
      .limit(1)
      .collect()
    top.headOption.fold(current) { r: Row =>
      Offset(r.getTimestamp(0), r.getLong(1))
    }
  }

  // ---- offset persistence (SURVEY.md §2.4 D3) ------------------------------
  // The reference stores offsets in the compacted `connect-offsets` topic
  // (docker-compose.yml:74). For the batch poller the engine persists a tiny
  // per-relation offset file; the streaming path uses Structured Streaming
  // checkpoints instead (see graft.streaming).

  private def offsetPath(dir: String, relation: String) =
    new Path(s"$dir/offset-$relation.txt")

  def commitOffset(spark: SparkSession, dir: String, relation: String, off: Offset): Unit = {
    val p = offsetPath(dir, relation)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(s"${off.ts.toInstant.toString}\n${off.eventId}".getBytes(StandardCharsets.UTF_8))
    out.close()
  }

  def loadOffset(spark: SparkSession, dir: String, relation: String, fallback: Offset): Offset = {
    val p = offsetPath(dir, relation)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) fallback
    else {
      val in = fs.open(p)
      val text = new String(in.readAllBytes(), StandardCharsets.UTF_8)
      in.close()
      val Array(t, i) = text.trim.split("\n")
      Offset(Timestamp.from(java.time.Instant.parse(t)), i.toLong)
    }
  }
}
