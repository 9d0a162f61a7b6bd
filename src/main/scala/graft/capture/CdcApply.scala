package graft.capture

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.DataFrame

import graft.model.ChangeEvent

/** Apply a change-event log to a snapshot — the downstream consumer's
  * "reconstruct full change histories" operation (reference readme.md:218):
  * given the previous table state and captured events, produce the current
  * state. The inverse of CdcCapture.
  *
  * Semantics: events are ordered by `event_id` (the monotonic sequence,
  * reference init.sql:51-59); the latest event per primary key wins.
  * DELETE removes the key; INSERT/UPDATE replace the row with the
  * after-image (parsed from the JSON payload with the table's declared
  * schema — the opt-in typed projection over the schemaless envelope,
  * SURVEY.md §1.2).
  *
  * Scale: one window over (key) ordered by event_id — partitioned by key,
  * never global — plus one anti-join against the snapshot; both shuffle on
  * the PK only. Replay of a day's log over a 100 TB snapshot is one
  * co-partitionable pass.
  */
object CdcApply {

  /** @param snapshot      previous state (columns = payloadSchema fields)
    * @param events        change events (ChangeEvent envelope rows)
    * @param pk            primary-key field names within the payload
    * @param payloadSchema declared schema of the watched table's rows
    */
  def applyLog(
      snapshot: DataFrame,
      events: DataFrame,
      pk: Seq[String],
      payloadSchema: StructType
  ): DataFrame = {
    val cols = payloadSchema.fieldNames.toSeq
    // key comes from the after-image when present, else the before-image
    // (DELETE has only `before` — reference readme.md:262-267)
    val parsed = events.select(
      col("event_id"),
      col("operation"),
      from_json(coalesce(col("after"), col("before")), payloadSchema).as("__row")
    )
    val keyed = pk.foldLeft(parsed) { case (df, k) => df.withColumn(k, col(s"__row.$k")) }
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col("event_id").desc)
    val latest = keyed
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
    val survivors = latest
      .where(col("operation") =!= ChangeEvent.Delete)
      .select(cols.map(c => col(s"__row.$c").as(c)): _*)
    val untouched = snapshot.join(latest.select(pk.map(col): _*), pk, "left_anti")
    untouched.select(cols.map(col): _*).unionByName(survivors)
  }

  /** Type-2 slowly-changing-dimension history from the change log — the
    * standard downstream consumer shape built from the reference's topics
    * (readme.md:218 "reconstruct full change histories", materialized as a
    * queryable versions table rather than one point-in-time state): one row
    * per VERSION a key ever held, carrying the payload columns plus
    *
    *  - `valid_from_id` — the event that created the version (null for the
    *    pre-log snapshot seed),
    *  - `valid_to_id`   — the event that superseded it (next INSERT/UPDATE
    *    or the closing DELETE; null while still open),
    *  - `is_current`    — 1 iff the version has no successor event. A
    *    version closed by DELETE has `valid_to_id` set, so deleted keys
    *    correctly have no current row.
    *
    * The snapshot seeds each key's first version (open at log start); the
    * event axis is `event_id`, the reference's monotonic sequence
    * (init.sql:51-59) — unlike the capture timestamp it is unique, so the
    * version chain is deterministic. DELETE events participate in the
    * window (they close the prior version) but emit no version row.
    *
    * Scale: identical shape to [[applyLog]] — one window partitioned BY KEY
    * ordered by event_id (never global), one union with the snapshot; both
    * shuffle on the PK only, so building the full history of a day's log
    * over a 100 TB dimension is one co-partitionable pass.
    */
  def scd2History(
      snapshot: DataFrame,
      events: DataFrame,
      pk: Seq[String],
      payloadSchema: StructType
  ): DataFrame = {
    val cols = payloadSchema.fieldNames.toSeq
    val parsed = events.select(
      col("event_id"),
      col("operation"),
      from_json(coalesce(col("after"), col("before")), payloadSchema).as("__row")
    )
    val seeded = snapshot
      .select(struct(cols.map(col): _*).as("__row"))
      .withColumn("event_id", lit(null).cast("long"))
      .withColumn("operation", lit("SEED"))
      .select("event_id", "operation", "__row")
    val all = pk.foldLeft(parsed.unionByName(seeded)) {
      case (df, k) => df.withColumn(k, col(s"__row.$k"))
    }
    val w = Window.partitionBy(pk.map(col): _*).orderBy(col("event_id").asc_nulls_first)
    all
      .withColumn("valid_to_id", lead(col("event_id"), 1).over(w))
      .where(col("operation") =!= ChangeEvent.Delete)
      .select(
        cols.map(c => col(s"__row.$c").as(c)) ++ Seq(
          col("event_id").as("valid_from_id"),
          col("valid_to_id"),
          when(col("valid_to_id").isNull, 1).otherwise(0).as("is_current")
        ): _*
      )
  }

  /** Point-in-time reconstruction: the table state as of `maxEventId`
    * (inclusive) — replay only the log prefix. With the retention window
    * (CdcLog) this gives time travel across the retained history, the
    * readme.md:218 "reconstruct full change histories" capability as a
    * queryable operator.
    */
  def stateAsOf(
      snapshot: DataFrame,
      events: DataFrame,
      pk: Seq[String],
      payloadSchema: StructType,
      maxEventId: Long
  ): DataFrame =
    applyLog(snapshot, events.where(col("event_id") <= maxEventId), pk, payloadSchema)
}
