package graft.model

import org.apache.spark.sql.types._

/** The canonical change-event envelope — Spark mirror of the reference's
  * unified CDC log table `cdc.event_log` (reference timescale/init.sql:41-49).
  *
  * Nullability contract (reference readme.md:262-267):
  * `before` null ⟺ INSERT; `after` null ⟺ DELETE; both non-null ⟺ UPDATE.
  * `before`/`after` carry the full row snapshot as JSON text — keeping the
  * payload stringly-typed is a deliberate reference semantic: one log schema
  * serves every watched table (reference readme.md:216).
  */
final case class ChangeEvent(
    ts: java.sql.Timestamp,
    schema_name: String,
    table_name: String,
    operation: String, // INSERT | UPDATE | DELETE (reference init.sql:16)
    before: Option[String],
    after: Option[String],
    event_id: Long
)

object ChangeEvent {
  val Insert = "INSERT"
  val Update = "UPDATE"
  val Delete = "DELETE"

  /** StructType of the envelope, field order matching the reference DDL
    * (reference init.sql:41-49).
    */
  val schema: StructType = StructType(
    Seq(
      StructField("ts", TimestampType, nullable = false),
      StructField("schema_name", StringType, nullable = false),
      StructField("table_name", StringType, nullable = false),
      StructField("operation", StringType, nullable = false),
      StructField("before", StringType, nullable = true),
      StructField("after", StringType, nullable = true),
      StructField("event_id", LongType, nullable = false)
    )
  )

  /** Envelope column names in reference order (reference init.sql:76-83). */
  val columns: Seq[String] =
    Seq("ts", "schema_name", "table_name", "operation", "before", "after", "event_id")
}
