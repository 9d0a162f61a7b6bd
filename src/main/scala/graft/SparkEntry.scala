package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.capture.CdcCapture
import graft.queries.{CdcQueries, ExtensionQueries, RelationalQueries}
import graft.sink.JsonEnvelope

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the operator inventory (SURVEY.md §2) as runnable entries;
  * `oracleSql` carries the DuckDB-equivalent SQL for every SQL-expressible
  * entry (hash-function-dependent ops are rows-only checked and verified in
  * unit tests instead).
  */
object SparkEntry {

  /** Flagship: the reference's end-to-end hot path (SURVEY.md §3 EP1-EP2)
    * on sf0.001 — snapshot-diff capture → classify → envelope → per-table
    * view filter → Connect-style JSON encode → topic routing. Driver
    * smoke-checks rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val base = Tables
      .load(spark, dir, "events")
      .select(
        col("event_id"),
        col("user_id"),
        col("event_type"),
        round(col("value") * 100).cast("long").as("value_cents")
      )
    val prev = base.where(col("event_id") % 3 =!= 0)
    val cur = base
      .where(col("event_id") % 5 =!= 0)
      .withColumn(
        "event_type",
        when(col("event_id") % 7 === 0, lit("edited")).otherwise(col("event_type"))
      )
    val events = CdcCapture.capture(prev, cur, Seq("event_id"), "dataschema", "events",
      to_timestamp(lit("2025-06-14 00:00:00")))
    val withIds = CdcCapture.assignIds(events, base = 0L)
    val view = withIds.where(col("schema_name") === "dataschema" && col("table_name") === "events")
    JsonEnvelope.withTopic(
      JsonEnvelope.encode(view.select("operation", "before", "after", "event_id"), "event_log_events"),
      "event_log_events"
    )
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CdcQueries.queries ++ RelationalQueries.queries ++ ExtensionQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (driver
    * records a weaker rows-only check; unit tests cover them exactly).
    */
  def oracleSql: Map[String, String] =
    CdcQueries.oracles ++ RelationalQueries.oracles ++ ExtensionQueries.oracles

  /** Oracle-side expected tables for gates whose check DuckDB cannot
    * compute itself (e.g. xxhash64). Verify materializes each under
    * `<outDir>.expected/<name>`; the oracle SQL reads it back via the
    * `{GRAFT_EXPECTED}` placeholder.
    */
  def expectedTables: Map[String, (SparkSession, String) => DataFrame] =
    ExtensionQueries.expectedTables

  /** Local-iteration subset knob shared by Bench and Verify: either
    * SPARK_GRAFT_ONLY or SPARK_GRAFT_QUERIES (aliases, trimmed, empty
    * names dropped). The driver sets neither, so both mains always cover
    * the full inventory in gate runs.
    */
  private[graft] def querySubset: Option[Set[String]] =
    sys.env.get("SPARK_GRAFT_ONLY").orElse(sys.env.get("SPARK_GRAFT_QUERIES"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
}
