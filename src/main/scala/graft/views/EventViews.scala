package graft.views

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.ChangeEvent

/** Derived sub-streams of the unified log — the engine's form of the
  * reference's `cdc.event_log_assets` view (reference timescale/init.sql:
  * 75-84): an explicit 7-column projection (R1) under a conjunctive
  * equality filter on (schema_name, table_name) (R2).
  *
  * Because these are plain DataFrame transformations, Catalyst inlines them
  * under any downstream predicate exactly as the PG rewriter inlines the
  * view under the connector's incremental WHERE (SURVEY.md §4 row 1) — the
  * filter and projection reach the Parquet scan (PushedFilters/ReadSchema).
  */
object EventViews {

  /** filter + project: one view per watched table (1 view : 1 topic,
    * reference readme.md:272).
    */
  def forTable(log: DataFrame, schemaName: String, tableName: String): DataFrame =
    log
      .where(col("schema_name") === schemaName && col("table_name") === tableName)
      .select(ChangeEvent.columns.map(col): _*)

  /** Register the log and a set of per-table views for the SQL surface
    * (SURVEY.md §3 EP3): `spark.sql("SELECT * FROM cdc_event_log")` etc.
    * Returns the registry of pollable relations — the engine's form of the
    * connector's `table.whitelist` (reference connectors/
    * cdc-timescale-connector.json:7, SURVEY.md §2.3 R5).
    */
  def registry(
      spark: SparkSession,
      log: DataFrame,
      tables: Seq[(String, String)]
  ): Map[String, DataFrame] = {
    log.createOrReplaceTempView("cdc_event_log")
    val views = tables.map { case (s, t) =>
      val name = s"event_log_$t"
      val v = forTable(log, s, t)
      v.createOrReplaceTempView(s"cdc_$name")
      name -> v
    }
    (("event_log" -> log.select(ChangeEvent.columns.map(col): _*)) +: views).toMap
  }
}
