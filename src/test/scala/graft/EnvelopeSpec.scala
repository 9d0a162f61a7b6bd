package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sink.JsonEnvelope
import graft.views.EventViews

/** D1-D2 + R1-R2: Connect-envelope encode, topic routing, view registry. */
class EnvelopeSpec extends SparkSpec {
  import spark.implicits._

  test("schema block renders Connect-style field descriptors") {
    val st = StructType(Seq(
      StructField("event_id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("ts", TimestampType, nullable = false)
    ))
    val block = JsonEnvelope.schemaBlock(st, "rel")
    assert(block.contains(""""type":"int64","optional":false,"field":"event_id""""))
    assert(block.contains(""""type":"string","optional":true,"field":"name""""))
    assert(block.contains(""""type":"int64","optional":false,"field":"ts""""))
    assert(block.contains(""""name":"rel""""))
  }

  test("envelope value is parseable JSON with schema and payload blocks") {
    val df = Seq((1L, "click")).toDF("event_id", "event_type")
    val value = JsonEnvelope.encode(df, "event_log").select("value").as[String].head()
    val parsed = spark.range(1).select(
      get_json_object(lit(value), "$.payload.event_id").as("id"),
      get_json_object(lit(value), "$.payload.event_type").as("et"),
      get_json_object(lit(value), "$.schema.type").as("st")
    ).head()
    assert(parsed.getString(0) == "1")
    assert(parsed.getString(1) == "click")
    assert(parsed.getString(2) == "struct")
  }

  test("schema_of_json infers the payload shape (schemaless envelope, typed on demand)") {
    val inferred = spark.range(1)
      .select(schema_of_json(lit("""{"k": 69}""")).as("s"))
      .as[String].head()
    assert(inferred == "STRUCT<k: BIGINT>")
    // inferred schema drives a typed projection over real props payloads
    val ev = Tables.load(spark, sf0001, "events").limit(10)
    val k = ev.select(from_json($"props", lit(inferred), new java.util.HashMap[String, String]())
      .getField("k").as("k")).where($"k".isNotNull).count()
    assert(k == 10)
  }

  test("topic naming matches the reference prefix scheme") {
    assert(JsonEnvelope.topicFor("event_log") == "cdc-event_log")
    assert(JsonEnvelope.topicFor("event_log_assets") == "cdc-event_log_assets")
  }

  test("view registry: filter+project per table, SQL surface registered") {
    val t0 = java.sql.Timestamp.from(java.time.Instant.parse("2025-06-14T00:00:00Z"))
    val log = Seq(
      (t0, "dataschema", "assets", "INSERT", null: String, """{"id":1}""", 1L),
      (t0, "dataschema", "anomaly", "INSERT", null: String, """{"id":2}""", 2L),
      (t0, "otherschema", "assets", "INSERT", null: String, """{"id":3}""", 3L)
    ).toDF("ts", "schema_name", "table_name", "operation", "before", "after", "event_id")
    val reg = EventViews.registry(spark, log,
      Seq("dataschema" -> "assets", "dataschema" -> "anomaly"))
    assert(reg.keySet == Set("event_log", "event_log_assets", "event_log_anomaly"))
    assert(reg("event_log_assets").count() == 1) // otherschema filtered (R2)
    assert(reg("event_log_assets").columns.toSeq == graft.model.ChangeEvent.columns)
    assert(spark.sql("SELECT count(*) FROM cdc_event_log").head().getLong(0) == 3)
    assert(spark.sql("SELECT count(*) FROM cdc_event_log_assets").head().getLong(0) == 1)
  }
}
