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

  test("schema block escapes hostile field and relation names (valid JSON out)") {
    val hostile = StructType(Seq(
      StructField("""evil"name""", StringType, nullable = true),
      StructField("tab\tnewline\nback\\slash", LongType, nullable = false)
    ))
    val block = JsonEnvelope.schemaBlock(hostile, """rel"with\quotes""")
    // parse it back: from_json returns non-null iff the JSON is well-formed
    val parsed = spark.range(1).select(
      get_json_object(lit(block), "$.type").as("t"),
      get_json_object(lit(block), "$.name").as("n"),
      get_json_object(lit(block), "$.fields[0].field").as("f0"),
      get_json_object(lit(block), "$.fields[1].field").as("f1")
    ).head()
    assert(parsed.getString(0) == "struct")
    assert(parsed.getString(1) == """rel"with\quotes""")
    assert(parsed.getString(2) == """evil"name""")
    assert(parsed.getString(3) == "tab\tnewline\nback\\slash")
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

  test("Avro envelope round-trips typed rows, nulls included, through binary values") {
    import spark.implicits._
    val rows = Seq(
      (1L, Some("INSERT"), Some(3.5), Some("after-json")),
      (2L, Some("DELETE"), None, None),
      (3L, None, Some(-0.0), Some("x\"y\nz"))
    ).toDF("event_id", "operation", "val", "after")
    val schemaJson = graft.sink.AvroEnvelope.payloadSchemaJson(rows, "ev")
    assert(schemaJson.contains("\"record\"") && schemaJson.contains("event_id"))
    val wire = graft.sink.AvroEnvelope.encode(rows, "ev").select("value")
    assert(wire.schema("value").dataType.typeName === "binary")
    val back = graft.sink.AvroEnvelope.decode(wire, schemaJson)
    assert(back.columns.toSeq === Seq("event_id", "operation", "val", "after"))
    val cols = rows.columns.map(org.apache.spark.sql.functions.col).toSeq
    assert(back.select(cols: _*).exceptAll(rows.select(cols: _*)).isEmpty)
    assert(rows.select(cols: _*).exceptAll(back.select(cols: _*)).isEmpty)
  }

  test("Avro decode keeps transport columns and rejects non-flat payloads") {
    import spark.implicits._
    val rows = Seq((1L, "a"), (2L, "b")).toDF("event_id", "event_type")
    val schemaJson = graft.sink.AvroEnvelope.payloadSchemaJson(rows, "ev")
    val wire = graft.sink.AvroEnvelope.encode(rows, "ev")
      .select(org.apache.spark.sql.functions.lit("cdc-ev").as("topic"),
        org.apache.spark.sql.functions.col("value"))
    val back = graft.sink.AvroEnvelope.decode(wire, schemaJson)
    assert(back.columns.toSeq === Seq("topic", "event_id", "event_type"))
    assert(back.where($"topic" === "cdc-ev").count() === 2)
    // timestamps must be projected to micros first — the codec says so
    val ts = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts")
    val e = intercept[IllegalArgumentException] {
      graft.sink.AvroEnvelope.encode(ts, "ev")
    }
    assert(e.getMessage.contains("unix_micros"))
  }

  test("topic naming matches the reference prefix scheme") {
    assert(JsonEnvelope.topicFor("event_log") == "cdc-event_log")
    assert(JsonEnvelope.topicFor("event_log_assets") == "cdc-event_log_assets")
  }

  test("schema-full and schemaless envelopes carry byte-identical payloads") {
    val rows = Seq((1L, "created"), (2L, "deleted")).toDF("event_id", "event_type")
    val withSchema = JsonEnvelope.encode(rows, "event_log")
      .select(get_json_object(col("value"), "$.payload").as("p"), col("event_id"))
    val payloadOnly = JsonEnvelope.encode(rows, "event_log", schemas = false)
      .select(col("value").as("p"), col("event_id"))
    val j = withSchema.as("a").join(payloadOnly.as("b"), "event_id")
      .select(col("a.p"), col("b.p")).collect()
    assert(j.length == 2)
    j.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    // and the payload-only form has no wrapper at all
    payloadOnly.collect().foreach(r => assert(!r.getString(0).contains("\"schema\"")))
  }

  test("strict decode raises on a producer/consumer schemas mismatch instead of nulling") {
    val df = Seq((1L, "click"), (2L, "error")).toDF("event_id", "event_type")
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("event_type", StringType)))
    // payload-only messages decoded as if enveloped → every field null →
    // strict raises with the offending value; lax keeps round-7's silent
    // nulls for callers that opt out
    val payloadOnly = graft.sink.JsonEnvelope.encode(df, "rel", schemas = false)
      .select("value")
    val e = intercept[Exception] {
      graft.sources.TopicSource.decode(payloadOnly, schema, schemas = true).collect()
    }
    assert(e.getMessage.contains("schemas setting mismatch"), e.getMessage)
    val lax = graft.sources.TopicSource
      .decode(payloadOnly, schema, schemas = true, strict = false).collect()
    assert(lax.length == 2 && lax.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    // matched settings decode clean under strict in both forms
    val enveloped = graft.sink.JsonEnvelope.encode(df, "rel").select("value")
    assert(graft.sources.TopicSource.decode(enveloped, schema, schemas = true)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(graft.sources.TopicSource.decode(payloadOnly, schema, schemas = false)
      .collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
  }

  test("TopicSource decodes both envelope forms back to the original rows") {
    import graft.sources.TopicSource
    import org.apache.spark.sql.types._
    val rows = Seq((1L, "created", 1.5), (2L, "deleted", -0.25))
      .toDF("event_id", "event_type", "value")
    val payloadSchema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType)))
    for (schemas <- Seq(true, false)) {
      val delivery = JsonEnvelope.withKey(
        JsonEnvelope.withTopic(
          JsonEnvelope.encode(rows, "event_log", schemas), "event_log"),
        col("event_id")).select("topic", "key", "value")
      val got = TopicSource.decode(delivery, payloadSchema, schemas)
        .select("event_id", "event_type", "value")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
      assert(got == Set((1L, "created", 1.5), (2L, "deleted", -0.25)), s"schemas=$schemas")
    }
  }

  test("TopicSource file mode round-trips TopicSink's layout with topic pruning") {
    import graft.sources.TopicSource
    import org.apache.spark.sql.types._
    val rows = Seq((1L, "a"), (2L, "b")).toDF("event_id", "event_type")
    val twoTopics = JsonEnvelope.encode(rows, "event_log")
      .select(
        concat(lit("cdc-t"), col("event_id") % 2).as("topic"),
        col("event_id").cast("string").as("key"),
        col("value"))
    val out = tempDir("topic-src") + "/topics"
    twoTopics.write.partitionBy("topic").parquet(out)
    val cfg = TopicSource.Config(brokers = None, path = out)
    assert(TopicSource.read(spark, cfg).count() == 2)
    val one = TopicSource.read(spark, cfg, Seq("cdc-t0"))
    assert(one.select("topic").distinct().collect().map(_.getString(0)).toSeq == Seq("cdc-t0"))
    // the topic filter prunes partitions at scan time, not post-scan: the
    // scan's PartitionFilters bracket must carry a topic predicate (an
    // unpruned scan prints "PartitionFilters: []"; Dataset.inputFiles is
    // no witness — it lists the UNfiltered relation's files)
    val scan = one.queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*topic".r.findFirstIn(scan).nonEmpty,
      s"topic filter did not reach PartitionFilters:\n$scan")
  }

  test("TopicSource kafka mode resolves subscribe options and fails fast off-classpath") {
    import graft.sources.TopicSource
    val cfg = TopicSource.Config(Some("broker:9092"), "/unused",
      kafkaOptions = Map("kafka.group.id" -> "g1"))
    val r = TopicSource.resolve(cfg, Seq("cdc-a", "cdc-b"))
    assert(r.format == "kafka")
    assert(r.options("subscribe") == "cdc-a,cdc-b")
    assert(r.options("kafka.bootstrap.servers") == "broker:9092")
    assert(r.options("kafka.group.id") == "g1")
    // the stock jars dir has no kafka connector: read must fail fast
    assert(!TopicSource.kafkaConnectorOnClasspath)
    val ex = intercept[IllegalStateException] {
      TopicSource.read(spark, cfg, Seq("cdc-a"))
    }
    assert(ex.getMessage.contains("spark-sql-kafka"))
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
