package graft.sink

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{Column, DataFrame}

/** Kafka-Connect-style JSON envelope encoding and topic routing — the
  * engine's owned form of the JsonConverter + topic-prefix delivery stage
  * (reference docker-compose.yml:76-79; connectors/
  * cdc-timescale-connector.json:16).
  *
  * The converter wraps each row as `{"schema": {...}, "payload": {...}}`
  * with `schemas.enable=true`. The schema block is static per relation, so
  * it is rendered once from the StructType on the driver and inlined as a
  * literal — the per-row work is a single codegen'd `to_json(struct(...))`
  * for the payload plus a string concat, which keeps the whole encode stage
  * inside WholeStageCodegen at any scale.
  */
object JsonEnvelope {

  /** Connect JSON-schema type name for a Spark type (the subset the
    * envelope uses; Connect calls them int32/int64/string/...).
    */
  private def connectType(dt: DataType): String = dt match {
    case TimestampType => "int64" // Connect Timestamp logical type
    case LongType      => "int64"
    case IntegerType   => "int32"
    case DoubleType    => "float64"
    case FloatType     => "float32"
    case BooleanType   => "boolean"
    case _             => "string"
  }

  /** JSON string-literal escape for identifiers interpolated into the
    * static schema block. Field and relation names are caller-supplied, so
    * a name containing `"`, `\` or a control char must not break the
    * emitted JSON (the engine's own schemas never hit this; hostile DDL
    * could).
    */
  private def jsonEscape(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '"'            => sb.append("\\\"")
      case '\\'           => sb.append("\\\\")
      case '\b'           => sb.append("\\b")
      case '\f'           => sb.append("\\f")
      case '\n'           => sb.append("\\n")
      case '\r'           => sb.append("\\r")
      case '\t'           => sb.append("\\t")
      case c if c < 0x20  => sb.append(f"\\u${c.toInt}%04x")
      case c              => sb.append(c)
    }
    sb.toString
  }

  /** Render the static `schema` block for a relation's StructType, in the
    * shape JsonConverter emits: `{"type":"struct","fields":[...],
    * "optional":false,"name":...}`.
    */
  def schemaBlock(schema: StructType, name: String): String = {
    val fields = schema.fields
      .map { f =>
        s"""{"type":"${connectType(f.dataType)}","optional":${f.nullable},"field":"${jsonEscape(f.name)}"}"""
      }
      .mkString("[", ",", "]")
    s"""{"type":"struct","fields":$fields,"optional":false,"name":"${jsonEscape(name)}"}"""
  }

  /** Encode rows of `df` as Connect envelopes in column `value`.
    *
    * `schemas = true` is the reference deployment's JsonConverter setting
    * (docker-compose.yml:76-79, `schemas.enable=true`): every message
    * wraps as `{"schema":…,"payload":…}`. `schemas = false` is the
    * ubiquitous production toggle (`schemas.enable=false`): the payload
    * JSON alone, no wrapper — identical payload bytes, ~half the message
    * size, for consumers that carry the schema out of band.
    */
  def encode(df: DataFrame, relationName: String, schemas: Boolean = true): DataFrame = {
    val payload = to_json(struct(df.columns.map(col): _*))
    val value =
      if (schemas) {
        val block = schemaBlock(df.schema, relationName)
        concat(lit(s"""{"schema":$block,"payload":"""), payload, lit("}"))
      } else payload
    df.withColumn("value", value)
  }

  /** Topic routing (SURVEY.md §2.4 D2): topic = "cdc-" + relation name
    * (reference connector.json:16 `topic.prefix`; readme.md:34-35).
    */
  def topicFor(relationName: String): String = s"cdc-$relationName"

  def withTopic(df: DataFrame, relationName: String): DataFrame =
    df.withColumn("topic", lit(topicFor(relationName)))

  /** Key column for keyed, ordered delivery within a topic partition. */
  def withKey(df: DataFrame, keyCol: Column): DataFrame =
    df.withColumn("key", keyCol.cast(StringType))
}
