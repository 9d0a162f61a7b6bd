package graft.sink

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.avro.util.Utf8
import org.apache.spark.sql.avro.SchemaConverters
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Row}

/** Binary Avro message envelopes — the Kafka Connect `AvroConverter`
  * deployment variant beside [[JsonEnvelope]]'s `JsonConverter`
  * (reference docker-compose.yml:76-79 chooses JSON; Avro + an
  * out-of-band schema is the other first-class Connect converter, native
  * to the reference's Aiven stack). The schema travels beside the stream
  * (a schema-registry stand-in), not inside each message — each message
  * is the raw Avro body, ~the payload bytes alone.
  *
  * The codec runs the bundled Avro runtime directly over
  * `mapPartitions` (schema parsed and writer/decoder allocated ONCE per
  * partition, buffers reused per row) because this distribution ships
  * spark-sql's Avro FILE format but not the external module's
  * `to_avro`/`from_avro` expressions. mapPartitions is the right tool
  * here for the same reason it is in [[graft.ext.Multimodal]]: a
  * genuine binary codec with no declarative twin. Flat records of
  * primitive fields only — the envelope contract (longs, strings,
  * doubles, micros-as-long timestamps, exactly what
  * [[graft.queries.CdcQueries]] d7/d8 ship); project `unix_micros(ts)`
  * before encoding, as a Connect int64 timestamp producer would.
  */
object AvroEnvelope {

  private val Supported: Set[DataType] =
    Set(LongType, IntegerType, DoubleType, FloatType, StringType, BooleanType, BinaryType)

  private def requireFlat(schema: StructType): Unit =
    schema.fields.foreach { f =>
      require(
        Supported.contains(f.dataType),
        s"AvroEnvelope supports flat primitive records; field ${f.name} is " +
          s"${f.dataType.simpleString} — project it to long/string/double first " +
          "(timestamps: unix_micros)"
      )
    }

  /** Avro record schema (JSON form) for `df`'s row struct — what a
    * schema registry would hold for the topic. Generated from the
    * Catalyst schema so [[encode]]/[[decode]] agree exactly.
    */
  def payloadSchemaJson(df: DataFrame, recordName: String): String = {
    requireFlat(df.schema)
    SchemaConverters
      .toAvroType(df.schema, nullable = false, recordName = recordName)
      .toString
  }

  /** Encode every row as one Avro binary message in column `value`,
    * against the schema [[payloadSchemaJson]] publishes.
    */
  def encode(df: DataFrame, recordName: String): DataFrame = {
    require(
      !df.columns.contains("value"),
      "the envelope writes the wire bytes to a column named `value` (the " +
        "Kafka convention); rename the payload's own `value` field first " +
        "(e.g. .withColumnRenamed(\"value\", \"val\"))"
    )
    val schemaJson = payloadSchemaJson(df, recordName)
    val inSchema = df.schema
    val outSchema = inSchema.add("value", BinaryType, nullable = false)
    val nFields = inSchema.length
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val baos = new ByteArrayOutputStream(256)
      var enc: org.apache.avro.io.BinaryEncoder = null
      rows.map { row =>
        val rec = new GenericData.Record(schema)
        var i = 0
        while (i < nFields) {
          val v = row.get(i) match {
            case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
            case other          => other
          }
          rec.put(i, v)
          i += 1
        }
        baos.reset()
        enc = EncoderFactory.get().binaryEncoder(baos, enc)
        writer.write(rec, enc)
        enc.flush()
        Row.fromSeq(row.toSeq :+ baos.toByteArray)
      }
    }(RowEncoder.encoderFor(outSchema))
  }

  /** Decode `value` back to payload columns using the out-of-band
    * schema, keeping any non-`value` transport columns (topic, key, …).
    * Corrupt messages fail the task — Avro has no PERMISSIVE mode;
    * binary framing errors are not row-level data the way a malformed
    * JSONL line is.
    */
  def decode(df: DataFrame, schemaJson: String): DataFrame = {
    val payloadSchema = SchemaConverters
      .toSqlType(new Schema.Parser().parse(schemaJson))
      .dataType
      .asInstanceOf[StructType]
    requireFlat(payloadSchema)
    val passThrough = df.schema.fields.filterNot(_.name == "value")
    val valueIdx = df.schema.fieldIndex("value")
    val passIdx = passThrough.map(f => df.schema.fieldIndex(f.name))
    val outSchema = StructType(passThrough ++ payloadSchema.fields)
    val nPayload = payloadSchema.length
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      var dec: org.apache.avro.io.BinaryDecoder = null
      rows.map { row =>
        val bytes = row.getAs[Array[Byte]](valueIdx)
        dec = DecoderFactory.get().binaryDecoder(bytes, dec)
        val rec = reader.read(null, dec)
        val payload = (0 until nPayload).map { i =>
          rec.get(i) match {
            case u: Utf8                 => u.toString
            case bb: java.nio.ByteBuffer =>
              val a = new Array[Byte](bb.remaining()); bb.get(a); a
            case other                   => other
          }
        }
        Row.fromSeq(passIdx.toSeq.map(row.get) ++ payload)
      }
    }(RowEncoder.encoderFor(outSchema))
  }
}
