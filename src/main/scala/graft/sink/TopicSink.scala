package graft.sink

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.{DataFrame, Row}

import graft.streaming.CdcStream

/** Single delivery entry point, Kafka-shaped: the reference delivers
  * envelopes to a real broker (reference docker-compose.yml:16-39; topics
  * `cdc-<relation>` readme.md:34-35; envelope settings
  * docker-compose.yml:76-79), so the facade takes (topic, key, value) rows
  * — exactly the columns Spark's kafka sink consumes and exactly what
  * [[JsonEnvelope]] + [[graft.streaming.CdcStream.deliveryStream]] emit —
  * and switches the physical sink on configuration:
  *
  *   - `brokers = Some("host:9092")` → `format("kafka")` with
  *     `kafka.bootstrap.servers` (+ passthrough `kafka.*` options). The
  *     topic column routes each row to its own broker topic, keys give
  *     per-partition ordering, checkpointing gives Connect's offset
  *     persistence.
  *   - `brokers = None` → the topic-partitioned parquet sink (one
  *     directory per topic), byte-identical envelope content — the
  *     brokerless deployment and the test stand-in.
  *
  * The transform chain upstream is sink-agnostic; this is the one switch
  * point, so a user moves file-sink pipelines onto a broker by setting one
  * option, not rewriting the stream.
  */
object TopicSink {

  /** @param brokers      Some(bootstrap servers) → kafka mode; None → file mode
    * @param path         output directory (file mode only)
    * @param checkpoint   Structured Streaming checkpoint dir (both modes)
    * @param trigger      defaults to the reference's 5 s cadence
    * @param kafkaOptions extra `kafka.`-prefixed producer/sink options
    */
  final case class Config(
      brokers: Option[String],
      path: String,
      checkpoint: String,
      trigger: Trigger = CdcStream.DefaultTrigger,
      kafkaOptions: Map[String, String] = Map.empty
  )

  private val Required = Seq("topic", "key", "value")

  /** The DataSource class spark-sql-kafka registers; its presence is the
    * honest "can this session reach a broker" signal — the artifact is NOT
    * part of a stock Spark jars dir, it ships separately.
    */
  private val KafkaProviderClass = "org.apache.spark.sql.kafka010.KafkaSourceProvider"

  def kafkaConnectorOnClasspath: Boolean =
    try { Class.forName(KafkaProviderClass); true }
    catch { case _: ClassNotFoundException => false }

  /** The sink plan a Config resolves to, as inspectable data: physical
    * format, the full option set, and the file-sink partition columns.
    * [[writer]] builds exactly this; tests assert on it instead of
    * starting streams against brokers that don't exist.
    */
  final case class Resolved(
      format: String,
      options: Map[String, String],
      partitionCols: Seq[String]
  )

  def resolve(config: Config): Resolved = config.brokers match {
    case Some(bootstrap) =>
      Resolved(
        "kafka",
        Map("kafka.bootstrap.servers" -> bootstrap) ++ config.kafkaOptions +
          ("checkpointLocation" -> config.checkpoint),
        Seq.empty)
    case None =>
      Resolved(
        "parquet",
        Map("path" -> config.path, "checkpointLocation" -> config.checkpoint),
        Seq("topic"))
  }

  /** Build the configured writer without starting it (inspectable /
    * composable); [[start]] is the one-call entry point.
    *
    * Kafka mode fails FAST here when the spark-sql-kafka artifact is
    * missing — otherwise the misconfiguration would surface as an opaque
    * DataSource-lookup error at `start()`.
    */
  def writer(delivery: DataFrame, config: Config): DataStreamWriter[Row] = {
    val cols = delivery.columns.toSet
    require(
      Required.forall(cols.contains),
      s"delivery frame must carry ${Required.mkString("/")} columns (has ${cols.mkString(",")})"
    )
    if (config.brokers.isDefined && !kafkaConnectorOnClasspath)
      throw new IllegalStateException(
        s"TopicSink kafka mode needs the spark-sql-kafka connector ($KafkaProviderClass) on the " +
          "classpath; it is not bundled with Spark's jars dir — add the " +
          "spark-sql-kafka-0-10 artifact matching your Spark version, or use file mode (brokers=None)")
    val resolved = resolve(config)
    val projected = config.brokers match {
      case Some(_) =>
        // kafka sink contract: key/value as string or binary, topic as string
        delivery.select(
          col("topic").cast("string").as("topic"),
          col("key").cast("string").as("key"),
          col("value").cast("string").as("value"))
      case None =>
        delivery.select(Required.head, Required.tail: _*)
    }
    val base = projected.writeStream.format(resolved.format).options(resolved.options)
    (if (resolved.partitionCols.nonEmpty) base.partitionBy(resolved.partitionCols: _*) else base)
      .trigger(config.trigger)
      .outputMode("append")
  }

  def start(delivery: DataFrame, config: Config): StreamingQuery =
    writer(delivery, config).start()
}
