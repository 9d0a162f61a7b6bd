package graft.poll

import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.sink.JsonEnvelope

/** The batch poll loop — EP2 (SURVEY.md §3) without Structured Streaming:
  * per whitelisted relation, poll strictly after the committed offset,
  * envelope-encode, deliver, commit the new offset. At-least-once: a crash
  * between deliver and commit re-delivers the batch (consumers dedup on
  * event_id).
  *
  * This is the engine's self-managed equivalent of the Kafka Connect task
  * cycle (~5 s cadence, reference readme.md:54); the streaming path
  * (graft.streaming.CdcStream) is the checkpointed production form. Offsets
  * live in tiny per-relation files (IncrementalPoller.commitOffset), the
  * analogue of the compacted connect-offsets topic.
  */
final class PollRunner(
    spark: SparkSession,
    offsetDir: String,
    initialOffset: IncrementalPoller.Offset,
    delay: Option[String] = None
) {

  /** One poll cycle over the relation registry (R5 whitelist). Returns the
    * delivered batches keyed by relation name; commits offsets after each
    * successful deliver.
    */
  def pollOnce(
      relations: Map[String, DataFrame]
  )(deliver: (String, DataFrame) => Unit): Map[String, Long] =
    relations.map { case (name, rel) =>
      val off = IncrementalPoller.loadOffset(spark, offsetDir, name, initialOffset)
      val batch = IncrementalPoller.poll(rel, off, delay)
      val enveloped = JsonEnvelope.withKey(
        JsonEnvelope.withTopic(JsonEnvelope.encode(batch, name), name),
        col("event_id")
      )
      val n = enveloped.count()
      if (n > 0) {
        deliver(name, enveloped)
        IncrementalPoller.commitOffset(
          spark, offsetDir, name, IncrementalPoller.nextOffset(batch, off))
      }
      name -> n
    }

  /** Run `cycles` poll cycles with `intervalMs` sleeps — the 5 s cadence
    * loop. Tests run with intervalMs=0 and data appended between cycles.
    */
  def run(
      relations: Map[String, DataFrame],
      cycles: Int,
      intervalMs: Long = 5000L
  )(deliver: (String, DataFrame) => Unit): Seq[Map[String, Long]] =
    (0 until cycles).map { i =>
      if (i > 0 && intervalMs > 0) Thread.sleep(intervalMs)
      pollOnce(relations)(deliver)
    }
}
