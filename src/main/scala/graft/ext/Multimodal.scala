package graft.ext

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** Multimodal column handling: image/audio/video as opaque `binary` columns
  * beside typed metadata, with decode / feature-extract / resize /
  * frame-sample stages.
  *
  * The Spark-side plumbing is real — schema, partition-preserving batched
  * `mapPartitions` (the Scala analogue of `mapInPandas`: one iterator per
  * partition, codecs amortized across the partition's rows), typed output
  * schema. The codec itself is a STUB — media libraries are not in this
  * container — implemented as a clearly-marked deterministic fake
  * ([[FakeCodec]]) so the pipeline is testable end-to-end; swapping in a
  * real decoder changes only that object.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata (the "opaque binary +
    * typed meta" layout; payloads never participate in shuffles except by
    * explicit repartition).
    */
  final case class MediaRow(
      media_id: Long,
      kind: String, // image | audio | video
      payload: Array[Byte],
      format: String,
      width: Int,
      height: Int,
      duration_ms: Long
  )

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      checksum: Long,
      feature: Array[Float] // decoded-feature vector (stubbed)
  )

  val mediaSchema: StructType = StructType(
    Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("kind", StringType, nullable = false),
      StructField("payload", BinaryType, nullable = true),
      StructField("format", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true)
    )
  )

  /** STUB codec: deterministic fake "decode" — derives a feature vector
    * from payload bytes. A real deployment replaces decode/resize/
    * frameSample bodies with an actual media library; signatures and batch
    * shape stay identical.
    */
  object FakeCodec {
    def decodeFeatures(payload: Array[Byte], dim: Int = 8): Array[Float] = {
      val out = new Array[Float](dim)
      if (payload == null) return out
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }

    def checksum(payload: Array[Byte]): Long = {
      if (payload == null) return 0L
      var h = 1125899906842597L
      var i = 0
      while (i < payload.length) { h = 31 * h + (payload(i) & 0xff); i += 1 }
      h
    }

    /** Fake resize: real impl would re-encode; stub keeps a prefix so output
      * size tracks the requested area ratio deterministically.
      */
    def resize(payload: Array[Byte], fromArea: Long, toArea: Long): Array[Byte] = {
      if (payload == null || fromArea <= 0) return payload
      val keep = math.max(1L, payload.length.toLong * toArea / math.max(fromArea, 1L)).min(payload.length.toLong)
      java.util.Arrays.copyOf(payload, keep.toInt)
    }
  }

  /** Batched decode/feature-extract over partitions — the `mapInPandas`
    * analogue. Partition-preserving: no shuffle; per-partition setup cost
    * (real codecs load models/contexts here) amortizes across rows.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition codec init would go here (model load, native ctx)
      rows.map { r =>
        MediaFeatures(
          media_id = r.media_id,
          kind = r.kind,
          n_bytes = if (r.payload == null) 0L else r.payload.length.toLong,
          checksum = FakeCodec.checksum(r.payload),
          feature = FakeCodec.decodeFeatures(r.payload)
        )
      }
    }
  }

  /** Frame sampling for video rows: emit one row per sampled frame index
    * (flatMap — rows-out ≥ rows-in, still partition-local).
    */
  final case class FrameRow(media_id: Long, frame_idx: Int, frame_ts_ms: Long, feature: Array[Float])

  def sampleFrames(media: Dataset[MediaRow], everyMs: Long): Dataset[FrameRow] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val n = math.max(1L, r.duration_ms / math.max(everyMs, 1L)).toInt
      (0 until n).map { i =>
        FrameRow(r.media_id, i, i * everyMs, FakeCodec.decodeFeatures(
          if (r.payload == null) null
          else java.util.Arrays.copyOfRange(r.payload, (i * 7) % math.max(r.payload.length, 1), r.payload.length)
        ))
      }
    }
  }

  /** Build a synthetic media table from the documents table (deterministic:
    * payload = UTF-8 bytes of the text) — gives the multimodal plumbing a
    * driver-data-derived, reproducible input.
    */
  def syntheticMedia(spark: SparkSession, documents: DataFrame): Dataset[MediaRow] = {
    import spark.implicits._
    documents
      .select(
        col("doc_id").as("media_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video")
          .as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        lit("fake").as("format"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        (col("n_chars") * 10).cast("long").as("duration_ms")
      )
      .as[MediaRow]
  }
}
