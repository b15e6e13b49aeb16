package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns (M3): image/audio/video as opaque `binary`
  * content plus typed metadata, with batched per-partition feature
  * extraction.
  *
  * The decode step is a clearly-marked deterministic STUB — this
  * environment ships no codec libraries — but everything Spark-side is
  * real and tested: the schema (binary + metadata struct columns), the
  * partition-preserving `mapPartitions` pipeline, and the batch shape
  * (an `Iterator` chunked into fixed-size batches, exactly how a
  * vectorized decode — Pandas-UDF style — would consume it; a real
  * impl swaps [[decodeStub]] for the codec call and nothing else
  * changes).
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, format: String)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])

  /** Deterministic media frame derived from `documents`: the text bytes
    * stand in for encoded media payloads; kind/meta are keyed off
    * doc_id so the oracle can reproduce them. */
  def syntheticMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      when(col("doc_id") % 3 === 0, "image")
        .when(col("doc_id") % 3 === 1, "audio")
        .otherwise("video").as("kind"),
      col("text").cast("binary").as("content"),
      (col("n_chars") % 640).cast("int").as("width"),
      (col("n_chars") % 480).cast("int").as("height"),
      lit("raw").as("format"))

  /** STUB decode: first `dim` bytes scaled to [0,1]. A real decoder
    * (JPEG → pixels, PCM → spectrogram frames) plugs in here; it
    * receives the same byte array and returns the same fixed-width
    * feature shape. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i =>
      if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f)

  /** Batched feature extraction: partition-local, no shuffle; rows are
    * consumed in `batchSize` chunks so a vectorized decoder amortizes
    * per-call overhead (the mapInPandas batch shape, in Scala). */
  def extractFeatures(media: Dataset[Media], dim: Int = 8,
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.content.length,
            decodeStub(m.content, dim))
        }
      }
    }
  }
}
