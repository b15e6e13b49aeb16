package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns (M3): image/audio/video as opaque `binary`
  * content plus typed metadata, with batched per-partition feature
  * extraction.
  *
  * The decode step sits behind the [[Decoder]] trait — the one seam a
  * codec drop-in implements; everything Spark-side (schema, batching,
  * partitioning) is decoder-agnostic and doesn't change when a real
  * codec arrives. This environment ships no codec libraries, so the
  * default [[Decoders.StubDecoder]] is a clearly-marked deterministic
  * stand-in, selected the same way [[Enrichers.fromConf]] keeps HTTP
  * off the verify path: config-gated, stub unless explicitly swapped.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, content: Array[Byte],
      width: Int, height: Int, format: String)
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
      features: Array[Float])

  /** The decode seam: encoded payload bytes → fixed-width feature
    * vector. Implementations must be Serializable (shipped to
    * executors once per task) and deterministic if their output feeds
    * an oracle-checked query. A real impl (JPEG → pixels, PCM →
    * spectrogram frames) receives the same byte array and returns the
    * same shape — nothing else in the pipeline changes. */
  trait Decoder extends Serializable {
    def decode(bytes: Array[Byte], dim: Int): Array[Float]
  }

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

  /** STUB decode: first `dim` bytes scaled to [0,1] — kept as a named
    * function so specs can pin its exact semantics. */
  def decodeStub(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i =>
      if (i < bytes.length) (bytes(i) & 0xff) / 255.0f else 0.0f)

  /** Batched feature extraction: partition-local, no shuffle; rows are
    * consumed in `batchSize` chunks so a vectorized decoder amortizes
    * per-call overhead (the mapInPandas batch shape, in Scala). */
  def extractFeatures(media: Dataset[Media], dim: Int = 8,
      batchSize: Int = 64,
      decoder: Decoder = Decoders.StubDecoder): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.grouped(batchSize).flatMap { batch =>
        batch.map { m =>
          MediaFeatures(m.media_id, m.kind, m.content.length,
            decoder.decode(m.content, dim))
        }
      }
    }
  }
}

/** The config gate for decode, mirroring [[Enrichers.fromConf]]: the
  * deterministic stub unless `spark.graft.media.decoderClass` names a
  * [[Multimodal.Decoder]] implementation with a no-arg constructor —
  * so a codec drop-in needs a jar on the classpath and one conf key,
  * zero Spark-side changes. */
object Decoders {

  /** Deterministic stand-in for a codec (none ship in this env). */
  case object StubDecoder extends Multimodal.Decoder {
    def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      Multimodal.decodeStub(bytes, dim)
  }

  def fromConf(spark: SparkSession): Multimodal.Decoder =
    spark.conf.getOption("spark.graft.media.decoderClass") match {
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[Multimodal.Decoder]
      case None => StubDecoder
    }
}
