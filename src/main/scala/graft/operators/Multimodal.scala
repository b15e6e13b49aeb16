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

  /** The VIDEO half of the decode seam: a payload that decodes to an
    * ordered frame sequence, each frame a `dim`-cell gray-pixel grid
    * (the aHash pipeline's input shape). Animated GIF gets this from
    * the pure JDK ([[Decoders.ImageIoDecoder]]); real video codecs
    * (H.264 …) have no pure-JDK decoder and would implement the same
    * two methods over their own frame iterator. */
  trait FrameDecoder extends Serializable {
    def frameCount(bytes: Array[Byte]): Int
    def frames(bytes: Array[Byte], dim: Int): Seq[Array[Long]]
    /** Only the frames at `indices`, in that order — the stride-sample
      * entry point: a sampler must never pay for the frames it drops
      * (decode IS the dominant per-row cost of the sampling pass). */
    def framesAt(bytes: Array[Byte], indices: Seq[Int], dim: Int): Seq[Array[Long]]
  }

  /** Strided frame sampling over REAL decoded frames — frame_sample's
    * (X-78) arithmetic (`0 until n by stride`) applied behind the
    * [[FrameDecoder]] seam: per sampled frame, the gray-pixel rows
    * (media_id, frame_no, i, p) that feed [[aHashPairs]] or any
    * per-frame featurizer. Partition-local flatMap, no shuffle, and
    * only the SAMPLED frames are decoded (framesAt) — at stride s the
    * decode cost is n/s frames, not n. */
  def sampledFramePixels(vids: Dataset[(Long, Array[Byte])], dim: Int,
      stride: Int, dec: FrameDecoder): DataFrame = {
    import vids.sparkSession.implicits._
    vids.flatMap { case (id, bytes) =>
      val idx = 0 until dec.frameCount(bytes) by stride
      dec.framesAt(bytes, idx, dim).zip(idx).flatMap { case (px, fn) =>
        px.zipWithIndex.map { case (p, i) => (id, fn, i, p) }
      }
    }.toDF("media_id", "frame_no", "i", "p")
  }

  /** frame_sample's (X-78) sampling + fingerprint stage, shared
    * VERBATIM by the registered query (stand-in frames from the linear
    * regexp split of the text payload) and the real-decoder path
    * (frames from [[FrameDecoder.framesAt]] in MultimodalSpec) — the
    * Decoder-seam claim made executable for video, the way aHashPairs
    * made it executable for images: swapping the codec changes ONLY
    * the frame source; the even-frame sampling arithmetic, the byte
    * offset, and the md5 fingerprint are this one function on both
    * paths. Input: (media_id, frame_no, frame). Output: the registered
    * query's (media_id, frame_no, off, frame_h) rows for the EVEN
    * frames. */
  def frameFingerprints(frames: DataFrame, frameLen: Int): DataFrame =
    frames
      .filter(col("frame_no") % 2 === 0)
      .select(col("media_id"), col("frame_no"),
        (col("frame_no") * frameLen + 1).as("off"),
        md5(col("frame")).as("frame_h"))

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

  /** The decoder-AGNOSTIC aHash near-dup stages (X-149): given a
    * 60-pixel frame (media_id, i ∈ 0..59, p = pixel value), compute
    * each image's 60-bit average hash (bit i = pixel above the exact
    * integer image mean, px·60 > Σpx), band it 4×15, and emit
    * candidate pairs from the (band_id, band_val) equi-join verified
    * at Hamming ≤ 3 — pigeonhole-exact recall (≤ 3 flips touch ≤ 3 of
    * the 4 bands, so every qualifying pair still collides somewhere).
    * Shared verbatim by the registered `phash_neardup` (md5 stand-in
    * pixels, the oracle path) and the real-decoder pipeline
    * (ImageIoDecoder pixels, MultimodalSpec) — swapping the codec
    * changes ONLY the pixel frame, which is the Decoder-seam claim
    * made executable. */
  def aHashPairs(px: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val withH = px
      .withColumn("tot", sum(col("p")).over(Window.partitionBy("media_id")))
      .groupBy("media_id")
      .agg(sum(when(col("p") * 60 > col("tot"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(i AS INT))"))
        .otherwise(lit(0L))).as("ahash"))
    val stacked = withH.select(col("media_id"), col("ahash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("ahash"), b * 15).bitwiseAND(lit(32767L))): _*))
        .as(Seq("band_id", "band_val")))
    stacked.as("x").join(stacked.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.band_val") === col("y.band_val") &&
          col("x.media_id") < col("y.media_id"))
      .select(col("x.media_id").as("a_id"), col("y.media_id").as("b_id"),
        col("x.ahash").as("h1"), col("y.ahash").as("h2"))
      .distinct()
      .withColumn("hamming", bit_count(col("h1").bitwiseXOR(col("h2"))))
      .filter(col("hamming") <= 3)
      .select("a_id", "b_id", "hamming")
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

  /** The first REAL decoder: pure-JDK `javax.imageio` (PNG/BMP/GIF/
    * JPEG — the formats the JDK ships readers for, zero native deps).
    * Decodes the payload to pixels and area-averages them onto a
    * ⌈√dim⌉-square grid read row-major (dim=60 → the aHash pipeline's
    * 8×8 grid minus the last 4 cells), integer-luma gray
    * (299·R + 587·G + 114·B)/1000 — all-integer arithmetic, so the
    * pixel values are bit-stable for a given decoded image.
    * [[grayPixels]] exposes the exact 0..255 integers for the aHash
    * path; [[decode]] scales them to [0,1] for the feature path;
    * [[frames]] iterates EVERY image in a multi-frame container
    * (animated GIF) via `ImageReader.read(i)` through the same grid —
    * the frame_sample stage over real frames. Throws on undecodable
    * bytes (a media pipeline routes those to a quarantine column — the
    * WebFetch swallow-and-skip posture — rather than hashing
    * garbage). */
  class ImageIoDecoder extends Multimodal.Decoder with Multimodal.FrameDecoder {
    private def grayOf(img: java.awt.image.BufferedImage, dim: Int): Array[Long] = {
      val (w, h) = (img.getWidth, img.getHeight)
      val g = math.ceil(math.sqrt(dim.toDouble)).toInt
      Array.tabulate(dim) { k =>
        val (r, c) = (k / g, k % g)
        val (y0, y1) = (r * h / g, math.max((r + 1) * h / g, r * h / g + 1))
        val (x0, x1) = (c * w / g, math.max((c + 1) * w / g, c * w / g + 1))
        var sum = 0L; var n = 0L
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            val rgb = img.getRGB(x, y)
            sum += (299L * ((rgb >> 16) & 0xff) + 587L * ((rgb >> 8) & 0xff) +
              114L * (rgb & 0xff)) / 1000L
            n += 1; x += 1
          }
          y += 1
        }
        if (n == 0) 0L else sum / n
      }
    }

    def grayPixels(bytes: Array[Byte], dim: Int): Array[Long] = {
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      require(img != null, "undecodable image payload")
      grayOf(img, dim)
    }

    /** Run `f` over a positioned ImageReader for `bytes`, disposing
      * reader + stream afterwards — INCLUDING when no installed reader
      * accepts the payload (the quarantine path's common case: the
      * stream must not leak its cache buffer on every garbage row). */
    private def withReader[A](bytes: Array[Byte])(
        f: javax.imageio.ImageReader => A): A = {
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      var reader: javax.imageio.ImageReader = null
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, "undecodable image payload")
        reader = readers.next()
        reader.setInput(iis)
        f(reader)
      } finally {
        if (reader != null) reader.dispose()
        iis.close()
      }
    }

    def frameCount(bytes: Array[Byte]): Int =
      withReader(bytes)(_.getNumImages(true))

    /** Every frame's gray grid, in stream order. Frames are read as
      * stored (GIF frames may legally be sub-rectangles under disposal
      * composition; fixtures and well-formed pipelines write full
      * frames — a compositing player belongs in a richer codec, not
      * the JDK seam). */
    def frames(bytes: Array[Byte], dim: Int): Seq[Array[Long]] =
      withReader(bytes) { reader =>
        (0 until reader.getNumImages(true)).map(i => grayOf(reader.read(i), dim))
      }

    /** Only the requested frames, decoded through ONE positioned
      * reader — `ImageReader.read(i)` is random-access, so a stride
      * sampler pays for n/stride decodes, not n. */
    def framesAt(bytes: Array[Byte], indices: Seq[Int], dim: Int): Seq[Array[Long]] =
      withReader(bytes) { reader =>
        indices.map(i => grayOf(reader.read(i), dim))
      }

    def decode(bytes: Array[Byte], dim: Int): Array[Float] =
      grayPixels(bytes, dim).map(_ / 255.0f)
  }

  def fromConf(spark: SparkSession): Multimodal.Decoder =
    spark.conf.getOption("spark.graft.media.decoderClass") match {
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor()
          .newInstance().asInstanceOf[Multimodal.Decoder]
      case None => StubDecoder
    }
}
