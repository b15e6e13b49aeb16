package graft.operators

import graft.SparkSpec
import graft.sources.{Sinks, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.Files

/** A no-arg-constructible Decoder for the fromConf swap test (top-level
  * so Class.forName can instantiate it): even/odd byte histogram. */
class TestHistogramDecoder extends Multimodal.Decoder {
  def decode(bytes: Array[Byte], dim: Int): Array[Float] =
    Array.tabulate(dim)(i => bytes.count(b => (b & 0xff) % dim == i).toFloat)
}

class MultimodalSpec extends SparkSpec {
  import Multimodal._

  private def media(n: Int) = {
    import spark.implicits._
    (0 until n).map { i =>
      Media(i.toLong, "image", Array.tabulate(16)(b => (i + b).toByte), 640, 480, "raw")
    }.toDS().repartition(3)
  }

  test("binary schema survives the pipeline; features have fixed width") {
    val feats = extractFeatures(media(10), dim = 8, batchSize = 4)
    feats.schema("features").dataType shouldEqual ArrayType(FloatType, containsNull = false)
    val rows = feats.collect()
    rows.length shouldEqual 10
    all(rows.map(_.features.length)) shouldEqual 8
    rows.foreach(r => r.n_bytes shouldEqual 16)
  }

  test("decode stub is deterministic and pads short payloads") {
    decodeStub(Array[Byte](0, -1), 4).toSeq shouldEqual Seq(0.0f, 1.0f, 0.0f, 0.0f)
    decodeStub(Array[Byte](127), 2)(0) shouldEqual (127 / 255.0f)
  }

  test("the Decoder seam swaps a real decoder in with zero pipeline changes") {
    // a non-stub decoder: byte-count histogram shape instead of raw scaling
    val fake = new Multimodal.Decoder {
      def decode(bytes: Array[Byte], dim: Int): Array[Float] =
        Array.tabulate(dim)(i => bytes.count(b => (b & 0xff) % dim == i).toFloat)
    }
    val feats = extractFeatures(media(10), dim = 4, batchSize = 3, decoder = fake)
    val rows = feats.orderBy("media_id").collect()
    rows.length shouldEqual 10
    // the fake's semantics (a histogram over 16 payload bytes) really ran:
    all(rows.map(_.features.sum)) shouldEqual 16.0f
    // and row 0's payload bytes are 0..15 → uniform histogram over 4 bins
    rows.head.features.toSeq shouldEqual Seq(4.0f, 4.0f, 4.0f, 4.0f)
  }

  test("Decoders.fromConf: stub unless a decoder class is configured") {
    Decoders.fromConf(spark) shouldBe Decoders.StubDecoder
    withSQLConf("spark.graft.media.decoderClass" ->
        classOf[graft.operators.TestHistogramDecoder].getName) {
      val d = Decoders.fromConf(spark)
      d shouldBe a[TestHistogramDecoder]
      d.decode(Array[Byte](1, 1, 3), 2).toSeq shouldEqual Seq(0.0f, 3.0f)
    }
    Decoders.fromConf(spark) shouldBe Decoders.StubDecoder // gate restored
  }

  test("frame_sample emits exactly the even full-frame windows of each video payload") {
    val sf = "/root/testdata/sf0.001"
    val payloads = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 2)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val expected = payloads.flatMap { case (id, t) =>
      val nFrames = t.length / 32
      (0 until nFrames by 2).map { fn =>
        (id, fn, fn * 32 + 1, md5hex(t.substring(fn * 32, fn * 32 + 32)))
      }
    }.sortBy(x => (x._1, x._2))
    val got = graft.SparkEntry.queries("frame_sample")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    got.toSeq shouldEqual expected.toSeq
    // the stride-2 sample takes ⌈n/2⌉ of the full frames — strictly
    // fewer rows than frames for any payload with ≥ 2 frames
    assert(got.nonEmpty)
  }

  test("phash_neardup equals brute-force all-pairs aHash Hamming <= 3 (exact recall)") {
    // the banded equi-join is an OPTIMIZATION, not an approximation:
    // Hamming <= 3 flips at most 3 of the 4 bands, so every qualifying
    // pair shares a band — the registered query must equal the naive
    // quadratic scan exactly
    val sf = "/root/testdata/sf0.001"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val hashes = graft.Tables.documents(spark, sf)
      .filter(col("doc_id") % 3 === 0)
      .select("doc_id", "text").collect()
      .map { r =>
        val (id, t) = (r.getLong(0), r.getString(1))
        val px = Array.tabulate(60) { i =>
          val from = math.min(i * 4, t.length)
          val chunk = t.substring(from, math.min(from + 4, t.length))
          java.lang.Long.parseLong(md5hex(chunk).take(7), 16)
        }
        val tot = px.sum
        val ahash = px.zipWithIndex
          .map { case (p, i) => if (p * 60 > tot) 1L << i else 0L }.sum
        id -> ahash
      }.sortBy(_._1)
    val expected = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      h = java.lang.Long.bitCount(hashes(i)._2 ^ hashes(j)._2) if h <= 3
    } yield (hashes(i)._1, hashes(j)._1, h)).sortBy(t => (t._1, t._2))
    val got = graft.SparkEntry.queries("phash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    got.toSeq shouldEqual expected
    // the fixture exercises both ends: an identical-prefix pair
    // (hamming 0) and a genuinely NEAR pair (0 < hamming <= 3)
    assert(got.exists(_._3 == 0))
    assert(got.exists(t => t._3 > 0 && t._3 <= 3))
  }

  test("real PNG decode (javax.imageio) drives the SAME aHash pipeline as the registered query") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // deterministic in-memory PNGs, 64×64, high-contrast 8-px blocks so
    // aHash bits sit robustly off the mean
    def png(pattern: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, pattern(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val (white, black) = (0xffffff, 0x000000)
    val base = png((x, _) => if (x < 32) white else black)
    val copy = png((x, _) => if (x < 32) white else black) // identical pixels
    // one extra 8×8 cell flipped to white → a genuinely NEAR image
    val near = png((x, y) => if (x < 32 || (x < 40 && y < 8)) white else black)
    val far = png((x, y) => if (((x / 8) + (y / 8)) % 2 == 0) white else black)
    val dec = new Decoders.ImageIoDecoder
    // the decoder really decodes: base's left half is pure white, right
    // half pure black on the 8×8 grid (integer luma, exact)
    val basePx = dec.grayPixels(base, 60)
    basePx.length shouldEqual 60
    basePx.zipWithIndex.foreach { case (p, k) =>
      p shouldEqual (if (k % 8 < 4) 255L else 0L)
    }
    val media = Seq(0L -> base, 1L -> copy, 2L -> near, 3L -> far)
    // REAL pixels in, then everything downstream is the registered
    // query's own code (Multimodal.aHashPairs) — the Decoder-seam
    // claim executed, not argued
    val px = media.flatMap { case (id, bytes) =>
      dec.grayPixels(bytes, 60).zipWithIndex.map { case (p, i) => (id, i, p) }
    }.toDF("media_id", "i", "p")
    val got = aHashPairs(px).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._2))
    // brute force over the same real-pixel hashes (banding is exact at ≤ 3)
    def ahashOf(a: Array[Long]): Long = {
      val tot = a.sum
      a.zipWithIndex.map { case (p, i) => if (p * 60 > tot) 1L << i else 0L }.sum
    }
    val hs = media.map { case (id, b) => id -> ahashOf(dec.grayPixels(b, 60)) }
    val expected = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      h = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2) if h <= 3
    } yield (hs(i)._1, hs(j)._1, h)).sortBy(t => (t._1, t._2))
    got.toSeq shouldEqual expected
    got should contain((0L, 1L, 0))      // identical PNGs → hamming 0
    assert(got.exists(t => t._1 == 0L && t._2 == 2L && t._3 > 0 && t._3 <= 3))
    assert(!got.exists(t => t._1 == 3L || t._2 == 3L)) // far pairs with nobody
  }

  test("real JPEG decode (javax.imageio) drives the SAME aHash pipeline as the registered query") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // JPEG is lossy, so expectations are computed from the DECODED
    // pixels of the actual bytes (self-consistent whatever the codec's
    // rounding) — the semantic asserts then check the lossy round-trip
    // still lands identical/near/far where the patterns put them:
    // high-contrast 8-px blocks sit far from the global mean, so aHash
    // bits are robust to block-edge ringing
    def jpg(pattern: (Int, Int) => Int): Array[Byte] = {
      val img = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 64; x <- 0 until 64) img.setRGB(x, y, pattern(x, y))
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val (white, black) = (0xffffff, 0x000000)
    val base = jpg((x, _) => if (x < 32) white else black)
    val copy = jpg((x, _) => if (x < 32) white else black) // identical bytes
    val near = jpg((x, y) => if (x < 32 || (x < 40 && y < 8)) white else black)
    val far = jpg((x, y) => if (((x / 8) + (y / 8)) % 2 == 0) white else black)
    val dec = new Decoders.ImageIoDecoder
    val media = Seq(0L -> base, 1L -> copy, 2L -> near, 3L -> far)
    val px = media.flatMap { case (id, bytes) =>
      dec.grayPixels(bytes, 60).zipWithIndex.map { case (p, i) => (id, i, p) }
    }.toDF("media_id", "i", "p")
    val got = aHashPairs(px).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(t => (t._1, t._2))
    def ahashOf(a: Array[Long]): Long = {
      val tot = a.sum
      a.zipWithIndex.map { case (p, i) => if (p * 60 > tot) 1L << i else 0L }.sum
    }
    val hs = media.map { case (id, b) => id -> ahashOf(dec.grayPixels(b, 60)) }
    val expected = (for {
      i <- hs.indices; j <- (i + 1) until hs.length
      h = java.lang.Long.bitCount(hs(i)._2 ^ hs(j)._2) if h <= 3
    } yield (hs(i)._1, hs(j)._1, h)).sortBy(t => (t._1, t._2))
    got.toSeq shouldEqual expected
    got should contain((0L, 1L, 0))      // identical JPEG bytes → hamming 0
    assert(got.exists(t => t._1 == 0L && t._2 == 2L && t._3 <= 3))
    assert(!got.exists(t => t._1 == 3L || t._2 == 3L)) // far pairs with nobody
  }

  test("animated GIF frames drive frame_sample's stride sampling over REAL decoded frames") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def frame(pattern: (Int, Int) => Int): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) img.setRGB(x, y, pattern(x, y))
      img
    }
    def gif(frames: Seq[(Int, Int) => Int]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      frames.foreach(p => writer.writeToSequence(
        new javax.imageio.IIOImage(frame(p), null, null), null))
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val (white, black) = (0xffffff, 0x000000)
    def solid(c: Int): (Int, Int) => Int = (_, _) => c
    def halves: (Int, Int) => Int = (x, _) => if (x < 16) white else black
    def checker: (Int, Int) => Int =
      (x, y) => if (((x / 4) + (y / 4)) % 2 == 0) white else black
    // video A: 5 frames; stride 2 samples frames 0, 2, 4
    val gifA = gif(Seq(halves, solid(0x808080), checker, solid(0x404040), halves))
    // video B: 3 frames; stride 2 samples frames 0, 2 — frame 0 is the
    // SAME pattern as A's frame 0 (the planted cross-video duplicate)
    val gifB = gif(Seq(halves, solid(0xC0C0C0), solid(0x202020)))
    val dec = new Decoders.ImageIoDecoder
    // multi-frame access is real: every written frame comes back
    dec.frameCount(gifA) shouldEqual 5
    dec.frameCount(gifB) shouldEqual 3
    // GIF palettes store exact colors: a solid-gray frame decodes to
    // its exact integer luma on every grid cell
    val a1 = dec.frames(gifA, 60)(1)
    a1.foreach(_ shouldEqual (299L * 0x80 + 587L * 0x80 + 114L * 0x80) / 1000L)
    // the Spark side: stride-2 sampling through the FrameDecoder seam,
    // then the registered aHash pipeline over (video, frame) images
    val vids = Seq(0L -> gifA, 1L -> gifB).toDS()
    val px = Multimodal.sampledFramePixels(vids, dim = 60, stride = 2, dec)
    val sampled = px.select("media_id", "frame_no").distinct().collect()
      .map(r => (r.getLong(0), r.getInt(1))).toSet
    sampled shouldEqual Set((0L, 0), (0L, 2), (0L, 4), (1L, 0), (1L, 2))
    val byFrame = px.select(
      (col("media_id") * 100 + col("frame_no")).as("media_id"),
      col("i"), col("p"))
    val pairs = aHashPairs(byFrame).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // A#0 == B#0 (hamming 0) and A#0 == A#4 (the repeated pattern);
    // by transitivity A#4 == B#0 too
    pairs should contain((0L, 100L, 0))
    pairs should contain((0L, 4L, 0))
    pairs should contain((4L, 100L, 0))
    // the checker frame (A#2) matches nobody
    assert(!pairs.exists(t => t._1 == 2L || t._2 == 2L))
  }

  test("frame_sample's REGISTERED stages produce byte-identical fingerprints from decoded GIF frames (r13)") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    // self-contained multi-frame GIF builder (as the stride test above)
    def frame(shade: Int): BufferedImage = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      img
    }
    def gif(shades: Seq[Int]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
      val writer = javax.imageio.ImageIO
        .getImageWritersByFormatName("gif").next()
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      shades.foreach(sh => writer.writeToSequence(
        new javax.imageio.IIOImage(frame(sh), null, null), null))
      writer.endWriteSequence()
      writer.dispose(); ios.close()
      bos.toByteArray
    }
    val vids = Seq(0L -> gif(Seq(0x10, 0x80, 0x30, 0xC0, 0x55)),
                   1L -> gif(Seq(0x20, 0x40, 0x90)))
    val dec = new Decoders.ImageIoDecoder
    val dim = 60
    // canonical frame payload: each gray pixel as exactly 3 digits, so
    // one decoded frame is a fixed-width 180-char "frame" — the shape
    // the registered query's linear `(?s).{F}` split expects
    def enc(px: Array[Long]): String = px.map(p => f"$p%03d").mkString
    val F = dim * 3
    // PATH A — the registered query's stand-in shape verbatim: one
    // concatenated payload per video, regexp frame split, posexplode,
    // then the SHARED frameFingerprints stage
    val payloads = vids.map { case (id, bytes) =>
      (id, dec.frames(bytes, dim).map(px => enc(px.toArray)).mkString)
    }.toDF("media_id", "payload")
    val standIn = Multimodal.frameFingerprints(
      payloads
        .withColumn("frames", expr(s"regexp_extract_all(payload, '(?s).{$F}', 0)"))
        .filter(expr("size(frames) > 0"))
        .select(col("media_id"),
          posexplode(col("frames")).as(Seq("frame_no", "frame"))), F)
    // PATH B — real decode: only the SAMPLED frames decoded
    // (FrameDecoder.framesAt), same canonical encoding, same shared
    // stage. The codec is the ONLY difference between the paths.
    val decoded = vids.flatMap { case (id, bytes) =>
      val idx = 0 until dec.frameCount(bytes) by 2
      dec.framesAt(bytes, idx, dim).zip(idx).map { case (px, fn) =>
        (id, fn, enc(px.toArray))
      }
    }.toDF("media_id", "frame_no", "frame")
    val real = Multimodal.frameFingerprints(decoded, F)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("media_id", "frame_no").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3))).toSeq
    val a = rows(standIn); val b = rows(real)
    a shouldEqual b // byte-identity through the shared md5 stage
    // sampled exactly the even frames: video 0 has 5 → 0,2,4; video 1 has 3 → 0,2
    a.map(t => (t._1, t._2)) shouldEqual
      Seq((0L, 0), (0L, 2), (0L, 4), (1L, 0), (1L, 2))
    // and the fingerprint is the md5 of the REAL pixel payload (pin one
    // row against a locally computed digest so the stage can't drift
    // into hashing something else)
    val f0 = enc(dec.framesAt(vids.head._2, Seq(0), dim).head.toArray)
    val exp = java.security.MessageDigest.getInstance("MD5")
      .digest(f0.getBytes("UTF-8")).map("%02x".format(_)).mkString
    a.head._4 shouldEqual exp
  }

  test("ImageIoDecoder plugs into extractFeatures through the config seam") {
    import spark.implicits._
    import java.awt.image.BufferedImage
    def png(shade: Int): Array[Byte] = {
      val img = new BufferedImage(16, 16, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 16; x <- 0 until 16)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val ds = Seq(
      Media(0L, "image", png(0), 16, 16, "png"),
      Media(1L, "image", png(255), 16, 16, "png")).toDS()
    withSQLConf("spark.graft.media.decoderClass" ->
        classOf[Decoders.ImageIoDecoder].getName) {
      val feats = extractFeatures(ds, dim = 4,
          decoder = Decoders.fromConf(spark))
        .orderBy("media_id").collect()
      feats(0).features.toSeq shouldEqual Seq(0.0f, 0.0f, 0.0f, 0.0f)
      feats(1).features.toSeq shouldEqual Seq(1.0f, 1.0f, 1.0f, 1.0f)
    }
  }

  test("extraction is partition-local (no shuffle) and preserves all rows") {
    val ds = media(100)
    val feats = extractFeatures(ds, dim = 4, batchSize = 7)
    feats.rdd.getNumPartitions shouldEqual ds.rdd.getNumPartitions
    feats.select(countDistinct(col("media_id"))).collect().head.getLong(0) shouldEqual 100
  }

  test("S-2: CSV round-trips documents with an explicit schema") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "lang", "source", "n_chars") // text has no commas but keep it simple
    val dir = Files.createTempDirectory("csv-src").toString + "/docs"
    docs.write.option("header", "true").mode("overwrite").csv(dir)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("lang", StringType),
      StructField("source", StringType), StructField("n_chars", LongType)))
    val back = Sources.csv(spark, dir, schema)
    back.count() shouldEqual docs.count()
    back.schema shouldEqual schema
    Sources.requireColumns(back, Set("doc_id", "lang"))
    an[IllegalArgumentException] should be thrownBy
      Sources.requireColumns(back, Set("doc_id", "missing_col"))
  }

  test("S-2b: JSON-lines round-trips the full documents table with an explicit schema") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("jsonl-src").toString + "/docs"
    docs.write.mode("overwrite").json(dir) // JSONL: one object per line
    val back = Sources.jsonLines(spark, dir, docs.schema)
    back.count() shouldEqual docs.count()
    back.schema shouldEqual docs.schema
    // text (arbitrary content incl. quotes) must survive the round trip
    val a = docs.orderBy("doc_id").select("text").collect().map(_.getString(0))
    val b = back.orderBy("doc_id").select("text").collect().map(_.getString(0))
    b shouldEqual a
  }

  test("S-2c: ORC round-trips documents, and its scan pushes filters + prunes columns") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val dir = Files.createTempDirectory("graft-orc").toString + "/docs"
    docs.write.mode("overwrite").orc(dir)
    val back = Sources.orc(spark, dir, docs.schema)
    back.count() shouldEqual docs.count()
    // identical content under the same ordering
    back.orderBy("doc_id").collect().map(_.toString).toSeq shouldEqual
      docs.orderBy("doc_id").collect().map(_.toString).toSeq
    // the ORC reader participates in the same pushdown/pruning
    // machinery as parquet — the 100 TB reason to stay on native scans
    val plan = back.filter(col("lang") === "en").select("doc_id")
      .queryExecution.executedPlan.toString
    plan should include("PushedFilters")
    plan should include("lang")
  }

  test("S-2b: a malformed JSONL line surfaces as a null-field row, not a dropped one") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("jsonl-bad").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/part.jsonl"),
      "{\"id\": 1, \"s\": \"ok\"}\nnot json at all\n{\"id\": 3, \"s\": \"also ok\"}\n")
    val schema = StructType(Seq(StructField("id", LongType), StructField("s", StringType)))
    val rows = Sources.jsonLines(spark, dir, schema).collect()
    rows.length shouldEqual 3 // PERMISSIVE: the bad line is a row of nulls
    rows.count(_.isNullAt(0)) shouldEqual 1
  }

  test("K-4: jsonRows serializes every row as one compact JSON object") {
    import spark.implicits._
    val rows = Sinks.jsonRows(Seq((1, "a"), (2, null)).toDF("id", "s")).collect()
    rows should contain("""{"id":1,"s":"a"}""")
    rows should contain("""{"id":2}""") // null field omitted, like to_json
  }
}
