package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Exercises the multimodal plumbing end-to-end on real testdata,
  * including the stub-decoded feature vector the DuckDB oracle can't see.
  */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  /** Hand-built 24bpp bottom-up BMP — ONE builder for every image
    * fixture (the dedup and near-dup tests would otherwise fork on a
    * header detail). Callers use widths that keep rows 4-byte aligned
    * or not; the row padding handles both.
    */
  private def bmpOf(img: java.awt.image.BufferedImage): Array[Byte] = {
    val w = img.getWidth; val h = img.getHeight
    val rowBytes = ((3 * w + 3) / 4) * 4
    val bb = java.nio.ByteBuffer.allocate(54 + rowBytes * h)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + rowBytes * h)
      .putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h)
      .putShort(1).putShort(24).putInt(0).putInt(rowBytes * h)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    for (y <- (h - 1) to 0 by -1) { // bottom-up row order
      for (x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        bb.put((rgb & 0xff).toByte) // B
          .put(((rgb >> 8) & 0xff).toByte) // G
          .put(((rgb >> 16) & 0xff).toByte) // R
      }
      bb.position(bb.position() + rowBytes - 3 * w)
    }
    bb.array()
  }

  test("payload bytes + sha + frame samples are consistent and deterministic") {
    val sp = spark
    import sp.implicits._
    val media = Multimodal.attachPayload(Tables.documents(spark, sf))
      .as[Multimodal.MediaRow]
    val feats = Multimodal.extractFeatures(media).toDF().cache()
    try {
      val docs = Tables.documents(spark, sf)
      // n_bytes equals the engine's own byte length of the text
      val mismatch = feats.join(docs, "doc_id")
        .filter(col("n_bytes") =!= octet_length(col("text").cast("binary")))
        .count()
      assert(mismatch == 0)
      // sha256 agrees with Spark's builtin over the same bytes
      val shaBad = feats.join(Multimodal.attachPayload(docs), "doc_id")
        .filter(col("sha256") =!= sha2(col("payload"), 256)).count()
      assert(shaBad == 0)
      // frame samples: 8 values in [0,1], deterministic across runs
      val bad = feats.filter(size(col("frame_sample")) =!= 8 ||
        exists(col("frame_sample"), v => v < 0.0 || v > 1.0)).count()
      assert(bad == 0)
      val again = Multimodal.extractFeatures(media).toDF()
      assert(feats.exceptAll(again).count() == 0)
    } finally feats.unpersist()
  }

  test("real BMP decode: width/height parsed from actual header bytes") {
    val sp = spark
    import sp.implicits._
    // hand-built 3x2 24bpp BMP: 14-byte file header + 40-byte info
    // header + 2 rows of 3 BGR pixels padded to 12 bytes each
    val rowBytes = 12
    val pixels = Array.tabulate[Byte](2 * rowBytes)(i => (i * 7).toByte)
    val bb = java.nio.ByteBuffer.allocate(54 + pixels.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + pixels.length)
      .putInt(0).putInt(54) // reserved, pixel offset
    bb.putInt(40).putInt(3).putInt(2) // dib size, width, height
      .putShort(1).putShort(24).putInt(0).putInt(pixels.length)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    bb.put(pixels)
    val bmp = bb.array()
    val media = Seq(
      Multimodal.MediaRow(1L, "image/bmp", bmp),
      Multimodal.MediaRow(2L, "image/bmp", Array[Byte](1, 2)), // malformed
      Multimodal.MediaRow(3L, "application/octet-stream", bmp)).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f(0).width.contains(3) && f(0).height.contains(2))
    assert(f(0).frame_sample.length == 8 &&
      f(0).frame_sample.forall(v => v >= 0.0 && v <= 1.0))
    // real resize: 16 grayscale values from the actual pixel rows; the
    // top-left thumb cell must equal the top row's first BGR triple mean
    // (bottom-up layout: top row is the LAST stored row)
    val t = f(0).thumb16.get
    assert(t.length == 16 && t.forall(v => v >= 0.0 && v <= 1.0))
    val topRow = rowBytes // second stored row = image top row
    val expected = ((pixels(topRow) & 0xff) + (pixels(topRow + 1) & 0xff) +
      (pixels(topRow + 2) & 0xff)) / (3.0 * 255.0)
    assert(math.abs(t(0) - expected) < 1e-12, s"${t(0)} vs $expected")
    assert(f(1).width.isEmpty, "malformed bmp degrades to stub")
    assert(f(2).width.isEmpty, "unknown mime takes the stub path")
  }

  test("real PNG and GIF dimensions parsed from actual headers") {
    val sp = spark
    import sp.implicits._
    val png = java.nio.ByteBuffer.allocate(33)
    png.put(Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte))
    png.putInt(13).put("IHDR".getBytes).putInt(640).putInt(480)
      .put(Array[Byte](8, 6, 0, 0, 0))
    val gif = java.nio.ByteBuffer.allocate(13)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    gif.put("GIF89a".getBytes).putShort(320).putShort(200)
      .put(Array[Byte](0, 0, 0))
    val media = Seq(
      Multimodal.MediaRow(1L, "image/png", png.array()),
      Multimodal.MediaRow(2L, "image/gif", gif.array()),
      Multimodal.MediaRow(3L, "image/png", "nope".getBytes)).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f(0).width.contains(640) && f(0).height.contains(480))
    assert(f(1).width.contains(320) && f(1).height.contains(200))
    assert(f(2).width.isEmpty, "bad signature degrades to stub")
  }

  test("real PNG pixel decode: inflate + un-filter yields the actual pixels") {
    val sp = spark
    import sp.implicits._
    import java.awt.image.BufferedImage
    // deterministic 8x6 RGB image, written as a real PNG by the JDK
    val w = 8; val h = 6
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w)
      img.setRGB(x, y, ((x * 31) % 256 << 16) | ((y * 41) % 256 << 8) |
        ((x * y * 13) % 256))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val png = bos.toByteArray
    val media = Seq(Multimodal.MediaRow(1L, "image/png", png)).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.width.contains(w) && f.height.contains(h))
    // the PURE decoder samples the raw un-filtered channel-byte stream —
    // distinguishable from the ImageIO fallback (which samples grayscale
    // per pixel). Reconstruct that byte stream from the source image.
    val px = new Array[Int](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val rgb = img.getRGB(x, y)
      val o = (y * w + x) * 3
      px(o) = (rgb >> 16) & 0xff; px(o + 1) = (rgb >> 8) & 0xff
      px(o + 2) = rgb & 0xff
    }
    val nPx = px.length
    val expectedSample = (0 until 8).map { i =>
      px(math.min(nPx - 1, i * math.max(1, nPx / 8))) / 255.0
    }
    assert(f.frame_sample.toSeq == expectedSample,
      "frame_sample must come from the un-filtered pixel bytes " +
        "(pure decoder, not the ImageIO fallback)")
    // 4x4 nearest-neighbor grayscale over the REAL pixels
    val t = f.thumb16.get
    for (ty <- 0 until 4; tx <- 0 until 4) {
      val rgb = img.getRGB(math.min(w - 1, tx * w / 4),
        math.min(h - 1, ty * h / 4))
      val g = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) /
        (3.0 * 255.0)
      assert(math.abs(t(ty * 4 + tx) - g) < 1e-12)
    }
    // corrupt stream: truncate mid-IDAT — degrades, never throws
    val cut = Seq(Multimodal.MediaRow(2L, "image/png",
      png.take(png.length / 2))).toDS()
    val fc = Multimodal.extractFeatures(cut).collect().head
    assert(fc.frame_sample.length == 8)
  }

  test("real JPEG decode through the JDK's bundled codec") {
    val sp = spark
    import sp.implicits._
    import java.awt.image.BufferedImage
    val img = new BufferedImage(16, 12, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16)
      img.setRGB(x, y, if (x < 8) 0xffffff else 0x000000) // left white, right black
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val media = Seq(Multimodal.MediaRow(1L, "image/jpeg", bos.toByteArray)).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.width.contains(16) && f.height.contains(12))
    val t = f.thumb16.get
    // lossy codec: structure must survive — left half bright, right dark
    assert(t(0) > 0.8 && t(1) > 0.8, s"left cells dark: ${t.toSeq}")
    assert(t(2) < 0.2 && t(3) < 0.2, s"right cells bright: ${t.toSeq}")
  }

  test("adversarial BMP header (overflow-sized width) degrades instead of crashing") {
    val sp = spark
    import sp.implicits._
    val bb = java.nio.ByteBuffer.allocate(60)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(60).putInt(0).putInt(54)
    bb.putInt(40).putInt(800000000).putInt(2) // width claims 800M
      .putShort(1).putShort(24).putInt(0).putInt(6)
      .putInt(2835).putInt(2835).putInt(0).putInt(0)
    val media = Seq(Multimodal.MediaRow(1L, "image/bmp", bb.array())).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.thumb16.isEmpty, "lying header must not produce a thumb")
    assert(f.frame_sample.length == 8)
  }

  test("real WAV decode: sample rate and duration parsed from actual chunks") {
    val sp = spark
    import sp.implicits._
    // 8 kHz mono 16-bit, 4000 samples = exactly 500 ms
    val nSamples = 4000
    val bb = java.nio.ByteBuffer.allocate(44 + nSamples * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes).putInt(36 + nSamples * 2).put("WAVE".getBytes)
    bb.put("fmt ".getBytes).putInt(16).putShort(1).putShort(1)
      .putInt(8000).putInt(16000).putShort(2).putShort(16)
    bb.put("data".getBytes).putInt(nSamples * 2)
    (0 until nSamples).foreach(i => bb.putShort((i % 256 - 128).toShort))
    val wav = bb.array()
    val media = Seq(Multimodal.MediaRow(1L, "audio/wav", wav)).toDS()
    val f = Multimodal.extractFeatures(media).collect().head
    assert(f.sample_rate.contains(8000))
    assert(f.duration_ms.exists(d => math.abs(d - 500.0) < 1e-9))
    assert(f.frame_sample.length == 8 &&
      f.frame_sample.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("real mp4 container parse: mvhd duration and tkhd dimensions, no codec") {
    val sp = spark
    import sp.implicits._
    // minimal ISO-BMFF: ftyp + moov(mvhd v0 + trak(tkhd v0));
    // timescale 600, duration 1200 -> 2000 ms; track 640x360 in 16.16
    val bb = java.nio.ByteBuffer.allocate(16 + 216)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    bb.putInt(16).put("ftyp".getBytes).put("isom".getBytes).putInt(0)
    bb.putInt(216).put("moov".getBytes)
    bb.putInt(108).put("mvhd".getBytes).putInt(0) // version+flags
      .putInt(0).putInt(0)                        // ctime, mtime
      .putInt(600).putInt(1200)                   // timescale, duration
      .putInt(0x00010000).putShort(0x0100.toShort)
      .put(new Array[Byte](10)).put(new Array[Byte](36))
      .put(new Array[Byte](24)).putInt(2)
    bb.putInt(100).put("trak".getBytes)
    bb.putInt(92).put("tkhd".getBytes).putInt(0)
      .putInt(0).putInt(0).putInt(1).putInt(0).putInt(1200)
      .put(new Array[Byte](8))
      .putShort(0).putShort(0).putShort(0).putShort(0)
      .put(new Array[Byte](36))
      .putInt(640 << 16).putInt(360 << 16)
    val mp4 = bb.array()
    val media = Seq(
      Multimodal.MediaRow(1L, "video/mp4", mp4),
      Multimodal.MediaRow(2L, "video/mp4", mp4.take(20)), // truncated
      Multimodal.MediaRow(3L, "application/octet-stream", mp4)).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f(0).duration_ms.exists(d => math.abs(d - 2000.0) < 1e-9),
      s"mvhd duration: ${f(0).duration_ms}")
    assert(f(0).width.contains(640) && f(0).height.contains(360))
    assert(f(1).duration_ms.isEmpty && f(1).width.isEmpty, "truncated -> stub")
    assert(f(2).duration_ms.isEmpty, "unclaimed mime stays stubbed")
  }

  test("real mp3 frame-header parse: sample rate + CBR duration estimate") {
    val sp = spark
    import sp.implicits._
    // ID3v2 (empty) + MPEG1 Layer III sync, 128 kbps idx, 44100 Hz idx;
    // 16000 audio bytes at 128 kbps -> exactly 1000 ms
    val audio = 16000
    val bb = java.nio.ByteBuffer.allocate(10 + audio)
    bb.put("ID3".getBytes).put(3.toByte).put(0.toByte).put(0.toByte)
      .putInt(0) // synchsafe size 0
    bb.put(0xff.toByte).put(0xfb.toByte).put(0x90.toByte).put(0x00.toByte)
    val mp3 = bb.array()
    val media = Seq(
      Multimodal.MediaRow(1L, "audio/mpeg", mp3),
      Multimodal.MediaRow(2L, "audio/mpeg", Array[Byte](1, 2, 3))).toDS()
    val f = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(f(0).sample_rate.contains(44100), s"rate: ${f(0).sample_rate}")
    assert(f(0).duration_ms.exists(d => math.abs(d - 1000.0) < 1e-9),
      s"duration: ${f(0).duration_ms}")
    assert(f(1).sample_rate.isEmpty, "no frame sync -> stub")
  }

  test("cross-format image dedup: BMP and PNG of identical pixels pair up") {
    val sp = spark
    import sp.implicits._
    import java.awt.image.BufferedImage
    def image(seed: Int): BufferedImage = {
      val w = 8; val h = 6
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, (((x * 31 + seed) % 256) << 16) |
          (((y * 41) % 256) << 8) | ((x * y * 13) % 256))
      img
    }
    def pngOf(img: BufferedImage): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val a = image(0)
    val media = Seq(
      Multimodal.MediaRow(1L, "image/bmp", bmpOf(a)),
      Multimodal.MediaRow(2L, "image/png", pngOf(a)), // same pixels
      Multimodal.MediaRow(3L, "image/png", pngOf(image(90))), // different
      Multimodal.MediaRow(4L, "text/plain", "no pixels".getBytes)).toDS()
    // byte-level identity CANNOT see through the container: sha256 differs
    val feats = Multimodal.extractFeatures(media).collect().sortBy(_.doc_id)
    assert(feats(0).sha256 != feats(1).sha256)
    assert(Multimodal.contentFingerprint(feats(0)) ==
      Multimodal.contentFingerprint(feats(1)))
    assert(Multimodal.contentFingerprint(feats(3)).isEmpty,
      "stub decode must not fingerprint")
    val pairs = Multimodal.imageDedupPairs(media)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSeq
    assert(pairs == Seq((1L, 2L)), s"got $pairs")
  }

  test("Hamming-banded near-dup: d<=3 pairs found exactly, far pairs excluded") {
    val sp = spark
    import sp.implicits._
    // 8x6 gray image; the 4x4 thumbnail samples pixels x ∈ {0,2,4,6},
    // y ∈ {0,1,3,4}. Gray v=70 quantizes to cell 4 (0100), v=85 to 5
    // (0101) — exactly ONE bit apart, so each override below is one
    // controlled fingerprint-bit flip
    def grayImage(base: Int, overrides: Map[(Int, Int), Int])
        : java.awt.image.BufferedImage = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8) {
        val v = overrides.getOrElse((x, y), base)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      img
    }
    val a = grayImage(70, Map.empty)
    val b = grayImage(70, Map((0, 0) -> 85)) // Hamming 1 from a
    // three flips, all landing in the SAME band (the first thumb row
    // is the top 16 bits): the pigeonhole case — three other bands
    // intact, the pair MUST surface, at the exact d=3 boundary
    val c = grayImage(70, Map((2, 0) -> 85, (4, 0) -> 85, (6, 0) -> 85))
    val far = grayImage(170, Map.empty) // 3 bits off in every cell: 48
    val media = Seq((1L, a), (2L, b), (3L, c), (4L, far))
      .map { case (id, img) =>
        Multimodal.MediaRow(id, "image/bmp", bmpOf(img)) }.toDS()
    val pairs = Multimodal.imageNearDupPairs(media)
      .as[(Long, Long, Long)].collect().toSeq
    // (1,2) d=1; (1,3) d=3 (boundary, pigeonhole-guaranteed); (2,3)
    // d=4 — a candidate via shared bands but over threshold; far: ≥40
    assert(pairs == Seq((1L, 2L, 1L), (1L, 3L, 3L)), s"got $pairs")
    // exact duplicates remain Hamming-0 pairs of the near-dup surface
    val withDup = media.union(Seq(
      Multimodal.MediaRow(5L, "image/bmp", bmpOf(grayImage(70, Map.empty))))
      .toDS())
    val dup = Multimodal.imageNearDupPairs(withDup)
      .filter(col("hamming") === 0)
      .as[(Long, Long, Long)].collect().toSeq
    assert(dup == Seq((1L, 5L, 0L)), s"got $dup")
  }

  test("repartitionBySize bounds partition payload bytes") {
    val media = Multimodal.attachPayload(Tables.documents(spark, sf))
    val parts = Multimodal.repartitionBySize(media, targetBytes = 16 * 1024)
      .rdd.getNumPartitions
    val total = media.agg(sum(octet_length(col("payload")))).head().getLong(0)
    val expected = math.max(1, math.ceil(total.toDouble / (16 * 1024)).toInt)
    assert(parts == expected)
  }
}
