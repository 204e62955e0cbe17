package graft

import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Exercises the multimodal plumbing end-to-end on real testdata,
  * including the stub-decoded feature vector the DuckDB oracle can't see.
  */
class MultimodalSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

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

  test("repartitionBySize bounds partition payload bytes") {
    val media = Multimodal.attachPayload(Tables.documents(spark, sf))
    val parts = Multimodal.repartitionBySize(media, targetBytes = 16 * 1024)
      .rdd.getNumPartitions
    val total = media.agg(sum(octet_length(col("payload")))).head().getLong(0)
    val expected = math.max(1, math.ceil(total.toDouble / (16 * 1024)).toInt)
    assert(parts == expected)
  }
}
