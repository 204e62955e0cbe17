package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed by a batched per-partition pipeline.
  *
  * The Spark-side plumbing — schema, partition sizing, batched
  * iteration shape — is real for every mime. Decoding is REAL for all
  * still-image formats and WAV: BMP/WAV/PNG are pure-JVM parsers (PNG
  * does full IDAT inflate + scanline un-filtering), and jpeg/gif/tiff
  * decode through the JDK's bundled ImageIO codecs (headless, no
  * external libs). mp4/mp3 CONTAINER metadata is also real — an
  * ISO-BMFF box walk (mvhd duration, tkhd dimensions) and an MPEG1
  * Layer III frame-header parse (sample rate, CBR duration) — so the
  * only remaining stub is the compressed SAMPLE decode itself, the one
  * part with no JVM codec; swapping in a real decoder (e.g. ffmpeg
  * JNI) changes only the `decodeAny` dispatch, nothing about the
  * distributed plan.
  *
  * At 100 TB: payloads never shuffle (features are extracted in the scan
  * stage); `repartitionBySize` bounds partition payload bytes so executor
  * memory is sized by config, not by data skew.
  */
object Multimodal {

  // Executor-safe ImageIO: headless (no display server) and no on-disk
  // stream cache (decode must not write executor-local temp files).
  locally {
    if (System.getProperty("java.awt.headless") == null)
      System.setProperty("java.awt.headless", "true")
    javax.imageio.ImageIO.setUseCache(false)
  }

  /** One media row: opaque payload + typed metadata. */
  final case class MediaRow(doc_id: Long, mime: String, payload: Array[Byte])

  /** Decode output. For BMP/WAV payloads the dimension fields are REAL
    * (pure-JVM header parsers below); for other mimes they are None and
    * `frame_sample` falls back to the deterministic stub.
    */
  final case class MediaFeatures(
      doc_id: Long,
      mime: String,
      n_bytes: Long,
      sha256: String,
      // decoded feature vector (pixel/sample bands for BMP/WAV; for
      // stubbed mimes, 8 evenly-spaced byte samples), normalized to [0,1]
      frame_sample: Array[Double],
      width: Option[Int] = None,
      height: Option[Int] = None,
      sample_rate: Option[Int] = None,
      duration_ms: Option[Double] = None,
      // REAL resize output for 24bpp BMP: 4x4 nearest-neighbor grayscale
      // thumbnail in [0,1], row-major top-down — the "decode → resize"
      // stage of a media pipeline, on actually-decoded pixels
      thumb16: Option[Array[Double]] = None)

  /** Attach a binary payload + metadata struct to `documents` (the text
    * bytes stand in for an image/audio blob).
    */
  def attachPayload(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      lit("text/plain").as("mime"),
      col("text").cast("binary").as("payload"))

  // per-thread digest instance: getInstance per ROW on the
  // mapPartitions hot path is the allocation the extractFeatures
  // comment reserves for per-partition init (the Dedup.bandEntries
  // hoist, in ThreadLocal form since decodeAny is called per row)
  private val Sha256 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("SHA-256")
  }

  private def sha256Hex(payload: Array[Byte]): String = {
    val md = Sha256.get()
    md.reset()
    md.digest(payload).map("%02x".format(_)).mkString
  }

  /** STUB: deterministic fake decode for mimes with no offline codec
    * (jpeg/png/mp4...). Swapping in a real decoder (JNI/ffmpeg/javacv)
    * changes only this body; the distributed plan is untouched.
    */
  private def decodeStub(r: MediaRow): MediaFeatures = {
    val n = r.payload.length
    val sample = (0 until 8).map { i =>
      if (n == 0) 0.0
      else (r.payload(math.min(n - 1, i * math.max(1, n / 8))) & 0xff) / 255.0
    }.toArray
    MediaFeatures(r.doc_id, r.mime, n.toLong, sha256Hex(r.payload), sample)
  }

  // ---- real pure-JVM decoders (no external codec needed) ----

  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  /** REAL decode: BMP (BITMAPFILEHEADER + BITMAPINFOHEADER) — actual
    * width/height plus 8 evenly-spaced pixel-byte bands as the feature
    * vector. None on malformed input (caller falls back to the stub).
    */
  private def decodeBmp(r: MediaRow): Option[MediaFeatures] = {
    val b = r.payload
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte) return None
    val pixelOff = le32(b, 10)
    val dibSize = le32(b, 14)
    if (dibSize < 40 || pixelOff < 54 || pixelOff > b.length) return None
    val width = le32(b, 18)
    val rawHeight = le32(b, 22)
    val height = math.abs(rawHeight) // negative = top-down row order
    if (width <= 0 || height <= 0) return None
    val bpp = le16(b, 28)
    val nPix = b.length - pixelOff
    val sample = (0 until 8).map { i =>
      if (nPix <= 0) 0.0
      else (b(pixelOff + math.min(nPix - 1,
        i * math.max(1, nPix / 8))) & 0xff) / 255.0
    }.toArray
    // resize: 4x4 nearest-neighbor grayscale over the real pixel array
    // (24bpp only; rows are 4-byte aligned, bottom-up unless height<0).
    // All row arithmetic in Long: a 54-byte header can CLAIM any width,
    // and ((3*width+3)/4)*4 overflows Int near width ~715M, which made
    // the bounds check pass on garbage and the pixel reads throw.
    // non-24bpp forms (32bpp, palettes): return None so decodeAny's
    // ImageIO fallback produces REAL pixels — a successful-but-
    // thumbless return here made the fallback unreachable and those
    // images silently unfingerprintable (r08 review)
    if (bpp != 24) return None
    val thumb: Option[Array[Double]] =
      {
        val rowSize = ((3L * width + 3) / 4) * 4
        if (pixelOff + rowSize * height > b.length) None
        else Some((for (ty <- 0 until 4; tx <- 0 until 4) yield {
          val px = math.min(width - 1, tx * width / 4)
          val py = math.min(height - 1, ty * height / 4)
          val row = if (rawHeight < 0) py else height - 1 - py
          val off = (pixelOff + row * rowSize + px * 3L).toInt
          ((b(off) & 0xff) + (b(off + 1) & 0xff) + (b(off + 2) & 0xff)) /
            (3.0 * 255.0)
        }).toArray)
      }
    Some(MediaFeatures(r.doc_id, r.mime, b.length.toLong, sha256Hex(b),
      sample, width = Some(width), height = Some(height), thumb16 = thumb))
  }

  /** REAL decode: WAV (RIFF/WAVE, `fmt ` + `data` chunks) — actual
    * sample rate and duration; features are 8 evenly-spaced decoded
    * samples (16-bit aware), normalized to [0,1].
    */
  private def decodeWav(r: MediaRow): Option[MediaFeatures] = {
    val b = r.payload
    def tag(off: Int): String =
      if (off + 4 > b.length) "" else new String(b.slice(off, off + 4), "US-ASCII")
    if (b.length < 44 || tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var off = 12
    var sampleRate, byteRate, bits = 0
    var dataOff, dataLen = -1
    while (off + 8 <= b.length) {
      val id = tag(off); val size = le32(b, off + 4)
      // Long arithmetic: a crafted size near Int.MaxValue overflows the
      // Int sum negative and slips past the guard (r08 review)
      if (size < 0 || off + 8L + size > b.length) return None
      if (id == "fmt " && size >= 16) {
        sampleRate = le32(b, off + 12); byteRate = le32(b, off + 16)
        bits = le16(b, off + 22)
      } else if (id == "data") { dataOff = off + 8; dataLen = size }
      off += 8 + size + (size & 1) // chunks are word-aligned
    }
    if (sampleRate <= 0 || byteRate <= 0 || dataOff < 0) return None
    val durationMs = dataLen * 1000.0 / byteRate
    val nSamples = if (bits == 16) dataLen / 2 else dataLen
    val sample = (0 until 8).map { i =>
      if (nSamples <= 0) 0.0
      else {
        val s = math.min(nSamples - 1, i * math.max(1, nSamples / 8))
        if (bits == 16) { // signed LE sample -> [0,1]
          val v = le16(b, dataOff + s * 2).toShort
          (v / 32768.0 + 1.0) / 2.0
        } else (b(dataOff + s) & 0xff) / 255.0
      }
    }.toArray
    Some(MediaFeatures(r.doc_id, r.mime, b.length.toLong, sha256Hex(b),
      sample, sample_rate = Some(sampleRate), duration_ms = Some(durationMs)))
  }

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  /** PNG Paeth predictor (RFC 2083 §6.6). */
  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** Pixel-decode size cap: refuse to inflate claimed dimensions beyond
    * this many raw bytes (a 33-byte header can claim a 2G-pixel image).
    * Over-cap images degrade to header-only features.
    */
  private val MaxRawBytes = 64L * 1024 * 1024

  /** REAL decode: PNG — full pixel decode in pure JVM: IDAT chunks
    * inflate through `java.util.zip.Inflater`, scanlines un-filter per
    * RFC 2083 (None/Sub/Up/Average/Paeth), yielding real pixels for a
    * real `frame_sample` and 4×4 grayscale `thumb16`, exactly like BMP.
    * Covers 8-bit-depth gray/RGB/gray+alpha/RGBA/palette, non-
    * interlaced — the shapes virtually every training-corpus PNG uses;
    * anything else (16-bit, Adam7) falls back to the ImageIO decoder,
    * then to header-only dims.
    */
  private def decodePng(r: MediaRow): Option[MediaFeatures] = {
    val b = r.payload
    val sig = Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)
    if (b.length < 33 || !b.take(8).sameElements(sig)) return None
    if (new String(b.slice(12, 16), "US-ASCII") != "IHDR") return None
    val w = be32(b, 16); val h = be32(b, 20)
    if (w <= 0 || h <= 0) return None
    val bitDepth = b(24) & 0xff
    val colorType = b(25) & 0xff
    val interlace = b(28) & 0xff
    val channels = colorType match {
      case 0 => 1; case 2 => 3; case 3 => 1; case 4 => 2; case 6 => 4
      case _ => -1
    }
    def headerOnly = Some(
      scala.util.Try(decodeImageIO(r)).toOption.flatten.getOrElse(
        decodeStub(r).copy(width = Some(w), height = Some(h))))
    val rawLen = w.toLong * h * math.max(channels, 1) + h
    if (bitDepth != 8 || channels < 0 || interlace != 0 ||
      rawLen > MaxRawBytes) return headerOnly
    // chunk walk: concatenate IDAT, grab PLTE for palette images
    val idat = new java.io.ByteArrayOutputStream()
    var plte: Array[Byte] = null
    var off = 8
    var end = false
    while (!end && off + 8 <= b.length) {
      val len = be32(b, off)
      val typ = new String(b.slice(off + 4, off + 8), "US-ASCII")
      if (len < 0 || off + 8 + len.toLong + 4 > b.length) return headerOnly
      if (typ == "IDAT") idat.write(b, off + 8, len)
      else if (typ == "PLTE") plte = b.slice(off + 8, off + 8 + len)
      else if (typ == "IEND") end = true
      off += 8 + len + 4 // data + CRC
    }
    if (idat.size() == 0) return headerOnly
    if (colorType == 3 && (plte == null || plte.length < 3)) return headerOnly
    // inflate the filtered scanline stream
    val filtered = new Array[Byte](rawLen.toInt)
    val inf = new java.util.zip.Inflater()
    inf.setInput(idat.toByteArray)
    var produced = 0
    try {
      while (produced < filtered.length && !inf.finished()) {
        val n = inf.inflate(filtered, produced, filtered.length - produced)
        // n == 0 without finishing means the stream cannot progress:
        // truncated input, an FDICT preset-dictionary demand, or any
        // other stall — ALL must exit, or a crafted zlib header spins
        // this loop forever at 100% CPU (r08 review; the CBOR skipItem
        // remote-DoS class)
        if (n == 0) return headerOnly
        produced += n
      }
    } catch {
      case _: java.util.zip.DataFormatException => return headerOnly
    } finally inf.end()
    if (produced < filtered.length) return headerOnly
    // un-filter scanlines (each row: 1 filter byte + w*channels bytes)
    val stride = w * channels
    val px = new Array[Byte](stride * h)
    var y = 0
    while (y < h) {
      val rowOff = y * (stride + 1)
      val filter = filtered(rowOff) & 0xff
      if (filter > 4) return headerOnly
      val dst = y * stride
      var x = 0
      while (x < stride) {
        val a = if (x >= channels) px(dst + x - channels) & 0xff else 0
        val u = if (y > 0) px(dst - stride + x) & 0xff else 0
        val c = if (y > 0 && x >= channels)
          px(dst - stride + x - channels) & 0xff else 0
        val raw = filtered(rowOff + 1 + x) & 0xff
        val rec = filter match {
          case 0 => raw
          case 1 => raw + a
          case 2 => raw + u
          case 3 => raw + ((a + u) / 2)
          case 4 => raw + paeth(a, u, c)
        }
        px(dst + x) = (rec & 0xff).toByte
        x += 1
      }
      y += 1
    }
    def gray(xi: Int, yi: Int): Double = {
      val o = yi * stride + xi * channels
      colorType match {
        case 0 | 4 => (px(o) & 0xff) / 255.0
        case 2 | 6 =>
          ((px(o) & 0xff) + (px(o + 1) & 0xff) + (px(o + 2) & 0xff)) /
            (3.0 * 255.0)
        case 3 =>
          val i = (px(o) & 0xff) * 3
          if (i + 2 < plte.length)
            ((plte(i) & 0xff) + (plte(i + 1) & 0xff) + (plte(i + 2) & 0xff)) /
              (3.0 * 255.0)
          else 0.0
      }
    }
    val nPx = px.length
    val sample = (0 until 8).map { i =>
      (px(math.min(nPx - 1, i * math.max(1, nPx / 8))) & 0xff) / 255.0
    }.toArray
    val thumb = (for (ty <- 0 until 4; tx <- 0 until 4) yield
      gray(math.min(w - 1, tx * w / 4), math.min(h - 1, ty * h / 4))).toArray
    Some(MediaFeatures(r.doc_id, r.mime, b.length.toLong, sha256Hex(b),
      sample, width = Some(w), height = Some(h), thumb16 = Some(thumb)))
  }

  /** REAL decode via the JDK's bundled ImageIO codecs (headless, cache
    * off, zero external deps): jpeg/png/gif/bmp/tiff decode to actual
    * pixels in a stock JVM. Primary path for jpeg/tiff; fallback for
    * shapes the pure parsers skip (interlaced or 16-bit PNG, animated
    * GIF frames beyond the first).
    */
  private def decodeImageIO(r: MediaRow): Option[MediaFeatures] = {
    // DIMENSION PRECHECK before any pixel allocation: ImageIO.read
    // allocates the full claimed-dimension BufferedImage up front, so a
    // 33-byte header claiming 100000x100000 would OOM the executor —
    // an Error the Try/NonFatal fence around decodeAny cannot catch,
    // turning one crafted blob into the task-retry storm the decode
    // contract forbids. ImageReader yields width/height from the
    // header without touching pixels; anything claiming more than
    // MaxRawBytes/4 ARGB pixels degrades to the stub like any other
    // undecodable payload.
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(r.payload))
    if (iis == null) return None
    val claimed =
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) None
        else {
          val rd = readers.next()
          try {
            rd.setInput(iis)
            Some((rd.getWidth(0).toLong, rd.getHeight(0).toLong))
          } finally rd.dispose()
        }
      } finally iis.close()
    claimed match {
      case Some((w, h)) if w > 0 && h > 0 && w * h <= MaxRawBytes / 4 => ()
      case _ => return None
    }
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(r.payload))
    if (img == null) return None
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return None
    def gray(x: Int, y: Int): Double = {
      val rgb = img.getRGB(x, y)
      (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) /
        (3.0 * 255.0)
    }
    val n = w.toLong * h
    val sample = (0 until 8).map { i =>
      val idx = math.min(n - 1, i * math.max(1L, n / 8))
      gray((idx % w).toInt, (idx / w).toInt)
    }.toArray
    val thumb = (for (ty <- 0 until 4; tx <- 0 until 4) yield
      gray(math.min(w - 1, tx * w / 4), math.min(h - 1, ty * h / 4))).toArray
    Some(MediaFeatures(r.doc_id, r.mime, r.payload.length.toLong,
      sha256Hex(r.payload), sample, width = Some(w), height = Some(h),
      thumb16 = Some(thumb)))
  }

  /** REAL decode: GIF logical-screen dimensions (little-endian uint16
    * behind the GIF87a/GIF89a signature).
    */
  private def decodeGif(r: MediaRow): Option[MediaFeatures] = {
    val b = r.payload
    if (b.length < 10) return None
    val sig = new String(b.take(6), "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) return None
    Some(decodeStub(r).copy(width = Some(w), height = Some(h)))
  }

  // ---- container METADATA parsers: mp4 (ISO-BMFF) and mp3 frames ----
  // The last honest stubs are the mp4/mp3 SAMPLE decoders (no JVM
  // codec exists); the CONTAINERS are plain structured bytes, so
  // duration / dimensions / rates parse for real — the same honesty
  // split PNG had (header real, pixels stubbed) before its pixel
  // decode landed.

  private def be32L(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)
  private def be64L(b: Array[Byte], off: Int): Long =
    (be32L(b, off) << 32) | be32L(b, off + 4)

  /** ISO-BMFF (mp4/mov/m4a) container walk — REAL mvhd
    * timescale/duration and the first video track's tkhd dimensions
    * (16.16 fixed point), no codec involved. Sample decode stays the
    * stub. None unless the payload leads with an `ftyp` box and
    * carries a sane mvhd (caller falls back to the stub).
    */
  private def decodeMp4(r: MediaRow): Option[MediaFeatures] = {
    val b = r.payload
    if (b.length < 16 || new String(b, 4, 4, "US-ASCII") != "ftyp") return None
    var ts = 0L; var dur = -1L; var w = 0; var h = 0
    def walk(start: Int, end: Int, depth: Int): Unit = {
      // depth bound (r07 review): a crafted payload nesting thousands
      // of moov/trak boxes would StackOverflowError — an Error, which
      // escapes decodeAny's NonFatal fence and kills the TASK (the
      // retry storm one corrupt blob must never cause). Real files
      // nest a handful of levels.
      if (depth > 16) return
      var off = start
      while (off + 8 <= end) {
        var size = be32L(b, off)
        val typ = new String(b, off + 4, 4, "US-ASCII")
        var hdr = 8
        if (size == 1 && off + 16 <= end) { size = be64L(b, off + 8); hdr = 16 }
        else if (size == 0) size = (end - off).toLong
        if (size < hdr || size > end - off) return // malformed: stop walking
        val p = off + hdr
        // field reads bound by the BOX'S OWN extent, not the parent's
        // end — a truncated mvhd/tkhd otherwise reads sibling bytes as
        // timescale/duration/dimensions (r07 review)
        val boxEnd = off + size.toInt
        typ match {
          case "moov" | "trak" => walk(p, boxEnd, depth + 1)
          case "mvhd" =>
            val v = b(p) & 0xff
            if (v == 1 && p + 32 <= boxEnd) {
              ts = be32L(b, p + 20); dur = be64L(b, p + 24)
            } else if (v == 0 && p + 20 <= boxEnd) {
              ts = be32L(b, p + 12); dur = be32L(b, p + 16)
            }
          case "tkhd" if w == 0 =>
            val v = b(p) & 0xff
            val wOff = p + (if (v == 1) 88 else 76)
            if (wOff + 8 <= boxEnd) {
              val tw = (be32L(b, wOff) >> 16).toInt
              val th = (be32L(b, wOff + 4) >> 16).toInt
              if (tw > 0 && th > 0) { w = tw; h = th }
            }
          case _ => ()
        }
        off += size.toInt
      }
    }
    walk(0, b.length, 0)
    if (ts <= 0 || dur < 0) return None
    Some(decodeStub(r).copy(
      width = if (w > 0) Some(w) else None,
      height = if (h > 0) Some(h) else None,
      duration_ms = Some(dur.toDouble * 1000.0 / ts)))
  }

  private val Mp3Bitrates = // MPEG1 Layer III, kbit/s (index 1-14)
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val Mp3Rates = Array(44100, 48000, 32000) // MPEG1 sample rates

  /** MP3 frame-header parse — REAL sample rate and a bitrate-derived
    * duration estimate from the first MPEG1 Layer III frame sync
    * (after an optional ID3v2 tag). CBR assumption for the duration —
    * the standard container-level estimate; sample decode stays the
    * stub. None when no valid frame header is found.
    */
  private def decodeMp3(r: MediaRow): Option[MediaFeatures] = {
    val b = r.payload
    if (b.length < 4) return None
    // skip ID3v2: "ID3" + ver(2) + flags(1) + synchsafe size(4)
    var off = 0
    if (b.length >= 10 && b(0) == 'I' && b(1) == 'D' && b(2) == '3') {
      val sz = ((b(6) & 0x7f) << 21) | ((b(7) & 0x7f) << 14) |
        ((b(8) & 0x7f) << 7) | (b(9) & 0x7f)
      off = 10 + sz
    }
    if (off + 4 > b.length) return None
    val h0 = b(off) & 0xff; val h1 = b(off + 1) & 0xff
    val h2 = b(off + 2) & 0xff
    // sync + MPEG1 (version bits 11) + Layer III (layer bits 01)
    if (h0 != 0xff || (h1 & 0xe0) != 0xe0) return None
    if (((h1 >> 3) & 3) != 3 || ((h1 >> 1) & 3) != 1) return None
    val bi = (h2 >> 4) & 0xf; val si = (h2 >> 2) & 3
    if (bi == 0 || bi == 15 || si == 3) return None
    val kbps = Mp3Bitrates(bi)
    val durMs = (b.length - off).toDouble * 8.0 / kbps // /1000*1000
    Some(decodeStub(r).copy(
      sample_rate = Some(Mp3Rates(si)),
      duration_ms = Some(durMs)))
  }

  /** Mime dispatch: real decoder where one exists, stub otherwise. Every
    * real decoder is exception-fenced: a malformed or adversarial
    * payload (truncated stream, lying header) degrades to the stub
    * rather than failing the whole partition (corpus-loader skip
    * semantics) — one corrupt blob in a 100 TB corpus must cost one row,
    * not a task retry storm.
    */
  private def decodeAny(r: MediaRow): MediaFeatures = {
    def safe(f: MediaRow => Option[MediaFeatures]): Option[MediaFeatures] =
      scala.util.Try(f(r)).toOption.flatten
    // a NULL payload (poison row — the r07 streaming class) degrades to
    // the zero-length stub instead of NPEing the task outside every
    // fence (r08 review: one corrupt blob must cost one row)
    if (r.payload == null)
      return MediaFeatures(r.doc_id, r.mime, 0L, "", Array.fill(8)(0.0))
    (r.mime match {
      case "image/bmp" => safe(decodeBmp).orElse(safe(decodeImageIO))
      case "image/png" => safe(decodePng) // falls back to ImageIO inside
      case "image/gif" => safe(decodeImageIO).orElse(safe(decodeGif))
      case "image/jpeg" | "image/jpg" | "image/tiff" => safe(decodeImageIO)
      case "audio/wav" | "audio/x-wav" => safe(decodeWav)
      case "video/mp4" | "audio/mp4" | "video/quicktime" => safe(decodeMp4)
      case "audio/mpeg" | "audio/mp3" => safe(decodeMp3)
      case _ => None
    }).getOrElse(decodeStub(r))
  }

  /** Batched per-partition feature extraction — the Scala analogue of a
    * pandas_func over mapInPandas: one iterator pass per partition, heavy
    * init (the decoder) amortized per partition, constant memory.
    */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition init lives here (decoder handles, model weights...)
      it.map(decodeAny)
    }
  }

  /** 64-bit content fingerprint of a decoded image: each of the 16
    * grayscale thumbnail cells quantized to 4 bits, packed row-major.
    * Identical PIXELS → identical fingerprint regardless of container
    * format (a BMP and a PNG of the same image collide on purpose —
    * byte-level hashes like sha256 cannot see through the encoding).
    * None when the payload had no real pixel decode.
    */
  def contentFingerprint(f: MediaFeatures): Option[Long] =
    f.thumb16.map(_.foldLeft(0L)((acc, g) =>
      (acc << 4) | math.min(15L, (g * 16).toLong)))

  /** Cross-format duplicate-image pairs — the image-side q30: decode →
    * fingerprint → equality join within fingerprint buckets. Only
    * (fingerprint, doc_id) pairs shuffle; payloads never move past the
    * decode stage. At 100 TB the fingerprint table is ~16 bytes/image
    * — a Hamming-banded variant (q58's shape) upgrades this from exact
    * to NEAR-duplicate matching on the same layout.
    */
  def imageDedupPairs(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    // materialized: both self-join sides read ONE decode pass — the
    // full inflate/ImageIO pipeline is the dominant cost and ran twice
    // (r08 review); the fingerprint relation is ~16 bytes/image
    val fps = graft.queries.Scratch.materialize(
      extractFeatures(media)
        .flatMap(f => contentFingerprint(f).map(fp => (f.doc_id, fp)))
        .toDF("doc_id", "fingerprint"),
      "mm_fps")
    fps.as("a").join(fps.as("b"),
        col("a.fingerprint") === col("b.fingerprint") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fingerprint").as("fingerprint"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Cross-format NEAR-duplicate image pairs — the Hamming-banded
    * upgrade [[imageDedupPairs]]'s doc promises (q58's SimHash-banding
    * shape on the same 16-byte layout): the 64-bit content fingerprint
    * splits into four 16-bit bands, candidates share ≥1 exact band, and
    * survivors confirm on full bit-Hamming ≤ `maxHamming`. Pigeonhole
    * makes 4×16 banding EXACT for d ≤ 3: four bands cannot all differ
    * on ≤3 flipped bits, so every qualifying pair is a candidate —
    * recall 1.0 by construction, like q58's 4×16-bit SimHash bands.
    *
    * Distance semantics, stated: the fingerprint is 16 grayscale cells
    * quantized to 4 bits, so bit-Hamming is a locality signal (a cell
    * drifting one gray step usually flips 1 bit; a quantization-
    * boundary crossing like 0111→1000 can flip 4), not a per-cell
    * count — the standard perceptual-hash trade, confirmed cheap here
    * precisely because the confirm is one xor+popcount on longs.
    *
    * Scale shape, identical to the exact variant: one decode pass
    * (materialized), then only (doc_id, band_key) and fingerprint
    * longs shuffle; the band join is equi-keyed (never all-pairs), and
    * a degenerate band (e.g. all-black thumbnails) is the q31/q58
    * stop-bucket argument — cap candidates per band upstream if a
    * corpus exhibits one.
    */
  def imageNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 3)
      : DataFrame = {
    require(maxHamming >= 0 && maxHamming <= 3,
      s"4x16 banding is pigeonhole-exact only for maxHamming <= 3, got $maxHamming")
    import media.sparkSession.implicits._
    val fps = graft.queries.Scratch.materialize(
      extractFeatures(media)
        .flatMap(f => contentFingerprint(f).map(fp => (f.doc_id, fp)))
        .toDF("doc_id", "fingerprint"),
      "mm_nfps")
    // shiftrightunsigned: the top nibble is the first folded cell, so a
    // bright first cell sets the sign bit and an arithmetic >> would
    // smear it across the high band keys
    val banded = fps.select(col("doc_id"), col("fingerprint"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        expr(s"shiftrightunsigned(fingerprint, ${b * 16}) & 65535")
          .as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("fingerprint"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.fingerprint").as("fp_a"), col("b.fingerprint").as("fp_b"))
      .distinct() // a pair may collide on several bands
      .withColumn("hamming",
        expr("bit_count(fp_a ^ fp_b)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Size-bounded repartition: target ~`targetBytes` of payload per
    * partition, so decode memory is bounded regardless of row-size skew.
    */
  def repartitionBySize(media: DataFrame, targetBytes: Long): DataFrame = {
    // TWO-TIER assignment (r08 review): plain repartition(parts) deals
    // rows out by COUNT, so one 10 GB blob drags its count-share of
    // small rows into the same partition and the stated bytes-bound
    // breaks under row-size skew. Rows at or above targetBytes are
    // split off and spread by id (a single giant row owning its
    // partition is the irreducible case); the small tier is
    // count-balanced against ITS OWN byte total, where row sizes are
    // bounded by targetBytes and the average-based count is a real
    // bytes bound (≤ 2x target per partition).
    val sz = octet_length(col("payload")).cast("long")
    val Seq((smallTotal, nBig)) = {
      import media.sparkSession.implicits._
      media.agg(
        sum(when(sz < targetBytes, sz).otherwise(lit(0L))),
        sum(when(sz >= targetBytes, 1L).otherwise(lit(0L))))
        .as[(Option[Long], Option[Long])].collect().toSeq
        .map { case (s, b) => (s.getOrElse(0L), b.getOrElse(0L)) }
    }
    val smallParts = math.max(1,
      math.ceil(smallTotal.toDouble / targetBytes).toInt)
    val small = media.filter(sz < targetBytes || sz.isNull)
      .repartition(smallParts)
    if (nBig == 0) small
    else small.unionByName(
      media.filter(sz >= targetBytes)
        .repartition(math.max(1, nBig).toInt, col("doc_id")))
  }

  /** End-to-end pipeline as a catalog query (oracle-able columns only —
    * the frame_sample stub output is exercised by MultimodalSpec).
    */
  def featureQuery(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val media = attachPayload(graft.Tables.documents(spark, sfDir))
      .as[MediaRow]
    extractFeatures(media).toDF()
      .select(col("doc_id"), col("mime"), col("n_bytes"), col("sha256"))
      .orderBy(col("doc_id"))
  }

  val featureOracleSql: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |  octet_length(encode(text)) AS n_bytes,
      |  sha256(text) AS sha256
      |FROM documents ORDER BY doc_id""".stripMargin
}
