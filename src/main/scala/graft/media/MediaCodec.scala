package graft.media

import java.util.zip.CRC32

/** Real media-container codec for the multimodal column lane — pure JVM,
  * no codec library (SURVEY.md §2.1 multimodal; the reference has no media
  * path, this is an engine-native extension).
  *
  * Decode side: honest header parsing — PNG by walking length-prefixed
  * chunks to IHDR/IDAT (spec: 8-byte signature, big-endian u32 fields),
  * JPEG by walking FF-marker segments to SOF0/1/2 (precision, height,
  * width), sniffing unsupported containers (RIFF/WEBP) to None. Pixel
  * decoding would need a codec; dimensions/bit-depth/data-section never do.
  *
  * Encode side: synthesizes structurally-valid containers around an
  * arbitrary data payload (PNG chunk CRCs are real CRC32s; JPEG carries
  * JFIF APP0 + SOF0) so tests and queries can build deterministic binary
  * payloads from the test tables and cross-check the parser against the
  * JDK's own ImageReader header path.
  */
object MediaCodec {

  /** Parsed container metadata + location of the embedded data section.
    * The geometry fields are modality-generic: for images width/height are
    * pixels and bitDepth the sample precision; for audio (wav) width is
    * the SAMPLE RATE, height the CHANNEL count, and bitDepth the bits per
    * sample — one typed row shape for the whole multimodal column, the
    * dims-array convention metadata stores use. */
  final case class MediaMeta(
      format: String,
      width: Int,
      height: Int,
      bitDepth: Int,
      dataOffset: Int,
      dataLength: Int
  )

  private val pngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, (v >>> 16).toByte, (v >>> 8).toByte, v.toByte)

  private def be16(v: Int): Array[Byte] = Array((v >>> 8).toByte, v.toByte)

  private def readBe32(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 24) | ((p(off + 1) & 0xff) << 16) |
      ((p(off + 2) & 0xff) << 8) | (p(off + 3) & 0xff)

  private def readBe16(p: Array[Byte], off: Int): Int =
    ((p(off) & 0xff) << 8) | (p(off + 1) & 0xff)

  // --- encoders ----------------------------------------------------------

  private def pngChunk(tpe: String, data: Array[Byte]): Array[Byte] = {
    val t = tpe.getBytes("US-ASCII")
    val crc = new CRC32
    crc.update(t); crc.update(data)
    be32(data.length) ++ t ++ data ++ be32(crc.getValue.toInt)
  }

  /** Container size: 8 (sig) + 25 (IHDR) + 12+N (IDAT) + 12 (IEND) = 57+N. */
  def encodePng(width: Int, height: Int, bitDepth: Int, data: Array[Byte]): Array[Byte] = {
    val ihdr = be32(width) ++ be32(height) ++
      Array(bitDepth.toByte, 2.toByte /* truecolor */, 0.toByte, 0.toByte, 0.toByte)
    pngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", data) ++ pngChunk("IEND", Array.empty)
  }

  /** RE-WRAPPED PNG: the same pixel payload in a different container
    * layout — a tEXt ancillary chunk (keyword "Comment") rides between
    * IHDR and IDAT, so the data section is byte-identical to
    * [[encodePng]]'s while its offset, the chunk sequence, and the
    * container size all differ. Size: 57 + N + 12 + (8 + comment bytes).
    * This is the multimodal near-dup case: fixed-offset slicing sees two
    * different blobs, honest chunk walking recovers identical frames. */
  def encodePngRewrapped(width: Int, height: Int, bitDepth: Int,
                         data: Array[Byte], comment: String): Array[Byte] = {
    val ihdr = be32(width) ++ be32(height) ++
      Array(bitDepth.toByte, 2.toByte /* truecolor */, 0.toByte, 0.toByte, 0.toByte)
    val text = ("Comment\u0000" + comment).getBytes("ISO-8859-1")
    pngSig ++ pngChunk("IHDR", ihdr) ++ pngChunk("tEXt", text) ++
      pngChunk("IDAT", data) ++ pngChunk("IEND", Array.empty)
  }

  /** SOI + JFIF APP0 (18) + SOF0 (19) + SOS (14) + data + EOI: size 55+N.
    * The data payload rides as the entropy-coded section after SOS — the
    * JDK's own JPEG header reader requires the SOS marker to be present. */
  def encodeJpeg(width: Int, height: Int, data: Array[Byte]): Array[Byte] = {
    val soi = Array(0xff, 0xd8).map(_.toByte)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ be16(16) ++
      "JFIF".getBytes("US-ASCII") ++ Array[Byte](0, 1, 1, 0) ++
      be16(72) ++ be16(72) ++ Array[Byte](0, 0)
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ be16(17) ++
      Array(8.toByte) ++ be16(height) ++ be16(width) ++ Array(3.toByte) ++
      Array[Byte](1, 0x22, 0, 2, 0x11, 1, 3, 0x11, 1)
    val sos = Array(0xff, 0xda).map(_.toByte) ++ be16(12) ++
      Array(3.toByte) ++ Array[Byte](1, 0, 2, 0x11, 3, 0x11) ++
      Array[Byte](0, 63, 0)
    soi ++ app0 ++ sof0 ++ sos ++ data ++ Array(0xff, 0xd9).map(_.toByte)
  }

  /** RIFF/WEBP shell — a format this engine's parser intentionally does
    * not decode (the sniff-to-None path). */
  def encodeWebp(data: Array[Byte]): Array[Byte] = {
    val size = 4 + data.length
    "RIFF".getBytes("US-ASCII") ++ le32(size) ++
      "WEBP".getBytes("US-ASCII") ++ data
  }

  private def le32(v: Int): Array[Byte] =
    Array(v.toByte, (v >>> 8).toByte, (v >>> 16).toByte, (v >>> 24).toByte)

  private def le16(v: Int): Array[Byte] = Array(v.toByte, (v >>> 8).toByte)

  private def readLe32(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8) |
      ((p(off + 2) & 0xff) << 16) | ((p(off + 3) & 0xff) << 24)

  private def readLe16(p: Array[Byte], off: Int): Int =
    (p(off) & 0xff) | ((p(off + 1) & 0xff) << 8)

  private def wavFmt(sampleRate: Int, channels: Int, bitsPerSample: Int): Array[Byte] = {
    val blockAlign = channels * bitsPerSample / 8
    "fmt ".getBytes("US-ASCII") ++ le32(16) ++
      le16(1 /* PCM */) ++ le16(channels) ++ le32(sampleRate) ++
      le32(sampleRate * blockAlign) ++ le16(blockAlign) ++ le16(bitsPerSample)
  }

  /** RIFF/WAVE container (canonical PCM layout, all little-endian):
    * "RIFF" + size + "WAVE", a 16-byte "fmt " chunk, then the "data"
    * chunk carrying the payload. Size: 12 + 24 + 8 + N = 44 + N. */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
      data: Array[Byte]): Array[Byte] =
    "RIFF".getBytes("US-ASCII") ++ le32(36 + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      wavFmt(sampleRate, channels, bitsPerSample) ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data

  /** RE-WRAPPED WAV: identical PCM payload, different container — a LIST
    * metadata chunk rides between fmt and data, shifting the data offset
    * and growing the container by 8 + comment bytes (+1 RIFF pad byte when
    * the comment is odd-length — chunks align to even offsets). The audio
    * analog of [[encodePngRewrapped]]. Size: 44 + N + 8 + c + (c mod 2). */
  def encodeWavRewrapped(sampleRate: Int, channels: Int, bitsPerSample: Int,
      data: Array[Byte], comment: String): Array[Byte] = {
    val c = comment.getBytes("ISO-8859-1")
    val pad: Array[Byte] = if (c.length % 2 == 1) Array(0.toByte) else Array.empty
    "RIFF".getBytes("US-ASCII") ++
      le32(36 + 8 + c.length + pad.length + data.length) ++
      "WAVE".getBytes("US-ASCII") ++
      wavFmt(sampleRate, channels, bitsPerSample) ++
      "LIST".getBytes("US-ASCII") ++ le32(c.length) ++ c ++ pad ++
      "data".getBytes("US-ASCII") ++ le32(data.length) ++ data
  }

  // --- BMP (DIB still image) ---------------------------------------------

  /** 8-bit palette grayscale BMP (BITMAPFILEHEADER + BITMAPINFOHEADER +
    * 256-entry gray palette + bottom-up pixel rows padded to 4-byte
    * stride). `pixels` is the logical TOP-DOWN row-major luma array
    * (w × h bytes); the encoder flips to the on-disk bottom-up order and
    * inserts the row padding — so a naive fixed-stride walk of the file
    * reads garbage pad bytes and the wrong row order, the honest-parse
    * device of this container. Size: 14 + 40 + 1024 + stride·h. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    // Long comparisons: width*height can wrap Int for absurd geometry,
    // which would slip past an Int equality and surface later as an
    // opaque ArrayIndexOutOfBoundsException instead of this message
    require(width >= 1 && height >= 1 &&
      pixels.length.toLong == width.toLong * height,
      s"bad bmp geometry: $width x $height vs ${pixels.length}")
    require(((width.toLong + 3) & ~3L) * height + 1078L <= Int.MaxValue,
      s"bmp container for $width x $height exceeds the Int-addressable array limit")
    val stride = (width + 3) & ~3
    val pixOff = 14 + 40 + 256 * 4
    val fileSize = pixOff + stride * height
    val file = "BM".getBytes("US-ASCII") ++ le32(fileSize) ++
      le16(0) ++ le16(0) ++ le32(pixOff)
    val info = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(8) ++
      le32(0) ++ le32(stride * height) ++ le32(2835) ++ le32(2835) ++
      le32(256) ++ le32(0)
    val palette = Array.tabulate(256 * 4) { i =>
      if (i % 4 == 3) 0.toByte else (i / 4).toByte
    }
    val rows = new Array[Byte](stride * height)
    var y = 0
    while (y < height) {
      // bottom-up: logical row y lands at physical row (height - 1 - y)
      System.arraycopy(pixels, y * width, rows,
        (height - 1 - y) * stride, width)
      y += 1
    }
    file ++ info ++ palette ++ rows
  }

  /** BMP header parse: geometry from BITMAPINFOHEADER, the pixel array
    * located by the FILE HEADER's stored bfOffBits field (never by
    * arithmetic over the palette size — a container with a gap before
    * the pixel array still parses). Only the fixture shape (8-bit,
    * uncompressed, bottom-up) is supported; anything else sniffs to
    * None like every other hostile input. */
  private def decodeBmp(p: Array[Byte]): Option[MediaMeta] = {
    if (p.length < 54) return None
    val pixOff = readLe32(p, 10)
    val biSize = readLe32(p, 14)
    val w = readLe32(p, 18)
    val h = readLe32(p, 22)
    val bits = readLe16(p, 28)
    val compression = readLe32(p, 30)
    if (biSize < 40 || w <= 0 || h <= 0 || bits != 8 || compression != 0)
      return None
    // Long arithmetic: (w+3)&~3 wraps NEGATIVE for w near Int.MaxValue,
    // which would pass the size guard below and parse a hostile header
    // to garbage meta — the never-throw contract demands None instead
    val stride = (w.toLong + 3) & ~3L
    // subtraction form, as in every other walk: a hostile offset/geometry
    // must fail the guard, not overflow past it
    if (pixOff < 54 || stride > (p.length - pixOff).toLong / h) return None
    Some(MediaMeta("bmp", w, h, bits, pixOff, (stride * h).toInt))
  }

  /** Per-image pixel statistics over a parsed BMP — the still-image
    * member of the content-analysis family ([[PcmStats]], [[VideoStats]]).
    * The walk skips the row PADDING bytes (nPx counts only real pixels)
    * and is row-orientation-free (every stat aggregates within rows or
    * globally, so bottom-up storage never shows). All integer:
    *  - sumLuma / nDark / nBright as in [[VideoStats]];
    *  - contrast = max − min luma (the low-contrast cut);
    *  - gradQ = Σ within-row |v(x) − v(x−1)| / nPx (mean horizontal
    *    gradient — the flat/blur detector; 0 for a pure vertical
    *    gradient image, high for textured content). */
  final case class BmpStats(
      nPx: Long, sumLuma: Long, nDark: Long, nBright: Long,
      contrast: Long, gradQ: Long)

  def bmpStats(p: Array[Byte], m: MediaMeta,
      darkBelow: Int = 32, brightAtLeast: Int = 224): Option[BmpStats] = {
    if (m.format != "bmp" || m.bitDepth != 8) return None
    val stride = (m.width + 3) & ~3
    var sum, dark, bright, grad = 0L
    var minV = 255
    var maxV = 0
    var row = 0
    while (row < m.height) {
      val base = m.dataOffset + row * stride
      var x = 0
      var prev = -1
      while (x < m.width) {
        val v = p(base + x) & 0xff
        sum += v
        if (v < darkBelow) dark += 1
        if (v >= brightAtLeast) bright += 1
        if (v < minV) minV = v
        if (v > maxV) maxV = v
        if (prev >= 0) grad += math.abs(v - prev)
        prev = v
        x += 1
      }
      row += 1
    }
    val nPx = m.width.toLong * m.height
    Some(BmpStats(nPx, sum, dark, bright,
      (maxV - minV).toLong.max(0L), grad / nPx))
  }

  /** 64-bit DIFFERENCE HASH (dHash) of a parsed BMP, as four 16-bit
    * bands for LSH-style bucketing: the image is area-averaged onto a
    * 9×8 grid of integer cell means (cell (gx,gy) covers logical pixel
    * columns [gx·w/9, (gx+1)·w/9) and rows [gy·h/8, (gy+1)·h/8), floor
    * arithmetic, walked in LOGICAL top-down order — the bottom-up
    * storage is unflipped so an oracle computing over the logical array
    * gets identical means), and bit (gy·8+gx) is mean(gx+1,gy) >
    * mean(gx,gy) — horizontal gradient signs, the classic perceptual
    * signature that is EXACTLY invariant to global brightness shifts
    * (means shift together, comparisons never flip) and robust to
    * re-encoding. None for non-BMP metas or images smaller than the
    * grid. O(pixels), one pass. */
  def dhashBands(p: Array[Byte], m: MediaMeta): Option[Array[Int]] = {
    if (m.format != "bmp" || m.bitDepth != 8) return None
    val w = m.width
    val h = m.height
    if (w < 9 || h < 8) return None
    val stride = (w + 3) & ~3
    // logical row y lives at physical row h-1-y (bottom-up storage)
    Some(gridDhash(w, h, (x, y) => p(m.dataOffset + (h - 1 - y) * stride + x) & 0xff))
  }

  /** dHash of one raw VIDEO frame — a logical top-down w×h luma array at
    * `off` (the shape '00db' chunks carry; no stride, no flip). None for
    * frames smaller than the grid or shorter than w·h bytes. */
  def dhashFrame(p: Array[Byte], off: Int, len: Int,
      w: Int, h: Int): Option[Array[Int]] = {
    if (w < 9 || h < 8 || len < w * h || off < 0 || off > p.length - len) return None
    Some(gridDhash(w, h, (x, y) => p(off + y * w + x) & 0xff))
  }

  /** The shared 9×8 grid-mean difference-hash core over a logical
    * (x, y) pixel accessor — the container wrappers above differ only in
    * how storage maps to logical coordinates. */
  private def gridDhash(w: Int, h: Int, pix: (Int, Int) => Int): Array[Int] = {
    val means = new Array[Long](72)
    var ci = 0
    while (ci < 72) {
      val gx = ci % 9
      val gy = ci / 9
      val x0 = gx * w / 9
      val x1 = (gx + 1) * w / 9
      val y0 = gy * h / 8
      val y1 = (gy + 1) * h / 8
      var sum = 0L
      var y = y0
      while (y < y1) {
        var x = x0
        while (x < x1) { sum += pix(x, y); x += 1 }
        y += 1
      }
      means(ci) = sum / ((x1 - x0).toLong * (y1 - y0))
      ci += 1
    }
    val bands = new Array[Int](4)
    var b = 0
    while (b < 64) {
      val gy = b / 8
      val gx = b % 8
      if (means(gy * 9 + gx + 1) > means(gy * 9 + gx)) bands(b / 16) |= 1 << (b % 16)
      b += 1
    }
    bands
  }

  // --- AVI (RIFF video) --------------------------------------------------

  /** Video-specific header fields beyond the generic [[MediaMeta]] row:
    * frame timing and count from the avih main header. fps is derived as
    * 1e6 / dwMicroSecPerFrame (integer floor — both sides of the oracle
    * replay the same divide). */
  final case class AviInfo(
      microSecPerFrame: Int,
      totalFrames: Int,
      meta: MediaMeta
  )

  private def aviChunk(fourcc: String, data: Array[Byte]): Array[Byte] = {
    val pad: Array[Byte] = if (data.length % 2 == 1) Array(0.toByte) else Array.empty
    fourcc.getBytes("US-ASCII") ++ le32(data.length) ++ data ++ pad
  }

  private def aviList(listType: String, body: Array[Byte]): Array[Byte] =
    "LIST".getBytes("US-ASCII") ++ le32(4 + body.length) ++
      listType.getBytes("US-ASCII") ++ body

  /** RIFF/AVI container: LIST hdrl (avih main header + LIST strl with a
    * 'vids' strh and a BITMAPINFOHEADER strf), optionally a JUNK chunk
    * (odd-length, exercising the even-padding skip), then LIST movi whose
    * '00db' chunks carry the payload split into fixed `frameBytes` slices
    * (the last frame truncated). The third RIFF form next to WAVE (parsed)
    * and WEBP (sniffed-and-dropped). */
  def encodeAvi(width: Int, height: Int, fps: Int, data: Array[Byte],
      frameBytes: Int = 64, junk: Boolean = false): Array[Byte] = {
    require(fps >= 1 && fps <= 1000000, s"fps out of range: $fps")
    require(frameBytes >= 1, s"frameBytes must be positive: $frameBytes")
    val nFrames = (data.length + frameBytes - 1) / frameBytes
    val mspf = 1000000 / fps
    val avih = le32(mspf) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(nFrames) ++ le32(0) ++ le32(1) ++ le32(0) ++
      le32(width) ++ le32(height) ++ Array.fill(16)(0.toByte)
    // 56-byte AVISTREAMHEADER: fccType, fccHandler, flags/priority/
    // initialFrames (12 zeros), dwScale=1, dwRate=fps, dwStart=0,
    // dwLength=nFrames, then suggestedBuffer/quality/sampleSize + the
    // 8-byte rcFrame as zeros (20 bytes)
    val strh = "vids".getBytes("US-ASCII") ++ "DIB ".getBytes("US-ASCII") ++
      Array.fill(12)(0.toByte) ++ le32(1) ++ le32(fps) ++ le32(0) ++
      le32(nFrames) ++ Array.fill(20)(0.toByte)
    val strf = le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      Array.fill(24)(0.toByte)
    val hdrl = aviList("hdrl",
      aviChunk("avih", avih) ++
        aviList("strl", aviChunk("strh", strh) ++ aviChunk("strf", strf)))
    val junkChunk: Array[Byte] =
      if (junk) aviChunk("JUNK", Array.fill(7)(0.toByte)) else Array.empty
    val frames = (0 until nFrames).toArray.flatMap { i =>
      aviChunk("00db", java.util.Arrays.copyOfRange(
        data, i * frameBytes, math.min((i + 1) * frameBytes, data.length)))
    }
    val movi = aviList("movi", frames)
    val body = "AVI ".getBytes("US-ASCII") ++ hdrl ++ junkChunk ++ movi
    "RIFF".getBytes("US-ASCII") ++ le32(body.length) ++ body
  }

  /** Walk the RIFF/AVI chunk tree: LIST hdrl → avih for timing, frame
    * count and pixel geometry, nested LIST strl → strf BITMAPINFOHEADER
    * for the bit depth; LIST movi is the data section (its chunks are the
    * frames). Unknown chunks (JUNK, idx1, …) skip by declared length with
    * RIFF even-padding — same hostile-length guards as the WAV walk. */
  private def decodeAvi(p: Array[Byte]): Option[AviInfo] = {
    var off = 12
    var mspf, totalFrames, width, height, bits = -1
    var dataOff, dataLen = -1
    while (off + 8 <= p.length) {
      val tpe = new String(p, off, 4, "US-ASCII")
      val len = readLe32(p, off + 4)
      if (len < 0 || len > p.length - off - 8) return None
      if (tpe == "LIST" && len >= 4) {
        val listType = new String(p, off + 8, 4, "US-ASCII")
        listType match {
          case "hdrl" =>
            // sub-walk the header list (one level of nesting for strl)
            var sub = off + 12
            val end = off + 8 + len
            while (sub + 8 <= end) {
              val st = new String(p, sub, 4, "US-ASCII")
              val sl = readLe32(p, sub + 4)
              if (sl < 0 || sl > end - sub - 8) return None
              st match {
                case "avih" if sl >= 40 =>
                  mspf = readLe32(p, sub + 8)
                  totalFrames = readLe32(p, sub + 24)
                  width = readLe32(p, sub + 40)
                  height = readLe32(p, sub + 44)
                case "LIST" if sl >= 4 &&
                    new String(p, sub + 8, 4, "US-ASCII") == "strl" =>
                  var ss = sub + 12
                  val send = sub + 8 + sl
                  while (ss + 8 <= send) {
                    val ft = new String(p, ss, 4, "US-ASCII")
                    val fl = readLe32(p, ss + 4)
                    if (fl < 0 || fl > send - ss - 8) return None
                    if (ft == "strf" && fl >= 16) bits = readLe16(p, ss + 22)
                    ss += 8 + fl + (fl & 1)
                  }
                case _ =>
              }
              sub += 8 + sl + (sl & 1)
            }
          case "movi" =>
            dataOff = off + 12
            dataLen = len - 4
          case _ =>
        }
      }
      off += 8 + len + (len & 1)
    }
    // field validation, not just chunk-length validation: consumers divide
    // by microSecPerFrame, so a parseable container with a zero/negative
    // timing field must sniff to None like every other hostile input —
    // the codec's never-throw contract (MediaCodecSpec)
    if (width >= 0 && height >= 0 && dataOff >= 0 &&
        mspf > 0 && totalFrames >= 0)
      Some(AviInfo(mspf, totalFrames,
        MediaMeta("avi", width, height, bits, dataOff, dataLen)))
    else None
  }

  /** AVI header parse with video-specific fields; None for non-AVI. */
  def aviInfo(p: Array[Byte]): Option[AviInfo] =
    if (p.length >= 12 &&
      new String(p, 0, 4, "US-ASCII") == "RIFF" &&
      new String(p, 8, 4, "US-ASCII") == "AVI ") decodeAvi(p)
    else None

  /** Frame index of a parsed AVI: walk the movi chunk list recording each
    * video frame's (offset, length) — '##db'/'##dc' chunks, even-padded.
    * The offsets come from the chunk walk, never from arithmetic over the
    * frame size, so a re-wrapped or junk-padded container still indexes
    * the identical frame bytes. `maxFrames` stops the walk once that many
    * frames are indexed — the frame-SAMPLING path must be O(sampled), not
    * O(clip): a caller keeping the first 16 frames of an hour-long clip
    * should never pay a full movi traversal. */
  def aviFrames(p: Array[Byte], m: MediaMeta,
      maxFrames: Int = Int.MaxValue): Seq[(Int, Int)] = {
    if (m.format != "avi") return Nil
    val out = Seq.newBuilder[(Int, Int)]
    var n = 0
    var off = m.dataOffset
    val end = math.min(m.dataOffset + m.dataLength, p.length)
    while (off + 8 <= end && n < maxFrames) {
      val tpe = new String(p, off, 4, "US-ASCII")
      val len = readLe32(p, off + 4)
      if (len < 0 || len > end - off - 8) return out.result()
      if (tpe.endsWith("db") || tpe.endsWith("dc")) { out += ((off + 8, len)); n += 1 }
      off += 8 + len + (len & 1)
    }
    out.result()
  }

  // --- decoder -----------------------------------------------------------

  /** Sniff + parse container headers. None = unsupported/corrupt.
    * Three RIFF fates prove the sniff reads the form type: WAVE parses
    * here, AVI parses via [[aviInfo]] (generic meta surfaces here too),
    * WEBP drops. */
  def decode(p: Array[Byte]): Option[MediaMeta] =
    if (p.length >= 8 && p.take(8).sameElements(pngSig)) decodePng(p)
    else if (p.length >= 2 && (p(0) & 0xff) == 0xff && (p(1) & 0xff) == 0xd8) decodeJpeg(p)
    else if (p.length >= 12 &&
      new String(p, 0, 4, "US-ASCII") == "RIFF" &&
      new String(p, 8, 4, "US-ASCII") == "WAVE") decodeWav(p)
    else if (p.length >= 12 &&
      new String(p, 0, 4, "US-ASCII") == "RIFF" &&
      new String(p, 8, 4, "US-ASCII") == "AVI ") decodeAvi(p).map(_.meta)
    else if (p.length >= 2 && p(0) == 'B'.toByte && p(1) == 'M'.toByte) decodeBmp(p)
    else None

  /** Walk RIFF chunks: "fmt " carries the audio geometry (channels,
    * sample rate, bits per sample), "data" the payload; unknown chunks
    * (LIST, fact, …) are skipped by their declared length — the re-wrap
    * path. RIFF pads odd-length chunks to even offsets. */
  private def decodeWav(p: Array[Byte]): Option[MediaMeta] = {
    var off = 12
    var sampleRate, channels, bits = -1
    while (off + 8 <= p.length) {
      val tpe = new String(p, off, 4, "US-ASCII")
      val len = readLe32(p, off + 4)
      // subtraction form, not addition: a hostile length must fail the
      // guard, not overflow past it
      if (len < 0 || len > p.length - off - 8) return None
      tpe match {
        case "fmt " =>
          if (len < 16) return None
          channels = readLe16(p, off + 10)
          sampleRate = readLe32(p, off + 12)
          bits = readLe16(p, off + 22)
        case "data" =>
          return if (sampleRate >= 0)
            Some(MediaMeta("wav", sampleRate, channels, bits, off + 8, len))
          else None
        case _ =>
      }
      off += 8 + len + (len & 1)
    }
    None
  }

  /** Walk PNG chunks: IHDR carries the geometry, IDAT the data section. */
  private def decodePng(p: Array[Byte]): Option[MediaMeta] = {
    var off = 8
    var width, height, bitDepth = -1
    var dataOff, dataLen = -1
    while (off + 8 <= p.length) {
      val len = readBe32(p, off)
      // subtraction form: `off + 12 + len > p.length` overflows Int for a
      // hostile 4-byte length and lets the walk read out of bounds
      if (len < 0 || len > p.length - off - 12) return None
      val tpe = new String(p, off + 4, 4, "US-ASCII")
      tpe match {
        case "IHDR" =>
          if (len < 13) return None
          width = readBe32(p, off + 8)
          height = readBe32(p, off + 12)
          bitDepth = p(off + 16) & 0xff
        case "IDAT" if dataOff < 0 =>
          dataOff = off + 8; dataLen = len
        case "IEND" =>
          return if (width >= 0) Some(MediaMeta("png", width, height, bitDepth,
            math.max(dataOff, 0), math.max(dataLen, 0))) else None
        case _ =>
      }
      off += 12 + len
    }
    None
  }

  /** Walk JPEG marker segments: geometry from the first SOF (C0/C1/C2),
    * data section = the entropy-coded span between SOS and EOI. */
  private def decodeJpeg(p: Array[Byte]): Option[MediaMeta] = {
    var off = 2
    var width, height, precision = -1
    while (off + 4 <= p.length) {
      if ((p(off) & 0xff) != 0xff) return None
      val marker = p(off + 1) & 0xff
      val len = readBe16(p, off + 2)
      if (len < 2 || len > p.length - off - 2) return None
      marker match {
        case 0xc0 | 0xc1 | 0xc2 =>
          if (len < 8) return None
          precision = p(off + 4) & 0xff
          height = readBe16(p, off + 5)
          width = readBe16(p, off + 7)
        case 0xda => // SOS: entropy data runs to EOI
          if (width < 0) return None
          val dataOff = off + 2 + len
          val dataLen = math.max(p.length - dataOff - 2, 0) // strip EOI
          return Some(MediaMeta("jpeg", width, height, precision, dataOff, dataLen))
        case _ =>
      }
      off += 2 + len
    }
    // headers only, no scan: valid geometry, empty data section
    if (width >= 0) Some(MediaMeta("jpeg", width, height, precision, p.length, 0)) else None
  }

  // --- DIB frame content analysis ----------------------------------------

  /** Per-clip pixel statistics over a parsed AVI's raw DIB frames — the
    * video analog of [[PcmStats]], for corpus filtering. All fields are
    * INTEGER arithmetic so a SQL oracle replays them exactly:
    *  - nPx: total luma samples walked (each '00db' frame byte is one
    *    8-bit luma sample — the fixtures carry grayscale DIBs whose row
    *    stride needs no padding, width ≡ 0 mod 4);
    *  - sumLuma: Σ v over all samples (mean = sumLuma / nPx, floor);
    *  - nDark / nBright: samples v < 32 / v ≥ 224 — the near-black /
    *    near-white exposure counts a curation filter thresholds on;
    *  - per adjacent frame pair, meanDelta = Σ|v_f − v_{f−1}| / nPx(frame)
    *    (floor); sceneChanges counts pairs with meanDelta ≥ 8 (the cut
    *    detector), maxDeltaQ is the largest meanDelta seen. */
  final case class VideoStats(
      nFramesWalked: Long, nPx: Long, sumLuma: Long, nDark: Long,
      nBright: Long, sceneChanges: Long, maxDeltaQ: Long)

  /** Pixel walk over a parsed AVI's frame chunks. The frame byte ranges
    * come from [[aviFrames]]'s chunk walk — never from arithmetic over an
    * assumed frame size — so a junk-padded or re-wrapped container still
    * reads the identical samples. Frame-to-frame delta is computed over
    * the overlapping prefix when lengths differ (a truncated final frame).
    * O(dataLength), one pass, no allocation beyond the stats. */
  def videoStats(p: Array[Byte], info: AviInfo,
      darkBelow: Int = 32, brightAtLeast: Int = 224,
      sceneDeltaQ: Int = 8): Option[VideoStats] = {
    if (info.meta.format != "avi") return None
    val frames = aviFrames(p, info.meta)
    var nPx, sum, dark, bright, changes, maxD = 0L
    var pOff = -1
    var pLen = 0
    frames.foreach { case (off, len) =>
      var i = 0
      while (i < len) {
        val v = p(off + i) & 0xff
        sum += v
        if (v < darkBelow) dark += 1
        if (v >= brightAtLeast) bright += 1
        i += 1
      }
      nPx += len
      if (pOff >= 0) {
        val m = math.min(len, pLen)
        if (m > 0) {
          var s = 0L
          var j = 0
          while (j < m) {
            s += math.abs((p(off + j) & 0xff) - (p(pOff + j) & 0xff))
            j += 1
          }
          val d = s / m
          if (d >= sceneDeltaQ) changes += 1
          if (d > maxD) maxD = d
        }
      }
      pOff = off; pLen = len
    }
    Some(VideoStats(frames.length.toLong, nPx, sum, dark, bright, changes, maxD))
  }

  // --- PCM content analysis ----------------------------------------------

  /** Per-clip PCM statistics — the audio analog of the text lane's
    * quality scores, for corpus filtering. All fields are INTEGER
    * arithmetic so a SQL oracle replays them exactly:
    *  - nSamples: dataLength / bytesPerSample (a trailing partial sample
    *    of an odd-length 16-bit data chunk is ignored, floor semantics);
    *  - nFrames: nSamples / channels (floor — a trailing partial frame
    *    counts no frame); durationMs = nFrames × 1000 / sampleRate;
    *  - sumSq: Σ sample² (8-bit PCM is UNSIGNED with midpoint 128, so
    *    sample = byte − 128; 16-bit is SIGNED little-endian);
    *  - rmsQ = floor(sqrt(sumSq / nSamples)) — integer divide first,
    *    then sqrt of an exact small integer, so the double rounds
    *    identically everywhere;
    *  - peak = max |sample|; nClip = samples at |s| ≥ fullScale
    *    (127 / 32767 — a hard-limited recording);
    *  - leadSilence/trailSilence: run lengths of |s| ≤ fullScale >> 6
    *    (≈1.5% of full scale) at each end — the trim-detection stat. */
  final case class PcmStats(
      nSamples: Long, nFrames: Long, durationMs: Long, sumSq: Long,
      rmsQ: Long, peak: Int, nClip: Long, leadSilence: Long,
      trailSilence: Long)

  /** Decode PCM sample `i` of a parsed wav's data section: 8-bit
    * unsigned-midpoint-128 or 16-bit signed LE — the shared sample core
    * of [[pcmStats]] and [[pcmDhashBands]] (one decoder, so the stats
    * walk and the perceptual hash can never disagree on what a sample
    * IS). */
  private def pcmSample(p: Array[Byte], m: MediaMeta, bytesPer: Int, i: Int): Int = {
    val off = m.dataOffset + i * bytesPer
    if (bytesPer == 1) (p(off) & 0xff) - 128
    else (readLe16(p, off) << 16) >> 16 // sign-extend
  }

  /** PCM walk over a parsed wav's data section; None for non-wav metas
    * or unsupported sample widths (only 8/16-bit PCM, the canonical
    * fixture widths). O(dataLength), no allocation beyond the stats. */
  def pcmStats(p: Array[Byte], m: MediaMeta): Option[PcmStats] = {
    if (m.format != "wav" || (m.bitDepth != 8 && m.bitDepth != 16)) return None
    val bytesPer = m.bitDepth / 8
    val n = m.dataLength / bytesPer
    val channels = math.max(m.height, 1)
    val full = (1 << (m.bitDepth - 1)) - 1
    val silence = full >> 6
    def sample(i: Int): Int = pcmSample(p, m, bytesPer, i)
    var sumSq = 0L
    var peak = 0
    var nClip = 0L
    var lead = 0L
    var leadOpen = true
    var trail = 0L
    var i = 0
    while (i < n) {
      val s = sample(i)
      val a = math.abs(s)
      sumSq += s.toLong * s
      if (a > peak) peak = a
      if (a >= full) nClip += 1
      if (a <= silence) {
        if (leadOpen) lead += 1
        trail += 1
      } else {
        leadOpen = false
        trail = 0
      }
      i += 1
    }
    val frames = n.toLong / channels
    val rate = math.max(m.width, 1)
    Some(PcmStats(
      nSamples = n.toLong,
      nFrames = frames,
      durationMs = frames * 1000L / rate,
      sumSq = sumSq,
      rmsQ = if (n == 0) 0L
             else math.floor(math.sqrt((sumSq / n).toDouble)).toLong,
      peak = peak,
      nClip = nClip,
      leadSilence = lead,
      trailSilence = trail))
  }

  /** Sign-of-delta perceptual hash over a parsed wav's PCM — the audio
    * member of the dHash family ([[gridDhash]]'s argument lifted to the
    * 1-D sample stream): partition the samples into 65 contiguous
    * windows (sample i belongs to window i·65 div n — the same
    * floor-boundary rule as the dHash pixel grid), aggregate each
    * window's integer sum and count, and set bit k when window k+1's
    * MEAN exceeds window k's, compared by exact cross-multiplication
    * (`W[k+1]·c[k] > W[k]·c[k+1]` — window sizes differ by ±1 under the
    * floor rule, and comparing raw sums would let the shared 2/3-sample
    * size alternation dominate the bits: every clip's hash would
    * collapse toward the same zigzag pattern, measured as hundreds of
    * cross-clip collisions at sf0.1 before the mean fix). The 64 bits
    * split into four 16-bit bands, [[dhashBands]]' layout, so the
    * banded pair machinery is shared across all three modalities.
    *
    * Invariance: a positive GAIN (s → g·s, the audio analog of the
    * image lanes' brightness shift) scales every window sum by g and
    * leaves every cross-multiplied comparison — and therefore the hash
    * — exactly unchanged, including sum ties (integer scaling preserves
    * equality). Sensitivity: window means track the low-frequency
    * envelope, so distinct content diverges (PhashAudioSpec pins both,
    * and the measured corpus shows zero cross-clip false positives at
    * every fixture SF). None for non-wav metas, unsupported widths, or
    * clips shorter than 65 samples (fewer samples than windows). */
  def pcmDhashBands(p: Array[Byte], m: MediaMeta): Option[Array[Int]] = {
    if (m.format != "wav" || (m.bitDepth != 8 && m.bitDepth != 16)) return None
    val bytesPer = m.bitDepth / 8
    val n = m.dataLength / bytesPer
    if (n < 65) return None
    val w = new Array[Long](65)
    val c = new Array[Long](65)
    var i = 0
    while (i < n) {
      val k = (i.toLong * 65L / n).toInt
      w(k) += pcmSample(p, m, bytesPer, i)
      c(k) += 1
      i += 1
    }
    val bands = new Array[Int](4)
    var k = 0
    while (k < 64) {
      if (w(k + 1) * c(k) > w(k) * c(k + 1))
        bands(k / 16) |= 1 << (k % 16)
      k += 1
    }
    Some(bands)
  }
}
