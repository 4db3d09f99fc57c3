package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.media.MediaCodec

/** Header-parser correctness for the multimodal lane: round-trips through
  * the synthesized containers, cross-validation against the JDK's own
  * ImageReader header path (an independent parser), and corrupt-input
  * robustness (a decoder on the executor hot path must sniff-and-skip,
  * never throw). */
class MediaCodecSpec extends AnyFunSuite {

  private val data = "hello media payload 0123456789 abcdefghijklmnop".getBytes("US-ASCII")

  test("png round-trip: geometry, bit depth, and data section from a real chunk walk") {
    val p = MediaCodec.encodePng(640, 480, 16, data)
    assert(p.length === 57 + data.length)
    val m = MediaCodec.decode(p).get
    assert(m.format === "png")
    assert(m.width === 640 && m.height === 480 && m.bitDepth === 16)
    assert(java.util.Arrays.copyOfRange(p, m.dataOffset, m.dataOffset + m.dataLength)
      .sameElements(data))
  }

  test("jpeg round-trip: geometry and precision from the SOF0 segment walk") {
    val p = MediaCodec.encodeJpeg(1920, 1080, data)
    assert(p.length === 55 + data.length)
    val m = MediaCodec.decode(p).get
    assert(m.format === "jpeg")
    assert(m.width === 1920 && m.height === 1080 && m.bitDepth === 8)
    assert(java.util.Arrays.copyOfRange(p, m.dataOffset, m.dataOffset + m.dataLength)
      .sameElements(data))
  }

  test("synthesized containers agree with the JDK's own image header readers") {
    val cases = Seq(
      MediaCodec.encodePng(320, 200, 8, data) -> "png",
      MediaCodec.encodeJpeg(320, 200, data) -> "jpeg"
    )
    cases.foreach { case (bytes, label) =>
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      assert(readers.hasNext, s"JDK has no reader for synthesized $label")
      val r = readers.next()
      r.setInput(iis)
      try {
        assert(r.getWidth(0) === 320, label)
        assert(r.getHeight(0) === 200, label)
      } finally { r.dispose(); iis.close() }
    }
  }

  test("bmp: geometry, stride-padded bottom-up rows, and PIXEL-EXACT JDK agreement") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 20).foreach { _ =>
      // odd widths on purpose: stride = (w+3)&~3 > w exercises the pad skip
      val w = 1 + rnd.nextInt(40)
      val h = 1 + rnd.nextInt(24)
      val px = Array.fill(w * h)(rnd.nextInt(256).toByte)
      val bytes = MediaCodec.encodeBmp(w, h, px)
      val m = MediaCodec.decode(bytes).get
      assert(m.format === "bmp" && m.width === w && m.height === h && m.bitDepth === 8)
      // the JDK's BMP reader decodes the same bytes — cross-validate
      // every pixel, not just the header (the one fixture container
      // where the JDK can check the PIXEL path, padding and row order
      // included). The identity-gray palette collapses the image to
      // TYPE_BYTE_GRAY, whose getRGB applies a gray→sRGB transform, so
      // compare RAW raster samples (= the palette index = the luma byte).
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = px(y * w + x) & 0xff
        assert(img.getRaster.getSample(x, y, 0) === expected,
          s"pixel ($x,$y) of ${w}x$h")
      }
      // and bmpStats must match a direct recompute over the logical array
      val st = MediaCodec.bmpStats(bytes, m).get
      val vs = px.map(_ & 0xff)
      assert(st.nPx === w.toLong * h)
      assert(st.sumLuma === vs.map(_.toLong).sum)
      assert(st.nDark === vs.count(_ < 32).toLong)
      assert(st.nBright === vs.count(_ >= 224).toLong)
      assert(st.contrast === (vs.max - vs.min).toLong)
      val grads = for (y <- 0 until h; x <- 1 until w)
        yield math.abs(vs(y * w + x) - vs(y * w + x - 1)).toLong
      assert(st.gradQ === grads.sum / (w.toLong * h))
    }
  }

  test("bmp: hostile headers sniff to None, never throw") {
    val good = MediaCodec.encodeBmp(13, 7, Array.fill(91)(7.toByte))
    (1 until 54 by 6).foreach(n => assert(MediaCodec.decode(good.take(n)).isEmpty))
    val badOff = good.clone(); badOff(10) = 0xff.toByte; badOff(13) = 0x7f.toByte
    assert(MediaCodec.decode(badOff).isEmpty, "absurd bfOffBits must fail the guard")
    val badBits = good.clone(); badBits(28) = 24.toByte
    assert(MediaCodec.decode(badBits).isEmpty, "only 8-bit fixtures parse")
    val badComp = good.clone(); badComp(30) = 1.toByte
    assert(MediaCodec.decode(badComp).isEmpty, "compressed BMPs sniff to None")
    val truncated = good.take(good.length - 8)
    assert(MediaCodec.decode(truncated).isEmpty, "truncated pixel array must fail")
    // width near Int.MaxValue: (w+3)&~3 wraps NEGATIVE in Int arithmetic,
    // which would sail past the size guard and parse garbage meta — the
    // review-found overflow case, pinned
    val badW = good.clone()
    badW(18) = 0xfd.toByte; badW(19) = 0xff.toByte
    badW(20) = 0xff.toByte; badW(21) = 0x7f.toByte
    assert(MediaCodec.decode(badW).isEmpty, "wrap-around width must sniff to None")
  }

  test("unsupported and corrupt payloads sniff to None, never throw") {
    assert(MediaCodec.decode(MediaCodec.encodeWebp(data)).isEmpty)
    assert(MediaCodec.decode(Array.empty[Byte]).isEmpty)
    assert(MediaCodec.decode("not an image at all".getBytes("US-ASCII")).isEmpty)
    val png = MediaCodec.encodePng(10, 10, 8, data)
    (1 until 57 by 7).foreach(n => assert(MediaCodec.decode(png.take(n)).isEmpty))
    val jpg = MediaCodec.encodeJpeg(10, 10, data)
    (1 until 39 by 5).foreach(n => assert(MediaCodec.decode(jpg.take(n)).isEmpty))
    // a PNG whose declared chunk length overruns the buffer
    val bad = png.clone()
    bad(8) = 0x7f.toByte // IHDR length hi byte → absurd length
    assert(MediaCodec.decode(bad).isEmpty)
  }

  test("property: round-trip holds across random payloads and geometries") {
    val rnd = new scala.util.Random(20260812L)
    (1 to 200).foreach { _ =>
      val w = 1 + rnd.nextInt(65535)
      val h = 1 + rnd.nextInt(65535)
      val payload = Array.fill(rnd.nextInt(512))(rnd.nextInt(256).toByte)
      val bd = if (rnd.nextBoolean()) 8 else 16
      val pm = MediaCodec.decode(MediaCodec.encodePng(w, h, bd, payload)).get
      assert((pm.width, pm.height, pm.bitDepth) === ((w, h, bd)))
      assert(pm.dataLength === payload.length)
      val jm = MediaCodec.decode(MediaCodec.encodeJpeg(w, h, payload)).get
      assert((jm.width, jm.height) === ((w, h)))
      assert(jm.dataLength === payload.length)
    }
  }

  test("property: avi frame index reconstructs any payload at any frame size") {
    val rnd = new scala.util.Random(20260814L)
    (1 to 150).foreach { _ =>
      val w = 1 + rnd.nextInt(4096)
      val h = 1 + rnd.nextInt(4096)
      val fps = 1 + rnd.nextInt(120)
      val fb = 1 + rnd.nextInt(96)
      val payload = Array.fill(rnd.nextInt(700))(rnd.nextInt(256).toByte)
      val junk = rnd.nextBoolean()
      val avi = MediaCodec.encodeAvi(w, h, fps, payload, frameBytes = fb, junk = junk)
      val info = MediaCodec.aviInfo(avi).get
      assert((info.meta.width, info.meta.height) === ((w, h)))
      assert(info.microSecPerFrame === 1000000 / fps)
      val expectFrames = (payload.length + fb - 1) / fb
      assert(info.totalFrames === expectFrames)
      val frames = MediaCodec.aviFrames(avi, info.meta)
      assert(frames.length === expectFrames)
      val rebuilt = frames.flatMap { case (off, len) =>
        java.util.Arrays.copyOfRange(avi, off, off + len).toSeq }
      assert(rebuilt === payload.toSeq)
    }
  }

  test("wav round-trip: audio geometry and PCM section from a real RIFF chunk walk") {
    val p = MediaCodec.encodeWav(16000, 2, 16, data)
    assert(p.length === 44 + data.length)
    val m = MediaCodec.decode(p).get
    assert(m.format === "wav")
    // generic-geometry mapping: width = sample rate, height = channels
    assert(m.width === 16000 && m.height === 2 && m.bitDepth === 16)
    assert(java.util.Arrays.copyOfRange(p, m.dataOffset, m.dataOffset + m.dataLength)
      .sameElements(data))
  }

  test("synthesized wav agrees with the JDK's own audio header reader") {
    val bytes = MediaCodec.encodeWav(22050, 1, 8, data)
    val fmt = javax.sound.sampled.AudioSystem
      .getAudioFileFormat(new java.io.ByteArrayInputStream(bytes))
      .getFormat
    assert(fmt.getSampleRate === 22050.0f)
    assert(fmt.getChannels === 1)
    assert(fmt.getSampleSizeInBits === 8)
  }

  test("re-wrapped wav: same PCM section at a shifted offset, bigger container") {
    val pcm = "pcm sample bytes!".getBytes("UTF-8")
    val plain = MediaCodec.encodeWav(8000, 1, 16, pcm)
    // odd comment length exercises the RIFF even-offset pad byte
    val rewrap = MediaCodec.encodeWavRewrapped(8000, 1, 16, pcm, "copy1")
    val pm = MediaCodec.decode(plain).get
    val rm = MediaCodec.decode(rewrap).get
    assert((rm.format, rm.width, rm.height, rm.bitDepth) === (("wav", 8000, 1, 16)))
    assert(rm.dataLength === pm.dataLength)
    assert(
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(plain, pm.dataOffset, pm.dataOffset + pm.dataLength),
        java.util.Arrays.copyOfRange(rewrap, rm.dataOffset, rm.dataOffset + rm.dataLength)))
    // LIST chunk: 8 header + 5 comment + 1 pad
    assert(rm.dataOffset === pm.dataOffset + 8 + 5 + 1)
    assert(rewrap.length === plain.length + 8 + 5 + 1)
    // and the JDK reader skips the LIST chunk the same way ours does
    val fmt = javax.sound.sampled.AudioSystem
      .getAudioFileFormat(new java.io.ByteArrayInputStream(rewrap)).getFormat
    assert(fmt.getSampleRate === 8000.0f && fmt.getChannels === 1)
  }

  test("RIFF sniffing reads the form type: WAVE parses, WEBP stays None") {
    assert(MediaCodec.decode(MediaCodec.encodeWav(8000, 1, 8, data)).isDefined)
    assert(MediaCodec.decode(MediaCodec.encodeWebp(data)).isEmpty)
    // corrupt/truncated wavs sniff to None, never throw
    val wav = MediaCodec.encodeWav(8000, 1, 8, data)
    (1 until 44 by 5).foreach(n => assert(MediaCodec.decode(wav.take(n)).isEmpty))
  }

  test("hostile chunk lengths sniff to None in every container, never overflow") {
    // a 4-byte length near Int.MaxValue makes `off + hdr + len` overflow
    // negative, slipping past an addition-form bounds check into an
    // out-of-bounds read — the guards must use the subtraction form
    def withLen(prefix: Array[Byte], lenAt: Int, len: Int, be: Boolean): Array[Byte] = {
      val p = prefix.clone()
      val b =
        if (be) Array((len >>> 24).toByte, (len >>> 16).toByte, (len >>> 8).toByte, len.toByte)
        else Array(len.toByte, (len >>> 8).toByte, (len >>> 16).toByte, (len >>> 24).toByte)
      System.arraycopy(b, 0, p, lenAt, 4)
      p
    }
    // wav: first chunk header at 12, length field at 16
    val wav = MediaCodec.encodeWav(8000, 1, 8, data)
    assert(MediaCodec.decode(withLen(wav, 16, 0x7ffffff0, be = false)).isEmpty)
    // png: first chunk length at offset 8 (big-endian)
    val png = MediaCodec.encodePng(10, 10, 8, data)
    assert(MediaCodec.decode(withLen(png, 8, 0x7ffffff0, be = true)).isEmpty)
  }

  test("empty data section: zero-length IDAT / SOF-to-EOI span") {
    val png = MediaCodec.decode(MediaCodec.encodePng(5, 5, 8, Array.empty)).get
    assert(png.dataLength === 0)
    val jpg = MediaCodec.decode(MediaCodec.encodeJpeg(5, 5, Array.empty)).get
    assert(jpg.dataLength === 0)
  }

  test("re-wrapped png: same data section at a shifted offset, bigger container") {
    val data = "pixel payload bytes".getBytes("UTF-8")
    val plain = MediaCodec.encodePng(40, 30, 8, data)
    val rewrap = MediaCodec.encodePngRewrapped(40, 30, 8, data, "copy-1")
    val pm = MediaCodec.decode(plain).get
    val rm = MediaCodec.decode(rewrap).get
    // identical parsed geometry and data-section BYTES...
    assert((rm.format, rm.width, rm.height, rm.bitDepth) ===
      (("png", 40, 30, 8)))
    assert(rm.dataLength === pm.dataLength)
    assert(
      java.util.Arrays.equals(
        java.util.Arrays.copyOfRange(plain, pm.dataOffset, pm.dataOffset + pm.dataLength),
        java.util.Arrays.copyOfRange(rewrap, rm.dataOffset, rm.dataOffset + rm.dataLength)))
    // ...but a different container: tEXt shifts the offset by 12 + 8 + 6
    assert(rm.dataOffset === pm.dataOffset + 12 + 8 + "copy-1".length)
    assert(rewrap.length === plain.length + 12 + 8 + "copy-1".length)
    assert(!java.util.Arrays.equals(plain, rewrap))
  }

  test("pcmStats 8-bit: unsigned midpoint-128 samples, clip + silence runs by hand") {
    // 2 silent (128→0), then -128 (clip), +127 (clip), +64, then 3 silent
    val bytes = Array(128, 128, 0, 255, 192, 128, 128, 128).map(_.toByte)
    val wav = MediaCodec.encodeWav(8000, 1, 8, bytes)
    val st = MediaCodec.pcmStats(wav, MediaCodec.decode(wav).get).get
    assert(st.nSamples === 8L)
    assert(st.nFrames === 8L)
    assert(st.durationMs === 8L * 1000 / 8000)
    assert(st.peak === 128)
    assert(st.nClip === 2L) // |-128| and |127| both >= 127
    assert(st.leadSilence === 2L)
    assert(st.trailSilence === 3L)
    assert(st.sumSq === 128L * 128 + 127L * 127 + 64L * 64)
  }

  test("pcmStats 16-bit: signed LE pairs, odd-length data drops the partial sample") {
    // samples: 0 (silence), -32768 (clip), 300 (sub-threshold: 300 <= 511),
    // 1000 (loud) + one dangling byte that must be ignored
    val bytes = Array(
      0x00, 0x00, // 0
      0x00, 0x80, // -32768
      0x2c, 0x01, // 300
      0xe8, 0x03, // 1000
      0x7f        // partial trailing sample
    ).map(_.toByte)
    val wav = MediaCodec.encodeWav(16000, 2, 16, bytes)
    val st = MediaCodec.pcmStats(wav, MediaCodec.decode(wav).get).get
    assert(st.nSamples === 4L, "9 bytes / 2 = 4 whole samples")
    assert(st.nFrames === 2L, "stereo: 4 samples = 2 frames")
    assert(st.durationMs === 2L * 1000 / 16000)
    assert(st.peak === 32768)
    assert(st.nClip === 1L)
    // leading silence counts BOTH sub-threshold samples at the head?
    // no — the clip at index 1 ends the leading run immediately
    assert(st.leadSilence === 1L)
    assert(st.trailSilence === 0L, "1000 > 511 ends the trailing run")
    assert(st.sumSq === 32768L * 32768 + 300L * 300 + 1000L * 1000)
  }

  test("pcmStats: all-silent and empty clips, and stats survive the re-wrap") {
    val quiet = MediaCodec.encodeWav(8000, 1, 8, Array.fill(5)(128.toByte))
    val qs = MediaCodec.pcmStats(quiet, MediaCodec.decode(quiet).get).get
    assert((qs.leadSilence, qs.trailSilence, qs.peak, qs.sumSq) === ((5L, 5L, 0, 0L)))
    val empty = MediaCodec.encodeWav(8000, 1, 16, Array.empty[Byte])
    val es = MediaCodec.pcmStats(empty, MediaCodec.decode(empty).get).get
    assert((es.nSamples, es.durationMs, es.peak) === ((0L, 0L, 0)))
    // same PCM behind a LIST chunk → identical stats at the shifted offset
    val data = Array(128, 0, 255, 128).map(_.toByte)
    val a = MediaCodec.encodeWav(8000, 1, 8, data)
    val b = MediaCodec.encodeWavRewrapped(8000, 1, 8, data, "meta!")
    val sa = MediaCodec.pcmStats(a, MediaCodec.decode(a).get).get
    val sb = MediaCodec.pcmStats(b, MediaCodec.decode(b).get).get
    assert(sa === sb)
    // non-wav metas refuse
    val png = MediaCodec.encodePng(8, 8, 8, data)
    assert(MediaCodec.pcmStats(png, MediaCodec.decode(png).get).isEmpty)
  }

  test("avi round-trip: geometry, timing, and frame index from the RIFF tree walk") {
    val payload = ("f" * 64 + "g" * 64 + "tail").getBytes("US-ASCII") // 132 bytes
    val avi = MediaCodec.encodeAvi(640, 480, 30, payload)
    val info = MediaCodec.aviInfo(avi).get
    assert(info.meta.format === "avi")
    assert((info.meta.width, info.meta.height, info.meta.bitDepth) === ((640, 480, 24)))
    assert(info.microSecPerFrame === 1000000 / 30)
    assert(info.totalFrames === 3, "132 bytes / 64 = 3 frames, last truncated")
    val frames = MediaCodec.aviFrames(avi, info.meta)
    assert(frames.map(_._2) === Seq(64, 64, 4))
    // chunk-walked offsets must reconstruct the exact payload
    val rebuilt = frames.flatMap { case (off, len) =>
      java.util.Arrays.copyOfRange(avi, off, off + len).toSeq }
    assert(rebuilt === payload.toSeq)
    // the generic decode lane surfaces the same meta (movi data section)
    assert(MediaCodec.decode(avi) === Some(info.meta))
  }

  test("avi JUNK chunk: odd-length unknown chunk skipped with RIFF padding, frames identical") {
    val payload = "frame data goes here, more than one frame long!".getBytes("US-ASCII")
    val plain = MediaCodec.encodeAvi(320, 240, 24, payload, frameBytes = 16)
    val junked = MediaCodec.encodeAvi(320, 240, 24, payload, frameBytes = 16, junk = true)
    assert(junked.length === plain.length + 8 + 7 + 1, "JUNK chunk + pad byte")
    val (pi, ji) = (MediaCodec.aviInfo(plain).get, MediaCodec.aviInfo(junked).get)
    assert(pi.totalFrames === ji.totalFrames)
    assert(ji.meta.dataOffset === pi.meta.dataOffset + 16, "movi shifted by the JUNK span")
    val slice = (p: Array[Byte], f: (Int, Int)) =>
      java.util.Arrays.copyOfRange(p, f._1, f._1 + f._2).toSeq
    val pf = MediaCodec.aviFrames(plain, pi.meta).map(slice(plain, _))
    val jf = MediaCodec.aviFrames(junked, ji.meta).map(slice(junked, _))
    assert(pf === jf, "identical frame bytes at shifted offsets")
    // odd-length final frame chunk: 47 % 16 = 15-byte last frame (odd)
    assert(pf.last.length === 15)
  }

  test("avi edge cases: empty payload, hostile lengths, and the three RIFF fates") {
    // zero frames: header parses, frame index is empty
    val empty = MediaCodec.encodeAvi(64, 64, 24, Array.empty[Byte])
    val ei = MediaCodec.aviInfo(empty).get
    assert(ei.totalFrames === 0)
    assert(MediaCodec.aviFrames(empty, ei.meta) === Nil)
    // three RIFF forms, three fates: WAVE parses as wav, AVI as avi, WEBP drops
    val data = "payload".getBytes("US-ASCII")
    assert(MediaCodec.decode(MediaCodec.encodeWav(8000, 1, 8, data)).get.format === "wav")
    assert(MediaCodec.decode(MediaCodec.encodeAvi(32, 32, 24, data)).get.format === "avi")
    assert(MediaCodec.decode(MediaCodec.encodeWebp(data)).isEmpty)
    // hostile chunk length inside the tree: walk must refuse, never overflow
    val avi = MediaCodec.encodeAvi(32, 32, 24, data)
    val evil = avi.clone()
    // corrupt the top-level hdrl LIST length to Int.MaxValue
    evil(16) = 0xff.toByte; evil(17) = 0xff.toByte
    evil(18) = 0xff.toByte; evil(19) = 0x7f.toByte
    assert(MediaCodec.aviInfo(evil).isEmpty)
    // hostile FIELD, not hostile length: a structurally-valid AVI whose
    // avih declares dwMicroSecPerFrame=0 must sniff to None — consumers
    // divide by it, and the codec's contract is never-throw (avih data
    // starts at byte 32: 12 RIFF + 8 LIST header + 'hdrl' + 'avih' + len)
    val evilMspf = avi.clone()
    (32 until 36).foreach(evilMspf(_) = 0.toByte)
    assert(MediaCodec.aviInfo(evilMspf).isEmpty)
    assert(MediaCodec.decode(evilMspf).isEmpty)
    // hostile frame-chunk length: index stops cleanly at the bad chunk
    val fi = MediaCodec.aviInfo(avi).get
    val evil2 = avi.clone()
    evil2(fi.meta.dataOffset + 4) = 0xff.toByte
    evil2(fi.meta.dataOffset + 5) = 0xff.toByte
    evil2(fi.meta.dataOffset + 6) = 0xff.toByte
    evil2(fi.meta.dataOffset + 7) = 0x7f.toByte
    assert(MediaCodec.aviFrames(evil2, fi.meta) === Nil)
  }

  test("property: png/jpeg/avi round-trip at arbitrary geometry (incl. rewrapped png and junk-chunk avi)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      w <- Gen.chooseNum(1, 4096)
      h <- Gen.chooseNum(1, 4096)
      bits <- Gen.oneOf(8, 16)
      fps <- Gen.chooseNum(1, 120)
      len <- Gen.chooseNum(0, 257)
      bytes <- Gen.listOfN(len, Gen.chooseNum(-128, 127))
      junk <- Gen.oneOf(true, false)
    } yield (w, h, bits, fps, bytes.map(_.toByte).toArray, junk)
    (1 to 200).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong))).foreach {
      case (w, h, bits, fps, data, junk) =>
        def slice(p: Array[Byte], m: MediaCodec.MediaMeta) =
          java.util.Arrays.copyOfRange(p, m.dataOffset, m.dataOffset + m.dataLength)

        val png = MediaCodec.encodePng(w, h, bits, data)
        val mp = MediaCodec.decode(png).get
        assert(mp.format === "png" && mp.width === w && mp.height === h
          && mp.bitDepth === bits && mp.dataLength === data.length)
        assert(java.util.Arrays.equals(slice(png, mp), data))

        // rewrapped twin: shifted offset, identical content
        val tw = MediaCodec.encodePngRewrapped(w, h, bits, data, s"c$w")
        val mt = MediaCodec.decode(tw).get
        assert(mt.dataOffset !== mp.dataOffset)
        assert(java.util.Arrays.equals(slice(tw, mt), data))

        val jpg = MediaCodec.encodeJpeg(w, h, data)
        val mj = MediaCodec.decode(jpg).get
        assert(mj.format === "jpeg" && mj.width === w && mj.height === h)
        assert(java.util.Arrays.equals(slice(jpg, mj), data))

        val avi = MediaCodec.encodeAvi(w, h, fps, data, junk = junk)
        val fi = MediaCodec.aviInfo(avi).get
        assert(fi.meta.width === w && fi.meta.height === h)
        assert(fi.microSecPerFrame === 1000000L / fps)
        assert(fi.totalFrames === (data.length + 63) / 64)
        // stitched frame bytes must reconstruct the payload exactly
        val frames = MediaCodec.aviFrames(avi, fi.meta, maxFrames = Int.MaxValue)
        val stitched = frames.flatMap { case (off, len) =>
          java.util.Arrays.copyOfRange(avi, off, off + len)
        }.toArray
        assert(java.util.Arrays.equals(stitched, data),
          s"avi frame stitch mismatch at w=$w h=$h len=${data.length} junk=$junk")
    }
  }

  test("property: wav encode→decode→pcmStats matches an independent re-derivation at arbitrary geometry") {
    // raw ScalaCheck with fixed seeds (the PropertySpec discipline:
    // scalatestplus isn't on the offline classpath). Covers odd data
    // lengths (16-bit floor'd trailing byte), 1/2 channels, both widths,
    // all-silent and clipping-heavy payloads.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      rate <- Gen.chooseNum(1, 96000)
      channels <- Gen.chooseNum(1, 2)
      bits <- Gen.oneOf(8, 16)
      len <- Gen.chooseNum(0, 257)
      bytes <- Gen.listOfN(len, Gen.chooseNum(-128, 127))
    } yield (rate, channels, bits, bytes.map(_.toByte).toArray)
    (1 to 200).map(i => gen.pureApply(Gen.Parameters.default, Seed(i.toLong))).foreach {
      case (rate, channels, bits, data) =>
        val p = MediaCodec.encodeWav(rate, channels, bits, data)
        val m = MediaCodec.decode(p).get
        assert(m.format === "wav" && m.width === rate && m.height === channels
          && m.bitDepth === bits && m.dataLength === data.length)
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(p, m.dataOffset, m.dataOffset + m.dataLength), data))

        val st = MediaCodec.pcmStats(p, m).get
        // independent re-derivation, straight off the INPUT bytes
        val bytesPer = bits / 8
        val n = data.length / bytesPer
        val full = (1 << (bits - 1)) - 1
        val sil = full >> 6
        val samples = (0 until n).map { i =>
          if (bits == 8) (data(i) & 0xff) - 128
          else ((data(2 * i) & 0xff) | (data(2 * i + 1) << 8)).toShort.toInt
        }
        assert(st.nSamples === n.toLong)
        assert(st.durationMs === (n / channels).toLong * 1000L / rate)
        assert(st.peak === (if (n == 0) 0 else samples.map(math.abs).max))
        assert(st.nClip === samples.count(s => math.abs(s) >= full).toLong)
        assert(st.leadSilence === samples.takeWhile(s => math.abs(s) <= sil).length.toLong)
        assert(st.trailSilence ===
          samples.reverse.takeWhile(s => math.abs(s) <= sil).length.toLong)
        val sumSq = samples.map(s => s.toLong * s).sum
        assert(st.rmsQ ===
          (if (n == 0) 0L else math.floor(math.sqrt((sumSq / n).toDouble)).toLong))

        // the re-wrapped twin shifts the data offset but not the content
        val tw = MediaCodec.encodeWavRewrapped(rate, channels, bits, data, s"c$rate")
        val mt = MediaCodec.decode(tw).get
        assert(mt.dataOffset !== m.dataOffset)
        assert(java.util.Arrays.equals(
          java.util.Arrays.copyOfRange(tw, mt.dataOffset, mt.dataOffset + mt.dataLength), data))
    }
  }
}
