package graft.multimodal

/** Real media containers + real JDK-codec decode (rounds 12-13).
  *
  * The synthesis side writes SPEC-CONFORMANT bytes whose length and
  * content are closed forms of the generation parameters, so the DuckDB
  * oracle can replay every surfaced number WITHOUT a codec; the decode
  * side goes through the actual platform codecs (`javax.imageio` for
  * PNG and multi-frame GIF, `javax.sound.sampled` for WAV) —
  * width/height/format/frame/sample counts surfaced by the queries come
  * out of a real container parse, and pixel/PCM checksums out of a real
  * decompress. No external dependency: all three codecs ship with the
  * JDK.
  *
  * Byte-length closed forms (what the oracle uses):
  *  - PNG (RGB8, one stored-deflate block): `h*(1+3w) + 68`
  *    = 8 (signature) + 25 (IHDR) + [12 + 2 + 5 + h*(1+3w) + 4] (IDAT:
  *    chunk framing + zlib header + stored-block header + filtered
  *    scanlines + Adler-32) + 12 (IEND); requires `h*(1+3w) ≤ 65535`.
  *  - WAV (PCM16 mono): `44 + 2*nSamples` (canonical RIFF header).
  *  - GIF (128-entry gray palette, F full-size constant-index frames,
  *    uncompressed LZW): with N = w*h pixels per frame,
  *    `D = N + (N-1) div 125 + 2` LZW bytes per frame (every code is
  *    exactly one byte — min code size 7 gives 8-bit codes, and a clear
  *    code re-emitted every 125 literals keeps the code table under
  *    256 entries so the width never grows), per-frame bytes
  *    `12 + D + ceil(D/255)` (image descriptor 10 + min-code-size 1 +
  *    sub-block length bytes + block terminator 1), total
  *    `398 + F * (12 + D + ceil(D/255))` (header 6 + logical screen
  *    descriptor 7 + global color table 384 + trailer 1).
  */
object Codecs {

  private final val Mod = 1000000007L

  /** Run `f` over a positioned ImageIO reader for `blob`. The stream is
    * an explicit MemoryCacheImageInputStream so the decode never spools
    * through a temp file — scoped per call instead of flipping the
    * process-global `ImageIO.setUseCache` toggle (which would leak into
    * any other ImageIO user sharing the executor JVM). */
  private def withImageReader[T](blob: Array[Byte])(
      f: javax.imageio.ImageReader => T): T = {
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext)
        throw new IllegalArgumentException("no ImageIO reader for blob")
      val r = readers.next()
      try {
        r.setInput(iis) // seekForwardOnly=false: allows frame-count search
        f(r)
      } finally r.dispose()
    } finally iis.close()
  }

  private def writeIntBE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xff); out.write((v >>> 16) & 0xff)
    out.write((v >>> 8) & 0xff); out.write(v & 0xff)
  }

  private def writeIntLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
    out.write((v >>> 16) & 0xff); out.write((v >>> 24) & 0xff)
  }

  private def writeShortLE(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  /** A real RGB8 PNG of a constant pixel value. Stored (uncompressed)
    * deflate blocks keep the byte length a closed form; any conformant
    * decoder — here `javax.imageio`'s — reads it back exactly. */
  def pngRgb(w: Int, h: Int, pixel: Int): Array[Byte] = {
    val rowBytes = 1 + 3 * w // leading filter byte (None) + RGB triples
    val raw = h * rowBytes
    require(w > 0 && h > 0 && raw <= 65535,
      s"one stored-deflate block: need 0 < h*(1+3w) <= 65535, got $raw")
    val scan = new Array[Byte](raw)
    var i = 0
    var y = 0
    while (y < h) {
      scan(i) = 0 // filter type None
      i += 1
      var x = 0
      while (x < 3 * w) { scan(i) = pixel.toByte; i += 1; x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(raw + 68)
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 13, 10, 26, 10), 0, 8)
    def chunk(tag: String, body: Array[Byte]): Unit = {
      writeIntBE(out, body.length)
      val tb = tag.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      val crc = new java.util.zip.CRC32
      crc.update(tb); crc.update(body)
      out.write(tb, 0, 4); out.write(body, 0, body.length)
      writeIntBE(out, crc.getValue.toInt)
    }
    val ihdr = new java.io.ByteArrayOutputStream(13)
    writeIntBE(ihdr, w); writeIntBE(ihdr, h)
    ihdr.write(8)  // bit depth
    ihdr.write(2)  // color type: truecolor RGB
    ihdr.write(0); ihdr.write(0); ihdr.write(0) // deflate, adaptive, none
    chunk("IHDR", ihdr.toByteArray)
    val idat = new java.io.ByteArrayOutputStream(raw + 11)
    idat.write(0x78); idat.write(0x01) // zlib: deflate, 32k window, no dict
    idat.write(1)                      // final stored block
    writeShortLE(idat, raw)
    writeShortLE(idat, raw ^ 0xffff)   // one's complement length check
    idat.write(scan, 0, raw)
    val adler = new java.util.zip.Adler32
    adler.update(scan)
    writeIntBE(idat, adler.getValue.toInt)
    chunk("IDAT", idat.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Header-only image metadata through the registered ImageIO reader:
    * the real codec parses the container (signature + IHDR / logical
    * screen descriptor here), no pixel decompression — exactly what a
    * metadata-extraction stage does over a 100 TB media store. Returns
    * (width, height, format). */
  def imageMeta(blob: Array[Byte]): (Long, Long, String) =
    withImageReader(blob) { r =>
      (r.getWidth(0).toLong, r.getHeight(0).toLong,
        r.getFormatName.toLowerCase(java.util.Locale.ROOT))
    }

  /** Full pixel decode of image 0 → (width, height, channel-byte sum
    * mod 1e9+7). The sum runs over the decoded raster's backing bytes
    * when available (3-byte BGR for RGB PNG) with a per-sample
    * fallback — channel ORDER doesn't matter for a sum, so both paths
    * agree. */
  def imagePixelSum(blob: Array[Byte]): (Long, Long, Long) =
    withImageReader(blob) { r =>
      val img = r.read(0)
      val s = rasterSum(img)
      (img.getWidth.toLong, img.getHeight.toLong, s)
    }

  /** Byte/sample sum of a decoded raster mod 1e9+7. For an indexed
    * image (GIF) the samples are palette INDICES — with the gray
    * palette below (entry j = (j,j,j)) the index IS the gray value. */
  private def rasterSum(img: java.awt.image.BufferedImage): Long = {
    var s = 0L
    img.getRaster.getDataBuffer match {
      case b: java.awt.image.DataBufferByte =>
        val d = b.getData
        var i = 0
        while (i < d.length) { s = (s + (d(i) & 0xff)) % Mod; i += 1 }
      case _ =>
        val r = img.getRaster
        val bands = r.getNumBands
        var y = 0
        while (y < img.getHeight) {
          var x = 0
          while (x < img.getWidth) {
            var c = 0
            while (c < bands) { s = (s + r.getSample(x, y, c)) % Mod; c += 1 }
            x += 1
          }
          y += 1
        }
    }
    s
  }

  /** A real multi-frame GIF89a: `frames` full-size images over a
    * 128-entry gray global color table (palette entry j = (j,j,j), so a
    * decoded raster's index samples ARE the gray values), frame f a
    * constant index `pixelOf(f) ∈ [0, 128)`. The LZW stream is the
    * classic "uncompressed GIF" encoding: min code size 7 → initial
    * code width 8; a clear code is re-emitted every 125 literals so the
    * decoder's table never reaches 256 entries and every code stays
    * exactly one byte — which is what makes the byte length the closed
    * form documented on [[Codecs]]. */
  def gifGray(w: Int, h: Int, frames: Int, pixelOf: Int => Int): Array[Byte] = {
    require(w > 0 && h > 0 && frames > 0)
    val n = w * h
    val d = n + (n - 1) / 125 + 2
    val perFrame = 12 + d + (d + 254) / 255
    val out = new java.io.ByteArrayOutputStream(398 + frames * perFrame)
    def ascii(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(b, 0, b.length)
    }
    ascii("GIF89a")
    // logical screen descriptor: GCT present, color resolution 8, size
    // bits 6 → 2^(6+1) = 128 entries
    writeShortLE(out, w); writeShortLE(out, h)
    out.write(0x80 | (7 << 4) | 6); out.write(0); out.write(0)
    var j = 0
    while (j < 128) { out.write(j); out.write(j); out.write(j); j += 1 }
    val lzw = new Array[Byte](d)
    var f = 0
    while (f < frames) {
      val px = pixelOf(f)
      require(px >= 0 && px < 128, s"palette index out of range: $px")
      // image descriptor: full-size frame at (0,0), no local table
      out.write(0x2c)
      writeShortLE(out, 0); writeShortLE(out, 0)
      writeShortLE(out, w); writeShortLE(out, h)
      out.write(0)
      out.write(7) // LZW minimum code size
      var k = 0
      var i = 0
      while (i < n) {
        if (i % 125 == 0) { lzw(k) = 0x80.toByte; k += 1 } // clear code
        lzw(k) = px.toByte; k += 1
        i += 1
      }
      lzw(k) = 0x81.toByte; k += 1 // end-of-information
      assert(k == d, s"LZW closed form drifted: wrote $k, formula $d")
      var off = 0
      while (off < d) {
        val len = math.min(255, d - off)
        out.write(len)
        out.write(lzw, off, len)
        off += len
      }
      out.write(0) // block terminator
      f += 1
    }
    out.write(0x3b) // trailer
    val blob = out.toByteArray
    assert(blob.length == 398 + frames * perFrame,
      s"GIF closed form drifted: ${blob.length} vs ${398 + frames * perFrame}")
    blob
  }

  /** Multi-frame decode: frame count from the codec's own search
    * (`getNumImages(allowSearch = true)`), then a REAL pixel decode of
    * each frame index in `sample` → per-frame raster index sums mod
    * 1e9+7. Random-access frame reads — a frame-sampling stage never
    * decompresses the frames it skips. */
  def gifFrameSums(blob: Array[Byte],
      sample: Int => Boolean): (Int, Long, Long, Seq[(Int, Long)]) =
    withImageReader(blob) { r =>
      val nf = r.getNumImages(true)
      val sums = (0 until nf).filter(sample).map(i => (i, rasterSum(r.read(i))))
      (nf, r.getWidth(0).toLong, r.getHeight(0).toLong, sums)
    }

  /** A real canonical-header WAV: PCM16 little-endian, mono, every
    * sample the same 16-bit value. 44-byte header + 2 bytes/sample. */
  def wavPcm16Mono(sampleRate: Int, nSamples: Int, sample: Int): Array[Byte] = {
    require(nSamples >= 0 && sample >= 0 && sample < 32768)
    val dataLen = 2 * nSamples
    val out = new java.io.ByteArrayOutputStream(44 + dataLen)
    def ascii(s: String): Unit = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.US_ASCII)
      out.write(b, 0, b.length)
    }
    ascii("RIFF"); writeIntLE(out, 36 + dataLen); ascii("WAVE")
    ascii("fmt "); writeIntLE(out, 16)
    writeShortLE(out, 1)              // PCM
    writeShortLE(out, 1)              // mono
    writeIntLE(out, sampleRate)
    writeIntLE(out, sampleRate * 2)   // byte rate
    writeShortLE(out, 2)              // block align
    writeShortLE(out, 16)             // bits per sample
    ascii("data"); writeIntLE(out, dataLen)
    val lo = sample & 0xff
    val hi = (sample >>> 8) & 0xff
    var i = 0
    while (i < nSamples) { out.write(lo); out.write(hi); i += 1 }
    out.toByteArray
  }

  /** Header-only audio metadata through `javax.sound.sampled`: the real
    * platform parser reads the RIFF/fmt chunks. Returns (frames,
    * sampleRate, format). */
  def audioMeta(blob: Array[Byte]): (Long, Long, String) = {
    val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
      new java.io.ByteArrayInputStream(blob))
    (aff.getFrameLength.toLong, aff.getFormat.getSampleRate.toLong,
      aff.getType.toString.toLowerCase(java.util.Locale.ROOT))
  }

  /** Full PCM decode through `AudioSystem.getAudioInputStream` →
    * (frames, decoded-byte sum mod 1e9+7). */
  def audioPcmSum(blob: Array[Byte]): (Long, Long) = {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(blob))
    try {
      val frames = ais.getFrameLength
      var s = 0L
      val buf = new Array[Byte](8192)
      var n = ais.read(buf)
      while (n > 0) {
        var i = 0
        while (i < n) { s = (s + (buf(i) & 0xff)) % Mod; i += 1 }
        n = ais.read(buf)
      }
      (frames, s)
    } finally ais.close()
  }
}
