package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM encoders/decoders for two REAL media container formats —
  * BMP (Windows bitmap, BITMAPINFOHEADER, 24 bpp uncompressed) and WAV
  * (RIFF PCM16 mono) — zero external dependencies, so the sandbox's
  * lack of codec libraries no longer forces the decode step to be a
  * stub for these types. Layouts follow the public format specs:
  * BMP: 14-byte file header ('BM', file size, pixel-data offset) +
  * 40-byte BITMAPINFOHEADER + bottom-up rows padded to 4 bytes;
  * WAV: 'RIFF' size 'WAVE' + chunk sequence including 'fmt ' (PCM tag,
  * channels, rate, block align, bits) and 'data'. The decoders parse
  * those structures for real — magic + header validation, row-padding
  * walk, RIFF chunk-walking that skips unknown chunks (so a LIST chunk
  * ahead of 'data' decodes fine) — and return None on anything
  * malformed rather than guessing.
  */
object MediaFiles {

  /** Decoded 24-bpp image: dimensions from the header, channel values
    * (B,G,R per pixel, 0-255) in visual top-down row order. */
  final case class Bmp(width: Int, height: Int, channels: Array[Int])

  /** Decoded PCM16 mono audio: format fields from 'fmt ', samples from
    * 'data' (signed 16-bit). */
  final case class Wav(sampleRate: Int, bitsPerSample: Int, samples: Array[Int])

  /** Decoded AVI container: header fields from 'avih' (dimensions,
    * frame timing, declared frame count) and the actual video frame
    * chunks from the 'movi' list (per-frame payload bytes, in stream
    * order). At 100 TB a decoder would stream offsets instead of
    * copying payloads — the offsets are what [[decodeAvi]] walks; the
    * copies here keep the API simple at test scale. */
  final case class Avi(width: Int, height: Int, microSecPerFrame: Int,
      totalFrames: Int, frames: Array[Array[Byte]])

  // ------------------------------------------------------------- BMP

  private def rowStride(w: Int): Int = ((3 * w + 3) / 4) * 4

  /** Encode a 24-bpp BMP. `channel(x, y)` must return the (b, g, r)
    * triple for the pixel at visual position (x, y), y = 0 at the TOP
    * (the encoder handles BMP's bottom-up storage order). */
  def encodeBmp(w: Int, h: Int, channel: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    val stride = rowStride(w)
    val dataSize = stride * h
    val buf = ByteBuffer.allocate(54 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(54 + dataSize) // file size
    buf.putShort(0).putShort(0) // reserved
    buf.putInt(54) // pixel data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(w).putInt(h)
    buf.putShort(1) // planes
    buf.putShort(24) // bpp
    buf.putInt(0) // BI_RGB (uncompressed)
    buf.putInt(dataSize)
    buf.putInt(2835).putInt(2835) // 72 dpi in px/metre
    buf.putInt(0).putInt(0) // palette
    var row = h - 1 // bottom-up: last visual row first
    while (row >= 0) {
      var x = 0
      while (x < w) {
        val (b, g, r) = channel(x, row)
        buf.put(b.toByte).put(g.toByte).put(r.toByte)
        x += 1
      }
      var pad = stride - 3 * w
      while (pad > 0) { buf.put(0.toByte); pad -= 1 }
      row -= 1
    }
    buf.array()
  }

  /** Parse a 24-bpp uncompressed BMP; None on anything malformed. */
  def decodeBmp(bytes: Array[Byte]): Option[Bmp] = {
    if (bytes.length < 54 || bytes(0) != 'B' || bytes(1) != 'M') return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val fileSize = buf.getInt(2)
    val offset = buf.getInt(10)
    val hdrSize = buf.getInt(14)
    val w = buf.getInt(18)
    val h = buf.getInt(22)
    val planes = buf.getShort(26)
    val bpp = buf.getShort(28)
    val compression = buf.getInt(30)
    if (hdrSize < 40 || w <= 0 || h <= 0 || planes != 1 || bpp != 24 ||
        compression != 0 || offset < 54 || fileSize > bytes.length ||
        w > (1 << 20) || h > (1 << 20)) return None
    val stride = rowStride(w)
    if (offset.toLong + stride.toLong * h > bytes.length) return None
    val out = new Array[Int](3 * w * h)
    var row = 0 // visual top-down output
    while (row < h) {
      val src = offset + (h - 1 - row) * stride // stored bottom-up
      var x = 0
      while (x < w) {
        val base = 3 * (row * w + x)
        out(base) = bytes(src + 3 * x) & 0xff
        out(base + 1) = bytes(src + 3 * x + 1) & 0xff
        out(base + 2) = bytes(src + 3 * x + 2) & 0xff
        x += 1
      }
      row += 1
    }
    Some(Bmp(w, h, out))
  }

  // ------------------------------------------------------------- WAV

  /** Encode a PCM16 mono WAV. Sample values are truncated to 16 bits. */
  def encodeWav(sampleRate: Int, samples: Array[Int]): Array[Byte] = {
    val dataSize = 2 * samples.length
    val buf = ByteBuffer.allocate(44 + dataSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII"))
    buf.putInt(36 + dataSize) // RIFF payload size
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII"))
    buf.putInt(16) // PCM fmt chunk size
    buf.putShort(1) // audio format: PCM
    buf.putShort(1) // channels: mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2) // byte rate
    buf.putShort(2) // block align
    buf.putShort(16) // bits per sample
    buf.put("data".getBytes("US-ASCII"))
    buf.putInt(dataSize)
    samples.foreach(s => buf.putShort(s.toShort))
    buf.array()
  }

  /** Parse a PCM16 mono WAV by walking RIFF chunks (unknown chunks are
    * skipped, word-aligned, so chunk order beyond 'fmt '-before-'data'
    * does not matter); None on anything malformed. */
  def decodeWav(bytes: Array[Byte]): Option[Wav] = {
    if (bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) ""
      else new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "WAVE") return None
    var pos = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, size)
    while (pos + 8 <= bytes.length && (fmt.isEmpty || data.isEmpty)) {
      val id = tag(pos)
      val size = buf.getInt(pos + 4)
      if (size < 0 || pos + 8 + size > bytes.length) return None
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort(pos + 8)
          val channels = buf.getShort(pos + 10)
          val rate = buf.getInt(pos + 12)
          val bits = buf.getShort(pos + 22)
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          fmt = Some((channels, rate, bits))
        case "data" =>
          data = Some((pos + 8, size))
        case _ => // skip unknown chunk (LIST, fact, ...)
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    for ((_, rate, bits) <- fmt; (off, size) <- data) yield {
      val n = size / 2
      val out = new Array[Int](n)
      var i = 0
      while (i < n) { out(i) = buf.getShort(off + 2 * i).toInt; i += 1 }
      Wav(rate, bits, out)
    }
  }

  // ------------------------------------------------------------- AVI
  // RIFF-AVI layout (Microsoft AVI RIFF form, the same public spec
  // VfW/ffmpeg implement): RIFF('AVI ' LIST('hdrl' avih(56) LIST('strl'
  // strh(56) strf(BITMAPINFOHEADER))) LIST('movi' '00dc' chunks)).
  // avih field offsets (all u32le): 0 dwMicroSecPerFrame, 16
  // dwTotalFrames, 24 dwStreams, 32 dwWidth, 36 dwHeight.

  private def fourcc(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Encode a minimal single-video-stream AVI: real header lists (avih
    * + strl/strh/strf) and one '00dc' movi chunk per frame (word-
    * aligned, as RIFF requires). With the default handler the frame
    * payloads are arbitrary bytes (container real, codec "raw"); with
    * `handler = "MJPG"` the strh handler AND strf biCompression carry
    * the MJPG fourcc — the Motion-JPEG AVI layout, where each '00dc'
    * payload is a complete JPEG image (see [[encodeJpegSolid]] /
    * [[decodeJpeg]]). */
  def encodeAvi(w: Int, h: Int, microSecPerFrame: Int,
      frames: Seq[Array[Byte]], handler: String = "\u0000\u0000\u0000\u0000"): Array[Byte] = {
    require(handler.length == 4, s"handler must be a fourcc: '$handler'")
    require(w > 0 && h > 0 && microSecPerFrame > 0, s"bad AVI params ${w}x$h")
    val maxFrame = frames.foldLeft(0)((m, f) => math.max(m, f.length))
    val moviContent = frames.map(f => 8 + f.length + (f.length & 1)).sum
    // sizes: avih chunk 8+56; strh 8+56; strf 8+40; strl list 8+4+strh+strf
    val strlSize = 4 + (8 + 56) + (8 + 40)
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize)
    val riffSize = 4 + (8 + hdrlSize) + (8 + 4 + moviContent)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(fourcc("RIFF")).putInt(riffSize).put(fourcc("AVI "))
    buf.put(fourcc("LIST")).putInt(hdrlSize).put(fourcc("hdrl"))
    buf.put(fourcc("avih")).putInt(56)
    buf.putInt(microSecPerFrame)
    buf.putInt(if (microSecPerFrame == 0) 0 else
      (maxFrame.toLong * 1000000L / microSecPerFrame).toInt) // dwMaxBytesPerSec
    buf.putInt(0) // dwPaddingGranularity
    buf.putInt(0) // dwFlags: no idx1 written, so AVIF_HASINDEX stays clear
    buf.putInt(frames.length) // dwTotalFrames
    buf.putInt(0) // dwInitialFrames
    buf.putInt(1) // dwStreams
    buf.putInt(maxFrame) // dwSuggestedBufferSize
    buf.putInt(w).putInt(h)
    buf.putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved[4]
    buf.put(fourcc("LIST")).putInt(strlSize).put(fourcc("strl"))
    buf.put(fourcc("strh")).putInt(56)
    buf.put(fourcc("vids")).put(fourcc(handler))
    buf.putInt(0) // dwFlags
    buf.putShort(0).putShort(0) // wPriority, wLanguage
    buf.putInt(0) // dwInitialFrames
    buf.putInt(microSecPerFrame) // dwScale
    buf.putInt(1000000) // dwRate: fps = dwRate/dwScale = 1e6/uspf
    buf.putInt(0) // dwStart
    buf.putInt(frames.length) // dwLength (in frames)
    buf.putInt(maxFrame) // dwSuggestedBufferSize
    buf.putInt(0) // dwQuality
    buf.putInt(0) // dwSampleSize
    buf.putShort(0).putShort(0) // rcFrame left, top
    buf.putShort(w.toShort).putShort(h.toShort) // rcFrame right, bottom
    buf.put(fourcc("strf")).putInt(40)
    buf.putInt(40).putInt(w).putInt(h) // BITMAPINFOHEADER
    buf.putShort(1).putShort(24) // planes, bpp
    // biCompression: BI_RGB (0) for raw payloads, the handler fourcc
    // for a real codec (MJPG) — the field VfW decoders dispatch on
    if (handler == "\u0000\u0000\u0000\u0000") buf.putInt(0) else buf.put(fourcc(handler))
    buf.putInt(w * h * 3) // image size
    buf.putInt(0).putInt(0).putInt(0).putInt(0)
    buf.put(fourcc("LIST")).putInt(4 + moviContent).put(fourcc("movi"))
    frames.foreach { f =>
      buf.put(fourcc("00dc")).putInt(f.length).put(f)
      if ((f.length & 1) == 1) buf.put(0.toByte) // word alignment pad
    }
    buf.array()
  }

  // ------------------------------------------------------------ JPEG
  // Real JPEG via the JDK's own ImageIO codec (javax.imageio ships a
  // baseline JPEG reader/writer — no external dependency), which is
  // what makes MJPEG-in-AVI decodable end to end: the container walk
  // yields '00dc' payloads that ARE complete JPEG images. JPEG is
  // lossy, so decoded pixels are codec-approximate — fixtures that sit
  // under a cross-engine hash must plant DECISIONS with margins far
  // above quantization noise (see mm_mjpeg_keyframes), never raw
  // decoded values.

  /** Encode a solid-level frame (R=G=B=level everywhere) as a real
    * baseline JPEG at quality 0.9. Solid frames are the noise-minimal
    * MJPEG fixture: a flat block's DCT is DC-only, so the decoded mean
    * stays within ~2 levels of the plant. */
  def encodeJpegSolid(w: Int, h: Int, level: Int): Array[Byte] = {
    require(w > 0 && h > 0 && level >= 0 && level <= 255, s"bad JPEG plant $w x $h @ $level")
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val px = Array(level, level, level)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { raster.setPixel(x, y, px); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(0.9f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Decode a JPEG via ImageIO into the same [[Bmp]] shape the BMP
    * decoder returns (B,G,R per pixel, visual top-down); None when the
    * bytes are not a decodable image. */
  def decodeJpeg(bytes: Array[Byte]): Option[Bmp] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: java.io.IOException => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val out = new Array[Int](3 * w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val base = 3 * (y * w + x)
          out(base) = rgb & 0xff // B
          out(base + 1) = (rgb >> 8) & 0xff // G
          out(base + 2) = (rgb >> 16) & 0xff // R
          x += 1
        }
        y += 1
      }
      Some(Bmp(w, h, out))
    }
  }

  /** Parse an AVI container by walking its RIFF lists — magic + 'AVI '
    * form check, 'hdrl'/'avih' header fields, then every VIDEO data
    * chunk ('##dc'/'##db') inside 'movi'; audio '##wb' chunks and any
    * unknown chunks/lists are skipped word-aligned, like the WAV
    * walker. None on anything malformed. */
  def decodeAvi(bytes: Array[Byte]): Option[Avi] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    def tag(off: Int): String =
      if (off + 4 > bytes.length) "" else new String(bytes, off, 4, "US-ASCII")
    if (tag(0) != "RIFF" || tag(8) != "AVI ") return None
    val riffEnd = {
      val s = buf.getInt(4)
      if (s < 4 || 8L + s > bytes.length) return None
      8 + s
    }
    var header: Option[(Int, Int, Int, Int)] = None // (uspf, total, w, h)
    val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    // VIDEO data chunks only ('##dc' compressed / '##db' uncompressed):
    // an interleaved audio stream's '##wb' chunks must not be counted
    // as frames (they are walked over like any other chunk)
    def isVideoChunk(id: String): Boolean =
      id.length == 4 && id(0).isDigit && id(1).isDigit &&
        (id.substring(2) == "dc" || id.substring(2) == "db")
    // walk one level of chunks in [pos, end); recurse into LISTs we know
    def walk(start: Int, end: Int): Boolean = {
      var pos = start
      while (pos + 8 <= end) {
        val id = tag(pos)
        val size = buf.getInt(pos + 4)
        // Long arithmetic: a declared size near Int.MaxValue must fail
        // the bound check, not overflow past it (a corrupt file returns
        // None — it must never throw and kill the decode batch)
        if (size < 0 || pos.toLong + 8L + size > end) return false
        id match {
          case "LIST" =>
            if (size < 4) return false
            val listType = tag(pos + 8)
            if (listType == "hdrl" || listType == "movi" || listType == "strl") {
              if (!walk(pos + 12, pos + 8 + size)) return false
            } // other lists (INFO, odml...) skipped whole
          case "avih" =>
            if (size < 56) return false
            header = Some((buf.getInt(pos + 8), buf.getInt(pos + 8 + 16),
              buf.getInt(pos + 8 + 32), buf.getInt(pos + 8 + 36)))
          case c if isVideoChunk(c) =>
            frames += java.util.Arrays.copyOfRange(bytes, pos + 8, pos + 8 + size)
          case _ => // strh/strf/idx1/JUNK...: structural presence only
        }
        pos += 8 + size + (size & 1) // word alignment
      }
      true
    }
    if (!walk(12, riffEnd)) return None
    header match {
      case Some((uspf, total, w, h))
          if w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20) && frames.nonEmpty =>
        Some(Avi(w, h, uspf, total, frames.toArray))
      case _ => None
    }
  }
}
