package graft.scaleops

/** GIF codec — closes the last header-only image format in the
  * pixel-decode family (r12 verdict #4; JPEG and PNG went real in
  * r12). Implements the PUBLIC GIF87a/GIF89a specification:
  *
  *  - DECODER ([[decode]]): header + logical screen descriptor,
  *    global/local color tables, extension-block skip (sub-block
  *    walk), FIRST image descriptor decoded (the single-frame
  *    contract JPEG/PNG share here) — with [[decodeFrames]] (r14)
  *    walking EVERY animation frame for the video near-dup sampler
  *    (disposal/compositing out of scope, frames hash independently)
  *    — Adam-style 4-pass interlace honored, and a full
  *    variable-width LZW decoder (clear/end codes, 12-bit cap,
  *    KwKwK case) — the entropy coding that made GIF header-only
  *    until this round. Palette indices map through the active color
  *    table to interleaved RGB. Corrupt/truncated streams return
  *    None, never throw and never spin (every loop is bounded by the
  *    byte length / pixel count).
  *
  *  - FIXTURE ENCODER ([[encodeGray]]): 256-entry grayscale global
  *    palette + a real LZW compressor (dictionary + clear-on-full),
  *    so gate fixtures exercise the actual entropy path; GIF is
  *    LOSSLESS for ≤256-color images, so decode(encode(px)) is the
  *    identity and the oracle replays pixel formulas exactly.
  *
  * Cross-checked against the JDK's independent GIF reader/writer in
  * GifSpec (the JpegSpec/PngSpec discipline). Per-image executor
  * work inside `mapPartitions`, like every other codec here. */
object GifCodec {

  /** Decoded first frame: w × h, comps = 3 (RGB via palette). */
  final case class Image(w: Int, h: Int, comps: Int, pixels: Array[Byte])

  private def le16(p: Array[Byte], i: Int): Int =
    (p(i) & 0xFF) | ((p(i + 1) & 0xFF) << 8)

  def decode(p: Array[Byte]): Option[Image] = {
    try decodeImpl(p)
    catch { case _: Exception => None }
  }

  /** All animation frames, in stream order (r14 — [[decode]] stays
    * the single-frame contract). PERMANENT CONTRACT (r15, per the r14
    * verdict): each image descriptor decodes STANDALONE at its own
    * dimensions — GIF89a disposal/compositing is deliberately and
    * permanently out of scope, so a frame-delta GIF (frames encoding
    * only the changed sub-rectangle) yields raw per-descriptor
    * pixels, not composited screen states. That is the right contract
    * for the engine's only consumer, near-dup frame hashing: raw
    * descriptors are a deterministic pure function of the byte
    * stream, identical streams hash identically, and compositing
    * would make every frame hash depend on mutable canvas state.
    * Callers needing screen-accurate frames must composite above this
    * API. None unless the stream is well-formed THROUGH ITS TRAILER. */
  def decodeFrames(p: Array[Byte]): Option[Seq[Image]] = {
    try decodeFramesImpl(p)
    catch { case _: Exception => None }
  }

  private def decodeImpl(p: Array[Byte]): Option[Image] =
    walk(p, firstOnly = true).flatMap(_.headOption)

  private def decodeFramesImpl(p: Array[Byte]): Option[Seq[Image]] =
    walk(p, firstOnly = false).filter(_.nonEmpty)

  /** Block walk shared by [[decode]] and [[decodeFrames]]:
    * `firstOnly` returns at the first decoded image descriptor (the
    * historical single-frame contract — later stream corruption is
    * irrelevant to it); otherwise frames accumulate until the 0x3B
    * trailer. */
  private def walk(p: Array[Byte], firstOnly: Boolean)
      : Option[Seq[Image]] = {
    if (p.length < 14) return None
    val hdr = new String(p, 0, 6, "US-ASCII")
    if (hdr != "GIF87a" && hdr != "GIF89a") return None
    val screenFlags = p(10) & 0xFF
    var i = 13
    var gct: Array[Int] = null
    if ((screenFlags & 0x80) != 0) {
      val sz = 2 << (screenFlags & 7)
      if (i + 3 * sz > p.length) return None
      gct = readColorTable(p, i, sz)
      i += 3 * sz
    }
    val frames = Seq.newBuilder[Image]
    var nFrames = 0
    while (i < p.length) {
      (p(i) & 0xFF) match {
        case 0x21 => // extension: label byte then sub-blocks
          i += 2
          while (i < p.length && (p(i) & 0xFF) != 0) i += 1 + (p(i) & 0xFF)
          i += 1 // block terminator
        case 0x2C => // image descriptor — decode one frame
          if (i + 10 > p.length) return None
          val iw = le16(p, i + 5)
          val ih = le16(p, i + 7)
          val f = p(i + 9) & 0xFF
          i += 10
          var ct = gct
          if ((f & 0x80) != 0) {
            val sz = 2 << (f & 7)
            if (i + 3 * sz > p.length) return None
            ct = readColorTable(p, i, sz)
            i += 3 * sz
          }
          if (ct == null || iw <= 0 || ih <= 0) return None
          if (iw.toLong * ih > 64L * 1024 * 1024) return None // sanity bound
          val interlaced = (f & 0x40) != 0
          if (i >= p.length) return None
          val minCode = p(i) & 0xFF
          i += 1
          val data = new java.io.ByteArrayOutputStream()
          while (i < p.length && (p(i) & 0xFF) != 0) {
            val n = p(i) & 0xFF
            if (i + 1 + n > p.length) return None
            data.write(p, i + 1, n)
            i += 1 + n
          }
          i += 1 // data block terminator
          val idx = lzwDecode(data.toByteArray, minCode, iw * ih)
            .getOrElse(return None)
          val rows = if (interlaced) deinterlace(idx, iw, ih) else idx
          val pix = new Array[Byte](iw * ih * 3)
          var k = 0
          while (k < iw * ih) {
            val ci = rows(k) & 0xFF
            if (ci >= ct.length) return None
            val rgb = ct(ci)
            pix(3 * k) = ((rgb >> 16) & 0xFF).toByte
            pix(3 * k + 1) = ((rgb >> 8) & 0xFF).toByte
            pix(3 * k + 2) = (rgb & 0xFF).toByte
            k += 1
          }
          frames += Image(iw, ih, 3, pix)
          nFrames += 1
          if (firstOnly) return Some(frames.result())
        case 0x3B => // trailer
          return if (nFrames > 0) Some(frames.result()) else None
        case _ => return None // unknown block type: corrupt
      }
    }
    None
  }

  private def readColorTable(p: Array[Byte], off: Int,
                             n: Int): Array[Int] = {
    val t = new Array[Int](n)
    var j = 0
    while (j < n) {
      t(j) = ((p(off + 3 * j) & 0xFF) << 16) |
        ((p(off + 3 * j + 1) & 0xFF) << 8) | (p(off + 3 * j + 2) & 0xFF)
      j += 1
    }
    t
  }

  /** GIF-variant LZW (spec appendix F): LSB-first variable-width
    * codes starting at minCode+1 bits, clear resets the table, width
    * grows when the table hits 2^width, hard 12-bit cap. Returns
    * exactly `nPixels` indices or None (truncated/overfull streams
    * fail structurally). */
  private[scaleops] def lzwDecode(d: Array[Byte], minCode: Int,
                                  nPixels: Int): Option[Array[Byte]] = {
    if (minCode < 2 || minCode > 8 || nPixels <= 0) return None
    val clear = 1 << minCode
    val end = clear + 1
    val maxDict = 4096
    val prefix = new Array[Int](maxDict)
    val suffix = new Array[Byte](maxDict)
    val stack = new Array[Byte](maxDict + 1)
    val out = new Array[Byte](nPixels)
    var outPos = 0
    var dictSize = end + 1
    var codeSize = minCode + 1
    var prev = -1
    var prevFirst: Byte = 0
    var bitPos = 0
    val totalBits = d.length * 8

    while (outPos < nPixels) {
      if (bitPos + codeSize > totalBits) return None // truncated
      var code = 0
      var b = 0
      while (b < codeSize) {
        val bi = bitPos + b
        code |= ((d(bi >> 3) >> (bi & 7)) & 1) << b
        b += 1
      }
      bitPos += codeSize
      if (code == end) return None // ended short of the pixel count
      else if (code == clear) {
        dictSize = end + 1
        codeSize = minCode + 1
        prev = -1
      } else {
        // expand `code` (or prev+firstChar(prev) for the KwKwK case)
        var sp = 0
        var c = code
        if (c == dictSize) {
          if (prev < 0) return None
          stack(sp) = prevFirst; sp += 1
          c = prev
        } else if (c > dictSize) return None
        while (c >= end + 1) {
          stack(sp) = suffix(c); sp += 1
          c = prefix(c)
        }
        if (c >= clear) return None // literal range check
        val first = c.toByte
        stack(sp) = first; sp += 1
        if (outPos + sp > nPixels) return None // overfull stream
        while (sp > 0) {
          sp -= 1
          out(outPos) = stack(sp)
          outPos += 1
        }
        if (prev >= 0 && dictSize < maxDict) {
          prefix(dictSize) = prev
          suffix(dictSize) = first
          dictSize += 1
          if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
        prevFirst = first
      }
    }
    Some(out)
  }

  /** Interlace passes (spec §23): rows arrive as y=0 step 8, y=4
    * step 8, y=2 step 4, y=1 step 2 — reorder to natural. */
  private def deinterlace(src: Array[Byte], w: Int,
                          h: Int): Array[Byte] = {
    val out = new Array[Byte](src.length)
    var srcRow = 0
    for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2))) {
      var y = start
      while (y < h) {
        System.arraycopy(src, srcRow * w, out, y * w, w)
        srcRow += 1
        y += step
      }
    }
    out
  }

  /** Per-channel pixel sums — the [[Multimodal.decodePixels]]
    * contract (palette RGB; a gray palette replicates into all
    * three, so a gray image hashes identically in any container). */
  private[graft] def channelSums(p: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    decode(p).map { img =>
      var sr, sg, sb = 0L
      var i = 0
      while (i < img.pixels.length) {
        sr += img.pixels(i) & 0xFF
        sg += img.pixels(i + 1) & 0xFF
        sb += img.pixels(i + 2) & 0xFF
        i += 3
      }
      (img.w, img.h, sr, sg, sb)
    }

  /** Fixture encoder: 8-bit grayscale (256-entry global palette with
    * r=g=b=index), real LZW compression. `f(x, y)` gives the gray
    * value; lossless by construction. */
  private[graft] def encodeGray(w: Int, h: Int,
                                f: (Int, Int) => Int): Array[Byte] =
    encodeGrayRows(w, h,
      Array.tabulate(h)(y => Array.tabulate(w)(x => f(x, y))),
      interlaced = false)

  /** Row-level fixture encoder: `rows` are in STORAGE order — pass
    * order when `interlaced` (the spec's 8/8/4/2 schedule), natural
    * order otherwise. Lets the spec pin the deinterlacer against a
    * hand-built interlaced stream. */
  private[graft] def encodeGrayRows(w: Int, h: Int,
                                    rows: Array[Array[Int]],
                                    interlaced: Boolean): Array[Byte] = {
    require(rows.length == h && rows.forall(_.length == w),
      s"need $h rows of $w values")
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, w, h)
    writeFrame(out, w, h, rows, interlaced)
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** ANIMATION fixture (r14): `nFrames` full-size frames, each
    * preceded by a real GIF89a graphic-control extension (disposal
    * 'none', 10 cs delay) — the multi-descriptor stream
    * [[decodeFrames]] walks. Same lossless-palette discipline as
    * [[encodeGray]], so frame pixels replay exactly. */
  private[graft] def encodeGrayAnimation(w: Int, h: Int, nFrames: Int,
                                         f: Int => (Int, Int) => Int)
      : Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, w, h)
    var fr = 0
    while (fr < nFrames) {
      // GCE: introducer, label 0xF9, block size 4, flags(disposal=1
      // 'leave in place'), delay 10cs LE, no transparent index,
      // terminator
      out.write(0x21); out.write(0xF9); out.write(4)
      out.write(0x04); out.write(10); out.write(0); out.write(0)
      out.write(0)
      val pf = f(fr)
      writeFrame(out, w, h,
        Array.tabulate(h)(y => Array.tabulate(w)(x => pf(x, y))),
        interlaced = false)
      fr += 1
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  private def writeHeader(out: java.io.ByteArrayOutputStream,
                          w: Int, h: Int): Unit = {
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write("GIF89a".getBytes("US-ASCII"))
    w16(w); w16(h)
    out.write(0xF7) // GCT present, 8 bits/px, 256 entries
    out.write(0) // background color index
    out.write(0) // aspect ratio
    for (j <- 0 until 256) { out.write(j); out.write(j); out.write(j) }
  }

  private def writeFrame(out: java.io.ByteArrayOutputStream,
                         w: Int, h: Int, rows: Array[Array[Int]],
                         interlaced: Boolean): Unit = {
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >> 8) & 0xFF) }
    out.write(0x2C) // image descriptor
    w16(0); w16(0); w16(w); w16(h)
    out.write(if (interlaced) 0x40 else 0) // no local table
    val idx = new Array[Byte](w * h)
    for (y <- 0 until h; x <- 0 until w)
      idx(y * w + x) = (rows(y)(x) & 0xFF).toByte
    out.write(8) // LZW minimum code size
    val lzw = lzwEncode(idx, 8)
    var o = 0
    while (o < lzw.length) {
      val n = math.min(255, lzw.length - o)
      out.write(n)
      out.write(lzw, o, n)
      o += n
    }
    out.write(0) // block terminator
  }

  /** LZW compressor, the decoder's exact mirror: width grows when
    * the decoder-synchronized table size (nextCode − 1) hits
    * 2^width; a clear code resets at the 12-bit cap. */
  private[scaleops] def lzwEncode(sym: Array[Byte],
                                  minCode: Int): Array[Byte] = {
    val clear = 1 << minCode
    val end = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0L // pending bits
    var nBits = 0
    var codeSize = minCode + 1
    def emit(code: Int): Unit = {
      cur |= code.toLong << nBits
      nBits += codeSize
      while (nBits >= 8) {
        out.write((cur & 0xFF).toInt)
        cur >>= 8
        nBits -= 8
      }
    }
    // (prefix<<8|byte) -> code; boxed Integer so a miss is null, not
    // an unboxed 0
    val dict = new java.util.HashMap[Integer, Integer]()
    var nextCode = end + 1
    def reset(): Unit = { dict.clear(); nextCode = end + 1; codeSize = minCode + 1 }
    emit(clear)
    var prev = -1
    var i = 0
    while (i < sym.length) {
      val b = sym(i) & 0xFF
      if (prev < 0) prev = b
      else {
        val key = Integer.valueOf((prev << 8) | b)
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          emit(prev)
          if (nextCode >= 4096) { emit(clear); reset() }
          else {
            dict.put(key, nextCode)
            nextCode += 1
            if (nextCode - 1 == (1 << codeSize) && codeSize < 12)
              codeSize += 1
          }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) emit(prev)
    emit(end)
    if (nBits > 0) out.write((cur & 0xFF).toInt)
    out.toByteArray
  }
}
