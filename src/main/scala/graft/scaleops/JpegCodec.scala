package graft.scaleops

/** Baseline JPEG codec — the entropy-coded image format a real crawl
  * is overwhelmingly made of (the r11 gap: `multimodal_neardup`'s
  * dHash ran on real pixels for BMP/PGM/PPM while JPEG stayed a
  * header-only stub). Self-contained implementation of the PUBLIC
  * spec (ITU-T T.81 / ISO 10918-1, baseline sequential DCT, 8-bit):
  *
  *  - DECODER ([[decode]]): marker walk (DQT/DHT/SOF0/DRI/SOS, APPn
  *    and COM skipped by length), canonical Huffman tables built per
  *    Annex C from the file's own BITS/HUFFVAL, MCU entropy decode
  *    with byte-unstuffing and RST0-7 restart handling, dequantize,
  *    double-precision separable IDCT (spec A.3.3), level shift +
  *    clamp, nearest-neighbor chroma upsampling for any (Hi, Vi)
  *    sampling grid (4:4:4 and 4:2:0 both exercised in JpegSpec),
  *    JFIF YCbCr→RGB (CCIR 601).
  *
  *  - PROGRESSIVE (SOF2, r13 verdict #5 — ~10% of real crawls):
  *    multi-scan marker walk accumulating spectral-selection /
  *    successive-approximation coefficients (DC initial + refinement,
  *    AC initial with EOB runs, AC refinement with correction bits —
  *    spec §G), rendered once at EOI through the SAME IDCT/assembly
  *    kernels as baseline. Non-interleaved scans cover the
  *    component's ceil block grid; restarts reset predictors AND the
  *    EOB run. Arithmetic coding and lossless stay out of scope
  *    (return None).
  *
  *  - FIXTURE ENCODER ([[encodeGrayBlocks]]): grayscale baseline
  *    stream whose every 8×8 block is a CONSTANT value under a
  *    unit (all-ones) quantization table. A constant block's DCT has
  *    only the DC term (8·(v−128)), which quantizes losslessly at
  *    q=1 and inverts exactly (IDCT of a DC-only block is DC/8
  *    everywhere), so decode∘encode is the IDENTITY on the block
  *    values — the gate oracle replays the decoded channel sums from
  *    the pixel formula arithmetically, the same discipline as the
  *    BMP/PGM/WAV fixtures. The encoder emits minimal canonical
  *    Huffman tables (12 DC categories; a single-symbol AC table
  *    holding EOB) — valid per Annex C, decoded from the file like
  *    any other stream, nothing hard-wired between the two halves.
  *
  * Decoding is per-image executor work inside `mapPartitions` — at
  * 100 TB the corpus parallelism is the scan's, and one image never
  * crosses a partition.
  */
object JpegCodec {

  /** Decoded image: w × h, `comps` = 1 (gray) or 3 (RGB), pixels
    * interleaved row-major (`comps` bytes per pixel). */
  final case class Image(w: Int, h: Int, comps: Int, pixels: Array[Byte])

  // zigzag index -> natural (row-major) index, spec Figure A.6
  private val ZigZag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // separable IDCT basis: c(u)/2 · cos((2x+1)uπ/16), precomputed
  private val IdctBasis: Array[Array[Double]] = Array.tabulate(8, 8) {
    (u, x) =>
      val cu = if (u == 0) 1.0 / math.sqrt(2.0) else 1.0
      0.5 * cu * math.cos((2 * x + 1) * u * math.Pi / 16.0)
  }

  /** Canonical Huffman table per Annex C: for each symbol its
    * (code, length); decode via the F.2.2.3 mincode/maxcode walk. */
  private final class HuffTable(bits: Array[Int], vals: Array[Byte]) {
    // counts for code lengths 1..16
    require(bits.length == 16, "DHT BITS must have 16 length counts")
    val minCode = new Array[Int](17)
    val maxCode = new Array[Int](17) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    locally {
      var code = 0
      var k = 0
      var l = 1
      while (l <= 16) {
        if (bits(l - 1) == 0) { maxCode(l) = -1 }
        else {
          valPtr(l) = k
          minCode(l) = code
          code += bits(l - 1)
          k += bits(l - 1)
          maxCode(l) = code - 1
        }
        code <<= 1
        l += 1
      }
    }
    def value(length: Int, code: Int): Int =
      vals(valPtr(length) + code - minCode(length)) & 0xFF
    /** (code, length) per symbol — the encoder side of the same
      * canonical assignment. */
    def encodeMap: Map[Int, (Int, Int)] = {
      var code = 0
      var k = 0
      val m = scala.collection.mutable.Map[Int, (Int, Int)]()
      var l = 1
      while (l <= 16) {
        var i = 0
        while (i < bits(l - 1)) {
          m(vals(k) & 0xFF) = (code, l)
          code += 1; k += 1; i += 1
        }
        code <<= 1
        l += 1
      }
      m.toMap
    }
  }

  /** Entropy-segment bit reader: 0xFF00 unstuffing; an 0xFF followed
    * by a marker byte ends the segment (position left AT the 0xFF). */
  private final class BitReader(p: Array[Byte], var pos: Int) {
    private var acc = 0
    private var nbits = 0
    def align(): Unit = { acc = 0; nbits = 0 }
    /** next bit, or -1 at a marker/EOF */
    def bit(): Int = {
      if (nbits == 0) {
        if (pos >= p.length) return -1
        val b = p(pos) & 0xFF
        if (b == 0xFF) {
          if (pos + 1 >= p.length) return -1
          val b2 = p(pos + 1) & 0xFF
          if (b2 == 0x00) { pos += 2; acc = 0xFF; nbits = 8 }
          else return -1 // marker: leave pos at the 0xFF
        } else { pos += 1; acc = b; nbits = 8 }
      }
      nbits -= 1
      (acc >> nbits) & 1
    }
    def bits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bit()
        if (b < 0) return -1
        v = (v << 1) | b
        i += 1
      }
      v
    }
    def decodeHuff(t: HuffTable): Int = {
      var code = bit()
      if (code < 0) return -1
      var l = 1
      while (l <= 16) {
        if (t.maxCode(l) >= 0 && code <= t.maxCode(l))
          return t.value(l, code)
        val b = bit()
        if (b < 0) return -1
        code = (code << 1) | b
        l += 1
      }
      -1
    }
  }

  // spec F.2.2.1 EXTEND: map a RECEIVE'd magnitude to its signed value
  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  private final case class Component(id: Int, h: Int, v: Int, tq: Int)

  /** Decode a baseline or progressive JPEG. None on anything out of
    * scope (arithmetic coding, lossless, 12-bit, truncated streams). */
  def decode(p: Array[Byte]): Option[Image] = {
    try decodeImpl(p)
    catch { case _: Exception => None } // corrupt stream = not a JPEG
  }

  private def decodeImpl(p: Array[Byte]): Option[Image] = {
    if (p.length < 4 || (p(0) & 0xFF) != 0xFF || (p(1) & 0xFF) != 0xD8)
      return None
    val qt = new Array[Array[Int]](4)
    val huffDc = new Array[HuffTable](4)
    val huffAc = new Array[HuffTable](4)
    var comps: Array[Component] = null
    var w = 0
    var h = 0
    var restartInterval = 0
    // progressive (SOF2) state: coefficients ACCUMULATE across scans
    // into per-component natural-order blocks on the MCU-padded grid;
    // rendered once at EOI (spec G.1/G.2)
    var progressive = false
    var sawScan = false
    var coefPlanes: Array[Array[Int]] = null
    var blocksWpad: Array[Int] = null
    var blocksHpad: Array[Int] = null
    var blocksWceil: Array[Int] = null
    var blocksHceil: Array[Int] = null
    var mcusX = 0
    var mcusY = 0
    var i = 2
    while (i + 1 < p.length) {
      if ((p(i) & 0xFF) != 0xFF) return None
      val marker = p(i + 1) & 0xFF
      if (marker == 0xD8) { i += 2 }
      else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD7)) i += 2
      else if (marker == 0xD9) // EOI: standalone (no length field) —
        // the render point of an accumulated progressive stream
        return if (progressive && sawScan)
          renderProgressive(w, h, comps, qt, coefPlanes,
            blocksWpad, blocksHpad)
        else None
      else if (i + 3 >= p.length) return None // truncated segment
      else {
        val len = ((p(i + 2) & 0xFF) << 8) | (p(i + 3) & 0xFF)
        val seg = i + 4
        var nextI = -1 // a progressive SOS sets this past its entropy data
        marker match {
          case 0xDB => // DQT: one or more tables
            var o = seg
            while (o < i + 2 + len) {
              val pq = (p(o) & 0xFF) >> 4
              val tq = p(o) & 0x0F
              val t = new Array[Int](64)
              var k = 0
              while (k < 64) {
                t(k) =
                  if (pq == 0) p(o + 1 + k) & 0xFF
                  else ((p(o + 1 + 2 * k) & 0xFF) << 8) |
                    (p(o + 2 + 2 * k) & 0xFF)
                k += 1
              }
              qt(tq) = t
              o += 1 + (if (pq == 0) 64 else 128)
            }
          case 0xC4 => // DHT: one or more tables
            var o = seg
            while (o < i + 2 + len) {
              val tc = (p(o) & 0xFF) >> 4
              val th = p(o) & 0x0F
              val bits = Array.tabulate(16)(k => p(o + 1 + k) & 0xFF)
              val n = bits.sum
              val vals = new Array[Byte](n)
              System.arraycopy(p, o + 17, vals, 0, n)
              val t = new HuffTable(bits, vals)
              if (tc == 0) huffDc(th) = t else huffAc(th) = t
              o += 17 + n
            }
          case 0xC0 | 0xC1 | 0xC2 => // SOF0/1 baseline, SOF2 progressive
            if ((p(seg) & 0xFF) != 8) return None // 8-bit only
            progressive = marker == 0xC2
            h = ((p(seg + 1) & 0xFF) << 8) | (p(seg + 2) & 0xFF)
            w = ((p(seg + 3) & 0xFF) << 8) | (p(seg + 4) & 0xFF)
            val nc = p(seg + 5) & 0xFF
            if (nc != 1 && nc != 3) return None
            comps = Array.tabulate(nc) { c =>
              val o = seg + 6 + 3 * c
              Component(p(o) & 0xFF, (p(o + 1) & 0xFF) >> 4,
                p(o + 1) & 0x0F, p(o + 2) & 0xFF)
            }
          case 0xC3 | 0xC5 | 0xC6 | 0xC7 | 0xC9 | 0xCA | 0xCB |
              0xCD | 0xCE | 0xCF =>
            return None // lossless/arithmetic/hierarchical out of scope
          case 0xDD =>
            restartInterval = ((p(seg) & 0xFF) << 8) | (p(seg + 1) & 0xFF)
          case 0xDA if !progressive => // baseline SOS: one scan, done
            if (comps == null || w <= 0 || h <= 0) return None
            val ns = p(seg) & 0xFF
            if (ns != comps.length) return None // single-scan baseline
            val scanTables = Array.tabulate(ns) { c =>
              val cid = p(seg + 1 + 2 * c) & 0xFF
              val td = (p(seg + 2 + 2 * c) & 0xFF) >> 4
              val ta = p(seg + 2 + 2 * c) & 0x0F
              (cid, td, ta)
            }
            return decodeScan(p, i + 2 + len, w, h, comps, scanTables,
              qt, huffDc, huffAc, restartInterval)
          case 0xDA => // progressive SOS: accumulate one scan's band/bits
            if (comps == null || w <= 0 || h <= 0) return None
            val ns = p(seg) & 0xFF
            if (ns < 1 || ns > comps.length) return None
            val sIdx = new Array[Int](ns)
            val dcT = new Array[HuffTable](ns)
            val acT = new Array[HuffTable](ns)
            var c2 = 0
            while (c2 < ns) {
              val cid = p(seg + 1 + 2 * c2) & 0xFF
              val ci = comps.indexWhere(_.id == cid)
              if (ci < 0) return None
              sIdx(c2) = ci
              dcT(c2) = huffDc((p(seg + 2 + 2 * c2) & 0xFF) >> 4)
              acT(c2) = huffAc(p(seg + 2 + 2 * c2) & 0x0F)
              c2 += 1
            }
            val o2 = seg + 1 + 2 * ns
            val scanSs = p(o2) & 0xFF
            val scanSe = p(o2 + 1) & 0xFF
            val scanAh = (p(o2 + 2) & 0xFF) >> 4
            val scanAl = p(o2 + 2) & 0x0F
            if (scanSs > 63 || scanSe > 63 || scanSe < scanSs) return None
            if (scanSs == 0 && scanSe != 0) return None // DC scan: Se=0
            if (scanSs > 0 && ns != 1) return None // AC scans: 1 comp
            if (coefPlanes == null) {
              val hMax = comps.map(_.h).max
              val vMax = comps.map(_.v).max
              mcusX = (w + 8 * hMax - 1) / (8 * hMax)
              mcusY = (h + 8 * vMax - 1) / (8 * vMax)
              blocksWpad = comps.map(c => mcusX * c.h)
              blocksHpad = comps.map(c => mcusY * c.v)
              // non-interleaved scans cover only the CEIL grid of the
              // component's own sample dimensions (spec A.2.2) — the
              // padded grid's extra dummy blocks are not coded there
              blocksWceil = comps.map(c =>
                ((w * c.h + hMax - 1) / hMax + 7) / 8)
              blocksHceil = comps.map(c =>
                ((h * c.v + vMax - 1) / vMax + 7) / 8)
              coefPlanes = comps.indices.toArray.map(c =>
                new Array[Int](blocksWpad(c) * blocksHpad(c) * 64))
            }
            sawScan = true
            nextI = decodeProgScan(p, i + 2 + len, sIdx, dcT, acT,
              scanSs, scanSe, scanAh, scanAl, comps, coefPlanes,
              blocksWpad, blocksWceil, blocksHceil, mcusX, mcusY,
              restartInterval)
          case _ => () // APPn, COM, anything else: skip by length
        }
        i = if (nextI >= 0) nextI else i + 2 + len
      }
    }
    None
  }

  /** One progressive scan (spec G.2): DC initial / DC refinement /
    * AC initial with EOB runs / AC refinement with correction bits.
    * Coefficients land natural-order in `coefPlanes`, scaled by 2^Al
    * (successive approximation) — dequantization happens at render.
    * Returns the position of the next marker's 0xFF. Throws on
    * malformed streams ([[decode]] maps that to None). */
  private def decodeProgScan(p: Array[Byte], start: Int,
                             sIdx: Array[Int], dcT: Array[HuffTable],
                             acT: Array[HuffTable],
                             ss: Int, se: Int, ah: Int, al: Int,
                             comps: Array[Component],
                             coefPlanes: Array[Array[Int]],
                             blocksWpad: Array[Int],
                             blocksWceil: Array[Int],
                             blocksHceil: Array[Int],
                             mcusX: Int, mcusY: Int,
                             restartInterval: Int): Int = {
    val r = new BitReader(p, start)
    val ns = sIdx.length
    val dcPred = new Array[Int](ns)
    var eobrun = 0
    def fail(): Nothing = throw new IllegalArgumentException("bad scan")

    def restart(unit: Int): Unit =
      if (restartInterval > 0 && unit > 0 && unit % restartInterval == 0) {
        r.align()
        if (r.pos + 1 < p.length && (p(r.pos) & 0xFF) == 0xFF) {
          val m = p(r.pos + 1) & 0xFF
          if (m >= 0xD0 && m <= 0xD7) r.pos += 2 else fail()
        } else fail()
        java.util.Arrays.fill(dcPred, 0)
        eobrun = 0
      }

    def dcInit(sc: Int, plane: Array[Int], off: Int): Unit = {
      val t = r.decodeHuff(dcT(sc))
      if (t < 0) fail()
      val diffBits = if (t == 0) 0 else r.bits(t)
      if (diffBits < 0) fail()
      dcPred(sc) += extend(diffBits, t)
      plane(off) = dcPred(sc) << al
    }

    def dcRefine(plane: Array[Int], off: Int): Unit = {
      val b = r.bit()
      if (b < 0) fail()
      if (b != 0) plane(off) |= (1 << al)
    }

    def acInit(plane: Array[Int], off: Int): Unit = {
      if (eobrun > 0) { eobrun -= 1; return }
      var k = ss
      while (k <= se) {
        val rs = r.decodeHuff(acT(0))
        if (rs < 0) fail()
        val run = rs >> 4
        val size = rs & 0x0F
        if (size == 0) {
          if (run == 15) k += 16 // ZRL
          else { // EOBn: run of (1<<run)+receive(run) end-of-bands
            eobrun = 1 << run
            if (run > 0) {
              val b = r.bits(run)
              if (b < 0) fail()
              eobrun += b
            }
            eobrun -= 1 // this block's EOB is part of the run
            return
          }
        } else {
          k += run
          if (k > se) fail()
          val v = r.bits(size)
          if (v < 0) fail()
          plane(off + ZigZag(k)) = extend(v, size) << al
          k += 1
        }
      }
    }

    // AC successive-approximation refinement (spec G.1.2.3): each
    // already-nonzero coefficient in the band consumes one correction
    // bit; a decoded (run, 1) symbol inserts a NEW ±1<<Al after `run`
    // zero-history coefficients; EOB runs carry correction bits for
    // the rest of the band.
    def acRefine(plane: Array[Int], off: Int): Unit = {
      val p1 = 1 << al
      val m1 = -1 << al
      def correct(zz: Int): Unit = {
        val b = r.bit()
        if (b < 0) fail()
        if (b != 0 && (plane(off + zz) & p1) == 0)
          plane(off + zz) += (if (plane(off + zz) >= 0) p1 else m1)
      }
      var k = ss
      if (eobrun == 0) {
        var atEob = false
        while (k <= se && !atEob) {
          val rs = r.decodeHuff(acT(0))
          if (rs < 0) fail()
          var run = rs >> 4
          val size = rs & 0x0F
          var newVal = 0
          if (size == 0) {
            if (run != 15) { // EOBn
              eobrun = 1 << run
              if (run > 0) {
                val b = r.bits(run)
                if (b < 0) fail()
                eobrun += b
              }
              atEob = true
            }
            // run == 15: ZRL — skip 16 zero-history coefficients
          } else {
            if (size != 1) fail() // refinement codes only ±1
            val b = r.bit()
            if (b < 0) fail()
            newVal = if (b != 0) p1 else m1
          }
          if (!atEob) {
            var break2 = false
            while (k <= se && !break2) {
              val zz = ZigZag(k)
              if (plane(off + zz) != 0) correct(zz)
              else {
                if (run == 0) break2 = true
                else run -= 1
              }
              if (!break2) k += 1
            }
            if (size != 0) {
              if (k > se) fail()
              plane(off + ZigZag(k)) = newVal
            }
            k += 1
          }
        }
      }
      if (eobrun > 0) {
        while (k <= se) {
          val zz = ZigZag(k)
          if (plane(off + zz) != 0) correct(zz)
          k += 1
        }
        eobrun -= 1
      }
    }

    def decodeBlock(sc: Int, bx: Int, by: Int): Unit = {
      val ci = sIdx(sc)
      val plane = coefPlanes(ci)
      val off = (by * blocksWpad(ci) + bx) * 64
      if (ss == 0) {
        if (ah == 0) dcInit(sc, plane, off) else dcRefine(plane, off)
      } else {
        if (ah == 0) acInit(plane, off) else acRefine(plane, off)
      }
    }

    if (ns > 1) {
      // interleaved (DC scans only): MCU order, h×v blocks per comp
      var mcu = 0
      val nMcus = mcusX * mcusY
      while (mcu < nMcus) {
        restart(mcu)
        val mx = mcu % mcusX
        val my = mcu / mcusX
        var sc = 0
        while (sc < ns) {
          val comp = comps(sIdx(sc))
          var by = 0
          while (by < comp.v) {
            var bx = 0
            while (bx < comp.h) {
              decodeBlock(sc, mx * comp.h + bx, my * comp.v + by)
              bx += 1
            }
            by += 1
          }
          sc += 1
        }
        mcu += 1
      }
    } else {
      // non-interleaved: raster over the component's ceil block grid
      val ci = sIdx(0)
      val bw = blocksWceil(ci)
      val bh = blocksHceil(ci)
      var blk = 0
      val nBlk = bw * bh
      while (blk < nBlk) {
        restart(blk)
        decodeBlock(0, blk % bw, blk / bw)
        blk += 1
      }
    }
    // entropy data done: the next marker's 0xFF is at or after r.pos
    var q = r.pos
    while (q + 1 < p.length &&
      !((p(q) & 0xFF) == 0xFF && (p(q + 1) & 0xFF) != 0x00 &&
        (p(q + 1) & 0xFF) != 0xFF)) q += 1
    q
  }

  /** Dequantize + IDCT the accumulated progressive coefficients and
    * assemble the image — same [[idctToPlane]]/[[assemble]] kernels
    * as the baseline path. */
  private def renderProgressive(w: Int, h: Int, comps: Array[Component],
                                qt: Array[Array[Int]],
                                coefPlanes: Array[Array[Int]],
                                blocksWpad: Array[Int],
                                blocksHpad: Array[Int]): Option[Image] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val nc = comps.length
    val planeW = Array.tabulate(nc)(c => blocksWpad(c) * 8)
    val planes = Array.tabulate(nc)(c =>
      new Array[Byte](planeW(c) * blocksHpad(c) * 8))
    val dq = new Array[Int](64)
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var c = 0
    while (c < nc) {
      val q = qt(comps(c).tq)
      if (q == null) return None
      val plane = coefPlanes(c)
      val bw = blocksWpad(c)
      val nBlk = bw * blocksHpad(c)
      var blk = 0
      while (blk < nBlk) {
        val off = blk * 64
        var k = 0
        while (k < 64) {
          val zz = ZigZag(k)
          dq(zz) = plane(off + zz) * q(k)
          k += 1
        }
        idctToPlane(dq, tmp, out, planes(c), planeW(c),
          (blk % bw) * 8, (blk / bw) * 8)
        blk += 1
      }
      c += 1
    }
    assemble(w, h, comps, planes, planeW, hMax, vMax)
  }

  private def decodeScan(p: Array[Byte], start: Int, w: Int, h: Int,
                         comps: Array[Component],
                         scanTables: Array[(Int, Int, Int)],
                         qt: Array[Array[Int]],
                         huffDc: Array[HuffTable], huffAc: Array[HuffTable],
                         restartInterval: Int): Option[Image] = {
    val hMax = comps.map(_.h).max
    val vMax = comps.map(_.v).max
    val mcusX = (w + 8 * hMax - 1) / (8 * hMax)
    val mcusY = (h + 8 * vMax - 1) / (8 * vMax)
    val nc = comps.length
    // per-component plane at its own sampling resolution
    val planeW = comps.map(c => mcusX * c.h * 8)
    val planeH = comps.map(c => mcusY * c.v * 8)
    val planes = Array.tabulate(nc)(c => new Array[Byte](planeW(c) * planeH(c)))
    val dcTab = new Array[HuffTable](nc)
    val acTab = new Array[HuffTable](nc)
    var c = 0
    while (c < nc) {
      val st = scanTables.find(_._1 == comps(c).id).getOrElse(return None)
      dcTab(c) = huffDc(st._2); acTab(c) = huffAc(st._3)
      if (dcTab(c) == null || acTab(c) == null || qt(comps(c).tq) == null)
        return None
      c += 1
    }
    val r = new BitReader(p, start)
    val dcPred = new Array[Int](nc)
    val coef = new Array[Int](64)
    val tmp = new Array[Double](64)
    val out = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        // byte-align, consume RSTn, reset predictors
        r.align()
        if (r.pos + 1 < p.length && (p(r.pos) & 0xFF) == 0xFF) {
          val m = p(r.pos + 1) & 0xFF
          if (m >= 0xD0 && m <= 0xD7) r.pos += 2 else return None
        } else return None
        java.util.Arrays.fill(dcPred, 0)
      }
      val mx = mcu % mcusX
      val my = mcu / mcusX
      c = 0
      while (c < nc) {
        val comp = comps(c)
        val q = qt(comp.tq)
        var by = 0
        while (by < comp.v) {
          var bx = 0
          while (bx < comp.h) {
            // entropy-decode one block
            java.util.Arrays.fill(coef, 0)
            val t = r.decodeHuff(dcTab(c))
            if (t < 0) return None
            val diffBits = if (t == 0) 0 else r.bits(t)
            if (diffBits < 0) return None
            dcPred(c) += extend(diffBits, t)
            coef(0) = dcPred(c) * q(0)
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = r.decodeHuff(acTab(c))
              if (rs < 0) return None
              val run = rs >> 4
              val size = rs & 0x0F
              if (size == 0) {
                if (run == 15) k += 16 // ZRL
                else eob = true
              } else {
                k += run
                if (k > 63) return None
                val v = r.bits(size)
                if (v < 0) return None
                coef(ZigZag(k)) = extend(v, size) * q(k)
                k += 1
              }
            }
            idctToPlane(coef, tmp, out, planes(c), planeW(c),
              (mx * comp.h + bx) * 8, (my * comp.v + by) * 8)
            bx += 1
          }
          by += 1
        }
        c += 1
      }
      mcu += 1
    }
    assemble(w, h, comps, planes, planeW, hMax, vMax)
  }

  /** Separable IDCT of one natural-order coefficient block (rows then
    * columns — spec A.3.3), level shift + clamp, written into the
    * component plane at (px, py). Shared by the baseline single-scan
    * path and the progressive render (identical double-precision op
    * order, so the two paths are bit-identical on the same
    * coefficients). */
  private def idctToPlane(coef: Array[Int], tmp: Array[Double],
                          out: Array[Double], plane: Array[Byte],
                          pw: Int, px: Int, py: Int): Unit = {
    var y0 = 0
    while (y0 < 8) {
      var x0 = 0
      while (x0 < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) {
          s += IdctBasis(u)(x0) * coef(y0 * 8 + u)
          u += 1
        }
        tmp(y0 * 8 + x0) = s
        x0 += 1
      }
      y0 += 1
    }
    var x1 = 0
    while (x1 < 8) {
      var y1 = 0
      while (y1 < 8) {
        var s = 0.0
        var v0 = 0
        while (v0 < 8) {
          s += IdctBasis(v0)(y1) * tmp(v0 * 8 + x1)
          v0 += 1
        }
        out(y1 * 8 + x1) = s
        y1 += 1
      }
      x1 += 1
    }
    var yy = 0
    while (yy < 8) {
      var xx = 0
      while (xx < 8) {
        val v = math.round(out(yy * 8 + xx) + 128.0).toInt
        plane((py + yy) * pw + px + xx) =
          (if (v < 0) 0 else if (v > 255) 255 else v).toByte
        xx += 1
      }
      yy += 1
    }
  }

  /** Assemble component planes into the output image: per-pixel
    * nearest-neighbor sample of each plane, JFIF YCbCr→RGB (CCIR 601)
    * for 3 components. */
  private def assemble(w: Int, h: Int, comps: Array[Component],
                       planes: Array[Array[Byte]], planeW: Array[Int],
                       hMax: Int, vMax: Int): Option[Image] = {
    val nc = comps.length
    if (nc == 1) {
      val plane = planes(0)
      val pw = planeW(0)
      val pix = new Array[Byte](w * h)
      var y = 0
      while (y < h) {
        System.arraycopy(plane, y * pw, pix, y * w, w)
        y += 1
      }
      Some(Image(w, h, 1, pix))
    } else {
      val pix = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          def sample(c: Int): Int = {
            val sx = x * comps(c).h / hMax
            val sy = y * comps(c).v / vMax
            planes(c)(sy * planeW(c) + sx) & 0xFF
          }
          val yv = sample(0).toDouble
          val cb = sample(1) - 128.0
          val cr = sample(2) - 128.0
          def clamp(d: Double): Byte = {
            val v = math.round(d).toInt
            (if (v < 0) 0 else if (v > 255) 255 else v).toByte
          }
          val o = (y * w + x) * 3
          pix(o) = clamp(yv + 1.402 * cr)
          pix(o + 1) = clamp(yv - 0.344136 * cb - 0.714136 * cr)
          pix(o + 2) = clamp(yv + 1.772 * cb)
          x += 1
        }
        y += 1
      }
      Some(Image(w, h, 3, pix))
    }
  }

  /** Per-channel pixel sums of a decoded JPEG — the
    * [[Multimodal.decodePixels]] contract (gray replicates into all
    * three channels). */
  private[graft] def channelSums(p: Array[Byte])
      : Option[(Int, Int, Long, Long, Long)] =
    decode(p).map { img =>
      var sr, sg, sb = 0L
      if (img.comps == 1) {
        var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xFF
          sr += v; sg += v; sb += v
          i += 1
        }
      } else {
        var i = 0
        while (i < img.pixels.length) {
          sr += img.pixels(i) & 0xFF
          sg += img.pixels(i + 1) & 0xFF
          sb += img.pixels(i + 2) & 0xFF
          i += 3
        }
      }
      (img.w, img.h, sr, sg, sb)
    }

  // ---- fixture encoder ---------------------------------------------------

  // minimal canonical tables for the fixture stream: 12 DC categories
  // (4-bit codes 0000..1011), one AC symbol (EOB, 1-bit code 0)
  private val FixDcBits = Array(0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val FixDcVals = Array.tabulate[Byte](12)(_.toByte)
  private val FixAcBits = Array(1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
  private val FixAcVals = Array[Byte](0x00)

  private final class BitWriter(buf: java.io.ByteArrayOutputStream) {
    private var acc = 0
    private var nbits = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1)
        nbits += 1
        if (nbits == 8) {
          buf.write(acc & 0xFF)
          if ((acc & 0xFF) == 0xFF) buf.write(0x00) // byte stuffing
          acc = 0; nbits = 0
        }
        i -= 1
      }
    }
    def flushWithOnes(): Unit =
      if (nbits > 0) { put((1 << (8 - nbits)) - 1, 8 - nbits) }
  }

  /** Encode a grayscale baseline JPEG of `w`×`h` (both multiples of
    * 8) whose 8×8 block at raster index b is the constant
    * `blockVal(b)` ∈ [0, 255]. Unit quantization + constant blocks ⇒
    * [[decode]] returns exactly these values (see object doc).
    * `restartInterval` > 0 emits DRI + RST0-7 markers every that
    * many MCUs (predictor reset + byte alignment per spec) so the
    * decoder's restart path is testable. */
  private[graft] def encodeGrayBlocks(w: Int, h: Int,
                                      blockVal: Int => Int,
                                      restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "fixture dims must be block-aligned")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    def seg(marker: Int)(body: => Unit): Unit = {
      b(0xFF); b(marker)
      val lenPos = out.size()
      b16(0) // placeholder
      body
      val bytes = out.toByteArray
      val len = bytes.length - lenPos
      bytes(lenPos) = ((len >> 8) & 0xFF).toByte
      bytes(lenPos + 1) = (len & 0xFF).toByte
      out.reset(); out.write(bytes, 0, bytes.length)
    }
    b(0xFF); b(0xD8) // SOI
    seg(0xDB) { b(0x00); (0 until 64).foreach(_ => b(1)) } // DQT q=1
    seg(0xC0) { // SOF0: 8-bit, 1 component, 1x1 sampling, tq 0
      b(8); b16(h); b16(w); b(1); b(1); b(0x11); b(0)
    }
    seg(0xC4) { // DHT: DC table 0 + AC table 0 in one segment
      b(0x00); FixDcBits.foreach(b); FixDcVals.foreach(v => b(v.toInt))
      b(0x10); FixAcBits.foreach(b); FixAcVals.foreach(v => b(v.toInt))
    }
    if (restartInterval > 0)
      seg(0xDD) { b16(restartInterval) } // DRI
    seg(0xDA) { b(1); b(1); b(0x00); b(0); b(63); b(0) } // SOS
    val dcCodes = new HuffTable(FixDcBits, FixDcVals).encodeMap
    val acCodes = new HuffTable(FixAcBits, FixAcVals).encodeMap
    val (eobCode, eobLen) = acCodes(0x00)
    val bw = new BitWriter(out)
    val nBlocks = (w / 8) * (h / 8)
    var pred = 0
    var blk = 0
    while (blk < nBlocks) {
      if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
        bw.flushWithOnes()
        b(0xFF); b(0xD0 + ((blk / restartInterval - 1) % 8))
        pred = 0
      }
      val v = blockVal(blk)
      require(v >= 0 && v <= 255, s"block value $v out of range")
      val dc = 8 * (v - 128)
      var diff = dc - pred
      pred = dc
      // category (bits needed) + the EXTEND-complement low bits
      val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
      val (code, len) = dcCodes(cat)
      bw.put(code, len)
      if (cat > 0) {
        if (diff < 0) diff += (1 << cat) - 1
        bw.put(diff, cat)
      }
      bw.put(eobCode, eobLen)
      blk += 1
    }
    bw.flushWithOnes()
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }

  /** PROGRESSIVE twin of [[encodeGrayBlocks]]: the same constant-
    * block image as a three-scan SOF2 stream — (1) DC initial at
    * Al=1 coding the point-transformed `dc >> 1` diffs, (2) DC
    * refinement appending the low bit, (3) an AC initial scan that is
    * one EOB per block (constant blocks have no AC energy). Because
    * `(dc >> 1) << 1 | (dc & 1) == dc` in two's complement, the
    * accumulated coefficient equals the baseline stream's exactly, so
    * decode∘encode stays the IDENTITY on block values and the gate
    * oracle replays the decoded sums arithmetically — the same
    * discipline as the baseline fixture, now exercising the
    * multi-scan successive-approximation path. */
  private[graft] def encodeGrayBlocksProgressive(
      w: Int, h: Int, blockVal: Int => Int,
      restartInterval: Int = 0): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, "fixture dims must be block-aligned")
    val out = new java.io.ByteArrayOutputStream()
    def b(v: Int): Unit = out.write(v & 0xFF)
    def b16(v: Int): Unit = { b(v >> 8); b(v) }
    def seg(marker: Int)(body: => Unit): Unit = {
      b(0xFF); b(marker)
      val lenPos = out.size()
      b16(0)
      body
      val bytes = out.toByteArray
      val len = bytes.length - lenPos
      bytes(lenPos) = ((len >> 8) & 0xFF).toByte
      bytes(lenPos + 1) = (len & 0xFF).toByte
      out.reset(); out.write(bytes, 0, bytes.length)
    }
    b(0xFF); b(0xD8) // SOI
    seg(0xDB) { b(0x00); (0 until 64).foreach(_ => b(1)) } // DQT q=1
    seg(0xC2) { // SOF2: 8-bit, 1 component, 1x1 sampling, tq 0
      b(8); b16(h); b16(w); b(1); b(1); b(0x11); b(0)
    }
    seg(0xC4) {
      b(0x00); FixDcBits.foreach(b); FixDcVals.foreach(v => b(v.toInt))
      b(0x10); FixAcBits.foreach(b); FixAcVals.foreach(v => b(v.toInt))
    }
    if (restartInterval > 0)
      seg(0xDD) { b16(restartInterval) } // DRI: applies to EVERY scan
    val dcCodes = new HuffTable(FixDcBits, FixDcVals).encodeMap
    val acCodes = new HuffTable(FixAcBits, FixAcVals).encodeMap
    val nBlocks = (w / 8) * (h / 8)
    val dcs = Array.tabulate(nBlocks) { blk =>
      val v = blockVal(blk)
      require(v >= 0 && v <= 255, s"block value $v out of range")
      8 * (v - 128)
    }
    // per-scan restart boundary: byte-align, RSTn, return true when a
    // predictor reset is due (non-interleaved single-component scans
    // count restart units in BLOCKS)
    def restartAt(bw: BitWriter, blk: Int): Boolean =
      if (restartInterval > 0 && blk > 0 && blk % restartInterval == 0) {
        bw.flushWithOnes()
        b(0xFF); b(0xD0 + ((blk / restartInterval - 1) % 8))
        true
      } else false
    // scan 1: DC initial, Ah=0 Al=1 — diffs of the point-transformed
    // (arithmetic-shift) DC values
    seg(0xDA) { b(1); b(1); b(0x00); b(0); b(0); b(0x01) }
    locally {
      val bw = new BitWriter(out)
      var pred = 0
      var blk = 0
      while (blk < nBlocks) {
        if (restartAt(bw, blk)) pred = 0
        val v1 = dcs(blk) >> 1
        var diff = v1 - pred
        pred = v1
        val cat = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (code, len) = dcCodes(cat)
        bw.put(code, len)
        if (cat > 0) {
          if (diff < 0) diff += (1 << cat) - 1
          bw.put(diff, cat)
        }
        blk += 1
      }
      bw.flushWithOnes()
    }
    // scan 2: DC refinement, Ah=1 Al=0 — one raw low bit per block
    seg(0xDA) { b(1); b(1); b(0x00); b(0); b(0); b(0x10) }
    locally {
      val bw = new BitWriter(out)
      var blk = 0
      while (blk < nBlocks) {
        restartAt(bw, blk) // no predictor in a refinement scan
        bw.put(dcs(blk) & 1, 1)
        blk += 1
      }
      bw.flushWithOnes()
    }
    // scan 3: AC initial over the whole band — one EOB0 per block
    // (restart also terminates any pending EOB run per spec; the
    // fixture's runs are single-block, so the reset is structural)
    seg(0xDA) { b(1); b(1); b(0x00); b(1); b(63); b(0x00) }
    locally {
      val bw = new BitWriter(out)
      val (eobCode, eobLen) = acCodes(0x00)
      var blk = 0
      while (blk < nBlocks) {
        restartAt(bw, blk)
        bw.put(eobCode, eobLen)
        blk += 1
      }
      bw.flushWithOnes()
    }
    b(0xFF); b(0xD9) // EOI
    out.toByteArray
  }
}
