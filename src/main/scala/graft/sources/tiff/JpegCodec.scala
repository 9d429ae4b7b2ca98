package graft.sources.tiff

import java.io.ByteArrayOutputStream

/** Pure-JVM baseline JPEG (ITU T.81) ENCODER for grayscale 8-bit tiles —
  * the codec behind `COMPRESS=JPEG` tiled TIFF writes (the reference
  * builds its browser-servable pyramid with
  * `gdal_retile.py ... -co 'COMPRESS=JPEG'`,
  * data_pipelines/assets/sentinel/postprocessing.py:69 — the one write
  * codec the repo lacked until round 16).
  *
  * Byte layout straight from the public spec: SOI, DQT (table 0), SOF0,
  * DHT (Annex K.3 luminance DC + K.5 luminance AC defaults), SOS,
  * entropy-coded segment with 0xFF byte stuffing, EOI — each tile is a
  * complete standalone JPEG stream (TIFF-F/TechNote2 compression 7; no
  * shared-tables JPEGTables tag, so any conformant reader decodes a
  * tile from its byte range alone — the cloud-optimized property).
  *
  * Quantization uses the Annex K.1 luminance table under the standard
  * IJG quality scaling; **quality = 100 yields the all-ones table**, and
  * under it an 8×8-UNIFORM block encodes as an exact DC-only unit (all
  * AC coefficients are exactly 0 in the float DCT of a constant block;
  * DC = 8·(v−128) is exact), which any conformant decoder reconstructs
  * bit-perfectly — the same arithmetic the MJPEG fixtures rely on
  * (tools/jpeg_min.py) and what makes a JPEG-tiled write HASH-GATEABLE
  * (q206). General content at quality < 100 is ordinarily lossy, as
  * JPEG is; the encoder itself is deterministic, so write→read is still
  * reproducible, just not pixel-identical to the input.
  *
  * Decode goes through javax.imageio (the JDK's real baseline decoder —
  * the same seam MJPEG AVI frames use), keeping encode and decode
  * implementations INDEPENDENT: a round trip crosses two codebases.
  */
object JpegCodec {

  // ---- Annex K tables ------------------------------------------------
  /** K.1 luminance quantization, natural (row-major) order. */
  private val QLum: Array[Int] = Array(
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99)

  private val DcBits = Array(0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
  private val DcVals = (0 to 11).toArray
  private val AcBits = Array(0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
  private val AcVals = Array(
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA)

  /** Zigzag scan: ZZ(k) = natural index of the k-th zigzag position. */
  private val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  /** Canonical Huffman codes per T.81 C.2: symbol → (code, length). */
  private def codes(bits: Array[Int], vals: Array[Int]): Array[(Int, Int)] = {
    val bySym = new Array[(Int, Int)](256)
    var code = 0
    var k = 0
    for (len <- 1 to 16) {
      var i = 0
      while (i < bits(len - 1)) {
        bySym(vals(k)) = (code, len)
        code += 1; k += 1; i += 1
      }
      code <<= 1
    }
    bySym
  }
  private val DcCode = codes(DcBits, DcVals)
  private val AcCode = codes(AcBits, AcVals)

  /** IJG quality → scaled K.1 table (quality 100 ⇒ all ones — the
    * exact-DC-only regime for uniform blocks).
    */
  def quantTable(quality: Int): Array[Int] = {
    require(quality >= 1 && quality <= 100, s"jpeg quality $quality")
    val scale = if (quality < 50) 5000 / quality else 200 - 2 * quality
    QLum.map(q => math.min(255, math.max(1, (q * scale + 50) / 100)))
  }

  private class BitWriter {
    val out = new ByteArrayOutputStream()
    private var acc = 0
    private var n = 0
    def put(value: Int, length: Int): Unit = {
      var i = length - 1
      while (i >= 0) {
        acc = (acc << 1) | ((value >> i) & 1)
        n += 1
        if (n == 8) {
          out.write(acc)
          if (acc == 0xFF) out.write(0x00) // byte stuffing
          acc = 0; n = 0
        }
        i -= 1
      }
    }
    def done(): Unit = if (n > 0) put((1 << (8 - n)) - 1, 8 - n) // pad 1s
  }

  private def seg(out: ByteArrayOutputStream, marker: Int,
      payload: Array[Byte]): Unit = {
    out.write(0xFF); out.write(marker)
    val len = payload.length + 2
    out.write((len >> 8) & 0xFF); out.write(len & 0xFF)
    out.write(payload, 0, payload.length)
  }

  /** Encode row-major 8-bit grayscale `pixels` (w×h, both multiples of
    * 8 — TIFF tiles are multiples of 16) as one baseline JPEG stream.
    */
  def encodeGray(pixels: Array[Int], w: Int, h: Int, quality: Int): Array[Byte] = {
    require(w % 8 == 0 && h % 8 == 0, s"jpeg tile dims ${w}x$h not /8")
    require(pixels.length == w * h, s"${pixels.length} != $w*$h")
    val qt = quantTable(quality)

    val out = new ByteArrayOutputStream(pixels.length / 4 + 256)
    out.write(0xFF); out.write(0xD8) // SOI
    seg(out, 0xDB, (0.toByte +: Zigzag.map(i => qt(i).toByte)).toArray) // DQT in zigzag order
    seg(out, 0xC0, Array[Byte](8,
      ((h >> 8) & 0xFF).toByte, (h & 0xFF).toByte,
      ((w >> 8) & 0xFF).toByte, (w & 0xFF).toByte,
      1, 1, 0x11, 0)) // SOF0: 1 component, no subsampling, qtable 0
    seg(out, 0xC4,
      (0.toByte +: (DcBits.map(_.toByte) ++ DcVals.map(_.toByte))) ++
        (0x10.toByte +: (AcBits.map(_.toByte) ++ AcVals.map(_.toByte))))
    seg(out, 0xDA, Array[Byte](1, 1, 0x00, 0, 63, 0)) // SOS

    val bw = new BitWriter
    val coef = new Array[Int](64)
    val block = new Array[Double](64)
    var prevDc = 0
    val cos = Array.tabulate(8, 8)((x, u) =>
      math.cos((2 * x + 1) * u * math.Pi / 16))
    val c0 = 1.0 / math.sqrt(2)

    var by = 0
    while (by < h / 8) {
      var bx = 0
      while (bx < w / 8) {
        // level shift
        var i = 0
        while (i < 64) {
          block(i) = pixels((by * 8 + i / 8) * w + bx * 8 + i % 8) - 128.0
          i += 1
        }
        // fDCT + quantize (natural order). A CONSTANT block yields
        // exactly DC = 8·mean and AC ≡ 0 up to ~1e-12 float noise,
        // which the rounding kills — the quality-100 exact regime.
        var v = 0
        while (v < 8) {
          var u = 0
          while (u < 8) {
            var s = 0.0
            var y = 0
            while (y < 8) {
              var x = 0
              while (x < 8) {
                s += block(y * 8 + x) * cos(x)(u) * cos(y)(v)
                x += 1
              }
              y += 1
            }
            val cu = if (u == 0) c0 else 1.0
            val cv = if (v == 0) c0 else 1.0
            coef(v * 8 + u) = math.round(0.25 * cu * cv * s /
              qt(v * 8 + u)).toInt
            u += 1
          }
          v += 1
        }
        // DC: category + amplitude bits
        val diff = coef(0) - prevDc
        prevDc = coef(0)
        val t = 32 - Integer.numberOfLeadingZeros(math.abs(diff))
        val (dcC, dcL) = DcCode(t)
        bw.put(dcC, dcL)
        if (t > 0) bw.put(if (diff >= 0) diff else diff + (1 << t) - 1, t)
        // AC: zigzag run-length
        var run = 0
        var k = 1
        var lastNz = 0
        while (k < 64) { if (coef(Zigzag(k)) != 0) lastNz = k; k += 1 }
        k = 1
        while (k <= lastNz) {
          val a = coef(Zigzag(k))
          if (a == 0) run += 1
          else {
            while (run > 15) { // ZRL
              val (zc, zl) = AcCode(0xF0); bw.put(zc, zl); run -= 16
            }
            val sz = 32 - Integer.numberOfLeadingZeros(math.abs(a))
            val (c, l) = AcCode((run << 4) | sz)
            bw.put(c, l)
            bw.put(if (a >= 0) a else a + (1 << sz) - 1, sz)
            run = 0
          }
          k += 1
        }
        if (lastNz < 63) { val (ec, el) = AcCode(0x00); bw.put(ec, el) } // EOB
        bx += 1
      }
      by += 1
    }
    bw.done()
    out.write(bw.out.toByteArray)
    out.write(0xFF); out.write(0xD9) // EOI
    out.toByteArray
  }

  /** Decode one JPEG stream to (width, height, row-major samples) via
    * the JDK's independent baseline decoder.
    */
  def decodeGray(bytes: Array[Byte]): (Int, Int, Array[Int]) = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "undecodable JPEG tile")
    val (w, h) = (img.getWidth, img.getHeight)
    val raster = img.getRaster
    require(raster.getNumBands == 1, s"expected grayscale, got ${raster.getNumBands} bands")
    val out = new Array[Int](w * h)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (w, h, out)
  }
}
