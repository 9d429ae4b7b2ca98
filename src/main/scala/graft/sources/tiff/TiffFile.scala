package graft.sources.tiff

import java.nio.{ByteBuffer, ByteOrder}
import graft.sources.SeekableInput
import java.util.zip.Inflater

/** Minimal pure-JVM reader for the GeoTIFF subset cloud-optimized
  * rasters use (format: the public TIFF 6.0 + GeoTIFF specs): classic
  * TIFF, single-band 8/16/32-bit integer samples, TILED or STRIPED
  * layout, uncompressed or DEFLATE (zlib) compression, georeferenced by
  * ModelPixelScaleTag + ModelTiepointTag. This is the shape of the
  * reference's GFC lossyear tiles (global_forest_watch.py:66,156 reads
  * them with rioxarray).
  *
  * The tile/strip is the cluster work unit — exactly why COG exists:
  * the IFD (a few hundred bytes) plans the read, then each task fetches
  * one tile's byte range. `info()` parses only the IFD; `readBlock`
  * positional-reads + inflates one block.
  */
object TiffFile {

  /** One block = one tile, or one strip (a strip is a full-width tile. */
  case class BlockInfo(
      index: Int, offset: Long, byteCount: Long,
      colLo: Int, rowLo: Int, width: Int, height: Int)

  case class TiffInfo(
      width: Int, height: Int, bits: Int, compression: Int,
      originX: Double, originY: Double, scaleX: Double, scaleY: Double,
      blocks: Seq[BlockInfo],
      // TIFF TechNote 2 shared JPEG tables (tag 347): SOI + DQT/DHT
      // segments + EOI, spliced ahead of each ABBREVIATED tile stream —
      // the layout GDAL writes for COMPRESS=JPEG pyramids. null = tiles
      // are standalone full streams (our writer's layout).
      jpegTables: Array[Byte] = null)

  private class Reader(ch: SeekableInput, val order: ByteOrder) {
    def readAt(off: Long, len: Int): ByteBuffer =
      ch.readAt(off, len).order(order)
  }

  private def open(path: String): (SeekableInput, Reader) = {
    val ch = SeekableInput.open(path)
    val hdr = ch.readAt(0, 8)
    val order = (hdr.get(0).toChar, hdr.get(1).toChar) match {
      case ('I', 'I') => ByteOrder.LITTLE_ENDIAN
      case ('M', 'M') => ByteOrder.BIG_ENDIAN
      case other => sys.error(s"$path: not a TIFF (byte-order mark $other)")
    }
    (ch, new Reader(ch, order))
  }

  /** Parse the first (full-resolution) IFD — the pre-overview surface;
    * equivalent to `levels(path).head`.
    */
  def info(path: String): TiffInfo = levels(path).head

  /** Parse the WHOLE IFD chain: the full-resolution image first, then
    * any reduced-resolution overview IFDs a cloud-optimized GeoTIFF
    * carries (NewSubfileType bit 0 — TIFF 6.0 tag 254; the `cog_translate`
    * overview convention). Handles classic TIFF (magic 42: 12-byte
    * entries, u32 counts and offsets) and BigTIFF (magic 43: 20-byte
    * entries, u64 counts and offsets, LONG8 arrays) — real GFC mosaics
    * and large COGs exceed classic TIFF's 4 GB offset space.
    *
    * Overview IFDs conventionally omit the GeoTIFF scale/tiepoint tags
    * (GDAL derives them); we do the same: the decimation factor is
    * `round(fullWidth / ovWidth)` and the overview pixel scale is the
    * full-resolution scale times that factor, same origin.
    */
  def levels(path: String): Seq[TiffInfo] = {
    val (ch, r) = open(path)
    try {
      val head = r.readAt(0, 16)
      val magic = head.getShort(2)
      require(magic == 42 || magic == 43, s"$path: TIFF magic $magic")
      val big = magic == 43
      if (big) require(head.getShort(4) == 8 && head.getShort(6) == 0,
        s"$path: malformed BigTIFF header")
      val firstOff = if (big) head.getLong(8) else head.getInt(4).toLong & 0xFFFFFFFFL
      val out = scala.collection.mutable.ArrayBuffer.empty[TiffInfo]
      var ifdOff = firstOff
      while (ifdOff != 0L) {
        val (inf, next) = parseIfd(path, r, big, ifdOff, out.headOption)
        out += inf
        ifdOff = next
      }
      out.toSeq
    } finally ch.close()
  }

  /** Parse one IFD at `ifdOff`; geo tags may be absent on overview IFDs
    * (derive from `full`, the first IFD). Returns the info plus the
    * next-IFD offset (0 = end of chain).
    */
  private def parseIfd(path: String, r: Reader, big: Boolean, ifdOff: Long,
      full: Option[TiffInfo]): (TiffInfo, Long) = {
    {
      val entryStride = if (big) 20 else 12
      val nEntries =
        if (big) r.readAt(ifdOff, 8).getLong(0).toInt
        else r.readAt(ifdOff, 2).getShort(0) & 0xFFFF
      val entries = r.readAt(ifdOff + (if (big) 8 else 2), nEntries * entryStride)
      val nextOff = {
        val p = ifdOff + (if (big) 8 else 2) + nEntries.toLong * entryStride
        if (big) r.readAt(p, 8).getLong(0)
        else r.readAt(p, 4).getInt(0).toLong & 0xFFFFFFFFL
      }

      var width = 0; var height = 0; var bits = 8; var compression = 1
      var tileW = 0; var tileH = 0; var rowsPerStrip = 0
      var offsets: Array[Long] = null; var counts: Array[Long] = null
      var stripOffsets: Array[Long] = null; var stripCounts: Array[Long] = null
      var scale: Array[Double] = null; var tiepoint: Array[Double] = null
      var jpegTables: Array[Byte] = null

      def typeSize(t: Int): Int = t match {
        case 1 | 2 | 6 | 7 => 1 // byte/ascii
        case 3 | 8 => 2         // short
        case 4 | 9 => 4         // long
        case 5 | 10 => 8        // rational
        case 11 => 4            // float
        case 12 => 8            // double
        case 16 | 17 | 18 => 8  // long8/slong8/ifd8 (BigTIFF)
        case _ => sys.error(s"TIFF type $t unsupported")
      }

      val inlineCap = if (big) 8 else 4
      val (cntOff, valOff) = if (big) (4, 12) else (4, 8)
      for (e <- 0 until nEntries) {
        val base = e * entryStride
        val tag = entries.getShort(base) & 0xFFFF
        val typ = entries.getShort(base + 2) & 0xFFFF
        val cnt =
          if (big) entries.getLong(base + cntOff)
          else entries.getInt(base + cntOff).toLong & 0xFFFFFFFFL
        val totalBytes = typeSize(typ) * cnt
        // value fits inline in the value field, else it's an offset
        val valBuf: ByteBuffer =
          if (totalBytes <= inlineCap) {
            val b = ByteBuffer.allocate(inlineCap).order(entries.order())
            for (i <- 0 until inlineCap) b.put(i, entries.get(base + valOff + i))
            b
          } else r.readAt(
            if (big) entries.getLong(base + valOff)
            else entries.getInt(base + valOff).toLong & 0xFFFFFFFFL,
            totalBytes.toInt)

        def num(i: Int): Long = typ match {
          case 3 => valBuf.getShort(i * 2).toLong & 0xFFFF
          case 4 => valBuf.getInt(i * 4).toLong & 0xFFFFFFFFL
          case 16 => valBuf.getLong(i * 8)
          case _ => sys.error(s"tag $tag: numeric type $typ unsupported")
        }
        def nums(): Array[Long] = Array.tabulate(cnt.toInt)(num)
        def doubles(): Array[Double] =
          Array.tabulate(cnt.toInt)(i => valBuf.getDouble(i * 8))

        tag match {
          case 256 => width = num(0).toInt
          case 257 => height = num(0).toInt
          case 258 => bits = num(0).toInt
          case 259 => compression = num(0).toInt
          case 273 => stripOffsets = nums()
          case 278 => rowsPerStrip = num(0).toInt
          case 279 => stripCounts = nums()
          case 322 => tileW = num(0).toInt
          case 323 => tileH = num(0).toInt
          case 324 => offsets = nums()
          case 325 => counts = nums()
          case 347 =>
            jpegTables = new Array[Byte](cnt.toInt)
            valBuf.get(jpegTables)
          case 33550 => scale = doubles()
          case 33922 => tiepoint = doubles()
          case _ => () // photometric etc: irrelevant to decoding
        }
      }

      require(width > 0 && height > 0, s"$path: missing dimensions")
      require(compression == 1 || compression == 7 || compression == 8,
        s"$path: compression $compression unsupported (need none/jpeg/deflate)")
      require(bits == 8 || bits == 16 || bits == 32,
        s"$path: $bits bits per sample unsupported")
      val (originX, originY, scaleX, scaleY) =
        if (scale != null && tiepoint != null && tiepoint.length >= 6) {
          // tiepoint maps raster (i,j) [pixel corner] to geo (x,y):
          // originX = X - i*scaleX, originY = Y + j*scaleY
          (tiepoint(3) - tiepoint(0) * scale(0),
            tiepoint(4) + tiepoint(1) * scale(1),
            scale(0), scale(1))
        } else full match {
          // overview IFDs omit geo tags (the GDAL/cog_translate
          // convention): same extent as the full image, pixel scale
          // multiplied by the decimation factor
          case Some(f) =>
            val factor = math.round(f.width.toDouble / width).toInt
            require(factor >= 1, s"$path: overview larger than full image")
            (f.originX, f.originY, f.scaleX * factor, f.scaleY * factor)
          case None => sys.error(
            s"$path: missing GeoTIFF pixel scale / tiepoint tags")
        }

      val blocks: Seq[BlockInfo] =
        if (offsets != null) {
          val tilesAcross = (width + tileW - 1) / tileW
          offsets.indices.map { t =>
            val tr = t / tilesAcross
            val tc = t % tilesAcross
            BlockInfo(t, offsets(t), counts(t),
              tc * tileW, tr * tileH, tileW, tileH)
          }
        } else {
          require(stripOffsets != null, s"$path: neither tiles nor strips")
          val rps = if (rowsPerStrip > 0) rowsPerStrip else height
          stripOffsets.indices.map { sIdx =>
            val rowLo = sIdx * rps
            BlockInfo(sIdx, stripOffsets(sIdx), stripCounts(sIdx),
              0, rowLo, width, math.min(rps, height - rowLo))
          }
        }
      (TiffInfo(width, height, bits, compression, originX, originY,
        scaleX, scaleY, blocks, jpegTables), nextOff)
    }
  }

  /** Decode one block to row-major Int samples (block-local layout;
    * tiles keep their full padded width — callers clip via colLo/rowLo +
    * image dims).
    */
  def readBlock(path: String, info: TiffInfo, b: BlockInfo): Array[Int] = {
    val (ch, r) = open(path)
    try {
      val raw0 = new Array[Byte](b.byteCount.toInt)
      r.readAt(b.offset, b.byteCount.toInt).get(raw0)
      val bytesPer = info.bits / 8
      val need = b.width * b.height * bytesPer
      if (info.compression == 7) {
        // standalone full streams (our writer), or GDAL's shared-tables
        // layout: JPEGTables (tag 347) = SOI + tables + EOI, tiles =
        // ABBREVIATED streams (SOI + frame/scan). Splice tables between
        // the tile's SOI and its remaining segments (TechNote 2), then
        // decode through the JDK's independent baseline decoder.
        val stream =
          if (info.jpegTables == null) raw0
          else {
            val t = info.jpegTables
            require(t.length >= 4 && (t(0) & 0xFF) == 0xFF &&
              (t(1) & 0xFF) == 0xD8 && (t(t.length - 2) & 0xFF) == 0xFF &&
              (t(t.length - 1) & 0xFF) == 0xD9,
              s"$path: malformed JPEGTables (${t.length} bytes)")
            require((raw0(0) & 0xFF) == 0xFF && (raw0(1) & 0xFF) == 0xD8,
              s"$path: jpeg tile missing SOI")
            val out = new Array[Byte](t.length - 4 + raw0.length)
            out(0) = 0xFF.toByte; out(1) = 0xD8.toByte
            System.arraycopy(t, 2, out, 2, t.length - 4)
            System.arraycopy(raw0, 2, out, t.length - 2, raw0.length - 2)
            out
          }
        val (jw, jh, px) = JpegCodec.decodeGray(stream)
        require(jw == b.width && jh == b.height,
          s"jpeg tile ${jw}x$jh != block ${b.width}x${b.height}")
        require(info.bits == 8, s"$path: jpeg tiles must be 8-bit")
        return px
      }
      val raw: Array[Byte] =
        if (info.compression == 1) raw0
        else {
          val inf = new Inflater()
          inf.setInput(raw0)
          val out = new Array[Byte](need)
          var total = 0
          try {
            while (total < need && !inf.finished()) {
              val n = inf.inflate(out, total, need - total)
              // corrupt/truncated deflate data makes inflate return 0
              // forever — fail loudly, never spin
              require(n > 0 || inf.finished(),
                s"truncated deflate block ($total of $need bytes)")
              total += n
            }
          } finally inf.end() // free native zlib memory on throw paths too
          require(total == need, s"inflated $total of $need bytes")
          out
        }
      val bb = ByteBuffer.wrap(raw).order(r.order) // samples use file order
      val out = new Array[Int](b.width * b.height)
      var k = 0
      while (k < out.length) {
        out(k) = info.bits match {
          case 8 => raw(k) & 0xFF
          case 16 => bb.getShort(k * 2) & 0xFFFF
          case 32 => bb.getInt(k * 4)
        }
        k += 1
      }
      out
    } finally ch.close()
  }
}
