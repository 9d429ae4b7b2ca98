package graft.sources.shp

import java.nio.{ByteBuffer, ByteOrder}

import graft.sources.SeekableInput

/** Minimal pure-JVM ESRI shapefile reader (format: the public ESRI
  * Shapefile Technical Description + dBASE III spec) for the subset the
  * reference consumes with `gpd.read_file(uri, bbox=...)`
  * (hydrobasins.py:77-79, global_forest_watch.py:160-163): Polygon
  * (type 5) geometry, numeric attributes from the sidecar `.dbf`, and
  * the `.shx` index that makes RANGED record reads possible — the
  * property a cluster source needs: planning reads the tiny index, each
  * task seeks straight to its record range, and a bbox predicate skips
  * a record from its header's envelope without parsing its points
  * (geopandas' bbox= pushdown, reproduced).
  */
object Shapefile {

  /** One polygon RING (shapefiles store multi-part polygons; one row
    * per part, ring vertex order preserved).
    */
  case class Ring(recordNo: Int, part: Int, xs: Array[Double], ys: Array[Double])

  case class RecordLoc(offsetBytes: Long, lengthBytes: Int)

  // positional reads through the SeekableInput seam: local files take
  // the FileChannel fast path, object-store URIs (s3a://...) the Hadoop
  // FS ranged-read path (r15 verdict item 6)
  private def openRead(path: String): SeekableInput = SeekableInput.open(path)

  private def readAt(ch: SeekableInput, off: Long, len: Int): ByteBuffer =
    ch.readAt(off, len)

  /** Record locations from the `.shx` index (100-byte header + 8 bytes
    * per record: offset + content length, both big-endian 16-bit words).
    */
  def index(shxPath: String): Seq[RecordLoc] = {
    val ch = openRead(shxPath)
    try {
      val n = ((ch.size - 100) / 8).toInt
      val buf = readAt(ch, 100, n * 8).order(ByteOrder.BIG_ENDIAN)
      (0 until n).map { i =>
        RecordLoc(buf.getInt(i * 8).toLong * 2, buf.getInt(i * 8 + 4) * 2)
      }
    } finally ch.close()
  }

  /** Parse one polygon record into its rings; `None` when the record's
    * envelope misses the bbox (skipped WITHOUT parsing points) or the
    * shape is null (type 0).
    */
  def readRecord(ch: SeekableInput, loc: RecordLoc,
      bbox: Option[(Double, Double, Double, Double)]): Option[Seq[Ring]] = {
    val head = readAt(ch, loc.offsetBytes, 8).order(ByteOrder.BIG_ENDIAN)
    val recordNo = head.getInt(0)
    val content = readAt(ch, loc.offsetBytes + 8, loc.lengthBytes)
      .order(ByteOrder.LITTLE_ENDIAN)
    val shapeType = content.getInt(0)
    if (shapeType == 0) return None // null shape
    require(shapeType == 5, s"record $recordNo: shape type $shapeType (need 5)")
    val (xMin, yMin, xMax, yMax) =
      (content.getDouble(4), content.getDouble(12),
        content.getDouble(20), content.getDouble(28))
    bbox.foreach { case (qxLo, qyLo, qxHi, qyHi) =>
      if (xMax < qxLo || xMin > qxHi || yMax < qyLo || yMin > qyHi)
        return None
    }
    val numParts = content.getInt(36)
    val numPoints = content.getInt(40)
    val partsOff = 44
    val pointsOff = partsOff + numParts * 4
    val parts = (0 until numParts).map(p => content.getInt(partsOff + p * 4))
    Some((0 until numParts).map { p =>
      val lo = parts(p)
      val hi = if (p + 1 < numParts) parts(p + 1) else numPoints
      val xs = new Array[Double](hi - lo)
      val ys = new Array[Double](hi - lo)
      var i = lo
      while (i < hi) {
        xs(i - lo) = content.getDouble(pointsOff + i * 16)
        ys(i - lo) = content.getDouble(pointsOff + i * 16 + 8)
        i += 1
      }
      Ring(recordNo, p, xs, ys)
    })
  }

  /** Rings of records [recLo, recHi), with optional bbox skip. */
  def readRange(shpPath: String, locs: Seq[RecordLoc], recLo: Int, recHi: Int,
      bbox: Option[(Double, Double, Double, Double)]): Seq[Ring] = {
    val ch = openRead(shpPath)
    try (recLo until recHi).flatMap(r =>
      readRecord(ch, locs(r), bbox).toSeq.flatten)
    finally ch.close()
  }

  /** Numeric attribute column from the dBASE III sidecar: record number
    * (1-based, matching .shp record numbers) → value. Fixed-width ASCII
    * records make this a ranged read too.
    */
  def dbfNumericField(dbfPath: String, fieldName: String): Map[Int, Long] = {
    val ch = openRead(dbfPath)
    try {
      val head = readAt(ch, 0, 32).order(ByteOrder.LITTLE_ENDIAN)
      val nRecords = head.getInt(4)
      val headerSize = head.getShort(8) & 0xFFFF
      val recordSize = head.getShort(10) & 0xFFFF
      // field descriptors: 32 bytes each, terminated by 0x0D
      val nFields = (headerSize - 33) / 32
      var fieldOff = 1 // records start with the deletion-flag byte
      var wantOff = -1
      var wantLen = 0
      for (f <- 0 until nFields) {
        val fd = readAt(ch, 32 + f * 32, 32)
        val nameBytes = new Array[Byte](11)
        fd.get(nameBytes)
        val name = new String(nameBytes, "ASCII").takeWhile(_ != 0)
        val len = fd.get(16) & 0xFF
        if (name == fieldName) { wantOff = fieldOff; wantLen = len }
        fieldOff += len
      }
      require(wantOff >= 0, s"$dbfPath: no field '$fieldName'")
      (0 until nRecords).map { r =>
        val rec = readAt(ch, headerSize.toLong + r.toLong * recordSize, recordSize)
        val bytes = new Array[Byte](wantLen)
        for (i <- 0 until wantLen) bytes(i) = rec.get(wantOff + i)
        (r + 1) -> new String(bytes, "ASCII").trim.toLong
      }.toMap
    } finally ch.close()
  }
}
