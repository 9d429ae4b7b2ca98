package graft.sources.nc

import java.nio.ByteBuffer
import graft.sources.SeekableInput

/** NetCDF CLASSIC format reader (CDF-1 32-bit and CDF-2 64-bit offset
  * variants) — the pre-HDF5 container older GloFAS-era and many archive
  * products still ship. Public spec: the NetCDF Classic Format
  * Specification (Unidata). Everything is BIG-endian; the header lists
  * dims, global attributes, and variables with their absolute data
  * offsets (`begin`), so planning is a header-only read and a row band
  * of a fixed 2-D variable is ONE contiguous positional read at
  * `begin + rowLo*rowBytes` — the same native parallel unit the HDF5
  * path uses.
  *
  * Supported: fixed-size variables of the numeric types, and RECORD
  * variables (those whose first dimension is the unlimited one — the
  * layout archive-era CMIP/station time-series files use). Record data
  * interleaves per record after the fixed-size block: record r of
  * variable v lives at `v.begin + r * recSize`, where recSize is the
  * sum of every record variable's per-record slab (each padded to 4
  * bytes unless there is exactly one record variable — the spec's
  * special case). A row band of a record variable is therefore one
  * positional read PER RECORD instead of one per band — still
  * header-only planning and still a clean record-range InputPartition
  * per task. numrecs = 0xFFFFFFFF (STREAMING) is derived from the file
  * size instead.
  */
final class Cdf3File(path: String) extends AutoCloseable {

  private val ch = SeekableInput.open(path)
  override def close(): Unit = ch.close()

  private def readAt(off: Long, len: Int): ByteBuffer =
    ch.readAt(off, len) // big-endian by default

  case class Var(name: String, dimIds: Seq[Int], ncType: Int, begin: Long) {
    def elemSize: Int = Cdf3File.typeSize(ncType)
    def isRecord: Boolean = recordDim >= 0 && dimIds.contains(recordDim)
    /** dims with the unlimited dimension resolved to the record count */
    def dims: Seq[Long] =
      dimIds.map(i => if (i == recordDim) numRecs else dimLengths(i).toLong)
    /** bytes of ONE record of this variable, before inter-record padding */
    def recBytes: Long =
      dimIds.filter(_ != recordDim).map(dimLengths(_).toLong).product * elemSize
  }

  // ---- header parse (one buffered read of the header region) ----
  private val header: ByteBuffer = {
    val sz = math.min(ch.size, 1 << 20).toInt // headers are tiny
    readAt(0L, sz)
  }
  require(header.get() == 'C' && header.get() == 'D' && header.get() == 'F',
    s"$path: not a classic NetCDF file (no CDF magic)")
  private val version = header.get() & 0xFF
  require(version == 1 || version == 2,
    s"$path: CDF version $version unsupported (need 1 or 2; 5 = CDF-5 " +
      "and HDF5-based NetCDF-4 take the other reader)")
  private val numRecsRaw: Int = header.getInt // 0xFFFFFFFF = STREAMING

  private def name(): String = {
    val n = header.getInt
    val bytes = new Array[Byte](n)
    header.get(bytes)
    header.position(header.position() + Cdf3File.pad4(n))
    new String(bytes, "UTF-8")
  }

  private def taggedCount(expectTag: Int): Int = {
    val tag = header.getInt
    val count = header.getInt
    require(tag == expectTag || (tag == 0 && count == 0),
      s"$path: header tag $tag (expected $expectTag or ABSENT)")
    count
  }

  private val dimLengths: Array[Int] = {
    val n = taggedCount(0x0A) // NC_DIMENSION
    Array.fill(n) { name(); header.getInt }
  }
  private val recordDim: Int = dimLengths.indexOf(0)

  private def skipAttributes(): Unit = {
    val n = taggedCount(0x0C) // NC_ATTRIBUTE
    var i = 0
    while (i < n) {
      name()
      val t = header.getInt
      val count = header.getInt
      val bytes = count * Cdf3File.typeSize(t)
      header.position(header.position() + bytes + Cdf3File.pad4(bytes))
      i += 1
    }
  }
  skipAttributes() // global attributes

  private val vars: Map[String, Var] = {
    val n = taggedCount(0x0B) // NC_VARIABLE
    (0 until n).map { _ =>
      val nm = name()
      val nd = header.getInt
      val ids = Seq.fill(nd)(header.getInt)
      skipAttributes()
      val t = header.getInt
      locally { header.getInt } // vsize (padded; recomputed from dims)
      val begin = if (version == 1) header.getInt.toLong & 0xFFFFFFFFL
        else header.getLong
      nm -> Var(nm, ids, t, begin)
    }.toMap
  }

  def variable(nm: String): Var = vars.getOrElse(nm,
    sys.error(s"$path: no variable '$nm' (have ${vars.keys.mkString(", ")})"))

  // ---- record geometry (spec: record vars interleave; each record
  // var's slab pads to 4 bytes UNLESS it is the only record var) ----
  private val recordVars: Seq[Var] =
    vars.values.filter(_.isRecord).toSeq.sortBy(_.begin)
  recordVars.foreach { v =>
    require(v.dimIds.head == recordDim,
      s"$path: ${v.name}: the unlimited dimension must be FIRST " +
        "(classic-format rule)")
  }

  /** Stride between consecutive records of the same variable. */
  val recSize: Long =
    if (recordVars.size == 1) recordVars.head.recBytes
    else recordVars.map(v => v.recBytes + Cdf3File.pad4((v.recBytes % 4).toInt)).sum

  /** Record count: from the header, or derived from the file size when
    * the header says STREAMING (0xFFFFFFFF).
    */
  val numRecs: Long =
    if (recordVars.isEmpty) 0L
    else if (numRecsRaw != -1) numRecsRaw.toLong & 0xFFFFFFFFL
    else (ch.size - recordVars.map(_.begin).min) / recSize

  /** Whole 1-D variable as doubles (coordinate axes; fixed or record). */
  def readDoubles(nm: String): Array[Double] = {
    val v = variable(nm)
    require(v.dimIds.length == 1, s"$nm: expected 1-D")
    if (v.isRecord) {
      // one tiny positional read per record (coordinate axes are small)
      Array.tabulate(numRecs.toInt) { r =>
        Cdf3File.readAs(readAt(v.begin + r * recSize, v.elemSize), v.ncType, 0)
      }
    } else {
      val n = v.dims.head.toInt
      val b = readAt(v.begin, n * v.elemSize)
      Array.tabulate(n)(i => Cdf3File.readAs(b, v.ncType, i))
    }
  }

  /** Row band [rowLo, rowHi) of a 2-D variable. Fixed layout: ONE
    * contiguous positional read. Record layout (row = record): one
    * positional read per record at stride `recSize`.
    */
  def readRowBand(nm: String, rowLo: Int, rowHi: Int): Array[Byte] = {
    val v = variable(nm)
    require(v.dimIds.length == 2, s"$nm: expected 2-D")
    val rowBytes = (v.dims(1) * v.elemSize).toInt
    if (v.isRecord) {
      val out = new Array[Byte]((rowHi - rowLo) * rowBytes)
      var r = rowLo
      while (r < rowHi) {
        readAt(v.begin + r * recSize, rowBytes)
          .get(out, (r - rowLo) * rowBytes, rowBytes)
        r += 1
      }
      out
    } else
      readAt(v.begin + rowLo.toLong * rowBytes,
        (rowHi - rowLo) * rowBytes).array()
  }
}

object Cdf3File {
  def pad4(n: Int): Int = (4 - n % 4) % 4

  def typeSize(ncType: Int): Int = ncType match {
    case 1 | 2 => 1 // byte, char
    case 3 => 2 // short
    case 4 | 5 => 4 // int, float
    case 6 => 8 // double
    case t => sys.error(s"nc_type $t unsupported")
  }

  def readAs(b: ByteBuffer, ncType: Int, idx: Int): Double = ncType match {
    case 1 => b.get(idx).toDouble
    case 3 => b.getShort(idx * 2).toDouble
    case 4 => b.getInt(idx * 4).toDouble
    case 5 => b.getFloat(idx * 4).toDouble
    case 6 => b.getDouble(idx * 8)
    case t => sys.error(s"nc_type $t unsupported for numeric read")
  }
}
