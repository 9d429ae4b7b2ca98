package graft.sources.grib

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.channels.FileChannel
import java.nio.file.{Paths, StandardOpenOption}

/** Minimal pure-JVM GRIB2 reader for the subset ECMWF ensemble output
  * uses (format: the public WMO FM 92 GRIB edition 2 specification):
  * regular lat/lon grids (grid definition template 3.0), individual
  * ensemble forecasts (product definition template 4.1 — carries the
  * control/perturbed flag and the member number the reference filters on
  * with `filter_by_keys={'dataType': 'cf'|'pf'}`,
  * io_managers.py:193-210), simple packing (data representation template
  * 5.0), no bitmap.
  *
  * A GRIB2 file is a sequence of self-contained messages — one per
  * (member, step) field — which makes the natural cluster read unit the
  * MESSAGE: `index()` walks only the fixed-size section headers to plan,
  * and each executor task decodes exactly one message's packed payload
  * via positional reads. Signed GRIB integers are sign-and-magnitude
  * (MSB = sign flag), not two's complement.
  */
object Grib2File {

  /** Planning-time view of one message: everything except the decoded
    * payload (headers only — the data section is not read).
    */
  case class MessageInfo(
      offset: Long, length: Long,
      dataType: String, // "cf" (control) | "pf" (perturbed)
      number: Int,      // perturbation number
      ni: Int, nj: Int, // lon cells, lat rows
      la1: Double, lo1: Double, di: Double, dj: Double)

  /** A fully-decoded message: values in row-major (j lat outer — north
    * to south for scanning mode 0 — i lon inner) order.
    */
  case class Message(info: MessageInfo, values: Array[Double])

  private def u8(b: ByteBuffer, i: Int): Int = b.get(i) & 0xFF
  private def u16(b: ByteBuffer, i: Int): Int = (u8(b, i) << 8) | u8(b, i + 1)
  private def u32(b: ByteBuffer, i: Int): Long =
    (u16(b, i).toLong << 16) | u16(b, i + 2)
  private def u64(b: ByteBuffer, i: Int): Long =
    (u32(b, i) << 32) | u32(b, i + 4)

  /** GRIB signed fields: MSB is a sign FLAG over the magnitude bits. */
  private def s16(b: ByteBuffer, i: Int): Int = {
    val v = u16(b, i)
    if ((v & 0x8000) != 0) -(v & 0x7FFF) else v
  }
  private def s32(b: ByteBuffer, i: Int): Long = {
    val v = u32(b, i)
    if ((v & 0x80000000L) != 0) -(v & 0x7FFFFFFFL) else v
  }

  private def readAt(ch: FileChannel, off: Long, len: Int): ByteBuffer = {
    val buf = ByteBuffer.allocate(len).order(ByteOrder.BIG_ENDIAN)
    var pos = 0
    while (pos < len) {
      val n = ch.read(buf, off + pos)
      require(n > 0, s"unexpected EOF at ${off + pos}")
      pos += n
    }
    buf.flip()
    buf
  }

  /** Offsets + header metadata of every message in the file. Touches
    * only section headers (a few hundred bytes per message), never the
    * packed data — this is the GRIB "index" a scheduler builds before
    * fanning decode tasks out.
    */
  def index(path: String): Seq[MessageInfo] = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      val size = ch.size()
      val out = Seq.newBuilder[MessageInfo]
      var off = 0L
      while (off + 16 <= size) {
        val ind = readAt(ch, off, 16)
        require(ind.get(0) == 'G' && ind.get(1) == 'R' &&
          ind.get(2) == 'I' && ind.get(3) == 'B',
          s"$path: no GRIB magic at offset $off")
        require(u8(ind, 7) == 2, s"$path: GRIB edition ${u8(ind, 7)}, need 2")
        val msgLen = u64(ind, 8)
        out += parseHeaders(ch, off, msgLen)
        off += msgLen
      }
      out.result()
    } finally ch.close()
  }

  /** Walk sections 1..5 of the message at `off`, collecting the grid,
    * ensemble, and packing metadata.
    */
  private def parseHeaders(ch: FileChannel, off: Long, msgLen: Long): MessageInfo = {
    var cur = off + 16
    var ni = 0; var nj = 0
    var la1 = 0.0; var lo1 = 0.0; var di = 0.0; var dj = 0.0
    var dataType = ""; var number = -1
    val end = off + msgLen
    var done = false
    while (!done && cur < end) {
      val head = readAt(ch, cur, 4) // "7777" is only 4 bytes — check first
      val secLen = u32(head, 0)
      if (secLen == 0x37373737L) { // "7777" terminator
        done = true
      } else {
        val secNum = u8(readAt(ch, cur + 4, 1), 0)
        secNum match {
          case 3 =>
            val s = readAt(ch, cur, secLen.toInt)
            require(u16(s, 12) == 0,
              s"grid template ${u16(s, 12)} unsupported (need 3.0 lat/lon)")
            ni = u32(s, 30).toInt
            nj = u32(s, 34).toInt
            la1 = s32(s, 46) / 1e6
            lo1 = u32(s, 50) / 1e6
            di = u32(s, 63) / 1e6
            dj = u32(s, 67) / 1e6
            val scan = u8(s, 71)
            require(scan == 0,
              s"scanning mode $scan unsupported (need 0: +i, -j, i fastest)")
          case 4 =>
            val s = readAt(ch, cur, secLen.toInt)
            require(u16(s, 7) == 1,
              s"product template ${u16(s, 7)} unsupported (need 4.1 ensemble)")
            val ensType = u8(s, 34)
            number = u8(s, 35)
            // WMO code table 4.6: 0/1 = unperturbed control, 2/3 = perturbed
            dataType = if (ensType <= 1) "cf" else "pf"
          case 5 =>
            val s = readAt(ch, cur, secLen.toInt)
            require(u16(s, 9) == 0,
              s"packing template ${u16(s, 9)} unsupported (need 5.0 simple)")
          case _ => () // 1 identification, 6 bitmap, 7 data: not needed here
        }
        cur += secLen
      }
    }
    require(ni > 0 && nj > 0, s"message at $off: no grid definition section")
    require(number >= 0, s"message at $off: no ensemble product section")
    MessageInfo(off, msgLen, dataType, number, ni, nj, la1, lo1, di, dj)
  }

  /** Decode the packed payload of one message:
    * value = (R + X * 2^E) * 10^-D with X read as a big-endian
    * `bitsPerValue`-wide bitstream. Bitmap section must be absent (255).
    */
  def read(path: String, info: MessageInfo): Message = {
    val ch = FileChannel.open(Paths.get(path), StandardOpenOption.READ)
    try {
      var cur = info.offset + 16
      val end = info.offset + info.length
      var refVal = 0.0f; var binScale = 0; var decScale = 0; var bpv = 0
      var nVals = 0
      var values: Array[Double] = null
      var done = false
      while (!done && cur < end) {
        val head = readAt(ch, cur, 4)
        val secLen = u32(head, 0)
        if (secLen == 0x37373737L) { done = true }
        else {
          u8(readAt(ch, cur + 4, 1), 0) match {
            case 5 =>
              val s = readAt(ch, cur, secLen.toInt)
              nVals = u32(s, 5).toInt
              refVal = java.lang.Float.intBitsToFloat(u32(s, 11).toInt)
              binScale = s16(s, 15)
              decScale = s16(s, 17)
              bpv = u8(s, 19)
            case 6 =>
              val s = readAt(ch, cur, secLen.toInt)
              require(u8(s, 5) == 255, "bitmaps unsupported (indicator != 255)")
            case 7 =>
              val s = readAt(ch, cur, secLen.toInt)
              require(bpv > 0 && bpv <= 32, s"bits-per-value $bpv unsupported")
              val scale = math.pow(2.0, binScale) * math.pow(10.0, -decScale)
              val r = refVal * math.pow(10.0, -decScale)
              values = new Array[Double](nVals)
              var bitPos = 0
              var k = 0
              while (k < nVals) {
                var x = 0L
                var taken = 0
                while (taken < bpv) {
                  val byteIdx = 5 + (bitPos >> 3)
                  val bitInByte = bitPos & 7
                  val avail = 8 - bitInByte
                  val take = math.min(avail, bpv - taken)
                  val chunk = (u8(s, byteIdx) >> (avail - take)) & ((1 << take) - 1)
                  x = (x << take) | chunk
                  taken += take
                  bitPos += take
                }
                values(k) = r + x * scale
                k += 1
              }
            case _ => ()
          }
          cur += secLen
        }
      }
      require(values != null, s"message at ${info.offset}: no data section")
      require(values.length == info.ni * info.nj,
        s"decoded ${values.length} values for ${info.ni}x${info.nj} grid")
      Message(info, values)
    } finally ch.close()
  }
}
