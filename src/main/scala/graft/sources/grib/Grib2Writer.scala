package graft.sources.grib

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed GRIB2 ENSEMBLE writer — the sink half of the GRIB
  * surface (Grib2File reads; every other binary format already had
  * both directions). Emits edition-2 messages with grid template 3.0
  * (regular lat/lon, scan mode 0), product template 4.1 (individual
  * ensemble member; number 0 written as the control), simple packing
  * 5.0 with R=0/E=0/D=0 (so integer-valued data round-trips EXACTLY),
  * and a section-6 bitmap (indicator 0) whenever cells are missing —
  * the same subset the reader decodes and the independent python
  * writer (tools/grib2_fixture.py) produces, so the whole format
  * contract is already cross-validated.
  *
  * Scale shape mirrors Hdf5Writer: rows shuffle ONCE on their member,
  * each task streams ONE member's grid buffer at a time and writes a
  * complete staged message file, and the driver concatenates staged
  * messages in member order (a GRIB file IS concatenated messages —
  * the driver streams bytes, never holds a grid).
  */
object Grib2Writer {

  /** `df`: (number int, latitude, longitude, value double) on the
    * regular grid `lats` (descending) × `lons` (ascending). Values must
    * be integer-valued in [0, 2^bpv); missing cells (absent rows or
    * NaN) become bitmap holes. `stepCol` names an optional lead-time
    * column (hours, int) — one message per (step, member), in that
    * order, completing the multi-step pair with the reader's `withStep`
    * surface; absent, every message carries the 24 h lead the legacy
    * fixtures use (byte-identical to the pre-step writer).
    */
  def writeEnsemble(df: DataFrame, path: String,
      lats: Array[Double], lons: Array[Double], bpv: Int = 16,
      stepCol: Option[String] = None): Unit = {
    require(bpv == 16, "only bpv=16 supported (the fixture/reader subset)")
    val spark = df.sparkSession
    val (ni, nj) = (lons.length, lats.length)
    val la1 = lats.head
    val lo1 = lons.head
    val dj = if (nj > 1) (lats.head - lats.last) / (nj - 1) else 1.0
    val di = if (ni > 1) (lons.last - lons.head) / (ni - 1) else 1.0
    // staging + final write through the Hadoop FS API (the TiffWriter /
    // Hdf5Writer shape): executors stage message files, the driver
    // stream-concats them — works identically on local fs and s3a
    val hconf = spark.sparkContext.hadoopConfiguration
    val stagePath = new org.apache.hadoop.fs.Path(path + "_stage")
    val fs = stagePath.getFileSystem(hconf)
    fs.delete(stagePath, true)
    fs.mkdirs(stagePath)
    val bConf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    val stageStr = stagePath.toString

    val bLat = spark.sparkContext.broadcast(lats.zipWithIndex.toMap)
    val bLon = spark.sparkContext.broadcast(lons.zipWithIndex.toMap)
    import spark.implicits._
    val n = spark.sparkContext.defaultParallelism
    val stepExpr = stepCol.map(c => col(c).cast("int")).getOrElse(lit(24))
    df.select(stepExpr.as("s"), col("number").cast("int"),
        col("latitude").cast("double"),
        col("longitude").cast("double"), col("value").cast("double"))
      .as[(Int, Int, Double, Double, Double)]
      .mapPartitions { it =>
        val latI = bLat.value
        val lonI = bLon.value
        it.map { case (st, m, la, lo, v) =>
          (st, m, latI(la) * lonI.size + lonI(lo), v)
        }
      }
      .toDF("s", "m", "cell", "v")
      .repartition(math.min(n, 64), col("s"), col("m"))
      .sortWithinPartitions("s", "m", "cell")
      .foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
        val conf = bConf.value.value
        var curS = -1
        var curM = -1
        var buf: Array[Double] = null
        def flush(): Unit = if (curM >= 0) {
          val msg = encodeMessage(curM, curS, buf, ni, nj, la1, lo1, di, dj)
          val pp = new org.apache.hadoop.fs.Path(
            f"$stageStr/s$curS%05d_m$curM%05d.part")
          val out = pp.getFileSystem(conf).create(pp, true)
          try out.write(msg) finally out.close()
        }
        rows.foreach { r =>
          val s = r.getInt(0)
          val m = r.getInt(1)
          if (m != curM || s != curS) {
            flush(); curS = s; curM = m
            buf = Array.fill(ni * nj)(Double.NaN)
          }
          buf(r.getInt(2)) = r.getDouble(3)
        }
        flush()
      }

    // driver: stream-concat staged messages in member order
    val parts = fs.listStatus(stagePath)
      .filter(_.getPath.getName.endsWith(".part"))
      .sortBy(_.getPath.getName)
    require(parts.nonEmpty, s"$path: no members staged")
    val outP = new org.apache.hadoop.fs.Path(path)
    val out = outP.getFileSystem(hconf).create(outP, true)
    try parts.foreach { st =>
      val in = fs.open(st.getPath)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 256 * 1024, false)
      finally in.close()
    } finally out.close()
    fs.delete(stagePath, true)
  }

  /** One complete edition-2 message (sections 0–8) for member `m` at
    * lead time `stepHours`.
    */
  private def encodeMessage(m: Int, stepHours: Int, grid: Array[Double],
      ni: Int, nj: Int,
      la1: Double, lo1: Double, di: Double, dj: Double): Array[Byte] = {
    def sec(num: Int, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(5 + body.length).order(ByteOrder.BIG_ENDIAN)
      b.putInt(5 + body.length).put(num.toByte).put(body)
      b.array()
    }
    // template 4.1's perturbation number is ONE octet: a member > 255
    // would silently wrap in `m.toByte` into a wrong-but-well-formed
    // message — fail loudly instead (r7 advice)
    require(m >= 0 && m <= 255,
      s"ensemble member $m out of the one-octet range [0, 255] (template 4.1)")
    require(stepHours >= 0, s"negative lead time $stepHours h")
    val present = grid.filterNot(_.isNaN)
    val hasHoles = present.length != grid.length
    present.foreach { v =>
      require(v >= 0 && v < (1 << 16) && v == math.rint(v),
        s"value $v not an integer in [0, 65536) — simple packing R=0/E=0/D=0")
    }

    val s1 = sec(1, {
      val b = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      b.putShort(98).putShort(0).put(2.toByte).put(1.toByte).put(1.toByte)
      b.putShort(2026).put(1.toByte).put(1.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte).put(1.toByte)
      b.array()
    })
    val s3 = sec(3, {
      val b = ByteBuffer.allocate(9 + 58).order(ByteOrder.BIG_ENDIAN)
      b.put(0.toByte).putInt(ni * nj).put(0.toByte).put(0.toByte).putShort(0)
      // template 3.0
      b.put(6.toByte).put(0.toByte).putInt(0).put(0.toByte).putInt(0)
        .put(0.toByte).putInt(0)
      b.putInt(ni).putInt(nj).putInt(0).putInt(0)
      b.putInt(math.round(la1 * 1e6).toInt)
      b.putInt(math.round(lo1 * 1e6).toInt)
      b.put(0x30.toByte)
      b.putInt(math.round((la1 - (nj - 1) * dj) * 1e6).toInt)
      b.putInt(math.round((lo1 + (ni - 1) * di) * 1e6).toInt)
      b.putInt(math.round(di * 1e6).toInt)
      b.putInt(math.round(dj * 1e6).toInt)
      b.put(0.toByte) // scan mode 0: +i, -j, i fastest
      b.array()
    })
    val s4 = sec(4, {
      val b = ByteBuffer.allocate(4 + 28).order(ByteOrder.BIG_ENDIAN)
      b.putShort(0).putShort(1) // template 4.1
      b.put(0.toByte).put(192.toByte).put(2.toByte).put(0.toByte)
        .put(0.toByte).putShort(0).put(0.toByte).put(1.toByte).putInt(stepHours)
      b.put(1.toByte).put(0.toByte).putInt(0)
      b.put(255.toByte).put(0.toByte).putInt(0)
      // WMO 4.6: 1 = unperturbed control ("cf"), 3 = perturbed ("pf")
      b.put((if (m == 0) 1 else 3).toByte).put(m.toByte).put(3.toByte)
      b.array()
    })
    val s5 = sec(5, {
      val b = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
      b.putInt(present.length).putShort(0) // template 5.0
      b.putFloat(0.0f).putShort(0).putShort(0)
      b.put(16.toByte).put(0.toByte)
      b.array()
    })
    val s6 =
      if (!hasHoles) sec(6, Array(255.toByte))
      else sec(6, {
        val bits = new Array[Byte](1 + (grid.length + 7) / 8)
        bits(0) = 0 // indicator: bitmap applies, defined here
        grid.indices.foreach { k =>
          if (!grid(k).isNaN)
            bits(1 + (k >> 3)) = (bits(1 + (k >> 3)) | (0x80 >> (k & 7))).toByte
        }
        bits
      })
    val s7 = sec(7, {
      val b = ByteBuffer.allocate(present.length * 2).order(ByteOrder.BIG_ENDIAN)
      present.foreach(v => b.putShort(v.toInt.toShort))
      b.array()
    })
    val body = s1 ++ s3 ++ s4 ++ s5 ++ s6 ++ s7 ++ "7777".getBytes
    val total = 16 + body.length
    val s0 = ByteBuffer.allocate(16).order(ByteOrder.BIG_ENDIAN)
    s0.put("GRIB".getBytes).putShort(0).put(0.toByte).put(2.toByte)
      .putLong(total.toLong)
    s0.array() ++ body
  }
}
