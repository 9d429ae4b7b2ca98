package graft.sources.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Zarr v2 store reader/writer for the subset the reference round-trips
  * (io_managers.py:119-129): a store is a DIRECTORY — `.zgroup` /
  * `.zarray` JSON metadata plus one file per chunk named by its chunk
  * indices ("0.1") — which makes the chunk the natural cluster unit for
  * both reads and writes (each task touches exactly its chunk files;
  * no shared state, works over any Hadoop FileSystem: file://, hdfs://,
  * s3a://). Supported: C-order little-endian numeric dtypes, null or
  * zlib compressor, full-size edge chunks padded with `fill_value`
  * (the zarr v2 layout rule). Format: the public Zarr v2 storage spec.
  */
object ZarrStore {

  case class ArrayMeta(
      shape: Seq[Int], chunks: Seq[Int], dtype: String,
      zlib: Boolean, fillValue: Double)

  private val mapper = new ObjectMapper()

  private def fs(conf: Configuration, path: String) =
    new Path(path).getFileSystem(conf)

  private def readFile(conf: Configuration, path: String): Array[Byte] = {
    val f = fs(conf, path)
    val in = f.open(new Path(path))
    try {
      val out = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n > 0) { out.write(buf, 0, n); n = in.read(buf) }
      out.toByteArray
    } finally in.close()
  }

  private def writeFile(conf: Configuration, path: String, bytes: Array[Byte]): Unit = {
    val f = fs(conf, path)
    val out = f.create(new Path(path), true)
    try out.write(bytes) finally out.close()
  }

  def elemSize(dtype: String): Int = dtype.last match {
    case '1' => 1
    case '2' => 2
    case '4' => 4
    case '8' => 8
  }

  def readMeta(conf: Configuration, arrayDir: String): ArrayMeta = {
    val node = mapper.readTree(readFile(conf, s"$arrayDir/.zarray"))
    val comp = node.get("compressor")
    val zlib = comp != null && !comp.isNull && {
      val id = comp.get("id").asText()
      require(id == "zlib", s"compressor '$id' unsupported (need null/zlib)")
      true
    }
    val fill = Option(node.get("fill_value")).filterNot(_.isNull)
      .map(f => if (f.isTextual) f.asText().toDouble else f.asDouble())
      .getOrElse(0.0)
    val dtype = node.get("dtype").asText()
    require(dtype.head == '<' || dtype.head == '|',
      s"dtype $dtype unsupported (need little-endian or single-byte)")
    require(node.get("order").asText() == "C", "only C order supported")
    ArrayMeta(
      node.get("shape").elements().asScala.map(_.asInt()).toSeq,
      node.get("chunks").elements().asScala.map(_.asInt()).toSeq,
      dtype, zlib, fill)
  }

  /** Decode one chunk file to doubles (full chunk size, fill-padded). */
  def readChunk(conf: Configuration, arrayDir: String, meta: ArrayMeta,
      chunkIdx: Seq[Int]): Array[Double] = {
    val nElems = meta.chunks.product
    val es = elemSize(meta.dtype)
    val path = s"$arrayDir/${chunkIdx.mkString(".")}"
    val out = new Array[Double](nElems)
    if (!fs(conf, path).exists(new Path(path))) {
      java.util.Arrays.fill(out, meta.fillValue)
      return out
    }
    val raw0 = readFile(conf, path)
    val raw = if (!meta.zlib) raw0 else {
      val inf = new Inflater()
      inf.setInput(raw0)
      val o = new Array[Byte](nElems * es)
      var total = 0
      try {
        while (total < o.length && !inf.finished()) {
          val n = inf.inflate(o, total, o.length - total)
          // a truncated chunk file (routine object-store failure) makes
          // inflate return 0 forever — fail loudly, never spin
          require(n > 0 || inf.finished(),
            s"$path: truncated zlib chunk ($total of ${o.length} bytes)")
          total += n
        }
      } finally inf.end() // free native zlib memory on the throw paths too
      require(total == o.length, s"inflated $total of ${o.length} bytes")
      o
    }
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var k = 0
    while (k < nElems) {
      out(k) = meta.dtype.drop(1) match {
        case "f8" => bb.getDouble(k * 8)
        case "f4" => bb.getFloat(k * 4).toDouble
        case "i8" => bb.getLong(k * 8).toDouble
        case "i4" => bb.getInt(k * 4).toDouble
        case "i2" => bb.getShort(k * 2).toDouble
        case "u1" => (raw(k) & 0xFF).toDouble
        case d => sys.error(s"dtype $d unsupported")
      }
      k += 1
    }
    out
  }

  /** Read a full 1-D coordinate array (tiny — lat/lon axes). */
  def readVector(conf: Configuration, arrayDir: String): Array[Double] = {
    val meta = readMeta(conf, arrayDir)
    require(meta.shape.length == 1, s"$arrayDir: expected 1-D")
    val n = meta.shape.head
    val out = new Array[Double](n)
    val nChunks = (n + meta.chunks.head - 1) / meta.chunks.head
    for (c <- 0 until nChunks) {
      val chunk = readChunk(conf, arrayDir, meta, Seq(c))
      val lo = c * meta.chunks.head
      val len = math.min(meta.chunks.head, n - lo)
      System.arraycopy(chunk, 0, out, lo, len)
    }
    out
  }

  private def zarrayJson(shape: Seq[Int], chunks: Seq[Int], dtype: String,
      zlib: Boolean, fill: Double): String = {
    val comp = if (zlib) """{"id":"zlib","level":6}""" else "null"
    val fillStr =
      if (fill.isNaN) "\"NaN\"" else if (fill == fill.toLong) fill.toLong.toString
      else fill.toString
    s"""{"chunks":[${chunks.mkString(",")}],"compressor":$comp,""" +
      s""""dtype":"$dtype","fill_value":$fillStr,"filters":null,""" +
      s""""order":"C","shape":[${shape.mkString(",")}],"zarr_format":2}"""
  }

  private def encode(vals: Array[Double], dtype: String, zlib: Boolean): Array[Byte] = {
    val es = elemSize(dtype)
    val bb = ByteBuffer.allocate(vals.length * es).order(ByteOrder.LITTLE_ENDIAN)
    vals.foreach { v =>
      dtype.drop(1) match {
        case "f8" => bb.putDouble(v)
        case "f4" => bb.putFloat(v.toFloat)
        case "i8" => bb.putLong(v.toLong)
        case "i4" => bb.putInt(v.toInt)
        case d => sys.error(s"write dtype $d unsupported")
      }
    }
    val raw = bb.array()
    if (!zlib) raw else {
      val d = new Deflater(6)
      d.setInput(raw); d.finish()
      val out = new Array[Byte](raw.length + 64)
      var n = 0
      while (!d.finished()) n += d.deflate(out, n, out.length - n)
      d.end()
      java.util.Arrays.copyOf(out, n)
    }
  }

  /** DISTRIBUTED grid write (the io_managers zarr round-trip, Spark
    * shape): `df` holds (latCol, lonCol, valCol) on a regular grid whose
    * axes are `lats` (descending) × `lons` (ascending). Rows shuffle
    * ONCE on their chunk id; each task encodes and writes its own chunk
    * files through the Hadoop FS API (works over object storage), the
    * driver writes only the tiny JSON metadata + coordinate vectors.
    * Missing cells become `fill`.
    */
  def writeGrid(df: DataFrame, storeDir: String, varName: String,
      latCol: String, lonCol: String, valCol: String,
      lats: Array[Double], lons: Array[Double],
      chunkRows: Int, chunkCols: Int,
      zlib: Boolean = true, fill: Double = Double.NaN): Unit = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val (nLat, nLon) = (lats.length, lons.length)
    // metadata + coordinate vectors: driver-side, tiny
    fs(hadoopConf, storeDir).mkdirs(new Path(s"$storeDir/$varName"))
    fs(hadoopConf, storeDir).mkdirs(new Path(s"$storeDir/lat"))
    fs(hadoopConf, storeDir).mkdirs(new Path(s"$storeDir/lon"))
    writeFile(hadoopConf, s"$storeDir/.zgroup", """{"zarr_format":2}""".getBytes)
    writeFile(hadoopConf, s"$storeDir/lat/.zarray",
      zarrayJson(Seq(nLat), Seq(nLat), "<f8", zlib = false, 0.0).getBytes)
    writeFile(hadoopConf, s"$storeDir/lat/0", encode(lats, "<f8", zlib = false))
    writeFile(hadoopConf, s"$storeDir/lon/.zarray",
      zarrayJson(Seq(nLon), Seq(nLon), "<f8", zlib = false, 0.0).getBytes)
    writeFile(hadoopConf, s"$storeDir/lon/0", encode(lons, "<f8", zlib = false))
    writeFile(hadoopConf, s"$storeDir/$varName/.zarray",
      zarrayJson(Seq(nLat, nLon), Seq(chunkRows, chunkCols), "<f8", zlib, fill)
        .getBytes)

    // index maps broadcast; exact-match coordinates (converter contract)
    val latIdx = lats.zipWithIndex.toMap
    val lonIdx = lons.zipWithIndex.toMap
    val bLat = spark.sparkContext.broadcast(latIdx)
    val bLon = spark.sparkContext.broadcast(lonIdx)
    val conf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        spark.sparkContext.hadoopConfiguration))

    // repartition + sortWithinPartitions + streaming foreachPartition,
    // NOT groupByKey: rows shuffle Tungsten-encoded and each task holds
    // one chunk buffer at a time — a groupByKey materializes a whole
    // chunk's cells as a boxed Iterable (measured OOM past ~50M cells
    // on an 8 GB heap in the equivalent Hdf5Writer staging).
    import org.apache.spark.sql.Row
    import spark.implicits._
    val nChunkCols = (nLon + chunkCols - 1) / chunkCols
    val nChunks = ((nLat + chunkRows - 1) / chunkRows) * nChunkCols
    val parts = math.min(nChunks,
      spark.sparkContext.defaultParallelism).max(1)
    df.select(col(latCol).cast("double"), col(lonCol).cast("double"),
        col(valCol).cast("double"))
      .as[(Double, Double, Double)]
      .mapPartitions { it =>
        val latI = bLat.value
        val lonI = bLon.value
        it.map { case (la, lo, v) =>
          val i = latI(la)
          val j = lonI(lo)
          ((i / chunkRows) * nChunkCols + j / chunkCols,
            (i % chunkRows) * chunkCols + j % chunkCols, v)
        }
      }
      .toDF("chunk", "local", "v")
      .repartition(parts, col("chunk"))
      .sortWithinPartitions("chunk")
      .foreachPartition { rows: Iterator[Row] =>
        val hconf = conf.value.value
        var cur = -1
        var buf: Array[Double] = null
        def flush(): Unit = if (cur >= 0) {
          val bytes = encode(buf, "<f8", zlib)
          val p = new Path(
            s"$storeDir/$varName/${cur / nChunkCols}.${cur % nChunkCols}")
          val out = p.getFileSystem(hconf).create(p, true)
          try out.write(bytes) finally out.close()
        }
        rows.foreach { r =>
          val chunk = r.getInt(0)
          if (chunk != cur) {
            flush()
            cur = chunk
            buf = new Array[Double](chunkRows * chunkCols)
            java.util.Arrays.fill(buf, fill)
          }
          buf(r.getInt(1)) = r.getDouble(2)
        }
        flush()
      }
  }
}
