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

  /** v3 sharding_indexed parameters: inner chunk shape, inner codec
    * chain (bytes [+ gzip]), index checksum + placement.
    */
  case class V3Shard(inner: Seq[Int], innerGzip: Boolean,
      indexCrc: Boolean, indexAtEnd: Boolean)

  /** Normalized metadata for BOTH format versions: v3 arrays carry the
    * v2-style dtype code plus the v3-only fields (chunk-key separator,
    * gzip codec, optional sharding). The decode path downstream is
    * shared.
    */
  case class ArrayMeta(
      shape: Seq[Int], chunks: Seq[Int], dtype: String,
      zlib: Boolean, fillValue: Double,
      v3: Boolean = false, sep: String = ".",
      gzip: Boolean = false, shard: Option[V3Shard] = None)

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

  /** Version dispatch: a v3 array carries `zarr.json`, a v2 one
    * `.zarray`. Everything downstream shares ArrayMeta.
    */
  def readMeta(conf: Configuration, arrayDir: String): ArrayMeta =
    if (fs(conf, arrayDir).exists(new Path(s"$arrayDir/zarr.json")))
      readMetaV3(conf, arrayDir)
    else readMetaV2(conf, arrayDir)

  /** Zarr v3 array metadata (public zarr-specs v3.0 + the
    * sharding_indexed codec spec). Supported: regular chunk grid,
    * default chunk-key encoding, numeric little-endian data types,
    * codec chains `[bytes]`, `[bytes, gzip]`, and `sharding_indexed`
    * wrapping either; anything else fails loudly at metadata time.
    */
  private def readMetaV3(conf: Configuration, arrayDir: String): ArrayMeta = {
    val node = mapper.readTree(readFile(conf, s"$arrayDir/zarr.json"))
    require(node.get("zarr_format").asInt() == 3, "zarr_format must be 3")
    require(node.get("node_type").asText() == "array",
      s"$arrayDir/zarr.json: node_type must be 'array'")
    val dtype = node.get("data_type").asText() match {
      case "float64" => "<f8"
      case "float32" => "<f4"
      case "int64" => "<i8"
      case "int32" => "<i4"
      case "int16" => "<i2"
      case "uint8" => "|u1"
      case d => sys.error(s"data_type $d unsupported")
    }
    val grid = node.get("chunk_grid")
    require(grid.get("name").asText() == "regular",
      "only the regular chunk grid is supported")
    val chunks = grid.get("configuration").get("chunk_shape")
      .elements().asScala.map(_.asInt()).toSeq
    val keyEnc = node.get("chunk_key_encoding")
    require(keyEnc == null || keyEnc.get("name").asText() == "default",
      "only the default chunk-key encoding is supported")
    val sep = Option(keyEnc).flatMap(k => Option(k.get("configuration")))
      .flatMap(c => Option(c.get("separator"))).map(_.asText()).getOrElse("/")
    val f = node.get("fill_value")
    val fill =
      if (f == null || f.isNull) 0.0
      else if (f.isTextual) f.asText() match {
        case "NaN" => Double.NaN
        case "Infinity" => Double.PositiveInfinity
        case "-Infinity" => Double.NegativeInfinity
        case t => t.toDouble
      }
      else f.asDouble()
    // codec chain: either [bytes(le)[, gzip]] or [sharding_indexed{...}]
    def parseChain(codecs: com.fasterxml.jackson.databind.JsonNode):
        (Boolean, Option[V3Shard]) = {
      val cs = codecs.elements().asScala.toSeq
      require(cs.nonEmpty, "empty codec chain")
      cs.head.get("name").asText() match {
        case "sharding_indexed" =>
          require(cs.size == 1, "sharding_indexed must be the only codec")
          val c = cs.head.get("configuration")
          val inner = c.get("chunk_shape").elements().asScala.map(_.asInt()).toSeq
          val (innerGzip, innerShard) = parseChain(c.get("codecs"))
          require(innerShard.isEmpty, "nested sharding unsupported")
          val idx = c.get("index_codecs").elements().asScala.toSeq
            .map(_.get("name").asText())
          require(idx.headOption.contains("bytes") &&
            idx.drop(1).forall(_ == "crc32c"),
            s"index_codecs ${idx.mkString(",")} unsupported (need bytes[, crc32c])")
          val atEnd = Option(c.get("index_location"))
            .forall(_.asText() == "end")
          (false, Some(V3Shard(inner, innerGzip, idx.contains("crc32c"), atEnd)))
        case "bytes" =>
          val endian = Option(cs.head.get("configuration"))
            .flatMap(c => Option(c.get("endian"))).map(_.asText())
            .getOrElse("little")
          require(endian == "little", "only little-endian bytes codec supported")
          val rest = cs.tail.map(_.get("name").asText())
          require(rest.forall(_ == "gzip"),
            s"codecs ${rest.mkString(",")} unsupported after bytes (need gzip only)")
          (rest.contains("gzip"), None)
        case other => sys.error(s"leading codec $other unsupported")
      }
    }
    val (gz, shard) = parseChain(node.get("codecs"))
    ArrayMeta(
      node.get("shape").elements().asScala.map(_.asInt()).toSeq,
      chunks, dtype, zlib = false, fill,
      v3 = true, sep = sep, gzip = gz, shard = shard)
  }

  private def readMetaV2(conf: Configuration, arrayDir: String): ArrayMeta = {
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

  /** Raw little-endian bytes → doubles for `n` elements of `dtype`. */
  private def decodeRaw(raw: Array[Byte], dtype: String, n: Int): Array[Double] = {
    val out = new Array[Double](n)
    val bb = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
    var k = 0
    while (k < n) {
      out(k) = dtype.drop(1) match {
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

  private def inflateZlib(raw0: Array[Byte], outLen: Int, path: String): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw0)
    val o = new Array[Byte](outLen)
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

  /** RFC1952 gzip (the v3 `gzip` codec) — bounded read, loud on short. */
  private def gunzip(raw0: Array[Byte], outLen: Int, path: String): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(raw0))
    val o = new Array[Byte](outLen)
    var total = 0
    try {
      var n = in.read(o, total, o.length - total)
      while (n > 0 && total < o.length) {
        total += n
        if (total < o.length) n = in.read(o, total, o.length - total)
      }
      require(total == o.length,
        s"$path: gunzipped $total of ${o.length} bytes")
      o
    } finally in.close()
  }

  /** Decode one chunk to doubles (full chunk size, fill-padded): v2
    * chunk files, v3 unsharded chunks, and v3 shards (the outer chunk
    * IS the shard; inner chunks are assembled into it, with the all-1s
    * offset/nbytes sentinel marking fill-only inner chunks).
    */
  def readChunk(conf: Configuration, arrayDir: String, meta: ArrayMeta,
      chunkIdx: Seq[Int]): Array[Double] = {
    val nElems = meta.chunks.product
    val es = elemSize(meta.dtype)
    val path =
      if (meta.v3) s"$arrayDir/${("c" +: chunkIdx.map(_.toString)).mkString(meta.sep)}"
      else s"$arrayDir/${chunkIdx.mkString(".")}"
    val out = new Array[Double](nElems)
    if (!fs(conf, path).exists(new Path(path))) {
      java.util.Arrays.fill(out, meta.fillValue)
      return out
    }
    val raw0 = readFile(conf, path)
    meta.shard match {
      case Some(shard) => readShard(raw0, meta, shard, path, out)
      case None =>
        val raw =
          if (meta.zlib) inflateZlib(raw0, nElems * es, path)
          else if (meta.gzip) gunzip(raw0, nElems * es, path)
          else raw0
        val vals = decodeRaw(raw, meta.dtype, nElems)
        System.arraycopy(vals, 0, out, 0, nElems)
    }
    out
  }

  /** Assemble a v3 shard: parse the (offset, nbytes) uint64-pair index
    * (little-endian, optional trailing crc32c, at end or start), decode
    * each present inner chunk through the inner codec chain, and copy
    * it into place in the outer chunk. 1-D and 2-D arrays (the engine's
    * raster surface).
    */
  private def readShard(bytes: Array[Byte], meta: ArrayMeta, shard: V3Shard,
      path: String, out: Array[Double]): Unit = {
    val es = elemSize(meta.dtype)
    val innerGrid = meta.chunks.zip(shard.inner)
      .map { case (c, i) => (c + i - 1) / i }
    val nInner = innerGrid.product
    val idxLen = nInner * 16 + (if (shard.indexCrc) 4 else 0)
    require(bytes.length >= idxLen,
      s"$path: shard smaller (${bytes.length}) than its index ($idxLen)")
    val idxOff = if (shard.indexAtEnd) bytes.length - idxLen else 0
    if (shard.indexCrc) {
      val crc = new java.util.zip.CRC32C()
      crc.update(bytes, idxOff, nInner * 16)
      val stored = ByteBuffer.wrap(bytes, idxOff + nInner * 16, 4)
        .order(ByteOrder.LITTLE_ENDIAN).getInt & 0xFFFFFFFFL
      require(crc.getValue == stored,
        s"$path: shard index crc32c mismatch (${crc.getValue} != $stored)")
    }
    val idx = ByteBuffer.wrap(bytes, idxOff, nInner * 16)
      .order(ByteOrder.LITTLE_ENDIAN)
    val innerElems = shard.inner.product
    java.util.Arrays.fill(out, meta.fillValue)
    var k = 0
    while (k < nInner) {
      val off = idx.getLong(idxOff + k * 16)
      val len = idx.getLong(idxOff + k * 16 + 8)
      if (off != -1L || len != -1L) { // all-1s sentinel = fill-only
        require(off >= 0 && len > 0 && off + len <= bytes.length,
          s"$path: inner chunk $k range [$off, ${off + len}) out of bounds")
        val raw0 = java.util.Arrays.copyOfRange(
          bytes, off.toInt, (off + len).toInt)
        val raw =
          if (shard.innerGzip) gunzip(raw0, innerElems * es, s"$path#$k")
          else raw0
        val vals = decodeRaw(raw, meta.dtype, innerElems)
        // place inner chunk k (row-major over innerGrid) into the outer
        meta.chunks match {
          case Seq(_) =>
            val lo = k * shard.inner.head
            val n = math.min(shard.inner.head, out.length - lo)
            System.arraycopy(vals, 0, out, lo, n)
          case Seq(_, chunkCols) =>
            val ir = k / innerGrid(1)
            val ic = k % innerGrid(1)
            val (rows, cols) = (shard.inner(0), shard.inner(1))
            var r = 0
            while (r < rows) {
              val outRow = ir * rows + r
              val outCol = ic * cols
              if (outRow < meta.chunks.head) {
                val n = math.min(cols, chunkCols - outCol)
                if (n > 0)
                  System.arraycopy(vals, r * cols, out,
                    outRow * chunkCols + outCol, n)
              }
              r += 1
            }
          case s => sys.error(s"sharded ${s.length}-D arrays unsupported")
        }
      }
      k += 1
    }
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

  private def fillJson(fill: Double): String =
    if (fill.isNaN) "\"NaN\""
    else if (fill == fill.toLong) fill.toLong.toString
    else fill.toString

  private def v3ArrayJson(shape: Seq[Int], chunks: Seq[Int],
      inner: Option[Seq[Int]], fill: Double): String = {
    val bytesC = """{"name":"bytes","configuration":{"endian":"little"}}"""
    val gzipC = """{"name":"gzip","configuration":{"level":6}}"""
    val codecs = inner match {
      case Some(in) =>
        s"""[{"name":"sharding_indexed","configuration":{""" +
          s""""chunk_shape":[${in.mkString(",")}],""" +
          s""""codecs":[$bytesC,$gzipC],""" +
          s""""index_codecs":[$bytesC,{"name":"crc32c"}],""" +
          s""""index_location":"end"}}]"""
      case None => s"[$bytesC]"
    }
    s"""{"zarr_format":3,"node_type":"array",""" +
      s""""shape":[${shape.mkString(",")}],"data_type":"float64",""" +
      s""""chunk_grid":{"name":"regular","configuration":{"chunk_shape":[${chunks.mkString(",")}]}},""" +
      s""""chunk_key_encoding":{"name":"default","configuration":{"separator":"/"}},""" +
      s""""fill_value":${fillJson(fill)},"codecs":$codecs}"""
  }

  private def gzipBytes(raw: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(raw); gz.close()
    bos.toByteArray
  }

  /** Encode one v3 shard: row-major inner chunks (gzip, all-fill ones
    * as the all-1s sentinel) + little-endian (offset, nbytes) index +
    * crc32c, index at the end.
    */
  private def encodeShard(buf: Array[Double], chunkRows: Int, chunkCols: Int,
      innerRows: Int, innerCols: Int, fill: Double): Array[Byte] = {
    val igR = (chunkRows + innerRows - 1) / innerRows
    val igC = (chunkCols + innerCols - 1) / innerCols
    val body = new java.io.ByteArrayOutputStream()
    val idx = ByteBuffer.allocate(igR * igC * 16 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    for (ir <- 0 until igR; ic <- 0 until igC) {
      val cells = new Array[Double](innerRows * innerCols)
      var allFill = true
      var r = 0
      while (r < innerRows) {
        var c = 0
        while (c < innerCols) {
          val gr = ir * innerRows + r
          val gc = ic * innerCols + c
          val v = if (gr < chunkRows && gc < chunkCols)
            buf(gr * chunkCols + gc) else fill
          cells(r * innerCols + c) = v
          if (!(v.isNaN && fill.isNaN) && v != fill) allFill = false
          c += 1
        }
        r += 1
      }
      if (allFill) { idx.putLong(-1L); idx.putLong(-1L) }
      else {
        val enc = gzipBytes(encode(cells, "<f8", zlib = false))
        idx.putLong(body.size().toLong); idx.putLong(enc.length.toLong)
        body.write(enc)
      }
    }
    val crc = new java.util.zip.CRC32C()
    crc.update(idx.array(), 0, igR * igC * 16)
    idx.putInt(crc.getValue.toInt)
    body.write(idx.array())
    body.toByteArray
  }

  /** DISTRIBUTED v3 SHARDED grid write — writeGrid's layout with one
    * v3 shard per outer chunk: same single shuffle on the chunk id, one
    * streaming buffer per task, but each task emits one shard object
    * holding gzip inner chunks + crc32c index. At 100 TB this is the
    * object-count lever: chunk granularity for reads (the index), shard
    * granularity for the object store.
    */
  def writeGridV3(df: DataFrame, storeDir: String, varName: String,
      latCol: String, lonCol: String, valCol: String,
      lats: Array[Double], lons: Array[Double],
      chunkRows: Int, chunkCols: Int, innerRows: Int, innerCols: Int,
      fill: Double = Double.NaN): Unit = {
    val spark = df.sparkSession
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val (nLat, nLon) = (lats.length, lons.length)
    fs(hadoopConf, storeDir).mkdirs(new Path(s"$storeDir/$varName/c"))
    fs(hadoopConf, storeDir).mkdirs(new Path(s"$storeDir/lat/c"))
    fs(hadoopConf, storeDir).mkdirs(new Path(s"$storeDir/lon/c"))
    writeFile(hadoopConf, s"$storeDir/zarr.json",
      """{"zarr_format":3,"node_type":"group"}""".getBytes)
    writeFile(hadoopConf, s"$storeDir/lat/zarr.json",
      v3ArrayJson(Seq(nLat), Seq(nLat), None, 0.0).getBytes)
    writeFile(hadoopConf, s"$storeDir/lat/c/0", encode(lats, "<f8", zlib = false))
    writeFile(hadoopConf, s"$storeDir/lon/zarr.json",
      v3ArrayJson(Seq(nLon), Seq(nLon), None, 0.0).getBytes)
    writeFile(hadoopConf, s"$storeDir/lon/c/0", encode(lons, "<f8", zlib = false))
    writeFile(hadoopConf, s"$storeDir/$varName/zarr.json",
      v3ArrayJson(Seq(nLat, nLon), Seq(chunkRows, chunkCols),
        Some(Seq(innerRows, innerCols)), fill).getBytes)

    val bLat = spark.sparkContext.broadcast(lats.zipWithIndex.toMap)
    val bLon = spark.sparkContext.broadcast(lons.zipWithIndex.toMap)
    val conf = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hadoopConf))
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
          val bytes = encodeShard(buf, chunkRows, chunkCols,
            innerRows, innerCols, fill)
          val p = new Path(
            s"$storeDir/$varName/c/${cur / nChunkCols}/${cur % nChunkCols}")
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
