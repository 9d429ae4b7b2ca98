package graft.sources.v2

import java.nio.{ByteBuffer, ByteOrder}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap



/** DataSource V2 over real NetCDF-4/HDF5 raster files (graft.sources.nc),
  * unpivoting a 2-D `var(lat, lon)` grid to long-form rows
  * `(latitude, longitude, value)` — the exact shape the reference produces
  * with `xr.Dataset.to_dataframe().reset_index()` before every pipeline
  * join (reference: raster_converter.py:24-37, rp_thresholds.py:37-49).
  *
  * Scale design:
  *  - one InputPartition per latitude row-band; a contiguous-layout
  *    variable turns each partition into a single positional byte-range
  *    read of exactly its band (no shared state, no driver
  *    materialization) — on a 1000-executor cluster each task reads only
  *    its slice of the (shared-filesystem/object-store) file;
  *  - latitude range predicates push down to row-band pruning (the lat
  *    coordinate array is tiny and monotonic); every filter stays
  *    residual so pushdown only prunes work, never decides correctness;
  *  - column pruning: projecting `value` alone skips building coordinate
  *    columns entirely.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-netcdf")
  *   .option("path", "/data/RP2ythresholds_GloFASv40.nc")
  *   .option("var", "2yRP_GloFASv4")
  *   .load()  // latitude double, longitude double, value float
  * }}}
  *
  * ALIGNED MULTI-SCAN (`paths`/`vars`, optional `cols`): several
  * variables — from one file or from several files sharing the SAME
  * grid — read in ONE pass, one column per variable. This is the
  * source-side image of `xr.open_dataset` aligning variables on shared
  * dims: each InputPartition reads the same row band from every input,
  * so an N-way same-grid combine (rp_thresholds.py:108-131 joining
  * RP2/RP5/RP20) needs ZERO shuffles — the join that q72 does in one
  * union+pivot exchange becomes free at the scan. Planning verifies the
  * coordinate arrays are IDENTICAL across files (exact, tiny vectors)
  * and fails loudly otherwise — alignment is the correctness premise,
  * never an assumption.
  * {{{
  * spark.read.format("graft-netcdf")
  *   .option("paths", "/d/RP2.nc,/d/RP5.nc,/d/RP20.nc")
  *   .option("vars", "2yRP_GloFASv4,5yRP_GloFASv4,20yRP_GloFASv4")
  *   .option("cols", "threshold_2y,threshold_5y,threshold_20y")
  *   .load()  // latitude, longitude, threshold_2y, threshold_5y, threshold_20y
  * }}}
  */
class NetcdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-netcdf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetcdfDataSource.schemaFor(NetcdfSpec.fromOptions(
      options.asScala.map { case (k, v) => k.toLowerCase -> v }.toMap))
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NetcdfTable(properties.asScala.toMap)
}

object NetcdfDataSource {
  def schemaFor(spec: NetcdfSpec): StructType = StructType(
    StructField("latitude", DoubleType, nullable = false) +:
      StructField("longitude", DoubleType, nullable = false) +:
      spec.outCols.map(c => StructField(c, FloatType, nullable = false)))
}

/** `paths`, `varNames`, `outCols` are equal-length and row-aligned:
  * output column i is variable varNames(i) read from paths(i).
  */
case class NetcdfSpec(paths: Seq[String], varNames: Seq[String],
    outCols: Seq[String], latVar: String, lonVar: String, partitions: Int)

object NetcdfSpec {
  private def csv(s: String): Seq[String] =
    s.split(",").map(_.trim).filter(_.nonEmpty).toSeq

  def fromOptions(o: Map[String, String]): NetcdfSpec = {
    val paths0 = o.get("paths").map(csv)
      .orElse(o.get("path").map(Seq(_)))
      .getOrElse(sys.error("graft-netcdf: 'path' or 'paths' option required"))
    val vars0 = o.get("vars").map(csv)
      .orElse(o.get("var").map(Seq(_)))
      .getOrElse(sys.error("graft-netcdf: 'var' or 'vars' option required"))
    // one file with many vars, many files with one var each, or a
    // fully explicit pairing — anything else is ambiguous
    val (paths, vars) =
      if (paths0.length == vars0.length) (paths0, vars0)
      else if (paths0.length == 1) (Seq.fill(vars0.length)(paths0.head), vars0)
      else if (vars0.length == 1) (paths0, Seq.fill(paths0.length)(vars0.head))
      else sys.error(s"graft-netcdf: ${paths0.length} paths vs " +
        s"${vars0.length} vars — provide equal counts, or one of either")
    val cols = o.get("cols").map(csv).getOrElse {
      if (vars.length == 1) Seq("value") // single-scan back-compat
      else if (vars.distinct.length == vars.length) vars
      else vars.indices.map(i => s"value_$i")
    }
    require(cols.length == vars.length,
      s"graft-netcdf: ${cols.length} cols for ${vars.length} vars")
    NetcdfSpec(paths, vars, cols,
      latVar = o.getOrElse("latvar", "lat"),
      lonVar = o.getOrElse("lonvar", "lon"),
      partitions = o.getOrElse("partitions", "8").toInt)
  }
}

class NetcdfTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String =
    s"graft_netcdf(${props.getOrElse("path", props.getOrElse("paths", "?"))})"
  override def schema(): StructType =
    NetcdfDataSource.schemaFor(NetcdfSpec.fromOptions(
      props.map { case (k, v) => k.toLowerCase -> v }))
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(NetcdfSpec.fromOptions(
      props ++ options.asScala.map { case (k, v) => k.toLowerCase -> v }))
}

class NetcdfScanBuilder(spec: NetcdfSpec)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = NetcdfDataSource.schemaFor(spec)
  private var latLo = Double.NegativeInfinity
  private var latHi = Double.PositiveInfinity
  private var accepted: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Latitude bounds shrink the planned row bands. All filters are
    * returned as residual: over-generation is corrected by Spark's own
    * re-applied predicate, so pruning can be conservative (one whole row
    * of slack on each side — see GridDataSource's epsilon lesson: absolute
    * epsilons break at high index magnitude, whole-cell slack is free).
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    def num(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case _ => None
    }
    accepted = filters.filter {
      case sources.GreaterThan("latitude", v) => num(v).exists { d => latLo = math.max(latLo, d); true }
      case sources.GreaterThanOrEqual("latitude", v) => num(v).exists { d => latLo = math.max(latLo, d); true }
      case sources.LessThan("latitude", v) => num(v).exists { d => latHi = math.min(latHi, d); true }
      case sources.LessThanOrEqual("latitude", v) => num(v).exists { d => latHi = math.min(latHi, d); true }
      case sources.EqualTo("latitude", v) =>
        num(v).exists { d => latLo = math.max(latLo, d); latHi = math.min(latHi, d); true }
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan = new NetcdfScan(spec, required, latLo, latHi)
}

class NetcdfScan(spec: NetcdfSpec, required: StructType,
    latLo: Double, latHi: Double)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  // Planning-time metadata read: dims + (when pruning) the tiny lat
  // coordinate array — from EVERY distinct input file, verifying the
  // aligned-scan premise (same dims, bit-identical coordinate vectors).
  // The data variables themselves are never touched here.
  @transient private lazy val planned: (Int, Int, Int, Int) = {
    val byPath = spec.paths.zip(spec.varNames)
    val distinctPaths = spec.paths.distinct
    var dims0: Seq[Long] = null
    var lats0: Array[Double] = null
    var lons0: Array[Double] = null
    for (p <- distinctPaths) {
      val f = graft.sources.nc.NcFormat.open(p)
      try {
        for ((_, v) <- byPath.filter(_._1 == p)) {
          val d = f.varDims(v)
          require(d.length == 2, s"$p#$v must be 2-D (lat, lon)")
          if (dims0 == null) dims0 = d
          else require(d == dims0,
            s"aligned scan: $p#$v dims $d != ${dims0} of ${spec.paths.head}")
        }
        if (distinctPaths.length > 1) {
          val (la, lo) = (f.readDoubles(spec.latVar), f.readDoubles(spec.lonVar))
          if (lats0 == null) { lats0 = la; lons0 = lo }
          else require(java.util.Arrays.equals(la, lats0) &&
            java.util.Arrays.equals(lo, lons0),
            s"aligned scan: $p coordinate vectors differ from " +
              s"${distinctPaths.head} — inputs are not on the same grid")
        }
      } finally f.close()
    }
    val (nLat, nLon) = (dims0(0).toInt, dims0(1).toInt)
    var (lo, hi) = (0, nLat)
    if (latLo.isFinite || latHi.isFinite) {
      val lats = if (lats0 != null) lats0 else {
        val f = graft.sources.nc.NcFormat.open(spec.paths.head)
        try f.readDoubles(spec.latVar) finally f.close()
      }
      val idx = lats.indices.filter(i => lats(i) >= latLo && lats(i) <= latHi)
      if (idx.isEmpty) { lo = 0; hi = 0 }
      else { lo = math.max(idx.min - 1, 0); hi = math.min(idx.max + 2, nLat) }
    }
    (nLat, nLon, lo, hi)
  }

  override def description(): String = {
    val (_, _, lo, hi) = planned
    s"graft-netcdf ${spec.paths.mkString(",")}#${spec.varNames.mkString(",")} rows=[$lo..$hi)"
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (_, _, lo, hi) = planned
    val nRows = hi - lo
    if (nRows <= 0) return Array.empty
    val bands = math.min(spec.partitions, nRows).max(1)
    val step = math.ceil(nRows.toDouble / bands).toInt
    (lo until hi by step)
      .map(b => NetcdfInputPartition(b, math.min(b + step, hi)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(spec, required.fieldNames)
}

case class NetcdfInputPartition(rowLo: Int, rowHi: Int) extends InputPartition

class NetcdfReaderFactory(spec: NetcdfSpec, cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val band = p.asInstanceOf[NetcdfInputPartition]
    new PartitionReader[InternalRow] {
      // one open handle per DISTINCT file (multi-var single-file scans
      // share one); column pruning skips whole variables AND whole files
      private val neededIdx: Seq[Int] =
        spec.outCols.indices.filter(k => cols.contains(spec.outCols(k)))
      private val files =
        scala.collection.mutable.LinkedHashMap.empty[String, graft.sources.nc.NcFormat.Reader]
      private def fileFor(p0: String) =
        files.getOrElseUpdate(p0, graft.sources.nc.NcFormat.open(p0))
      private val needLat = cols.contains("latitude")
      private val needLon = cols.contains("longitude")
      private def coordFile = fileFor(spec.paths.head)
      private val lats: Array[Double] =
        if (needLat) coordFile.readDoubles(spec.latVar) else null
      private val lons: Array[Double] =
        if (needLon) coordFile.readDoubles(spec.lonVar) else null
      private val nLon = coordFile.varDims(spec.varNames.head)(1).toInt
      // the same row band from every needed input, read once, aligned
      private val bands: Map[String, (ByteBuffer, Int)] = neededIdx.map { k =>
        val f = fileFor(spec.paths(k))
        val buf = ByteBuffer.wrap(
          f.readRowBand(spec.varNames(k), band.rowLo, band.rowHi))
          .order(if (f.littleEndian) ByteOrder.LITTLE_ENDIAN
            else ByteOrder.BIG_ENDIAN)
        spec.outCols(k) -> (buf, f.varElemSize(spec.varNames(k)))
      }.toMap

      private var i = band.rowLo
      private var j = -1

      override def next(): Boolean = {
        j += 1
        if (j >= nLon) { j = 0; i += 1 }
        i < band.rowHi
      }

      override def get(): InternalRow = {
        val vals: Array[Any] = cols.map {
          case "latitude" => lats(i)
          case "longitude" => lons(j)
          case c =>
            val (buf, elemSize) = bands(c)
            val off = ((i - band.rowLo).toLong * nLon + j).toInt * elemSize
            if (elemSize == 4) buf.getFloat(off)
            else buf.getDouble(off).toFloat
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }

      override def close(): Unit = files.values.foreach(_.close())
    }
  }
}
