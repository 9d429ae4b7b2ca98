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
  */
class NetcdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-netcdf"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetcdfDataSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new NetcdfTable(properties.asScala.toMap)
}

object NetcdfDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("value", FloatType, nullable = false)))
}

case class NetcdfSpec(path: String, varName: String, latVar: String,
    lonVar: String, partitions: Int)

object NetcdfSpec {
  def fromOptions(o: Map[String, String]): NetcdfSpec = NetcdfSpec(
    path = o.getOrElse("path", sys.error("graft-netcdf: 'path' option required")),
    varName = o.getOrElse("var", sys.error("graft-netcdf: 'var' option required")),
    latVar = o.getOrElse("latvar", "lat"),
    lonVar = o.getOrElse("lonvar", "lon"),
    partitions = o.getOrElse("partitions", "8").toInt)
}

class NetcdfTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft_netcdf(${props.getOrElse("path", "?")})"
  override def schema(): StructType = NetcdfDataSource.Schema
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
  private var required: StructType = NetcdfDataSource.Schema
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
  // coordinate array. The data variable itself is never touched here.
  @transient private lazy val planned: (Int, Int, Int, Int) = {
    val f = graft.sources.nc.NcFormat.open(spec.path)
    try {
      val dims = f.varDims(spec.varName)
      require(dims.length == 2, s"${spec.varName} must be 2-D (lat, lon)")
      val (nLat, nLon) = (dims(0).toInt, dims(1).toInt)
      var (lo, hi) = (0, nLat)
      if (latLo.isFinite || latHi.isFinite) {
        val lats = f.readDoubles(spec.latVar)
        val idx = lats.indices.filter(i => lats(i) >= latLo && lats(i) <= latHi)
        if (idx.isEmpty) { lo = 0; hi = 0 }
        else { lo = math.max(idx.min - 1, 0); hi = math.min(idx.max + 2, nLat) }
      }
      (nLat, nLon, lo, hi)
    } finally f.close()
  }

  override def description(): String = {
    val (_, _, lo, hi) = planned
    s"graft-netcdf ${spec.path}#${spec.varName} rows=[$lo..$hi)"
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
      private val file = graft.sources.nc.NcFormat.open(spec.path)
      private val needLat = cols.contains("latitude")
      private val needLon = cols.contains("longitude")
      private val needVal = cols.contains("value")
      private val lats: Array[Double] =
        if (needLat) file.readDoubles(spec.latVar) else null
      private val lons: Array[Double] =
        if (needLon) file.readDoubles(spec.lonVar) else null
      private val nLon = file.varDims(spec.varName)(1).toInt
      private val values: ByteBuffer =
        if (needVal)
          ByteBuffer.wrap(file.readRowBand(spec.varName, band.rowLo, band.rowHi))
            .order(if (file.littleEndian) ByteOrder.LITTLE_ENDIAN
              else ByteOrder.BIG_ENDIAN)
        else null
      private val elemSize =
        if (needVal) file.varElemSize(spec.varName) else 0

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
          case "value" =>
            val off = ((i - band.rowLo).toLong * nLon + j).toInt * elemSize
            if (elemSize == 4) values.getFloat(off)
            else values.getDouble(off).toFloat
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }

      override def close(): Unit = file.close()
    }
  }
}
