package graft.sources.v2

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

/** DataSource V2 implementing the dense-grid raster surface virtually
  * (SURVEY §7.3 stretch goal: custom DSv2 for raster sources): a regular
  * (latitude, longitude) grid materializes directly as InternalRows, with
  *
  *  - partition planning: the latitude dimension splits into `partitions`
  *    bands, so a 1000-executor cluster reads the grid in parallel with
  *    no driver materialization;
  *  - column pruning: SupportsPushDownRequiredColumns — a projection of
  *    one column reads/creates only that column.
  *
  * Usage:
  * {{{
  * spark.read.format("graft-grid")
  *   .option("latMax", 17.0).option("lonMin", -18.0)
  *   .option("res", 0.05).option("nLat", 460).option("nLon", 1400)
  *   .load()
  * }}}
  *
  * Real binary raster codecs (GRIB/NetCDF/COG) would slot into the same
  * skeleton with one InputPartition per file chunk (the converter
  * contract of graft.sources.RasterContract).
  */
class GridDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-grid"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GridDataSource.Schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    // read options are delivered to newScanBuilder, not here (Spark 4
    // passes only table properties to getTable for plain TableProviders)
    new GridTable(properties.asScala.toMap)
}

object GridDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false)))
}

case class GridSpec(latMax: Double, lonMin: Double, res: Double,
    nLat: Int, nLon: Int, partitions: Int)

object GridSpec {
  def fromOptions(o: Map[String, String]): GridSpec = GridSpec(
    latMax = o.getOrElse("latmax", "0").toDouble,
    lonMin = o.getOrElse("lonmin", "0").toDouble,
    res = o.getOrElse("res", "0.05").toDouble,
    nLat = o.getOrElse("nlat", "1").toInt,
    nLon = o.getOrElse("nlon", "1").toInt,
    partitions = o.getOrElse("partitions", "8").toInt)
}

class GridTable(props: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = "graft_grid"
  override def schema(): StructType = GridDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GridScanBuilder(GridSpec.fromOptions(
      props ++ options.asScala.map { case (k, v) => k.toLowerCase -> v }))
}

/** Index-space bounds derived from pushed coordinate filters:
  * rows are generated only for i in [iLo, iHi), j in [jLo, jHi).
  */
case class GridBounds(iLo: Int, iHi: Int, jLo: Int, jHi: Int)

class GridScanBuilder(spec: GridSpec)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = GridDataSource.Schema
  private var bounds: GridBounds = GridBounds(0, spec.nLat, 0, spec.nLon)
  private var accepted: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Range predicates on latitude/longitude shrink the generated index
    * window — the source-side image of the reference's area restriction
    * (SURVEY P3): a bbox query on a 1000-executor cluster plans only the
    * bands inside the box instead of generating the globe and filtering.
    * Clipping is conservative by ONE WHOLE CELL on each side: an absolute
    * epsilon breaks once index magnitudes grow (FP error scales as
    * |index|·ulp, so fine-resolution global grids would lose boundary
    * rows), while a cell of slack is correct at any magnitude and free —
    * every filter is returned as residual so Spark re-applies the exact
    * predicate; pushdown prunes work, it never decides correctness.
    */
  override def pushFilters(filters: Array[sources.Filter]): Array[sources.Filter] = {
    // latitude = latMax - i*res (descending in i); longitude = lonMin + j*res
    def latGe(a: Double) = bounds = bounds.copy(
      iHi = math.min(bounds.iHi,
        math.floor((spec.latMax - a) / spec.res).toInt + 2))
    def latLe(b: Double) = bounds = bounds.copy(
      iLo = math.max(bounds.iLo,
        math.ceil((spec.latMax - b) / spec.res).toInt - 1))
    def lonGe(a: Double) = bounds = bounds.copy(
      jLo = math.max(bounds.jLo,
        math.ceil((a - spec.lonMin) / spec.res).toInt - 1))
    def lonLe(b: Double) = bounds = bounds.copy(
      jHi = math.min(bounds.jHi,
        math.floor((b - spec.lonMin) / spec.res).toInt + 2))
    def num(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case _ => None
    }
    accepted = filters.filter {
      case sources.GreaterThan("latitude", v) => num(v).exists { d => latGe(d); true }
      case sources.GreaterThanOrEqual("latitude", v) => num(v).exists { d => latGe(d); true }
      case sources.LessThan("latitude", v) => num(v).exists { d => latLe(d); true }
      case sources.LessThanOrEqual("latitude", v) => num(v).exists { d => latLe(d); true }
      case sources.GreaterThan("longitude", v) => num(v).exists { d => lonGe(d); true }
      case sources.GreaterThanOrEqual("longitude", v) => num(v).exists { d => lonGe(d); true }
      case sources.LessThan("longitude", v) => num(v).exists { d => lonLe(d); true }
      case sources.LessThanOrEqual("longitude", v) => num(v).exists { d => lonLe(d); true }
      case sources.EqualTo("latitude", v) => num(v).exists { d => latGe(d); latLe(d); true }
      case sources.EqualTo("longitude", v) => num(v).exists { d => lonGe(d); lonLe(d); true }
      case _ => false
    }
    filters // everything is residual: Spark re-applies the exact predicate
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan = new GridScan(spec, required, bounds)
}

class GridScan(spec: GridSpec, required: StructType, bounds: GridBounds)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-grid pruned=[i ${bounds.iLo}..${bounds.iHi}, j ${bounds.jLo}..${bounds.jHi}]"

  /** Latitude bands as input partitions, clipped to the pushed bounds. */
  override def planInputPartitions(): Array[InputPartition] = {
    val iLo = math.max(0, bounds.iLo)
    val iHi = math.min(spec.nLat, bounds.iHi)
    val nRows = math.max(0, iHi - iLo)
    if (nRows == 0 || bounds.jHi <= bounds.jLo)
      return Array.empty
    val bands = math.min(spec.partitions, nRows).max(1)
    val step = math.ceil(nRows.toDouble / bands).toInt
    (iLo until iHi by step)
      .map(lo => GridInputPartition(lo, math.min(lo + step, iHi)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(spec, required.fieldNames,
      math.max(0, bounds.jLo), math.min(spec.nLon, bounds.jHi))
}

case class GridInputPartition(latLo: Int, latHi: Int) extends InputPartition

class GridReaderFactory(
    spec: GridSpec, cols: Array[String], jLo: Int, jHi: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GridInputPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.latLo
      private var j = jLo - 1
      override def next(): Boolean = {
        j += 1
        if (j >= jHi) { j = jLo; i += 1 }
        i < gp.latHi
      }
      override def get(): InternalRow = {
        val values: Array[Any] = cols.map {
          case "latitude" => spec.latMax - i * spec.res
          case "longitude" => spec.lonMin + j * spec.res
        }
        InternalRow.fromSeq(values.toIndexedSeq)
      }
      override def close(): Unit = ()
    }
  }
}
