package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
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

class GridScanBuilder(spec: GridSpec)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GridDataSource.Schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new GridScan(spec, required)
}

class GridScan(spec: GridSpec, required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Latitude bands as input partitions. */
  override def planInputPartitions(): Array[InputPartition] = {
    val bands = math.min(spec.partitions, spec.nLat).max(1)
    val step = math.ceil(spec.nLat.toDouble / bands).toInt
    (0 until spec.nLat by step)
      .map(lo => GridInputPartition(lo, math.min(lo + step, spec.nLat)))
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new GridReaderFactory(spec, required.fieldNames)
}

case class GridInputPartition(latLo: Int, latHi: Int) extends InputPartition

class GridReaderFactory(spec: GridSpec, cols: Array[String])
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val gp = p.asInstanceOf[GridInputPartition]
    new PartitionReader[InternalRow] {
      private var i = gp.latLo
      private var j = -1
      override def next(): Boolean = {
        j += 1
        if (j >= spec.nLon) { j = 0; i += 1 }
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
