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
import org.apache.spark.util.SerializableConfiguration

import graft.sources.zarr.ZarrStore

/** DataSource V2 over Zarr v2 stores (graft.sources.zarr), unpivoting a
  * 2-D `var(lat, lon)` array to long rows `(latitude, longitude, value)`
  * — the reference's xarray→dataframe shape (io_managers.py:119-129,
  * raster_converter.py:24-37).
  *
  * Scale design: zarr's CHUNK layout exists precisely for parallel IO —
  * one InputPartition per chunk; each task reads + inflates exactly its
  * chunk file (one object GET at cluster scale). Latitude range
  * predicates prune whole chunk ROWS at planning from the (tiny)
  * coordinate vector; every filter stays residual. NaN fills are
  * dropped at the scan (the converter contract's NaN→absent rule).
  */
class ZarrDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-zarr"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ZarrDataSource.Schema
  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new ZarrTable(properties.asScala.toMap)
}

object ZarrDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("value", DoubleType, nullable = false)))
}

case class ZarrSpec(store: String, varName: String, latVar: String,
    lonVar: String, keepNaN: Boolean)

class ZarrTable(props: Map[String, String]) extends Table with SupportsRead {
  private val spec = ZarrSpec(
    store = props.getOrElse("path", sys.error("graft-zarr: 'path' option required")),
    varName = props.getOrElse("var", sys.error("graft-zarr: 'var' option required")),
    latVar = props.getOrElse("latvar", "lat"),
    lonVar = props.getOrElse("lonvar", "lon"),
    keepNaN = props.getOrElse("keepnan", "false").toBoolean)
  override def name(): String = s"graft_zarr(${spec.store}#${spec.varName})"
  override def schema(): StructType = ZarrDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(spec)
}

class ZarrScanBuilder(spec: ZarrSpec)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = ZarrDataSource.Schema
  private var latLo = Double.NegativeInfinity
  private var latHi = Double.PositiveInfinity
  private var accepted: Array[sources.Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

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
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan = new ZarrScan(spec, required, latLo, latHi)
}

class ZarrScan(spec: ZarrSpec, required: StructType,
    latLo: Double, latHi: Double)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = s"graft-zarr ${spec.store}#${spec.varName}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val meta = ZarrStore.readMeta(conf, s"${spec.store}/${spec.varName}")
    require(meta.shape.length == 2, s"${spec.varName} must be 2-D (lat, lon)")
    val lats = ZarrStore.readVector(conf, s"${spec.store}/${spec.latVar}")
    val nChunkRows = (meta.shape(0) + meta.chunks(0) - 1) / meta.chunks(0)
    val nChunkCols = (meta.shape(1) + meta.chunks(1) - 1) / meta.chunks(1)
    // chunk-row pruning from the coordinate vector (with one whole row
    // of slack each side — magnitude-safe; filters are residual)
    val keepRow: Int => Boolean =
      if (!latLo.isFinite && !latHi.isFinite) _ => true
      else {
        val idx = lats.indices.filter(i => lats(i) >= latLo && lats(i) <= latHi)
        if (idx.isEmpty) _ => false
        else {
          val lo = math.max(idx.min - 1, 0)
          val hi = math.min(idx.max + 1, lats.length - 1)
          cr => cr * meta.chunks(0) <= hi && (cr + 1) * meta.chunks(0) - 1 >= lo
        }
      }
    (for {
      cr <- 0 until nChunkRows
      if keepRow(cr)
      cc <- 0 until nChunkCols
    } yield ZarrInputPartition(cr, cc): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(spec, required.fieldNames,
      new SerializableConfiguration(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))
}

case class ZarrInputPartition(chunkRow: Int, chunkCol: Int) extends InputPartition

class ZarrReaderFactory(spec: ZarrSpec, cols: Array[String],
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ZarrInputPartition]
    new PartitionReader[InternalRow] {
      private val hconf = conf.value
      private val arrayDir = s"${spec.store}/${spec.varName}"
      private val meta = ZarrStore.readMeta(hconf, arrayDir)
      private val lats = ZarrStore.readVector(hconf, s"${spec.store}/${spec.latVar}")
      private val lons = ZarrStore.readVector(hconf, s"${spec.store}/${spec.lonVar}")
      private val chunk = ZarrStore.readChunk(hconf, arrayDir, meta,
        Seq(part.chunkRow, part.chunkCol))
      private val rowLo = part.chunkRow * meta.chunks(0)
      private val colLo = part.chunkCol * meta.chunks(1)
      private val hClip = math.min(meta.chunks(0), meta.shape(0) - rowLo)
      private val wClip = math.min(meta.chunks(1), meta.shape(1) - colLo)
      private var k = -1

      override def next(): Boolean = {
        k += 1
        if (!spec.keepNaN) {
          while (k < wClip * hClip &&
              chunk((k / wClip) * meta.chunks(1) + (k % wClip)).isNaN)
            k += 1
        }
        k < wClip * hClip
      }

      override def get(): InternalRow = {
        val r = k / wClip
        val c = k % wClip
        InternalRow.fromSeq(cols.toIndexedSeq.map {
          case "latitude" => lats(rowLo + r)
          case "longitude" => lons(colLo + c)
          case "value" => chunk(r * meta.chunks(1) + c)
        })
      }

      override def close(): Unit = ()
    }
  }
}
