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

/** DataSource V2 over Zarr stores (graft.sources.zarr, v2 and v3),
  * unpivoting a 2-D `var(lat, lon)` array to long rows
  * `(latitude, longitude, value)` — or a 3-D `var(t, lat, lon)` array
  * (the reference's `dis24(step, lat, lon)` shape, data_generation.py:
  * 28-36) to `(t, latitude, longitude, value)` with `t` taken from the
  * `tvar` coordinate — the xarray→dataframe shape (io_managers.py:
  * 119-129, raster_converter.py:24-37).
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
  /** 3-D variables carry the leading coordinate as `t`. */
  val Schema3: StructType = StructType(
    StructField("t", DoubleType, nullable = false) +: Schema.fields.toSeq)
}

case class ZarrSpec(store: String, varName: String, latVar: String,
    lonVar: String, tVar: String, keepNaN: Boolean)

class ZarrTable(props: Map[String, String]) extends Table with SupportsRead {
  private val spec = ZarrSpec(
    store = props.getOrElse("path", sys.error("graft-zarr: 'path' option required")),
    varName = props.getOrElse("var", sys.error("graft-zarr: 'var' option required")),
    latVar = props.getOrElse("latvar", "lat"),
    lonVar = props.getOrElse("lonvar", "lon"),
    tVar = props.getOrElse("tvar", "time"),
    keepNaN = props.getOrElse("keepnan", "false").toBoolean)
  override def name(): String = s"graft_zarr(${spec.store}#${spec.varName})"
  // schema depends on the variable's rank — one metadata read at planning
  override def schema(): StructType = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val meta = ZarrStore.readMeta(conf, s"${spec.store}/${spec.varName}")
    meta.shape.length match {
      case 2 => ZarrDataSource.Schema
      case 3 => ZarrDataSource.Schema3
      case n => sys.error(s"${spec.varName}: $n-D arrays unsupported (need 2 or 3)")
    }
  }
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ZarrScanBuilder(spec, schema())
}

class ZarrScanBuilder(spec: ZarrSpec, full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var latLo = Double.NegativeInfinity
  private var latHi = Double.PositiveInfinity
  private var tLo = Double.NegativeInfinity
  private var tHi = Double.PositiveInfinity
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
      case sources.GreaterThan("t", v) => num(v).exists { d => tLo = math.max(tLo, d); true }
      case sources.GreaterThanOrEqual("t", v) => num(v).exists { d => tLo = math.max(tLo, d); true }
      case sources.LessThan("t", v) => num(v).exists { d => tHi = math.min(tHi, d); true }
      case sources.LessThanOrEqual("t", v) => num(v).exists { d => tHi = math.min(tHi, d); true }
      case sources.EqualTo("t", v) =>
        num(v).exists { d => tLo = math.max(tLo, d); tHi = math.min(tHi, d); true }
      case _ => false
    }
    filters
  }

  override def pushedFilters(): Array[sources.Filter] = accepted

  override def build(): Scan =
    new ZarrScan(spec, required, latLo, latHi, tLo, tHi)
}

class ZarrScan(spec: ZarrSpec, required: StructType,
    latLo: Double, latHi: Double, tLo: Double, tHi: Double)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def description(): String = s"graft-zarr ${spec.store}#${spec.varName}"

  override def planInputPartitions(): Array[InputPartition] = {
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val meta = ZarrStore.readMeta(conf, s"${spec.store}/${spec.varName}")
    val is3 = meta.shape.length == 3
    require(meta.shape.length == 2 || is3,
      s"${spec.varName} must be 2-D (lat, lon) or 3-D (t, lat, lon)")
    val latDim = if (is3) 1 else 0
    val lonDim = latDim + 1
    val lats = ZarrStore.readVector(conf, s"${spec.store}/${spec.latVar}")
    val nChunkT = if (is3) (meta.shape(0) + meta.chunks(0) - 1) / meta.chunks(0) else 1
    val nChunkRows = (meta.shape(latDim) + meta.chunks(latDim) - 1) / meta.chunks(latDim)
    val nChunkCols = (meta.shape(lonDim) + meta.chunks(lonDim) - 1) / meta.chunks(lonDim)
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
          cr => cr * meta.chunks(latDim) <= hi &&
            (cr + 1) * meta.chunks(latDim) - 1 >= lo
        }
      }
    // t-plane pruning mirrors the latitude logic (chunk slack, residual)
    val keepT: Int => Boolean =
      if (!is3 || (!tLo.isFinite && !tHi.isFinite)) _ => true
      else {
        val ts = ZarrStore.readVector(conf, s"${spec.store}/${spec.tVar}")
        val idx = ts.indices.filter(i => ts(i) >= tLo && ts(i) <= tHi)
        if (idx.isEmpty) _ => false
        else {
          val lo = math.max(idx.min - 1, 0)
          val hi = math.min(idx.max + 1, ts.length - 1)
          ct => ct * meta.chunks(0) <= hi && (ct + 1) * meta.chunks(0) - 1 >= lo
        }
      }
    (for {
      ct <- 0 until nChunkT
      if keepT(ct)
      cr <- 0 until nChunkRows
      if keepRow(cr)
      cc <- 0 until nChunkCols
    } yield (if (is3) ZarrInputPartition(Seq(ct, cr, cc))
      else ZarrInputPartition(Seq(cr, cc))): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ZarrReaderFactory(spec, required.fieldNames,
      new SerializableConfiguration(org.apache.spark.sql.SparkSession.active
        .sparkContext.hadoopConfiguration))
}

case class ZarrInputPartition(chunkIdx: Seq[Int]) extends InputPartition

class ZarrReaderFactory(spec: ZarrSpec, cols: Array[String],
    conf: SerializableConfiguration) extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[ZarrInputPartition]
    new PartitionReader[InternalRow] {
      private val hconf = conf.value
      private val arrayDir = s"${spec.store}/${spec.varName}"
      private val meta = ZarrStore.readMeta(hconf, arrayDir)
      private val is3 = meta.shape.length == 3
      private val latDim = if (is3) 1 else 0
      private val lats = ZarrStore.readVector(hconf, s"${spec.store}/${spec.latVar}")
      private val lons = ZarrStore.readVector(hconf, s"${spec.store}/${spec.lonVar}")
      private val ts: Array[Double] =
        if (is3) ZarrStore.readVector(hconf, s"${spec.store}/${spec.tVar}")
        else null
      private val chunk = ZarrStore.readChunk(hconf, arrayDir, meta, part.chunkIdx)
      private val tLo = if (is3) part.chunkIdx(0) * meta.chunks(0) else 0
      private val rowLo = part.chunkIdx(latDim) * meta.chunks(latDim)
      private val colLo = part.chunkIdx(latDim + 1) * meta.chunks(latDim + 1)
      private val tClip =
        if (is3) math.min(meta.chunks(0), meta.shape(0) - tLo) else 1
      private val hClip = math.min(meta.chunks(latDim),
        meta.shape(latDim) - rowLo)
      private val wClip = math.min(meta.chunks(latDim + 1),
        meta.shape(latDim + 1) - colLo)
      // chunk-local flat offset of clipped index k (row-major, with the
      // chunk's own (possibly larger-than-clip) extents)
      private def off(k: Int): Int = {
        val c = k % wClip
        val r = (k / wClip) % hClip
        val t = k / (wClip * hClip)
        (t * meta.chunks(latDim) + r) * meta.chunks(latDim + 1) + c
      }
      private val total = tClip * hClip * wClip
      private var k = -1

      override def next(): Boolean = {
        k += 1
        if (!spec.keepNaN) {
          while (k < total && chunk(off(k)).isNaN) k += 1
        }
        k < total
      }

      override def get(): InternalRow = {
        val c = k % wClip
        val r = (k / wClip) % hClip
        val t = k / (wClip * hClip)
        InternalRow.fromSeq(cols.toIndexedSeq.map {
          case "t" => ts(tLo + t)
          case "latitude" => lats(rowLo + r)
          case "longitude" => lons(colLo + c)
          case "value" => chunk(off(k))
        })
      }

      override def close(): Unit = ()
    }
  }
}
