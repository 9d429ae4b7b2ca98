package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure-Catalyst geodetic reprojection — the engine image of the
  * reference's `gdalwarp -t_srs EPSG:3857` shell-out
  * (data_pipelines/assets/sentinel/preprocessing.py:82): WGS84 lon/lat →
  * spherical Web Mercator forward and inverse, plus the target-grid
  * pixel snap that turns a reprojected point cloud back into a raster
  * (J8's nearest-grid machinery in the target CRS).
  *
  * Everything is a codegen'd column expression — no UDF, no native GDAL:
  * at 100 TB the transform is a map over the long table, pushed wherever
  * the pixels already live. Formulas are the public EPSG:3857 spherical
  * ones (R = 6378137): x = R·λ, y = R·ln(tan(π/4 + φ/2)). The DuckDB
  * oracle mirrors the exact operand tree; cross-engine libm agreement at
  * the rounded output precision is pinned by the q14 haversine precedent
  * and the q145 gate.
  */
object GeoProject {

  val R: Double = 6378137.0
  private val DegToRad = math.Pi / 180.0

  /** EPSG:3857 forward x (meters east) from degrees longitude. */
  def mercX(lonDeg: Column): Column = lonDeg * lit(DegToRad) * lit(R)

  /** EPSG:3857 forward y (meters north) from degrees latitude
    * (|φ| < 85.06° — the Mercator clip the web grids use).
    */
  def mercY(latDeg: Column): Column =
    log(tan(lit(math.Pi / 4) + latDeg * lit(DegToRad) / 2)) * lit(R)

  /** Inverse: degrees longitude from mercator x. */
  def invLon(x: Column): Column = x / lit(R) / lit(DegToRad)

  /** Inverse: degrees latitude from mercator y. */
  def invLat(y: Column): Column =
    (atan(exp(y / lit(R))) * 2 - lit(math.Pi / 2)) / lit(DegToRad)

  /** Snap a projected coordinate to a pixel index on a regular target
    * grid (gdal-style: floor of the offset in resolution units).
    */
  def snap(c: Column, origin: Double, res: Double): Column =
    floor((c - lit(origin)) / lit(res)).cast("long")

  /** Center coordinate of a snapped pixel index. */
  def center(idx: Column, origin: Double, res: Double): Column =
    lit(origin) + (idx.cast("double") + 0.5) * lit(res)
}
