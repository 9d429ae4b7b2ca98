package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Raster ingestion contract (S3–S6): GRIB/NetCDF/COG/Zarr rasters enter
  * the engine as LONG parquet tables — one row per coordinate tuple —
  * produced by an out-of-engine converter (the reference itself unpivots
  * every raster before analytics, raster_converter.py:24-77; binary codec
  * plumbing is not query semantics, SURVEY §2.1).
  *
  * This object pins the column contract and provides the in-engine dense
  * generator (R1): a distributed `range × sequence`-explode that builds a
  * grid without ever collecting coordinates to the driver.
  */
object RasterContract {

  /** GRIB discharge ensemble (io_managers.py:193-210): dims
    * (number, step, latitude, longitude) + measure dis24.
    */
  val DischargeSchema: StructType = StructType(Seq(
    StructField("number", IntegerType, nullable = false),
    StructField("step", IntegerType, nullable = false),
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("time", TimestampType, nullable = true),
    StructField("valid_time", TimestampType, nullable = true),
    StructField("dis24", DoubleType, nullable = true)))

  /** NetCDF upstream-area grid (upstream.py:32-48). */
  val UpareaSchema: StructType = StructType(Seq(
    StructField("latitude", DoubleType, nullable = false),
    StructField("longitude", DoubleType, nullable = false),
    StructField("uparea", DoubleType, nullable = true)))

  /** COG/GeoTIFF band raster, unpivoted (global_forest_watch.py:66,156). */
  val LossyearSchema: StructType = StructType(Seq(
    StructField("x", DoubleType, nullable = false),
    StructField("y", DoubleType, nullable = false),
    StructField("lossyear", IntegerType, nullable = false)))

  /** Dense regular grid, generated distributed (R1): nLat×nLon cells with
    * `latitude` DESCENDING from latMax (GloFAS grids store latitude
    * descending — SURVEY P3) and longitude ascending from lonMin. The
    * lat dimension parallelizes via spark.range; the lon dimension
    * explodes per row — no driver-side coordinate materialization.
    */
  def denseGrid(
      spark: SparkSession,
      latMax: Double, lonMin: Double, res: Double,
      nLat: Int, nLon: Int): DataFrame =
    spark.range(nLat)
      .select(
        (lit(latMax) - col("id") * res).as("latitude"),
        explode(sequence(lit(0), lit(nLon - 1))).as("j"))
      .select(col("latitude"), (lit(lonMin) + col("j") * res).as("longitude"))

  /** cf+pf ensemble concat (S3; io_managers.py:205-208): the control
    * member is renumbered to 0 and unioned with the perturbed members.
    */
  def concatEnsemble(cf: DataFrame, pf: DataFrame): DataFrame =
    cf.withColumn("number", lit(0)).unionByName(pf)

  /** NaN → null normalization at the ingest boundary (SURVEY §7.4.2):
    * Spark distinguishes NaN from null; pandas conflates them. All
    * converters must emit null, and in-engine generators apply this to
    * every double measure.
    */
  def nanToNull(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (d, c) =>
      d.withColumn(c, when(isnan(col(c)), lit(null)).otherwise(col(c)))
    }
}
