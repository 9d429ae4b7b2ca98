package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The deforestation per-tile pipeline (SURVEY §3.2;
  * global_forest_watch.py:62-217) composed from GridOps:
  *
  *  - treeloss_per_year: 22 year-masks → block coarsen-sum (A9/R5/R6);
  *  - treeloss_per_basin: rasterized basin assignment (J9) → dense
  *    zero-filled zonal counts (A8) → per-basin first-pixel area
  *    (A7 + P17 haversine) → join with basin attributes (J7).
  */
object DeforestationPipeline {

  /** Great-circle distance in meters (P17;
    * global_forest_watch.py:113-140) as pure column trig.
    */
  def haversineM(lat1: Column, lon1: Column, lat2: Column, lon2: Column): Column = {
    val dLat = radians(lat2 - lat1)
    val dLon = radians(lon2 - lon1)
    val a = pow(sin(dLat / 2), 2) +
      cos(radians(lat1)) * cos(radians(lat2)) * pow(sin(dLon / 2), 2)
    lit(2.0 * 6371000.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
  }

  /** Pixel area in m²: height × width between the half-pixel offsets
    * around the cell center (global_forest_watch.py:125-140).
    */
  def pixelAreaM2(lat: Column, lon: Column, res: Double): Column = {
    val half = res / 2
    val h = haversineM(lat - half, lon, lat + half, lon)
    val w = haversineM(lat, lon - half, lat, lon + half)
    h * w
  }

  /** treeloss_per_year (global_forest_watch.py:62-73): per
    * (year+2000, 200² block) loss-pixel counts.
    */
  def treeLossPerYear(
      lossyear: DataFrame, blockSize: Double = 200,
      yearLo: Int = 1, yearHi: Int = 22): DataFrame =
    GridOps.treeLossPerBlock(lossyear, "x", "y", "lossyear", blockSize, yearLo, yearHi)
      .withColumn("year", col("year") + 2000)

  /** treeloss_per_basin (global_forest_watch.py:151-217): pixels keyed to
    * basins by rasterized assignment; dense (basin × year) zero-filled
    * counts; each basin annotated with its first pixel's area and basin
    * attributes. `basins` columns: (HYBAS_ID, lat_min, lat_max, lon_min,
    * lon_max, basin_area).
    */
  def treeLossPerBasin(
      lossyear: DataFrame, basins: DataFrame,
      latOrigin: Double, lonOrigin: Double, res: Double,
      yearLo: Int = 1, yearHi: Int = 22,
      indexCellSize: Double = 2.0): DataFrame = {
    val boxes = basins.withColumnRenamed("HYBAS_ID", "zone")
    // fine pixels vs large basin boxes → grid-indexed spatial join (the
    // pixel-resolution rasterize of GridOps.zonalAssign would build a
    // dimension as big as the raster here). Basins are disjoint, so no
    // post-join dedupe is needed.
    val px = GridOps.gridIndexedAssign(
      lossyear.withColumnRenamed("y", "latitude").withColumnRenamed("x", "longitude"),
      boxes.select("zone", "lat_min", "lat_max", "lon_min", "lon_max"),
      "zone", indexCellSize)
    // px unfiltered: the zone universe must include basins whose pixels
    // all have lossyear 0 (flox expected_groups semantics); the year
    // filter inside denseZonalCount applies only to the counted rows
    val counts = GridOps.denseZonalCount(
      px, "zone", "lossyear", yearLo, yearHi)
      .withColumnRenamed("lossyear", "year")
      .withColumn("year", col("year") + 2000)
    // A7: deterministic first pixel per basin (min (lat, lon)), P17 area
    val firstCell = px
      .groupBy("zone")
      .agg(min_by(struct(col("latitude"), col("longitude")),
        struct(col("latitude"), col("longitude"))).as("_c"))
      .select(col("zone"),
        pixelAreaM2(col("_c.latitude"), col("_c.longitude"), res)
          .as("first_cell_area"))
    counts
      .join(broadcast(firstCell), Seq("zone"), "left")
      .join(broadcast(boxes.select("zone", "basin_area")), Seq("zone"), "left")
      .withColumnRenamed("zone", "HYBAS_ID")
  }
}
