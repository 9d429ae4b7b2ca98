package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid/raster-as-long-table operators (SURVEY §2.8): nearest-grid
  * alignment, upstream-area masking, block coarsening, dense zonal counts.
  *
  * A raster here IS its unpivoted long table — one row per coordinate
  * tuple (the reference converts to exactly that form before every
  * relational step, raster_converter.py:24-77).
  */
object GridOps {

  /** Integer grid index of a coordinate on a regular grid: the robust
    * float-key normalization of SURVEY §7.4.5 (micro-degree style keys).
    */
  def gridIndex(c: Column, origin: Double, res: Double): Column =
    round((c - origin) / res).cast("long")

  /** Z-order (Morton) key of a grid cell: interleaves the low `bits`
    * bits of the two indices, so 2-D-close cells are 1-D-close in the
    * key. This is the LAYOUT primitive for grid tables at 100 TB: sort /
    * range-partition the table by this key and a bbox query touches a
    * handful of contiguous key ranges (→ file/partition pruning by
    * min-max stats) instead of one row-major stripe per grid row.
    * Pure shifts and ors — ANSI-safe, codegen'd.
    *
    * Indices must be NON-NEGATIVE and fit in `bits` bits (shift-based
    * interleaving reads sign bits as data otherwise) — offset
    * [[gridIndex]] outputs by the grid minimum first.
    */
  def mortonKey(i: Column, j: Column, bits: Int = 16): Column =
    (0 until bits).map { b =>
      shiftleft(shiftright(i, b).bitwiseAND(1L), 2 * b)
        .bitwiseOR(shiftleft(shiftright(j, b).bitwiseAND(1L), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))

  /** Nearest-neighbor grid alignment (J8; filter_by_upstream.py:63-67
    * `reindex(method="nearest")`): because both sides live on regular
    * grids, nearest-alignment is an equi-join on the snapped integer grid
    * index — no range join, no custom physical operator, shuffle on
    * compact long keys. `right` must carry `latitude`/`longitude` on the
    * grid implied by (origin, res).
    */
  def nearestGridJoin(
      left: DataFrame,
      right: DataFrame,
      latOrigin: Double, lonOrigin: Double, res: Double,
      rightCols: Seq[String],
      broadcastRight: Boolean = true): DataFrame = {
    val l = left
      .withColumn("_gi", gridIndex(col("latitude"), latOrigin, res))
      .withColumn("_gj", gridIndex(col("longitude"), lonOrigin, res))
    val r0 = right
      .withColumn("_gi", gridIndex(col("latitude"), latOrigin, res))
      .withColumn("_gj", gridIndex(col("longitude"), lonOrigin, res))
      .select((Seq("_gi", "_gj") ++ rightCols).map(col): _*)
    val r = if (broadcastRight) broadcast(r0) else r0
    l.join(r, Seq("_gi", "_gj"), "left").drop("_gi", "_gj")
  }

  /** Upstream-area mask + drop (P19+P7; filter_by_upstream.py:69-71):
    * keep dis24 only where the aligned upstream area clears the threshold,
    * then drop masked rows (pandas NaN → dropped).
    */
  def filterByUpstream(
      discharge: DataFrame,
      uparea: DataFrame,
      latOrigin: Double, lonOrigin: Double, res: Double,
      threshold: Double = 250e6): DataFrame =
    nearestGridJoin(discharge, uparea, latOrigin, lonOrigin, res, Seq("uparea"))
      .withColumn("dis24", when(col("uparea") >= threshold, col("dis24")))
      .na.drop(Seq("dis24"))
      .drop("uparea")

  /** Raster coarsen by block-sum (A9/R5; global_forest_watch.py:66-72):
    * groupBy integer block indices. The reference's 22-year mask stack
    * (R6) is `explode(sequence(...))` + a mask flag.
    */
  def coarsenSum(
      df: DataFrame,
      xCol: String, yCol: String, valueCol: String,
      blockSize: Double): DataFrame =
    df.groupBy(
      floor(col(xCol) / blockSize).cast("long").as("block_x"),
      floor(col(yCol) / blockSize).cast("long").as("block_y"))
      .agg(sum(col(valueCol)).as(s"sum_$valueCol"))

  /** 2× cubic-convolution downsample of an integer pixel grid — the
    * non-mean pyramid kernel (reference image:
    * sentinel/postprocessing.py:69-71, `gdal_retile.py -r cubic`).
    * Keys (1981) a = −1/2 cubic evaluated at the dyadic offsets: each
    * target pixel is the 4×4 source window at distances {1.5, 0.5, 0.5,
    * 1.5}, so the separable axis weights are exactly
    * [−1/16, 9/16, 9/16, −1/16] and the 2-D weight of tap (i, j) is
    * c(i)·c(j)/256 with c ∈ {−1, 9}. Borders replicate (edge clamp).
    *
    * Returned per target pixel: `num` = Σ c(i)c(j)·v over PRESENT taps
    * plus `nodata`·(256 − Σ c(i)c(j)) for absent ones — an EXACT integer
    * (|num| ≤ 256·|v|max + slack, far under 2^53), so `num / 256.0` is
    * an exact IEEE double and any engine reproduces it bit-for-bit at
    * any summation order. Callers wanting integer pixels round half-up
    * as floorDiv(num + 128, 256) and clamp to the sample range (the
    * TiffWriter `resampling = "cubic"` contract).
    *
    * Plan shape: pad-replication is a ≤2-row/col fringe union, then ONE
    * contribution explode (each source feeds exactly 2 targets per axis
    * = 4 rows) and ONE groupBy on the target key with map-side partial
    * aggregation — shuffle bounded by 4× the SOURCE pixel count, no
    * window, no self-join, dense or sparse alike.
    */
  def cubicDownsample2x(
      df: DataFrame,
      xCol: String, yCol: String, valueCol: String,
      width: Int, height: Int, nodata: Int = 0): DataFrame = {
    val wOut = (width + 1) / 2
    val hOut = (height + 1) / 2
    // border replication: a pixel on an edge also covers the 2 virtual
    // pads beyond it (corners via the cross product)
    def padded(c: Column, max: Int): Column =
      when(c === 0 && lit(max) === 0,
          array(lit(-2), lit(-1), c, lit(max + 1), lit(max + 2)))
        .when(c === 0, array(lit(-2), lit(-1), c))
        .when(c === max, array(c, lit(max + 1), lit(max + 2)))
        .otherwise(array(c))
    // vx = 2k   → targets (k−1, c=−1), (k, c=9)
    // vx = 2k+1 → targets (k, c=9), (k+1, c=−1)
    def taps(v: Column): Column = {
      val par = pmod(v, lit(2))
      val k = ((v - par) / 2).cast("int")
      when(par === 0, array(
        struct((k - 1).as("t"), lit(-1L).as("c")),
        struct(k.as("t"), lit(9L).as("c"))))
        .otherwise(array(
          struct(k.as("t"), lit(9L).as("c")),
          struct((k + 1).as("t"), lit(-1L).as("c"))))
    }
    df.select(col(xCol).cast("int").as("_px"), col(yCol).cast("int").as("_py"),
        col(valueCol).cast("long").as("_v"))
      .select(explode(padded(col("_px"), width - 1)).as("_vx"),
        col("_py"), col("_v"))
      .select(col("_vx"), explode(padded(col("_py"), height - 1)).as("_vy"),
        col("_v"))
      .select(explode(taps(col("_vx"))).as("_tx"), col("_vy"), col("_v"))
      .select(col("_tx"), explode(taps(col("_vy"))).as("_ty"), col("_v"))
      .filter(col("_tx.t") >= 0 && col("_tx.t") < wOut &&
        col("_ty.t") >= 0 && col("_ty.t") < hOut)
      .groupBy(col("_tx.t").as(xCol), col("_ty.t").as(yCol))
      .agg(
        (sum(col("_tx.c") * col("_ty.c") * col("_v")) +
          lit(nodata.toLong) * (lit(256L) - sum(col("_tx.c") * col("_ty.c"))))
          .as("num"))
  }

  /** Year-mask stack + coarsen (global_forest_watch.py:66-72): one output
    * row per (block, year in [yearLo, yearHi]) with the count of pixels
    * whose lossyear equals that year — the explode happens only on the
    * small year range, not on data volume.
    */
  def treeLossPerBlock(
      lossyear: DataFrame,
      xCol: String, yCol: String, lossCol: String,
      blockSize: Double, yearLo: Int, yearHi: Int): DataFrame =
    lossyear
      .withColumn("year", explode(sequence(lit(yearLo), lit(yearHi))))
      .withColumn("mask", (col(lossCol) === col("year")).cast("long"))
      .groupBy(
        col("year"),
        floor(col(xCol) / blockSize).cast("long").as("block_x"),
        floor(col(yCol) / blockSize).cast("long").as("block_y"))
      .agg(sum("mask").as("loss_count"))

  /** Dense zonal count (A8; global_forest_watch.py:200-206 flox
    * xarray_reduce with expected_groups): counts over the FULL
    * zone × year cross product, zero-filled where empty.
    */
  def denseZonalCount(
      pixels: DataFrame,
      zoneCol: String,
      yearCol: String,
      yearLo: Int, yearHi: Int): DataFrame = {
    val zones = pixels.select(zoneCol).distinct()
    val years = org.apache.spark.sql.SparkSession.active
      .range(yearLo, yearHi + 1L)
      .select(col("id").cast("int").as(yearCol))
    val universe = zones.crossJoin(broadcast(years))
    val counts = pixels
      .filter(col(yearCol).between(yearLo, yearHi))
      .groupBy(zoneCol, yearCol)
      .agg(count(lit(1)).as("cnt"))
    universe.join(counts, Seq(zoneCol, yearCol), "left")
      .select(col(zoneCol), col(yearCol),
        coalesce(col("cnt"), lit(0L)).as("tree_loss_incidents"))
  }

  /** Nodata-tile drop (P20; preprocessing.py:150-156 `np.all(band ==
    * nodata)`): a tile whose every pixel equals the nodata sentinel is
    * removed — aggregate `every` per tile, anti-join survivors.
    */
  def dropNodataTiles(
      pixels: DataFrame, tileCol: String, valueCol: String,
      nodata: Double): DataFrame = {
    val allNodata = pixels.groupBy(tileCol)
      .agg(every(col(valueCol) === nodata).as("all_nodata"))
      .filter(col("all_nodata"))
      .select(tileCol)
    pixels.join(allNodata, Seq(tileCol), "left_anti")
  }

  /** Rasterize box polygons onto a regular grid (J9/R7; the geocube step
    * global_forest_watch.py:76-95): each zone box explodes into the grid
    * cells it covers → a (cell_i, cell_j) → zone dimension table. Zonal
    * assignment is then an EQUI-join of pixels on the snapped cell index
    * (shuffle on compact longs), never a point-in-polygon scan of the
    * fact table. `boxes` columns: (zoneCol, lat_min, lat_max, lon_min,
    * lon_max); cells assign by cell-center containment, ties to the
    * lowest zone id.
    */
  def rasterizeBoxes(
      boxes: DataFrame, zoneCol: String,
      latOrigin: Double, lonOrigin: Double, res: Double): DataFrame = {
    // cells whose CENTER (origin + k*res) lies inside [min, max], with a
    // 1e-9 tolerance so exact-boundary centers are included symmetrically
    def idxLow(c: Column, origin: Double): Column =
      ceil((c - origin) / res - 1e-9).cast("long")
    def idxHigh(c: Column, origin: Double): Column =
      floor((c - origin) / res + 1e-9).cast("long")
    boxes
      .withColumn("_gi", explode(sequence(
        idxLow(col("lat_min"), latOrigin), idxHigh(col("lat_max"), latOrigin))))
      .withColumn("_gj", explode(sequence(
        idxLow(col("lon_min"), lonOrigin), idxHigh(col("lon_max"), lonOrigin))))
      .groupBy("_gi", "_gj")
      .agg(min(col(zoneCol)).as(zoneCol))
  }

  /** Grid-indexed spatial join (J9 at fine pixel resolution): when boxes
    * are LARGE relative to pixels, rasterizing at pixel resolution would
    * materialize a dimension as big as the raster. Instead: index boxes
    * onto a COARSE grid of `cellSize` (each box explodes into the few
    * coarse cells it overlaps — pick cellSize near the typical box size),
    * broadcast that candidate list, equi-join pixels on their coarse cell
    * and filter exact containment. Cost: one pass over pixels × avg
    * candidates per coarse cell (~1–4), no O(pixels × boxes) stage.
    * Overlapping boxes produce one row per containing box — callers with
    * overlap dedupe on a point key.
    */
  def gridIndexedAssign(
      points: DataFrame, boxes: DataFrame, zoneCol: String,
      cellSize: Double): DataFrame = {
    val cand = boxes
      .withColumn("_ci", explode(sequence(
        floor(col("lat_min") / cellSize), floor(col("lat_max") / cellSize))))
      .withColumn("_cj", explode(sequence(
        floor(col("lon_min") / cellSize), floor(col("lon_max") / cellSize))))
    points
      .withColumn("_ci", floor(col("latitude") / cellSize).cast("long"))
      .withColumn("_cj", floor(col("longitude") / cellSize).cast("long"))
      .join(broadcast(cand), Seq("_ci", "_cj"))
      .filter(col("latitude").between(col("lat_min"), col("lat_max")) &&
        col("longitude").between(col("lon_min"), col("lon_max")))
      .drop("_ci", "_cj", "lat_min", "lat_max", "lon_min", "lon_max")
  }

  /** Arbitrary-POLYGON zonal assignment (J9/R7 for real basin shapes;
    * global_forest_watch.py:76-95, hydrobasins.py:79-99): the reference's
    * HydroSHEDS basins are concave polygons, not boxes. Same scale shape
    * as [[gridIndexedAssign]] — polygons explode into the coarse cells
    * their ENVELOPE overlaps (pick cellSize near the typical polygon
    * size), that candidate list broadcasts, points equi-join on their
    * coarse cell — then exact containment is the division-free ray-cast
    * kernel [[graft.functions.PointInPolygon]] on the packed vertex
    * arrays. Cost: one pass over points × avg candidate polygons per
    * coarse cell; never O(points × polygons), never a cartesian.
    *
    * `polys` columns: (zoneCol, xs: array<double> lon vertices,
    * ys: array<double> lat vertices), one row per ring (holes = callers
    * subtract hole containment); points carry latitude/longitude.
    */
  def polygonZonalAssign(
      points: DataFrame, polys: DataFrame, zoneCol: String,
      cellSize: Double): DataFrame = {
    val cand = polys
      .withColumn("_lat_min", array_min(col("ys")))
      .withColumn("_lat_max", array_max(col("ys")))
      .withColumn("_lon_min", array_min(col("xs")))
      .withColumn("_lon_max", array_max(col("xs")))
      .withColumn("_ci", explode(sequence(
        floor(col("_lat_min") / cellSize), floor(col("_lat_max") / cellSize))))
      .withColumn("_cj", explode(sequence(
        floor(col("_lon_min") / cellSize), floor(col("_lon_max") / cellSize))))
    points
      .withColumn("_ci", floor(col("latitude") / cellSize).cast("long"))
      .withColumn("_cj", floor(col("longitude") / cellSize).cast("long"))
      .join(broadcast(cand), Seq("_ci", "_cj"))
      // envelope prefilter is cheap scalar compares; the ray-cast loop
      // only runs on rows that survive it
      .filter(col("latitude").between(col("_lat_min"), col("_lat_max")) &&
        col("longitude").between(col("_lon_min"), col("_lon_max")))
      .filter(graft.functions.PointInPolygon(
        col("longitude"), col("latitude"), col("xs"), col("ys")))
      .drop("_ci", "_cj", "_lat_min", "_lat_max", "_lon_min", "_lon_max",
        "xs", "ys")
  }

  /** Zonal assignment (J9): pixels ⋈ rasterized zone dimension on the
    * snapped cell index.
    */
  def zonalAssign(
      pixels: DataFrame, boxes: DataFrame, zoneCol: String,
      latOrigin: Double, lonOrigin: Double, res: Double): DataFrame = {
    val cells = broadcast(rasterizeBoxes(boxes, zoneCol, latOrigin, lonOrigin, res))
    pixels
      .withColumn("_gi", gridIndex(col("latitude"), latOrigin, res))
      .withColumn("_gj", gridIndex(col("longitude"), lonOrigin, res))
      .join(cells, Seq("_gi", "_gj"), "inner")
      .drop("_gi", "_gj")
  }
}
