package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{Sql, Tables}
import graft.operators.{FloodOps, FloodPipeline, GridOps}

/** The flood/grid operator library exercised through the driver's DuckDB
  * gate: a deterministic synthetic forecast grid is derived from the
  * lineitem/part/orders tables (same construction on both engines), then
  * the REAL graft operators run on it and the oracle replays the
  * semantics in SQL.
  */
object FloodQueries {

  /** The closed synthetic cell lattice both the forecast construction
    * and the threshold dimension draw from: a forecast cell is
    * (partkey % LatCells, suppkey % LonCells) scaled by CellSize, so a
    * LatCells x LonCells threshold lattice covers every reachable cell
    * (ThresholdCoverageSpec pins this — if the construction drifts, the
    * LEFT join in thresholdPercentages would silently null thresholds).
    */
  private[queries] val LatCells = 50
  private[queries] val LonCells = 40
  private[queries] val CellSize = 0.5

  /** Synthetic ensemble forecast derived from lineitem (shared with the
    * oracle CTE below; keep in sync).
    */
  private[queries] def syntheticForecast(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem").select(
      col("l_linenumber").as("number"),
      ((col("l_partkey") % LatCells) * CellSize).as("latitude"),
      ((col("l_suppkey") % LonCells) * CellSize).as("longitude"),
      lit("2023-10-01").cast("date").as("issued_on"),
      ((col("l_orderkey") % 5) + 1).cast("int").as("step"),
      expr("date_add(DATE'2023-10-01', CAST(l_orderkey % 5 AS INT) + 1)")
        .as("valid_for"),
      col("l_quantity").as("dis24"))

  /** Threshold dimension generated directly over the closed 50×40 cell
    * lattice the forecast's (partkey%50, suppkey%40) construction can
    * reach — no second fact-table scan, no distinct shuffle. Output-
    * identical to `SELECT DISTINCT lat, lon FROM forecast` under the
    * LEFT join (extra unmatched dim rows never surface; every forecast
    * cell is in the lattice by construction), and truer to the
    * reference, where thresholds are an independent small table
    * (rp_thresholds.py), not an aggregate of the forecast.
    */
  private[queries] def syntheticThresholds(s: SparkSession): DataFrame = {
    s.range(LatCells.toLong * LonCells).select(
      ((col("id") % LatCells) * CellSize).as("latitude"),
      (expr(s"id div $LatCells") * CellSize).as("longitude"))
      .withColumn("threshold_2y", lit(20.0) + col("latitude") * 0.1)
      .withColumn("threshold_5y", lit(35.0) + col("longitude") * 0.1)
      .withColumn("threshold_20y", lit(48.0) + col("latitude") * 0.05)
  }

  private val forecastCte = """
    forecast AS (
      SELECT l_linenumber AS number,
             (l_partkey % 50) * 0.5 AS latitude,
             (l_suppkey % 40) * 0.5 AS longitude,
             DATE '2023-10-01' AS issued_on,
             CAST(l_orderkey % 5 AS INTEGER) + 1 AS step,
             DATE '2023-10-01' + (CAST(l_orderkey % 5 AS INTEGER) + 1) AS valid_for,
             l_quantity AS dis24
      FROM lineitem),
    thresholds AS (
      SELECT DISTINCT latitude, longitude,
             20.0 + latitude * 0.1 AS threshold_2y,
             35.0 + longitude * 0.1 AS threshold_5y,
             48.0 + latitude * 0.05 AS threshold_20y
      FROM forecast),
    joined AS (
      SELECT f.*, t.threshold_2y, t.threshold_5y, t.threshold_20y
      FROM forecast f LEFT JOIN thresholds t USING (latitude, longitude)),
    detailed AS (
      SELECT latitude, longitude, issued_on, valid_for, step,
             min(dis24) AS min_dis,
             quantile_cont(dis24, 0.25) AS q1_dis,
             quantile_cont(dis24, 0.5) AS median_dis,
             quantile_cont(dis24, 0.75) AS q3_dis,
             max(dis24) AS max_dis,
             CAST(sum(CASE WHEN dis24 >= threshold_2y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_2y,
             CAST(sum(CASE WHEN dis24 >= threshold_5y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_5y,
             CAST(sum(CASE WHEN dis24 >= threshold_20y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_20y
      FROM joined GROUP BY 1, 2, 3, 4, 5)"""

  /** A1+J1+P9: the reference's most load-bearing query
    * (compute_flood_threshold_percentages, transforms.py:13-76) on the
    * synthetic grid, oracle-checked.
    */
  val q60FloodDetailed = Q(
    "q60_flood_detailed",
    (s, dir) => {
      val fc = syntheticForecast(s, dir)
      FloodOps.thresholdPercentages(fc, syntheticThresholds(s))
        .select(col("latitude"), col("longitude"), col("issued_on"),
          col("valid_for"), col("step"),
          col("min_dis"),
          round(col("q1_dis"), 6).as("q1_dis"),
          round(col("median_dis"), 6).as("median_dis"),
          round(col("q3_dis"), 6).as("q3_dis"),
          col("max_dis"),
          round(col("p_above_2y"), 6).as("p_above_2y"),
          round(col("p_above_5y"), 6).as("p_above_5y"),
          round(col("p_above_20y"), 6).as("p_above_20y"))
    },
    Some(s"""
      WITH $forecastCte
      SELECT latitude, longitude, issued_on, valid_for, step,
             min_dis,
             round(q1_dis, 6) AS q1_dis,
             round(median_dis, 6) AS median_dis,
             round(q3_dis, 6) AS q3_dis,
             max_dis,
             round(p_above_2y, 6) AS p_above_2y,
             round(p_above_5y, 6) AS p_above_5y,
             round(p_above_20y, 6) AS p_above_20y
      FROM detailed"""),
    headline = true)

  private def wktSql(c: String): String = {
    val full = s"CAST(CAST(round($c, 3) AS DECIMAL(12,3)) AS VARCHAR)"
    s"regexp_replace(regexp_replace($full, '(\\.[0-9]*[1-9])0+$$', '\\1'), '\\.0+$$', '.0')"
  }

  /** The full composed forecast asset (FloodPipeline.run): peak timing,
    * tendency, intensity, gray filter, WKT — summary output,
    * oracle-checked end to end.
    */
  val q61FloodSummary = Q(
    "q61_flood_summary",
    (s, dir) => {
      val fc = syntheticForecast(s, dir)
      val (_, summary) = FloodPipeline.run(fc, syntheticThresholds(s))
      summary.select(
        col("latitude"), col("longitude"), col("issued_on"),
        col("peak_step"), col("peak_day"), col("peak_timing"),
        round(col("max_median_dis"), 6).as("max_median_dis"),
        round(col("min_median_dis"), 6).as("min_median_dis"),
        round(col("control_dis"), 6).as("control_dis"),
        col("max_max_dis"), col("min_min_dis"), col("tendency"),
        round(col("max_p_above_20y"), 6).as("max_p_above_20y"),
        round(col("max_p_above_5y"), 6).as("max_p_above_5y"),
        round(col("max_p_above_2y"), 6).as("max_p_above_2y"),
        col("intensity"), col("wkt"))
    },
    Some(s"""
      WITH $forecastCte,
      ctl AS (
        SELECT *, max(CASE WHEN step = 1 THEN median_dis END)
                 OVER (PARTITION BY latitude, longitude) AS control_dis
        FROM detailed),
      cond AS (
        SELECT *,
               CASE WHEN p_above_20y >= 0.3 THEN 4
                    WHEN p_above_5y >= 0.3 THEN 3
                    WHEN p_above_2y >= 0.3 THEN 2 ELSE 1 END AS cnd,
               max(CASE WHEN step BETWEEN 1 AND 10 THEN p_above_2y END)
                 OVER (PARTITION BY latitude, longitude) AS max_2y_start
        FROM ctl),
      peak AS (
        SELECT latitude, longitude, issued_on, step AS peak_step,
               valid_for AS peak_day,
               CASE WHEN step IN (1, 2, 3) AND max_2y_start >= 0.30 THEN 'BB'
                    WHEN step > 10 AND max_2y_start < 0.30 THEN 'GC'
                    ELSE 'GB' END AS peak_timing
        FROM (SELECT *, row_number() OVER (PARTITION BY latitude, longitude
                ORDER BY cnd DESC, median_dis DESC, step ASC) AS rn
              FROM cond) WHERE rn = 1),
      tend AS (
        SELECT latitude, longitude,
               max(median_dis) AS max_median_dis,
               min(median_dis) AS min_median_dis,
               max(control_dis) AS control_dis,
               max(max_dis) AS max_max_dis,
               min(min_dis) AS min_min_dis
        FROM ctl GROUP BY 1, 2),
      tendf AS (
        SELECT *, CASE WHEN max_median_dis > control_dis * 1.10 THEN 'U'
                       WHEN min_median_dis <= control_dis * 0.90
                            AND max_median_dis <= control_dis * 1.10 THEN 'D'
                       ELSE 'C' END AS tendency
        FROM tend),
      inten AS (
        SELECT latitude, longitude,
               max(p_above_20y) AS max_p_above_20y,
               max(p_above_5y) AS max_p_above_5y,
               max(p_above_2y) AS max_p_above_2y
        FROM detailed GROUP BY 1, 2),
      intenf AS (
        SELECT *, CASE WHEN max_p_above_20y >= 0.30 THEN 'P'
                       WHEN max_p_above_5y >= 0.30 THEN 'R'
                       WHEN max_p_above_2y >= 0.30 THEN 'Y'
                       ELSE 'G' END AS intensity
        FROM inten)
      SELECT latitude, longitude, issued_on, peak_step, peak_day, peak_timing,
             round(max_median_dis, 6) AS max_median_dis,
             round(min_median_dis, 6) AS min_median_dis,
             round(control_dis, 6) AS control_dis,
             max_max_dis, min_min_dis, tendency,
             round(max_p_above_20y, 6) AS max_p_above_20y,
             round(max_p_above_5y, 6) AS max_p_above_5y,
             round(max_p_above_2y, 6) AS max_p_above_2y,
             intensity,
             'POLYGON ((' || ${wktSql("longitude - 0.025")} || ' ' || ${wktSql("latitude - 0.025")}
             || ',' || ${wktSql("longitude - 0.025")} || ' ' || ${wktSql("latitude + 0.025")}
             || ',' || ${wktSql("longitude + 0.025")} || ' ' || ${wktSql("latitude + 0.025")}
             || ',' || ${wktSql("longitude + 0.025")} || ' ' || ${wktSql("latitude - 0.025")}
             || ',' || ${wktSql("longitude - 0.025")} || ' ' || ${wktSql("latitude - 0.025")}
             || '))' AS wkt
      FROM peak
      LEFT JOIN tendf USING (latitude, longitude)
      LEFT JOIN intenf USING (latitude, longitude)
      WHERE intensity <> 'G'"""),
    headline = true)

  /** J8+P19+P7: nearest-grid alignment + upstream mask
    * (GridOps.filterByUpstream) — discharge cells survive only where the
    * aligned upstream area clears 250e6.
    */
  val q62UpstreamFilter = Q(
    "q62_upstream_filter",
    (s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val discharge = li.select(
        (lit(5.725) - (col("l_partkey") % 30) * 0.05 + col("l_linenumber") * 1e-9)
          .as("latitude"),
        (lit(28.975) + (col("l_suppkey") % 40) * 0.05).as("longitude"),
        ((col("l_orderkey") % 5) + 1).cast("int").as("step"),
        col("l_quantity").as("dis24"))
      val uparea = Tables.load(s, dir, "part")
        .select(
          (lit(5.725) - (col("p_partkey") % 30) * 0.05).as("latitude"),
          (lit(28.975) + (col("p_size") % 40) * 0.05).as("longitude"),
          when(col("p_partkey") % 7 === 0, 3e8).otherwise(1e6).as("ua"))
        .groupBy("latitude", "longitude")
        .agg(max("ua").as("uparea"))
      GridOps.filterByUpstream(discharge, uparea, 5.725, 28.975, 0.05)
        .groupBy("step")
        .agg(count(lit(1)).as("n_cells"),
          graft.core.Sql.exactSum(col("dis24")).as("sum_dis"))
    },
    Some("""
      WITH discharge AS (
        SELECT 5.725 - (l_partkey % 30) * 0.05 + l_linenumber * 1e-9 AS latitude,
               28.975 + (l_suppkey % 40) * 0.05 AS longitude,
               CAST(l_orderkey % 5 AS INTEGER) + 1 AS step,
               l_quantity AS dis24
        FROM lineitem),
      uparea AS (
        SELECT latitude, longitude, max(ua) AS uparea FROM (
          SELECT 5.725 - (p_partkey % 30) * 0.05 AS latitude,
                 28.975 + (p_size % 40) * 0.05 AS longitude,
                 CASE WHEN p_partkey % 7 = 0 THEN 3e8 ELSE 1e6 END AS ua
          FROM part) GROUP BY 1, 2),
      d AS (SELECT *, CAST(round((latitude - 5.725) / 0.05) AS BIGINT) AS gi,
                   CAST(round((longitude - 28.975) / 0.05) AS BIGINT) AS gj
            FROM discharge),
      u AS (SELECT CAST(round((latitude - 5.725) / 0.05) AS BIGINT) AS gi,
                   CAST(round((longitude - 28.975) / 0.05) AS BIGINT) AS gj,
                   uparea
            FROM uparea)
      SELECT step, count(*) AS n_cells,
             CAST(sum(CAST(dis24 AS DECIMAL(27,4))) AS DOUBLE) AS sum_dis
      FROM d JOIN u ON d.gi = u.gi AND d.gj = u.gj
      WHERE uparea >= 250000000
      GROUP BY 1"""))

  /** A8: dense zero-filled zonal counts (GridOps.denseZonalCount). */
  val q63DenseZonal = Q(
    "q63_dense_zonal",
    (s, dir) => {
      val px = Tables.load(s, dir, "orders").select(
        (col("o_custkey") % 10).as("basin"),
        ((col("o_orderkey") % 3) + 1).cast("int").as("year"))
      GridOps.denseZonalCount(px, "basin", "year", 1, 5)
    },
    Some("""
      WITH px AS (
        SELECT o_custkey % 10 AS basin,
               CAST(o_orderkey % 3 AS INTEGER) + 1 AS year
        FROM orders),
      zones AS (SELECT DISTINCT basin FROM px),
      years AS (SELECT CAST(unnest(generate_series(1, 5)) AS INTEGER) AS year),
      counts AS (SELECT basin, year, count(*) AS cnt FROM px
                 WHERE year BETWEEN 1 AND 5 GROUP BY 1, 2)
      SELECT z.basin, y.year, coalesce(c.cnt, 0) AS tree_loss_incidents
      FROM zones z CROSS JOIN years y
      LEFT JOIN counts c ON z.basin = c.basin AND y.year = c.year"""))

  /** A9/R5: raster coarsen block-sum (GridOps.coarsenSum). */
  val q64Coarsen = Q(
    "q64_coarsen",
    (s, dir) => {
      val px = Tables.load(s, dir, "lineitem").select(
        (col("l_partkey") % 1000).as("x"),
        (col("l_suppkey") % 800).as("y"),
        col("l_quantity").as("v"))
      GridOps.coarsenSum(px, "x", "y", "v", 200)
    },
    Some("""
      SELECT CAST(floor((l_partkey % 1000) / 200.0) AS BIGINT) AS block_x,
             CAST(floor((l_suppkey % 800) / 200.0) AS BIGINT) AS block_y,
             sum(l_quantity) AS sum_v
      FROM lineitem GROUP BY 1, 2"""))

  /** S4→yes: the reference's REAL NetCDF-4 threshold inputs, end-to-end.
    * Replays rp_combined_thresh_pq (rp_thresholds.py:108-131): each
    * RP{2,5,20}ythresholds_GloFASv40.nc unpivots to (latitude, longitude,
    * threshold) via the graft-netcdf DSv2 source (ranged row-band reads of
    * the contiguous variable), coordinates round to the 3-decimal GloFAS
    * grid (as integer milli-keys — the robust float-join form of SURVEY
    * §7.4), the three grids inner-join, and add_geometry synthesizes the
    * grid-cell WKT box (transforms.py:268-315).
    *
    * The oracle reads parquet produced by a fully INDEPENDENT pure-python
    * HDF5 parser (tools/nc_to_parquet.py → data/rp_*_thresh.parquet), so a
    * hash match proves both format parsers and both combine pipelines
    * agree bit-for-bit on all 644 000 real cells.
    */
  private val NcDir = "/root/reference/auxiliary_data/flood"
  private val PyParquetDir = "/root/repo/data"

  val q72RpCombinedNc = Q(
    "q72_rp_combined_nc",
    (s, _) => {
      import org.apache.spark.sql.types.DecimalType
      def rp(n: Int): DataFrame =
        s.read.format("graft-netcdf")
          .option("path", s"$NcDir/RP${n}ythresholds_GloFASv40.nc")
          .option("var", s"${n}yRP_GloFASv4")
          .option("partitions", 16)
          .load()
          .select(
            round(col("latitude") * 1000).cast("long").as("lat_key"),
            round(col("longitude") * 1000).cast("long").as("lon_key"),
            col("value").as(s"threshold_${n}y"))
      // three-way combine as union+pivot: ONE shuffle on the cell key
      // instead of two join shuffles (measured 2× faster at 644k cells;
      // the same argument holds on a cluster — one wide exchange beats
      // two). Each (cell, tag) is unique, so max picks the one value;
      // the non-null filter reproduces the inner join exactly for cells
      // missing from a file.
      val tagged = Seq(2, 5, 20).map { n =>
        rp(n).select(col("lat_key"), col("lon_key"), lit(n).as("tag"),
          col(s"threshold_${n}y").as("v"))
      }.reduce(_ unionAll _)
      val joined = tagged.groupBy("lat_key", "lon_key")
        .agg(
          max(when(col("tag") === 2, col("v"))).as("threshold_2y"),
          max(when(col("tag") === 5, col("v"))).as("threshold_5y"),
          max(when(col("tag") === 20, col("v"))).as("threshold_20y"))
        .filter(col("threshold_2y").isNotNull &&
          col("threshold_5y").isNotNull && col("threshold_20y").isNotNull)
      // grid-cell WKT box from exact decimal milli-key arithmetic
      // (half grid = 0.025 = 25 milli-units); q16's engine-stable recipe
      def edge(key: String, delta: Int): Column = Sql.floatStr(
        ((col(key) + delta).cast(DecimalType(15, 3)) / 1000)
          .cast(DecimalType(12, 3)), 3)
      val (minLat, maxLat) = (edge("lat_key", -25), edge("lat_key", 25))
      val (minLon, maxLon) = (edge("lon_key", -25), edge("lon_key", 25))
      joined.select(
        (col("lat_key") / 1000.0).as("latitude"),
        (col("lon_key") / 1000.0).as("longitude"),
        col("threshold_2y"), col("threshold_5y"), col("threshold_20y"),
        concat(lit("POLYGON (("),
          minLon, lit(" "), minLat, lit(","),
          minLon, lit(" "), maxLat, lit(","),
          maxLon, lit(" "), maxLat, lit(","),
          maxLon, lit(" "), minLat, lit(","),
          minLon, lit(" "), minLat, lit("))")).as("wkt"))
    },
    Some(s"""
      WITH t2 AS (
        SELECT CAST(round(latitude*1000) AS BIGINT) AS lat_key,
               CAST(round(longitude*1000) AS BIGINT) AS lon_key,
               "2yRP_GloFASv4" AS threshold_2y
        FROM '$PyParquetDir/rp_2y_thresh.parquet'),
      t5 AS (
        SELECT CAST(round(latitude*1000) AS BIGINT) AS lat_key,
               CAST(round(longitude*1000) AS BIGINT) AS lon_key,
               "5yRP_GloFASv4" AS threshold_5y
        FROM '$PyParquetDir/rp_5y_thresh.parquet'),
      t20 AS (
        SELECT CAST(round(latitude*1000) AS BIGINT) AS lat_key,
               CAST(round(longitude*1000) AS BIGINT) AS lon_key,
               "20yRP_GloFASv4" AS threshold_20y
        FROM '$PyParquetDir/rp_20y_thresh.parquet'),
      j AS (
        SELECT t2.lat_key, t2.lon_key, threshold_2y, threshold_5y, threshold_20y
        FROM t2 JOIN t5 USING (lat_key, lon_key) JOIN t20 USING (lat_key, lon_key)),
      e AS (
        SELECT lat_key, lon_key, threshold_2y, threshold_5y, threshold_20y,
          regexp_replace(regexp_replace(CAST(CAST(CAST(lat_key - 25 AS DECIMAL(15,3)) / 1000 AS DECIMAL(12,3)) AS VARCHAR), '(\\.[0-9]*[1-9])0+$$', '\\1'), '\\.0+$$', '.0') AS minlat,
          regexp_replace(regexp_replace(CAST(CAST(CAST(lat_key + 25 AS DECIMAL(15,3)) / 1000 AS DECIMAL(12,3)) AS VARCHAR), '(\\.[0-9]*[1-9])0+$$', '\\1'), '\\.0+$$', '.0') AS maxlat,
          regexp_replace(regexp_replace(CAST(CAST(CAST(lon_key - 25 AS DECIMAL(15,3)) / 1000 AS DECIMAL(12,3)) AS VARCHAR), '(\\.[0-9]*[1-9])0+$$', '\\1'), '\\.0+$$', '.0') AS minlon,
          regexp_replace(regexp_replace(CAST(CAST(CAST(lon_key + 25 AS DECIMAL(15,3)) / 1000 AS DECIMAL(12,3)) AS VARCHAR), '(\\.[0-9]*[1-9])0+$$', '\\1'), '\\.0+$$', '.0') AS maxlon
        FROM j)
      SELECT lat_key/1000.0 AS latitude, lon_key/1000.0 AS longitude,
             threshold_2y, threshold_5y, threshold_20y,
             'POLYGON ((' || minlon || ' ' || minlat || ',' || minlon || ' ' || maxlat
             || ',' || maxlon || ' ' || maxlat || ',' || maxlon || ' ' || minlat
             || ',' || minlon || ' ' || minlat || '))' AS wkt
      FROM e"""),
    headline = true)

  /** Partition-column layout + pruned read (SURVEY §1.3): the forecast
    * written hive-partitioned by `leadtime_hour` (the reference's 30
    * lead-time objects, partitions.py:20-53, discharge.py:198-207), then
    * read back with a lead-time predicate that prunes to 3/30 partitions
    * at file listing (`PartitionFilters` — PlanSpec pins this). The
    * layout write is idempotent per JVM; the oracle computes the same
    * answer from the flat table.
    */
  val q74PartitionPruned = Q(
    "q74_partition_pruned",
    (s, dir) => {
      val forecast = Tables.load(s, dir, "lineitem").select(
        ((col("l_partkey") % 30 + 1) * 24).cast("int").as("leadtime_hour"),
        col("l_orderkey"), col("l_quantity"))
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_leadtime_" + Integer.toHexString(dir.hashCode)).getAbsolutePath
      graft.sources.Layout.partitionedView(forecast, path, "leadtime_hour")
        .filter(col("leadtime_hour") <= 72)
        .groupBy("leadtime_hour")
        .agg(count(lit(1)).as("n_rows"),
          Sql.exactSum(col("l_quantity")).as("sum_qty"))
    },
    Some("""
      SELECT CAST((l_partkey % 30 + 1) * 24 AS INTEGER) AS leadtime_hour,
             count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE (l_partkey % 30 + 1) * 24 <= 72
      GROUP BY 1"""))

  /** S3→yes: REAL GRIB2 ensemble ingest, end-to-end. Replays the
    * reference's cf/pf assembly (io_managers.py:193-210): the control
    * file and perturbed file are read through the graft-grib DSv2 source
    * (byte-level GRIB2 parse: grid template 3.0, ensemble product
    * template 4.1, simple packing), filtered by dataType exactly as
    * cfgrib's filter_by_keys (pushed down to message-level pruning), and
    * concatenated along `number` with the control renumbered to 0.
    *
    * The oracle reads parquet produced by the INDEPENDENT pure-python
    * GRIB2 writer from the value formula (tools/grib2_fixture.py), so a
    * hash match cross-validates both implementations of the format.
    */
  val q75GribEnsemble = Q(
    "q75_grib_ensemble",
    (s, _) => {
      def read(path: String, dt: String): DataFrame =
        s.read.format("graft-grib").option("path", path).load()
          .filter(col("data_type") === dt).drop("data_type")
      val ens = graft.sources.RasterContract.concatEnsemble(
        read("/root/repo/data/ens_cf.grib2", "cf"),
        read("/root/repo/data/ens_pf.grib2", "pf"))
      ens.select(col("number"), col("latitude"), col("longitude"),
        col("value").as("dis24"))
    },
    Some("""
      SELECT number, latitude, longitude, dis24
      FROM '/root/repo/data/ens_expected.parquet'"""))

  /** S3 depth: complex packing — the representation genuine CDS GloFAS
    * downloads actually use (the reference opens them with cfgrib,
    * io_managers.py:193-210). One file carries template 5.2 (grid-point
    * complex), 5.3 with spatial differencing orders 1 and 2, and the
    * deterministic product template 4.0 (mapped to cf/0 as cfgrib
    * does). The oracle reads parquet computed from the value FORMULA by
    * the independent pure-python GRIB2 writer (tools/grib2_fixture.py),
    * so a hash match cross-validates group splitting, width/length
    * vectors, and the differencing reconstruction on both sides.
    */
  val q79GribComplex = Q(
    "q79_grib_complex",
    (s, _) =>
      s.read.format("graft-grib")
        .option("path", "/root/repo/data/ens_complex.grib2").load(),
    Some("""
      SELECT data_type, number, latitude, longitude, value
      FROM '/root/repo/data/ens_complex_expected.parquet'"""))

  /** S3 depth: bitmap-masked messages (GRIB2 section 6, indicator 0) —
    * how real ECMWF/GloFAS fields mask ocean/invalid cells. The
    * reference's cfgrib reader surfaces masked points as NaN
    * (io_managers.py:193-210); Grib2File does the same (packed data
    * covers only present points, the bitmap re-expands to the full grid
    * with NaN) and the query drops them, the engine image of the
    * pipeline's drop-NA. One simple-packed control plus one
    * complex-5.3-order-1 perturbed member share the mask, so bitmap ∘
    * {simple, complex+differencing} are both exercised. Oracle =
    * parquet computed from the value formula by the independent python
    * writer (tools/grib2_fixture.py) over PRESENT points only.
    */
  val q100GribBitmap = Q(
    "q100_grib_bitmap",
    (s, _) =>
      s.read.format("graft-grib")
        .option("path", "/root/repo/data/ens_bitmap.grib2").load()
        .filter(!isnan(col("value"))),
    Some("""
      SELECT data_type, number, latitude, longitude, value
      FROM '/root/repo/data/ens_bitmap_expected.parquet'"""))

  /** S3 depth: PNG packing (GRIB2 data-representation template 5.41) —
    * the one compressed GRIB representation a JVM decodes with zero
    * native deps (the data section is a PNG image of the scaled values;
    * javax.imageio reads it). The fixture message carries a 16-bit
    * grayscale PNG written from the PNG spec with stdlib zlib by the
    * independent python writer; the oracle is the value-formula parquet,
    * so the hash match cross-validates both PNG implementations AND the
    * template plumbing. (5.40 JPEG2000 remains out: no pure-JVM codec.)
    */
  val q104GribPng = Q(
    "q104_grib_png",
    (s, _) =>
      s.read.format("graft-grib")
        .option("path", "/root/repo/data/ens_png.grib2").load(),
    Some("""
      SELECT data_type, number, latitude, longitude, value
      FROM '/root/repo/data/ens_png_expected.parquet'"""))

  /** S4 write-back: the NetCDF SINK (reference: upstream.py:52
    * `to_netcdf`, io_managers.py:222-223), exercised LIVE end-to-end:
    * a grid aggregated from `orders` is written as a single .nc by the
    * distributed Hdf5Writer (tasks deflate full-width chunks through
    * the Hadoop FS, driver streams header + B-tree + staged bytes),
    * then read back through the graft-netcdf DSv2 source. The oracle
    * recomputes the grid directly in SQL, so the hash match proves
    * write∘read is the identity on every Verify run — on top of the
    * one-time cross-validation of the written bytes by the independent
    * python parser (tools/nc_to_parquet.py, see FIXTURES.md).
    * `max` keeps cell values < 97 — f4-exact at any scale factor.
    */
  val q81NcSink = Q(
    "q81_nc_sink",
    (s, dir) => {
      val lats = Array.tabulate(40)(i => 10.0 + i * 0.25)
      val lons = Array.tabulate(60)(j => 20.0 + j * 0.25)
      val grid = Tables.load(s, dir, "orders").select(
        (lit(10.0) + (col("o_custkey") % 40) * 0.25).as("latitude"),
        (lit(20.0) + expr("(o_custkey div 40) % 60") * 0.25).as("longitude"),
        (col("o_orderkey") % 97).as("v"))
        .groupBy("latitude", "longitude")
        .agg(max(col("v")).as("max_v"))
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_nc_sink_" + Integer.toHexString(dir.hashCode) + ".nc")
        .getAbsolutePath
      graft.sources.nc.Hdf5Writer.writeGrid(grid, path, "max_v",
        "latitude", "longitude", "max_v", lats, lons, chunkRows = 16)
      s.read.format("graft-netcdf")
        .option("path", path).option("var", "max_v").load()
        .filter(!isnan(col("value")))
        .select(col("latitude"), col("longitude"), col("value").as("max_v"))
    },
    Some("""
      SELECT 10.0 + (o_custkey % 40) * 0.25 AS latitude,
             20.0 + ((o_custkey // 40) % 60) * 0.25 AS longitude,
             CAST(max(o_orderkey % 97) AS REAL) AS max_v
      FROM orders GROUP BY 1, 2"""))

  val qs: Seq[Q] = Seq(q60FloodDetailed, q61FloodSummary, q62UpstreamFilter,
    q63DenseZonal, q64Coarsen, q72RpCombinedNc, q74PartitionPruned,
    q75GribEnsemble, q79GribComplex, q81NcSink, q100GribBitmap, q104GribPng,
    q122NcClassic, q126GribSink, q129NcRecord, q130RpZip,
    q140E2eDetailed, q141E2eSummary, q150GribMultistep)

  /** MULTI-STEP GRIB2 round trip: a (step, member) ensemble grid is
    * written by the distributed Grib2Writer (one template-4.1 message
    * per step×member, lead time in octets 19-22) and read back through
    * graft-grib `withStep` — the full source-and-sink pair for the lead
    * -time dimension the real forecast archives carry (q126 covers the
    * single-step sink; q140/q141 consume multi-step bytes from the
    * independent python writer). The oracle recomputes the grid from
    * orders.
    */
  lazy val q150GribMultistep = Q(
    "q150_grib_multistep",
    (s, dir) => {
      val lats = Array.tabulate(12)(i => 9.0 - i * 0.5)
      val lons = Array.tabulate(18)(j => 20.0 + j * 0.5)
      val grid = Tables.load(s, dir, "orders").select(
        ((col("o_orderkey") % 3) * 24 + 24).cast("int").as("step_hours"),
        (expr("(o_orderkey div 3) % 2")).cast("int").as("number"),
        (lit(9.0) - (col("o_custkey") % 12) * 0.5).as("latitude"),
        (lit(20.0) + expr("(o_custkey div 12) % 18") * 0.5).as("longitude"),
        (col("o_orderkey") % 199).as("v"))
        .groupBy("step_hours", "number", "latitude", "longitude")
        .agg(max(col("v")).cast("double").as("value"))
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_grib_steps_" + Integer.toHexString(dir.hashCode) + ".grib2")
        .getAbsolutePath
      graft.sources.grib.Grib2Writer.writeEnsemble(grid, path, lats, lons,
        stepCol = Some("step_hours"))
      s.read.format("graft-grib").option("path", path)
        .option("withStep", "true").load()
        .filter(!isnan(col("value")))
        .select(col("number"), col("step_hours"), col("latitude"),
          col("longitude"), col("value").as("max_v"))
    },
    Some("""
      SELECT CAST((o_orderkey // 3) % 2 AS INT) AS number,
             CAST((o_orderkey % 3) * 24 + 24 AS INT) AS step_hours,
             9.0 - (o_custkey % 12) * 0.5 AS latitude,
             20.0 + ((o_custkey // 12) % 18) * 0.5 AS longitude,
             CAST(max(o_orderkey % 199) AS DOUBLE) AS max_v
      FROM orders GROUP BY 1, 2, 3, 4"""))

  // -------------------------------------------------------------------
  // END-TO-END flood integration (the reference's entire `forecast`
  // asset chain, discharge.py:223-409, from BYTES to final tables):
  // GRIB2 ensemble messages (multi-step, multi-member — the cf/pf split
  // of io_managers.py:193-210) ⋈ the three REAL GloFAS RP NetCDF
  // threshold files (rp_thresholds.py:108-131, read with the
  // zero-shuffle aligned multi-scan) → exceedance flags → grouped exact
  // quantiles → control join-back → peak/tendency/intensity → detailed
  // + summary with WKT — ONE composed Catalyst DAG whose only
  // materialization is the audited `detailed` cache
  // (FloodPipelineSpec pins that).
  //
  // The fixture ensemble grid is a 40×40 window OF the real GloFAS
  // 0.05° lattice (lat 14.025..15.975, lon 12.025..13.975 — fully
  // covered by all three RP files), written by the INDEPENDENT python
  // GRIB2 writer tools/flood_e2e_fixture.py; the oracle recomputes the
  // whole chain in SQL from the formula-derived expected parquet + the
  // independently python-parsed RP parquets.
  // -------------------------------------------------------------------

  private lazy val E2eDir = "/root/repo/data"

  /** The ensemble forecast, from bytes: cf + pf GRIB2 files through the
    * graft-grib source (message-level planning, `withStep` lead time),
    * control renumbered to 0, lead-time hours → step/valid_for.
    */
  private def e2eForecast(s: SparkSession): DataFrame = {
    def read(p: String, dt: String): DataFrame =
      s.read.format("graft-grib").option("path", p)
        .option("withStep", "true").load()
        .filter(col("data_type") === dt).drop("data_type")
    graft.sources.RasterContract.concatEnsemble(
      read(s"$E2eDir/e2e_cf.grib2", "cf"),
      read(s"$E2eDir/e2e_pf.grib2", "pf"))
      .select(col("number"), col("latitude"), col("longitude"),
        lit("2026-01-01").cast("date").as("issued_on"),
        expr("CAST(step_hours div 24 AS INT)").as("step"),
        expr("date_add(DATE'2026-01-01', CAST(step_hours div 24 AS INT))")
          .as("valid_for"),
        col("value").as("dis24"))
  }

  /** The real thresholds: three RP NetCDFs through the aligned
    * zero-shuffle multi-scan (q130's path), area-restricted to the
    * fixture window (P3), coords widened to double for the rounded join.
    */
  private def e2eThresholds(s: SparkSession): DataFrame =
    FloodOps.restrictArea(
      s.read.format("graft-netcdf")
        .option("paths", Seq(2, 5, 20)
          .map(n => s"$NcDir/RP${n}ythresholds_GloFASv40.nc").mkString(","))
        .option("vars", "2yRP_GloFASv4,5yRP_GloFASv4,20yRP_GloFASv4")
        .option("cols", "threshold_2y,threshold_5y,threshold_20y")
        .option("partitions", 16)
        .load(),
      14.025, 15.975, 12.025, 13.975)

  /** Shared oracle CTE chain: the q60/q61 SQL replayed over the
    * independent e2e parquets (LEFT join semantics, exact quantiles,
    * window control, per-cell summary aggregates).
    */
  private lazy val e2eCte = s"""
    forecast AS (
      SELECT number,
             round(latitude, 3) AS latitude,
             round(longitude, 3) AS longitude,
             DATE '2026-01-01' AS issued_on,
             CAST(step_hours // 24 AS INTEGER) AS step,
             DATE '2026-01-01' + CAST(step_hours // 24 AS INTEGER) AS valid_for,
             value AS dis24
      FROM '$E2eDir/e2e_expected.parquet'),
    thresholds AS (
      SELECT round(CAST(a.latitude AS DOUBLE), 3) AS latitude,
             round(CAST(a.longitude AS DOUBLE), 3) AS longitude,
             a."2yRP_GloFASv4" AS threshold_2y,
             b."5yRP_GloFASv4" AS threshold_5y,
             c."20yRP_GloFASv4" AS threshold_20y
      FROM '$E2eDir/rp_2y_thresh.parquet' a
      JOIN '$E2eDir/rp_5y_thresh.parquet' b USING (latitude, longitude)
      JOIN '$E2eDir/rp_20y_thresh.parquet' c USING (latitude, longitude)
      WHERE a.latitude >= 14.0125 AND a.latitude <= 15.9875
        AND a.longitude >= 12.0125 AND a.longitude <= 13.9875),
    joined AS (
      SELECT f.*, t.threshold_2y, t.threshold_5y, t.threshold_20y
      FROM forecast f LEFT JOIN thresholds t USING (latitude, longitude)),
    detailed AS (
      SELECT latitude, longitude, issued_on, valid_for, step,
             min(dis24) AS min_dis,
             quantile_cont(dis24, 0.25) AS q1_dis,
             quantile_cont(dis24, 0.5) AS median_dis,
             quantile_cont(dis24, 0.75) AS q3_dis,
             max(dis24) AS max_dis,
             CAST(sum(CASE WHEN dis24 >= threshold_2y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_2y,
             CAST(sum(CASE WHEN dis24 >= threshold_5y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_5y,
             CAST(sum(CASE WHEN dis24 >= threshold_20y THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_20y
      FROM joined GROUP BY 1, 2, 3, 4, 5),
    ctl AS (
      SELECT *, max(CASE WHEN step = 1 THEN median_dis END)
               OVER (PARTITION BY latitude, longitude) AS control_dis
      FROM detailed),
    inten AS (
      SELECT latitude, longitude,
             max(p_above_20y) AS max_p_above_20y,
             max(p_above_5y) AS max_p_above_5y,
             max(p_above_2y) AS max_p_above_2y
      FROM detailed GROUP BY 1, 2),
    alive AS (
      SELECT latitude, longitude FROM inten
      WHERE max_p_above_20y >= 0.30 OR max_p_above_5y >= 0.30
         OR max_p_above_2y >= 0.30)"""

  private def e2eWkt(latExpr: String, lonExpr: String): String =
    s"""'POLYGON ((' || ${wktSql(s"$lonExpr - 0.025")} || ' ' || ${wktSql(s"$latExpr - 0.025")}
       || ',' || ${wktSql(s"$lonExpr - 0.025")} || ' ' || ${wktSql(s"$latExpr + 0.025")}
       || ',' || ${wktSql(s"$lonExpr + 0.025")} || ' ' || ${wktSql(s"$latExpr + 0.025")}
       || ',' || ${wktSql(s"$lonExpr + 0.025")} || ' ' || ${wktSql(s"$latExpr - 0.025")}
       || ',' || ${wktSql(s"$lonExpr - 0.025")} || ' ' || ${wktSql(s"$latExpr - 0.025")}
       || '))'"""

  lazy val q140E2eDetailed = Q(
    "q140_e2e_detailed",
    (s, _) => {
      val (detailed, _) = FloodPipeline.run(e2eForecast(s), e2eThresholds(s))
      detailed.select(
        col("latitude"), col("longitude"), col("issued_on"),
        col("valid_for"), col("step"), col("min_dis"),
        round(col("q1_dis"), 6).as("q1_dis"),
        round(col("median_dis"), 6).as("median_dis"),
        round(col("q3_dis"), 6).as("q3_dis"),
        col("max_dis"),
        round(col("p_above_2y"), 6).as("p_above_2y"),
        round(col("p_above_5y"), 6).as("p_above_5y"),
        round(col("p_above_20y"), 6).as("p_above_20y"),
        round(col("control_dis"), 6).as("control_dis"),
        col("wkt"))
    },
    Some(s"""
      WITH $e2eCte
      SELECT d.latitude, d.longitude, issued_on, valid_for, step, min_dis,
             round(q1_dis, 6) AS q1_dis,
             round(median_dis, 6) AS median_dis,
             round(q3_dis, 6) AS q3_dis,
             max_dis,
             round(p_above_2y, 6) AS p_above_2y,
             round(p_above_5y, 6) AS p_above_5y,
             round(p_above_20y, 6) AS p_above_20y,
             round(control_dis, 6) AS control_dis,
             ${e2eWkt("d.latitude", "d.longitude")} AS wkt
      FROM ctl d JOIN alive USING (latitude, longitude)"""))

  lazy val q141E2eSummary = Q(
    "q141_e2e_summary",
    (s, _) => {
      val (_, summary) = FloodPipeline.run(e2eForecast(s), e2eThresholds(s))
      summary.select(
        col("latitude"), col("longitude"), col("issued_on"),
        col("peak_step"), col("peak_day"), col("peak_timing"),
        round(col("max_median_dis"), 6).as("max_median_dis"),
        round(col("min_median_dis"), 6).as("min_median_dis"),
        round(col("control_dis"), 6).as("control_dis"),
        col("max_max_dis"), col("min_min_dis"), col("tendency"),
        round(col("max_p_above_20y"), 6).as("max_p_above_20y"),
        round(col("max_p_above_5y"), 6).as("max_p_above_5y"),
        round(col("max_p_above_2y"), 6).as("max_p_above_2y"),
        col("intensity"), col("wkt"))
    },
    Some(s"""
      WITH $e2eCte,
      cond AS (
        SELECT *,
               CASE WHEN p_above_20y >= 0.3 THEN 4
                    WHEN p_above_5y >= 0.3 THEN 3
                    WHEN p_above_2y >= 0.3 THEN 2 ELSE 1 END AS cnd,
               max(CASE WHEN step BETWEEN 1 AND 10 THEN p_above_2y END)
                 OVER (PARTITION BY latitude, longitude) AS max_2y_start
        FROM ctl),
      peak AS (
        SELECT latitude, longitude, issued_on, step AS peak_step,
               valid_for AS peak_day,
               CASE WHEN step IN (1, 2, 3) AND max_2y_start >= 0.30 THEN 'BB'
                    WHEN step > 10 AND max_2y_start < 0.30 THEN 'GC'
                    ELSE 'GB' END AS peak_timing
        FROM (SELECT *, row_number() OVER (PARTITION BY latitude, longitude
                ORDER BY cnd DESC, median_dis DESC, step ASC) AS rn
              FROM cond) WHERE rn = 1),
      tend AS (
        SELECT latitude, longitude,
               max(median_dis) AS max_median_dis,
               min(median_dis) AS min_median_dis,
               max(control_dis) AS control_dis,
               max(max_dis) AS max_max_dis,
               min(min_dis) AS min_min_dis
        FROM ctl GROUP BY 1, 2),
      tendf AS (
        SELECT *, CASE WHEN max_median_dis > control_dis * 1.10 THEN 'U'
                       WHEN min_median_dis <= control_dis * 0.90
                            AND max_median_dis <= control_dis * 1.10 THEN 'D'
                       ELSE 'C' END AS tendency
        FROM tend),
      intenf AS (
        SELECT *, CASE WHEN max_p_above_20y >= 0.30 THEN 'P'
                       WHEN max_p_above_5y >= 0.30 THEN 'R'
                       WHEN max_p_above_2y >= 0.30 THEN 'Y'
                       ELSE 'G' END AS intensity
        FROM inten)
      SELECT latitude, longitude, issued_on, peak_step, peak_day, peak_timing,
             round(max_median_dis, 6) AS max_median_dis,
             round(min_median_dis, 6) AS min_median_dis,
             round(control_dis, 6) AS control_dis,
             max_max_dis, min_min_dis, tendency,
             round(max_p_above_20y, 6) AS max_p_above_20y,
             round(max_p_above_5y, 6) AS max_p_above_5y,
             round(max_p_above_2y, 6) AS max_p_above_2y,
             intensity,
             ${e2eWkt("latitude", "longitude")} AS wkt
      FROM peak
      LEFT JOIN tendf USING (latitude, longitude)
      LEFT JOIN intenf USING (latitude, longitude)
      WHERE intensity <> 'G'"""))

  /** GRIB2 SINK round trip: a 3-member ensemble grid aggregated from
    * orders is written by the distributed Grib2Writer (template 4.1
    * messages, simple packing, section-6 bitmap for missing cells) and
    * read back through graft-grib; the oracle recomputes the grid from
    * orders. Completes the GRIB source-and-sink pair — simple packing
    * exactness holds because the payload is integer-valued (R=0/E=0/D=0).
    */
  lazy val q126GribSink = Q(
    "q126_grib_sink",
    (s, dir) => {
      val lats = Array.tabulate(24)(i => 18.0 - i * 0.5)
      val lons = Array.tabulate(36)(j => 40.0 + j * 0.5)
      val grid = Tables.load(s, dir, "orders").select(
        (col("o_orderkey") % 3).cast("int").as("number"),
        (lit(18.0) - (col("o_custkey") % 24) * 0.5).as("latitude"),
        (lit(40.0) + expr("(o_custkey div 24) % 36") * 0.5).as("longitude"),
        (col("o_orderkey") % 211).as("v"))
        .groupBy("number", "latitude", "longitude")
        .agg(max(col("v")).cast("double").as("value"))
      val path = new java.io.File(sys.props("java.io.tmpdir"),
        "graft_grib_sink_" + Integer.toHexString(dir.hashCode) + ".grib2")
        .getAbsolutePath
      graft.sources.grib.Grib2Writer.writeEnsemble(grid, path, lats, lons)
      s.read.format("graft-grib").option("path", path).load()
        .filter(!isnan(col("value")))
        .select(col("number"), col("latitude"), col("longitude"),
          col("value").as("max_v"))
    },
    Some("""
      SELECT CAST(o_orderkey % 3 AS INT) AS number,
             18.0 - (o_custkey % 24) * 0.5 AS latitude,
             40.0 + ((o_custkey // 24) % 36) * 0.5 AS longitude,
             CAST(max(o_orderkey % 211) AS DOUBLE) AS max_v
      FROM orders GROUP BY 1, 2, 3"""))

  /** NetCDF CLASSIC scan (CDF-2, big-endian) through the same
    * graft-netcdf source — NcFormat dispatches on the file magic, so a
    * user pointing the reader at an archive-era classic file instead of
    * a NetCDF-4/HDF5 one just gets rows (reference: xarray does the
    * same dispatch via its engine machinery). Row bands stay one
    * contiguous positional read each (the classic fixed-variable
    * layout). Fixture + expected parquet from the independent
    * pure-python spec writer (tools/cdf3_fixture.py).
    */
  lazy val q122NcClassic = Q(
    "q122_nc_classic",
    (s, _) =>
      s.read.format("graft-netcdf")
        .option("path", "/root/repo/data/classic2.nc")
        .option("var", "v")
        .load()
        .filter(!isnan(col("value")))
        .select(col("latitude"), col("longitude"), col("value").as("v")),
    Some("""
      SELECT latitude, longitude, v
      FROM '/root/repo/data/classic_expected.parquet'"""))

  /** NetCDF classic RECORD variables (the unlimited-dimension layout
    * archive-era CMIP/station time-series use): v(time, cell) with
    * three interleaved record variables — one slab padded 2→4 bytes —
    * plus a fixed coordinate, from the independent spec writer
    * (tools/cdf3_record_fixture.py, numrecs=7). Rows are records, so
    * each InputPartition reads its record range at stride recSize;
    * planning stays header-only. The STREAMING (numrecs=0xFFFFFFFF)
    * variant of the same file is spec-gated (Cdf3Spec).
    */
  lazy val q129NcRecord = Q(
    "q129_nc_record",
    (s, _) =>
      s.read.format("graft-netcdf")
        .option("path", "/root/repo/data/classic_rec.nc")
        .option("var", "v")
        .option("latvar", "time").option("lonvar", "cell")
        .load()
        .filter(!isnan(col("value")))
        .select(col("latitude").as("t"), col("longitude").as("cell"),
          col("value").as("v")),
    Some("""
      SELECT t, cell, v
      FROM '/root/repo/data/classic_rec_expected.parquet'"""))

  /** The q72 three-way RP combine WITHOUT ANY SHUFFLE: the aligned
    * multi-scan reads the same row band from all three GloFAS files in
    * one InputPartition (planning verified the grids are bit-identical),
    * so the N-way same-grid join is free at the scan — scan → rows, zero
    * exchanges (PlanSpec pins that). This is the source-side image of
    * `xr.open_dataset` aligning variables on shared dims
    * (rp_thresholds.py:108-131); at 100 TB it replaces q72's one wide
    * union+pivot exchange with nothing. The oracle joins the three
    * INDEPENDENT python-parsed parquets on exact coordinates.
    */
  lazy val q130RpZip = Q(
    "q130_rp_zip",
    (s, _) =>
      s.read.format("graft-netcdf")
        .option("paths", Seq(2, 5, 20)
          .map(n => s"$NcDir/RP${n}ythresholds_GloFASv40.nc").mkString(","))
        .option("vars", "2yRP_GloFASv4,5yRP_GloFASv4,20yRP_GloFASv4")
        .option("cols", "threshold_2y,threshold_5y,threshold_20y")
        .option("partitions", 16)
        .load(),
    Some(s"""
      SELECT a.latitude, a.longitude,
             a."2yRP_GloFASv4" AS threshold_2y,
             b."5yRP_GloFASv4" AS threshold_5y,
             c."20yRP_GloFASv4" AS threshold_20y
      FROM '$PyParquetDir/rp_2y_thresh.parquet' a
      JOIN '$PyParquetDir/rp_5y_thresh.parquet' b USING (latitude, longitude)
      JOIN '$PyParquetDir/rp_20y_thresh.parquet' c USING (latitude, longitude)"""))
}
