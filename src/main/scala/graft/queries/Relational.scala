package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.{Sql, Tables}

/** Relational operator surface (SURVEY.md §2) expressed over the
  * driver-provided TPC-H-ish tables, each with a DuckDB oracle.
  *
  * Scale notes (100 TB posture):
  *  - dimension joins (`nation`, `region`, `part`, thresholds in the flood
  *    pipeline) are explicitly `broadcast(...)` — no shuffle of the fact
  *    table (reference hand-rolled the same idea by persisting the
  *    threshold table across 16 subarea loops, discharge.py:192-193);
  *  - aggregates use partial (map-side) aggregation for free via groupBy;
  *  - sums/avgs over doubles go through exact decimals (see [[Sql]]) so
  *    results do not drift with partition count — a correctness property
  *    at 1000 executors, not just an oracle-matching trick;
  *  - top-k and top-1-per-group are window functions, never a driver-side
  *    collect (reference's map_partitions sort+first, transforms.py:128-139,
  *    is only partition-local — the window form is globally correct).
  */
object Relational {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** A1/A1′: grouped ensemble stats — exact quantiles with linear
    * interpolation (reference transforms.py:55-70; golden semantics
    * test_transforms.py:4102-4147). percentile() is Spark's exact sort-based
    * implementation, same interpolation as pandas quantile / DuckDB
    * quantile_cont.
    */
  val q01AggQuantiles = Q(
    "q01_agg_quantiles",
    (s, dir) => {
      t(s, dir)("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          count(lit(1)).as("n_rows"),
          min("l_quantity").as("min_qty"),
          // one percentile buffer serves all three quantiles (the array
          // form sorts the per-group counts map once; three scalar calls
          // each keep and sort their own copy of every value)
          percentile(col("l_quantity"),
            array(lit(0.25), lit(0.5), lit(0.75))).as("_q"),
          max("l_quantity").as("max_qty"),
          Sql.exactSum(col("l_extendedprice")).as("sum_price"),
          round(Sql.exactAvg(col("l_discount")), 8).as("avg_disc"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          col("min_qty"),
          round(element_at(col("_q"), 1), 6).as("q1_qty"),
          round(element_at(col("_q"), 2), 6).as("median_qty"),
          round(element_at(col("_q"), 3), 6).as("q3_qty"),
          col("max_qty"), col("sum_price"), col("avg_disc"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
             count(*) AS n_rows,
             min(l_quantity) AS min_qty,
             round(quantile_cont(l_quantity, 0.25), 6) AS q1_qty,
             round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
             round(quantile_cont(l_quantity, 0.75), 6) AS q3_qty,
             max(l_quantity) AS max_qty,
             CAST(sum(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price,
             round(CAST(sum(CAST(l_discount AS DECIMAL(27,4))) AS DOUBLE) / count(l_discount), 8) AS avg_disc
      FROM lineitem GROUP BY 1, 2"""),
    headline = true)

  /** P1/P3/P5: filter + projection with a derived column; predicate and
    * column pruning reach the parquet scan (PushedFilters / ReadSchema).
    */
  val q02FilterProject = Q(
    "q02_filter_project",
    (s, dir) => {
      t(s, dir)("lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          col("l_discount") >= 0.05 && col("l_quantity") < 24)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
    },
    Some("""
      SELECT l_orderkey, l_linenumber,
             round(l_extendedprice * (1.0 - l_discount), 4) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate <  TIMESTAMP '1996-01-01'
        AND l_discount >= 0.05 AND l_quantity < 24"""))

  /** P10–P13: CASE ladder (flood severity/intensity shape,
    * transforms.py:114-124,247-261) over order totals.
    */
  val q03CaseLadder = Q(
    "q03_case_ladder",
    (s, dir) => {
      t(s, dir)("orders")
        .withColumn("bucket",
          when(col("o_totalprice") >= 300000, "P")
            .when(col("o_totalprice") >= 150000, "R")
            .when(col("o_totalprice") >= 50000, "Y")
            .otherwise("G"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_orders"),
          Sql.exactSum(col("o_totalprice")).as("sum_price"))
    },
    Some("""
      SELECT CASE WHEN o_totalprice >= 300000 THEN 'P'
                  WHEN o_totalprice >= 150000 THEN 'R'
                  WHEN o_totalprice >= 50000  THEN 'Y'
                  ELSE 'G' END AS bucket,
             count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
      FROM orders GROUP BY 1"""))

  /** J1: fact ⋈ broadcast dimension (forecast ⋈ thresholds shape,
    * transforms.py:30-32). `part` is a dimension — broadcast, no fact
    * shuffle for the join; the groupBy shuffles only the aggregated keys.
    */
  val q04JoinBroadcast = Q(
    "q04_join_broadcast",
    (s, dir) => {
      val li = t(s, dir)("lineitem")
      val part = t(s, dir)("part")
      li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_lines"),
          Sql.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
    },
    Some("""
      SELECT p_brand, count(*) AS n_lines,
             CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY 1"""),
    headline = true)

  /** J4/J6: chained multi-way joins through small dims (discharge.py:333-338,
    * rp_thresholds.py:121-125) — all broadcastable.
    */
  val q05JoinMulti = Q(
    "q05_join_multi",
    (s, dir) => {
      val c = t(s, dir)("customer")
      val n = t(s, dir)("nation")
      val r = t(s, dir)("region")
      c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(count(lit(1)).as("n_cust"),
          Sql.exactSum(col("c_acctbal")).as("sum_bal"))
    },
    Some("""
      SELECT r_name, n_name, count(*) AS n_cust,
             CAST(sum(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY 1, 2"""))

  /** A5: top-1-per-group via window (reference map_partitions sort+first,
    * transforms.py:128-139). Deterministic tie-break on the unique key.
    */
  val q06Top1PerGroup = Q(
    "q06_top1_per_group",
    (s, dir) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir)("orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    },
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn = 1"""),
    headline = true)

  /** A2/J2: max-over-group joined back, as a window (no join at all —
    * Spark-first rewrite of transforms.py:96-112).
    */
  val q07WindowMax = Q(
    "q07_window_max",
    (s, dir) => {
      val w = Window.partitionBy("l_orderkey")
      t(s, dir)("lineitem")
        .withColumn("max_qty", max("l_quantity").over(w))
        .filter(col("l_quantity") === col("max_qty"))
        .select("l_orderkey", "l_linenumber", "l_quantity")
    },
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               max(l_quantity) OVER (PARTITION BY l_orderkey) AS max_qty
        FROM lineitem) WHERE l_quantity = max_qty"""))

  /** J3: control join-back — the "step==1 row becomes a per-group scalar"
    * pattern (discharge.py:292-302), as first(when(...)) over a window.
    */
  val q08ControlJoinBack = Q(
    "q08_control_join_back",
    (s, dir) => {
      val w = Window.partitionBy("l_orderkey")
      t(s, dir)("lineitem")
        .withColumn("control_price",
          max(when(col("l_linenumber") === 1, col("l_extendedprice"))).over(w))
        .groupBy("l_orderkey")
        .agg(
          max("control_price").as("control_price"),
          count(lit(1)).as("n_lines"),
          round(Sql.exactSum(col("l_extendedprice")) / max("control_price"), 6)
            .as("total_over_control"))
    },
    Some("""
      WITH ctl AS (
        SELECT l_orderkey, max(CASE WHEN l_linenumber = 1 THEN l_extendedprice END)
               AS control_price
        FROM lineitem GROUP BY 1)
      SELECT l.l_orderkey, ctl.control_price, count(*) AS n_lines,
             round(CAST(sum(CAST(l.l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
                   / ctl.control_price, 6) AS total_over_control
      FROM lineitem l JOIN ctl ON l.l_orderkey = ctl.l_orderkey
      GROUP BY 1, 2"""))

  /** U1/U2: union of homogeneous subsets (cf+pf ensemble concat,
    * io_managers.py:205-208).
    */
  val q09Union = Q(
    "q09_union",
    (s, dir) => {
      val o = t(s, dir)("orders")
      val a = o.filter(col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
        .withColumn("half", lit("early"))
      val b = o.filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .withColumn("half", lit("late"))
      a.unionByName(b)
        .groupBy("half", "o_orderstatus")
        .agg(count(lit(1)).as("n"), Sql.exactSum(col("o_totalprice")).as("sum_price"))
    },
    Some("""
      WITH u AS (
        SELECT 'early' AS half, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderdate < TIMESTAMP '1996-01-01'
        UNION ALL
        SELECT 'late' AS half, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01')
      SELECT half, o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
      FROM u GROUP BY 1, 2"""))

  /** A8: dense zero-filled group universe (flox zonal count semantics,
    * global_forest_watch.py:200-206): counts over the FULL key cross
    * product, 0 where empty.
    */
  val q10DenseUniverse = Q(
    "q10_dense_universe",
    (s, dir) => {
      val o = t(s, dir)("orders")
      val c = t(s, dir)("customer")
      val n = t(s, dir)("nation")
      val statuses = o.select(col("o_orderstatus")).distinct()
      val universe = n.select("n_name").crossJoin(broadcast(statuses))
      val counts = o
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name", "o_orderstatus")
        .agg(count(lit(1)).as("cnt"))
      universe.join(counts, Seq("n_name", "o_orderstatus"), "left")
        .select(col("n_name"), col("o_orderstatus"),
          coalesce(col("cnt"), lit(0L)).as("cnt"))
    },
    Some("""
      WITH u AS (SELECT n_name, o_orderstatus
                 FROM nation, (SELECT DISTINCT o_orderstatus FROM orders)),
           c AS (SELECT n_name, o_orderstatus, count(*) AS cnt
                 FROM orders
                 JOIN customer ON o_custkey = c_custkey
                 JOIN nation ON c_nationkey = n_nationkey
                 GROUP BY 1, 2)
      SELECT u.n_name, u.o_orderstatus, coalesce(c.cnt, 0) AS cnt
      FROM u LEFT JOIN c
        ON u.n_name = c.n_name AND u.o_orderstatus = c.o_orderstatus"""))

  /** O1 + top-k: global order + limit, done as a rank window so the result
    * set is deterministic under any partitioning.
    */
  val q11SortTopK = Q(
    "q11_sort_topk",
    (s, dir) => {
      // orderBy+limit compiles to TakeOrderedAndProject (per-partition
      // top-k + driver merge) — the global-window form would funnel the
      // whole table through ONE partition. The rank window then runs on
      // just the 100 survivors.
      val top = t(s, dir)("orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
      // rank = position in TakeOrderedAndProject's single sorted output
      // partition (ties broken by the sort keys) — no global window, so
      // no WindowExec all-to-one warning; the oracle's row_number
      // cross-checks the ordering on every round
      top.withColumn("rn", (monotonically_increasing_id() + 1).cast("long"))
    },
    Some("""
      SELECT o_orderkey, o_totalprice, rn FROM (
        SELECT o_orderkey, o_totalprice,
               row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders) WHERE rn <= 100"""))

  /** P14: date derivations (discharge.py:273-281) — truncation, bucketing,
    * day arithmetic. Output kept as strings/dates to avoid tz-marker
    * mismatches between engines.
    */
  val q12DateDerive = Q(
    "q12_date_derive",
    (s, dir) => {
      t(s, dir)("orders")
        .withColumn("month", date_format(col("o_orderdate"), "yyyy-MM"))
        .withColumn("valid_for", date_sub(col("o_orderdate").cast("date"), 1))
        .groupBy("month")
        .agg(count(lit(1)).as("n"),
          min("valid_for").as("min_valid_for"),
          max("valid_for").as("max_valid_for"))
    },
    Some("""
      SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS n,
             min(CAST(o_orderdate AS DATE) - 1) AS min_valid_for,
             max(CAST(o_orderdate AS DATE) - 1) AS max_valid_for
      FROM orders GROUP BY 1"""))

  /** P9 + A1 mean-of-flags: threshold-exceedance probability
    * (transforms.py:34-41): boolean >= cast to int, then mean.
    */
  val q13ExceedFlags = Q(
    "q13_exceed_flags",
    (s, dir) => {
      val li = t(s, dir)("lineitem")
        .withColumn("exceed_25", coalesce((col("l_quantity") >= 25).cast("long"), lit(0L)))
        .withColumn("exceed_40", coalesce((col("l_quantity") >= 40).cast("long"), lit(0L)))
      li.groupBy("l_returnflag")
        .agg(
          (sum("exceed_25").cast("double") / count(lit(1))).as("p_above_25"),
          (sum("exceed_40").cast("double") / count(lit(1))).as("p_above_40"))
    },
    Some("""
      SELECT l_returnflag,
             CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_25,
             CAST(sum(CASE WHEN l_quantity >= 40 THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS p_above_40
      FROM lineitem GROUP BY 1"""))

  /** P17: haversine great-circle distance (global_forest_watch.py:113-140)
    * as pure column trig — fully codegen'd, no UDF.
    */
  val q14Haversine = Q(
    "q14_haversine",
    (s, dir) => {
      val c = t(s, dir)("customer")
        .withColumn("lat", (col("c_custkey") % 160).cast("double") - 80.0 + 0.5)
        .withColumn("lon", (col("c_custkey") % 340).cast("double") - 170.0 + 0.5)
      val dlat = radians(col("lat"))
      val dlon = radians(col("lon"))
      val a = pow(sin(dlat / 2), 2) +
        cos(radians(lit(0.0))) * cos(dlat) * pow(sin(dlon / 2), 2)
      val dist = lit(2.0 * 6371.0) * atan2(sqrt(a), sqrt(lit(1.0) - a))
      c.select(col("c_custkey"), round(dist, 4).as("dist_km"))
    },
    Some("""
      SELECT c_custkey,
             round(2.0 * 6371.0 * atan2(sqrt(a), sqrt(1.0 - a)), 4) AS dist_km
      FROM (
        SELECT c_custkey,
               pow(sin(radians(CAST(c_custkey % 160 AS DOUBLE) - 80.0 + 0.5) / 2), 2)
               + cos(radians(0.0))
                 * cos(radians(CAST(c_custkey % 160 AS DOUBLE) - 80.0 + 0.5))
                 * pow(sin(radians(CAST(c_custkey % 340 AS DOUBLE) - 170.0 + 0.5) / 2), 2) AS a
        FROM customer)"""))

  /** P18: md5 digest column (preprocessing.py:181). */
  val q15Md5 = Q(
    "q15_md5",
    (s, dir) => {
      t(s, dir)("customer")
        .select(col("c_custkey"), md5(col("c_name")).as("name_md5"))
    },
    Some("SELECT c_custkey, md5(c_name) AS name_md5 FROM customer"))

  /** P15: WKT polygon synthesis (add_geometry, transforms.py:268-315) with
    * pandas-compatible float formatting. All coordinate math is exact
    * decimal so the string form is engine-independent.
    */
  val q16Wkt = Q(
    "q16_wkt",
    (s, dir) => {
      val half = lit(BigDecimal("0.025")).cast(DecimalType(6, 3))
      val n = t(s, dir)("nation")
        .withColumn("lat",
          (col("n_nationkey").cast(DecimalType(10, 1)) * lit(BigDecimal("0.7")))
            .cast(DecimalType(12, 3)))
        .withColumn("lon",
          (col("n_nationkey").cast(DecimalType(10, 1)) * lit(BigDecimal("1.3"))
            - lit(BigDecimal("16.0"))).cast(DecimalType(12, 3)))
      val (minLat, maxLat) = (col("lat") - half, col("lat") + half)
      val (minLon, maxLon) = (col("lon") - half, col("lon") + half)
      def f(c: org.apache.spark.sql.Column) = Sql.floatStr(c, 3)
      n.select(col("n_nationkey"),
        concat(lit("POLYGON (("),
          f(minLon), lit(" "), f(minLat), lit(","),
          f(minLon), lit(" "), f(maxLat), lit(","),
          f(maxLon), lit(" "), f(maxLat), lit(","),
          f(maxLon), lit(" "), f(minLat), lit(","),
          f(minLon), lit(" "), f(minLat), lit("))")).as("wkt"))
    },
    Some("""
      WITH g AS (
        SELECT n_nationkey,
               CAST(CAST(n_nationkey AS DECIMAL(10,1)) * 0.7 AS DECIMAL(12,3)) AS lat,
               CAST(CAST(n_nationkey AS DECIMAL(10,1)) * 1.3 - 16.0 AS DECIMAL(12,3)) AS lon
        FROM nation),
      b AS (
        SELECT n_nationkey,
               lat - 0.025 AS minlat, lat + 0.025 AS maxlat,
               lon - 0.025 AS minlon, lon + 0.025 AS maxlon
        FROM g),
      s AS (
        SELECT n_nationkey,
          regexp_replace(regexp_replace(CAST(CAST(minlat AS DECIMAL(12,3)) AS VARCHAR), '(\.[0-9]*[1-9])0+$', '\1'), '\.0+$', '.0') AS minlat,
          regexp_replace(regexp_replace(CAST(CAST(maxlat AS DECIMAL(12,3)) AS VARCHAR), '(\.[0-9]*[1-9])0+$', '\1'), '\.0+$', '.0') AS maxlat,
          regexp_replace(regexp_replace(CAST(CAST(minlon AS DECIMAL(12,3)) AS VARCHAR), '(\.[0-9]*[1-9])0+$', '\1'), '\.0+$', '.0') AS minlon,
          regexp_replace(regexp_replace(CAST(CAST(maxlon AS DECIMAL(12,3)) AS VARCHAR), '(\.[0-9]*[1-9])0+$', '\1'), '\.0+$', '.0') AS maxlon
        FROM b)
      SELECT n_nationkey,
             'POLYGON ((' || minlon || ' ' || minlat || ',' || minlon || ' ' || maxlat
             || ',' || maxlon || ' ' || maxlat || ',' || maxlon || ' ' || minlat
             || ',' || minlon || ' ' || minlat || '))' AS wkt
      FROM s"""))

  /** P16: tile-name synthesis + parse back to bbox
    * (global_forest_watch.py:98-110, hydrobasins.py:37-69).
    */
  val q17TileParse = Q(
    "q17_tile_parse",
    (s, dir) => {
      val sup = t(s, dir)("supplier")
        .withColumn("lat_deg", ((col("s_suppkey") % 8) * 10 - 40).cast("int"))
        .withColumn("lon_deg", ((col("s_suppkey") % 18) * 10 - 90).cast("int"))
      val tile = concat(
        lpad(abs(col("lat_deg")).cast("string"), 2, "0"),
        when(col("lat_deg") >= 0, "N").otherwise("S"),
        lit("_"),
        lpad(abs(col("lon_deg")).cast("string"), 3, "0"),
        when(col("lon_deg") >= 0, "E").otherwise("W"))
      val named = sup.select(col("s_suppkey"), tile.as("tile"))
      // parse back: split on '_', sign by hemisphere letter
      val latPart = substring(col("tile"), 1, 3)
      val lonPart = substring(col("tile"), 5, 4)
      val latV = substring(latPart, 1, 2).cast("int") *
        when(substring(latPart, 3, 1) === "N", 1).otherwise(-1)
      val lonV = substring(lonPart, 1, 3).cast("int") *
        when(substring(lonPart, 4, 1) === "E", 1).otherwise(-1)
      named.select(col("s_suppkey"), col("tile"),
        latV.as("lat_min"), (latV + 10).as("lat_max"),
        lonV.as("lon_min"), (lonV + 10).as("lon_max"))
    },
    Some("""
      WITH g AS (
        SELECT s_suppkey,
               CAST((s_suppkey % 8) * 10 - 40 AS INTEGER) AS lat_deg,
               CAST((s_suppkey % 18) * 10 - 90 AS INTEGER) AS lon_deg
        FROM supplier),
      named AS (
        SELECT s_suppkey,
               lpad(CAST(abs(lat_deg) AS VARCHAR), 2, '0')
               || CASE WHEN lat_deg >= 0 THEN 'N' ELSE 'S' END
               || '_'
               || lpad(CAST(abs(lon_deg) AS VARCHAR), 3, '0')
               || CASE WHEN lon_deg >= 0 THEN 'E' ELSE 'W' END AS tile
        FROM g)
      SELECT s_suppkey, tile,
             CAST(substr(tile, 1, 2) AS INTEGER)
               * (CASE WHEN substr(tile, 3, 1) = 'N' THEN 1 ELSE -1 END) AS lat_min,
             CAST(substr(tile, 1, 2) AS INTEGER)
               * (CASE WHEN substr(tile, 3, 1) = 'N' THEN 1 ELSE -1 END) + 10 AS lat_max,
             CAST(substr(tile, 5, 3) AS INTEGER)
               * (CASE WHEN substr(tile, 8, 1) = 'E' THEN 1 ELSE -1 END) AS lon_min,
             CAST(substr(tile, 5, 3) AS INTEGER)
               * (CASE WHEN substr(tile, 8, 1) = 'E' THEN 1 ELSE -1 END) + 10 AS lon_max
      FROM named"""))

  /** A6: scalar min/max/count probes (discharge.py:245-261). */
  val q18MinMaxProbe = Q(
    "q18_minmax_probe",
    (s, dir) => {
      t(s, dir)("orders").agg(
        count(lit(1)).as("n"),
        min(col("o_orderdate").cast("date")).as("min_date"),
        max(col("o_orderdate").cast("date")).as("max_date"),
        min("o_totalprice").as("min_price"),
        max("o_totalprice").as("max_price"))
    },
    Some("""
      SELECT count(*) AS n,
             min(CAST(o_orderdate AS DATE)) AS min_date,
             max(CAST(o_orderdate AS DATE)) AS max_date,
             min(o_totalprice) AS min_price,
             max(o_totalprice) AS max_price
      FROM orders"""))

  /** J5: left-semi join (summary-keys filter, discharge.py:347-352). */
  val q19SemiJoin = Q(
    "q19_semi_join",
    (s, dir) => {
      val bigOrders = t(s, dir)("orders")
        .filter(col("o_totalprice") >= 250000).select("o_orderkey")
      t(s, dir)("lineitem")
        .join(bigOrders, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_lines"), Sql.exactSum(col("l_quantity")).as("sum_qty"))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n_lines,
             CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
      FROM lineitem
      WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_totalprice >= 250000)
      GROUP BY 1"""))

  /** P8/J8: rounded-key equi-join — the nearest-grid alignment rewrite
    * (filter_by_upstream.py:63-67 reindex-nearest → round-to-grid join).
    * Keys are integer-scaled (micro-units), the robust form recommended in
    * SURVEY §7.4 for float join keys.
    */
  val q20RoundedKeyJoin = Q(
    "q20_rounded_key_join",
    (s, dir) => {
      val li = t(s, dir)("lineitem")
        .withColumn("price_bucket",
          floor(col("l_extendedprice") / 1000.0).cast("long"))
      val o = t(s, dir)("orders")
        .withColumn("price_bucket",
          floor(col("o_totalprice") / 1000.0 / 4.0).cast("long"))
        .groupBy("price_bucket").agg(count(lit(1)).as("n_orders"))
      li.groupBy("price_bucket").agg(count(lit(1)).as("n_lines"))
        .join(o, Seq("price_bucket"), "inner")
        .select("price_bucket", "n_lines", "n_orders")
    },
    Some("""
      WITH li AS (SELECT CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_bucket,
                         count(*) AS n_lines
                  FROM lineitem GROUP BY 1),
           o AS (SELECT CAST(floor(o_totalprice / 1000.0 / 4.0) AS BIGINT) AS price_bucket,
                        count(*) AS n_orders
                 FROM orders GROUP BY 1)
      SELECT li.price_bucket, n_lines, n_orders
      FROM li JOIN o ON li.price_bucket = o.price_bucket"""))

  /** CO-LOCATED join via bucketed layout (the shuffle-minimization row
    * of SURVEY §2's scale posture, realized): orders and customer
    * persist as catalog tables bucketed AND bucket-sorted on the join
    * key (Layout.bucketedTable), so the fact-fact join plans as a
    * SortMergeJoin with NO exchange and NO sort on either side — the
    * repeated-big-join layout a 100 TB warehouse uses where per-query
    * repartition would pay the full shuffle every time (PlanSpec pins
    * the exchange-free join). The only shuffle left in the query is the
    * final small aggregation.
    */
  val q93BucketedJoin = Q(
    "q93_bucketed_join",
    (s, dir) => {
      val h = Integer.toHexString(dir.hashCode)
      val tmp = sys.props("java.io.tmpdir")
      val orders = graft.sources.Layout.bucketedTable(
        t(s, dir)("orders").select("o_custkey", "o_totalprice"),
        s"graft_orders_b_$h", s"$tmp/graft_orders_b_$h", 8, "o_custkey")
      val cust = graft.sources.Layout.bucketedTable(
        t(s, dir)("customer").select("c_custkey", "c_mktsegment"),
        s"graft_cust_b_$h", s"$tmp/graft_cust_b_$h", 8, "c_custkey")
      orders.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          Sql.exactSum(col("o_totalprice")).as("sum_price"))
    },
    Some("""
      SELECT c_mktsegment, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1"""))

  /** Salted two-phase aggregation through the gate (SkewOps — the hot-
    * key aggregation case AQE does not cover): l_returnflag has only 3
    * values, so every reducer key is hot; the salt spreads each over 16
    * partials before the tiny final combine. Salting must be invisible
    * in the result — the oracle is the PLAIN single-phase aggregate,
    * and exact decimal accumulation makes the double sum identical
    * across any (salt, partition) split.
    */
  val q95SaltedAgg = Q(
    "q95_salted_agg",
    (s, dir) => {
      graft.operators.SkewOps.saltedAggregate(
        t(s, dir)("lineitem"),
        keys = Seq("l_returnflag"),
        salt = 16,
        partial = Seq(
          "n_rows" -> count(lit(1)),
          "sum_qty" -> sum(col("l_quantity").cast(DecimalType(27, 4)))),
        fin = Seq(
          "n_rows" -> ((c: org.apache.spark.sql.Column) => sum(c)),
          "sum_qty" -> ((c: org.apache.spark.sql.Column) =>
            sum(c).cast("double"))))
    },
    Some("""
      SELECT l_returnflag, count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
      FROM lineitem GROUP BY 1"""))

  /** Salted join through the gate (SkewOps — the broadcast-ineligible
    * skewed-join shape): every lineitem row carries one of 3 flag
    * values, the classic one-hot-reducer join; the right side
    * replicates `salt` ways so each hot key lands on 16 reducers. The
    * oracle is the PLAIN join — salting must not change a single row.
    */
  val q96SaltedJoin = Q(
    "q96_salted_join",
    (s, dir) => {
      import s.implicits._
      val dim = Seq(("A", "returned"), ("N", "kept"), ("R", "refunded"))
        .toDF("l_returnflag", "flag_name")
      graft.operators.SkewOps.saltedJoin(
          t(s, dir)("lineitem").select("l_returnflag", "l_quantity"),
          dim, "l_returnflag", salt = 16)
        .groupBy("flag_name")
        .agg(count(lit(1)).as("n_rows"),
          Sql.exactSum(col("l_quantity")).as("sum_qty"))
    },
    Some("""
      WITH dim AS (
        SELECT * FROM (VALUES ('A', 'returned'), ('N', 'kept'),
                              ('R', 'refunded')) d(l_returnflag, flag_name))
      SELECT flag_name, count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
      FROM lineitem JOIN dim USING (l_returnflag)
      GROUP BY 1"""))

  /** Hot-key-only salted join through the gate (SkewOps.saltedJoinHotKeys
    * — the refinement where ONLY keys above a frequency threshold take
    * the salted path and the cold remainder plain-joins): a synthetic
    * 70/30 skew puts ~70% of lineitem on one 'HOT' key and spreads the
    * rest over ~1000 cold keys, so with threshold 1000 exactly the hot
    * key salts (SkewAndExtensionsSpec pins that) and both paths carry
    * rows. The oracle is the PLAIN join — the two-path union must not
    * change a single row.
    */
  val q103HotkeySaltedJoin = Q(
    "q103_hotkey_salted_join",
    (s, dir) => {
      val k = when(col("l_orderkey") % 10 < 7, lit("HOT"))
        .otherwise(concat(lit("c"), (col("l_orderkey") % 1000).cast("string")))
      val fact = t(s, dir)("lineitem").select(k.as("k"), col("l_quantity"))
      val dim = fact.select("k").distinct()
        .withColumn("bucket", substring(col("k"), 1, 2))
      graft.operators.SkewOps.saltedJoinHotKeys(
          fact, dim, "k", salt = 16, hotThreshold = 1000L)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_rows"),
          Sql.exactSum(col("l_quantity")).as("sum_qty"))
    },
    Some("""
      WITH f AS (
        SELECT CASE WHEN l_orderkey % 10 < 7 THEN 'HOT'
                    ELSE 'c' || CAST(l_orderkey % 1000 AS VARCHAR) END AS k,
               l_quantity
        FROM lineitem),
      d AS (SELECT DISTINCT k, substr(k, 1, 2) AS bucket FROM f)
      SELECT bucket, count(*) AS n_rows,
             CAST(sum(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
      FROM f JOIN d USING (k)
      GROUP BY 1"""))

  /** The documented 100 TB opt-in for q01's exact-quantile semantics:
    * `approx_percentile` (mergeable bounded-state sketch — no per-group
    * sort, no full-value buffering). Sketch values are run-dependent
    * within their rank-error bound, so the gate follows the q43 recipe:
    * emit EXACT values plus boolean in-tolerance flags; the oracle
    * recomputes the exact side and expects every flag TRUE. l_quantity
    * spans 1..50, accuracy 10000 at sf0.01 row counts bounds the rank
    * error well under one value step — tolerance 1.0 is generous yet
    * meaningful.
    */
  val q118ApproxQuantiles = Q(
    "q118_approx_quantiles",
    (s, dir) => {
      t(s, dir)("lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n_rows"),
          percentile(col("l_quantity"), lit(0.5)).as("_exact"),
          approx_percentile(col("l_quantity"), lit(0.5), lit(10000)).as("_apx"))
        .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
          round(col("_exact"), 6).as("exact_median"),
          (abs(col("_apx") - col("_exact")) <= 1.0).as("approx_in_bound"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n_rows,
             round(quantile_cont(l_quantity, 0.5), 6) AS exact_median,
             TRUE AS approx_in_bound
      FROM lineitem GROUP BY 1, 2"""))

  val qs: Seq[Q] = Seq(
    q01AggQuantiles, q02FilterProject, q03CaseLadder, q04JoinBroadcast,
    q05JoinMulti, q06Top1PerGroup, q07WindowMax, q08ControlJoinBack,
    q09Union, q10DenseUniverse, q11SortTopK, q12DateDerive, q13ExceedFlags,
    q14Haversine, q15Md5, q16Wkt, q17TileParse, q18MinMaxProbe,
    q19SemiJoin, q20RoundedKeyJoin, q93BucketedJoin, q95SaltedAgg,
    q96SaltedJoin, q103HotkeySaltedJoin, q118ApproxQuantiles)
}
