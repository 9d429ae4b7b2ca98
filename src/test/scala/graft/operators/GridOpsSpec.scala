package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** GridOps semantics tests, including a scaled-down port of the
  * reference's upstream-filtering e2e property test
  * (test_upstream_filtering.py:19-81): pipeline output must equal an
  * independently-constructed ground truth.
  */
class GridOpsSpec extends SparkSpec {
  import spark.implicits._

  test("nearestGridJoin aligns off-grid coordinates to the nearest cell") {
    val res = 0.05
    // discharge grid cell centers (slightly perturbed, as after GRIB read)
    val left = Seq((1.0250000002, 2.074999999, 7.0), (1.075, 2.125, 8.0))
      .toDF("latitude", "longitude", "dis24")
    val right = Seq((1.025, 2.075, 300e6), (1.075, 2.125, 100e6))
      .toDF("latitude", "longitude", "uparea")
    val out = GridOps.nearestGridJoin(left, right, 0.025, 0.025, res, Seq("uparea"))
      .orderBy("latitude")
      .select("dis24", "uparea").as[(Double, Double)].collect().toSeq
    assert(out == Seq((7.0, 300e6), (8.0, 100e6)))
  }

  test("filterByUpstream e2e matches independently-computed ground truth") {
    val res = 0.05
    val rnd = new scala.util.Random(42)
    val nLat = 30; val nLon = 40
    val lats = (0 until nLat).map(i => 5.725 - i * res)
    val lons = (0 until nLon).map(j => 28.975 + j * res)
    // uparea grid: mostly below threshold, K random cells above
    val above = rnd.shuffle(
      (for (i <- 0 until nLat; j <- 0 until nLon) yield (i, j)).toVector).take(20).toSet
    val uparea = (for (i <- 0 until nLat; j <- 0 until nLon) yield
      (lats(i), lons(j), if (above((i, j))) 300e6 else 1e6))
      .toDF("latitude", "longitude", "uparea")
    // discharge cube: 3 members × 4 steps × grid, constant fill
    val discharge = (for {
      n <- 1 to 3; s <- 1 to 4; i <- 0 until nLat; j <- 0 until nLon
    } yield (n, s, lats(i), lons(j), 100.0))
      .toDF("number", "step", "latitude", "longitude", "dis24")

    val got = GridOps.filterByUpstream(discharge, uparea, 5.725, 28.975, res)
      .select("number", "step", "latitude", "longitude", "dis24")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toSet
    // independent ground truth: every (member, step) × surviving cell
    val expected = (for {
      n <- 1 to 3; s <- 1 to 4; (i, j) <- above
    } yield (n, s, lats(i), lons(j), 100.0)).toSet
    assert(got == expected)
    assert(got.size == 3 * 4 * 20)
  }

  test("coarsenSum block-sums a grid") {
    val px = Seq((0, 0, 1.0), (1, 1, 2.0), (2, 0, 4.0), (0, 3, 8.0))
      .toDF("x", "y", "v")
    val out = GridOps.coarsenSum(px, "x", "y", "v", 2)
      .orderBy("block_x", "block_y")
      .select("block_x", "block_y", "sum_v").as[(Long, Long, Double)]
      .collect().toSeq
    assert(out == Seq((0L, 0L, 3.0), (0L, 1L, 8.0), (1L, 0L, 4.0)))
  }

  test("treeLossPerBlock stacks year masks and counts per block") {
    val px = Seq((0, 0, 1), (1, 0, 1), (0, 1, 2), (201, 0, 1))
      .toDF("x", "y", "lossyear")
    val out = GridOps.treeLossPerBlock(px, "x", "y", "lossyear", 200, 1, 3)
      .filter(col("loss_count") > 0)
      .orderBy("year", "block_x")
      .select("year", "block_x", "block_y", "loss_count")
      .as[(Int, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1, 0L, 0L, 2L), (1, 1L, 0L, 1L), (2, 0L, 0L, 1L)))
  }

  test("denseZonalCount zero-fills the full zone-year universe") {
    val px = Seq((10L, 1), (10L, 1), (20L, 3)).toDF("basin", "year")
    val out = GridOps.denseZonalCount(px, "basin", "year", 1, 3)
      .orderBy("basin", "year")
      .select("basin", "year", "tree_loss_incidents")
      .as[(Long, Int, Long)].collect().toSeq
    assert(out == Seq(
      (10L, 1, 2L), (10L, 2, 0L), (10L, 3, 0L),
      (20L, 1, 0L), (20L, 2, 0L), (20L, 3, 1L)))
  }

  test("mortonKey gives bbox queries better block locality than row-major") {
    // full 64x64 grid; an 8x8 bbox at (24..31, 40..47)
    val grid = spark.range(64L * 64L)
      .select((col("id") / 64).cast("long").as("i"),
        (col("id") % 64).cast("long").as("j"))
    val box = grid.filter(col("i").between(24, 31) && col("j").between(40, 47))
    val zBlocks = box
      .select((expr("0") + GridOps.mortonKey(col("i"), col("j"), 6)).as("m"))
      .selectExpr("m DIV 64 AS blk").distinct().count()
    val rowMajorBlocks = box
      .selectExpr("(i * 64 + j) DIV 64 AS blk").distinct().count()
    // 64 cells: row-major touches 8 blocks (one per row); z-order packs
    // the box into at most 4 aligned 8x8 tiles
    assert(rowMajorBlocks == 8L)
    assert(zBlocks <= 4L, s"z blocks: $zBlocks")
    // and the key is a bijection on the grid
    val distinctKeys = grid
      .select(GridOps.mortonKey(col("i"), col("j"), 6).as("m"))
      .distinct().count()
    assert(distinctKeys == 64L * 64L)
  }

  test("polygonZonalAssign assigns by exact containment, not envelope") {
    // two disjoint concave Ls; zone 1 at origin, zone 2 shifted +10 lon.
    // cellSize 1.0 < polygon extent 3.0 ⇒ envelopes span many coarse
    // cells, exercising the explode/candidate path.
    val polys = Seq(
      (1L, Seq(0.0, 3.0, 3.0, 1.0, 1.0, 0.0), Seq(0.0, 0.0, 1.0, 1.0, 3.0, 3.0)),
      (2L, Seq(10.0, 13.0, 13.0, 11.0, 11.0, 10.0), Seq(0.0, 0.0, 1.0, 1.0, 3.0, 3.0)))
      .toDF("zone", "xs", "ys")
    val points = Seq(
      (101L, 2.5, 0.5),   // zone 1, bottom arm
      (102L, 0.5, 2.5),   // zone 1, left arm
      (103L, 2.0, 2.0),   // zone 1 ENVELOPE but in the notch → unassigned
      (104L, 12.5, 0.5),  // zone 2, bottom arm
      (105L, 5.0, 5.0))   // nowhere
      .toDF("id", "longitude", "latitude")
    val got = GridOps.polygonZonalAssign(points, polys, "zone", cellSize = 1.0)
      .select("id", "zone").as[(Long, Long)].collect().toSet
    assert(got == Set((101L, 1L), (102L, 1L), (104L, 2L)))
  }

  test("cubicDownsample2x matches a direct 4x4 kernel reference, edges included") {
    // odd x even dims exercise both parities of the edge/pad logic
    val (w, h) = (11, 8)
    def v(c: Int, r: Int): Long = ((c * 31 + r * 17) % 255).toLong
    val px = (for (r <- 0 until h; c <- 0 until w) yield (c, r, v(c, r)))
      .toDF("pc", "pr", "vv")
    val got = GridOps.cubicDownsample2x(px, "pc", "pr", "vv", w, h)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cs = Seq(-1L, 9L, 9L, -1L)
    def clamp(i: Int, n: Int) = math.max(0, math.min(n - 1, i))
    val (wo, ho) = ((w + 1) / 2, (h + 1) / 2)
    for (tr <- 0 until ho; tc <- 0 until wo) {
      val want = (for (j <- 0 until 4; i <- 0 until 4)
        yield cs(i) * cs(j) * v(clamp(2 * tc - 1 + i, w), clamp(2 * tr - 1 + j, h))).sum
      assert(got((tc, tr)) == want, s"target ($tc,$tr)")
    }
    assert(got.size == wo * ho)
  }

  test("cubicDownsample2x charges absent pixels to nodata") {
    // a single present pixel at (2,2) of an 8x8 grid, nodata = 100:
    // every tap except (2,2)'s contributions reads 100
    val px = Seq((2, 2, 7L)).toDF("pc", "pr", "vv")
    val got = GridOps.cubicDownsample2x(px, "pc", "pr", "vv", 8, 8, nodata = 100)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val cs = Seq(-1L, 9L, 9L, -1L)
    def coef(t: Int, s: Int): Long =
      (0 until 4).collect { case i if 2 * t - 1 + i == s => cs(i) }.sum
    // only targets actually tapping (2,2) appear; untapped targets are
    // wholly absent (the tile stage later fills them with nodata)
    assert(got.keySet == Set((0, 0), (0, 1), (1, 0), (1, 1)))
    for (tr <- 0 to 1; tc <- 0 to 1) {
      val c = coef(tc, 2) * coef(tr, 2)
      val want = c * 7L + 100L * (256L - c)
      assert(got((tc, tr)) == want, s"target ($tc,$tr)")
    }
  }
}
