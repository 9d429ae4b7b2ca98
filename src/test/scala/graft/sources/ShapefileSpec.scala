package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.shp.Shapefile

/** Byte-level shapefile tests: fixtures written by the INDEPENDENT
  * pure-python spec implementation (tools/shp_fixture.py).
  */
class ShapefileSpec extends SparkSpec {
  import spark.implicits._

  private val shp = "/root/repo/data/basins.shp"

  private def polyX(k: Int): Seq[Double] = {
    val ox = (k / 5) * 2.0
    Seq(ox, ox + 1.5, ox + 1.5, ox + 0.5, ox + 0.5, ox, ox)
  }

  test("shx index + dbf numeric attribute parse") {
    val locs = Shapefile.index("/root/repo/data/basins.shx")
    assert(locs.size == 25)
    assert(locs.head.offsetBytes == 100) // 50 words
    val ids = Shapefile.dbfNumericField("/root/repo/data/basins.dbf", "HYBAS_ID")
    assert(ids(1) == 7000000000L && ids(25) == 7000000024L)
  }

  test("graft-shp reads polygon rings with attribute zones") {
    val df = spark.read.format("graft-shp")
      .option("path", shp).option("idfield", "HYBAS_ID").load()
    assert(df.count() == 25) // one ring per polygon
    val r = df.filter(col("record") === 13)
      .select("zone", "xs").as[(Long, Seq[Double])].head()
    assert(r._1 == 7000000012L)
    assert(r._2 == polyX(12))
  }

  test("bbox option skips records from the header envelope") {
    // polygons live on a 2.0 grid; this box covers only offsets (0,0)-(2,2)
    val df = spark.read.format("graft-shp")
      .option("path", shp).option("idfield", "HYBAS_ID")
      .option("bbox", "-0.5,-0.5,3.4,3.4").load()
    // envelopes intersecting: ox in {0,2}, oy in {0,2} → 4 polygons
    assert(df.select("record").as[Int].collect().toSet == Set(1, 2, 6, 7))
  }

  test("multi-part records yield one ring per part (holes)") {
    val df = spark.read.format("graft-shp")
      .option("path", "/root/repo/data/holes.shp")
      .option("idfield", "ZONE").load()
    val rings = df.select("record", "part", "xs", "zone")
      .as[(Int, Int, Seq[Double], Long)].collect().sortBy(_._2)
    assert(rings.length == 2) // outer + hole, same record
    assert(rings.forall(r => r._1 == 1 && r._4 == 42L))
    assert(rings(0)._3 == Seq(0.0, 4.0, 4.0, 0.0, 0.0)) // outer ring xs
    assert(rings(1)._3 == Seq(1.0, 1.0, 3.0, 3.0, 1.0)) // hole ring xs
    // even-odd containment over BOTH rings excludes the hole: a point in
    // the hole is inside the outer ring AND inside the hole ring
    import graft.functions.PointInPolygon
    val pt = Seq((2.0, 2.0), (0.5, 0.5)).toDF("px", "py")
    val hits = pt.crossJoin(df)
      .filter(PointInPolygon(col("px"), col("py"), col("xs"), col("ys")))
      .groupBy("px").count().as[(Double, Long)].collect().toMap
    assert(hits(2.0) == 2L) // in outer + in hole → even ring count = outside
    assert(hits(0.5) == 1L) // in outer only → odd ring count = inside
  }

  test("record ranges split into partitions") {
    val df = spark.read.format("graft-shp")
      .option("path", shp).option("idfield", "HYBAS_ID")
      .option("partitions", "4").load()
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 25)
  }
}
