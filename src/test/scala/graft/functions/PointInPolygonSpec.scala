package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Even-odd ray-cast containment kernel: concave shapes, the notch cases
  * a bbox join gets wrong, and codegen survival inside a projection.
  */
class PointInPolygonSpec extends SparkSpec {
  import spark.implicits._

  // concave L: (0,0)→(3,0)→(3,1)→(1,1)→(1,3)→(0,3); the notch is the
  // open square (1,1)–(3,3) minus the bottom arm
  private val lxs = Seq(0.0, 3.0, 3.0, 1.0, 1.0, 0.0)
  private val lys = Seq(0.0, 0.0, 1.0, 1.0, 3.0, 3.0)

  private def containsL(px: Double, py: Double): Boolean = {
    val df = Seq((px, py)).toDF("px", "py")
      .withColumn("xs", typedLit(lxs))
      .withColumn("ys", typedLit(lys))
    df.select(PointInPolygon(col("px"), col("py"), col("xs"), col("ys"))
      .as("in")).as[Boolean].head()
  }

  test("points in both arms of a concave L are inside") {
    assert(containsL(2.5, 0.5))  // bottom arm
    assert(containsL(0.5, 2.5))  // left arm
    assert(containsL(0.5, 0.5))  // corner block
  }

  test("points in the concave notch are OUTSIDE (the bbox-join failure case)") {
    assert(!containsL(2.0, 2.0))
    assert(!containsL(2.5, 1.5))
    assert(!containsL(1.5, 2.5))
    // but all of these ARE inside the L's bounding box
    assert(2.0 >= lxs.min && 2.0 <= lxs.max && 2.0 >= lys.min && 2.0 <= lys.max)
  }

  test("points clearly outside the envelope are outside") {
    assert(!containsL(-0.5, 0.5))
    assert(!containsL(3.5, 0.5))
    assert(!containsL(0.5, 3.5))
  }

  test("vertex order (cw vs ccw) does not change even-odd containment") {
    val df = Seq((2.5, 0.5), (2.0, 2.0), (0.5, 2.5)).toDF("px", "py")
      .withColumn("xs", typedLit(lxs.reverse))
      .withColumn("ys", typedLit(lys.reverse))
    val got = df.select(
      PointInPolygon(col("px"), col("py"), col("xs"), col("ys")).as("in"))
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true))
  }

  test("kernel agrees with an independent awt-free reference on a point cloud") {
    // ground truth for the L by region decomposition
    def truth(x: Double, y: Double): Boolean =
      (x > 0 && x < 3 && y > 0 && y < 1) || (x > 0 && x < 1 && y > 0 && y < 3)
    val pts = for (i <- 0 to 14; j <- 0 to 14)
      yield (i * 0.25 - 0.375, j * 0.25 - 0.375) // off-boundary lattice
    val df = pts.toDF("px", "py")
      .withColumn("xs", typedLit(lxs)).withColumn("ys", typedLit(lys))
    val got = df.select(col("px"), col("py"),
      PointInPolygon(col("px"), col("py"), col("xs"), col("ys")).as("in"))
      .as[(Double, Double, Boolean)].collect()
    got.foreach { case (x, y, in) => assert(in == truth(x, y), s"($x,$y)") }
  }

  test("survives codegen composed with other expressions") {
    val got = spark.range(0, 6)
      .select((col("id").cast("double") * 0.5 + 0.25).as("px"))
      .withColumn("py", lit(0.5))
      .withColumn("xs", typedLit(lxs)).withColumn("ys", typedLit(lys))
      .select(when(
        PointInPolygon(col("px"), col("py"), col("xs"), col("ys")), 1)
        .otherwise(0).as("n"))
      .as[Int].collect().toSeq
    // px = 0.25, 0.75, ..., 2.75 at py=0.5 → all inside the bottom arm
    assert(got == Seq(1, 1, 1, 1, 1, 1))
  }
}
