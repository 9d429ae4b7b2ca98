package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class WkbPolygonSpec extends SparkSpec {
  import spark.implicits._

  private def poly(littleEndian: Boolean,
      rings: Seq[Seq[(Double, Double)]], geomType: Int = 3): Array[Byte] = {
    val n = 9 + rings.map(r => 4 + r.size * 16).sum
    val buf = ByteBuffer.allocate(n).order(
      if (littleEndian) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    buf.put(if (littleEndian) 1.toByte else 0.toByte)
    buf.putInt(geomType)
    buf.putInt(rings.size)
    rings.foreach { r =>
      buf.putInt(r.size)
      r.foreach { case (x, y) => buf.putDouble(x); buf.putDouble(y) }
    }
    buf.array()
  }

  private val square = Seq((0.0, 0.0), (4.0, 0.0), (4.0, 4.0), (0.0, 4.0), (0.0, 0.0))
  private val hole = Seq((1.0, 1.0), (2.0, 1.0), (2.0, 2.0), (1.0, 2.0), (1.0, 1.0))

  test("both byte orders decode to identical coordinates") {
    val df = Seq(poly(littleEndian = true, Seq(square)),
      poly(littleEndian = false, Seq(square))).toDF("wkb")
    val rows = df.select(WkbRingCoords.xs(col("wkb")).as("xs"),
        WkbRingCoords.ys(col("wkb")).as("ys"))
      .collect().map(r => (r.getSeq[Double](0), r.getSeq[Double](1)))
    assert(rows(0) == rows(1))
    assert(rows(0)._1 == square.map(_._1) && rows(0)._2 == square.map(_._2))
  }

  test("interior rings are addressable; exterior is the default") {
    val df = Seq(poly(littleEndian = true, Seq(square, hole))).toDF("wkb")
    val r = df.select(
      WkbRingCoords.xs(col("wkb")).as("outer"),
      WkbRingCoords.xs(col("wkb"), ring = 1).as("inner")).head()
    assert(r.getSeq[Double](0) == square.map(_._1))
    assert(r.getSeq[Double](1) == hole.map(_._1))
  }

  test("non-polygon types, bad markers, and truncation fail loudly") {
    def decodeErr(b: Array[Byte], code: Int = 0) =
      intercept[Exception](WkbRingCoords.decode(b, code)).getMessage
    assert(decodeErr(poly(littleEndian = true, Seq(square), geomType = 1))
      .contains("geometry type 1"))
    val badMarker = poly(littleEndian = true, Seq(square))
    badMarker(0) = 7
    assert(decodeErr(badMarker).contains("byte-order marker 7"))
    val truncated = poly(littleEndian = true, Seq(square)).take(30)
    assert(decodeErr(truncated).contains("truncated"))
    assert(decodeErr(poly(littleEndian = true, Seq(square)), code = 2)
      .contains("ring 1 out of range"))
  }
}
