package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, IntegerType}

/** ISO WKB polygon decode (OGC 06-103r4 §8) — the geometry wire format
  * the reference's geopandas/shapely world interchanges (hydrobasins
  * parquet carries shapely geometries as WKB). Extracts one coordinate
  * axis of the EXTERIOR ring as `array<double>`, feeding the existing
  * vertex-array kernels ([[PointInPolygon]], GridOps zonal, the q113
  * shoelace folds) without any native geometry dependency.
  *
  * Spec coverage, honest boundaries: both byte orders (0 XDR / 1 NDR);
  * geometry type must be 3 (Polygon) — anything else (points, lines,
  * multi*, Z/M variants, EWKB SRID flags) fails loudly; interior rings
  * are permitted and ignored here (holes are a containment concern —
  * callers needing them decode ring > 0 via the `ring` argument).
  * Doubles are raw IEEE bits, so the round trip is exact by
  * construction.
  */
case class WkbRingCoords(wkb: Expression, axisAndRing: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = wkb
  override def right: Expression = axisAndRing
  override def inputTypes: Seq[DataType] = Seq(BinaryType, IntegerType)
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(w: Any, a: Any): Any =
    WkbRingCoords.decode(w.asInstanceOf[Array[Byte]], a.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WkbRingCoords.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, (w, a) => s"$cls.decode($w, $a)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): WkbRingCoords =
    copy(wkb = newLeft, axisAndRing = newRight)
}

object WkbRingCoords {

  /** `code` = axis (0 = x, 1 = y) + 2 * ringIndex. Returns the chosen
    * axis of the chosen ring.
    */
  def decode(wkb: Array[Byte], code: Int): ArrayData = {
    val axis = code & 1
    val ring = code >> 1
    require(wkb.length >= 9, s"WKB too short: ${wkb.length} bytes")
    val bo = wkb(0) match {
      case 0 => java.nio.ByteOrder.BIG_ENDIAN
      case 1 => java.nio.ByteOrder.LITTLE_ENDIAN
      case b => sys.error(s"WKB byte-order marker $b invalid (need 0 or 1)")
    }
    val buf = java.nio.ByteBuffer.wrap(wkb, 1, wkb.length - 1).order(bo)
    val geomType = buf.getInt
    require(geomType == 3,
      s"WKB geometry type $geomType unsupported (need 3 = Polygon; " +
        "points/lines/multi/Z/M/EWKB are out of scope)")
    val nRings = buf.getInt
    require(ring >= 0 && ring < nRings,
      s"ring $ring out of range (polygon has $nRings rings)")
    var r = 0
    while (r < ring) { // skip preceding rings
      val n = buf.getInt
      buf.position(buf.position() + n * 16)
      r += 1
    }
    val n = buf.getInt
    require(buf.remaining() >= n * 16,
      s"WKB truncated: ring claims $n points, ${buf.remaining()} bytes left")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      val x = buf.getDouble
      val y = buf.getDouble
      out(i) = if (axis == 0) x else y
      i += 1
    }
    new GenericArrayData(out)
  }

  /** xs of ring `ring` (default exterior). */
  def xs(wkb: Column, ring: Int = 0): Column = coords(wkb, 0, ring)

  /** ys of ring `ring` (default exterior). */
  def ys(wkb: Column, ring: Int = 0): Column = coords(wkb, 1, ring)

  private def coords(wkb: Column, axis: Int, ring: Int): Column =
    GraftColumnBridge.toColumn(WkbRingCoords(
      GraftColumnBridge.toExpression(wkb),
      org.apache.spark.sql.catalyst.expressions.Literal(axis + 2 * ring)))
}
