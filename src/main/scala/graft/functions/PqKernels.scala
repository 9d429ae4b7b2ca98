package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Product-quantization hot kernels as fused codegen Expressions — the
  * unboxed scale path behind q157's relational shape (the
  * MinhashSignature/CosineSim lesson: at millions of rows the composed
  * join + groupBy argmin pays a 40M-row shuffle and boxed lambdas; the
  * kernel encodes in ONE pass with zero shuffle).
  *
  * [[PqEncode]](vec, cb) → m codeword ids: vec is the quantized long
  * vector (dim = m·ds), cb the flattened codebook (m·k·ds longs, subspace
  * -major then codeword then dim); argmin by exact integer squared L2,
  * ties to the smaller codeword id — identical to the relational
  * min_by(struct(dist, j)) and to the oracle's row_number replay.
  *
  * [[AdcLookup]](codes, table) → Σ_m table[m·k + codes[m]] — the
  * asymmetric-distance scan: 8 array lookups + adds per row, no
  * full-vector arithmetic at query time.
  */
case class PqEncode(vec: Expression, cb: Expression, m: Int, k: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = vec
  override def right: Expression = cb
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    PqEncode.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], m, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = PqEncode.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $cls.encode($a, $b, $m, $k);""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PqEncode =
    copy(vec = newLeft, cb = newRight)
}

object PqEncode {
  def encode(v: ArrayData, cb: ArrayData, m: Int, k: Int): ArrayData = {
    val dim = v.numElements()
    val ds = dim / m
    val out = new Array[Long](m)
    var mi = 0
    while (mi < m) {
      var bestJ = 0
      var bestD = Long.MaxValue
      var j = 0
      while (j < k) {
        var d = 0L
        var t0 = 0
        val vOff = mi * ds
        val cOff = (mi * k + j) * ds
        while (t0 < ds) {
          val df = v.getLong(vOff + t0) - cb.getLong(cOff + t0)
          d += df * df
          t0 += 1
        }
        if (d < bestD) { bestD = d; bestJ = j } // strict: ties keep smaller j
        j += 1
      }
      out(mi) = bestJ.toLong
      mi += 1
    }
    new GenericArrayData(out)
  }

  def apply(vec: Column, cb: Column, m: Int, k: Int): Column =
    GraftColumnBridge.toColumn(PqEncode(
      GraftColumnBridge.toExpression(vec),
      GraftColumnBridge.toExpression(cb), m, k))
}

case class AdcLookup(codes: Expression, table: Expression, k: Int)
    extends BinaryExpression with ImplicitCastInputTypes {

  override def left: Expression = codes
  override def right: Expression = table
  override def inputTypes: Seq[DataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any =
    AdcLookup.adc(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = AdcLookup.getClass.getName.stripSuffix("$")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = $cls.adc($a, $b, $k);""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcLookup =
    copy(codes = newLeft, table = newRight)
}

object AdcLookup {
  def adc(codes: ArrayData, tab: ArrayData, k: Int): Long = {
    val m = codes.numElements()
    var s = 0L
    var i = 0
    while (i < m) {
      s += tab.getLong(i * k + codes.getLong(i).toInt)
      i += 1
    }
    s
  }

  def apply(codes: Column, table: Column, k: Int): Column =
    GraftColumnBridge.toColumn(AdcLookup(
      GraftColumnBridge.toExpression(codes),
      GraftColumnBridge.toExpression(table), k))
}
