package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Banded random-hyperplane LSH signature of an embedding vector:
  * `bands` independent hash tables of `bits` sign-bits each, returned as
  * one packed long per band. Near-dup candidates meet when ANY band
  * matches — the multi-table banding that keeps in-bucket pair counts
  * bounded as the corpus grows (a single fixed-width bucket is O((n/2^bits)²);
  * with B bands of wider buckets, recall is recovered from bucket width
  * by the union over bands, same shape as MinHash banding).
  *
  * Hyperplanes are Rademacher (±1) weights derived from the low 60 bits
  * of `md5("b_i_d")` — the engine-independent hash this repo already
  * shares with its DuckDB oracle (Dedup.md5Hash64) — so the oracle can
  * rebuild the EXACT signatures. Each sign bit is the left-to-right
  * index-order fold `sum_d w(b,i,d) * v[d] >= 0`; the fixed fold order
  * makes the double sum bit-reproducible by `list_reduce(list(t ORDER BY
  * d)))` on the oracle side (a plain SQL `sum()` would be
  * order-nondeterministic and could flip a near-zero sign).
  *
  * One unboxed two-loop pass per row inside whole-stage codegen (the
  * builtin-functions formulation would be bands×bits aggregate lambdas,
  * each boxing every element).
  */
case class HyperplaneBands(child: Expression, bands: Int, bits: Int)
    extends UnaryExpression with ImplicitCastInputTypes {
  require(bands >= 1 && bits >= 1 && bits <= 62,
    s"HyperplaneBands needs bands >= 1 and 1 <= bits <= 62, got ($bands, $bits)")

  // SQL callers pass float/decimal arrays; coerce to doubles
  override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBands.compute(input.asInstanceOf[ArrayData], bands, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = HyperplaneBands.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $bands, $bits)")
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
    copy(child = newChild)
}

object HyperplaneBands {

  private val cache = new ConcurrentHashMap[(Int, Int, Int), Array[Double]]()

  /** ±1 weight for (band, bit, dim d): +1 iff the low 60 bits of
    * md5("b_i_d") are even — DuckDB:
    * `CAST('0x' || substr(md5(b||'_'||i||'_'||d), 18, 15) AS BIGINT) % 2 = 0`.
    * Layout: [(b*bits + i)*dim + d], computed once per JVM per shape.
    */
  def signs(bands: Int, bits: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((bands, bits, dim), { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Double](bands * bits * dim)
      var b = 0
      while (b < bands) {
        var i = 0
        while (i < bits) {
          var d = 0
          while (d < dim) {
            md.reset()
            val hex = md.digest(s"${b}_${i}_${d}".getBytes("UTF-8"))
              .map("%02x".format(_)).mkString
            val key = java.lang.Long.parseLong(hex.substring(17, 32), 16)
            out((b * bits + i) * dim + d) = if (key % 2 == 0) 1.0 else -1.0
            d += 1
          }
          i += 1
        }
        b += 1
      }
      out
    })

  /** `bands` packed signatures; bit i of band b is set iff the d-order
    * fold of w(b,i,·)·v is >= 0.
    */
  def compute(v: ArrayData, bands: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val w = signs(bands, bits, dim)
    val nPlanes = bands * bits
    val acc = new Array[Double](nPlanes)
    var d = 0
    while (d < dim) {
      val x = v.getDouble(d)
      var t = 0
      while (t < nPlanes) {
        acc(t) += w(t * dim + d) * x
        t += 1
      }
      d += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bv = 0L
      var i = 0
      while (i < bits) {
        if (acc(b * bits + i) >= 0) bv |= (1L << i)
        i += 1
      }
      out(b) = bv
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Column entry point; accepts array<float> or array<double> (floats
    * widen exactly, matching the oracle's CAST(... AS DOUBLE[])).
    */
  def apply(v: Column, bands: Int, bits: Int): Column =
    GraftColumnBridge.toColumn(HyperplaneBands(
      GraftColumnBridge.toExpression(v.cast("array<double>")), bands, bits))
}
