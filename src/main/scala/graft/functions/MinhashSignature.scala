package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing a full k-wide MinHash signature
  * from an array of pre-hashed shingles in ONE unboxed pass.
  *
  * Semantically identical to
  * `transform(sequence(0, k-1), j -> array_min(transform(shh, h -> xxhash64(h, j))))`
  * (bit-for-bit: XXH64.hashInt(j, XXH64.hashLong(h, 42)) is exactly what
  * the builtin xxhash64(h, j) computes), but the builtin formulation
  * allocates k intermediate arrays and boxes every element — at 1M docs ×
  * 39 shingles × k=64 that is 2.5B boxed longs through array_min. Here
  * it is two nested while-loops over primitive longs, one static call
  * per row inside whole-stage codegen.
  */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {
  require(k >= 1, s"MinhashSignature needs k >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    MinhashSignature.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = MinhashSignature.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $k)")
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {

  /** min_j over the array of XXH64.hashInt(j, XXH64.hashLong(h, 42)) —
    * the exact bit pattern of the builtin xxhash64(h, j). An empty input
    * yields a signature of Long.MaxValue sentinels (callers filter empty
    * shingle sets before signing).
    */
  def compute(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) { base(i) = XXH64.hashLong(arr.getLong(i), 42L); i += 1 }
    val out = new Array[Long](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      i = 0
      while (i < n) {
        val h = XXH64.hashInt(j, base(i))
        if (h < m) m = h
        i += 1
      }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(c: Column, k: Int): Column =
    GraftColumnBridge.toColumn(
      MinhashSignature(GraftColumnBridge.toExpression(c), k))
}
