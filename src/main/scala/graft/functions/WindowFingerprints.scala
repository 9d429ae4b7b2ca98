package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression computing every `span`-token Karp-Rabin
  * window fingerprint of a pre-hashed token array in one unboxed pass.
  *
  * Semantically identical to
  * `transform(sequence(1, greatest(n - span + 1, 1)), i ->
  *    aggregate(slice(hs, i, span), 0L, (acc, h) -> (acc*1000003 + h) % p))`
  * (q57/q98's proven cross-engine fold recipe), but the builtin form
  * allocates a slice per window and boxes every element — O(n·span)
  * boxed longs per document. Here it is a primitive nested while-loop
  * (same arithmetic, same O(n·span) work, zero allocation beyond the
  * output), one static call per row inside whole-stage codegen. Inputs
  * shorter than `span` yield one fingerprint of the whole (possibly
  * empty) array — total, so optimizer-inferred predicates can evaluate
  * it on rows an upstream size filter drops (the q98 CSE lesson).
  *
  * The default modulus is the 43-bit prime 8999999999993 — the widest
  * fold that stays DuckDB-BIGINT-replayable: acc·1000003 + h peaks at
  * (p−1)·1000003 + 1000000006 ≈ 9.00e18 < 2^63. The original 31-bit
  * 2147483647 fold had expected colliding window PAIRS ≈ N²/2³² —
  * ~10⁶ false pairs at 10⁸ windows, which silently excised NON-duplicate
  * text in the q202 rewrite (round-14 verdict). 43 bits brings that to
  * ~10³ candidates, and the rewrite additionally exact-verifies window
  * CONTENT before cutting, so fold collisions can no longer destroy
  * text. Inputs must be < 1000000007 (the md5Hash64 % 1000000007 token
  * hash space) for the overflow bound to hold.
  */
case class WindowFingerprints(child: Expression, span: Int,
    mod: Long = WindowFingerprints.DefaultMod)
    extends UnaryExpression {
  require(span >= 1, s"WindowFingerprints needs span >= 1, got $span")
  require(mod >= 2 && mod <= WindowFingerprints.MaxMod,
    s"WindowFingerprints modulus $mod outside [2, ${WindowFingerprints.MaxMod}]" +
      " — the int64 overflow bound for the fold")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override protected def nullSafeEval(input: Any): Any =
    WindowFingerprints.compute(input.asInstanceOf[ArrayData], span, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = WindowFingerprints.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c, $span, ${mod}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): WindowFingerprints =
    copy(child = newChild)
}

object WindowFingerprints {
  private val Mult = 1000003L

  /** 43-bit prime: largest "round" prime below 9·10¹² keeping the fold
    * exact in int64 on BOTH engines (see class doc). */
  val DefaultMod = 8999999999993L

  /** (2^63 − maxTokenHash) / mult — any modulus above this can overflow. */
  val MaxMod: Long = (Long.MaxValue - 1000000006L) / Mult

  def compute(arr: ArrayData, span: Int, mod: Long): ArrayData = {
    val n = arr.numElements()
    val nOut = math.max(n - span + 1, 1)
    val out = new Array[Long](nOut)
    var i = 0
    while (i < nOut) {
      var acc = 0L
      var j = i
      val end = math.min(i + span, n)
      while (j < end) {
        acc = (acc * Mult + arr.getLong(j)) % mod
        j += 1
      }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Column-level entry point. */
  def apply(c: Column, span: Int): Column =
    GraftColumnBridge.toColumn(
      WindowFingerprints(GraftColumnBridge.toExpression(c), span))

  /** Column-level entry point with an explicit modulus (tests engineer
    * prefilter collisions through a tiny modulus; production uses the
    * default). */
  def apply(c: Column, span: Int, mod: Long): Column =
    GraftColumnBridge.toColumn(
      WindowFingerprints(GraftColumnBridge.toExpression(c), span, mod))
}
