package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** All six Gopher repetition-rule outputs (Rae et al. 2021 §A1.1) in
  * ONE unboxed pass over a document's token array — the fused kernel
  * that replaced q184's 4–5-shuffle explode/groupBy/distinct/join plan
  * (the round-13 verdict's top item: every output is a per-document
  * function of the token array alone, so shipping ~5 exploded copies of
  * the corpus through the shuffle was pure tax; the TextMacroBench
  * gopher arm was the heaviest corpus-stats plan at 392 s / 3M docs).
  *
  * Semantics are bit-identical to the previous relational plan (and the
  * unchanged DuckDB oracle):
  *  - `total_chars`  = Σ length(token) (code points, Spark `length`).
  *  - `topN_chars` (n = 2,3,4) = character coverage of the most frequent
  *    overlapping word n-gram (grams joined with a single space; ties
  *    broken to the SMALLEST gram in binary UTF-8 order — exactly
  *    Spark's `row_number over (order by c desc, gram asc)` and DuckDB's
  *    default collation): the distinct token positions under ALL of its
  *    occurrences, summing each covered token's length once.
  *  - `dupN_chars` (n = 5,8) = coverage of the union of positions under
  *    every n-gram occurring ≥ 2 times.
  *
  * One static call per row inside whole-stage codegen; a per-row
  * open-addressed-ish java.util.HashMap[UTF8String, positions] per n
  * (the MinhashSignature/CosineSim lesson: hot array lambdas box every
  * element — here the whole computation is primitive loops + one map).
  * Work per doc is O(Σ_n (t−n+1)·n) token bytes — the same as the
  * oracle's, but scan-bound with ZERO shuffles corpus-wide.
  *
  * Total on every non-null array (empty → all zeros) so optimizer-
  * inferred predicates can never make it throw (the q98 CSE lesson);
  * callers drop empty-token docs with a `size(tk) >= 1` filter to match
  * the oracle's absent-row contract.
  *
  * Reference: data_pipelines' quality-filter stage computes per-document
  * scores the same scan-bound way (assets/discharge/transforms.py keeps
  * per-row derivations in vectorized map steps, never shuffles them).
  */
case class GopherStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = GopherStats.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"GopherStats needs array<string>, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    GopherStats.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cls = GopherStats.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {

  val schema: StructType = StructType(Seq(
    StructField("total_chars", LongType, nullable = false),
    StructField("top2_chars", LongType, nullable = false),
    StructField("top3_chars", LongType, nullable = false),
    StructField("top4_chars", LongType, nullable = false),
    StructField("dup5_chars", LongType, nullable = false),
    StructField("dup8_chars", LongType, nullable = false)))

  private val Ns = Array(2, 3, 4, 5, 8)
  private val Space = UTF8String.fromString(" ")

  /** Growable int list without boxing. */
  private final class IntVec {
    var a: Array[Int] = new Array[Int](4)
    var n: Int = 0
    def add(v: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = v
      n += 1
    }
  }

  def compute(arr: ArrayData): InternalRow = {
    val nTok = arr.numElements()
    val toks = new Array[UTF8String](nTok)
    val lw = new Array[Long](nTok)
    var total = 0L
    var i = 0
    while (i < nTok) {
      val t = arr.getUTF8String(i)
      toks(i) = t
      val l = if (t == null) 0L else t.numChars().toLong
      lw(i) = l
      total += l
      i += 1
    }
    val out = new Array[Any](6)
    out(0) = java.lang.Long.valueOf(total)
    val covered = new Array[Boolean](nTok)
    val parts8 = new Array[UTF8String](8)

    var ni = 0
    while (ni < Ns.length) {
      val n = Ns(ni)
      val nG = nTok - n + 1
      var cv = 0L
      if (nG >= 1) {
        // count every overlapping n-gram, recording occurrence positions
        val m = new java.util.HashMap[UTF8String, IntVec](nG * 2)
        var p = 0
        while (p < nG) {
          var j = 0
          while (j < n) { parts8(j) = toks(p + j); j += 1 }
          val g =
            if (n == 2) UTF8String.concatWs(Space, parts8(0), parts8(1))
            else if (n == 3)
              UTF8String.concatWs(Space, parts8(0), parts8(1), parts8(2))
            else if (n == 4)
              UTF8String.concatWs(Space, parts8(0), parts8(1), parts8(2),
                parts8(3))
            else if (n == 5)
              UTF8String.concatWs(Space, parts8(0), parts8(1), parts8(2),
                parts8(3), parts8(4))
            else
              UTF8String.concatWs(Space, parts8(0), parts8(1), parts8(2),
                parts8(3), parts8(4), parts8(5), parts8(6), parts8(7))
          var v = m.get(g)
          if (v == null) { v = new IntVec; m.put(g, v) }
          v.add(p)
          p += 1
        }
        java.util.Arrays.fill(covered, 0, nTok, false)
        if (n <= 4) {
          // most frequent gram, ties to the binary-smallest gram string
          var bestG: UTF8String = null
          var bestV: IntVec = null
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val e = it.next()
            val v = e.getValue
            if (bestV == null || v.n > bestV.n ||
                (v.n == bestV.n && e.getKey.compareTo(bestG) < 0)) {
              bestG = e.getKey
              bestV = v
            }
          }
          var k = 0
          while (k < bestV.n) {
            val s = bestV.a(k)
            var q = s
            while (q < s + n) { covered(q) = true; q += 1 }
            k += 1
          }
        } else {
          // union of positions under every duplicated gram
          val it = m.entrySet().iterator()
          while (it.hasNext) {
            val v = it.next().getValue
            if (v.n >= 2) {
              var k = 0
              while (k < v.n) {
                val s = v.a(k)
                var q = s
                while (q < s + n) { covered(q) = true; q += 1 }
                k += 1
              }
            }
          }
        }
        var q = 0
        while (q < nTok) {
          if (covered(q)) cv += lw(q)
          q += 1
        }
      }
      out(ni + 1) = java.lang.Long.valueOf(cv)
      ni += 1
    }
    new GenericInternalRow(out)
  }

  /** Column-level entry point. */
  def apply(c: Column): Column =
    GraftColumnBridge.toColumn(GopherStats(GraftColumnBridge.toExpression(c)))
}
