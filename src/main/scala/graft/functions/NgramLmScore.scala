package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.NgramLmModel

/** Fused n-gram LM scoring kernel: ONE unboxed pass per document over
  * the space-joined token stream — each code-point trigram window looks
  * up its quantized log-prob (trigram table → context table → global
  * default, the smoothed backoff of operators/NgramLm.scala) and the
  * totals accumulate in Long. The trained [[NgramLmModel]] rides into
  * codegen as a reference object — tables load once per executor,
  * never per row (the LangIdScores shape: a per-row stat never
  * justifies a shuffle).
  *
  * Output struct: (lm_q long, n_grams long) — the exact-integer total
  * quantized log-prob and the trigram-window count. Total on every
  * non-null string (under-3-codepoint inputs → (0, 0)) so optimizer-
  * inferred predicates can never make it throw.
  */
case class NgramLmScore(child: Expression, model: NgramLmModel)
    extends UnaryExpression {

  override def dataType: DataType = NgramLmScore.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"NgramLmScore needs string, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    NgramLmScore.compute(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ngramLmModel", model,
      classOf[NgramLmModel].getName)
    val cls = NgramLmScore.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): NgramLmScore =
    copy(child = newChild)
}

object NgramLmScore {

  val schema: StructType = StructType(Seq(
    StructField("lm_q", LongType, nullable = false),
    StructField("n_grams", LongType, nullable = false)))

  def compute(model: NgramLmModel, s: UTF8String): InternalRow = {
    val (total, n) = model.scoreJoined(s.toString)
    new GenericInternalRow(Array[Any](total, n))
  }

  /** Column-level entry point over the PRE-JOINED token stream. */
  def apply(c: Column, model: NgramLmModel): Column =
    GraftColumnBridge.toColumn(
      NgramLmScore(GraftColumnBridge.toExpression(c), model))
}
