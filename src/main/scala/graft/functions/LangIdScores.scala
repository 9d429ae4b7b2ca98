package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.LangIdModel

/** Fused language-ID inference kernel: ONE unboxed pass per document
  * over the space-joined token stream — code-point-bigram counts into a
  * per-row hash map, one md5 per DISTINCT bigram (documents repeat
  * bigrams heavily; the oracle's per-occurrence sum is equal because
  * the bag-sum is order-independent integer arithmetic), then all
  * nLangs scores accumulate in one loop (the GopherStats shape: a
  * per-row stat never justifies a shuffle, and hot array lambdas box
  * every element). The trained [[LangIdModel]] rides into codegen as a
  * reference object — weights load once per executor, never per row.
  *
  * Output struct: (pred string, scores array<long>) — scores in model
  * language order; pred = first max (model-order tie rule), exactly
  * [[graft.operators.LangId.predSql]]'s CASE.
  *
  * Total on every non-null string (empty → bias-only scores) so
  * optimizer-inferred predicates can never make it throw.
  */
case class LangIdScores(child: Expression, model: LangIdModel)
    extends UnaryExpression {

  override def dataType: DataType = LangIdScores.schema
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"LangIdScores needs string, got $other")
    }
  }

  override protected def nullSafeEval(input: Any): Any =
    LangIdScores.compute(model, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("langIdModel", model,
      classOf[LangIdModel].getName)
    val cls = LangIdScores.getClass.getName.stripSuffix("$")
    defineCodeGen(ctx, ev, c => s"$cls.compute($ref, $c)")
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdScores =
    copy(child = newChild)
}

object LangIdScores {

  val schema: StructType = StructType(Seq(
    StructField("pred", StringType, nullable = false),
    StructField("scores", ArrayType(LongType, containsNull = false),
      nullable = false)))

  def compute(model: LangIdModel, s: UTF8String): InternalRow = {
    val scores = model.scoresOfJoined(s.toString)
    new GenericInternalRow(Array[Any](
      UTF8String.fromString(model.predict(scores)),
      new GenericArrayData(scores)))
  }

  /** Column-level entry point over the PRE-JOINED token stream. */
  def apply(c: Column, model: LangIdModel): Column =
    GraftColumnBridge.toColumn(
      LangIdScores(GraftColumnBridge.toExpression(c), model))
}
