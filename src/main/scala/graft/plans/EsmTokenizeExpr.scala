package graft.plans

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.EsmTokenizer

/** Native Catalyst expression for ESM-2 tokenization (reference hot spot:
  * `process_to_curated.py:22-29` tokenizes 2.68 M rows one Python call at a
  * time). The UDF form already distributes the work; this form additionally
  * removes the UDF's serialization boundary — the generated code writes the
  * fixed-width token ids directly into an `UnsafeArrayData`, staying inside
  * whole-stage codegen.
  */
case class EsmTokenizeExpr(child: Expression, maxLength: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[StringType]) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_esm_tokenize requires a string argument, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_esm_tokenize"

  override def nullSafeEval(input: Any): Any =
    EsmTokenizer.tokenizeArrayData(input.asInstanceOf[UTF8String].toString, maxLength)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.EsmTokenizer.tokenizeArrayData($c.toString(), $maxLength)")

  override protected def withNewChildInternal(newChild: Expression): EsmTokenizeExpr =
    copy(child = newChild)
}

object EsmTokenizeExpr {
  def apply(c: Column, maxLength: Int): Column =
    GraftColumnBridge.column(EsmTokenizeExpr(GraftColumnBridge.expression(c), maxLength))
}
