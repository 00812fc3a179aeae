package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd column surface over [[graft.ext.LangModel]] — the
  * [[BpeExpressions]] pattern: per-row scoring behind one static call,
  * model resolved from the executor-local registry by id.
  */
object LmExpressions {

  /** lm_bits_per_token(text): bigram cross-entropy under the model. */
  case class LmBitsPerToken(child: Expression, modelId: String)
      extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_lm_bits_per_token"

    override def nullSafeEval(input: Any): Any =
      graft.ext.LangModel.bitsPerToken(
        input.asInstanceOf[UTF8String].toString, modelId)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idRef = ctx.addReferenceObj("modelId", modelId, "java.lang.String")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.ext.LangModel.bitsPerToken($a.toString(), $idRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
