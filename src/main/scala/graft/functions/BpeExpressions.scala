package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd column surface over [[graft.ext.Bpe]]: the merge loop is
  * per-row JVM code behind one static call (the [[HashExpressions]]
  * pattern — no CodegenFallback, no UDF serialization), the vocabulary is
  * resolved from the executor-local registry by id (embedded as a codegen
  * reference object, not re-shipped per row).
  */
object BpeExpressions {

  /** bpe_token_count(text): number of BPE tokens under the vocab. */
  case class BpeTokenCount(child: Expression, vocabId: String)
      extends UnaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "graft_bpe_token_count"

    override def nullSafeEval(input: Any): Any =
      graft.ext.Bpe.countTokens(input.asInstanceOf[UTF8String].toString, vocabId)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idRef = ctx.addReferenceObj("vocabId", vocabId, "java.lang.String")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.ext.Bpe.countTokens($a.toString(), $idRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** bpe_tokens(text): the token array itself (corpus analysis, explode). */
  case class BpeTokens(child: Expression, vocabId: String)
      extends UnaryExpression {

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "graft_bpe_tokens"

    override def nullSafeEval(input: Any): Any =
      BpeExpressions.tokensEval(input.asInstanceOf[UTF8String], vocabId)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val idRef = ctx.addReferenceObj("vocabId", vocabId, "java.lang.String")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.BpeExpressions.tokensEval($a, $idRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Static forwarder for codegen: UTF8String in, Catalyst array out. */
  def tokensEval(text: UTF8String, vocabId: String): GenericArrayData =
    new GenericArrayData(
      graft.ext.Bpe.encodeTokens(text.toString, vocabId)
        .map(t => UTF8String.fromString(t): Any))

  private def litStr(e: Expression, name: String): String = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: UTF8String, StringType) =>
      v.toString
    case _ => throw new IllegalArgumentException(s"$name must be a string literal")
  }

  /** SQL registrations (SparkSessionExtensions.injectFunction). */
  val registrations: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_token_count"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeTokenCount].getName, "graft_bpe_token_count"),
      (args: Seq[Expression]) => args match {
        case Seq(c, id) => BpeTokenCount(c, litStr(id, "vocabId"))
        case _ => throw new IllegalArgumentException(
          "graft_bpe_token_count(text, 'vocabId') takes 2 arguments")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_bpe_tokens"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[BpeTokens].getName, "graft_bpe_tokens"),
      (args: Seq[Expression]) => args match {
        case Seq(c, id) => BpeTokens(c, litStr(id, "vocabId"))
        case _ => throw new IllegalArgumentException(
          "graft_bpe_tokens(text, 'vocabId') takes 2 arguments")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_lm_bits_per_token"),
      new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
        classOf[LmExpressions.LmBitsPerToken].getName, "graft_lm_bits_per_token"),
      (args: Seq[Expression]) => args match {
        case Seq(c, id) => LmExpressions.LmBitsPerToken(c, litStr(id, "modelId"))
        case _ => throw new IllegalArgumentException(
          "graft_lm_bits_per_token(text, 'modelId') takes 2 arguments")
      }))
}
