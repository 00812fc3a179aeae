package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression — the standard first text
  * pass of a training-data pipeline (HF tokenizers' `NFC`/`NFKC`
  * normalizers; the same logical byte sequence arrives precomposed from
  * one crawl source and decomposed from another, and every downstream
  * exact/near-dup fingerprint, token count and filter treats them as
  * different documents unless someone canonicalizes first).
  *
  * Spark ships no normalization builtin, so the composed alternative is a
  * Scala UDF — serialization per row, no codegen. This is the
  * [[TextExpressions.LangIdExpr]] pattern instead: static kernel + a
  * `doGenCode` that inlines a single static call, so the scan stays in
  * whole-stage codegen. The kernel fast-paths pure-ASCII strings (the
  * overwhelming majority of crawl text) with a byte scan — ASCII is
  * normalization-invariant under all four forms, so those rows never
  * materialize a java.lang.String or run the ICU-style decomposition.
  *
  * Forms: NFC / NFD / NFKC / NFKD (`java.text.Normalizer` — the JDK's
  * conformant implementation of UAX #15). DuckDB's `nfc_normalize`
  * provides the cross-engine oracle for the NFC form (q126).
  */
object NormalizeExpression {

  /** Public static for generated code. */
  def normalizeEval(s: UTF8String, form: Normalizer.Form): UTF8String = {
    // ASCII fast path: all normalization forms are the identity on ASCII
    val n = s.numBytes()
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s
    val str = s.toString
    if (Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(Normalizer.normalize(str, form))
  }

  /** `unicode_normalize(text)` in the given form (default NFC). */
  case class UnicodeNormalize(child: Expression, formName: String = "NFC")
      extends UnaryExpression {

    @transient private lazy val form = Normalizer.Form.valueOf(formName)

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_unicode_normalize"

    override def nullSafeEval(input: Any): Any =
      normalizeEval(input.asInstanceOf[UTF8String], form)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val formRef = ctx.addReferenceObj("nfForm", form,
        classOf[Normalizer.Form].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.NormalizeExpression.normalizeEval($a, $formRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
