package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-classification expressions (the [[HashExpressions]] pattern:
  * per-row JVM code behind one static call, no CodegenFallback, no UDF).
  *
  * [[LangIdExpr]] replaces the composed `split` + 5× higher-order
  * `filter(toks, isInCollection)` + CASE form of marker language ID
  * ([[graft.ext.TextAnalysis.langId]]'s original shape): higher-order
  * functions are CodegenFallback, so every reference in the CASE chain
  * re-evaluated its whole subtree — ~20 full tokenizations per row.
  * Here: ONE walk over the text, counts for all languages in a single
  * pass, argmax inline. Semantics are bit-identical to the composed form
  * (exact-token match, priority-ordered >= tie-break, all-zero → "und"),
  * which q22's DuckDB oracle pins.
  */
object TextExpressions {

  /** Compiled marker table: parallel arrays of language codes and exact
    * marker-token sets. Built once per plan (codegen reference object),
    * shared by every row of a task.
    */
  final class LangTable(markers: Seq[(String, Seq[String])]) extends Serializable {
    val langs: Array[UTF8String] =
      markers.map(m => UTF8String.fromString(m._1)).toArray
    val sets: Array[java.util.HashSet[String]] =
      markers.map { case (_, words) =>
        val s = new java.util.HashSet[String](words.size * 2)
        words.foreach(s.add)
        s
      }.toArray
  }

  private val Und = UTF8String.fromString("und")

  /** Single-pass marker count + priority argmax. Token boundaries are
    * single spaces, matching `split(text, ' ')` / DuckDB `string_split`:
    * consecutive spaces yield empty tokens, which match no marker.
    */
  def langIdEval(text: UTF8String, table: LangTable): UTF8String = {
    val s = text.toString
    val n = s.length
    val nLangs = table.sets.length
    val counts = new Array[Int](nLangs)
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        if (i > start) {
          val tok = s.substring(start, i)
          var l = 0
          while (l < nLangs) {
            if (table.sets(l).contains(tok)) counts(l) += 1
            l += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var total = 0
    var best = -1
    var bestCount = -1
    var l = 0
    while (l < nLangs) {
      total += counts(l)
      // strictly-greater scan in priority order == the CASE chain's
      // "first lang whose count >= all others"
      if (counts(l) > bestCount) { best = l; bestCount = counts(l) }
      l += 1
    }
    if (total == 0) Und else table.langs(best)
  }

  /** lang_id(text): best-marker-count language code, 'und' when no hits. */
  case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
      extends UnaryExpression {

    @transient private lazy val table = new LangTable(markers)

    override def dataType: DataType = StringType
    override def prettyName: String = "graft_lang_id"

    override def nullSafeEval(input: Any): Any =
      langIdEval(input.asInstanceOf[UTF8String], table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val tableRef = ctx.addReferenceObj("langTable", table,
        classOf[LangTable].getName)
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.TextExpressions.langIdEval($a, $tableRef);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
