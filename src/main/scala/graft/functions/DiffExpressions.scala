package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

import graft.io.DeletionVectors.RoaringArray

/** Native expressions backing [[graft.io.DeltaRead.changeDiff]]'s GROUPED
  * slice evaluation (the [[TextExpressions.LangIdExpr]] pattern: per-row
  * JVM code behind one static call, no CodegenFallback, no boxed UDF).
  *
  * The original form planned one DataFrame leg per changed file per commit
  * (one scan + two bitmap broadcasts + a boxed `udf` position filter each);
  * a CDC bootstrap over a long history built an O(files) plan with
  * 2×O(files) broadcasts — a driver-side planning cliff. Here the whole
  * range's slices for one change type ride ONE scan: a single broadcast
  * maps each file to its slice list, [[SliceVersionsExpr]] returns the
  * commit versions at which the scanned `(file, row_idx)` position changed,
  * and an `explode` stamps `_commit_version` — O(change types) ≤ 2 scan
  * legs regardless of how many files or commits the range touches.
  */
object DiffExpressions {

  /** One slice of one file: the positions (∈ in) ∧ (∉ notIn) changed at
    * `version`. Null bitmap = unconstrained side (the original
    * `Option[RoaringArray]` with None).
    */
  final case class SliceEntry(version: Long, in: RoaringArray,
      notIn: RoaringArray) extends Serializable

  /** Per-file slice lists keyed by scheme-free URI path (the
    * [[graft.io.DeltaRead.filesDf]] dvMap convention). A one-entry memo
    * avoids re-normalizing `_metadata.file_path` per row — rows arrive
    * clustered by file; the memo is a single immutable-pair reference so
    * cross-thread races cost a recompute, never a torn read.
    */
  final class SliceTable(val entries: Map[String, Array[SliceEntry]])
      extends Serializable {
    @transient private var memo: (String, Array[SliceEntry]) = _
    def slicesOf(file: UTF8String): Array[SliceEntry] = {
      val f = file.toString
      val m = memo
      if (m != null && m._1 == f) return m._2
      val key = new org.apache.hadoop.fs.Path(f).toUri.getPath
      val s = entries.getOrElse(key, Array.empty[SliceEntry])
      memo = (f, s)
      s
    }
  }

  private val Empty = ArrayData.toArrayData(Array.empty[Long])

  /** Versions at which position `idx` of `file` carries this change type:
    * every slice whose (in, notIn) bitmap pair admits the position. A
    * position can match several versions (insert at add, re-insert at a
    * later RESTORE) — each match is one output row after the explode.
    */
  def sliceVersions(file: UTF8String, idx: Long,
      bc: Broadcast[SliceTable]): ArrayData = {
    val slices = bc.value.slicesOf(file)
    var n = 0
    var i = 0
    while (i < slices.length) {
      val s = slices(i)
      if ((s.in == null || s.in.contains(idx)) &&
          (s.notIn == null || !s.notIn.contains(idx))) n += 1
      i += 1
    }
    if (n == 0) return Empty
    val out = new Array[Long](n)
    var j = 0
    i = 0
    while (i < slices.length) {
      val s = slices(i)
      if ((s.in == null || s.in.contains(idx)) &&
          (s.notIn == null || !s.notIn.contains(idx))) { out(j) = s.version; j += 1 }
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  /** Per-file deleted-position bitmaps keyed like [[SliceTable]] (same
    * one-entry normalization memo). Backs [[DvSurvivesExpr]].
    */
  final class DvTable(val entries: Map[String, RoaringArray])
      extends Serializable {
    @transient private var memo: (String, RoaringArray) = _
    def bitmapOf(file: UTF8String): RoaringArray = {
      val f = file.toString
      val m = memo
      if (m != null && m._1 == f) return m._2
      val key = new org.apache.hadoop.fs.Path(f).toUri.getPath
      val b = entries.getOrElse(key, null)
      memo = (f, b)
      b
    }
  }

  /** Row survives when its physical position is NOT in its file's
    * deletion-vector bitmap (file absent from the map = no vector).
    */
  def dvSurvives(file: UTF8String, idx: Long, bc: Broadcast[DvTable]): Boolean = {
    val bits = bc.value.bitmapOf(file)
    bits == null || !bits.contains(idx)
  }

  /** dv_survives(file, row_idx): the deletion-vector row filter — the
    * hot-path replacement for the boxed udf form, which allocated a
    * Hadoop Path per scanned row of every DV-bearing file and fell out
    * of whole-stage codegen.
    */
  case class DvSurvivesExpr(left: Expression, right: Expression,
      table: Broadcast[DvTable]) extends BinaryExpression {

    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def prettyName: String = "graft_dv_survives"

    override def nullSafeEval(file: Any, idx: Any): Any =
      dvSurvives(file.asInstanceOf[UTF8String], idx.asInstanceOf[Long], table)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("dvTable", table,
        classOf[Broadcast[DvTable]].getName)
      nullSafeCodeGen(ctx, ev, (f, i) =>
        s"${ev.value} = graft.functions.DiffExpressions.dvSurvives($f, $i, $bcRef);")
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** slice_versions(file, row_idx): array of commit versions at which the
    * position changed (this change type), per the broadcast slice table.
    */
  case class SliceVersionsExpr(left: Expression, right: Expression,
      table: Broadcast[SliceTable]) extends BinaryExpression {

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_slice_versions"

    override def nullSafeEval(file: Any, idx: Any): Any =
      sliceVersions(file.asInstanceOf[UTF8String],
        idx.asInstanceOf[Long], table)

    override protected def doGenCode(ctx: CodegenContext,
        ev: ExprCode): ExprCode = {
      val bcRef = ctx.addReferenceObj("sliceTable", table,
        classOf[Broadcast[SliceTable]].getName)
      nullSafeCodeGen(ctx, ev, (f, i) =>
        s"${ev.value} = graft.functions.DiffExpressions.sliceVersions($f, $i, $bcRef);")
    }

    override protected def withNewChildrenInternal(newLeft: Expression,
        newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }
}
