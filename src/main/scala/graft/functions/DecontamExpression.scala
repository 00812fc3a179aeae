package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Embedding-decontamination screen as ONE native kernel pass.
  *
  * The join form (`candidates × broadcast(eval)` with the threshold in the
  * join condition, then a per-id aggregate) evaluates the O(dim) dot
  * product TWICE for every surviving pair — once in the join condition and
  * again in the post-join projection (Catalyst offers no cross-side "let")
  * — and shuffles the surviving pairs into the aggregate. This kernel
  * folds the whole per-candidate screen into a single expression: the eval
  * matrix rides the task binary as one flat reference object (the
  * [[IvfKernel.Quantizer]] pattern — O(1) generated code regardless of
  * eval size), each candidate row computes every dot exactly once, and the
  * output is already the aggregate `[n_matched, max_sim]` — no pair rows
  * ever exist, no shuffle, the scan stays inside whole-stage codegen.
  *
  * Arithmetic is BIT-IDENTICAL to the join form (q122 hashes on it): dots
  * accumulate left-to-right in doubles ([[HashExpressions.DotF64]] fold
  * order), the candidate norm is `sqrt` of the ascending self-dot
  * ([[HashExpressions.SelfDotF64]]), eval norms precompute driver-side
  * with the same fold (IEEE sqrt is exactly rounded — deterministic
  * wherever it runs), and the similarity rounds through
  * `BigDecimal.valueOf(x).setScale(6, HALF_UP)` — exactly Spark's
  * `round(x, 6)` codegen for doubles. NaN (a zero-norm vector) follows
  * Spark's comparison semantics: NaN sorts above every double, so it
  * passes the `>=` gate and dominates the max.
  */
object DecontamKernel {

  /** The broadcastable eval slice: flat row-major matrix + per-row norms
    * + per-row ids (for the audit output — WHICH benchmark row matched).
    * Content-based equality so semantically-equal plans dedup.
    */
  final class EvalMatrix(val dim: Int, val mat: Array[Double],
      val nrm: Array[Double], val ids: Array[Long],
      val threshold: Double) extends Serializable {
    val nRows: Int = nrm.length
    override def hashCode(): Int =
      java.util.Arrays.hashCode(mat) * 31 + java.lang.Double.hashCode(threshold)
    override def equals(o: Any): Boolean = o match {
      case m: EvalMatrix => m.dim == dim && m.threshold == threshold &&
        java.util.Arrays.equals(m.mat, mat) &&
        java.util.Arrays.equals(m.nrm, nrm) &&
        java.util.Arrays.equals(m.ids, ids)
      case _ => false
    }
  }

  /** Spark's `round(x, 6)` for doubles, verbatim (NaN/Inf pass through). */
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** `[n_matched, max_sim, matched_eval_id]` for one candidate vector —
    * n_matched may be 0 (max_sim is then -Inf and the caller filters).
    * matched_eval_id is the STRONGEST match's eval id, smallest id on
    * rounded-similarity ties — the audit answer to "which benchmark did
    * this training row hit", deterministic cross-engine (DuckDB oracle:
    * min(eval_id) among rows at the max sim). Public static for the
    * generated code.
    */
  def eval(v: ArrayData, isFloat: Boolean, m: EvalMatrix): ArrayData = {
    val n = v.numElements()
    val dim = if (n < m.dim) n else m.dim
    // hoist the element accessor out of the eval loop: |eval| × dim reads
    val vv = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      vv(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    // candidate norm over the FULL vector, SelfDotF64 fold order
    var acc = 0.0
    i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      acc += x * x
      i += 1
    }
    val nrmV = math.sqrt(acc)
    var cnt = 0L
    var best = Double.NegativeInfinity
    var bestId = Long.MaxValue
    var j = 0
    while (j < m.nRows) {
      val off = j * m.dim
      var d = 0.0
      var k = 0
      while (k < dim) { d += vv(k) * m.mat(off + k); k += 1 }
      val sim = round6(d / (nrmV * m.nrm(j)))
      // Spark double ordering: NaN above everything (passes >=, wins max)
      if (sim >= m.threshold || java.lang.Double.isNaN(sim)) {
        cnt += 1L
        val simNaN = java.lang.Double.isNaN(sim)
        val bestNaN = java.lang.Double.isNaN(best)
        val stronger = sim > best || (simNaN && !bestNaN)
        val tied = sim == best || (simNaN && bestNaN)
        if (stronger) { best = sim; bestId = m.ids(j) }
        else if (tied && m.ids(j) < bestId) bestId = m.ids(j)
      }
      j += 1
    }
    new GenericArrayData(Array[Any](cnt.toDouble, best, bestId.toDouble))
  }

  /** `decontam_screen(vec)` → `array(n_matched, max_sim)` (doubles; the
    * count is exact below 2^53 — an eval slice is thousands of rows).
    */
  case class DecontamScreen(child: Expression, matrix: EvalMatrix)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "graft_decontam_screen"
    private lazy val fl = child.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"$prettyName expects array<float|double>, got $other")
    }
    override def nullSafeEval(v: Any): Any =
      DecontamKernel.eval(v.asInstanceOf[ArrayData], fl, matrix)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val mRef = ctx.addReferenceObj("evalMatrix", matrix,
        classOf[EvalMatrix].getName)
      nullSafeCodeGen(ctx, ev, v =>
        s"${ev.value} = graft.functions.DecontamKernel.eval($v, $fl, $mRef);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }
}
