package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the scale-path (xxhash64-family) dedup
  * kernels.
  *
  * Why native expressions and not composed built-ins: a k-wide MinHash
  * written as k stacked higher-order functions builds an expression tree
  * that (a) Catalyst re-inlines into every use site (CollapseProject), and
  * (b) runs interpreted per lambda call (HOFs have no codegen and no
  * common-subexpression elimination) — measured 10-60× slower than this
  * single node, with minutes of analyzer time on the duplicated trees. One
  * expression = one pass over the shingle array in tight JVM code.
  *
  * (Preference order per SURVEY §7.3: compose built-ins where semantics
  * allow — done for the engine-portable md5 family — custom Expression where
  * they don't scale.)
  */
object HashExpressions {

  private def utf8Hash(s: org.apache.spark.unsafe.types.UTF8String, seed: Long): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, seed)

  /** minhash_bands(tokens, shingleN, k, bands): LSH band hashes of a k-wide
    * xxhash64 MinHash signature over word-`shingleN`-gram shingles, in one
    * pass: each shingle's bytes are assembled once into a reused buffer, its
    * k seeded hashes update k running minima, and band b is one xxhash64 mix
    * over its `rowsPerBand` minima. Shingle de-duplication is deliberately
    * skipped — a multiset has the same minima as its set. Returns
    * array<bigint> of length `bands`.
    */
  case class MinHashBands(child: Expression, shingleN: Int, k: Int, bands: Int)
      extends UnaryExpression {
    require(k > 0 && bands > 0 && k % bands == 0, s"k=$k must divide into bands=$bands")
    require(shingleN > 0, "shingleN must be positive")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_bands"

    override def nullSafeEval(input: Any): Any =
      HashExpressions.minhashBandsEval(
        input.asInstanceOf[ArrayData], shingleN, k, bands)

    // Generated code calls the static forwarder of the kernel directly —
    // keeps the whole stage codegen'd (no CodegenFallback row
    // materialization / boxed eval) while the loop stays in compiled Scala.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.minhashBandsEval($a, $shingleN, $k, $bands);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  // Deterministic affine-mixing constants for [[minhashMins]]: h_j =
  // base·A(j) + B(j) over Z_2^64 (A odd ⇒ each j is a PERMUTATION of the
  // base-hash order — the standard one-hash k-permutation MinHash
  // construction). Grown on demand, cached across rows/tasks.
  @volatile private var mixA: Array[Long] = Array.emptyLongArray
  @volatile private var mixB: Array[Long] = Array.emptyLongArray
  private def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
  private def ensureMix(k: Int): Unit = if (mixA.length < k) synchronized {
    if (mixA.length < k) {
      val a = new Array[Long](k); val b = new Array[Long](k)
      var j = 0
      while (j < k) {
        a(j) = splitmix64(2L * j) | 1L
        b(j) = splitmix64(2L * j + 1L)
        j += 1
      }
      mixB = b; mixA = a
    }
  }

  /** k running minima over word-`shingleN`-gram shingles of a token array —
    * the shared kernel of [[MinHashBands]] and [[MinHashSig]]. Shingle
    * de-duplication is deliberately skipped: a multiset has the same minima
    * as its set.
    *
    * One-hash construction (r14 opt): each token's bytes hash ONCE
    * (xxhash64), each shingle's base is a hashLong chain over its
    * shingleN token hashes (no byte re-assembly, no k byte-passes), and
    * minimum j tracks the affine permutation base·A(j)+B(j). The old
    * kernel ran k full xxhash64 byte passes per shingle — measured 2.5-3×
    * slower end-to-end on the fingerprint stage with statistically
    * equivalent sketches (q32's sketch-vs-exact bound re-verified at all
    * three SFs after the switch; the LSH recall specs hold).
    */
  def minhashMins(arr: ArrayData, shingleN: Int, k: Int): Array[Long] = {
    val n = arr.numElements()
    val mins = Array.fill(k)(Long.MaxValue)
    if (n < shingleN) return mins
    ensureMix(k)
    val ma = mixA; val mb = mixB
    val th = new Array[Long](n)
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      th(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 7L)
      i += 1
    }
    i = 0
    while (i <= n - shingleN) {
      var base = -7046029254386353131L
      var t = 0
      while (t < shingleN) { base = XXH64.hashLong(th(i + t), base); t += 1 }
      var j = 0
      while (j < k) {
        val h = base * ma(j) + mb(j)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    mins
  }

  /** Kernel for [[MinHashBands]]: one pass over the token array. Public so
    * generated code can call it via the object's static forwarder.
    */
  def minhashBandsEval(arr: ArrayData, shingleN: Int, k: Int, bands: Int): ArrayData = {
    val mins = minhashMins(arr, shingleN, k)
    val r = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = XXH64.hashLong(b, 42L)
      var j = 0
      while (j < r) {
        acc = XXH64.hashLong(mins(b * r + j), acc)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** Kernel for [[MinHashSig]]. */
  def minhashSigEval(arr: ArrayData, shingleN: Int, k: Int): ArrayData =
    new GenericArrayData(minhashMins(arr, shingleN, k))

  /** minhash_sig(tokens, shingleN, k): the raw k-wide xxhash64 MinHash
    * signature (un-banded minima) — the per-document input of the
    * corpus-level sketch AGGREGATE, which then only merges k longs per doc
    * instead of re-hashing shingle strings through a typed encoder.
    */
  case class MinHashSig(child: Expression, shingleN: Int, k: Int)
      extends UnaryExpression {
    require(k > 0 && shingleN > 0, "k and shingleN must be positive")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_sig"

    override def nullSafeEval(input: Any): Any =
      HashExpressions.minhashSigEval(input.asInstanceOf[ArrayData], shingleN, k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.minhashSigEval($a, $shingleN, $k);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** dot_f64(a, b): sequential left-to-right double-precision dot product
    * over two numeric arrays — bit-identical to
    * `aggregate(zip_with(a, b, (x,y) -> x*y), 0d, (acc,x) -> acc+x)` but a
    * tight loop instead of two interpreted higher-order functions (the HOF
    * version dominates the k-NN join profile).
    */
  case class DotF64(left: Expression, right: Expression)
      extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_dot"

    private def isFloat(e: Expression): Boolean = e.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"graft_dot expects array<float|double>, got $other")
    }
    private lazy val leftFloat = isFloat(left)
    private lazy val rightFloat = isFloat(right)

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      acc
    }

    // True codegen: the dot loop inlines into the whole-stage generated
    // function. This expression sits inside the O(pairs²) projection of the
    // similarity joins — a CodegenFallback here boxes one Double per pair
    // and forces row materialization for the stage.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val x = if (leftFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val y = if (rightFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) { $acc += $x * $y; }
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** simhash64(tokens): 64-bit SimHash over xxhash64 token hashes — each
    * token's hash votes ±1 on all 64 bit positions; the sign of each total is
    * the fingerprint bit.
    */
  case class SimHash64(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"

    override def nullSafeEval(input: Any): Any =
      HashExpressions.simhash64Eval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.simhash64Eval($a);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Kernel for [[SimHash64]]. Public for the generated-code static call. */
  def simhash64Eval(arr: ArrayData): Long = {
    val n = arr.numElements()
    val votes = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = utf8Hash(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** ngram_hashes(tokens, minN, maxN): xxhash64 (seed 42 — the seed of
    * Spark's `xxhash64` function) of every word n-gram's space-joined
    * bytes, for each n in [minN, maxN], as one array<bigint>. BIT-IDENTICAL
    * per gram to `xxhash64(concat_ws(' ', slice(tokens, i, n)))` — callers
    * that previously composed that transform/slice/concat_ws HOF chain keep
    * their hash values exactly — but the grams for all starts assemble into
    * one reused buffer in a single compiled pass instead of O(n · grams)
    * interpreted element copies (HOFs are CodegenFallback; the b40 lesson).
    * The gram STRING never materializes: only its 8-byte hash leaves the
    * kernel, which is the guide-§2.3 "shuffle keys, not payloads" shape for
    * every n-gram consumer (decontamination, DSIR features, classifier
    * features).
    */
  case class NgramHashes(child: Expression, minN: Int, maxN: Int)
      extends UnaryExpression {
    require(minN >= 1 && maxN >= minN,
      s"need 1 <= minN <= maxN, got minN=$minN maxN=$maxN")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_ngram_hashes"

    override def nullSafeEval(input: Any): Any =
      HashExpressions.ngramHashesEval(input.asInstanceOf[ArrayData], minN, maxN)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.ngramHashesEval($a, $minN, $maxN);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Kernel for [[NgramHashes]]: per start position the longest admissible
    * gram assembles incrementally (token by token) into a reused buffer, and
    * every prefix length in [minN, maxN] hashes as it completes — each
    * token's bytes are copied once per START, not once per (start, n).
    * Output order is (start, n) ascending; consumers explode, so order is
    * immaterial, but it is deterministic.
    */
  def ngramHashesEval(arr: ArrayData, minN: Int, maxN: Int): ArrayData = {
    val tn = arr.numElements()
    var total = 0
    var n = minN
    while (n <= maxN) { if (tn >= n) total += tn - n + 1; n += 1 }
    val out = new Array[Long](total)
    var buf = new Array[Byte](256)
    var o = 0
    var i = 0
    while (i < tn) {
      val nMax = math.min(maxN, tn - i)
      if (nMax >= minN) {
        var len = 0
        var t = 0
        while (t < nMax) {
          val s = arr.getUTF8String(i + t)
          val sb = s.numBytes
          if (len + sb + 1 > buf.length)
            buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + sb + 1))
          if (t > 0) { buf(len) = ' '.toByte; len += 1 }
          s.writeToMemory(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + len)
          len += sb
          t += 1
          if (t >= minN) {
            out(o) = XXH64.hashUnsafeBytes(
              buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
            o += 1
          }
        }
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  /** token_counts(tokens): per-row term frequencies —
    * array<struct<token string, tf bigint>> with one entry per DISTINCT
    * token, in first-occurrence order. Equivalent to
    * `transform(array_distinct(w), t -> struct(t, size(filter(w, x -> x = t))))`
    * but one hash-map pass (O(|doc|)) in compiled code instead of
    * O(|distinct| · |doc|) interpreted lambda scans — the per-row tf kernel
    * of TF-IDF-shaped queries.
    */
  case class TokenCounts(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("token", StringType, nullable = true),
      StructField("tf", LongType, nullable = false))), containsNull = false)
    override def prettyName: String = "graft_token_counts"

    override def nullSafeEval(input: Any): Any =
      HashExpressions.tokenCountsEval(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.tokenCountsEval($a);")

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Kernel for [[TokenCounts]]: one LinkedHashMap pass (UTF8String keys
    * hash/compare by bytes), first-occurrence order out.
    */
  def tokenCountsEval(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val counts =
      new java.util.LinkedHashMap[org.apache.spark.unsafe.types.UTF8String, java.lang.Long]()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      val cur = counts.get(t)
      counts.put(t, if (cur == null) 1L else cur + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = org.apache.spark.sql.catalyst.InternalRow(e.getKey, e.getValue)
      j += 1
    }
    new GenericArrayData(out)
  }

  /** self_dot(a) = Σ aᵢ² in one array pass — what the optimizer rule
    * rewrites `graft_dot(a, a)` into (norms are the hot case: every cosine
    * evaluates two of them). Bit-identical to DotF64(a, a): same elementwise
    * x*x, same fold order.
    */
  case class SelfDotF64(child: Expression)
      extends UnaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_self_dot"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"graft_self_dot expects array<float|double>, got $other")
    }

    override def nullSafeEval(v: Any): Any = {
      val a = v.asInstanceOf[ArrayData]
      val n = a.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
        acc += x * x
        i += 1
      }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val xv = ctx.freshName("x")
        val x = if (isFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        s"""
           |int $n = $a.numElements();
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) { double $xv = $x; $acc += $xv * $xv; }
           |${ev.value} = $acc;
         """.stripMargin
      })

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** sign_bands(vec): per-band random-hyperplane sign buckets in ONE kernel
    * pass — band g packs the sign bits of its `r` consecutive planes into a
    * long. The plane matrix rides in the expression instance (one
    * `addReferenceObj` per task), NOT as plan literals: composing this from
    * B×r `typedlit` planes put ~16k double literals into the projection,
    * inflating the task binary to ~1 MB and blowing the codegen budget.
    * Bit-compatible with the composed form: bit j of band g is
    * sign(v · plane[g·r+j]) > 0.
    */
  /** Content-hashed holder for a plane matrix expression parameter. The
    * optimizer calls equals/hashCode/toString on expression nodes
    * constantly (canonicalization, rule idempotence checks, plan strings);
    * a bare 16k-element Seq field made every such call O(planes) — at
    * bands=32 × r=8 × dim=64 that was ~1s of pure DRIVER plan-processing
    * per b45-shaped query. Equality compares one precomputed 64-bit
    * content hash (plus length); toString is constant-size.
    */
  final class PlaneMatrix(val values: Array[Double]) extends Serializable {
    private val contentHash: Long = {
      var h = 0x9E3779B97F4A7C15L ^ values.length.toLong
      var i = 0
      while (i < values.length) {
        h = XXH64.hashLong(java.lang.Double.doubleToLongBits(values(i)), h)
        i += 1
      }
      h
    }
    override def hashCode: Int = contentHash.toInt
    override def equals(o: Any): Boolean = o match {
      case p: PlaneMatrix =>
        p.contentHash == contentHash && p.values.length == values.length
      case _ => false
    }
    override def toString: String =
      s"planes[${values.length}]#${java.lang.Long.toHexString(contentHash)}"
  }

  case class SignBands(child: Expression, planes: PlaneMatrix, dim: Int, bands: Int)
      extends UnaryExpression {
    require(bands > 0 && dim > 0 && planes.values.length % (dim * bands) == 0,
      s"planes (${planes.values.length}) must be (bands=$bands × r) rows of dim=$dim")
    require(planes.values.length / (dim * bands) <= 63, "rowsPerBand must fit a signed long")

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_sign_bands"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case ArrayType(DoubleType, _) => false
      case other => throw new IllegalArgumentException(
        s"graft_sign_bands expects array<float|double>, got $other")
    }
    @transient private lazy val mat: Array[Double] = planes.values

    override def nullSafeEval(input: Any): Any =
      HashExpressions.signBandsEval(
        input.asInstanceOf[ArrayData], mat, dim, bands, isFloat)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val matRef = ctx.addReferenceObj("signPlanes", mat, "double[]")
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.signBandsEval($a, $matRef, $dim, $bands, $isFloat);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Kernel for [[SignBands]]: the vector is materialized once, then each
    * plane is one tight dot loop. Public for the generated-code static call.
    */
  def signBandsEval(arr: ArrayData, mat: Array[Double], dim: Int, bands: Int,
      isFloat: Boolean): ArrayData = {
    val v = new Array[Double](dim)
    val n = math.min(arr.numElements(), dim)
    var i = 0
    while (i < n) {
      v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    val r = mat.length / (dim * bands)
    val out = new Array[Long](bands)
    var p = 0
    var g = 0
    while (g < bands) {
      var acc = 0L
      var j = 0
      while (j < r) {
        val base = p * dim
        var dot = 0.0
        var c = 0
        while (c < dim) { dot += mat(base + c) * v(c); c += 1 }
        if (dot > 0) acc |= (1L << j)
        p += 1
        j += 1
      }
      out(g) = acc
      g += 1
    }
    new GenericArrayData(out)
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** Function registrations for SparkSessionExtensions.injectFunction. */
  val registrations: Seq[(org.apache.spark.sql.catalyst.FunctionIdentifier,
      ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "graft_minhash_bands"),
      (args: Seq[Expression]) => args match {
        case Seq(c, nE, kE, bE) =>
          MinHashBands(c, litInt(nE, "shingleN"), litInt(kE, "k"), litInt(bE, "bands"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_bands(tokens, shingleN, k, bands) takes 4 arguments")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotF64].getName, "graft_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotF64(a, b)
        case _ => throw new IllegalArgumentException("graft_dot(a, b) takes 2 arguments")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "graft_simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c)
        case _ => throw new IllegalArgumentException("graft_simhash64(tokens) takes 1 argument")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "graft_minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(c, nE, kE) =>
          MinHashSig(c, litInt(nE, "shingleN"), litInt(kE, "k"))
        case _ => throw new IllegalArgumentException(
          "graft_minhash_sig(tokens, shingleN, k) takes 3 arguments")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_ngram_hashes"),
      new ExpressionInfo(classOf[NgramHashes].getName, "graft_ngram_hashes"),
      (args: Seq[Expression]) => args match {
        case Seq(c, loE, hiE) =>
          NgramHashes(c, litInt(loE, "minN"), litInt(hiE, "maxN"))
        case _ => throw new IllegalArgumentException(
          "graft_ngram_hashes(tokens, minN, maxN) takes 3 arguments")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(classOf[TokenCounts].getName, "graft_token_counts"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => TokenCounts(c)
        case _ => throw new IllegalArgumentException(
          "graft_token_counts(tokens) takes 1 argument")
      }),
    (org.apache.spark.sql.catalyst.FunctionIdentifier("graft_unicode_normalize"),
      new ExpressionInfo(
        classOf[NormalizeExpression.UnicodeNormalize].getName,
        "graft_unicode_normalize"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => NormalizeExpression.UnicodeNormalize(c)
        case Seq(c, f) =>
          val form = f match {
            case org.apache.spark.sql.catalyst.expressions.Literal(v, _)
                if v != null => v.toString
            case other => throw new IllegalArgumentException(
              s"form must be a string literal (NFC/NFD/NFKC/NFKD), got $other")
          }
          NormalizeExpression.UnicodeNormalize(c, form)
        case _ => throw new IllegalArgumentException(
          "graft_unicode_normalize(text[, form]) takes 1 or 2 arguments")
      }))
}
