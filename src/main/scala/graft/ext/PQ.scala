package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Product quantization — the memory side of billion-scale ANN: a
  * `dim`-float vector (256 B at dim=64) compresses to `m` code bytes
  * (8 B at m=8), so a corpus whose raw embeddings need a cluster's worth
  * of RAM fits its PQ codes in one executor's memory, and distance
  * evaluation becomes `m` table lookups instead of `dim` multiplies.
  *
  * Spark-first split of the work:
  *   - TRAIN driver-side on the deterministic hash-ordered sample (the
  *     same FAISS-style posture as [[Similarity.ivfCentroidsSampled]]):
  *     one distributed job, then m independent little k-means runs.
  *   - ENCODE distributed: one `mapPartitions` pass (partition-local, no
  *     shuffle) mapping each vector to its m nearest-subcentroid codes.
  *   - QUERY (ADC — asymmetric distance computation): the query builds an
  *     m × nCodes lookup table ONCE driver-side; each row's approximate
  *     distance is m array reads, and the top-k is a TakeOrdered heap.
  *
  * Everything is deterministic: sample order is hash-fixed, argmin ties
  * resolve first-wins, no rand().
  */
object PQ {

  /** Trained codebooks: `centers(j)(c)` is the dsub-dim centroid of code c
    * in subspace j.
    */
  case class Codebooks(m: Int, dsub: Int, nCodes: Int,
      centers: Array[Array[Array[Double]]]) extends Serializable {
    def encodeVec(v: Array[Float]): Array[Byte] = {
      require(v != null && v.length >= m * dsub,
        s"vector of ${if (v == null) "null" else v.length} floats; codebooks need ${m * dsub}")
      val code = new Array[Byte](m)
      var j = 0
      while (j < m) {
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < centers(j).length) {
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = v(j * dsub + i) - centers(j)(c)(i)
            d += diff * diff
            i += 1
          }
          if (d < bestD) { bestD = d; best = c } // first-wins: deterministic
          c += 1
        }
        code(j) = best.toByte
        j += 1
      }
      code
    }

    /** Reconstruction (decode): concatenated code centroids. */
    def decode(code: Array[Byte]): Array[Double] = {
      val out = new Array[Double](m * dsub)
      var j = 0
      while (j < m) {
        System.arraycopy(centers(j)(code(j) & 0xff), 0, out, j * dsub, dsub)
        j += 1
      }
      out
    }

    /** ADC lookup table for one query: lut(j)(c) = ||q_j - center_jc||². */
    def lut(q: Array[Double]): Array[Array[Double]] =
      Array.tabulate(m) { j =>
        Array.tabulate(centers(j).length) { c =>
          var d = 0.0
          var i = 0
          while (i < dsub) {
            val diff = q(j * dsub + i) - centers(j)(c)(i)
            d += diff * diff
            i += 1
          }
          d
        }
      }
  }

  /** Train codebooks: one sample job + m driver-side k-means runs. */
  def train(df: DataFrame, idCol: String, vecCol: String, m: Int,
      nCodes: Int = 16, iters: Int = 3, seed: Long = 42L,
      sampleSize: Int = 4096): Codebooks = {
    require(nCodes <= 256, "codes must fit one byte")
    val sample = Similarity.sampleVectors(df, idCol, vecCol, seed, sampleSize)
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val dsub = dim / m
    val centers = Array.tabulate(m) { j =>
      Similarity.lloydOnSample(
        sample.map(_.slice(j * dsub, (j + 1) * dsub)), nCodes, iters)
    }
    Codebooks(m, dsub, nCodes, centers)
  }

  /** Distributed encode: (id, pq_code) — one partition-local pass. */
  def encode(df: DataFrame, idCol: String, vecCol: String, cb: Codebooks): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, cb.encodeVec(v)) })
      .toDF(idCol, "pq_code")
  }

  /** IVF-PQ (the full FAISS composition): coarse IVF cells prune the scan
    * to the `nProbe` cells nearest the query — a partition-pruning filter
    * when the encoded index is written partitioned by cell — and PQ codes
    * rank what's left via the ADC lookup table. At a billion vectors:
    * scan nProbe/nCells of the corpus, at m bytes per vector, zero
    * full-precision vectors touched at query time.
    */
  def ivfPqTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Double], nCells: Int, nProbe: Int, m: Int,
      nCodes: Int = 16, k: Int = 10, iters: Int = 3, seed: Long = 42L): DataFrame = {
    require(nProbe > 0 && nProbe <= nCells)
    val spark = df.sparkSession
    import spark.implicits._
    val centroids = Similarity.ivfCentroidsSampled(df, idCol, vecCol, nCells, iters, seed)
    val cb = train(df, idCol, vecCol, m, nCodes, iters, seed)
    // one pass builds the (id, cell, code) index
    val indexed = df
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"),
        Similarity.assignCell(col(vecCol), centroids).as("cell"))
      .as[(Long, Array[Float], Int)]
      .mapPartitions(_.map { case (id, v, cell) => (id, cell, cb.encodeVec(v)) })
      .toDF("id", "cell", "pq_code")
    // driver-side probe selection: distance of the query to each centroid
    val probed = centroids.zipWithIndex
      .map { case (c, j) =>
        (c.zip(query).map { case (a, b) => (a - b) * (a - b) }.sum, j)
      }
      .sorted.take(nProbe).map(_._2)
    adcTopK(
      indexed.filter(col("cell").isin(probed.map(Integer.valueOf): _*)).drop("cell"),
      "id", query, cb, k)
  }

  /** Scalar quantization (SQ8) — the cheap sibling of PQ: one affine int8
    * code per DIMENSION (4× memory vs f32, vs PQ's 32×), no codebooks, and
    * a reconstruction error bounded by half a quantization step per dim.
    * Unlike PQ the bounds train on the FULL corpus (an exact elementwise
    * min/max aggregate is one distributed pass — there is no k-means to
    * bound, so no sampling posture is needed).
    */
  case class ScalarQuantizer(lo: Array[Double], hi: Array[Double]) extends Serializable {
    require(lo.length == hi.length && lo.nonEmpty)
    val dim: Int = lo.length

    private def step(i: Int): Double = {
      val w = hi(i) - lo(i)
      if (w > 0) w / 256.0 else 1.0
    }

    def encodeVec(v: Array[Float]): Array[Byte] = {
      require(v != null && v.length == dim, s"need $dim dims")
      val out = new Array[Byte](dim)
      var i = 0
      while (i < dim) {
        val q = math.floor((v(i) - lo(i)) / step(i)).toInt
        out(i) = (math.max(0, math.min(255, q)) - 128).toByte
        i += 1
      }
      out
    }

    /** Reconstruct at the bin CENTER — halves the worst-case error vs the
      * bin floor.
      */
    def decode(code: Array[Byte]): Array[Double] = {
      val out = new Array[Double](dim)
      var i = 0
      while (i < dim) {
        // encode stored q-128 as a signed byte; +128 recovers q in [0,255]
        out(i) = lo(i) + (code(i) + 128 + 0.5) * step(i)
        i += 1
      }
      out
    }
  }

  private class VecMinMax(dim: Int)
      extends org.apache.spark.sql.expressions.Aggregator[Array[Float], Array[Double], Array[Double]] {
    override def zero: Array[Double] = {
      val b = new Array[Double](2 * dim)
      java.util.Arrays.fill(b, 0, dim, Double.PositiveInfinity)
      java.util.Arrays.fill(b, dim, 2 * dim, Double.NegativeInfinity)
      b
    }
    override def reduce(b: Array[Double], v: Array[Float]): Array[Double] = {
      var i = 0
      while (i < dim && v != null && v.length == dim) {
        if (v(i) < b(i)) b(i) = v(i)
        if (v(i) > b(dim + i)) b(dim + i) = v(i)
        i += 1
      }
      b
    }
    override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
      var i = 0
      while (i < dim) {
        if (b(i) < a(i)) a(i) = b(i)
        if (b(dim + i) > a(dim + i)) a(dim + i) = b(dim + i)
        i += 1
      }
      a
    }
    override def finish(b: Array[Double]): Array[Double] = b
    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Array[Double]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
  }

  /** Exact per-dimension bounds in ONE distributed aggregate. */
  def trainSq(df: DataFrame, vecCol: String, dim: Int): ScalarQuantizer = {
    val agg = org.apache.spark.sql.functions.udaf(
      new VecMinMax(dim),
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Float]]())
    val b = df.select(agg(col(vecCol))).collect().head.getSeq[Double](0).toArray
    ScalarQuantizer(b.slice(0, dim), b.slice(dim, 2 * dim))
  }

  /** Distributed SQ8 encode: (id, sq_code) — partition-local, no shuffle. */
  def encodeSq(df: DataFrame, idCol: String, vecCol: String,
      sq: ScalarQuantizer): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) => (id, sq.encodeVec(v)) })
      .toDF(idCol, "sq_code")
  }

  /** Top-k nearest (L2) to a raw query over SQ8 codes: per row `dim`
    * decode-multiply-adds against the closure-shipped bounds, TakeOrdered
    * heap for the cut — the same query shape as [[adcTopK]] at 4× memory
    * instead of 32×, with much tighter reconstruction.
    */
  def sqTopK(encoded: DataFrame, idCol: String, query: Array[Double],
      sq: ScalarQuantizer, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    encoded.select(col(idCol).cast("long"), col("sq_code"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, code) =>
        val v = sq.decode(code)
        var d = 0.0
        var i = 0
        while (i < v.length) { val t = v(i) - query(i); d += t * t; i += 1 }
        (id, math.rint(d * 1e6) / 1e6)
      })
      .toDF(idCol, "adist")
      .orderBy(col("adist"), col(idCol))
      .limit(k)
  }

  /** ADC top-k against a raw query vector over the encoded table: the
    * 2 KB lookup table rides the task closure; per row the distance is m
    * byte-indexed reads; the k smallest distances come back through a
    * TakeOrdered heap (never a global sort).
    */
  def adcTopK(encoded: DataFrame, idCol: String, query: Array[Double],
      cb: Codebooks, k: Int): DataFrame = {
    val spark = encoded.sparkSession
    import spark.implicits._
    val lut = cb.lut(query)
    encoded.select(col(idCol).cast("long"), col("pq_code"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, code) =>
        var d = 0.0
        var j = 0
        while (j < code.length) { d += lut(j)(code(j) & 0xff); j += 1 }
        (id, math.rint(d * 1e6) / 1e6)
      })
      .toDF(idCol, "adist")
      .orderBy(col("adist"), col(idCol))
      .limit(k)
  }
}
