package graft.functions

import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed MinHash sketch AGGREGATE (SURVEY §2.7 extension target: sketch
  * aggregates as `Aggregator`): collapses a whole GROUP of shingle sets into
  * one k-wide signature. Signatures of two groups estimate their Jaccard
  * similarity as the fraction of matching positions — corpus/source-level
  * near-duplication without pairwise doc comparison.
  *
  * Algebraic: reduce and merge are both elementwise min, so Spark runs it
  * map-side partial + merge — one shuffle of k longs per group regardless of
  * corpus size. That is the 100 TB shape: the sketch of a petabyte source is
  * still 128 bytes.
  */
class MinHashSketch(k: Int)
    extends Aggregator[Seq[String], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingles: Seq[String]): Array[Long] = {
    if (shingles != null) {
      val it = shingles.iterator
      while (it.hasNext) {
        val s = org.apache.spark.unsafe.types.UTF8String.fromString(it.next())
        var j = 0
        while (j < k) {
          val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j)
          if (h < buf(j)) buf(j) = h
          j += 1
        }
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < k) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

/** Elementwise-min merge of per-document k-wide signatures (as produced by
  * the native `graft_minhash_sig` expression). Same sketch as
  * [[MinHashSketch]] — min over all (shingle, seed) hashes of the group —
  * but the hot hashing runs in codegen'd per-row code, and the aggregate
  * moves only k longs per document through a primitive-array encoder
  * instead of every shingle string through a Seq[String] encoder.
  */
class MinHashSigMerge(k: Int)
    extends Aggregator[Array[Long], Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(k)(Long.MaxValue)

  override def reduce(buf: Array[Long], sig: Array[Long]): Array[Long] =
    if (sig == null) buf else merge(buf, sig)

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    val n = math.min(a.length, b.length)
    while (j < n) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder()
}

object MinHashSketch {

  /** Column-API aggregate: `minhashSketch(16)(shinglesCol)`. */
  def apply(k: Int): Column => Column = {
    val agg = udaf(new MinHashSketch(k), ExpressionEncoder[Seq[String]]())
    (c: Column) => agg(c)
  }

  /** Column-API aggregate over per-doc signatures: `ofSignatures(k)(sigCol)`. */
  def ofSignatures(k: Int): Column => Column = {
    val agg = udaf(new MinHashSigMerge(k), ExpressionEncoder[Array[Long]]())
    (c: Column) => agg(c)
  }

  /** Estimated Jaccard between two signatures: matching-position fraction,
    * rounded for stable output.
    */
  def estimateJaccard(a: Column, b: Column, k: Int): Column =
    round(
      aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
        lit(0), (acc, x) => acc + x).cast("double") / lit(k.toDouble), 4)
}
