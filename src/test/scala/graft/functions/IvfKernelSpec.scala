package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Similarity

/** [[IvfKernel]] must be BIT-IDENTICAL to the composed Catalyst form it
  * replaced (`array(dists) + array_position/array_sort` — the oracle-gated
  * cell structure of q96/q108/q110 depends on it), in both the flat regime
  * and the triangle-inequality-pruned two-level regime (nCells ≥
  * [[IvfKernel.PruneThreshold]]), including exact-tie inputs where the
  * first-min / (distance, index) ordering is the only thing separating
  * candidates.
  */
class IvfKernelSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-11 composed form, verbatim — the reference semantics. */
  private def composedAssign(vec: Column, centroids: Seq[Seq[Double]]): Column = {
    val dists = array(centroids.map { c =>
      val c2 = c.map(x => x * x).sum
      lit(c2) - lit(2.0) * Similarity.dot(vec, typedlit(c))
    }: _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  private def composedAssignK(vec: Column, centroids: Seq[Seq[Double]],
      nProbe: Int): Column = {
    val dists = array(centroids.zipWithIndex.map { case (c, j) =>
      val c2 = c.map(x => x * x).sum
      struct((lit(c2) - lit(2.0) * Similarity.dot(vec, typedlit(c))).as("d"),
        lit(j).as("cell"))
    }: _*)
    transform(slice(array_sort(dists), 1, nProbe), _.getField("cell"))
  }

  private def randVecs(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val r = new scala.util.Random(seed)
    (0 until n).map(i => (i.toLong, Array.fill(dim)(r.nextGaussian().toFloat)))
  }

  private def randCentroids(c: Int, dim: Int, seed: Int): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    (0 until c).map(_ => Seq.fill(dim)(r.nextGaussian()))
  }

  private def check(nCells: Int, nProbe: Int, nVecs: Int = 500,
      dim: Int = 16, tweak: Seq[Seq[Double]] => Seq[Seq[Double]] = identity): Unit = {
    val cents = tweak(randCentroids(nCells, dim, seed = nCells * 7 + 1))
    val df = randVecs(nVecs, dim, seed = 11).toDF("id", "vec").localCheckpoint()
    val got = df.select(col("id"),
        Similarity.assignCell(col("vec"), cents).as("cell"),
        Similarity.assignCells(col("vec"), cents, nProbe).as("cells"),
        composedAssign(col("vec"), cents).as("ref_cell"),
        composedAssignK(col("vec"), cents, nProbe).as("ref_cells"))
      .collect()
    got.foreach { r =>
      assert(r.getInt(1) == r.getInt(3),
        s"id=${r.getLong(0)}: kernel cell ${r.getInt(1)} != composed ${r.getInt(3)}")
      assert(r.getSeq[Int](2) == r.getSeq[Int](4),
        s"id=${r.getLong(0)}: kernel cells ${r.getSeq[Int](2)} != composed ${r.getSeq[Int](4)}")
    }
  }

  test("flat regime matches the composed form bit-for-bit") {
    check(nCells = 4, nProbe = 2)
    check(nCells = 16, nProbe = 3)
  }

  test("pruned two-level regime (nCells >= threshold) matches exactly") {
    assert(IvfKernel.build(randCentroids(200, 16, 1)).pruned)
    check(nCells = 200, nProbe = 4)
  }

  test("exact ties resolve identically: duplicated centroids, symmetric points") {
    // duplicate centroid pairs → equal distances; first index must win in
    // both regimes
    val dup = (c: Seq[Seq[Double]]) => c.zipWithIndex.map { case (v, i) =>
      if (i % 2 == 1) c(i - 1) else v // every odd centroid duplicates its predecessor
    }
    check(nCells = 16, nProbe = 4, tweak = dup)
    check(nCells = 200, nProbe = 4, tweak = dup)
  }

  test("quantizer build is deterministic and content-equal") {
    val c = randCentroids(150, 8, 5)
    val a = IvfKernel.build(c)
    val b = IvfKernel.build(c)
    assert(a == b && a.hashCode() == b.hashCode())
    assert(a.pruned && a.superMembers.map(_.length).sum == 150)
  }
}
