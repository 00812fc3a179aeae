package graft.ext

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  // Three well-separated clusters in 8 dims, 12 points each.
  private lazy val vecs = {
    val pts = for {
      axis <- Seq(0, 1, 2)
      i <- 0 until 12
    } yield {
      val v = Array.fill(8)(0.0f)
      v(axis) = 10f + i * 0.05f
      v(axis + 4) = 4f
      (axis * 100L + i, v)
    }
    pts.toDF("vec_id", "embedding")
  }

  test("build + exact query: full probe equals brute force; meta round-trips") {
    val path = Files.createTempDirectory("graft_ann").toString
    val meta = AnnIndex.build(vecs, "vec_id", "embedding", path, nCells = 3)
    assert(AnnIndex.readMeta(spark, path) == meta)

    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val query = raw(100L).map(_.toDouble)
    val full = AnnIndex.query(spark, path, query, nProbe = 3, k = 12)
      .collect().map(_.getLong(0))
    val brute = Similarity.topKNeighbors(vecs, "vec_id", "embedding", 100L, 11)
      .collect().map(_.getLong(0))
    // full probe = exact: same neighbor set (the query id itself leads its own scan)
    assert(full.head == 100L)
    assert(full.tail.toSet == brute.toSet, s"${full.tail.toSeq} vs ${brute.toSeq}")
  }

  test("probed query scans only the probed cells — partition pruning, not a full read") {
    val path = Files.createTempDirectory("graft_ann").toString
    AnnIndex.build(vecs, "vec_id", "embedding", path, nCells = 3)
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val query = raw(200L).map(_.toDouble)
    val df = AnnIndex.query(spark, path, query, nProbe = 1, k = 12)
    val hits = df.collect().map(_.getLong(0))
    // nProbe=1 stays inside the query's own (exact-copy) cluster
    assert(hits.nonEmpty && hits.forall(id => id >= 200L && id < 300L), hits.toSeq.toString)
    // and the scan is partition-pruned on the cell directory
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("cell"), plan)
  }

  test("PQ query over the persisted codes finds the planted cluster") {
    val path = Files.createTempDirectory("graft_ann").toString
    AnnIndex.build(vecs, "vec_id", "embedding", path, nCells = 3, m = 4, nCodes = 8)
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val query = raw(0L).map(_.toDouble)
    val top = AnnIndex.queryPq(spark, path, query, nProbe = 1, k = 12)
      .collect().map(_.getLong(0))
    assert(top.nonEmpty && top.forall(_ < 100L), top.toSeq.toString)
    // an index built without codes refuses the PQ query loudly
    val noPq = Files.createTempDirectory("graft_ann").toString
    AnnIndex.build(vecs, "vec_id", "embedding", noPq, nCells = 3)
    val e = intercept[IllegalArgumentException](
      AnnIndex.queryPq(spark, noPq, query, nProbe = 1, k = 3))
    assert(e.getMessage.contains("without PQ"), e.getMessage)
  }

  test("a non-index path is refused") {
    val e = intercept[IllegalArgumentException](
      AnnIndex.query(spark, Files.createTempDirectory("not_ann").toString,
        Array.fill(8)(0.0), 1, 3))
    assert(e.getMessage.contains("_ann_meta.json"), e.getMessage)
  }
}
