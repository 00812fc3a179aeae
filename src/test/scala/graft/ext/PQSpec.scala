package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class PQSpec extends SparkSpec {
  import spark.implicits._

  // Three tight, well-separated clusters (the IVF fixture shape).
  private lazy val vecs = {
    val pts = for {
      (axis, base) <- Seq(0, 1, 2).map(a => (a, a * 10L))
      i <- 0 until 6
    } yield {
      val v = Array.fill(8)(0.0f)
      v(axis) = 10f + i * 0.1f
      v(axis + 3) = 5f
      (base + i, v)
    }
    pts.toDF("vec_id", "embedding")
  }

  test("codebooks are deterministic; encode round-trips to a nearby reconstruction") {
    val cb1 = PQ.train(vecs, "vec_id", "embedding", m = 4, nCodes = 4, iters = 3)
    val cb2 = PQ.train(vecs, "vec_id", "embedding", m = 4, nCodes = 4, iters = 3)
    assert(cb1.centers.map(_.map(_.toSeq).toSeq).toSeq
      == cb2.centers.map(_.map(_.toSeq).toSeq).toSeq)

    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val codes = PQ.encode(vecs, "vec_id", "embedding", cb1)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(codes.values.forall(_.length == 4), "m code bytes per vector")
    codes.foreach { case (id, code) =>
      val rec = cb1.decode(code)
      val err = raw(id).map(_.toDouble).zip(rec).map { case (a, b) => (a - b) * (a - b) }.sum
      val nrm = raw(id).map(x => x.toDouble * x).sum
      assert(err / nrm < 0.05, s"vec $id reconstruction error ${err / nrm}")
    }
  }

  test("ADC top-k finds the query's own cluster, in true-distance order") {
    val cb = PQ.train(vecs, "vec_id", "embedding", m = 4, nCodes = 4, iters = 3)
    val encoded = PQ.encode(vecs, "vec_id", "embedding", cb)
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val query = raw(10L).map(_.toDouble) // a cluster-1 member

    val top = PQ.adcTopK(encoded, "vec_id", query, cb, k = 6)
      .collect().map(_.getLong(0))
    assert(top.toSet == (10L until 16L).toSet,
      s"expected cluster 1 (10..15), got ${top.toSeq}")
  }

  test("IVF-PQ: nProbe=1 stays in the query's cluster; nProbe=nCells matches flat ADC") {
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val query = raw(10L).map(_.toDouble)
    val one = PQ.ivfPqTopK(vecs, "vec_id", "embedding", query,
      nCells = 3, nProbe = 1, m = 4, nCodes = 4, k = 6)
      .collect().map(_.getLong(0))
    assert(one.toSet == (10L until 16L).toSet, s"nProbe=1: ${one.toSeq}")

    val all = PQ.ivfPqTopK(vecs, "vec_id", "embedding", query,
      nCells = 3, nProbe = 3, m = 4, nCodes = 4, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    val cb = PQ.train(vecs, "vec_id", "embedding", m = 4, nCodes = 4, iters = 3)
    val flat = PQ.adcTopK(PQ.encode(vecs, "vec_id", "embedding", cb),
        "vec_id", query, cb, k = 6)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(all.toSeq == flat.toSeq, "probing every cell must equal the flat scan")
  }

  test("ADC distances separate clusters on the real embeddings table") {
    val emb = Tables.embeddings(spark, sf)
    val cb = PQ.train(emb, "vec_id", "embedding", m = 8, nCodes = 16, iters = 3)
    val encoded = PQ.encode(emb, "vec_id", "embedding", cb)
    // query = first vector; its ADC self-distance must be the minimum-ish:
    // the query itself must appear in the top-5 of its own scan
    val q0 = emb.orderBy("vec_id")
      .select(col("embedding")).head().getSeq[Float](0).map(_.toDouble).toArray
    val top = PQ.adcTopK(encoded, "vec_id", q0, cb, k = 5)
      .collect().map(_.getLong(0))
    val qid = emb.orderBy("vec_id").select(col("vec_id")).head().getLong(0)
    assert(top.contains(qid), s"query $qid missing from its own ADC top-5: ${top.toSeq}")
  }

  test("SQ8: exact distributed bounds, per-dim error within half a step, top-k = brute force") {
    val raw = vecs.collect().map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    val sq = PQ.trainSq(vecs, "embedding", dim = 8)
    // bounds are the exact corpus min/max per dimension
    for (i <- 0 until 8) {
      assert(sq.lo(i) == raw.values.map(_(i).toDouble).min, s"dim $i lo")
      assert(sq.hi(i) == raw.values.map(_(i).toDouble).max, s"dim $i hi")
    }
    // reconstruction within half a quantization step in every dimension
    val codes = PQ.encodeSq(vecs, "vec_id", "embedding", sq)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    codes.foreach { case (id, code) =>
      val rec = sq.decode(code)
      for (i <- 0 until 8) {
        val w = sq.hi(i) - sq.lo(i)
        val halfStep = (if (w > 0) w / 256.0 else 1.0) / 2.0 + 1e-12
        assert(math.abs(rec(i) - raw(id)(i)) <= halfStep,
          s"vec $id dim $i off by ${math.abs(rec(i) - raw(id)(i))}")
      }
    }
    // on well-separated clusters the int8 scan agrees with exact brute force
    val query = raw(10L).map(_.toDouble)
    val top = PQ.sqTopK(PQ.encodeSq(vecs, "vec_id", "embedding", sq),
        "vec_id", query, sq, k = 6)
      .collect().map(_.getLong(0))
    assert(top.toSet == (10L until 16L).toSet, s"expected cluster 1, got ${top.toSeq}")
  }
}
