package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** Property-based equivalence for the custom distributed operators: each
  * must match its brute-force / built-in formulation on arbitrary inputs —
  * ties, empty sides, corrupt intervals, keys with no matches included.
  * Test counts are kept low (each check is a full Spark job on a tiny
  * dataset); the point is adversarial SHAPES, not volume.
  */
object OperatorProperties extends Properties("graft.operators") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12).withMaxDiscardRatio(10)

  private lazy val spark = graft.SparkSpec.session

  // ------------------------------------------------------- top-k per key

  private val topkRows: Gen[List[(Int, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 4), Gen.choose(-50L, 50L)))

  property("topKPerKey == window row_number formulation") =
    forAll(topkRows, Gen.choose(1, 4)) { (rows, k) =>
      import spark.implicits._
      val df = rows.zipWithIndex
        .map { case ((key, v), i) => (key, i.toLong, v) }
        .toDF("key", "id", "value")
      val got = graft.plans.TopKPerKey
        .topKPerKey(df, Seq("key"), Seq(col("value").desc, col("id")), k)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      val w = Window.partitionBy(col("key")).orderBy(col("value").desc, col("id"))
      val want = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= k).drop("rn")
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
      got == want
    }

  // ----------------------------------------------------------- range join

  // Durations include <= 0 (corrupt intervals the operator must drop) and
  // spans crossing many bins.
  private val intervalsGen: Gen[List[(Long, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0L, 86400L), Gen.choose(-600L, 7200L)))
  private val pointsGen: Gen[List[Long]] = Gen.listOf(Gen.choose(0L, 90000L))

  property("binnedRangeJoin == brute-force inequality join") =
    forAll(intervalsGen, pointsGen) { (ivals, pts) =>
      import spark.implicits._
      val iv = ivals.zipWithIndex.map { case ((s, dur), i) =>
        (i.toLong, new java.sql.Timestamp(s * 1000L),
          new java.sql.Timestamp((s + dur) * 1000L))
      }
      val pv = pts.zipWithIndex.map { case (t, i) =>
        (i.toLong, new java.sql.Timestamp(t * 1000L))
      }
      val got = RangeJoin.binnedRangeJoin(
          iv.toDF("iid", "istart", "iend"), pv.toDF("pid", "pts"),
          "istart", "iend", "pts", binWidth = "37 minutes")
        .select(col("iid"), col("pid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = (for {
        (iid, s, e) <- iv
        (pid, t) <- pv
        if t.getTime >= s.getTime && t.getTime < e.getTime
      } yield (iid, pid)).toSet
      got == want
    }

  // ----------------------------------------------------- exact percentiles

  // Duplicates likely (values from a small domain), uneven group sizes.
  private val pctRows: Gen[List[(Int, Double)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0, 40).map(_ * 0.5)))

  property("groupedPercentiles == builtin percentile aggregate") =
    forAll(pctRows, Gen.nonEmptyListOf(Gen.choose(0, 20).map(_ / 20.0))) {
      (rows, fracsRaw) =>
        import spark.implicits._
        val fracs = fracsRaw.distinct
        val df = rows.toDF("key", "v")
        val got = ExactPercentile
          .groupedPercentiles(df, Seq("key"), "v", fracs)
          .collect()
          .map(r => (r.getInt(0), r.getDouble(1)) -> r.getDouble(2)).toMap
        val arr = fracs.map(f => lit(f)).toArray
        val want = df.groupBy(col("key"))
          .agg(expr(s"percentile(v, array(${fracs.mkString(",")}))").as("ps"))
          .collect()
          .flatMap { r =>
            val ps = r.getSeq[Double](1)
            fracs.indices.map(i => (r.getInt(0), fracs(i)) -> ps(i))
          }.toMap
        got.keySet == want.keySet &&
          got.forall { case (k, v) => math.abs(v - want(k)) < 1e-9 }
    }

  // ------------------------------------------------------------ as-of join

  private val leftGen: Gen[List[(Int, Long)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 3), Gen.choose(0L, 1000L)))
  private val rightGen: Gen[List[(Int, Long, Long)]] =
    Gen.listOf(for {
      k <- Gen.choose(0, 3)
      t <- Gen.choose(0L, 1000L)
      v <- Gen.choose(-99L, 99L)
    } yield (k, t, v))

  property("asOfJoin == per-row latest-right lookup") =
    forAll(leftGen, rightGen) { (lraw, rraw) =>
      import spark.implicits._
      // Operator contract: right unique per (key, ts).
      val r = rraw.groupBy(x => (x._1, x._2)).map(_._2.head).toList
      val l = lraw.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000L))
      }
      val got = AsOfJoin.asOfJoin(
          l.toDF("lid", "key", "lts"),
          r.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), v) }
            .toDF("rkey", "rts", "v"),
          "key", "rkey", "lts", "rts", Seq("v"))
        .select(col("lid"), col("v"))
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val want = l.map { case (lid, k, lts) =>
        val cand = r.filter(x => x._1 == k && x._2 * 1000L <= lts.getTime)
        lid -> (if (cand.isEmpty) None else Some(cand.maxBy(_._2)._3))
      }.toMap
      got == want
    }

  property("asOfJoinBroadcast == asOfJoin (zero-shuffle variant, same semantics)") =
    forAll(leftGen, rightGen) { (lraw, rraw) =>
      import spark.implicits._
      val r = rraw.groupBy(x => (x._1, x._2)).map(_._2.head).toList
      val l = lraw.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000L))
      }
      val rdf = r.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), v) }
        .toDF("rkey", "rts", "v")
      def toMapOf(df: org.apache.spark.sql.DataFrame) = df
        .select(col("lid"), col("v")).collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val shuffled = toMapOf(AsOfJoin.asOfJoin(
        l.toDF("lid", "key", "lts"), rdf, "key", "rkey", "lts", "rts", Seq("v")))
      val bcast = toMapOf(AsOfJoin.asOfJoinBroadcast(
        l.toDF("lid", "key", "lts"), rdf, "key", "rkey", "lts", "rts", Seq("v")))
      shuffled == bcast
    }

  property("asOfJoinForward == per-row earliest-right lookup") =
    forAll(leftGen, rightGen) { (lraw, rraw) =>
      import spark.implicits._
      val r = rraw.groupBy(x => (x._1, x._2)).map(_._2.head).toList
      val l = lraw.zipWithIndex.map { case ((k, t), i) =>
        (i.toLong, k, new java.sql.Timestamp(t * 1000L))
      }
      val got = AsOfJoin.asOfJoinForward(
          l.toDF("lid", "key", "lts"),
          r.map { case (k, t, v) => (k, new java.sql.Timestamp(t * 1000L), v) }
            .toDF("rkey", "rts", "v"),
          "key", "rkey", "lts", "rts", Seq("v"))
        .select(col("lid"), col("v"))
        .collect()
        .map(row => row.getLong(0) ->
          (if (row.isNullAt(1)) None else Some(row.getLong(1)))).toMap
      val want = l.map { case (lid, k, lts) =>
        val cand = r.filter(x => x._1 == k && x._2 * 1000L >= lts.getTime)
        lid -> (if (cand.isEmpty) None else Some(cand.minBy(_._2)._3))
      }.toMap
      got == want
    }

  // -------------------------------------------------- connected components

  // Random sparse pair graphs: long chains, stars, self-loops, duplicates.
  private val pairsGen: Gen[List[(Long, Long)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.choose(0L, 30L), Gen.choose(0L, 30L)))

  property("dupClusters == driver-side union-find components (BOTH strategies)") =
    forAll(pairsGen) { pairs =>
      import spark.implicits._
      val got = graft.ext.Dedup
        .dupClusters(pairs.toDF("id_a", "id_b"), "id_a", "id_b")
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // driverThreshold = -1 forces the distributed propagation path; both
      // strategies must produce identical labels
      val gotDistributed = graft.ext.Dedup
        .dupClusters(pairs.toDF("id_a", "id_b"), "id_a", "id_b",
          driverThreshold = -1L)
        .collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == gotDistributed, s"strategy divergence: $got vs $gotDistributed")

      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      // canonical label = min member id, matching the operator's contract
      val members = parent.keys.toSeq
      val want = members.groupBy(find).flatMap { case (_, ms) =>
        val label = ms.min; ms.map(_ -> label)
      }

      got == want
    }
}
