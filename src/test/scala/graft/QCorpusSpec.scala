package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the corpus-pipeline batch (q65–q71), checked against
  * independent Scala recomputations on the sf0.001 fixture — the DuckDB
  * oracle proves engine-equivalence; these prove the SEMANTICS are the
  * intended ones (not just the same on both engines).
  */
class QCorpusSpec extends SparkSpec {

  private def docs: Seq[(Long, String, String)] =
    Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  private def grams(text: String, n: Int): Set[String] =
    text.split(" ").sliding(n).map(_.mkString(" ")).toSet

  test("q65: flagged docs share a 13-gram with the eval slice — and only they do") {
    val evalG = docs.filter(_._2 == "src0").flatMap(d => grams(d._3, 13)).toSet
    val expected = docs.filter(d => d._2 != "src0" && grams(d._3, 13).exists(evalG))
      .map(d => d._1 -> grams(d._3, 13).count(evalG).toLong).toMap
    val got = SparkEntry.queries("q65_decontaminate")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("q66: ten rows, scores strictly ordered, every scored doc contains a query term") {
    val rows = SparkEntry.queries("q66_bm25")(spark, sf).collect()
    assert(rows.length == 10)
    val scores = rows.map(_.getDouble(1))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val byId = docs.map(d => d._1 -> d._3).toMap
    rows.foreach { r =>
      val t = byId(r.getLong(0)).split(" ").toSet
      assert(t.contains("join") || t.contains("scan") || t.contains("filter"))
    }
  }

  test("q67: postings head is the first five sorted doc ids; df/ctf exact") {
    val perToken = docs.flatMap { case (id, _, text) => text.split(" ").map(t => (t, id)) }
    val expected = perToken.groupBy(_._1).map { case (t, xs) =>
      t -> ((xs.map(_._2).distinct.size.toLong, xs.size.toLong,
             xs.map(_._2).distinct.sorted.take(5).mkString(",")))
    }
    val got = SparkEntry.queries("q67_inverted_index")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(got == expected)
  }

  test("q68: per-source token totals are preserved and every seq except the last is full") {
    val nTokens = docs.map { case (_, src, text) => src -> text.split(" ").length.toLong }
      .groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2).sum }
    val rows = SparkEntry.queries("q68_seq_packing")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._4).sum } == nTokens)
    // cumsum packing: every bin boundary is below 512 tokens of slack —
    // a doc starts in bin floor(pre/512), so bins are contiguous 0..max
    rows.groupBy(_._1).foreach { case (_, xs) =>
      val ids = xs.map(_._2).sorted.toSeq
      assert(ids == (0L until ids.length).toSeq)
    }
  }

  test("q69: change classes partition the key space by the snapshot predicates") {
    val keys = Tables.orders(spark, sf).select("o_orderkey")
      .collect().map(_.getLong(0))
    val ins = keys.count(k => k % 7 == 0 && k % 5 != 0).toLong
    val del = keys.count(k => k % 7 != 0 && k % 5 == 0).toLong
    val upd = keys.count(k => k % 7 != 0 && k % 5 != 0 && k % 3 == 0).toLong
    val got = SparkEntry.queries("q69_cdc_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("insert" -> ins, "delete" -> del, "update" -> upd))
  }

  test("q70: bloom pre-reduction returns exactly the plain-join result") {
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf).filter(col("o_totalprice") > 400000.0),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_lines"), round(sum(col("l_extendedprice")), 2).as("revenue"))
      .orderBy(col("o_orderpriority")).collect().toSeq
    val got = SparkEntry.queries("q70_bloom_join")(spark, sf).collect().toSeq
    assert(got == plain)
  }

  test("q72: sample equals the brute-force Efraimidis–Spirakis top-20 and is weight-biased") {
    val withKey = Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars")).collect()
      .map { r =>
        val id = r.getLong(0); val w = r.getLong(1)
        val h = java.lang.Long.parseLong(
          java.security.MessageDigest.getInstance("MD5")
            .digest(id.toString.getBytes("UTF-8"))
            .take(4).map("%02x".format(_)).mkString, 16)
        (id, w, math.log((h + 1.0) / 4294967296.0) / w)
      }
    val expected = withKey.sortBy(t => (-t._3, t._1)).take(20).map(_._1).sorted.toSeq
    val got = SparkEntry.queries("q72_weighted_sample")(spark, sf)
      .collect().map(_.getLong(0)).toSeq
    assert(got == expected)
    // weight bias: the sample's mean weight should exceed the corpus mean
    val all = withKey.map(_._2.toDouble)
    val sel = withKey.filter(t => expected.contains(t._1)).map(_._2.toDouble)
    assert(sel.sum / sel.length > all.sum / all.length)
  }

  test("q73: ten equal-depth bins with non-overlapping, ordered value ranges") {
    val rows = SparkEntry.queries("q73_equidepth_bins")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.map(_._1).toSeq == (1L to 10L))
    assert(rows.map(_._2).distinct.length <= 2) // equal depth (±1 on remainder)
    rows.sliding(2).foreach {
      case Array((_, _, _, hi), (_, _, lo2, _)) => assert(hi <= lo2)
      case _ =>
    }
  }

  test("q74: centroid for one (label, dim) matches the manual mean") {
    val vecs = Tables.embeddings(spark, sf)
      .select(col("label"), col("embedding")).collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val (label0, _) = vecs.head
    val xs = vecs.filter(_._1 == label0).map(_._2(3).toDouble)
    val exp = BigDecimal(xs.sum / xs.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = SparkEntry.queries("q74_label_centroids")(spark, sf)
      .filter(col("label") === label0 && col("dim") === 3)
      .head()
    assert(got.getLong(2) == xs.length)
    assert(math.abs(got.getDouble(3) - exp) < 1e-6)
  }

  test("q75: the sketch honors its error contract at fixture scale (all bounds ok)") {
    val rows = SparkEntry.queries("q75_approx_quantile")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(3) == 1L && r.getLong(4) == 1L, s"${r.getString(0)} out of bound")
      assert(r.getDouble(1) <= r.getDouble(2)) // p50 <= p95
    }
  }

  test("q76: no near-dup pair ever straddles a split (leak-free by construction)") {
    import graft.ext.{Dedup, Splits}
    val d = Tables.documents(spark, sf)
    val pairs = Dedup.minhashLshPairs(d, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, threshold = 0.5)
    val clusters = Dedup.dupClusters(pairs, "id_a", "id_b")
    val perDoc = d.select(col("doc_id"))
      .join(clusters, col("doc_id") === col("id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("rep"))
      .withColumn("split", Splits.assignSplit(
        Splits.hashBucketMd5(col("rep"), 100),
        Seq("train" -> 80, "val" -> 10, "test" -> 10)))
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val ps = pairs.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(ps.nonEmpty, "fixture should contain near-dups")
    ps.foreach { case (a, b) =>
      assert(perDoc(a) == perDoc(b), s"pair ($a,$b) split across ${perDoc(a)}/${perDoc(b)}")
    }
    // and the aggregate query accounts for every document exactly once
    val agg = SparkEntry.queries("q76_cluster_split")(spark, sf).collect()
    assert(agg.map(_.getLong(1)).sum == d.count())
  }

  test("q77: the NULL group joins under <=> but never under =") {
    val rows = SparkEntry.queries("q77_null_semantics")(spark, sf).collect()
    assert(rows.head.isNullAt(0), "NULL key must sort first")
    val nullRow = rows.head
    assert(nullRow.getLong(2) == 0L, "= must not match NULL")
    assert(nullRow.getLong(3) == nullRow.getLong(1), "<=> must match the NULL group")
    rows.tail.foreach { r =>
      assert(!r.isNullAt(0))
      assert(r.getLong(2) == r.getLong(1) && r.getLong(3) == r.getLong(1))
    }
  }

  test("q79: exact correlation is in [-1,1] and the native aggregate honors the bound") {
    val rows = SparkEntry.queries("q79_stats_aggs")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(2)) <= 1.0)
      assert(r.getDouble(3) > 0.0)
      assert(r.getLong(4) == 1L, s"${r.getString(0)}: native corr drifted")
    }
  }

  test("q80: multiset identities — |A ∩all B| + |A \\all B| = |A|") {
    val m = SparkEntry.queries("q80_set_ops_all")(spark, sf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val aCount = Tables.orders(spark, sf).filter(col("o_orderkey") % 3 === 0).count()
    assert(m("intersect_all")._1 + m("except_all")._1 == aCount)
    m.values.foreach { case (n, nd) => assert(n >= nd) }
  }

  test("q81: evolving union accounts for every order exactly once") {
    val rows = SparkEntry.queries("q81_union_by_name")(spark, sf).collect()
    assert(rows.map(_.getLong(1)).sum == Tables.orders(spark, sf).count())
    assert(rows.exists(_.getString(0) == "<legacy>"))
  }

  test("q83: TWAP lies within each user's value envelope and weights sum to the span") {
    val rows = SparkEntry.queries("q83_twap")(spark, sf).collect()
    assert(rows.nonEmpty)
    val env = Tables.events(spark, sf).groupBy(col("user_id"))
      .agg(min(col("value")).as("lo"), max(col("value")).as("hi"),
        (unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))).as("span_us"))
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3)))).toMap
    rows.foreach { r =>
      val (lo, hi, spanUs) = env(r.getLong(0))
      assert(r.getDouble(2) >= lo - 1e-9 && r.getDouble(2) <= hi + 1e-9,
        s"user ${r.getLong(0)}: twap outside [lo,hi]")
      // total weighted seconds ≤ the user's whole active span
      assert(r.getLong(1) <= spanUs / 1000000L + 1)
    }
  }

  test("q84: cohorts partition the user base; dN never exceeds cohort size") {
    val rows = SparkEntry.queries("q84_cohorts")(spark, sf).collect()
    val totalUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.map(_.getLong(1)).sum == totalUsers, "cohorts must partition users")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1) && r.getLong(3) <= r.getLong(1))
    }
  }

  test("q85: fixed-point ranks are positive, bounded, and hub types outrank leaf users") {
    val rows = SparkEntry.queries("q85_pagerank")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, r) => assert(r > 0L && r < 100L * 1000000000L) }
    // event-type nodes aggregate many users' rank: hubs surface in the top-20
    assert(rows.exists(_._1.startsWith("t:")), s"expected a type hub in ${rows.toSeq}")
    // deterministic: rerun bit-identical
    val again = SparkEntry.queries("q85_pagerank")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(rows.toSeq == again.toSeq)
  }

  test("q88: shares sum to 100% within every status group") {
    val rows = SparkEntry.queries("q88_pct_of_total")(spark, sf).collect()
      .map(r => (r.getString(0), r.getDouble(3)))
    rows.groupBy(_._1).foreach { case (st, xs) =>
      val total = xs.map(_._2).sum
      assert(math.abs(total - 100.0) < 0.01, s"$st shares sum to $total")
    }
  }

  test("q89: above-own-average counts are strictly below each customer's order count") {
    val rows = SparkEntry.queries("q89_correlated_subq")(spark, sf).collect()
    assert(rows.nonEmpty)
    val perCust = Tables.orders(spark, sf).groupBy("o_custkey").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val n = perCust.getOrElse(r.getLong(0), 0L)
      assert(r.getLong(2) <= n, s"cust ${r.getLong(0)}")
      if (n > 0) assert(r.getLong(2) < n, "not every order can beat the average")
      else assert(r.isNullAt(1) && r.getLong(2) == 0L)
    }
  }

  test("q71: metrics match a direct recomputation on a sample of docs") {
    val got = SparkEntry.queries("q71_repetition")(spark, sf).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.take(10).foreach { case (id, _, text) =>
      val w = text.split(" ")
      val topFrac = w.groupBy(identity).values.map(_.length).max.toDouble / w.length
      val bg = w.sliding(2).map(_.mkString(" ")).toSeq
      val dupFrac = 1.0 - bg.distinct.size.toDouble / bg.size
      val r = got(id)
      assert(math.abs(r.getDouble(1) - topFrac) < 1e-5, s"doc $id top_word_frac")
      assert(math.abs(r.getDouble(2) - dupFrac) < 1e-5, s"doc $id dup_bigram_frac")
      assert(r.getBoolean(3) == (topFrac > 0.2 || dupFrac > 0.08), s"doc $id flag")
    }
  }
}
