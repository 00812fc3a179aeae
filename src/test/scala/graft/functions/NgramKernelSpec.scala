package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The r14 optimization kernels must be DROP-IN equal to the composed
  * built-in chains they replaced, and the let-bind plan discipline that
  * keeps them single-evaluation must hold.
  */
class NgramKernelSpec extends SparkSpec {
  import spark.implicits._

  test("graft_ngram_hashes equals xxhash64 over the built gram strings") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog",
      "a b", "single", "", "x  y", // double space → empty middle token
      "padded tokens here and more of them for threes").toDF("text")
    for (n <- Seq(1, 2, 3, 13)) {
      val w = split(col("text"), " ")
      val composed = when(size(w) >= n, transform(
        sequence(lit(1), size(w) - (n - 1)),
        i => xxhash64(concat_ws(" ", slice(w, i, lit(n))))))
        .otherwise(array().cast("array<long>"))
      val rows = docs.select(
        call_function("graft_ngram_hashes", w, lit(n), lit(n)).as("kern"),
        composed.as("comp")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"n=$n")
      }
    }
    // multi-n form: same multiset as the per-n union
    val w = split(col("text"), " ")
    val both = docs.select(
      call_function("graft_ngram_hashes", w, lit(1), lit(2)).as("kern"),
      concat(call_function("graft_ngram_hashes", w, lit(1), lit(1)),
        call_function("graft_ngram_hashes", w, lit(2), lit(2))).as("u")).collect()
    both.foreach { r =>
      assert(r.getSeq[Long](0).sorted == r.getSeq[Long](1).sorted)
    }
    // null in, null out
    val n0 = Seq(Option.empty[String]).toDF("text")
      .select(call_function("graft_ngram_hashes", split(col("text"), " "),
        lit(2), lit(2))).collect().head
    assert(n0.isNullAt(0))
  }

  test("graft_token_counts equals the composed distinct+filter-count chain") {
    val docs = Seq("b a b c a b", "solo", "", "x x x").toDF("text")
    val w = filter(split(lower(col("text")), "\\s+"), t => length(t) > 0)
    val rows = docs.select(
      call_function("graft_token_counts", w).as("kern"),
      transform(array_distinct(w), t => struct(t.as("token"),
        size(filter(w, x => x === t)).cast("long").as("tf"))).as("comp")).collect()
    rows.foreach { r =>
      assert(r.getSeq[org.apache.spark.sql.Row](0) == r.getSeq[org.apache.spark.sql.Row](1))
    }
  }

  test("sign-band kernel evaluates once per side: no inferred filter substitution") {
    val emb = graft.Tables.embeddings(spark, sf)
    val pairs = graft.ext.Similarity.nearDupPairsBanded(
      emb, "vec_id", "embedding", threshold = 0.8, dim = 64)
    val plan = pairs.queryExecution.optimizedPlan.toString
    val occurrences = "graft_sign_bands".r.findAllIn(plan).length
    // one kernel call per banded-subtree reference (two all-pairs join
    // sides + the hot-bucket chain branch = 3; AQE exchange reuse dedups
    // them at runtime), never the doubled size()/isnotnull() substitutions
    // at the scan
    assert(occurrences <= 3, s"sign-band kernel appears $occurrences times:\n${plan.take(2000)}")
    assert(!plan.contains("size(graft_sign_bands"),
      "inferred generate filter substituted the kernel into the scan")
  }

  test("minhash band kernel is not substituted into the scan filter") {
    val docs = graft.Tables.documents(spark, sf)
    val banded = graft.ext.Dedup.bandIndex(docs, "doc_id", "text",
      shingleN = 3, k = 16, bands = 4, fast = true)
    val plan = banded.queryExecution.optimizedPlan.toString
    assert(!plan.contains("size(graft_minhash_bands"),
      "inferred generate filter substituted the minhash kernel into the scan")
  }
}
