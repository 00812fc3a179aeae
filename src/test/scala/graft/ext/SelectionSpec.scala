package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** DSIR importance selection ([[Selection]]): exact micro-nat arithmetic
  * on a hand-computable fixture, family parity, and deterministic
  * Gumbel-top-k resampling.
  */
class SelectionSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  test("weights are the hand-computed bag-of-hashed-grams log ratio") {
    // one-token docs so every document is exactly one unigram feature
    val raw = Seq((1L, "cat"), (2L, "dog"), (3L, "cat")).toDF("id", "text")
    val target = Seq((10L, "cat"), (11L, "cat")).toDF("id", "text")
    val got = Selection.dsirWeights(raw, target, "id", "text", B)
      .as[(Long, Long)].collect().toMap

    // replicate the formula with the same bucketing
    val bucketOf = Seq("cat", "dog").map { g =>
      g -> Splits.hashBucketMd5(lit(g), B)
    }.map { case (g, c) =>
      g -> raw.sparkSession.range(1).select(c.cast("long")).head().getLong(0)
    }.toMap
    val catB = bucketOf("cat"); val dogB = bucketOf("dog")
    def dlp(ct: Long, cr: Long): Long =
      math.round((math.log((ct + 1.0) / (2.0 + B))
        - math.log((cr + 1.0) / (3.0 + B))) * 1e6)
    val catW = dlp(2, if (catB == dogB) 3 else 2)
    val dogW =
      if (catB == dogB) catW
      else dlp(0, 1)
    assert(got == Map(1L -> catW, 2L -> dogW, 3L -> catW), s"got $got")
    assert(catW > 0, "a target-aligned doc must score positive")
    if (catB != dogB) assert(dogW < catW, "an off-target doc must score lower")
  }

  test("identical docs tie and target-aligned docs outrank, in both hash families") {
    val raw = Seq(
      (1L, "alpha beta gamma"), (2L, "alpha beta gamma"),
      (3L, "zeta eta theta iota kappa")).toDF("id", "text")
    val target = Seq((9L, "alpha beta gamma alpha beta")).toDF("id", "text")
    for (fast <- Seq(false, true)) {
      val w = Selection.dsirWeights(raw, target, "id", "text", 4096, fast)
        .as[(Long, Long)].collect().toMap
      assert(w(1L) == w(2L), s"identical docs must tie (fast=$fast)")
      assert(w(1L) > w(3L),
        s"target-aligned doc must outrank the off-target one (fast=$fast): $w")
    }
  }

  test("gumbel-top-k resample is deterministic and respects dominant weights") {
    val weights = ((1L to 50L).map(i => (i, 0L)) :+ (99L, 1000000000L))
      .toDF("id", "w_micros")
    val s1 = Selection.dsirSample(weights, "id", 10).as[(Long, Long)]
      .collect().toSeq.sortBy(_._1)
    val s2 = Selection.dsirSample(weights, "id", 10).as[(Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(s1 == s2, "the sample must be deterministic")
    assert(s1.size == 10)
    assert(s1.exists(_._1 == 99L),
      "a weight 1000 nats above the field must always be drawn")
  }
}
