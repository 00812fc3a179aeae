package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    "the cat and the hat and the bat",
    "the mat and the rat and the cat",
    "a thin theme in the thicket")

  test("training is deterministic and learns the corpus' frequent pairs") {
    val m1 = Bpe.train(corpus, 12)
    val m2 = Bpe.train(corpus, 12)
    assert(m1 == m2)
    assert(m1.nonEmpty && m1.length <= 12)
    // 'th' dominates this corpus — it must be merged early, and the
    // leading-space 'the' word must assemble from learned merges
    val merged = m1.map { case (a, b) => a + b }
    assert(merged.contains("th") || merged.contains(" th"), merged.toString)
  }

  test("encode round-trips: concatenated tokens reproduce the text exactly") {
    val v = Bpe.compile(Bpe.train(corpus, 20))
    for (text <- corpus :+ "unseen words, with punctuation! and 42 numbers...") {
      val toks = Bpe.pretokens(text).flatMap(Bpe.encodeWord(_, v)).toSeq
      assert(toks.mkString == text, toks.toString)
    }
  }

  test("more merges never increase the token count; zero merges = char count") {
    Bpe.register("m0", Bpe.train(corpus, 0))
    Bpe.register("m8", Bpe.train(corpus, 8))
    Bpe.register("m20", Bpe.train(corpus, 20))
    val text = corpus.head
    val counts = Seq("m0", "m8", "m20").map(Bpe.countTokens(text, _))
    assert(counts(0) == text.length) // unmerged char-level
    assert(counts(0) >= counts(1) && counts(1) >= counts(2), counts.toString)
    assert(counts(2) < counts(0), "20 merges must compress this corpus")
  }

  test("codegen'd expressions agree with the driver encode over the documents table") {
    val docs = Tables.documents(spark, sf).limit(64).cache()
    val merges = Bpe.trainOnSample(docs, "doc_id", "text", nMerges = 64, sampleSize = 64)
    Bpe.register("spec-docs", merges)
    val rows = docs
      .select(col("doc_id"), col("text"),
        Bpe.tokenCount(col("text"), "spec-docs").as("n_tok"),
        size(Bpe.tokens(col("text"), "spec-docs")).as("n_tok2"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val expect = Bpe.countTokens(r.getString(1), "spec-docs")
      assert(r.getInt(2) == expect && r.getInt(3) == expect, r.getLong(0).toString)
      // subword compression really happened vs character count
      assert(r.getInt(2) < r.getString(1).length)
    }
    // vocab id resolution failure is a clear error, not silent garbage
    val err = intercept[Exception] {
      docs.select(Bpe.tokenCount(col("text"), "no-such-vocab")).collect()
    }
    assert(err.getMessage != null)
  }

  test("re-registering a different vocab under the same id never serves stale encodings") {
    // the encode memo is keyed by Vocab generation, not the id string — a
    // caller retraining 'live' must see the new tokenization for words the
    // old vocab already cached on this thread
    Bpe.register("live", Bpe.train(corpus, 0))
    val text = corpus.head
    val charLevel = Bpe.countTokens(text, "live") // caches every word at gen A
    assert(charLevel == text.length)
    Bpe.register("live", Bpe.train(corpus, 20))
    val merged = Bpe.countTokens(text, "live") // same thread, same words
    assert(merged < charLevel, s"stale memo: got $merged vs char-level $charLevel")
    assert(Bpe.encodeTokens(text, "live").mkString == text)
  }

  test("the SQL surface resolves the registered function names") {
    Bpe.register("sql-vocab", Bpe.train(corpus, 16))
    LangModel.register("sql-lm", LangModel.train(corpus))
    spark.createDataset(corpus)(spark.implicits.newStringEncoder)
      .toDF("text").createOrReplaceTempView("bpe_sql_docs")
    val r = spark.sql(
      """SELECT graft_bpe_token_count(text, 'sql-vocab') AS n,
        |       size(graft_bpe_tokens(text, 'sql-vocab')) AS n2,
        |       graft_lm_bits_per_token(text, 'sql-lm') AS bits
        |FROM bpe_sql_docs""".stripMargin).collect()
    r.foreach { row =>
      assert(row.getInt(0) == row.getInt(1) && row.getInt(0) > 0)
      assert(!row.getDouble(2).isNaN)
    }
  }
}
