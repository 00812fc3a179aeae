package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  test("whitespace chunking: hand-checked windows, full coverage, overlap") {
    // 10 tokens, chunk 4, stride 3 → starts 0,3,6,9
    val df = Seq((1L, (1 to 10).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val got = Chunking.chunkByTokens(df, "id", "text", chunkTokens = 4, strideTokens = 3)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_tokens", "chunk_text")
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (0, 4, "t1 t2 t3 t4"),
      (1, 4, "t4 t5 t6 t7"),
      (2, 4, "t7 t8 t9 t10"),
      (3, 1, "t10")))
  }

  test("every token is covered; consecutive chunks overlap by chunk - stride") {
    val docs = graft.Tables.documents(spark, sf).limit(50)
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 64, 48)
    val perDoc = chunks.groupBy("doc_id")
      .agg(max("chunk_idx").as("last_idx"),
        count(lit(1)).as("n_chunks"),
        sum("chunk_tokens").as("sum_tokens"))
      .join(docs.select(col("doc_id"), size(split(col("text"), " ")).as("n_toks")), "doc_id")
      .collect()
    assert(perDoc.nonEmpty)
    perDoc.foreach { r =>
      val (lastIdx, nChunks, sumTok, nToks) =
        (r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4))
      assert(nChunks == lastIdx + 1)
      // starts are 0,48,...,lastIdx*48 with lastIdx*48 < nToks
      assert(lastIdx == (nToks - 1) / 48)
      // total window token mass = coverage + overlap: every non-final chunk
      // of 64 re-covers 16 tokens of its successor's range
      val expected = (0 until (nToks - 1) / 48 + 1)
        .map(i => math.min(64, nToks - i * 48)).sum
      assert(sumTok == expected, s"doc window mass $sumTok != $expected")
    }
  }

  test("degenerate inputs: empty text filtered, stride > chunk rejected") {
    val df = Seq((1L, ""), (2L, "a b")).toDF("id", "text")
    // split("", " ") → [""], size 1 → one 1-token chunk of the empty token
    val got = Chunking.chunkByTokens(df, "id", "text", 4, 2).collect()
    assert(got.length == 2)
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "id", "text", 4, 5)
    }
    intercept[IllegalArgumentException] {
      Chunking.chunkByTokens(df, "id", "text", 0, 1)
    }
  }

  test("BPE chunking reconstructs the exact text and bounds window size in real tokens") {
    val docs = graft.Tables.documents(spark, sf).limit(16).cache()
    Bpe.register("chunk-spec",
      Bpe.trainOnSample(docs, "doc_id", "text", nMerges = 128, sampleSize = 16))
    val chunks = Chunking.chunkByBpeTokens(docs, "doc_id", "text", "chunk-spec",
      chunkTokens = 32, strideTokens = 32) // no overlap → concat reconstructs
    val rebuilt = chunks.groupBy("doc_id")
      .agg(concat_ws("", array_sort(collect_list(struct(col("chunk_idx"), col("chunk_text"))))
        .getField("chunk_text")).as("rebuilt"))
    val joined = rebuilt.join(docs, "doc_id")
      .select(col("rebuilt") === col("text")).collect()
    assert(joined.nonEmpty && joined.forall(_.getBoolean(0)))
    assert(chunks.filter(col("chunk_tokens") > 32).count() == 0)
  }

  test("the chunking plan is narrow: no exchange before the windows exist") {
    val docs = graft.Tables.documents(spark, sf)
    val chunks = Chunking.chunkByTokens(docs, "doc_id", "text", 64, 48)
    chunks.collect()
    val exchanges = new org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper {}
      .collectWithSubqueries(chunks.queryExecution.executedPlan) {
        case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
      }.size
    // Tables.documents widens the single-row-group scan with one repartition;
    // chunking itself must add none on top
    assert(exchanges <= 1, s"chunking added a shuffle:\n${chunks.queryExecution.executedPlan}")
  }
}
