package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LangModelSpec extends SparkSpec {
  import spark.implicits._

  test("training is deterministic; in-domain text scores fewer bits than gibberish") {
    val docs = Tables.documents(spark, sf)
    val m1 = LangModel.trainOnSample(docs, "doc_id", "text", sampleSize = 256)
    val m2 = LangModel.trainOnSample(docs, "doc_id", "text", sampleSize = 256)
    LangModel.register("lm-a", m1)
    LangModel.register("lm-b", m2)
    val texts = docs.orderBy("doc_id").limit(30).collect().map(_.getString(1))
    texts.foreach { t =>
      assert(LangModel.bitsPerToken(t, "lm-a") == LangModel.bitsPerToken(t, "lm-b"))
    }
    // character-scrambled versions of the same docs: same length, same
    // char distribution, no real words -> all-<unk> streams score higher
    val rnd = new scala.util.Random(3)
    def scramble(t: String): String =
      rnd.shuffle(t.replace(" ", "").toList).grouped(6).map(_.mkString).mkString(" ")
    val inDomain = texts.map(LangModel.bitsPerToken(_, "lm-a"))
    val gibberish = texts.map(t => LangModel.bitsPerToken(scramble(t), "lm-a"))
    // the synthetic corpus has weak bigram structure (template-generated),
    // so the separation is modest — but it must be systematic
    assert(inDomain.sum / inDomain.length + 0.15 < gibberish.sum / gibberish.length,
      s"in-domain ${inDomain.sum / inDomain.length} vs gibberish ${gibberish.sum / gibberish.length}")
    val worse = texts.indices.count(i => gibberish(i) > inDomain(i))
    assert(worse >= texts.length * 2 / 3,
      s"gibberish must score worse on most docs: $worse/${texts.length}")
  }

  test("codegen'd expression equals the driver score; empty text is finite") {
    val docs = Tables.documents(spark, sf).limit(20)
    LangModel.register("lm-spec",
      LangModel.trainOnSample(docs, "doc_id", "text", sampleSize = 64))
    val rows = docs
      .select(col("text"), LangModel.perplexityBits(col("text"), "lm-spec").as("bits"))
      .collect()
    rows.foreach { r =>
      assert(r.getDouble(1) == LangModel.bitsPerToken(r.getString(0), "lm-spec"))
      assert(!r.getDouble(1).isNaN && !r.getDouble(1).isInfinite)
    }
    assert(!LangModel.bitsPerToken("", "lm-spec").isNaN)
    assert(!LangModel.bitsPerToken("...!!!...", "lm-spec").isNaN)
  }

  test("curation perplexity gate drops the planted gibberish doc, keeps real text") {
    val real = Tables.documents(spark, sf).orderBy("doc_id").limit(40)
      .select(col("doc_id"), col("text"))
    LangModel.register("lm-gate",
      LangModel.trainOnSample(real, "doc_id", "text", sampleSize = 40))
    val planted = real.union(Seq(
      (99999L, "zq xv qq jzx wvq kkj zzq vxj qwz jkx zvq xqj wzk qvx jzz")
    ).toDF("doc_id", "text"))
    val bound = real
      .select(max(LangModel.perplexityBits(col("text"), "lm-gate"))).head().getDouble(0)
    val out = Curation.curate(planted, "doc_id", "text",
      cfg = Curation.Config(minQuality = 0.0, nearDup = None,
        perplexityGate = Some(("lm-gate", bound + 1e-9))))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(!out.contains(99999L), "gibberish must be gated")
    assert(out.size == 40, s"all real docs must survive, got ${out.size}")
  }
}
