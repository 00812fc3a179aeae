package graft.ext

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class CurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf)
  private lazy val eval = docs.filter(col("source") === "src0").select("doc_id", "text")
  private lazy val curated = Curation.curate(
    docs.filter(col("source") =!= "src0"), "doc_id", "text",
    evalDocs = Some(eval),
    cfg = Curation.Config(packTokens = Some(512))).cache()

  test("curated corpus: quality floor, no exact or near duplicates, decontaminated") {
    val rows = curated.select("doc_id", "text", "quality").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(2) >= 0.5))
    val texts = rows.map(_.getString(1))
    assert(texts.distinct.length == texts.length, "exact dups must be gone")
    // no near-dup pair among survivors
    val pairs = Dedup.minhashLshPairs(
      curated.select("doc_id", "text"), "doc_id", "text", 3, 16, 4, 0.5, fast = true)
    assert(pairs.count() == 0, "near-dup survivors found")
    // no 13-gram overlap with the eval slice
    val evalG = eval.collect().flatMap(_.getString(1).split(" ").sliding(13).map(_.mkString(" "))).toSet
    rows.foreach { r =>
      val g = r.getString(1).split(" ").sliding(13).map(_.mkString(" "))
      assert(!g.exists(evalG), s"doc ${r.getLong(0)} contaminated")
    }
  }

  test("splits partition the survivors; packing bins are contiguous per split") {
    val bySplit = curated.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "val", "test")))
    assert(bySplit.values.sum == curated.count())
    curated.select("split", "seq_id").distinct().collect()
      .groupBy(_.getString(0)).foreach { case (_, rs) =>
        val ids = rs.map(_.getLong(1)).sorted.toSeq
        assert(ids == (0L until ids.length).toSeq, s"gappy bins: $ids")
      }
  }

  test("pipeline equals the hand-composed stages") {
    val manual = {
      var d = docs.filter(col("source") =!= "src0")
        .withColumn("quality", TextAnalysis.qualityScore(col("text")))
        .filter(col("quality") >= 0.5)
      d = graft.core.ops.TableOps.dedupeLastWins(d, Seq("text"), Seq(col("doc_id").asc))
      val pairs = Dedup.minhashLshPairs(d, "doc_id", "text", 3, 16, 4, 0.5, fast = true)
      val clusters = Dedup.dupClusters(pairs, "id_a", "id_b")
      val losers = clusters.filter(col("id") =!= col("cluster")).select("id")
      d.join(losers, d("doc_id") === losers("id"), "left_anti")
    }
    // decontamination is independently verified above; compare the
    // dedup-stage survivors
    val got = curated.select("doc_id").collect().map(_.getLong(0)).toSet
    val manualIds = manual.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.subsetOf(manualIds), "pipeline must not resurrect removed docs")
    assert((manualIds -- got).forall { id =>
      // anything extra that manual kept was removed by decontamination
      val txt = docs.filter(col("doc_id") === id).head().getAs[String]("text")
      val evalG = eval.collect().flatMap(_.getString(1).split(" ").sliding(13).map(_.mkString(" "))).toSet
      txt.split(" ").sliding(13).map(_.mkString(" ")).exists(evalG)
    }, "only contaminated docs may differ between pipeline and manual stages")
  }

  test("normalization pre-stages: pii masked, boilerplate stripped, repetitive docs gated") {
    import spark.implicits._
    val boiler = "SUBSCRIBE to our newsletter"
    val raw = Seq(
      (1L, s"genuinely useful content about data systems from alice@example.com today\n$boiler"),
      (2L, s"different but also real content worth keeping around for training\n$boiler"),
      (3L, "spam spam spam spam spam spam spam spam spam spam spam spam") // repetition-gated
    ).toDF("doc_id", "text")
    val out = Curation.curate(raw, "doc_id", "text",
      cfg = Curation.Config(
        minQuality = 0.0, nearDup = None, scrubPii = true,
        boilerplateSep = Some("\n"), maxDupNgramFrac = Some(0.5)))
      .orderBy("doc_id").collect()
    val byId = out.map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(byId.keySet == Set(1L, 2L), byId.keySet.toString)
    assert(byId(1L).contains("<EMAIL>") && !byId(1L).contains("alice@"), byId(1L))
    assert(!byId(1L).contains(boiler) && !byId(2L).contains(boiler))
  }

  test("NFC pre-stage: encoding variants of one doc collapse to a single survivor") {
    import spark.implicits._
    val composed = "caf\u00e9 society essays on the long afternoon of european letters"
    val decomposed = composed.replace("\u00e9", "e\u0301")
    val out = Curation.curate(
      Seq((1L, composed), (2L, decomposed),
        (3L, "an unrelated treatise on parquet row group statistics and pruning"))
        .toDF("doc_id", "text"),
      "doc_id", "text",
      cfg = Curation.Config(normalizeNfc = true, nearDup = None,
        minQuality = 0.0))
    val ids = out.select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 3L), s"exact dedup must collapse the encodings: $ids")
  }

  test("packing with a BPE vocab budgets real subword tokens, not whitespace splits") {
    import spark.implicits._
    val raw = (0L until 40L)
      .map(i => (i, s"document number $i with some repeated filler text to pack"))
      .toDF("doc_id", "text")
    Bpe.register("curation-spec", Bpe.trainOnSample(raw, "doc_id", "text", 64, 64))
    val out = Curation.curate(raw, "doc_id", "text",
      cfg = Curation.Config(minQuality = 0.0, nearDup = None,
        splits = Seq("train" -> 100), packTokens = Some(64),
        bpeVocabId = Some("curation-spec")))
      .orderBy("doc_id")
      .select(col("doc_id"), col("text"), col("seq_id"),
        Bpe.tokenCount(col("text"), "curation-spec").as("n_tok"))
      .collect()
    assert(out.length == 40)
    // recompute the cumsum bins from the REAL token counts
    var cum = 0L
    val expect = out.map { r => val bin = cum / 64; cum += r.getInt(3); bin }
    assert(out.map(_.getLong(2)).sameElements(expect))
    assert(expect.last > 0, "more than one bin must form")
  }

  test("substring-dedup pre-stage strips the shared span corpus-wide, keeps unique text") {
    import spark.implicits._
    val shared = "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGH" // 44 chars
    val raw = Seq(
      (1L, s"first document unique lead-in $shared first unique tail"),
      (2L, s"second document other beginning $shared second ending"),
      (3L, "third document with nothing repeated across this tiny corpus at all")
    ).toDF("doc_id", "text")
    val out = Curation.curate(raw, "doc_id", "text",
      cfg = Curation.Config(minQuality = 0.0, nearDup = None,
        substringDedupGram = Some(40)))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(!out(1L).contains(shared) && !out(2L).contains(shared))
    assert(out(1L).contains("first document unique lead-in") && out(1L).contains("first unique tail"))
    assert(out(3L) == "third document with nothing repeated across this tiny corpus at all")
  }
}
