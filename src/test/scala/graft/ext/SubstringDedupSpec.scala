package graft.ext

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  // A 48-char block shared verbatim by docs 0 and 1 (cross-doc dup), a doc
  // with the same block twice (within-doc dup), and a fully distinct doc.
  private val block = "ABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789abcdefghijkl" // 48 chars
  private lazy val docs = Seq(
    (0L, s"prefix one $block suffix one"),
    (1L, s"a different lead-in $block and a different tail"),
    (2L, s"lead $block mid $block done"),
    (3L, "this document shares no forty character run with any other one here ok")
  ).toDF("doc_id", "text")

  test("substring dedup: shared 48-char block detected in every holder, distinct doc clean") {
    val stats = SubstringDedup.dupStats(docs, "doc_id", "text", gramLen = 40)
      .orderBy("id").collect()
    assert(stats.map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
    // Each merged span covers at least the whole shared block.
    assert(stats.forall(_.getLong(2) >= block.length))
    // Doc 2 holds the block twice — at least double the dup mass of doc 0.
    val mass = stats.map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(mass(2L) >= 2 * block.length)
  }

  test("hashed and exact-string gram keys produce identical spans") {
    val a = SubstringDedup.dupSpans(docs, "doc_id", "text", 40, hashed = true)
      .orderBy("id", "span_start").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val b = SubstringDedup.dupSpans(docs, "doc_id", "text", 40, hashed = false)
      .orderBy("id", "span_start").collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(a.sameElements(b))
  }

  test("spans are disjoint, in bounds, and start/end on duplicated grams") {
    val spans = SubstringDedup.dupSpans(docs, "doc_id", "text", 40)
      .orderBy("id", "span_start").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    val lens = docs.collect().map(r => r.getLong(0) -> r.getString(1).length).toMap
    spans.groupBy(_._1).foreach { case (id, ss) =>
      ss.foreach { case (_, s, e) =>
        assert(s >= 0 && e <= lens(id) && e - s >= 40)
      }
      ss.sliding(2).foreach {
        case Array((_, _, e1), (_, s2, _)) => assert(s2 > e1) // merged if touching
        case _ =>
      }
    }
  }

  test("stride > 1 only drops positions, never invents them") {
    val full = SubstringDedup.dupGramPositions(docs, "doc_id", "text", 40, stride = 1)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val strided = SubstringDedup.dupGramPositions(docs, "doc_id", "text", 40, stride = 3)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(strided.subsetOf(full))
    assert(strided.forall(_._2 % 3 == 0))
  }

  test("stripDupSpans removes exactly the dup mass and leaves clean docs untouched") {
    val cleaned = SubstringDedup.stripDupSpans(docs, "doc_id", "text", 40)
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val mass = SubstringDedup.dupStats(docs, "doc_id", "text", 40)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(cleaned(3L) == orig(3L))
    for (id <- Seq(0L, 1L, 2L))
      assert(cleaned(id).length == orig(id).length - mass(id).toInt)
    // The shared block is gone from every cleaned text.
    assert(!cleaned.values.exists(_.contains(block)))
  }

  test("docs shorter than gramLen are skipped (no descending-sequence explosion)") {
    val tiny = Seq((0L, "short"), (1L, "short")).toDF("doc_id", "text")
    assert(SubstringDedup.dupGramPositions(tiny, "doc_id", "text", 40).count() == 0L)
  }
}
