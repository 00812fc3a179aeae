package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact duplicated-substring detection across a document corpus — the
  * "dedup training data at the substring level" operation (cf. Lee et al.,
  * "Deduplicating Training Data Makes Language Models Better", ACL 2022,
  * which does this with a suffix array on the concatenated corpus). The
  * reference has no such operator (its dedup surface stops at row identity);
  * this is part of the training-data extension set alongside
  * [[Dedup.minhashLshPairs]] (document level) and [[Similarity]] (embedding
  * level).
  *
  * Spark-first decomposition instead of a suffix array: a position `p` of
  * document `d` is *duplicated* iff the `gramLen`-character gram starting at
  * `p` occurs at least twice in the corpus (in another document, or at
  * another position of the same document — both are repetition a trainer
  * would down-weight). Runs of duplicated positions merge into maximal
  * spans: any corpus substring of length ≥ gramLen that appears twice is
  * covered end-to-end by duplicated grams, so the merged spans are exactly
  * the maximal duplicated regions detectable at resolution gramLen.
  *
  * Scale shape (the 100 TB story):
  *   - the gram explode is O(total corpus chars) rows — the same asymptotic
  *     footprint as the suffix array, but embarrassingly parallel and
  *     spillable instead of a monolithic in-memory index; `stride > 1`
  *     divides it at the cost of missing duplicated regions shorter than
  *     `gramLen + stride - 1` chars (the standard sampling trade).
  *   - duplicate detection is ONE aggregation on the gram key (map-side
  *     partial count) followed by a LEFT SEMI join of the positions against
  *     the `count > 1` keys. On a mostly-unique corpus the dup-key side is
  *     tiny → AQE broadcasts the semi join and the position stream never
  *     shuffles; on a dup-heavy corpus both sides shuffle on the gram key
  *     and the exchange under the aggregate is reused for the join.
  *   - `hashed = true` replaces the gram string with its xxhash64 — 8-byte
  *     shuffle keys instead of `gramLen` bytes (the only form that makes
  *     sense at 100 TB; a 64-bit collision needs ~2^32 grams per false
  *     positive pair). The exact-string form exists for engine-portable
  *     oracle comparison.
  *   - span merge + per-doc stats shuffle on doc id only.
  */
object SubstringDedup {

  /** Positions whose gram occurs ≥ 2 times in the corpus: `(id, pos)`,
    * 0-based. Rows shorter than `gramLen` are skipped BEFORE the sequence is
    * built (`sequence(a, b)` descends when `b < a` — the q37/q71 trap).
    */
  def dupGramPositions(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int, hashed: Boolean = true, stride: Int = 1): DataFrame = {
    require(gramLen >= 1, "gramLen must be positive")
    require(stride >= 1, "stride must be positive")
    val positions = df
      .filter(length(col(textCol)) >= gramLen)
      .select(col(idCol).as("id"), col(textCol).as("text"))
      .withColumn("pos",
        explode(sequence(lit(0), length(col("text")) - gramLen, lit(stride))))
    val gram = expr(s"substring(text, pos + 1, $gramLen)")
    val keyed = positions
      .select(col("id"), col("pos"), (if (hashed) xxhash64(gram) else gram).as("gk"))
    val dupKeys = keyed.groupBy(col("gk"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).select("gk")
    keyed.join(dupKeys, Seq("gk"), "left_semi").select("id", "pos")
  }

  /** Maximal duplicated spans per document: `(id, span_start, span_end)`
    * with `span_end` exclusive. Gaps-and-islands over the sorted duplicated
    * positions: a new island starts where `pos` exceeds the previous
    * position by more than `gramLen` (equal = adjacent grams = one
    * contiguous duplicated region). Positions within one doc are ≤ doc
    * length, so the window sort is per-doc-bounded.
    */
  def dupSpans(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int, hashed: Boolean = true, stride: Int = 1): DataFrame = {
    val dup = dupGramPositions(df, idCol, textCol, gramLen, hashed, stride)
    val byDoc = Window.partitionBy(col("id")).orderBy(col("pos"))
    val prev = lag(col("pos"), 1).over(byDoc)
    dup
      .withColumn("step",
        when(prev.isNull || col("pos") > prev + gramLen, lit(1)).otherwise(lit(0)))
      .withColumn("island", sum(col("step")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("id"), col("island"))
      .agg(min(col("pos")).as("span_start"),
        (max(col("pos")) + gramLen).as("span_end"))
      .select(col("id"), col("span_start"), col("span_end"))
  }

  /** Per-document duplication stats over the merged spans: `(id, dup_spans,
    * dup_chars)` — documents with no duplicated position are absent.
    */
  def dupStats(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int, hashed: Boolean = true, stride: Int = 1): DataFrame =
    dupSpans(df, idCol, textCol, gramLen, hashed, stride)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("dup_spans"),
        sum(col("span_end") - col("span_start")).as("dup_chars"))

  /** Rewrite each document with every duplicated span removed (the
    * aggressive variant of Lee et al.'s "drop one copy": repetition is cut
    * everywhere it is detected, keeping the inter-span text). Documents with
    * no duplicated span pass through unchanged. The span list is collected
    * per doc (bounded by doc length / gramLen) and the rebuild is one
    * codegen'd `aggregate` over the sorted spans — no UDF, no driver loop.
    */
  def stripDupSpans(df: DataFrame, idCol: String, textCol: String,
      gramLen: Int, hashed: Boolean = true): DataFrame = {
    val spans = dupSpans(df, idCol, textCol, gramLen, hashed)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("span_start"), col("span_end"))))
        .as("__ssd_spans"))
      .withColumnRenamed("id", "__ssd_id")
    val txt = df(textCol)
    val cleaned = aggregate(
      col("__ssd_spans"),
      struct(lit(0).as("from"), lit("").as("acc")),
      (acc, sp) => struct(
        sp.getField("span_end").as("from"),
        concat(acc.getField("acc"),
          segment(txt, acc.getField("from"), sp.getField("span_start"))).as("acc")),
      acc => concat(acc.getField("acc"),
        segment(txt, acc.getField("from"), length(txt))))
    df.join(spans, df(idCol) === spans("__ssd_id"), "left")
      .withColumn(textCol,
        when(col("__ssd_spans").isNull, txt).otherwise(cleaned))
      .drop("__ssd_id", "__ssd_spans")
  }

  /** `substring(text, from+1, until-from)` with Column bounds (the built-in
    * `substring(Column, Int, Int)` only takes literals).
    */
  private def segment(text: Column, from: Column, until: Column): Column =
    text.substr(from + 1, greatest(until - from, lit(0)))
}
