package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Document chunking — the RAG / context-window preprocessing stage: split
  * each document into fixed-size token windows with a configurable stride
  * (overlap = chunk - stride), the standard shape for embedding-index
  * ingestion and for packing long documents into model context windows.
  *
  * Design for scale: chunking is a NARROW transform — tokenize, generate
  * window starts, slice — all inside the scan stage's whole-stage codegen;
  * zero shuffles, so it pipelines into whatever shuffle the consumer needs
  * (embedding, dedup, write). The reference has no chunking surface (its
  * pipelines hand whole `text` fields to attachments —
  * labelspark/uploader.py:120-141); this is a training-data-pipeline
  * extension.
  */
object Chunking {

  /** Window starts 0, stride, 2*stride … < size(tokens). The `sequence`
    * upper bound is `n - 1` guarded to never descend below the start (the
    * q37/q71 descending-sequence trap: `sequence(a, b)` DESCENDS when
    * b < a, so an empty token array must filter out, not wrap).
    */
  private def starts(nTokens: Column, stride: Int): Column =
    sequence(lit(0), nTokens - 1, lit(stride))

  /** Chunk an ARRAY column: one output row per (row, window). Emits
    * `chunk_idx` (0-based window ordinal), `chunk_tokens` (window size,
    * short only for the final window), and `chunk` (the token slice).
    * Rows with empty arrays produce no chunks.
    */
  def chunkArray(df: DataFrame, arrCol: Column, chunkTokens: Int,
      strideTokens: Int, keep: Seq[String]): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(strideTokens >= 1 && strideTokens <= chunkTokens,
      "strideTokens must be in [1, chunkTokens] (stride > chunk skips tokens)")
    val keepCols = keep.map(col)
    df.select((keepCols :+ arrCol.as("__toks")): _*)
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 1)
      .select((keepCols ++ Seq(col("__toks"), col("__n"),
        posexplode(starts(col("__n"), strideTokens)).as(Seq("chunk_idx", "__start")))): _*)
      .select((keepCols ++ Seq(
        col("chunk_idx"),
        least(lit(chunkTokens), col("__n") - col("__start")).cast("int").as("chunk_tokens"),
        slice(col("__toks"), col("__start") + 1, lit(chunkTokens)).as("chunk"))): _*)
  }

  /** Whitespace-token chunking of a text column (the q46 single-space token
    * convention, shared with the DuckDB oracle); `chunk_text` re-joins the
    * window so downstream embedding/indexing gets flat strings.
    */
  def chunkByTokens(df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int, strideTokens: Int): DataFrame =
    chunkArray(df, split(col(textCol), " "), chunkTokens, strideTokens,
      keep = Seq(idCol))
      .withColumn("chunk_text", array_join(col("chunk"), " "))
      .drop("chunk")

  /** BPE-token chunking: windows counted in REAL subword tokens (the unit
    * that bounds a model context window), via the registered codegen'd
    * tokenizer ([[Bpe.tokens]]). `chunk_text` concatenates the subword
    * slice back to running text — exact reconstruction, because BPE tokens
    * concatenate to the original string ([[BpeSpec]] round-trip).
    */
  def chunkByBpeTokens(df: DataFrame, idCol: String, textCol: String,
      vocabId: String, chunkTokens: Int, strideTokens: Int): DataFrame =
    chunkArray(df, Bpe.tokens(col(textCol), vocabId), chunkTokens, strideTokens,
      keep = Seq(idCol))
      .withColumn("chunk_text", array_join(col("chunk"), ""))
      .drop("chunk")
}
