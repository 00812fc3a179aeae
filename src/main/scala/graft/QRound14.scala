package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-14 additions under the correctness gate. Same conventions as
  * [[Queries]].
  */
object QRound14 {
  import Tables._

  /** Unicode NFC normalization
    * ([[graft.ext.TextAnalysis.normalizeUnicode]] /
    * [[graft.functions.NormalizeExpression]]): the canonical first text
    * pass — precomposed ('é') and decomposed ('e' + U+0301) encodings of
    * the same logical text must collapse before any fingerprint, dedup or
    * token stage, or each variant ingests as a distinct document. The
    * corpus is ASCII, so the query DECOMPOSES it deterministically on
    * both engines first (every 'e' → 'e' + combining acute — the same
    * construction DuckDB builds with chr(769)), normalizes back, and pins
    * per-document: the decomposed length (one extra codepoint per 'e'),
    * the normalized length (equal to a direct in-place substitution),
    * and the md5 of the normalized UTF-8 bytes — byte-exact cross-engine
    * agreement on the composed output, not just lengths. Oracle: DuckDB's
    * `nfc_normalize` (utf8proc) vs the JDK Normalizer — both UAX #15.
    */
  def q126NfcNormalize(s: SparkSession, d: String): DataFrame = {
    val docs = load(s, d, "documents")
      .filter(col("doc_id") % 7 === 0)
    val acute = "\u0301" // combining acute (chr(769))
    val decomposed = regexp_replace(col("text"), "e", "e" + acute)
    val norm = graft.ext.TextAnalysis.normalizeUnicode(decomposed)
    docs.select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_orig"),
        length(decomposed).cast("long").as("n_decomposed"),
        length(norm).cast("long").as("n_norm"),
        md5(norm.cast("binary")).as("norm_md5"))
      .orderBy(col("doc_id"))
  }

  private val q126Sql =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_orig,
      |  CAST(length(replace(text, 'e', 'e' || chr(769))) AS BIGINT) AS n_decomposed,
      |  CAST(length(nfc_normalize(replace(text, 'e', 'e' || chr(769)))) AS BIGINT) AS n_norm,
      |  md5(nfc_normalize(replace(text, 'e', 'e' || chr(769)))) AS norm_md5
      |FROM documents
      |WHERE doc_id % 7 = 0
      |ORDER BY doc_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q126_nfc_normalize" -> (q126NfcNormalize _))

  val sql: Map[String, String] = Map(
    "q126_nfc_normalize" -> q126Sql)
}
