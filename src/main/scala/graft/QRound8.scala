package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Agreement, Chunking}

/** Round-8 additions: document chunking (the RAG / context-window prep
  * stage), per-source crawl quotas (domain balancing), and inter-annotator
  * agreement (Cohen's kappa — the labeling-QA statistic of the reference's
  * domain; labelspark itself stops at raw consensus counts in its project
  * exports, labelspark/client.py:500-523's flattened label frames).
  * Same gate conventions as [[Queries]].
  */
object QRound8 {
  import Tables._

  /** Fixed-size token windows with overlap (chunk 64, stride 48 → 16-token
    * overlap): one row per (doc, window). The whole transform is narrow —
    * tokenize/generate-starts/slice fuse into the scan stage — so the only
    * exchange in the plan is the oracle's total ORDER BY.
    */
  def q102DocChunking(s: SparkSession, d: String): DataFrame =
    Chunking.chunkByTokens(documents(s, d), "doc_id", "text",
      chunkTokens = 64, strideTokens = 48)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val q102Sql =
    """WITH t AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
      |s AS (
      |  SELECT doc_id, toks, len(toks) AS n,
      |         unnest(range(0, len(toks), 48)) AS start
      |  FROM t WHERE len(toks) >= 1)
      |SELECT doc_id,
      |  (start // 48)::INT AS chunk_idx,
      |  least(64, n - start)::INT AS chunk_tokens,
      |  array_to_string(list_slice(toks, start + 1, start + 64), ' ') AS chunk_text
      |FROM s
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Per-source document quota (crawl/domain balancing): keep at most 100
    * docs per source, picked by md5-of-id order — a deterministic,
    * engine-portable "uniform at random" that never resamples the same way
    * twice across sources. Runs through [[graft.plans.TopKPerKey]]: a
    * per-partition bounded heap per source, then one shuffle of the ≤100·
    * |sources| survivors — no full sort, no window over the whole corpus.
    */
  def q103SourceQuota(s: SparkSession, d: String): DataFrame =
    graft.plans.TopKPerKey.topKPerKey(
      documents(s, d).select(col("source"), col("doc_id"),
        md5(col("doc_id").cast("string")).as("__pick")),
      Seq("source"), Seq(col("__pick"), col("doc_id")), 100)
      .select(col("source"), col("doc_id"))
      .orderBy(col("source"), col("doc_id"))

  private val q103Sql =
    """SELECT source, doc_id
      |FROM (SELECT source, doc_id,
      |        row_number() OVER (
      |          PARTITION BY source
      |          ORDER BY md5(doc_id::VARCHAR), doc_id) AS rk
      |      FROM documents)
      |WHERE rk <= 100
      |ORDER BY source, doc_id""".stripMargin

  /** Cohen's kappa per source between the declared `lang` label and the
    * marker-based prediction ([[graft.ext.TextAnalysis.langId]], q22's
    * column) — "how far beyond chance does the metadata agree with the
    * model" per corpus slice, the labeling-QA statistic. All-integer
    * numerator/denominator ([[graft.ext.Agreement]]); the one double
    * division divides identical BIGINTs on both engines.
    */
  def q104LabelAgreement(s: SparkSession, d: String): DataFrame =
    Agreement.cohenKappaBy(
      documents(s, d).select(col("source"), col("lang"),
        graft.ext.TextAnalysis.langId(col("text")).as("lang_pred")),
      "source", "lang", "lang_pred")
      .orderBy(col("source"))

  private val q104Sql =
    s"""WITH p AS (
       |  SELECT source, lang, ${QPipelineExt.langPredSqlExpr} AS pred
       |  FROM documents),
       |cells AS (
       |  SELECT source, lang, pred, CAST(count(*) AS BIGINT) AS cnt
       |  FROM p GROUP BY 1, 2, 3),
       |tot AS (
       |  SELECT source, CAST(sum(cnt) AS BIGINT) AS n_items,
       |         CAST(sum(CASE WHEN lang = pred THEN cnt ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM cells GROUP BY 1),
       |r AS (SELECT source, lang, CAST(sum(cnt) AS BIGINT) AS rt
       |      FROM cells GROUP BY 1, 2),
       |c AS (SELECT source, pred, CAST(sum(cnt) AS BIGINT) AS ct
       |      FROM cells GROUP BY 1, 2),
       |ch AS (
       |  SELECT r.source, CAST(sum(r.rt * c.ct) AS BIGINT) AS chance_sum
       |  FROM r JOIN c ON r.source = c.source AND r.lang = c.pred
       |  GROUP BY 1)
       |SELECT tot.source, n_items, n_agree,
       |  COALESCE(chance_sum, 0) AS chance_sum,
       |  CASE WHEN n_items * n_items <> COALESCE(chance_sum, 0)
       |    THEN CAST(n_items * n_agree - COALESCE(chance_sum, 0) AS DOUBLE)
       |       / CAST(n_items * n_items - COALESCE(chance_sum, 0) AS DOUBLE)
       |  END AS kappa
       |FROM tot LEFT JOIN ch ON tot.source = ch.source
       |ORDER BY tot.source""".stripMargin

  /** Hard-negative mining (contrastive-training data prep; equally the
    * vector-DB metadata-filtered search shape): for 8 fixed query vectors,
    * the 3 most-cosine-similar vectors with a DIFFERENT label —
    * [[graft.ext.Similarity.hardNegatives]]: query set broadcasts, corpus
    * never shuffles, TopKPerKey heap-cuts per query.
    */
  def q105HardNegatives(s: SparkSession, d: String): DataFrame =
    graft.ext.Similarity.hardNegatives(embeddings(s, d), "vec_id", "embedding",
      "label", queryIds = 0L to 7L, k = 3)
      .orderBy(col("query_id"), col("sim").desc, col("neg_id"))

  private val q105Sql =
    """WITH q AS (
      |  SELECT vec_id AS query_id, label AS q_label, embedding AS q_vec
      |  FROM embeddings WHERE vec_id BETWEEN 0 AND 7),
      |pairs AS (
      |  SELECT q.query_id, e.vec_id AS neg_id,
      |    round(
      |      list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * q.q_vec[i]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(range(1, 65), i -> e.embedding[i]::DOUBLE * e.embedding[i]::DOUBLE)))
      |       * sqrt(list_sum(list_transform(range(1, 65), i -> q.q_vec[i]::DOUBLE * q.q_vec[i]::DOUBLE)))), 6) AS sim
      |  FROM embeddings e JOIN q ON e.label <> q.q_label)
      |SELECT query_id, neg_id, sim
      |FROM pairs
      |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neg_id) <= 3
      |ORDER BY query_id, sim DESC, neg_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_doc_chunking"    -> (q102DocChunking _),
    "q103_source_quota"    -> (q103SourceQuota _),
    "q104_label_agreement" -> (q104LabelAgreement _),
    "q105_hard_negatives"  -> (q105HardNegatives _))

  val sql: Map[String, String] = Map(
    "q102_doc_chunking"    -> q102Sql,
    "q103_source_quota"    -> q103Sql,
    "q104_label_agreement" -> q104Sql,
    "q105_hard_negatives"  -> q105Sql)
}
