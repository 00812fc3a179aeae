package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-13 additions: embedding-space decontamination under the
  * correctness gate. Same gate conventions as [[Queries]].
  */
object QRound13 {
  import Tables._

  /** Embedding-space decontamination ([[graft.ext.Similarity.decontaminate]]):
    * the q65 benchmark-overlap check in vector space — flag every training
    * embedding whose cosine against ANY held-out eval vector (`vec_id % 10
    * = 0`, the eval-slice convention) reaches 0.45 (≈3.6σ of the isotropic
    * background, the q31 threshold analysis). The eval slice broadcasts;
    * the train side streams through ONE broadcast pass with the threshold
    * in the join condition, then a per-candidate aggregate. Output is
    * match count + strongest similarity per contaminated row — the rows a
    * careful LLM team drops before training.
    */
  def q122EmbedDecontam(s: SparkSession, d: String): DataFrame = {
    val emb = embeddings(s, d)
    graft.ext.Similarity.decontaminate(
      emb.filter(col("vec_id") % 10 =!= 0),
      emb.filter(col("vec_id") % 10 === 0),
      "vec_id", "embedding", 0.45)
      .select(col("id").as("vec_id"), col("n_matched"), col("max_sim"))
      .orderBy(col("vec_id"))
  }

  private val q122Sql =
    """WITH p AS (
      |  SELECT t.vec_id AS vec_id,
      |    round(
      |      list_sum(list_transform(range(1, 65), i -> t.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(range(1, 65), i -> t.embedding[i]::DOUBLE * t.embedding[i]::DOUBLE)))
      |       * sqrt(list_sum(list_transform(range(1, 65), i -> v.embedding[i]::DOUBLE * v.embedding[i]::DOUBLE)))), 6) AS sim
      |  FROM embeddings t JOIN embeddings v
      |    ON t.vec_id % 10 <> 0 AND v.vec_id % 10 = 0)
      |SELECT vec_id, CAST(count(*) AS BIGINT) AS n_matched, max(sim) AS max_sim
      |FROM p WHERE sim >= 0.45
      |GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q122_embed_decontam" -> (q122EmbedDecontam _))

  val sql: Map[String, String] = Map(
    "q122_embed_decontam" -> q122Sql)
}
