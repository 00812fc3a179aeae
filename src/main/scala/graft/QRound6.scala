package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ext.{Similarity, SubstringDedup}

/** Round-6 additions: substring-level exact dedup (Lee et al. 2022) and
  * SemDeDup cluster-then-dedup-within (Abbas et al. 2023) — the two
  * remaining named techniques of the LLM-corpus dedup canon (document-exact,
  * MinHash, SimHash, n-gram Jaccard, and embedding range pairs are
  * q20/q25/q26/q24/q31). Same gate conventions as [[Queries]].
  */
object QRound6 {
  import Tables._

  /** Exact duplicated-substring spans per document: every position whose
    * 40-char gram occurs twice in the corpus is duplicated; runs merge into
    * maximal spans ([[graft.ext.SubstringDedup]] — the oracle-portable
    * exact-gram form; the scale path hashes grams to 8 bytes and is
    * benched as b47). Output: per affected doc, the merged-span count, the
    * duplicated char mass, and the doc length.
    */
  def q95SubstringDedup(s: SparkSession, d: String): DataFrame = {
    val stats = SubstringDedup.dupStats(
      documents(s, d), "doc_id", "text", gramLen = 40, hashed = false)
    stats
      .join(documents(s, d).select(col("doc_id"), col("n_chars")),
        stats("id") === col("doc_id"))
      .select(col("doc_id"), col("dup_spans"), col("dup_chars"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val q95Sql =
    """WITH g AS (
      |  SELECT doc_id, unnest(generate_series(0, length(text) - 40)) AS pos, text
      |  FROM documents WHERE length(text) >= 40),
      |h AS (SELECT doc_id, pos, substr(text, pos + 1, 40) AS gk FROM g),
      |dup AS (
      |  SELECT doc_id, pos
      |  FROM (SELECT doc_id, pos, count(*) OVER (PARTITION BY gk) AS c FROM h)
      |  WHERE c > 1),
      |st AS (
      |  SELECT doc_id, pos,
      |    CASE WHEN lag(pos) OVER w IS NULL OR pos > lag(pos) OVER w + 40
      |         THEN 1 ELSE 0 END AS step
      |  FROM dup WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
      |isl AS (
      |  SELECT doc_id, pos, sum(step) OVER (
      |    PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island
      |  FROM st),
      |sp AS (
      |  SELECT doc_id, island, min(pos) AS s, max(pos) + 40 AS e
      |  FROM isl GROUP BY doc_id, island),
      |agg AS (
      |  SELECT doc_id, count(*) AS dup_spans, CAST(sum(e - s) AS BIGINT) AS dup_chars
      |  FROM sp GROUP BY doc_id)
      |SELECT a.doc_id, a.dup_spans, a.dup_chars, d.n_chars
      |FROM agg a JOIN documents d ON a.doc_id = d.doc_id
      |ORDER BY a.doc_id""".stripMargin

  /** SemDeDup over the embeddings table: 16 deterministic sign-bit clusters
    * (dims 1-4), within-cluster greedy keep-min-id removal at cosine ≥ 0.45
    * ([[graft.ext.Similarity.semDedupRemoved]]; the production form trains
    * IVF cells — [[graft.ext.Similarity.semDedup]], spec-pinned). Output:
    * one row per cluster with its size, removal count, and the removed ids
    * as a CSV (the q16 list convention).
    */
  def q96SemDedup(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
        Similarity.signClusters(col("embedding"), 4).as("cluster"))
    val removed = Similarity.semDedupRemoved(e, "vec_id", "embedding", "cluster", 0.45)
    val sizes = e.groupBy(col("cluster")).agg(count(lit(1)).as("n_vecs"))
    sizes.join(removed, Seq("cluster"), "left")
      .groupBy(col("cluster"), col("n_vecs"))
      .agg(
        count(col("removed_id")).as("n_removed"),
        array_join(transform(sort_array(collect_list(col("removed_id"))),
          _.cast("string")), ",").as("removed_ids"))
      .select(col("cluster"), col("n_vecs"), col("n_removed"), col("removed_ids"))
      .orderBy(col("cluster"))
  }

  private val q96Sql =
    """WITH e AS (
      |  SELECT vec_id, embedding,
      |    (CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END
      |   + CASE WHEN embedding[2] > 0 THEN 2 ELSE 0 END
      |   + CASE WHEN embedding[3] > 0 THEN 4 ELSE 0 END
      |   + CASE WHEN embedding[4] > 0 THEN 8 ELSE 0 END) AS cluster
      |  FROM embeddings),
      |p AS (
      |  SELECT a.cluster AS cluster, b.vec_id AS removed_id,
      |    round(
      |      list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
      |      / (sqrt(list_sum(list_transform(range(1, 65), i -> a.embedding[i]::DOUBLE * a.embedding[i]::DOUBLE)))
      |       * sqrt(list_sum(list_transform(range(1, 65), i -> b.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE)))), 6) AS sim
      |  FROM e a JOIN e b ON a.cluster = b.cluster AND a.vec_id < b.vec_id),
      |r AS (SELECT DISTINCT cluster, removed_id FROM p WHERE sim >= 0.45),
      |c AS (SELECT cluster, count(*) AS n_vecs FROM e GROUP BY cluster)
      |SELECT c.cluster, c.n_vecs, count(r.removed_id) AS n_removed,
      |  coalesce(string_agg(CAST(r.removed_id AS VARCHAR), ',' ORDER BY r.removed_id), '') AS removed_ids
      |FROM c LEFT JOIN r ON c.cluster = r.cluster
      |GROUP BY c.cluster, c.n_vecs
      |ORDER BY c.cluster""".stripMargin

  /** Target-mixture sampling ([[graft.ext.Splits.mixtureSample]]): integer
    * weights (source index mod 4, +1) set the desired inter-source ratio;
    * the largest exact-ratio allocation is taken per source in md5-of-id
    * order (engine-portable, rerun-stable). Output pins the quota math AND
    * the exact selected set (sum/min/max of kept ids per source).
    */
  def q97MixtureSample(s: SparkSession, d: String): DataFrame = {
    // the RAW load, not Tables.documents: both consumers (quota groupBy,
    // sampler window) shuffle on `source` as their FIRST op, so the
    // widened round-robin repartition was a full-table exchange feeding
    // another exchange — pure overhead here (no per-row kernel work runs
    // before the hash exchange restores parallelism)
    val docs = Tables.load(s, d, "documents")
    val weightOf = (src: Column) =>
      substring(src, 4, 10).cast("int") % 4 + 1
    // quotas materialize once (20 rows) and feed both the output columns
    // and the sampler — without this the quota subplan re-scans documents
    val quotas = graft.ext.Splits.mixtureQuotas(docs, "source", weightOf)
      .localCheckpoint()
    val kept = graft.ext.Splits.mixtureSample(docs, "doc_id", "source", weightOf,
      precomputedQuotas = Some(quotas))
      .groupBy(col("source"))
      .agg(sum(col("doc_id")).as("kept_sum"),
        min(col("doc_id")).as("kept_min"), max(col("doc_id")).as("kept_max"))
    quotas.join(kept, Seq("source"))
      .select(col("source"), col("n_docs"), col("quota"),
        col("kept_sum"), col("kept_min"), col("kept_max"))
      .orderBy(col("source"))
  }

  private val q97Sql =
    """WITH c AS (
      |  SELECT source, count(*) AS n_docs,
      |    CAST(CAST(substr(source, 4) AS INTEGER) % 4 + 1 AS BIGINT) AS wgt
      |  FROM documents GROUP BY source),
      |u AS (SELECT min(n_docs // wgt) AS unit FROM c),
      |q AS (SELECT source, n_docs, wgt * unit AS quota FROM c CROSS JOIN u),
      |r AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (
      |      PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR))) AS BIGINT) AS rk
      |  FROM documents),
      |k AS (
      |  SELECT r.source, r.doc_id
      |  FROM r JOIN q ON r.source = q.source AND r.rk <= q.quota)
      |SELECT q.source, q.n_docs, q.quota,
      |  CAST(sum(k.doc_id) AS BIGINT) AS kept_sum,
      |  min(k.doc_id) AS kept_min, max(k.doc_id) AS kept_max
      |FROM q JOIN k ON q.source = k.source
      |GROUP BY q.source, q.n_docs, q.quota
      |ORDER BY q.source""".stripMargin

  /** Triangle counting over the part co-order graph (parts bought together
    * in one order are linked; edges oriented `s < d` so each triangle is
    * counted once). The canonical graph-motif plan: edges → wedges (equi
    * join on the shared endpoint) → closure (equi join on both endpoints) —
    * three shuffles, no broadcast of anything corpus-sized; the edge list
    * is localCheckpoint'd once (the q85 pattern) instead of being rebuilt
    * by all three join arms.
    */
  def q98Triangles(s: SparkSession, d: String): DataFrame = {
    val li = lineitem(s, d).filter(col("l_quantity") >= 40)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val e = li.as("a").join(li.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("s"), col("b.pk").as("d"))
      .distinct()
      .localCheckpoint()
    val w = e.as("e1").join(e.as("e2"), col("e1.d") === col("e2.s"))
      .select(col("e1.s").as("ta"), col("e1.d").as("tb"), col("e2.d").as("tc"))
    val tri = w.join(e.as("e3"), col("ta") === col("e3.s") && col("tc") === col("e3.d"))
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(w.agg(count(lit(1)).as("n_wedges")))
      .crossJoin(tri.agg(count(lit(1)).as("n_triangles")))
  }

  private val q98Sql =
    """WITH li AS (
      |  SELECT l_orderkey AS ok, l_partkey AS pk FROM lineitem WHERE l_quantity >= 40),
      |e AS (
      |  SELECT DISTINCT a.pk AS s, b.pk AS d
      |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk),
      |w AS (SELECT e1.s AS ta, e1.d AS tb, e2.d AS tc FROM e e1 JOIN e e2 ON e1.d = e2.s)
      |SELECT (SELECT count(*) FROM e) AS n_edges,
      |       (SELECT count(*) FROM w) AS n_wedges,
      |       (SELECT count(*) FROM w JOIN e e3 ON w.ta = e3.s AND w.tc = e3.d) AS n_triangles""".stripMargin

  /** NEAREST-in-time as-of join (either direction — sensor/event alignment
    * semantics neither plain ASOF direction covers):
    * [[graft.operators.AsOfJoin.asOfJoinNearest]] — one tagged union, one
    * shuffle, both direction carries in a single window sort (the composed
    * backward+forward+equi-join form scanned events 4× and shuffled 3×).
    * DuckDB oracle: min |gap| per fact with the same backward-tie rule.
    */
  def q101AsofNearest(s: SparkSession, d: String): DataFrame = {
    val ev = events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .agg(max(col("event_id")).as("p_event_id"))
    graft.operators.AsOfJoin.asOfJoinNearest(
        clicks, purchases, "user_id", "p_user", "ts", "p_ts",
        Seq("p_event_id"))
      .select(col("event_id"), col("user_id"),
        col("p_event_id").as("nearest_purchase_id"),
        (unix_micros(col("__matched_ts")) - unix_micros(col("ts"))).as("signed_gap_us"))
      .orderBy(col("event_id"))
  }

  private val q101Sql =
    """WITH c AS (SELECT event_id, user_id, ts FROM events
      |           WHERE event_type = 'click'),
      |p AS (SELECT user_id AS p_user, ts AS p_ts, max(event_id) AS p_event_id
      |      FROM events WHERE event_type = 'purchase' GROUP BY 1, 2)
      |SELECT c.event_id, c.user_id,
      |  p.p_event_id AS nearest_purchase_id,
      |  epoch_us(p.p_ts) - epoch_us(c.ts) AS signed_gap_us
      |FROM c LEFT JOIN p ON c.user_id = p.p_user
      |QUALIFY row_number() OVER (
      |  PARTITION BY c.event_id
      |  ORDER BY abs(epoch_us(p.p_ts) - epoch_us(c.ts)),
      |           CASE WHEN p.p_ts <= c.ts THEN 0 ELSE 1 END) = 1
      |ORDER BY c.event_id""".stripMargin

  /** Rows-only gate entries — BPE token counting and LM perplexity have no
    * ANSI-SQL equivalent (iterative merges / registered model state), so
    * the driver records the weaker rows>0 check; the strong contracts live
    * in BpeSpec/LangModelSpec (codegen == driver reference, determinism).
    * Both train on a bounded deterministic sample inside the query, so a
    * cold executor reproduces the identical output.
    */
  def q99BpeTokens(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.ext.Bpe.register("q99",
      graft.ext.Bpe.trainOnSample(docs, "doc_id", "text", nMerges = 256, sampleSize = 256))
    docs.select(col("doc_id"),
        graft.ext.Bpe.tokenCount(col("text"), "q99").as("n_tok"),
        col("n_chars"))
      .orderBy(col("doc_id"))
  }

  def q100LmPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    graft.ext.LangModel.register("q100",
      graft.ext.LangModel.trainOnSample(docs, "doc_id", "text", sampleSize = 256))
    docs.select(col("doc_id"),
        round(graft.ext.LangModel.perplexityBits(col("text"), "q100"), 6).as("bits_per_token"))
      .orderBy(col("doc_id"))
  }

  val registry: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q95_substring_dedup" -> (q95SubstringDedup _),
    "q96_semdedup"        -> (q96SemDedup _),
    "q97_mixture_sample"  -> (q97MixtureSample _),
    "q98_triangles"       -> (q98Triangles _),
    "q99_bpe_tokens"      -> (q99BpeTokens _),
    "q100_lm_perplexity"  -> (q100LmPerplexity _),
    "q101_asof_nearest"   -> (q101AsofNearest _))

  val sql: Map[String, String] = Map(
    "q95_substring_dedup" -> q95Sql,
    "q96_semdedup"        -> q96Sql,
    "q97_mixture_sample"  -> q97Sql,
    "q98_triangles"       -> q98Sql,
    "q101_asof_nearest"   -> q101Sql)
}
