package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The assembled training-corpus curation pipeline — the "switch your whole
  * job to one call" surface over the individual operators: [optional PII
  * mask → boilerplate line removal → substring dedup → repetition gate] →
  * quality gate →
  * exact dedup → near-dup collapse (MinHash-LSH components, keep the
  * minimum-id representative) → benchmark decontamination → deterministic
  * split assignment → optional sequence packing.
  *
  * Every stage is declarative and shuffle-disciplined (the same shapes the
  * gate queries pin: q21/q59 quality, q20 exact dedup, q25/q43 near-dup,
  * q65 decontamination, q57/q76 splits, q68 packing), so Catalyst sees one
  * composed plan per stage boundary and the whole run is a handful of
  * shuffles regardless of corpus size. Near-dup collapse removes
  * duplicates ACROSS split boundaries before assignment, so the
  * assignment itself cannot leak (what q76 proves for the keep-all
  * variant).
  */
object Curation {

  case class NearDupCfg(shingleN: Int = 3, k: Int = 16, bands: Int = 4,
      threshold: Double = 0.5, fast: Boolean = true)

  case class Config(
      minQuality: Double = 0.5,
      exactDedup: Boolean = true,
      nearDup: Option[NearDupCfg] = Some(NearDupCfg()),
      decontaminateNgram: Int = 13,
      splits: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
      packTokens: Option[Int] = None,
      // broadcast-vs-shuffle cutover for the computed id sets (losers,
      // contamination hits); see TableOps.adaptiveJoinSide
      maxBroadcastIds: Long = 4000000L,
      // optional pre-stages: NFC normalization (precomposed and
      // decomposed encodings of the same logical text must collapse
      // before any fingerprint sees them), PII masking (deterministic
      // placeholders so the dedup stages still collapse PII-only
      // variants), corpus-wide
      // boilerplate line removal (give the line separator), and a
      // repetition gate (drop docs whose duplicate-2gram fraction exceeds
      // the bound — the Gopher filter)
      normalizeNfc: Boolean = false,
      scrubPii: Boolean = false,
      boilerplateSep: Option[String] = None,
      maxDupNgramFrac: Option[Double] = None,
      // substring-level exact dedup (Lee et al.): strip every corpus span
      // duplicated at the given gram resolution before the row-level stages
      substringDedupGram: Option[Int] = None,
      // when set, packing budgets count REAL subword tokens via the
      // registered BPE vocab (Bpe.register) instead of whitespace splits
      bpeVocabId: Option[String] = None,
      // CCNet-style LM gate: drop docs whose bigram cross-entropy under the
      // registered model (LangModel.register) exceeds the bound
      perplexityGate: Option[(String, Double)] = None)

  /** Curate `docs` (must carry `idCol` and `textCol`). `evalDocs` (same two
    * columns), when given, removes any doc sharing an n-gram with it.
    * Output: the surviving rows with `quality`, `split`, and (when packing)
    * `seq_id` appended.
    */
  def curate(docs: DataFrame, idCol: String, textCol: String,
      evalDocs: Option[DataFrame] = None,
      cfg: Config = Config()): DataFrame = {

    // 0. optional normalization pre-stages, in cleaning order: PII mask
    // (per-row), boilerplate line removal (one corpus-wide hash agg),
    // repetition gate (per-row)
    var cur = docs
    if (cfg.normalizeNfc)
      cur = cur.withColumn(textCol, TextAnalysis.normalizeUnicode(col(textCol)))
    if (cfg.scrubPii)
      cur = cur.withColumn(textCol, TextAnalysis.scrubPii(col(textCol)))
    cfg.boilerplateSep.foreach { sep =>
      cur = TextAnalysis.removeBoilerplateLines(cur, idCol, textCol, sep)
        .join(cur.drop(textCol), Seq(idCol))
    }
    cfg.substringDedupGram.foreach { g =>
      cur = SubstringDedup.stripDupSpans(cur, idCol, textCol, g)
    }
    cfg.maxDupNgramFrac.foreach { bound =>
      cur = cur.filter(TextAnalysis.dupNgramFraction(col(textCol), 2) <= bound)
    }
    cfg.perplexityGate.foreach { case (modelId, maxBits) =>
      cur = cur.filter(LangModel.perplexityBits(col(textCol), modelId) <= maxBits)
    }

    // 1. quality gate — per-row codegen, cuts rows at the scan stage
    cur = cur
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .filter(col("quality") >= cfg.minQuality)

    // 2. exact dedup — keep the smallest id per identical text
    if (cfg.exactDedup)
      cur = graft.core.ops.TableOps.dedupeLastWins(
        cur, Seq(textCol), Seq(col(idCol).asc))

    // The stages below each reference `cur` from SEVERAL subtrees (the LSH
    // band side, the verification semi-join, the anti-join left side, the
    // decontamination gram explode) and a DataFrame plan is a tree — every
    // reference re-derives the quality filter AND the exact-dedup window
    // shuffle of the full text (the q97 re-derivation pathology; measured
    // ~2s of b37's 7s at sf0.1). Materialize the cleaned corpus ONCE when a
    // multi-reference stage follows. (On a real cluster prefer reliable
    // `checkpoint`/a parquet stage boundary — localCheckpoint blocks are
    // unreplicated.)
    if (cfg.nearDup.isDefined || evalDocs.isDefined)
      cur = cur.localCheckpoint()

    // 3. near-dup collapse — keep each component's min-id representative
    cfg.nearDup.foreach { nd =>
      // the observed candidate count bounds the verified pair count, so
      // clustering can take its one-job driver fast path without a
      // counting job (see Dedup.dupClusters pairBound)
      val (pairs, nPairsBound) = Dedup.minhashLshPairsCounted(cur, idCol, textCol,
        nd.shingleN, nd.k, nd.bands, nd.threshold, nd.fast, cfg.maxBroadcastIds)
      val clusters = Dedup.dupClusters(pairs, "id_a", "id_b",
        pairBound = Some(nPairsBound))
      // size-adaptive: loser volume is the corpus DUP RATE, not a constant
      // — broadcast when counted small, shuffled left_anti otherwise
      // clusters is already materialized by dupClusters — the filter is a
      // cheap re-derivation, no second checkpoint needed
      val losers = graft.core.ops.TableOps.adaptiveJoinSide(
        clusters.filter(col("id") =!= col("cluster")).select(col("id")),
        cfg.maxBroadcastIds, materialize = false)
      cur = cur.join(losers, cur(idCol) === losers("id"), "left_anti")
    }

    // 4. decontamination — drop docs sharing any n-gram with the eval set
    evalDocs.foreach { ev =>
      val n = cfg.decontaminateNgram
      // native one-pass gram hasher — bit-identical values to the composed
      // xxhash64(concat_ws(" ", slice(w, i, n))) HOF chain it replaces
      // (same bytes, same seed), without the interpreted per-gram
      // slice+concat copies; a short doc yields an empty array, so the old
      // size(w) >= n pre-filter is implied by the explode
      def grams(df: DataFrame, id: String, text: String): DataFrame = df
        .select(col(id).as("__gid"),
          explode(call_function("graft_ngram_hashes",
            split(col(text), " "), lit(n), lit(n))).as("__g"))
      // eval benchmarks are small by nature — the gram set broadcast is the
      // correct regime (q65); the HIT set scales with the corpus'
      // contamination rate, so it chooses adaptively
      val evalG = grams(ev, idCol, textCol).select(col("__g")).distinct()
      val hit = graft.core.ops.TableOps.adaptiveJoinSide(
        grams(cur, idCol, textCol)
          .join(broadcast(evalG), "__g").select(col("__gid")).distinct(),
        cfg.maxBroadcastIds)
      cur = cur.join(hit, cur(idCol) === hit("__gid"), "left_anti")
    }

    // 5. deterministic split — duplicates are gone, so a plain id hash is
    // leakage-free by construction
    cur = cur.withColumn("split", Splits.assignSplit(
      Splits.hashBucketMd5(col(idCol), 100), cfg.splits))

    // 6. optional packing — per-split cumsum bins (the q68 shape)
    cfg.packTokens.foreach { budget =>
      val tokens = cfg.bpeVocabId match {
        case Some(id) => Bpe.tokenCount(col(textCol), id).cast("long")
        case None     => size(split(col(textCol), " ")).cast("long")
      }
      cur = cur
        .withColumn("__tok", tokens)
        .withColumn("seq_id", expr(
          s"coalesce(sum(__tok) OVER (PARTITION BY split ORDER BY `$idCol` " +
            s"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) DIV $budget"))
        .drop("__tok")
    }
    cur
  }
}
