package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis kernel for large-scale training-data pipelines: token
  * counting (whitespace + BPE-ish regex segmentation), quality scoring
  * (length / punctuation / stopword ratios), marker-based language ID, and
  * canonical-form document fingerprinting.
  *
  * Everything is a pure `Column` expression over built-in functions — no
  * UDFs — so at 100 TB each metric stays inside WholeStageCodegen, needs no
  * shuffle, and composes with any downstream filter/agg. (The reference has
  * no text ops; this is the north-star extension surface from BASELINE.json.)
  */
object TextAnalysis {

  /** Small multilingual function-word list for ratio features. */
  val DefaultStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "on", "for", "with")

  /** Marker words per language for the heuristic language ID; checked in
    * deterministic priority order (ties go to the earlier entry).
    */
  val DefaultLangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "las", "es", "y"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有"))

  /** Whitespace tokens. */
  def tokens(c: Column): Column = split(c, " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(tokens(c)).cast("long")

  /** BPE-ish subword segmentation count: alpha runs, digit runs, and single
    * non-alphanumeric symbols each count as one token (the usual pre-BPE
    * word-splitting regex).
    */
  def subwordCount(c: Column): Column =
    size(regexp_extract_all(c, lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Number of tokens that are stopwords. */
  def stopwordCount(c: Column, stopwords: Seq[String] = DefaultStopwords): Column =
    size(filter(tokens(c), t => t.isInCollection(stopwords))).cast("long")

  /** Characters that are neither lowercase alphanumerics nor spaces. */
  def nonAlnumCount(c: Column): Column =
    length(regexp_replace(lower(c), "[a-z0-9 ]", "")).cast("long")

  /** Mean token length (characters excluding spaces / token count). */
  def avgTokenLen(c: Column): Column =
    round(length(regexp_replace(c, " ", "")).cast("double") / tokenCount(c), 4)

  /** Composite quality score in [0,1]: long-enough docs with normal stopword
    * density and little punctuation noise score high. The weights are fixed
    * so the score is deterministic and oracle-checkable.
    */
  def qualityScore(c: Column, stopwords: Seq[String] = DefaultStopwords): Column = {
    val lenScore  = least(length(c).cast("double") / lit(500.0), lit(1.0))
    val stopRatio = stopwordCount(c, stopwords).cast("double") / tokenCount(c)
    val punctPen  = least(nonAlnumCount(c).cast("double") * lit(10.0) / length(c), lit(1.0))
    val raw = lit(0.5) * lenScore + lit(0.3) * least(stopRatio * lit(5.0), lit(1.0)) +
      lit(0.2) * (lit(1.0) - punctPen)
    // floor-truncate instead of round: round() goes through the shortest
    // decimal string of the double (half-up), which disagrees across engines
    // exactly at .xxxx5 boundaries; floor on the binary value never does.
    floor(raw * lit(10000.0)) / lit(10000.0)
  }

  /** Heuristic language ID: count marker-word hits per language and take the
    * best in fixed priority order; no hits at all → "und". A native
    * single-pass expression ([[graft.functions.TextExpressions.LangIdExpr]]):
    * the composed filter/CASE form re-tokenized the text at every CASE
    * reference because higher-order functions are CodegenFallback (~20
    * tokenizations per row, measured 1.0s → 0.1s on q22 at sf0.1).
    *
    * NULL CONTRACT (pinned — q104 groups on this column): NULL text is
    * "und", never NULL and never a marker language. The coalesce is on
    * BOTH engines' sides (the oracle's CASE coalesces too) so a future
    * testdata generation with NULL text cannot diverge three ways
    * (expression null-propagation vs CASE ELSE vs 'und').
    */
  def langId(c: Column, markers: Seq[(String, Seq[String])] = DefaultLangMarkers): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.TextExpressions.LangIdExpr(
        org.apache.spark.sql.GraftSqlShims.expression(coalesce(c, lit(""))), markers))

  /** Unicode normalization (UAX #15) — the canonical first text pass:
    * precomposed and decomposed encodings of the same logical text must
    * collapse BEFORE any fingerprint/dedup/token stage sees them, or
    * every one of those treats the variants as distinct documents.
    * Native codegen'd expression with an ASCII fast path
    * ([[graft.functions.NormalizeExpression]]); `form` ∈ NFC (default) /
    * NFD / NFKC / NFKD.
    */
  def normalizeUnicode(c: Column, form: String = "NFC"): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.NormalizeExpression.UnicodeNormalize(
        org.apache.spark.sql.GraftSqlShims.expression(c), form))

  /** Bounded heavy-hitter token counts ([[graft.functions.FreqSketch]]):
    * a Misra-Gries aggregate that tokenizes inside `update` — no explode
    * row ever leaves the scan stage, each partial buffer holds at most
    * `capacity` counters, and the shuffle is `capacity × partitions` rows
    * no matter the corpus. Tokens with true frequency > N/capacity are
    * guaranteed retained; reported counts sit within N/capacity BELOW
    * truth (never above); a vocabulary that fits the capacity gets EXACT
    * counts (the q120 oracle regime). Returns
    * `array<struct<token, cnt>>` sorted by (cnt desc, token).
    */
  def heavyHitters(text: Column, capacity: Int): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.FreqSketch.MisraGries(
        org.apache.spark.sql.GraftSqlShims.expression(text), capacity)
        .toAggregateExpression())

  /** Canonical-form fingerprint: lowercase, strip non-alphanumerics, collapse
    * runs of spaces, trim, md5. Two documents differing only in case /
    * punctuation / spacing collide — the cheap first-stage dedup key.
    */
  def fingerprint(c: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9 ]", ""), " +", " ")))

  /** ALL word n-grams (non-distinct, order kept) — the occurrence stream
    * the repetition signals below count over.
    */
  def ngramsAll(c: Column, n: Int): Column =
    if (n == 1) tokens(c) // 1-grams ARE the tokens — skip the array rebuild
    // let-bound: an unbound `toks` re-tokenizes the text at every
    // element_at reference inside the interpreted lambda — n × |ngrams|
    // re-evaluations per row (the same pathology measured in
    // Dedup.shingles; see that bind's comment)
    else bind(tokens(c)) { toks =>
      when(size(toks) >= n,
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(o => element_at(toks, i + o)): _*)))
        .otherwise(array().cast("array<string>"))
    }

  /** Gopher-style repetition signal: fraction of n-gram OCCURRENCES that
    * are repeats of an earlier one (1 − distinct/total). Machine-generated
    * and template text scores high; 0 for docs shorter than n tokens.
    */
  def dupNgramFraction(c: Column, n: Int): Column =
    bind(ngramsAll(c, n)) { g =>
      when(size(g) > 0,
        lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
        .otherwise(lit(0.0))
    }

  /** Gopher-style repetition signal: fraction of n-gram occurrences taken
    * by the single most frequent n-gram — catches "keyword stuffing" that
    * dupNgramFraction's global ratio smooths over. 0 for short docs.
    *
    * The max count comes from the longest equal-run of the SORTED gram
    * array — one O(g log g) sort + one O(g) scan per row, instead of the
    * earlier filter-count per distinct gram (O(distinct × g): ~150k
    * comparisons/row on a 500-token doc, and every one re-walked `g`).
    */
  def topNgramFraction(c: Column, n: Int): Column =
    bind(ngramsAll(c, n)) { g =>
      when(size(g) > 0, maxRunLength(sort_array(g)).cast("double") / size(g))
        .otherwise(lit(0.0))
    }

  /** Longest run of equal adjacent elements in a sorted string array (= the
    * max multiplicity of any value). The zero accumulator's `prev = ""`
    * needs no sentinel: the first element either equals "" (run := 0+1) or
    * not (run := 1) — both land on 1.
    */
  private def maxRunLength(sorted: Column): Column =
    aggregate(sorted,
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"), acc.getField("run") + 1L)
          .otherwise(lit(1L))
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))

  /** Evaluate `c` once per row and feed the bound value to `f` (the
    * Dedup.bind let-binding trick — CollapseProject would otherwise inline
    * `c` into every use site).
    */
  private def bind(c: Column)(f: Column => Column): Column =
    element_at(transform(array(c), f), 1)

  /** PII scrubbing for training corpora: masks emails, IPv4 addresses, and
    * long digit runs (phone/card shapes) with fixed placeholder tokens —
    * the standard pre-training redaction pass. Pure codegen'd
    * regexp_replace chain (no UDF); deterministic placeholders so dedup
    * downstream still collapses documents that differed only in the PII.
    */
  def scrubPii(c: Column): Column = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val ipv4 = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
    val digitRun = "\\b(?:\\d[ -]?){7,}\\d\\b"
    regexp_replace(
      regexp_replace(
        regexp_replace(c, email, "<EMAIL>"),
        ipv4, "<IP>"),
      digitRun, "<NUMBER>")
  }

  /** C4/RefinedWeb-style boilerplate LINE removal: a line occurring in at
    * least `minDocs` distinct documents (cookie banners, nav chrome,
    * subscribe prompts) is dropped from EVERY document; per-document line
    * order is preserved on reassembly. Documents left with zero lines
    * disappear from the output (fully-boilerplate pages).
    *
    * Scale shape: only 8-byte line hashes shuffle for the occurrence
    * count (never line text), and the boilerplate-hash set joins back
    * size-adaptively (broadcast when counted small, shuffled anti-join on
    * a boilerplate-heavy crawl) — the [[graft.core.ops.TableOps
    * .adaptiveJoinSide]] discipline.
    */
  def removeBoilerplateLines(df: org.apache.spark.sql.DataFrame,
      idCol: String, textCol: String, sep: String = "\n",
      minDocs: Long = 2, maxBroadcastIds: Long = 4000000L): org.apache.spark.sql.DataFrame = {
    require(minDocs >= 2, s"minDocs must be >= 2, got $minDocs")
    val lines = df.select(col(idCol).as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__h", xxhash64(col("__line")))
    val boiler = graft.core.ops.TableOps.adaptiveJoinSide(
      lines.groupBy(col("__h"))
        .agg(countDistinct(col("__id")).as("__nd"))
        .filter(col("__nd") >= minDocs)
        .select(col("__h").as("__bh")),
      maxBroadcastIds)
    lines.join(boiler, col("__h") === col("__bh"), "left_anti")
      .groupBy(col("__id"))
      .agg(concat_ws(sep, transform(
        array_sort(collect_list(struct(col("__pos"), col("__line")))),
        x => x.getField("__line"))).as(textCol))
      .withColumnRenamed("__id", idCol)
  }
}
