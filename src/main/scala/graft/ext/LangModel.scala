package graft.ext

import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** N-gram language-model perplexity scoring — the CCNet-style quality
  * signal (Wenzek et al. 2020 filter CommonCrawl by KenLM perplexity;
  * Brown et al. 2020 use an LM-based quality classifier the same way):
  * text far from the training distribution (boilerplate soup, gibberish,
  * wrong language) scores high bits-per-token and can be gated out.
  *
  * Same split as [[Bpe]] and the IVF trainers: the bigram model TRAINS
  * driver-side on a bounded hash-ordered sample (counts are a small dense
  * state — there is nothing to distribute), SCORING runs distributed
  * through a codegen'd native expression against the executor-registered
  * model. Add-k smoothed bigrams over a capped vocabulary (out-of-vocab →
  * `<unk>`), deterministic end to end.
  */
object LangModel {

  private[ext] def words(text: String): Array[String] =
    text.toLowerCase.split("[^a-z0-9']+").filter(_.nonEmpty)

  /** A trained bigram model: capped vocab, add-k smoothing. */
  final class Model private[LangModel] (
      private[LangModel] val uni: java.util.HashMap[String, Long],
      private[LangModel] val bi: java.util.HashMap[String, Long],
      private[LangModel] val vocab: java.util.HashSet[String],
      val addK: Double) {
    def vocabSize: Int = vocab.size + 1 // + <unk>
  }

  /** Train on the sample: top-`vocabSize` words by (count desc, word asc)
    * form the vocabulary, everything else folds into `<unk>`; bigrams are
    * counted over the mapped streams with `<s>` starting each document.
    */
  def train(sample: Seq[String], vocabSize: Int = 4096, addK: Double = 0.1): Model = {
    require(vocabSize > 0 && addK > 0)
    val counts = mutable.HashMap[String, Long]()
    val docs = sample.map(words)
    docs.foreach(_.foreach(w => counts.update(w, counts.getOrElse(w, 0L) + 1)))
    val vocab = new java.util.HashSet[String]()
    counts.toSeq.sortBy { case (w, c) => (-c, w) }.take(vocabSize)
      .foreach { case (w, _) => vocab.add(w) }
    val uni = new java.util.HashMap[String, Long]()
    val bi = new java.util.HashMap[String, Long]()
    def bump(m: java.util.HashMap[String, Long], k: String): Unit =
      m.merge(k, 1L, (a, b) => a + b)
    docs.foreach { ws =>
      var prev = "<s>"
      bump(uni, prev)
      ws.foreach { raw =>
        val w = if (vocab.contains(raw)) raw else "<unk>"
        bump(bi, prev + " " + w)
        bump(uni, w)
        prev = w
      }
    }
    new Model(uni, bi, vocab, addK)
  }

  /** Bounded hash-ordered sample (the [[Bpe.trainOnSample]] posture). */
  def trainOnSample(df: DataFrame, idCol: String, textCol: String,
      vocabSize: Int = 4096, addK: Double = 0.1,
      sampleSize: Int = 1024, seed: Long = 42L): Model = {
    val sample = df
      .select(col(textCol).as("__t"), xxhash64(col(idCol), lit(seed)).as("__h"))
      .orderBy(col("__h")).limit(sampleSize)
      .collect().map(_.getString(0)).toSeq
    train(sample, vocabSize, addK)
  }

  private val registry = new ConcurrentHashMap[String, Model]()

  def register(id: String, model: Model): Unit = registry.put(id, model)

  private def model(id: String): Model = {
    val m = registry.get(id)
    require(m != null, s"no language model registered under '$id'")
    m
  }

  /** Static entry point for codegen: cross-entropy in BITS PER TOKEN
    * (perplexity = 2^result — the log form is numerically stable and
    * threshold-friendly). Empty texts score the bits of one `<s> → <unk>`
    * step, never NaN.
    */
  def bitsPerToken(text: String, modelId: String): Double = {
    val m = model(modelId)
    val v = m.vocabSize
    var prev = "<s>"
    var sum = 0.0
    var n = 0
    def step(w: String): Unit = {
      val biC = m.bi.getOrDefault(prev + " " + w, 0L)
      val uniC = m.uni.getOrDefault(prev, 0L)
      val p = (biC + m.addK) / (uniC + m.addK * v)
      sum += -math.log(p) / math.log(2.0)
      n += 1
      prev = w
    }
    val ws = words(text)
    if (ws.isEmpty) step("<unk>")
    else ws.foreach(raw => step(if (m.vocab.contains(raw)) raw else "<unk>"))
    sum / n
  }

  /** Column surface (native expression, whole-stage codegen). */
  def perplexityBits(text: Column, modelId: String): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.LmExpressions.LmBitsPerToken(
        org.apache.spark.sql.GraftSqlShims.expression(text), modelId))
}
