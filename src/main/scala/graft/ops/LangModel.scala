package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Perplexity-based quality scoring — the CCNet curation step
  * (Wenzek et al. 2020; reused by RedPajama/FineWeb): score every
  * document by its cross-entropy under an n-gram language model
  * trained on a trusted reference slice, then gate or bucket on the
  * score (low perplexity ≈ reference-like prose; high ≈ boilerplate,
  * gibberish, tables). CCNet uses a KenLM 5-gram; this is the
  * engine-native equivalent at bigram order with add-one smoothing —
  * deterministic, SQL-oracle-reproducible, and the right shape for
  * Spark:
  *
  *  - TRAIN is one aggregation over the (small) reference slice:
  *    bigram counts, unigram context counts, vocabulary size. A real
  *    reference corpus (CCNet: Wikipedia) is tiny next to the corpus
  *    being scored, so the model tables broadcast.
  *  - SCORE is map-side: documents explode to consecutive word pairs,
  *    two BROADCAST joins attach the counts (the corpus never
  *    shuffles for the join), and one narrow (doc_id, logp) aggregate
  *    produces the per-doc mean negative log-likelihood. At 100 TB
  *    the explode multiplies rows but not bytes-per-row (pairs are
  *    two words + an id), and the aggregate is partial/map-side
  *    combinable.
  *
  * Smoothing: add-one (Laplace). P(w|v) = (c(v,w)+1) / (c(v)+V) with
  * V = reference vocabulary size + 1 (the +1 stands in for the OOV
  * type, so unseen contexts and words score finitely). All counts are
  * integers and the per-pair logp is ln of a ratio of integers —
  * bit-identical across engines; the per-doc mean is rounded for the
  * oracle hash like every other float aggregate in the battery.
  */
object LangModel {

  // Tokenized reference slice: referenced by two-to-four aggregations
  // during train (pairs/contexts/vocab; uni/bi/tri tables) — persisted
  // so the words() regexp pass over the reference runs once per train,
  // not once per model table (review r12; the lineDedup linePersist
  // idiom). One slot: a new train evicts the previous reference.
  private val refPersist = new PersistSlot

  /** The ONE bigram-position explode (review r12: train and score
    * inlined it separately — the oracle-exactness contract needs both
    * sides tokenizing bit-identically, so the identity lives here). */
  private[ops] def pairExplode(ws: org.apache.spark.sql.Column) =
    explode(arrays_zip(
      slice(ws, lit(1), size(ws) - 1),
      slice(ws, lit(2), size(ws) - 1)))

  /** The ONE trigram-position explode (same rule as [[pairExplode]]). */
  private[ops] def tripleExplode(ws: org.apache.spark.sql.Column) =
    explode(arrays_zip(
      slice(ws, lit(1), size(ws) - 2),
      slice(ws, lit(2), size(ws) - 2),
      slice(ws, lit(3), size(ws) - 2)))

  /** Train the bigram model on `ref`. Returns (bigrams, contexts, V):
    * (prev, cur, n) pair counts, (prev, n_ctx) context counts, and the
    * smoothing vocabulary size (distinct reference words + 1).
    *
    * Semantic choice (documented per VERDICT r8): the `>= 2` filter
    * runs BEFORE vocabulary counting, so a reference doc of exactly
    * one word contributes nothing — not even its word to V. Every
    * count (pairs, contexts, vocab) is thus drawn from the same doc
    * population "docs that have at least one bigram"; at real
    * reference sizes the effect on add-one smoothing is noise. The
    * trigram model below counts each n-gram order over every doc that
    * HAS that order instead. */
  def trainBigram(ref: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, Long) = {
    val ws = refPersist(
      ref.select(TextFunctions.words(col(textCol)).as("ws"))
        .filter(size(col("ws")) >= 2))
    val pairs = ws.select(pairExplode(col("ws")).as("p"))
      .select(col("p.0").as("prev"), col("p.1").as("cur"))
    val bigrams = pairs.groupBy("prev", "cur").agg(count(lit(1)).as("n"))
    val contexts = pairs.groupBy("prev").agg(count(lit(1)).as("n_ctx"))
    val v = ws.select(explode(col("ws")).as("w")).agg(
      countDistinct(col("w"))).head().getLong(0) + 1
    (bigrams, contexts, v)
  }

  /** Mean negative log-likelihood per document under the model —
    * (id, n_pairs, avg_nll); documents with < 2 words drop (they have
    * no bigrams to score; gate them on length, not perplexity).
    * Perplexity = exp(avg_nll) if wanted; the log form is the stable
    * one to threshold on. */
  def scoreNll(docs: DataFrame, bigrams: DataFrame, contexts: DataFrame,
      v: Long, idCol: String = "doc_id", textCol: String = "text")
      : DataFrame = {
    val ws = docs.select(col(idCol).as("id"),
        TextFunctions.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = ws.select(col("id"), pairExplode(col("ws")).as("p"))
      .select(col("id"), col("p.0").as("prev"), col("p.1").as("cur"))
    pairs
      .join(broadcast(bigrams), Seq("prev", "cur"), "left_outer")
      .join(broadcast(contexts), Seq("prev"), "left_outer")
      .withColumn("nll", -log(
        (coalesce(col("n"), lit(0L)) + 1).cast("double") /
          (coalesce(col("n_ctx"), lit(0L)) + v).cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_pairs"), avg(col("nll")).as("avg_nll"))
  }

  /** CCNet's bucketing step (Wenzek 2020 §4.3): split each language's
    * documents into equal head / middle / tail thirds by LM score
    * (head = most reference-like; CCNet trains downstream models on
    * head+middle and drops or deprioritizes tail). The split is
    * `ntile(3)` over (score, id) — pure integer rank logic with a
    * deterministic tie-break, chosen over interpolated percentile
    * CUTOFFS deliberately: an interpolated threshold is a derived
    * double that can land within an ulp of an actual score and flip a
    * bucket between engines, while equal-rank splitting has no float
    * comparison at all. Earlier buckets take the +1 remainder rows
    * (standard SQL ntile, identical in DuckDB — what the d42 oracle
    * relies on).
    *
    * Scale: one per-group sort shuffle (the same cost class as any
    * ranking). At 100 TB CCNet itself derives the two cutoffs from a
    * SAMPLE and applies them map-side; that variant is
    * `percentile_approx` on a sampled slice + a broadcast-join filter,
    * trading the exact equal split for a shuffle-free apply. */
  def perplexityBuckets(scored: DataFrame, groupCol: String,
      scoreCol: String, idCol: String = "id"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(col(scoreCol), col(idCol))
    scored.withColumn("__t", ntile(3).over(w))
      .withColumn("bucket",
        when(col("__t") === 1, lit("head"))
          .when(col("__t") === 2, lit("middle"))
          .otherwise(lit("tail")))
      .drop("__t")
  }

  /** Interpolated-trigram model tables (all broadcast-sized for a
    * fixed reference slice): counts per n-gram order plus the unigram
    * smoothing constants. Each order counts every n-gram that exists —
    * a 2-word doc contributes its words and its one bigram but no
    * trigram. */
  final case class TrigramModel(trigrams: DataFrame, trigramCtx: DataFrame,
      bigrams: DataFrame, bigramCtx: DataFrame, unigrams: DataFrame,
      nTokens: Long, v: Long)

  /** Interpolation weights as exact rationals λ₃,λ₂,λ₁ = 5/10, 3/10,
    * 2/10 — fixed, not EM-tuned (Jelinek-Mercer held-out tuning would
    * put a float optimization between the two engines; fixed small
    * integers keep every probability a ratio of exact integers). */
  val L3 = 5L; val L2 = 3L; val L1 = 2L; val LDen = 10L

  /** Train the interpolated trigram LM on `ref` (VERDICT r8 #4 — the
    * credible-quality-signal upgrade over [[trainBigram]]: trigram
    * evidence when the context is known, graceful fallback through
    * bigram to add-one unigram when it is not; Jelinek & Mercer 1980,
    * the λ-interpolation baseline of Chen & Goodman 1999 §2.3).
    *
    *   P(w|u,v) = λ₃·c(uvw)/c(uv·) + λ₂·c(vw)/c(v·) + λ₁·(c(w)+1)/(N+V)
    *
    * where c(uv·)/c(v·) are prefix totals from the SAME n-gram tables
    * (so each term is a proper conditional) and an unseen prefix drops
    * its term (ML 0/0 := 0). The unigram add-one floor keeps every
    * score finite for any input, OOV included. */
  def trainTrigram(ref: DataFrame, textCol: String = "text"): TrigramModel = {
    val ws = refPersist(
      ref.select(TextFunctions.words(col(textCol)).as("ws")))
    val uni = ws.select(explode(col("ws")).as("w"))
    val unigrams = uni.groupBy("w").agg(count(lit(1)).as("n1"))
    val totals = uni.agg(count(lit(1)), countDistinct(col("w"))).head()
    val (nTok, v) = (totals.getLong(0), totals.getLong(1) + 1)
    val pairs = ws.filter(size(col("ws")) >= 2)
      .select(pairExplode(col("ws")).as("p"))
      .select(col("p.0").as("v"), col("p.1").as("w"))
    val bigrams = pairs.groupBy("v", "w").agg(count(lit(1)).as("n2"))
    val bigramCtx = pairs.groupBy("v").agg(count(lit(1)).as("c2"))
    val triples = ws.filter(size(col("ws")) >= 3)
      .select(tripleExplode(col("ws")).as("t"))
      .select(col("t.0").as("u"), col("t.1").as("v"), col("t.2").as("w"))
    val trigrams = triples.groupBy("u", "v", "w").agg(count(lit(1)).as("n3"))
    val trigramCtx = triples.groupBy("u", "v").agg(count(lit(1)).as("c3"))
    // int64-exactness bound (review r11): scoreNllTrigram's common
    // denominator is 10·c3·c2·(N+V) <= 10·N²·(N+V), which wraps past
    // Long.MaxValue near N ≈ 9.7e5 reference tokens — wrapped negative
    // products make log() return NaN for EVERY document, silently.
    // The docstring admits the bound; enforce it where N is known.
    // CCNet-scale references should score from a SAMPLED slice —
    // perplexity models saturate long before 10^6 tokens anyway.
    require(nTok <= 900000L,
      s"trainTrigram: reference slice has $nTok tokens; the int64-exact " +
        "score arithmetic overflows past ~9e5 - train on a sampled " +
        "slice (e.g. Sampling.bernoulli the reference first)")
    TrigramModel(trigrams, trigramCtx, bigrams, bigramCtx, unigrams, nTok, v)
  }

  /** Mean negative log-likelihood per document under the interpolated
    * trigram model — (id, n_tri, avg_nll); documents with < 3 words
    * drop (no trigram positions; gate them on length).
    *
    * Oracle-exactness recipe, interpolated edition: the three-term sum
    * collapses to ONE ratio of integers over the common denominator
    * 10·c(uv·)·c(v·)·(N+V) (unseen prefixes contribute (0, 1)):
    *
    *   num = 5·c(uvw)·c(v·)·(N+V) + 3·c(vw)·c(uv·)·(N+V)
    *         + 2·(c(w)+1)·c(uv·)·c(v·)
    *
    * Both engines build num/den in 64-bit integer arithmetic and take
    * ln of one double division, so the scores are bit-identical.
    * Magnitude check: with a reference slice of N tokens, den ≤
    * 10·N²·(N+V) — at the fixed 250-doc slice (N ≈ 7·10⁴) that is
    * ~4·10¹⁵, inside both int64 and the 2⁵³ double-exact window that
    * the final division needs. A much larger reference slice would
    * need the terms rescaled by gcd or the λ-weights applied in
    * floating point (documented trade, same as approx_percentile in
    * d24).
    *
    * Scale shape is [[scoreNll]]'s: five broadcast joins (model tables
    * are reference-sized, fixed), corpus scored map-side, one narrow
    * (id, nll) partial-aggregable shuffle. */
  def scoreNllTrigram(docs: DataFrame, m: TrigramModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ws = docs.select(col(idCol).as("id"),
        TextFunctions.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 3)
    val triples = ws.select(col("id"), tripleExplode(col("ws")).as("t"))
      .select(col("id"), col("t.0").as("u"), col("t.1").as("v"),
        col("t.2").as("w"))
    val a3 = coalesce(col("n3"), lit(0L))
    val b3 = coalesce(col("c3"), lit(1L))
    val a2 = coalesce(col("n2"), lit(0L))
    val b2 = coalesce(col("c2"), lit(1L))
    val a1 = coalesce(col("n1"), lit(0L)) + 1L
    val b1 = lit(m.nTokens + m.v)
    triples
      .join(broadcast(m.trigrams), Seq("u", "v", "w"), "left_outer")
      .join(broadcast(m.trigramCtx), Seq("u", "v"), "left_outer")
      .join(broadcast(m.bigrams), Seq("v", "w"), "left_outer")
      .join(broadcast(m.bigramCtx), Seq("v"), "left_outer")
      .join(broadcast(m.unigrams), Seq("w"), "left_outer")
      .withColumn("nll", -log(
        (lit(L3) * a3 * b2 * b1 + lit(L2) * a2 * b3 * b1 +
          lit(L1) * a1 * b3 * b2).cast("double") /
          (lit(LDen) * b3 * b2 * b1).cast("double")))
      .groupBy("id")
      .agg(count(lit(1)).as("n_tri"), avg(col("nll")).as("avg_nll"))
  }
}
