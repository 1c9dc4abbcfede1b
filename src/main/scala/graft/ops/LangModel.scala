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

  /** Train the bigram model on `ref`. Returns (bigrams, contexts, V):
    * (prev, cur, n) pair counts, (prev, n_ctx) context counts, and the
    * smoothing vocabulary size (distinct reference words + 1). */
  def trainBigram(ref: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, Long) = {
    val ws = ref.select(TextFunctions.words(col(textCol)).as("ws"))
      .filter(size(col("ws")) >= 2)
    val pairs = ws.select(explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p"))
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
    val pairs = ws.select(col("id"), explode(arrays_zip(
        slice(col("ws"), lit(1), size(col("ws")) - 1),
        slice(col("ws"), lit(2), size(col("ws")) - 1))).as("p"))
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
}
