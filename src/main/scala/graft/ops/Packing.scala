package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence-packing planners: map curated documents onto fixed
  * token-budget training sequences. Two standard disciplines:
  *
  *  - [[concatChunkPlan]] — GPT-style "concatenate everything, slice
  *    every `budget` tokens": documents may straddle chunk boundaries,
  *    zero padding waste. Pure window algebra (one shuffle on the
  *    group key), every row's chunk span is a closed-form function of
  *    the running token sum.
  *  - [[greedyPack]] — first-fit-in-order bin packing: a document
  *    never straddles bins (needed when examples must stay intact);
  *    bins are closed when the next document would overflow. The
  *    per-group scan is inherently sequential, so it runs as the
  *    secondary-sort pattern: hash-partition by group, sort within
  *    partitions, one streaming pass per partition — the corpus
  *    shuffles ONCE and no group ever needs to fit in memory (the
  *    iterator is consumed lazily).
  *
  * Both are deterministic (doc-id order), so reruns and SQL oracles
  * reproduce the identical packing.
  */
object Packing {

  /** Plan the concat-and-chunk layout per `groupCol` (shard/source):
    * documents ordered by `idCol`, `tokensCol` tokens each, sliced
    * into `budget`-token chunks. Returns the input plus
    * `token_offset` (this doc's start in the group's token stream),
    * `chunk_first` (index of the chunk containing the first token)
    * and `n_chunks` (how many chunks the doc spans). A zero-token doc
    * occupies NO chunk: `n_chunks = 0` with `chunk_first` still the
    * chunk its offset falls in (before ADVICE r5 the span formula gave
    * empty docs 0 or 1 chunks depending on boundary position). */
  def concatChunkPlan(docs: DataFrame, idCol: String, groupCol: String,
      tokensCol: Column, budget: Int): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // explicit ROWS frame (review r11): the default RANGE frame makes
    // duplicate (group, id) rows frame PEERS sharing one __end — their
    // spans overlapped and the tokens between them belonged to no doc,
    // silent layout corruption downstream. ROWS gives consecutive
    // non-overlapping spans whatever the id multiplicity.
    val w = Window.partitionBy(col(groupCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // null/negative token counts corrupt EVERY later offset in the
    // group (review r12: size(null) is -1 under default Spark, so one
    // null-text doc silently shifted the whole layout backward; sum()
    // skipping nulls did the same one doc later). Same loud contract
    // as greedyPack.
    val nTok = tokensCol.cast("long")
    docs.withColumn("__n",
        when(nTok.isNull || nTok < 0, raise_error(concat(lit(
          "concatChunkPlan: null/negative token count ("),
          coalesce(nTok.cast("string"), lit("null")),
          lit(") - a words()-of-null doc reads -1; clean upstream"))))
          .otherwise(nTok))
      .withColumn("__end", sum(col("__n")).over(w))
      .withColumn("token_offset", col("__end") - col("__n"))
      // integer `div`, not floating floor(x / b): at 100 TB a group's
      // running token sum can exceed double's 53-bit mantissa and
      // round across a chunk boundary (and the SQL oracle uses exact
      // integer division)
      .withColumn("chunk_first", expr(s"token_offset div $budget"))
      .withColumn("n_chunks",
        when(col("__n") === 0, lit(0L))
          .otherwise(expr(s"(__end - 1) div $budget") - col("chunk_first") + 1))
      .drop("__n", "__end")
  }

  /** Sliding-window document chunking (RAG/embedding prep): split each
    * document's token stream into `chunkTokens`-token windows advancing
    * by `chunkTokens - overlap`, so consecutive chunks share `overlap`
    * tokens and no token is lost (the final window may be short).
    * Pure per-row map (tokenize → slice → posexplode) — no shuffle,
    * composes with scan pruning; emits (id, chunk_id, n_tokens, chunk
    * text). `tokensCol` must be the document's token ARRAY column. */
  def slidingChunks(docs: DataFrame, idCol: String, tokensCol: Column,
      chunkTokens: Int, overlap: Int): DataFrame = {
    require(overlap >= 0 && chunkTokens > overlap,
      s"need 0 <= overlap < chunkTokens, got overlap=$overlap chunk=$chunkTokens")
    val stride = chunkTokens - overlap
    // size(null) = -1 under default Spark: a null token array emitted
    // a phantom (n_tokens = -1, chunk = null) row (review r12)
    val checked = when(tokensCol.isNull, raise_error(lit(
      "slidingChunks: null token array - clean or filter upstream")))
      .otherwise(tokensCol)
    val n = size(checked)
    val nChunks = greatest(
      ceil((n - overlap).cast("double") / stride).cast("int"), lit(1))
    docs.select(col(idCol),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          i => slice(checked, i * stride + 1, lit(chunkTokens))))
          .as(Seq("chunk_id", "toks")))
      .select(col(idCol), col("chunk_id"),
        size(col("toks")).as("n_tokens"),
        array_join(col("toks"), " ").as("chunk"))
  }

  /** First-fit-in-order greedy packing: within each group (docs in
    * `idCol` order), a document joins the current bin unless that
    * would exceed `budget`, in which case it opens the next bin; a
    * document larger than the whole budget gets a bin of its own.
    * Returns (group, id, n_tokens, bin_id) with bins numbered from 0
    * per group. NB: the returned `group` column is the input group
    * CAST TO STRING (the streaming pass's tuple encoding) — re-cast
    * before joining back against a non-string group column. */
  def greedyPack(docs: DataFrame, idCol: String, groupCol: String,
      tokensCol: Column, budget: Long): DataFrame = {
    require(budget >= 1, s"budget must be >= 1, got $budget")
    // integral ids only (review r11): a string id would cast to null
    // (arbitrary packing order, then an encoder crash on the
    // non-nullable tuple field) — and a NUMERIC-string id would sort
    // numerically here while concatChunkPlan orders the raw column
    // lexicographically, silently disagreeing on "id order"
    locally {
      import org.apache.spark.sql.types._
      val dt = docs.schema(idCol).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"greedyPack needs an integral id; column '$idCol' is " +
          s"${dt.simpleString} - map ids to longs first")
    }
    val spark = docs.sparkSession
    import spark.implicits._
    // a null token count would crash the non-nullable encoder field
    // with an opaque message mid-job; diagnose at the contract instead
    val nTok = tokensCol.cast("long")
    docs.select(col(groupCol).cast("string").as("group"),
        // null ids pass the TYPE require above but crash the
        // non-nullable tuple encoder mid-job (review r12) — same loud
        // contract as the token-count guard below
        when(col(idCol).isNull, raise_error(lit(
          "greedyPack: null id - clean or coalesce upstream")))
          .otherwise(col(idCol).cast("long")).as("id"),
        when(nTok.isNull, raise_error(lit(
          "greedyPack: null token count - clean or coalesce upstream")))
          .otherwise(nTok).as("n_tokens"))
      .repartition(col("group"))
      .sortWithinPartitions(col("group"), col("id"))
      .as[(String, Long, Long)]
      .mapPartitions { it =>
        // streaming pass: state is (current group, bin, fill) only —
        // group size never matters
        var g: String = null
        var bin = 0L
        var used = 0L
        it.map { case (grp, id, n) =>
          if (grp != g) { g = grp; bin = 0L; used = 0L }
          if (used > 0 && used + n > budget) { bin += 1; used = 0L }
          used += n
          (grp, id, n, bin)
        }
      }
      .toDF("group", "id", "n_tokens", "bin_id")
  }
}
