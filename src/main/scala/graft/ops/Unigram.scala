package graft.ops

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftExprBridge => ExpressionUtils}

/** Unigram-LM tokenizer model (Kudo 2018, "Subword Regularization",
  * arXiv:1804.10959 — the SentencePiece unigram algorithm behind
  * T5/Gemma-class tokenizers): each piece carries an independent log
  * probability and a word's tokenization is the Viterbi-best
  * segmentation, argmax over segmentations of Σ log P(piece).
  *
  * `pieces(i)` scores `logp(i)`; a single character absent from the
  * vocabulary scores `unkLogp` (the <unk> fallback — it guarantees
  * every word segments, the coverage contract SentencePiece gets from
  * required characters). Multi-character pieces have no fallback.
  *
  * The model is a driver-local value (≤ vocabSize strings + doubles)
  * shipped to executors as a codegen reference object, the
  * [[PqCodebook]]/[[SqModel]] pattern. Case-class equality over
  * Vectors keeps structurally identical encode calls
  * semanticEquals-dedupable (the BpeEncodeExpr Seq-not-Array lesson).
  */
final case class UnigramModel(pieces: Vector[String], logp: Vector[Double],
    unkLogp: Double) {
  require(pieces.nonEmpty && pieces.length == logp.length,
    s"unigram model: ${pieces.length} pieces vs ${logp.length} logps")
  require(pieces.distinct.length == pieces.length,
    "unigram model: duplicate pieces")
  locally {
    var i = 0
    while (i < pieces.length) {
      require(pieces(i).nonEmpty, s"unigram model: empty piece at $i")
      // a NaN logp poisons every Viterbi comparison silently (the
      // SqModel NaN contract); +inf/0-prob pieces are also senseless
      require(!logp(i).isNaN && logp(i) <= 0.0,
        s"unigram model: logp(${pieces(i)}) = ${logp(i)} must be a " +
          "non-NaN log probability <= 0")
      i += 1
    }
  }
  require(!unkLogp.isNaN && unkLogp <= 0.0,
    s"unigram model: unkLogp = $unkLogp must be a non-NaN log probability <= 0")

  val maxPieceLen: Int = pieces.iterator.map(_.length).max

  /** Executor-side lookup table, built once per deserialized model. */
  @transient lazy val table: java.util.HashMap[String, java.lang.Double] = {
    val t = new java.util.HashMap[String, java.lang.Double](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { t.put(pieces(i), logp(i)); i += 1 }
    t
  }
}

/** Unigram-LM (SentencePiece-style) tokenizer: training via hard-EM
  * (Viterbi counts) over the distinct-word frequency table, and a
  * native codegen'd Viterbi encoder.
  *
  * Training scale shape (the [[Bpe.train]] word-count factored form):
  * the cluster does ONE distributed word-count pass (map-side combine,
  * the d26 shape); seeding, EM and pruning then iterate on the driver
  * over a dict capped at `maxWords` word types (Zipf: the top 50k
  * types carry virtually all substring mass) — corpus size only
  * affects the one count pass. TWO trainers share that shape:
  * [[Unigram.train]] is hard-EM (each word's counts come from its
  * single Viterbi-best segmentation — counts stay exact integers,
  * deterministic across runs AND platforms), and [[Unigram.trainEm]]
  * is Kudo's forward-backward EM proper with likelihood-loss pruning
  * (expected counts over all segmentations; corpus log-likelihood
  * provably ascends per step — the SentencePiece-parity mode).
  *
  * Encode scale shape: one pure map-side codegen pass; the model rides
  * as a reference object; no shuffle, no UDF. Gate d49 proves the
  * Viterbi DP against a recursive-CTE enumeration oracle on a
  * dyadic-cost vocabulary where every path score is an exact integer.
  *
  * The Viterbi tie-break is pinned (and mirrored by the spec): maximize
  * score, then minimize piece count, then prefer the LONGER last piece
  * (smallest split point), applied left to right. The gate grades
  * (score, n_pieces), which are tie-invariant aggregates; the token
  * sequence itself is pinned by the spec's hand-computed segmentations.
  */
object Unigram {

  /** Viterbi-best segmentation of one word — the ONE DP kernel shared
    * by the encode expression (executor) and hard-EM training
    * (driver). Returns (score, pieces); score is the sum of piece
    * logps in sequence order (fixed summation order — integral logps
    * sum exactly, the oracle-exactness contract). */
  def viterbi(w: String, model: UnigramModel): (Double, Array[String]) = {
    val n = w.length
    require(n > 0, "unigram viterbi: empty word")
    val maxLen = model.maxPieceLen
    val score = new Array[Double](n + 1)
    val np = new Array[Int](n + 1)
    val back = new Array[Int](n + 1)
    var i = 1
    while (i <= n) {
      var bestScore = Double.NegativeInfinity
      var bestNp = Int.MaxValue
      var bestJ = -1
      var j = math.max(0, i - maxLen)
      // j ascending + strictly-better replacement = ties keep the
      // smallest j, i.e. the longest last piece
      while (j < i) {
        val piece = w.substring(j, i)
        val lpBoxed = model.table.get(piece)
        val lp: Double =
          if (lpBoxed != null) lpBoxed.doubleValue()
          else if (i - j == 1) model.unkLogp
          else Double.NaN // multi-char miss: no fallback
        if (!lp.isNaN && back(j) >= 0) {
          val s = score(j) + lp
          val p = np(j) + 1
          if (s > bestScore || (s == bestScore && p < bestNp)) {
            bestScore = s; bestNp = p; bestJ = j
          }
        }
        j += 1
      }
      score(i) = bestScore; np(i) = bestNp; back(i) = bestJ
      i += 1
    }
    // back(0) = 0 sentinel (>= 0 means reachable); singles + unk
    // fallback make every position reachable, so back(n) >= 0 always
    val out = new Array[String](np(n))
    var pos = n
    var k = np(n) - 1
    while (pos > 0) {
      out(k) = w.substring(back(pos), pos)
      pos = back(pos)
      k -= 1
    }
    (score(n), out)
  }

  /** Train a unigram-LM vocabulary of (at most) `vocabSize` pieces.
    * Deterministic: the dict truncation orders by (count desc, word),
    * every seed/prune truncation by (count desc, piece), and all float
    * normalization sums run in sorted piece order.
    *
    * @param vocabSize   total pieces kept (single characters always
    *                    survive — they are the coverage floor)
    * @param maxPieceLen longest candidate substring
    * @param seedSize    multi-char seed candidates kept before EM
    * @param iters       hard-EM refinement rounds
    * @param maxWords    dict cap collected to the driver (the
    *                    [[Bpe.train]] Zipf argument)
    * @param minCount    seed floor: substrings rarer than this never
    *                    become candidates
    */
  def train(docs: DataFrame, textCol: String = "text", vocabSize: Int = 1000,
      maxPieceLen: Int = 4, seedSize: Int = 8000, iters: Int = 2,
      maxWords: Int = 50000, minCount: Long = 2L): UnigramModel = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val wc = collectDict(docs, textCol, maxWords)
    val (singles, singleCounts, multi0) =
      seedFrom(wc, maxPieceLen, seedSize, minCount)
    var multi: Vector[(String, Long)] = multi0

    def normalize(counts: Map[String, Long]): UnigramModel =
      normalizeCounts(counts)

    var singleFinal: Map[String, Long] =
      singles.map(s => s -> singleCounts.get(s).longValue()).toMap
    var model = normalize(singleFinal ++ multi.toMap)

    var it = 0
    while (it < iters) {
      val counts = new java.util.HashMap[String, Long]()
      wc.foreach { case (w, c) =>
        val (_, pieces) = viterbi(w, model)
        pieces.foreach(p => counts.merge(p, c, (a, b) => a + b))
      }
      // singles keep add-one floor counts (coverage survives even when
      // Viterbi never picks a character alone); multi-char pieces with
      // zero Viterbi mass drop
      singleFinal =
        singles.map(s => s -> (Option(counts.get(s)).getOrElse(0L) + 1L)).toMap
      multi = multi.flatMap { case (p, _) =>
        Option(counts.get(p)).filter(_ > 0L).map(c => (p, c.longValue()))
      }
      model = normalize(singleFinal ++ multi.toMap)
      it += 1
    }

    // final prune to the budget: singles always survive, and the kept
    // counts are the SAME counts the last normalize used
    val budget = math.max(0, vocabSize - singles.length)
    val prunedMulti = multi.sortBy { case (p, c) => (-c, p) }.take(budget)
    normalize(singleFinal ++ prunedMulti.toMap)
  }

  /** Integer-count multinomial normalization shared by hard-EM
    * [[train]] and [[trainDistributed]] — the ONE place the
    * exact-integer mode turns counts into a model: sorted iteration
    * order pins the float total, so two identical count maps always
    * produce the bit-identical model (what makes the distributed
    * trainer's exact-equality guarantee possible at all). */
  private def normalizeCounts(counts: Map[String, Long]): UnigramModel = {
    val ordered = counts.toVector.sortBy(_._1)
    val total = ordered.iterator.map(_._2).sum.toDouble
    UnigramModel(ordered.map(_._1),
      ordered.map { case (_, c) => math.log(c / total) },
      unkLogp = math.log(0.5 / total))
  }

  /** ONE distributed word-count pass → the driver dict, (count desc,
    * word)-truncated to `maxWords` (the [[Bpe.train]] Zipf argument) —
    * shared by hard-EM [[train]] and forward-backward [[trainEm]]. */
  private def collectDict(docs: DataFrame, textCol: String,
      maxWords: Int): Array[(String, Long)] = {
    val wc = docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(wc.nonEmpty, "unigram train: corpus has no words")
    wc
  }

  /** Seed construction shared by both trainers: singles (the coverage
    * floor — every character of every dict word, so the <unk> fallback
    * never fires during training and the EM lattice is a proper
    * multinomial over pieces) and the (count desc, piece)-truncated
    * multi-char substring candidates. */
  private def seedFrom(wc: Array[(String, Long)], maxPieceLen: Int,
      seedSize: Int, minCount: Long)
      : (Vector[String], java.util.TreeMap[String, Long], Vector[(String, Long)]) = {
    val singleCounts = new java.util.TreeMap[String, Long]()
    wc.foreach { case (w, c) =>
      var i = 0
      while (i < w.length) {
        singleCounts.merge(String.valueOf(w.charAt(i)), c, (a, b) => a + b)
        i += 1
      }
    }
    val singles: Vector[String] =
      singleCounts.keySet().toArray(Array.empty[String]).toVector
    val sub = new java.util.HashMap[String, Long]()
    wc.foreach { case (w, c) =>
      var len = 2
      while (len <= maxPieceLen) {
        var i = 0
        while (i + len <= w.length) {
          sub.merge(w.substring(i, i + len), c, (a, b) => a + b)
          i += 1
        }
        len += 1
      }
    }
    val multi: Vector[(String, Long)] = {
      val arr = new scala.collection.mutable.ArrayBuffer[(String, Long)](sub.size)
      sub.forEach((p, c) => if (c >= minCount) { arr += ((p, c)); () })
      arr.sortBy { case (p, c) => (-c, p) }.take(seedSize).toVector
    }
    (singles, singleCounts, multi)
  }

  /** Forward-backward EM training — Kudo 2018 §3.2 / the SentencePiece
    * unigram trainer proper, closing [[train]]'s documented hard-EM
    * simplification: the E-step accumulates EXPECTED piece counts over
    * ALL segmentations of each dict word (forward/backward marginals
    * on the segmentation lattice, log-domain), the M-step is the exact
    * multinomial ML update, and pruning ranks pieces by Kudo's
    * likelihood LOSS (how much the corpus log-likelihood drops when
    * the piece is removed and its mass re-segments) instead of raw
    * count. Because the seed singles cover every dict character, the
    * lattice never needs the <unk> fallback and every EM step is a
    * true EM step — corpus log-likelihood ascends monotonically
    * (UnigramSpec proves the property; [[trainEmWithTrace]] exposes
    * the per-step trace).
    *
    * Same scale shape as [[train]]: ONE distributed word-count pass,
    * then driver iteration over the ≤ `maxWords` dict. [[train]]
    * remains the deterministic exact-integer mode; this is the
    * SentencePiece-parity mode (float expected counts, fixed
    * accumulation order, so still run-to-run reproducible).
    *
    * The alternating schedule is Kudo's: `iters` EM steps, then prune
    * the worst multi-char pieces to max(budget, 75% of current) by
    * likelihood loss, repeat until the budget holds, with a final
    * `iters` EM steps on the surviving vocabulary. */
  def trainEm(docs: DataFrame, textCol: String = "text", vocabSize: Int = 1000,
      maxPieceLen: Int = 4, seedSize: Int = 8000, iters: Int = 2,
      maxWords: Int = 50000, minCount: Long = 2L): UnigramModel =
    trainEmWithTrace(docs, textCol, vocabSize, maxPieceLen, seedSize, iters,
      maxWords, minCount)._1

  /** [[trainEm]] plus the corpus log-likelihood measured at the START
    * of each EM step (so within one prune round the trace is the
    * textbook nondecreasing EM sequence; a prune is allowed to drop
    * it — that is the size/likelihood trade being bought). */
  def trainEmWithTrace(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 1000, maxPieceLen: Int = 4, seedSize: Int = 8000,
      iters: Int = 2, maxWords: Int = 50000, minCount: Long = 2L)
      : (UnigramModel, Vector[Vector[Double]]) = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(iters >= 1, s"trainEm: iters must be >= 1, got $iters")
    val wc = collectDict(docs, textCol, maxWords)
    val (singles, singleCounts, multi0) =
      seedFrom(wc, maxPieceLen, seedSize, minCount)
    emTrainLoop(singles, s => singleCounts.get(s).longValue(), multi0,
      vocabSize, iters, m => emStep(wc, m))
  }

  /** The shared EM-then-prune alternation (Kudo's schedule) behind
    * [[trainEmWithTrace]] and [[trainEmDistributedWithTrace]] — the
    * two trainers differ ONLY in how one E-step runs (driver loop over
    * the collected dict vs one Spark job over the dict table), so the
    * M-step, the likelihood-loss prune, and the stopping rule live
    * here once and can never drift apart. */
  private def emTrainLoop(singles: Vector[String],
      singleCount: String => Long, multi0: Vector[(String, Long)],
      vocabSize: Int, iters: Int,
      em: UnigramModel => (Double, Map[String, Double]))
      : (UnigramModel, Vector[Vector[Double]]) = {
    val singleSet = singles.toSet

    def normalizeD(counts: Map[String, Double]): UnigramModel = {
      val ordered = counts.toVector.sortBy(_._1)
      val total = ordered.iterator.map(_._2).sum
      UnigramModel(ordered.map(_._1),
        ordered.map { case (_, c) => math.log(c / total) },
        unkLogp = math.log(0.5 / total))
    }

    var pieceCounts: Map[String, Double] =
      (singles.map(s => s -> singleCount(s).toDouble) ++
        multi0.map { case (p, c) => p -> c.toDouble }).toMap
    var model = normalizeD(pieceCounts)
    val budget = math.max(0, vocabSize - singles.length)
    val traces = scala.collection.mutable.ArrayBuffer.empty[Vector[Double]]

    var done = false
    while (!done) {
      // `iters` EM steps on the current piece set
      val trace = scala.collection.mutable.ArrayBuffer.empty[Double]
      var it = 0
      while (it < iters) {
        val (ll, expected) = em(model)
        trace += ll
        // every candidate keeps positive expected mass (all spans have
        // nonzero posterior), so the exact M-step never zeroes a piece
        pieceCounts = expected
        model = normalizeD(pieceCounts)
        it += 1
      }
      traces += trace.toVector
      val multiNow = pieceCounts.keysIterator
        .filterNot(singleSet.contains).toVector
      if (multiNow.size <= budget) done = true
      else {
        // Kudo's likelihood-loss prune: loss(p) = E[count_p] ·
        // (logp(p) − best alternative segmentation of p without p
        // itself). Low loss = cheap to remove. Shrink to
        // max(budget, 75%) and re-run EM on the survivors.
        val keep = math.max(budget, (multiNow.size * 3) / 4)
        val losses = multiNow.map { p =>
          val lp = model.table.get(p).doubleValue()
          val alt = viterbiExcludingSelf(p, model)
          (p, pieceCounts(p) * (lp - alt))
        }
        val kept = losses.sortBy { case (p, l) => (-l, p) }.take(keep)
          .map(_._1).toSet
        pieceCounts = pieceCounts.filter { case (p, _) =>
          singleSet.contains(p) || kept.contains(p) }
        model = normalizeD(pieceCounts)
      }
    }
    (model, traces.toVector)
  }

  /** Fully distributed hard-EM — [[train]] with the driver dict
    * removed (the [[trainEmDistributed]] treatment for the
    * exact-integer mode): the word-count table stays a persisted
    * TABLE, seeding is the same distributed substring count, and each
    * hard-EM step is ONE Spark job ([[UnigramViterbiPiecesExpr]]
    * explode → map-side-combined per-piece LONG sums → vocab-sized
    * collect). Because Viterbi counts are INTEGERS, the cross-word
    * sums are exact and order-independent — so unlike the soft
    * trainer's documented float jitter, this one is BIT-IDENTICAL to
    * [[train]] whenever the driver dict is uncapped (UnigramSpec pins
    * `trainDistributed(docs) == train(docs, maxWords = huge)`), and
    * bit-identical across partitionings unconditionally. The only
    * remaining driver-vs-distributed divergence is [[train]]'s
    * `maxWords` truncation itself — which is exactly what this
    * removes. (Seed-boundary caveat shared with the soft trainer:
    * the (count desc, piece) truncation tie order is binary-UTF-8
    * here vs UTF-16 on the driver — supplementary-plane ties only.) */
  def trainDistributed(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 1000, maxPieceLen: Int = 4, seedSize: Int = 8000,
      iters: Int = 2, minCount: Long = 2L): UnigramModel = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(iters >= 0, s"iters must be >= 0, got $iters")
    val dict = docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (singles, multi0) = seedDistributed(dict, maxPieceLen,
        seedSize, minCount)
      val singleCounts = singles.toMap

      def normalize(counts: Map[String, Long]): UnigramModel =
        normalizeCounts(counts)

      var singleFinal: Map[String, Long] = singleCounts
      var multi: Vector[(String, Long)] = multi0
      var model = normalize(singleFinal ++ multi.toMap)
      var it = 0
      while (it < iters) {
        // ONE job: Viterbi-segment every dict word under the broadcast
        // model, weight each piece by the word count, sum per piece
        // (LONG sums — exact, order-independent)
        val counts: Map[String, Long] = dict
          .select(col("c"), explode(ExpressionUtils.column(
            UnigramViterbiPiecesExpr(ExpressionUtils.expression(col("w")),
              model))).as("p"))
          .groupBy("p").agg(sum(col("c")).as("n"))
          .collect().map(r => (r.getString(0), r.getLong(1))).toMap
        // the [[train]] M-step verbatim: singles keep add-one floor
        // counts, multi-char pieces with zero Viterbi mass drop
        singleFinal = singleCounts.map { case (s, _) =>
          s -> (counts.getOrElse(s, 0L) + 1L) }
        multi = multi.flatMap { case (p, _) =>
          counts.get(p).filter(_ > 0L).map(c => (p, c)) }
        model = normalize(singleFinal ++ multi.toMap)
        it += 1
      }
      val budget = math.max(0, vocabSize - singleCounts.size)
      val prunedMulti = multi.sortBy { case (p, c) => (-c, p) }.take(budget)
      normalize(singleFinal ++ prunedMulti.toMap)
    } finally {
      dict.unpersist(blocking = false)
      ()
    }
  }

  /** Distributed seed construction shared by [[trainDistributed]] and
    * [[trainEmDistributedWithTrace]]: singles = every distinct
    * character of the dict with its total count (alphabet-bounded
    * collect — the coverage floor), multi = the (count desc, piece)-
    * truncated substring candidates, pruned to `seedSize` INSIDE
    * Spark. Counts are integer sums — exact and order-independent. */
  private def seedDistributed(dict: DataFrame, maxPieceLen: Int,
      seedSize: Int, minCount: Long)
      : (Vector[(String, Long)], Vector[(String, Long)]) = {
    val singles: Vector[(String, Long)] = dict
      .select(col("c"), explode(substringsCol(col("w"), 1, 1)).as("p"))
      .groupBy("p").agg(sum(col("c")).as("pc"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toVector
    require(singles.nonEmpty, "unigram train: corpus has no words")
    val multi0: Vector[(String, Long)] = dict
      .select(col("c"),
        explode(substringsCol(col("w"), 2, maxPieceLen)).as("p"))
      .groupBy("p").agg(sum(col("c")).as("pc"))
      .where(col("pc") >= minCount)
      .orderBy(col("pc").desc, col("p")).limit(seedSize)
      .collect().map(r => (r.getString(0), r.getLong(1))).toVector
    (singles, multi0)
  }

  /** Fully distributed forward-backward EM — [[trainEm]] with the
    * driver dict removed: the word-count table NEVER lands on the
    * driver (no `maxWords` cap — the cap is [[trainEm]]'s one scale
    * limit), seeding is a distributed substring count, and each E-step
    * is ONE Spark job (dict scan → [[UnigramEmExpr]] explode →
    * map-side partial sums → per-piece totals), collecting only the
    * piece-count table (≤ singles + seedSize + 1 rows — vocab-sized by
    * construction, corpus-size-independent). M-step and
    * likelihood-loss prune are [[emTrainLoop]], shared verbatim with
    * the driver trainer.
    *
    * Determinism: seeding is exact (integer sums; the seed truncation
    * order `(count desc, piece)` follows Spark's binary-UTF-8 string
    * order, which differs from the driver's UTF-16 order only for
    * supplementary-plane ties at the seedSize boundary). E-step totals
    * are float sums in shuffle-arrival order, so logp carries ~1e-12
    * relative jitter vs [[trainEm]] — UnigramSpec pins pieces
    * identical and logp parity under tolerance, and run-to-run
    * partition invariance. Use [[train]] when bit-exact determinism
    * matters more than SentencePiece-parity soft counts. */
  def trainEmDistributed(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 1000, maxPieceLen: Int = 4, seedSize: Int = 8000,
      iters: Int = 2, minCount: Long = 2L): UnigramModel =
    trainEmDistributedWithTrace(docs, textCol, vocabSize, maxPieceLen,
      seedSize, iters, minCount)._1

  /** [[trainEmDistributed]] plus the per-step corpus log-likelihood
    * trace ([[trainEmWithTrace]]'s contract). */
  def trainEmDistributedWithTrace(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 1000, maxPieceLen: Int = 4, seedSize: Int = 8000,
      iters: Int = 2, minCount: Long = 2L)
      : (UnigramModel, Vector[Vector[Double]]) = {
    require(vocabSize >= 2, s"vocabSize must be >= 2, got $vocabSize")
    require(maxPieceLen >= 2, s"maxPieceLen must be >= 2, got $maxPieceLen")
    require(iters >= 1, s"trainEm: iters must be >= 1, got $iters")
    // ONE corpus pass; EM iterates over this (persisted) dict table —
    // the corpus is never rescanned
    val dict = docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (singles, multi0) = seedDistributed(dict, maxPieceLen,
        seedSize, minCount)
      val singleMap = singles.toMap
      def emDistributed(model: UnigramModel)
          : (Double, Map[String, Double]) = {
        val rows = dict
          .select(explode(ExpressionUtils.column(
            UnigramEmExpr(ExpressionUtils.expression(col("w")),
              ExpressionUtils.expression(col("c")), model))).as("e"))
          .groupBy(col("e.p").as("p")).agg(sum(col("e.m")).as("m"))
          .collect()
        var ll = 0.0
        val b = Map.newBuilder[String, Double]
        rows.foreach { r =>
          val p = r.getString(0)
          // "" is the LL sentinel (pieces are nonempty substrings)
          if (p.isEmpty) ll = r.getDouble(1) else b += (p -> r.getDouble(1))
        }
        (ll, b.result())
      }
      emTrainLoop(singles.map(_._1), singleMap, multi0, vocabSize, iters,
        emDistributed)
    } finally {
      dict.unpersist(blocking = false)
      ()
    }
  }

  /** All substrings of UTF-16 length `minLen..maxLen` (one entry per
    * OCCURRENCE — the [[seedFrom]] counting rule) as a column. */
  private def substringsCol(w: Column, minLen: Int, maxLen: Int): Column =
    ExpressionUtils.column(
      SubstringsExpr(ExpressionUtils.expression(w), minLen, maxLen))

  /** One forward-backward E-step over the dict: returns (corpus
    * log-likelihood under `model`, expected piece counts). Fixed
    * iteration order (the dict's (count desc, word) order, spans
    * scanned j-then-i ascending) pins the float accumulation. */
  private def emStep(wc: Array[(String, Long)], model: UnigramModel)
      : (Double, Map[String, Double]) = {
    val counts = new java.util.HashMap[String, java.lang.Double]()
    var ll = 0.0
    wc.foreach { case (w, c) =>
      val (z, contrib) = emWord(w, c, model)
      ll += c * z
      var k = 0
      while (k < contrib.length) {
        val (p, m) = contrib(k)
        counts.merge(p, m, (a, b) => a + b)
        k += 1
      }
    }
    val out = Map.newBuilder[String, Double]
    counts.forEach((p, c) => out += (p -> c.doubleValue()))
    (ll, out.result())
  }

  /** Per-word E-step kernel shared by the driver [[emStep]] and the
    * distributed [[UnigramEmExpr]]: forward/backward marginals over
    * ONE dict word's segmentation lattice. Returns (z = log Z(w), the
    * per-span (piece, c·gamma) contributions in the fixed j-then-i
    * scan order — merging them in that order reproduces the old
    * inlined accumulation bit-for-bit, so extracting this kernel
    * changed no float). Spans may repeat a piece; callers sum. */
  private[ops] def emWord(w: String, c: Long, model: UnigramModel)
      : (Double, Array[(String, Double)]) = {
    val n = w.length
    val maxLen = model.maxPieceLen
    // forward: alpha(i) = logsumexp_j alpha(j) + lp(w[j..i))
    val alpha = new Array[Double](n + 1)
    java.util.Arrays.fill(alpha, Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val lp = pieceLogp(w, j, i, model)
        if (!lp.isNaN && alpha(j) != Double.NegativeInfinity)
          alpha(i) = logAdd(alpha(i), alpha(j) + lp)
        j += 1
      }
      i += 1
    }
    // beta: beta(j) = logsumexp_i lp(w[j..i)) + beta(i)
    val beta = new Array[Double](n + 1)
    java.util.Arrays.fill(beta, Double.NegativeInfinity)
    beta(n) = 0.0
    var j2 = n - 1
    while (j2 >= 0) {
      var i2 = j2 + 1
      val lim = math.min(n, j2 + maxLen)
      while (i2 <= lim) {
        val lp = pieceLogp(w, j2, i2, model)
        if (!lp.isNaN && beta(i2) != Double.NegativeInfinity)
          beta(j2) = logAdd(beta(j2), lp + beta(i2))
        i2 += 1
      }
      j2 -= 1
    }
    val z = alpha(n) // == beta(0) up to float noise
    // span posteriors -> expected-count contributions
    val out = scala.collection.mutable.ArrayBuffer.empty[(String, Double)]
    var j3 = 0
    while (j3 < n) {
      var i3 = j3 + 1
      val lim = math.min(n, j3 + maxLen)
      while (i3 <= lim) {
        val lp = pieceLogp(w, j3, i3, model)
        if (!lp.isNaN) {
          val gamma = math.exp(alpha(j3) + lp + beta(i3) - z)
          if (gamma > 0.0) out += ((w.substring(j3, i3), c * gamma))
        }
        i3 += 1
      }
      j3 += 1
    }
    (z, out.toArray)
  }

  /** logp of span w[j..i) under the model; NaN = no such piece. The
    * <unk> fallback is deliberately ABSENT: training seeds cover every
    * dict character, and letting unk leak into the lattice would break
    * the proper-multinomial EM guarantee. */
  private def pieceLogp(w: String, j: Int, i: Int,
      model: UnigramModel): Double = {
    val lpBoxed = model.table.get(w.substring(j, i))
    if (lpBoxed != null) lpBoxed.doubleValue() else Double.NaN
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a == Double.NegativeInfinity) b
    else if (b == Double.NegativeInfinity) a
    else if (a >= b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Best segmentation score of the STRING `p` when `p` itself is off
    * the table (its occurrences must re-segment) — the alternative
    * term of the likelihood-loss prune. Singles keep the unk fallback
    * here: a single-char piece can never re-segment, so its loss is
    * moot (singles are never pruned). */
  private def viterbiExcludingSelf(p: String, model: UnigramModel): Double = {
    val n = p.length
    val maxLen = model.maxPieceLen
    val score = new Array[Double](n + 1)
    java.util.Arrays.fill(score, Double.NegativeInfinity)
    score(0) = 0.0
    var i = 1
    while (i <= n) {
      var j = math.max(0, i - maxLen)
      while (j < i) {
        // skip the full span == p (that IS the piece being costed out)
        if (!(j == 0 && i == n)) {
          val lpBoxed = model.table.get(p.substring(j, i))
          val lp: Double =
            if (lpBoxed != null) lpBoxed.doubleValue()
            else if (i - j == 1) model.unkLogp
            else Double.NaN
          if (!lp.isNaN && score(j) != Double.NegativeInfinity) {
            val s = score(j) + lp
            if (s > score(i)) score(i) = s
          }
        }
        j += 1
      }
      i += 1
    }
    score(n)
  }

  /** The k smallest DISTINCT segmentation costs (cost = −score) of one
    * word, ascending. Distinct-cost sets compose positionally (the
    * k-smallest distinct sums over a prefix extend piece-wise), so the
    * DP carries ≤ k costs per position — no path explosion. This is
    * the tie-INVARIANT skeleton of n-best decoding: gate d51 grades
    * cost ranks (unique numbers), while [[kbest]] returns the actual
    * ranked paths for sampling. */
  def kbestDistinctCosts(w: String, model: UnigramModel, k: Int): Array[Double] = {
    require(k >= 1, s"kbestDistinctCosts: k must be >= 1, got $k")
    val n = w.length
    require(n > 0, "unigram kbestDistinctCosts: empty word")
    val maxLen = model.maxPieceLen
    val dp = new Array[Array[Double]](n + 1)
    dp(0) = Array(0.0)
    var i = 1
    while (i <= n) {
      val cand = scala.collection.mutable.SortedSet.empty[Double]
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val piece = w.substring(j, i)
        val lpBoxed = model.table.get(piece)
        val lp: Double =
          if (lpBoxed != null) lpBoxed.doubleValue()
          else if (i - j == 1) model.unkLogp
          else Double.NaN
        if (!lp.isNaN && dp(j) != null) {
          val cost = -lp
          dp(j).foreach { c =>
            val t = c + cost
            // contains-check FIRST: evicting the max and then adding a
            // value already in the set would silently shrink it
            if (!cand.contains(t)) {
              if (cand.size < k) { cand += t; () }
              else if (t < cand.last) { cand -= cand.last; cand += t; () }
            }
          }
        }
        j += 1
      }
      dp(i) = if (cand.isEmpty) null else cand.toArray
      i += 1
    }
    dp(n) // non-null: singles + unk fallback reach every position
  }

  /** The k best segmentations of one word as (score, pieces), ranked
    * by the pinned total order (score desc, fewer pieces, then the
    * deterministic backpointer order) — the sampling lattice of
    * subword regularization (Kudo 2018 §3; SentencePiece samples from
    * the l-best list with probability ∝ P(path)^alpha). */
  def kbest(w: String, model: UnigramModel,
      k: Int): Array[(Double, Array[String])] = {
    require(k >= 1, s"kbest: k must be >= 1, got $k")
    val n = w.length
    require(n > 0, "unigram kbest: empty word")
    val maxLen = model.maxPieceLen
    // dp(i): up to k entries (score, np, prevPos, prevIdx), best-first
    // under (score desc, np asc, prevPos asc, prevIdx asc)
    final case class E(score: Double, np: Int, prevPos: Int, prevIdx: Int)
    val ord = Ordering.by[E, (Double, Int, Int, Int)](e =>
      (-e.score, e.np, e.prevPos, e.prevIdx))
    val dp = new Array[Array[E]](n + 1)
    dp(0) = Array(E(0.0, 0, -1, -1))
    var i = 1
    while (i <= n) {
      val cand = scala.collection.mutable.ArrayBuffer.empty[E]
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val piece = w.substring(j, i)
        val lpBoxed = model.table.get(piece)
        val lp: Double =
          if (lpBoxed != null) lpBoxed.doubleValue()
          else if (i - j == 1) model.unkLogp
          else Double.NaN
        if (!lp.isNaN && dp(j) != null) {
          var x = 0
          while (x < dp(j).length) {
            cand += E(dp(j)(x).score + lp, dp(j)(x).np + 1, j, x)
            x += 1
          }
        }
        j += 1
      }
      dp(i) = if (cand.isEmpty) null else cand.sorted(ord).take(k).toArray
      i += 1
    }
    dp(n).map { last =>
      val out = new Array[String](last.np)
      var e = last
      var pos = n
      var idx = last.np - 1
      while (e.prevPos >= 0) {
        out(idx) = w.substring(e.prevPos, pos)
        pos = e.prevPos
        val prev = dp(e.prevPos)(e.prevIdx)
        e = prev
        idx -= 1
      }
      (last.score, out)
    }
  }

  /** One sampled segmentation (subword regularization): draw from the
    * word's [[kbest]] list with probability ∝ exp(alpha·score) — the
    * SentencePiece l-best approximation of lattice sampling. `u` is
    * the caller's uniform draw in [0,1) (derive it deterministically,
    * e.g. from a doc id + word index hash, for reproducible epochs);
    * alpha → ∞ recovers Viterbi, alpha = 0 samples uniformly. */
  def sampleSegmentation(w: String, model: UnigramModel, k: Int,
      alpha: Double, u: Double): Array[String] = {
    require(alpha >= 0, s"alpha must be >= 0, got $alpha")
    require(u >= 0.0 && u < 1.0, s"u must be in [0,1), got $u")
    val paths = kbest(w, model, k)
    // subtract the max before exponentiating (standard softmax guard)
    val m = paths.iterator.map(_._1).max
    val ws = paths.map(p => math.exp(alpha * (p._1 - m)))
    val z = ws.sum
    var acc = 0.0
    var i = 0
    while (i < paths.length - 1) {
      acc += ws(i) / z
      if (u < acc) return paths(i)._2
      i += 1
    }
    paths(paths.length - 1)._2
  }

  /** Encode a words column (tokenize with
    * [[graft.functions.TextFunctions.words]] first) under a unigram
    * model: struct(n_pieces int, score double, toks string) — `toks`
    * renders each word's pieces space-joined and words joined by
    * " | " (the [[Bpe.encodeCol]] rendering), `score` is the summed
    * Viterbi log probability (integral-exact under an integer-cost
    * vocabulary — the d49 oracle contract). Native codegen'd map-side
    * expression, no shuffle. */
  def encodeCol(ws: Column, model: UnigramModel): Column =
    ExpressionUtils.column(UnigramEncodeExpr(
      ExpressionUtils.expression(ws), model))

  /** Per-doc n-best cost summary over a words column:
    * struct(total_best double, total_second double, n_single int) —
    * per word, the best and SECOND-best DISTINCT segmentation costs
    * (second falls back to best for single-segmentation words, which
    * n_single counts). Both ranks are tie-invariant numbers, so the
    * d51 enumeration oracle grades them exactly. The best-vs-second
    * margin is the lattice-flatness signal subword regularization
    * cares about: a flat lattice (small margin) yields diverse
    * samples. */
  def nbestCol(ws: Column, model: UnigramModel): Column =
    ExpressionUtils.column(UnigramNbestExpr(
      ExpressionUtils.expression(ws), model))

  /** Sampled encode (subword regularization): one [[sampleSegmentation]]
    * draw per word, the uniform derived from splitmix64(seed, word
    * index) — same seed ⇒ same segmentation, different seeds (e.g.
    * epoch numbers) ⇒ independent draws. Output schema matches
    * [[encodeCol]]. */
  def encodeSampledCol(ws: Column, seed: Column, model: UnigramModel,
      k: Int = 8, alpha: Double = 0.2): Column =
    ExpressionUtils.column(UnigramSampleExpr(
      ExpressionUtils.expression(ws),
      ExpressionUtils.expression(seed.cast("long")), model, k, alpha))

  /** Persist a trained model as ONE single-row parquet table —
    * tokenizers are train-once / use-everywhere, and a vocabulary that
    * lives only in a JVM dies with the session (the IvfPq save/load
    * argument). Overwrite-atomic at this size (one file). */
  def save(spark: org.apache.spark.sql.SparkSession, model: UnigramModel,
      path: String): Unit = {
    import spark.implicits._
    // swap-committed (r15, the index-meta rule): a re-train whose save
    // crashes must not destroy the standing production model
    MetaSwap.commit(Seq((model.pieces, model.logp, model.unkLogp))
      .toDF("pieces", "logp", "unk_logp"), path)
  }

  /** Reload a [[save]]d model — encode results are bit-identical to
    * the in-memory original (the spec asserts this: pieces, logps and
    * the unk floor round-trip exactly through parquet doubles). */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): UnigramModel = {
    // direct driver-side read (MetaIo, r19 — single-row artifact)
    val r = MetaIo.readHead(spark, MetaSwap.readDir(spark, path))
    UnigramModel(r.getSeq[String](0).toVector,
      r.getSeq[Double](1).toVector, r.getDouble(2))
  }

  // ——— byte fallback (GPT-2 / SentencePiece --byte_fallback) ———

  /** The byte piece for one byte value: `<0xAB>` (SentencePiece's
    * rendering). With the 256 byte pieces appended to a vocabulary,
    * EVERY UTF-8 input encodes into a CLOSED vocab — no <unk> token
    * ever reaches training data. */
  def bytePiece(b: Int): String = f"<0x${b & 0xff}%02X>"

  private def isBytePiece(p: String): Boolean =
    p.length == 6 && p.startsWith("<0x") && p.charAt(5) == '>' &&
      isHex(p.charAt(3)) && isHex(p.charAt(4))
  private def isHex(c: Char): Boolean =
    (c >= '0' && c <= '9') || (c >= 'A' && c <= 'F')

  /** [[viterbi]] pieces with byte fallback: each out-of-vocabulary
    * single character (the spans the plain encoder scores as <unk>)
    * expands into its UTF-8 `<0xXX>` byte pieces, so the output draws
    * only from model pieces ∪ the 256 byte pieces and ANY string
    * encodes losslessly ([[decodePieces]] inverts it — the spec's
    * round-trip contract). Scores are [[viterbi]]'s (the fallback
    * char still costs one unkLogp — byte expansion is a RENDERING of
    * the unk single, not a different lattice path).
    *
    * Collision contract: a vocabulary must not contain a literal
    * `<0xXX>` string as a piece (the model's [a-z0-9]+-word training
    * never produces one); [[decodePieces]] would decode it as a byte. */
  def viterbiBytes(w: String, model: UnigramModel): Array[String] =
    expandBytes(viterbi(w, model)._2, model)

  /** Expand each out-of-vocabulary piece (exactly the unk singles the
    * Viterbi emitted) into `<0xXX>` byte pieces — shared by
    * [[viterbiBytes]] and the encode expression's byteFallback mode.
    * MAXIMAL RUNS of adjacent OOV singles expand as one string: the
    * Viterbi DP walks UTF-16 chars, so an astral codepoint (emoji) is
    * TWO adjacent unk singles — encoding each lone surrogate alone
    * would mangle it to '?' bytes; rejoined, the pair UTF-8-encodes
    * correctly and the round-trip survives. */
  private[ops] def expandBytes(pieces: Array[String],
      model: UnigramModel): Array[String] = {
    var anyMiss = false
    var i = 0
    while (i < pieces.length && !anyMiss) {
      if (!model.table.containsKey(pieces(i))) anyMiss = true
      i += 1
    }
    if (!anyMiss) pieces // the common path: no allocation
    else {
      val out = new scala.collection.mutable.ArrayBuffer[String](pieces.length)
      val run = new java.lang.StringBuilder
      def flush(): Unit = {
        if (run.length() > 0) {
          run.toString.getBytes(StandardCharsets.UTF_8)
            .foreach(b => out += bytePiece(b.toInt))
          run.setLength(0)
        }
      }
      pieces.foreach { p =>
        if (model.table.containsKey(p)) { flush(); out += p }
        else run.append(p)
      }
      flush()
      out.toArray
    }
  }

  /** Inverse of [[viterbiBytes]]: model pieces concatenate as text,
    * `<0xXX>` pieces concatenate as raw bytes, the whole buffer decodes
    * as UTF-8 — arbitrary input round-trips encode→decode exactly. */
  def decodePieces(pieces: Seq[String]): String = {
    val bytes = new java.io.ByteArrayOutputStream(64)
    pieces.foreach { p =>
      if (isBytePiece(p))
        bytes.write(Integer.parseInt(p.substring(3, 5), 16))
      else bytes.write(p.getBytes(StandardCharsets.UTF_8))
    }
    new String(bytes.toByteArray, StandardCharsets.UTF_8)
  }

  /** [[encodeCol]] with byte fallback: same struct schema, `toks`
    * renders byte pieces inline — a closed-vocabulary encode whose
    * piece stream [[decodePieces]] can invert. */
  def encodeBytesCol(ws: Column, model: UnigramModel): Column =
    ExpressionUtils.column(UnigramEncodeExpr(
      ExpressionUtils.expression(ws), model, byteFallback = true))

  /** splitmix64 step → uniform double in [0,1) (the standard 53-bit
    * mantissa construction). ONE copy for every sampling consumer. */
  def splitmixUniform(seed: Long): Double = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble
  }
}

/** Viterbi unigram encode of a words array — see [[Unigram.encodeCol]].
  * One driver-trained model reference object; per-word DP with the
  * pinned (score, n_pieces, longest-last-piece) tie-break. */
final case class UnigramEncodeExpr(child: Expression, model: UnigramModel,
    byteFallback: Boolean = false) extends UnaryExpression {

  // loud at ANALYSIS, not a per-task cast failure (the BpeEncodeExpr
  // contract): raw text is the easy mistake — words() is required
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string> (tokenize with words() " +
            s"first), got ${dt.catalogString}")
    }

  override def dataType: DataType = UnigramEncodeExpr.schema
  override def prettyName: String = "unigram_encode"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnigramEncodeExpr.compute(input.asInstanceOf[ArrayData], model,
      byteFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigrammodel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.UnigramEncodeExpr.compute($c, $ref, $byteFallback)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramEncodeExpr =
    copy(child = newChild)
}

/** Per-doc (best, second-distinct) segmentation-cost sums — see
  * [[Unigram.nbestCol]]. */
final case class UnigramNbestExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects array<string> (tokenize with words() " +
            s"first), got ${dt.catalogString}")
    }

  override def dataType: DataType = UnigramNbestExpr.schema
  override def prettyName: String = "unigram_nbest"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnigramNbestExpr.compute(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigrammodel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.ops.UnigramNbestExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramNbestExpr =
    copy(child = newChild)
}

object UnigramNbestExpr {
  val schema: StructType = StructType(Seq(
    StructField("total_best", DoubleType, nullable = false),
    StructField("total_second", DoubleType, nullable = false),
    StructField("n_single", IntegerType, nullable = false)))

  def compute(arr: ArrayData, model: UnigramModel): InternalRow = {
    val nw = arr.numElements()
    var best = 0.0
    var second = 0.0
    var nSingle = 0
    var wi = 0
    while (wi < nw) {
      require(!arr.isNullAt(wi), s"unigram: null word at index $wi")
      val w = arr.getUTF8String(wi).toString
      val costs = Unigram.kbestDistinctCosts(w, model, 2)
      best += costs(0)
      if (costs.length >= 2) second += costs(1)
      else { second += costs(0); nSingle += 1 }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](best, second, nSingle))
  }
}

/** Sampled unigram encode — see [[Unigram.encodeSampledCol]]. */
final case class UnigramSampleExpr(left: Expression, right: Expression,
    model: UnigramModel, k: Int, alpha: Double)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(k >= 1, s"unigram_sample: k must be >= 1, got $k")
  // finite, not just >= 0: alpha splices into generated Java source
  // below, and "Infinity"/"NaN" are not valid literals (the
  // QualityClassifier codegen lesson — a huge finite alpha is the
  // Viterbi limit anyway)
  require(java.lang.Double.isFinite(alpha) && alpha >= 0,
    s"unigram_sample: alpha must be finite and >= 0, got $alpha")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (array<string>, bigint seed), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = UnigramEncodeExpr.schema
  override def prettyName: String = "unigram_sample"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(ws: Any, seed: Any): Any =
    UnigramSampleExpr.compute(ws.asInstanceOf[ArrayData],
      seed.asInstanceOf[Long], model, k, alpha)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigrammodel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, (c, s) =>
      s"graft.ops.UnigramSampleExpr.compute($c, $s, $ref, $k, $alpha)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UnigramSampleExpr =
    copy(left = newLeft, right = newRight)
}

object UnigramSampleExpr {
  def compute(arr: ArrayData, seed: Long, model: UnigramModel, k: Int,
      alpha: Double): InternalRow = {
    val nw = arr.numElements()
    val sb = new java.lang.StringBuilder
    var total = 0
    var score = 0.0
    var wi = 0
    while (wi < nw) {
      require(!arr.isNullAt(wi), s"unigram: null word at index $wi")
      val w = arr.getUTF8String(wi).toString
      // mix the word INDEX into the stream so identical words in one
      // doc draw independently; the seed keys the whole epoch
      val u = Unigram.splitmixUniform(seed * 0x100000001b3L + wi)
      val pieces = Unigram.sampleSegmentation(w, model, k, alpha, u)
      var s = 0.0
      var j = 0
      while (j < pieces.length) {
        val lp = model.table.get(pieces(j))
        s += (if (lp != null) lp.doubleValue() else model.unkLogp)
        j += 1
      }
      score += s
      total += pieces.length
      if (wi > 0) sb.append(" | ")
      j = 0
      while (j < pieces.length) {
        if (j > 0) sb.append(' ')
        sb.append(pieces(j))
        j += 1
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      total, score, org.apache.spark.unsafe.types.UTF8String.fromString(
        sb.toString)))
  }
}

object UnigramEncodeExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_pieces", IntegerType, nullable = false),
    StructField("score", DoubleType, nullable = false),
    StructField("toks", StringType, nullable = false)))

  def compute(arr: ArrayData, model: UnigramModel,
      byteFallback: Boolean): InternalRow = {
    val nw = arr.numElements()
    val sb = new java.lang.StringBuilder
    var total = 0
    var score = 0.0
    var wi = 0
    while (wi < nw) {
      require(!arr.isNullAt(wi), s"unigram: null word at index $wi")
      val w = arr.getUTF8String(wi).toString
      val (s, pieces0) = Unigram.viterbi(w, model)
      val pieces =
        if (byteFallback) Unigram.expandBytes(pieces0, model) else pieces0
      score += s
      total += pieces.length
      if (wi > 0) sb.append(" | ")
      var j = 0
      while (j < pieces.length) {
        if (j > 0) sb.append(' ')
        sb.append(pieces(j))
        j += 1
      }
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      total, score, org.apache.spark.unsafe.types.UTF8String.fromString(
        sb.toString)))
  }
}

/** All substrings of one word with UTF-16 lengths in [minLen, maxLen],
  * one array entry per OCCURRENCE — the distributed form of
  * [[Unigram]] seeding's per-position substring count (same loops, so
  * the two seeders count identically). Codegen'd: the seed pass runs
  * over the full distinct-word dict, the one table that can reach
  * billions of rows at corpus scale. */
final case class SubstringsExpr(child: Expression, minLen: Int, maxLen: Int)
    extends UnaryExpression {
  require(minLen >= 1 && maxLen >= minLen,
    s"substrings: need 1 <= minLen <= maxLen, got ($minLen, $maxLen)")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects string, got ${dt.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "substrings"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SubstringsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      minLen, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.SubstringsExpr.compute($c, $minLen, $maxLen)")

  override protected def withNewChildInternal(
      newChild: Expression): SubstringsExpr =
    copy(child = newChild)
}

object SubstringsExpr {
  def compute(w: org.apache.spark.unsafe.types.UTF8String,
      minLen: Int, maxLen: Int): ArrayData = {
    val s = w.toString
    val n = s.length
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var len = minLen
    while (len <= maxLen) {
      var i = 0
      while (i + len <= n) {
        out += org.apache.spark.unsafe.types.UTF8String.fromString(
          s.substring(i, i + len))
        i += 1
      }
      len += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}

/** Distributed E-step kernel: (word, count) → the word's expected
  * piece-count contributions `array<struct<p, m>>` under a broadcast
  * [[UnigramModel]], plus ONE sentinel row `("", count·log Z(w))`
  * carrying the word's corpus-log-likelihood term (the empty string
  * can never collide with a piece — pieces are nonempty substrings; the
  * trainMulti sentinel-bucket trick). One explode + per-piece sum turns
  * a whole E-step into a single Spark job whose collect is vocab-sized,
  * so [[Unigram.trainEmDistributed]] never materializes the dict on the
  * driver. Shares [[Unigram.emWord]] with the driver E-step — the float
  * math per word is identical; only the cross-word sum order differs. */
final case class UnigramEmExpr(left: Expression, right: Expression,
    model: UnigramModel)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects (string word, bigint count), got " +
            s"(${l.catalogString}, ${r.catalogString})")
    }

  override def dataType: DataType = UnigramEmExpr.schema
  override def prettyName: String = "unigram_em"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(w: Any, c: Any): Any =
    UnigramEmExpr.compute(
      w.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      c.asInstanceOf[Long], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigrammodel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, (w, c) =>
      s"graft.ops.UnigramEmExpr.compute($w, $c, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UnigramEmExpr =
    copy(left = newLeft, right = newRight)
}

object UnigramEmExpr {
  val schema: DataType = ArrayType(StructType(Seq(
    StructField("p", StringType, nullable = false),
    StructField("m", DoubleType, nullable = false))), containsNull = false)

  def compute(w: org.apache.spark.unsafe.types.UTF8String, c: Long,
      model: UnigramModel): ArrayData = {
    val (z, contrib) = Unigram.emWord(w.toString, c, model)
    val out = new Array[Any](contrib.length + 1)
    out(0) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](org.apache.spark.unsafe.types.UTF8String.EMPTY_UTF8, c * z))
    var k = 0
    while (k < contrib.length) {
      val (p, m) = contrib(k)
      out(k + 1) =
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](org.apache.spark.unsafe.types.UTF8String.fromString(p), m))
      k += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** Viterbi-best piece sequence of ONE dict word as an array column —
  * the distributed hard-EM count step ([[Unigram.trainDistributed]]):
  * explode + a per-piece LONG sum weighted by the word count turns a
  * whole hard-EM iteration into a single Spark job with an exact,
  * order-independent result. Shares [[Unigram.viterbi]] with the
  * driver trainer and the encode expression — one DP kernel. */
final case class UnigramViterbiPiecesExpr(child: Expression,
    model: UnigramModel) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a string word column, got ${dt.catalogString}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_viterbi_pieces"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnigramViterbiPiecesExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigrammodel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.UnigramViterbiPiecesExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): UnigramViterbiPiecesExpr =
    copy(child = newChild)
}

object UnigramViterbiPiecesExpr {
  def compute(w: org.apache.spark.unsafe.types.UTF8String,
      model: UnigramModel): ArrayData = {
    val (_, pieces) = Unigram.viterbi(w.toString, model)
    val out = new Array[Any](pieces.length)
    var i = 0
    while (i < pieces.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(pieces(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}
