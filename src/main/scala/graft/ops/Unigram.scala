package graft.ops

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
  * affects the one count pass. This is deliberately hard-EM (each
  * word's counts come from its single Viterbi-best segmentation)
  * rather than Kudo's full forward-backward EM with
  * likelihood-loss pruning: counts stay exact integers (deterministic
  * across runs and platforms) and the spec proves the properties that
  * matter — coverage, convergence of frequent substrings into pieces,
  * and compression over the character baseline.
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
    val wc = docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(wc.nonEmpty, "unigram train: corpus has no words")

    // singles: the coverage floor — every character of every dict word
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

    // seed: every substring of length 2..maxPieceLen, occurrence-counted
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
    var multi: Vector[(String, Long)] = {
      val arr = new scala.collection.mutable.ArrayBuffer[(String, Long)](sub.size)
      sub.forEach((p, c) => if (c >= minCount) { arr += ((p, c)); () })
      arr.sortBy { case (p, c) => (-c, p) }.take(seedSize).toVector
    }

    def normalize(counts: Map[String, Long]): UnigramModel = {
      // sorted iteration order pins the float total (determinism)
      val ordered = counts.toVector.sortBy(_._1)
      val total = ordered.iterator.map(_._2).sum.toDouble
      val lp = ordered.map { case (_, c) => math.log(c / total) }
      UnigramModel(ordered.map(_._1), lp,
        unkLogp = math.log(0.5 / total))
    }

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
    Seq((model.pieces, model.logp, model.unkLogp))
      .toDF("pieces", "logp", "unk_logp")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Reload a [[save]]d model — encode results are bit-identical to
    * the in-memory original (the spec asserts this: pieces, logps and
    * the unk floor round-trip exactly through parquet doubles). */
  def load(spark: org.apache.spark.sql.SparkSession,
      path: String): UnigramModel = {
    val r = spark.read.parquet(path).head()
    UnigramModel(r.getSeq[String](0).toVector,
      r.getSeq[Double](1).toVector, r.getDouble(2))
  }

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
final case class UnigramEncodeExpr(child: Expression, model: UnigramModel)
    extends UnaryExpression {

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
    UnigramEncodeExpr.compute(input.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigrammodel", model,
      classOf[UnigramModel].getName)
    defineCodeGen(ctx, ev, c => s"graft.ops.UnigramEncodeExpr.compute($c, $ref)")
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

  def compute(arr: ArrayData, model: UnigramModel): InternalRow = {
    val nw = arr.numElements()
    val sb = new java.lang.StringBuilder
    var total = 0
    var score = 0.0
    var wi = 0
    while (wi < nw) {
      require(!arr.isNullAt(wi), s"unigram: null word at index $wi")
      val w = arr.getUTF8String(wi).toString
      val (s, pieces) = Unigram.viterbi(w, model)
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
