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
