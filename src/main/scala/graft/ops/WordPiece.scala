package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftExprBridge => ExpressionUtils}

/** WordPiece vocabulary (Schuster & Nakajima 2012, "Japanese and
  * Korean voice search"; the BERT tokenizer of Devlin et al. 2019):
  * word-initial pieces plus "##"-prefixed continuation pieces. Unlike
  * BPE, where the learned MERGE ORDER is the encode algorithm, a
  * WordPiece encode depends only on this final piece set — greedy
  * longest-prefix-match — which is exactly what makes the encoder
  * replayable by a SQL oracle (gate d59).
  *
  * Driver-local value shipped to executors as a codegen reference
  * object (the [[UnigramModel]] pattern); case-class equality over the
  * Vector keeps structurally identical encode calls semanticEquals-
  * dedupable (the BpeEncodeExpr Seq-not-Array lesson). */
final case class WordPieceVocab(pieces: Vector[String]) {
  require(pieces.nonEmpty, "wordpiece vocab: empty")
  require(pieces.distinct.length == pieces.length,
    "wordpiece vocab: duplicate pieces")
  locally {
    var i = 0
    while (i < pieces.length) {
      val core = WordPiece.core(pieces(i))
      require(core.nonEmpty,
        s"wordpiece vocab: piece '${pieces(i)}' has an empty core")
      i += 1
    }
  }

  /** Longest CORE (piece minus the ## marker) — bounds the greedy
    * probe so encode is O(len · maxCore) per word, not O(len²). */
  val maxCore: Int = pieces.iterator.map(p => WordPiece.core(p).length).max

  /** Executor-side lookup set, built once per deserialized vocab. */
  @transient lazy val table: java.util.HashSet[String] = {
    val t = new java.util.HashSet[String](pieces.length * 2)
    pieces.foreach(t.add)
    t
  }
}

/** WordPiece tokenizer: greedy longest-match encode (native codegen'd
  * expression, pure map-side) and likelihood-scored training.
  *
  * TRAIN is the BPE merge loop under the WordPiece objective: merge
  * the adjacent pair maximizing `count(ab) / (count(a) · count(b))` —
  * the corpus-likelihood GAIN of fusing the pair under a unigram LM
  * over symbols (the HuggingFace-tokenizers WordPiece trainer score) —
  * instead of BPE's raw pair count, so cohesive rare pairs beat
  * frequent-but-independent ones. Same scale shape as [[Bpe.train]]:
  * ONE distributed word-count pass, then a driver loop over the
  * `maxWords`-capped dict (Zipf: the tail adds no pair mass).
  * Deterministic: score ties break to the lexicographically smallest
  * (left, right) pair; dict truncation orders by (count desc, word).
  *
  * ENCODE (per BERT): walk the word left to right; at each position
  * take the LONGEST vocab piece matching (continuation positions
  * probe with the "##" prefix); if no piece matches, the whole word
  * becomes one `[UNK]` token. Training seeds every word-initial char
  * and every "##"-continuation char of the dict, so [UNK] only fires
  * on characters the training corpus never saw.
  *
  * The encode contract is the final VOCAB SET (order-free) — gate d59
  * proves the greedy matcher against a DuckDB oracle under a fixed
  * demo vocabulary; training determinism and the likelihood-vs-count
  * objective are OpsSpec's job (the d33/d34 split: a static oracle
  * cannot contain a trained runtime value). */
object WordPiece {

  /** The unknown-word token (BERT's literal). */
  val Unk = "[UNK]"

  private[ops] def core(p: String): String =
    if (p.startsWith("##")) p.substring(2) else p

  /** Train a WordPiece vocabulary of (at most) `vocabSize` pieces.
    *
    * @param vocabSize    total pieces kept (char seeds always survive)
    * @param maxWords     dict cap collected to the driver
    * @param minPairCount stop when the best pair occurs fewer times
    */
  def train(docs: DataFrame, textCol: String = "text",
      vocabSize: Int = 1000, maxWords: Int = 50000,
      minPairCount: Long = 2L): WordPieceVocab = {
    require(vocabSize >= 1, s"vocabSize must be >= 1, got $vocabSize")
    val wc = docs
      .select(explode(graft.functions.TextFunctions.words(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    require(wc.nonEmpty, "wordpiece train: corpus has no words")

    // words as symbol sequences: first char plain, rest ##-continued
    var vocab: Array[(Array[String], Long)] = wc.map { case (w, c) =>
      (Array.tabulate(w.length)(i =>
        if (i == 0) String.valueOf(w.charAt(i))
        else "##" + w.charAt(i)), c)
    }
    val seeds = scala.collection.immutable.SortedSet.newBuilder[String]
    vocab.foreach { case (syms, _) => syms.foreach(seeds += _) }
    val pieces = scala.collection.mutable.LinkedHashSet.empty[String]
    seeds.result().foreach(pieces += _)

    var continue = true
    while (continue && pieces.size < vocabSize) {
      // one pass: symbol totals + adjacent-pair totals (both weighted
      // by word count) — the two terms of the likelihood score
      val symFreq = new java.util.HashMap[String, Long]()
      val pairFreq = new java.util.HashMap[(String, String), Long]()
      vocab.foreach { case (syms, c) =>
        var i = 0
        while (i < syms.length) {
          symFreq.merge(syms(i), c, (a, b) => a + b)
          if (i + 1 < syms.length)
            pairFreq.merge((syms(i), syms(i + 1)), c, (a, b) => a + b)
          i += 1
        }
      }
      // order-independent argmax over score = cnt(ab)/(cnt(a)·cnt(b)):
      // strictly-greater score wins, ties to the lexicographically
      // smallest pair (IEEE division is deterministic, so the score
      // comparison is too)
      var best: (String, String) = null
      var bestScore = 0.0
      var bestCount = 0L
      pairFreq.forEach { (p, f) =>
        val s = f.toDouble /
          (symFreq.get(p._1).toDouble * symFreq.get(p._2).toDouble)
        val better = s > bestScore || (s == bestScore && best != null &&
          (p._1 < best._1 || (p._1 == best._1 && p._2 < best._2)))
        if (better) { best = p; bestScore = s; bestCount = f }
      }
      if (best == null || bestCount < minPairCount) continue = false
      else {
        // merged symbol keeps the LEFT side's position marker: the
        // right side is by construction a continuation (##-prefixed).
        // Two different merge paths can re-derive the SAME string
        // (x + ##yz == xy + ##z): the set add no-ops and the round
        // does not grow the vocab — but every applied merge strictly
        // shrinks the total symbol count (the pair occurs by
        // construction), so the loop still terminates.
        pieces += (best._1 + core(best._2))
        vocab = vocab.map { case (syms, c) => (mergeOnce(syms, best), c) }
      }
    }
    WordPieceVocab(pieces.toVector)
  }

  /** One merge applied to a symbol sequence, left to right,
    * non-overlapping — [[Bpe.mergeOnce]] with the WordPiece concat
    * rule (the right symbol's ## marker folds away). */
  private[ops] def mergeOnce(syms: Array[String],
      m: (String, String)): Array[String] = {
    val out = new scala.collection.mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j + 1 < syms.length && syms(j) == m._1 && syms(j + 1) == m._2) {
        out += (m._1 + core(m._2)); j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Greedy longest-match segmentation of one word — the ONE kernel
    * shared by the encode expression and the specs. Returns the piece
    * sequence, or `Array(Unk)` when some position has no match. */
  def encodeWord(w: String, vocab: WordPieceVocab): Array[String] = {
    require(w.nonEmpty, "wordpiece encode: empty word")
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val n = w.length
    var pos = 0
    while (pos < n) {
      val prefix = if (pos == 0) "" else "##"
      var len = math.min(n - pos, vocab.maxCore)
      var found: String = null
      while (len >= 1 && found == null) {
        val cand = prefix + w.substring(pos, pos + len)
        if (vocab.table.contains(cand)) found = cand
        len -= 1
      }
      if (found == null) return Array(Unk)
      out += found
      pos += found.length - prefix.length
    }
    out.toArray
  }

  /** Encode a words column under a vocabulary:
    * struct(n_wp int, toks string) where `toks` renders each word's
    * pieces space-joined and words joined by " | " (the BpeEncodeExpr
    * rendering the d59 oracle reproduces). Native codegen'd, pure
    * map-side; the vocab ships as a reference object. */
  def encodeCol(ws: Column, vocab: WordPieceVocab): Column =
    ExpressionUtils.column(WordPieceEncodeExpr(
      ExpressionUtils.expression(ws), vocab))

  /** [[encodeWord]] with byte fallback (the Unigram.viterbiBytes
    * twin, VERDICT r16 #7): a word the greedy matcher cannot segment
    * — BERT's whole-word [UNK] — expands into its UTF-8 `<0xXX>`
    * byte pieces instead ([[Unigram.bytePiece]]'s rendering), so the
    * output draws only from vocab ∪ the 256 byte pieces and
    * [[Unigram.decodePieces]] inverts it losslessly. The fallback
    * granularity is the WORD — exactly the unit BERT's [UNK]
    * collapses — never per character of a word the vocab can
    * partially cover, so plain-encode and byte-encode agree on every
    * word that segments. (A literal "[UNK]" input word under a vocab
    * containing the 5-char piece "[UNK]" byte-expands too — content
    * the decode still round-trips exactly.) */
  def encodeWordBytes(w: String, vocab: WordPieceVocab): Array[String] = {
    val ps = encodeWord(w, vocab)
    if (ps.length == 1 && ps(0) == Unk)
      w.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        .map(b => Unigram.bytePiece(b.toInt))
    else ps
  }

  /** [[encodeCol]] with byte fallback: same struct schema, `toks`
    * renders `<0xXX>` pieces inline for unsegmentable words — a
    * closed-vocabulary encode, no [UNK] ever reaches training data.
    * The BERT-contract [[encodeCol]] (and gate d59 over it) is
    * untouched. */
  def encodeBytesCol(ws: Column, vocab: WordPieceVocab): Column =
    ExpressionUtils.column(WordPieceEncodeExpr(
      ExpressionUtils.expression(ws), vocab, byteFallback = true))

  /** Persist a vocabulary (swap-committed like every trained-model
    * save — see MetaSwap). The ordinal column preserves insertion
    * order for inspection; the encode contract itself is order-free. */
  def saveVocab(spark: org.apache.spark.sql.SparkSession,
      vocab: WordPieceVocab, path: String): Unit = {
    import spark.implicits._
    MetaSwap.commit(
      vocab.pieces.zipWithIndex.map { case (p, i) => (i, p) }
        .toDF("ord", "piece"), path)
  }

  /** Reload a [[saveVocab]]d vocabulary in saved order. */
  def loadVocab(spark: org.apache.spark.sql.SparkSession,
      path: String): WordPieceVocab = {
    // direct driver-side read (MetaIo, r19); saved order restored by
    // the ord column, exactly as the orderBy it replaces
    val (_, rows) = MetaIo.readRows(spark, MetaSwap.readDir(spark, path))
    WordPieceVocab(rows.sortBy(_.getAs[Int]("ord"))
      .map(_.getAs[String]("piece")).toVector)
  }
}

/** Greedy longest-match WordPiece encode of a words array — see
  * [[WordPiece.encodeCol]]. */
final case class WordPieceEncodeExpr(child: Expression,
    vocab: WordPieceVocab,
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

  override def dataType: DataType = WordPieceEncodeExpr.schema
  override def prettyName: String = "wordpiece_encode"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    WordPieceEncodeExpr.compute(input.asInstanceOf[ArrayData], vocab,
      byteFallback)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wpvocab", vocab,
      classOf[WordPieceVocab].getName)
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.WordPieceEncodeExpr.compute($c, $ref, $byteFallback)")
  }

  override protected def withNewChildInternal(
      newChild: Expression): WordPieceEncodeExpr =
    copy(child = newChild)
}

object WordPieceEncodeExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_wp", IntegerType, nullable = false),
    StructField("toks", StringType, nullable = false)))

  def compute(arr: ArrayData, vocab: WordPieceVocab,
      byteFallback: Boolean = false): InternalRow = {
    val nw = arr.numElements()
    val sb = new java.lang.StringBuilder
    var total = 0
    var wi = 0
    while (wi < nw) {
      require(!arr.isNullAt(wi), s"wordpiece: null word at index $wi")
      val word = arr.getUTF8String(wi).toString
      val pieces =
        if (byteFallback) WordPiece.encodeWordBytes(word, vocab)
        else WordPiece.encodeWord(word, vocab)
      if (wi > 0) sb.append(" | ")
      var j = 0
      while (j < pieces.length) {
        if (j > 0) sb.append(' ')
        sb.append(pieces(j))
        j += 1
      }
      total += pieces.length
      wi += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      total, org.apache.spark.unsafe.types.UTF8String.fromString(
        sb.toString)))
  }
}
