package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.{GraftExprBridge => ExpressionUtils}
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the hot sketching loops.
  *
  * The builtin-composed forms (`transform(sequence(0,k-1), i ->
  * array_min(transform(sh, s -> xxhash64(s, i))))`) are higher-order
  * functions, which Spark evaluates interpreted (CodegenFallback) with
  * per-element boxing, and they re-hash every shingle string k times.
  * These expressions hash each element ONCE (XXH64 over the UTF8
  * bytes), then derive the k signature slots with cheap long-mixing in
  * a tight compiled loop — ~100× less work per row, no boxing.
  */
/** Analysis-time input type guard for the registered SQL surface
  * (review r9): a wrong argument type used to surface as a per-task
  * executor ClassCastException (after a codegen compile failure and
  * interpreted fallback), not as an analysis error naming the
  * function. */
private[functions] trait TypedChild { self: UnaryExpression =>
  protected def childTypeOk(dt: DataType): Boolean
  protected def childTypeWanted: String
  override def checkInputDataTypes(): TypeCheckResult =
    if (childTypeOk(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects $childTypeWanted, got ${child.dataType.catalogString}")
}

private[functions] object TypedChild {
  def stringArray(dt: DataType): Boolean = dt match {
    case ArrayType(StringType, _) => true
    case _ => false
  }
  def doubleArray(dt: DataType): Boolean = dt match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }
}

/** Shared hot-loop helpers (review r11): the Charikar vote loops, the
  * sort+dedup canonicalization, and the HALF_UP rounding each existed
  * as 2-3 hand-synced textual copies — the cross-expression equality
  * the oracles depend on was enforced only by keeping them
  * character-identical. One body each now. */
private[functions] object ExprUtil {
  /** Loud guard against null ARRAY ELEMENTS (review r11): the unsafe
    * readers unbox them to 0 SILENTLY — a null embedding slot would
    * hash/score as a plausible value — and the string paths NPE with
    * no context. */
  def noNulls(arr: ArrayData, name: String): ArrayData = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i))
        throw new IllegalArgumentException(
          s"$name: null array element at index $i - clean upstream")
      i += 1
    }
    arr
  }

  /** Charikar ±1 vote accumulate of one 64-bit hash. */
  def addVotes(votes: Array[Int], h: Long): Unit = {
    var b = 0
    while (b < 64) {
      if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
      b += 1
    }
  }

  /** Vote collapse: bit b set when votes(b) > 0 (ties → 0). */
  def collapse(votes: Array[Int]): Long = {
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Sort + dedup in place (canonical distinct set, no boxing). */
  def sortedDistinct(a: Array[Long]): Array[Long] = {
    val n = a.length
    if (n == 0) return a
    java.util.Arrays.sort(a)
    var w = 1
    var i = 1
    while (i < n) {
      if (a(i) != a(i - 1)) { a(w) = a(i); w += 1 }
      i += 1
    }
    if (w == n) a else java.util.Arrays.copyOf(a, w)
  }

  /** HALF_UP at 4 decimals over the EXACT binary expansion — NOT the
    * same as Spark's round(), which rounds the shortest decimal
    * rendering (TextFunctions.qualityFeatures' r9 note). */
  def r4(x: Double): Double =
    new java.math.BigDecimal(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  val wordRe: java.util.regex.Pattern =
    java.util.regex.Pattern.compile("[a-z0-9]+")
}

final case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt match {
    case ArrayType(StringType | LongType, _) => true
    case _ => false
  }
  protected def childTypeWanted: String = "array<string> or array<bigint>"
  // review r9: SQL-supplied bad literals previously crashed executors
  // (new Array[Long](-1)) instead of failing at construction
  require(k >= 1, s"minhash_sig: k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"
  override def nullIntolerant: Boolean = true

  private def onLongs: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    UnsafeArrayData.fromPrimitiveArray(
      if (onLongs) MinHashSig.computeLongs(arr, k)
      else MinHashSig.computeStrings(arr, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = if (onLongs) "computeLongs" else "computeStrings"
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.MinHashSig.$m($c, $k))")
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  /** Tight loops shared by eval and codegen: hashed shingles
    * (array<long>, the fast path fed by [[ShingleHashes]]) or raw
    * strings (hashed here first). */
  def computeLongs(arr: ArrayData, k: Int): Array[Long] =
    minima(ExprUtil.noNulls(arr, "minhash_sig").toLongArray(), k)

  def computeStrings(arr: ArrayData, k: Int): Array[Long] = {
    ExprUtil.noNulls(arr, "minhash_sig")
    val n = arr.numElements()
    val base = new Array[Long](n)
    var i = 0
    while (i < n) {
      base(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    minima(base, k)
  }

  private def minima(base: Array[Long], k: Int): Array[Long] = {
    val n = base.length
    // an empty set would leave every slot Long.MaxValue: via the raw
    // SQL surface all shingle-less docs then share ONE signature and
    // band-collide pairwise (review r11) — the library path filters
    // empties (Dedup.shingleSets); enforce it where the value is made
    require(n > 0,
      "minhash_sig: empty input set - filter size(...) > 0 upstream")
    val sig = new Array[Long](k)
    var j = 0
    while (j < k) {
      var m = Long.MaxValue
      var t = 0
      while (t < n) {
        val h = XXH64.hashLong(base(t), j)
        if (h < m) m = h
        t += 1
      }
      sig(j) = m
      j += 1
    }
    sig
  }
}

/** Distinct hashed word n-gram shingles: array<string> words →
  * array<long> of the distinct 64-bit shingle hashes (each shingle's
  * word hashes chained through XXH64). Dedup/minhash/Jaccard only ever
  * consume shingle identity, so hashing instead of materializing
  * `"w1 w2 w3"` strings removes the per-shingle string allocation and
  * the interpreted concat loop (collision odds at 64 bits are
  * negligible for any real corpus). Output is sorted ascending —
  * a canonical set encoding. */
final case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = TypedChild.stringArray(dt)
  protected def childTypeWanted: String = "array<string>"
  // review r9: n = 0 read past the word-hash array on every executor
  // row instead of failing at construction like WinnowHashes
  require(n >= 1, s"shingle_hashes: n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      ShingleHashes.compute(input.asInstanceOf[ArrayData], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.ShingleHashes.compute($c, $n))")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

object ShingleHashes {
  def compute(arr: ArrayData, n: Int): Array[Long] = {
    ExprUtil.noNulls(arr, "shingle_hashes")
    val words = arr.numElements()
    val nShingles = words - n + 1
    if (nShingles <= 0) return Array.emptyLongArray
    val wh = new Array[Long](words)
    var i = 0
    while (i < words) {
      wh(i) = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      i += 1
    }
    val out = new Array[Long](nShingles)
    i = 0
    while (i < nShingles) {
      var h = wh(i)
      var j = 1
      while (j < n) {
        h = XXH64.hashLong(wh(i + j), h)
        j += 1
      }
      out(i) = h
      i += 1
    }
    ExprUtil.sortedDistinct(out)
  }
}

/** 64-bit SimHash over a string array (Charikar): bit b of the result
  * is set when the sum over elements of ±1 votes (bit b of the
  * element's hash) is positive. Duplicates are weighted, matching the
  * builtin-composed form it replaces. */
final case class SimHash64Expr(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = TypedChild.stringArray(dt)
  protected def childTypeWanted: String = "array<string>"

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHash64Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  def compute(arr: ArrayData): Long = {
    ExprUtil.noNulls(arr, "simhash64")
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      ExprUtil.addVotes(votes, XXH64.hashUTF8String(arr.getUTF8String(i), 42L))
      i += 1
    }
    ExprUtil.collapse(votes)
  }
}

/** Byte-level SimHash over a binary payload: each aligned 4-byte
  * chunk (big-endian) is XXH64-hashed DIRECTLY and votes on the 64
  * output bits — no hex rendering, no per-chunk string (the composed
  * hex+regexp form allocates a 2x-payload hex string plus one String
  * per chunk per row). Trailing partial chunks are dropped, matching
  * the hex form's [0-9A-F]{8} regex behavior. Voting is identical to
  * [[SimHash64Expr]], so pair generation composes unchanged. */
final case class ByteSimhash64Expr(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt == BinaryType
  protected def childTypeWanted: String = "binary"

  override def dataType: DataType = LongType
  override def prettyName: String = "byte_simhash64"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ByteSimhash64Expr.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ByteSimhash64Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): ByteSimhash64Expr =
    copy(child = newChild)
}

object ByteSimhash64Expr {
  def compute(bytes: Array[Byte]): Long = {
    val votes = new Array[Int](64)
    val nChunks = bytes.length / 4
    var i = 0
    while (i < nChunks) {
      val o = i * 4
      val v = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
        ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
      ExprUtil.addVotes(votes, XXH64.hashInt(v, 42L))
      i += 1
    }
    ExprUtil.collapse(votes)
  }
}

/** Dot product of two double arrays in a tight compiled loop —
  * replaces `aggregate(zip_with(a, b, *), 0.0, +)`, which allocates a
  * zipped array and folds it interpreted per row. Sequential summation
  * order matches the builtin fold (and DuckDB's list_sum), so results
  * are bit-identical to the oracle. */
final case class VecDot(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (TypedChild.doubleArray(left.dataType) &&
        TypedChild.doubleArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecDot.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecDot = copy(left = newLeft, right = newRight)
}

object VecDot {
  def compute(a: ArrayData, b: ArrayData): Double = {
    // mismatched dims are a data bug, not a shorter sum: silent
    // truncation returned a plausible partial dot and masked it
    // (VecSub already errors; the composed zip_with form nulls)
    require(a.numElements() == b.numElements(),
      s"vec_dot: length mismatch ${a.numElements()} vs ${b.numElements()}")
    ExprUtil.noNulls(a, "vec_dot")
    ExprUtil.noNulls(b, "vec_dot")
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    acc
  }
}

/** SimHash over md5 word hashes (first 8 bytes of md5(word) as the
  * 64-bit hash, big-endian). Same Charikar voting as [[SimHash64Expr]]
  * but the word hash is reproducible in any engine with an md5
  * builtin, so the full fingerprint computation can be DuckDB-oracle
  * checked. XXH64 ([[SimHash64Expr]]) stays the production scale path
  * (~6× cheaper per word); this variant exists to prove the logic. */
final case class SimHashMd5Expr(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = TypedChild.stringArray(dt)
  protected def childTypeWanted: String = "array<string>"

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimHashMd5Expr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHashMd5Expr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)
}

object SimHashMd5Expr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(arr: ArrayData): Long = {
    ExprUtil.noNulls(arr, "simhash_md5")
    val votes = new Array[Int](64)
    val n = arr.numElements()
    val md = digest.get()
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 8 md5 bytes, big-endian — matches ('0x' || substr(md5(w),1,16))::UBIGINT
      var h = 0L
      var k = 0
      while (k < 8) { h = (h << 8) | (d(k) & 0xffL); k += 1 }
      ExprUtil.addVotes(votes, h)
      i += 1
    }
    ExprUtil.collapse(votes)
  }
}

/** Sign-LSH signature: array<double> vector → long whose low `bits`
  * bits are the signs of dot products against pseudo-random hyperplanes
  * (random-hyperplane LSH, Charikar). Hyperplane component (bit, dim)
  * is derived from XXH64 so the signature is deterministic across JVMs
  * and partitionings. Replaces a transform/zip_with/aggregate
  * composition that Spark evaluates interpreted with per-element
  * boxing — this is the hot per-row loop of embedding near-dup. */
final case class HyperplaneSig(child: Expression, bits: Int)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = TypedChild.doubleArray(dt)
  protected def childTypeWanted: String = "array<double>"
  require(bits >= 1 && bits <= 64, s"bits must be in [1,64], got $bits")

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneSig.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  private final val Inv = 1.0 / Long.MaxValue.toDouble

  // row-invariant hyperplane components memoized per (bits, dims)
  // (review r11: recomputing XXH64.hashLong(j, b)·Inv per ROW did
  // bits×dims redundant hash calls in the hot loop — ~49k per row at
  // 768 dims × 64 bits). Same hash, same scaling: bit-identical sigs.
  private val comps =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()
  private def components(bits: Int, n: Int): Array[Double] =
    comps.computeIfAbsent((bits, n), key => {
      val (bt, nn) = key
      val m = new Array[Double](bt * nn)
      var b = 0
      while (b < bt) {
        var j = 0
        while (j < nn) {
          // deterministic pseudo-random component in [-1, 1]
          m(b * nn + j) = XXH64.hashLong(j.toLong, b.toLong) * Inv
          j += 1
        }
        b += 1
      }
      m
    })

  def compute(vec: ArrayData, bits: Int): Long = {
    ExprUtil.noNulls(vec, "hyperplane_sig")
    val n = vec.numElements()
    val m = components(bits, n)
    var sig = 0L
    var b = 0
    while (b < bits) {
      var acc = 0.0
      var j = 0
      val off = b * n
      while (j < n) {
        acc += vec.getDouble(j) * m(off + j)
        j += 1
      }
      if (acc > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }
}

/** Binary-quantization signature: array<double> vector (dim <= 64) →
  * long whose bit j is `vec[j] > 0` — the 1-bit-per-dimension code of
  * the modern BQ family (sign quantization + hamming shortlist +
  * exact rerank; RaBitQ-style rescoring without the rotation). At
  * 100 TB the point is the SCAN: 8 bytes per vector instead of
  * 64 floats (32×), and the distance is one xor + popcount. Strict
  * `> 0` so a zero component codes 0 on every engine — the rule the
  * e20 oracle replays verbatim. */
final case class SignBitsExpr(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = TypedChild.doubleArray(dt)
  protected def childTypeWanted: String = "array<double>"

  override def dataType: DataType = LongType
  override def prettyName: String = "sign_bits"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SignBitsExpr.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SignBitsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SignBitsExpr =
    copy(child = newChild)
}

object SignBitsExpr {
  def compute(vec: ArrayData): Long = {
    ExprUtil.noNulls(vec, "sign_bits")
    val n = vec.numElements()
    require(n <= 64,
      s"sign_bits packs one long: dim must be <= 64, got $n " +
        "(slice or project the vector first)")
    var sig = 0L
    var j = 0
    while (j < n) {
      if (vec.getDouble(j) > 0) sig |= (1L << j)
      j += 1
    }
    sig
  }
}

/** All per-document text features in ONE tokenization pass:
  * struct(n_chars, n_words, avg_word_len, stopword_ratio, punct_ratio,
  * lang). The builtin-composed forms re-ran `regexp_extract_all(lower
  * (text))` once per reference — the d10 physical plan expanded it 30+
  * times per row, each an interpreted higher-order `filter` — and
  * CodegenFallback defeats common-subexpression elimination. This
  * expression is codegen'd, so WSCG's CSE computes it once per row per
  * stage regardless of how many struct fields are referenced.
  *
  * Semantics mirror the composed forms (same regexes, marker lists)
  * so the DuckDB oracles are unchanged for the corpora's ASCII text —
  * with two DOCUMENTED divergences (review r11): rounding is HALF_UP
  * over the exact binary expansion where Spark's round() rounds the
  * shortest decimal rendering (boundary ...5 ratios can differ in the
  * 4th decimal; see TextFunctions.qualityFeatures' r9 note), and
  * lowercasing is Locale.ROOT where Spark's lower() falls back to the
  * JVM default locale for non-ASCII strings (tr/az JVMs map I→ı). */
final case class TextFeaturesExpr(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt == StringType
  protected def childTypeWanted: String = "string"

  override def dataType: DataType = TextFeaturesExpr.schema
  override def prettyName: String = "text_features"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextFeaturesExpr.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextFeaturesExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TextFeaturesExpr =
    copy(child = newChild)
}

object TextFeaturesExpr {
  import org.apache.spark.unsafe.types.UTF8String

  val schema: StructType = StructType(Seq(
    StructField("n_chars", IntegerType, nullable = false),
    StructField("n_words", IntegerType, nullable = false),
    StructField("avg_word_len", DoubleType, nullable = false),
    StructField("stopword_ratio", DoubleType, nullable = false),
    StructField("punct_ratio", DoubleType, nullable = false),
    StructField("lang", StringType, nullable = false)))

  /** Canonical marker/stopword lists — the single source of truth also
    * used by the composed TextFunctions forms and the DuckDB oracles. */
  val stopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "it", "for", "on")
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is"),
    "de" -> Seq("der", "die", "und", "das", "ein", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "des", "une"),
    "es" -> Seq("el", "los", "las", "y", "una", "que"))

  private val stopSet = stopwords.toSet
  private val markerSets = langMarkers.map { case (l, m) => (l, m.toSet) }.toArray

  private val wordRe = ExprUtil.wordRe

  private def r4(x: Double): Double = ExprUtil.r4(x)

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    val nChars = s.codePointCount(0, s.length)
    // punct = CODE POINTS outside [a-zA-Z0-9\s] (same classes as the
    // regexp_replace form: java \s is ASCII whitespace). Iterate by
    // code point, not UTF-16 unit — charAt would count both halves of
    // a surrogate pair and let punct_ratio exceed 1.0 on non-BMP text
    // while n_chars counts the pair once.
    var punct = 0
    var ci = 0
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      val alnum = (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
        (cp >= '0' && cp <= '9')
      val ws = cp == ' ' || cp == '\t' || cp == '\n' || cp == '\u000B' ||
        cp == '\f' || cp == '\r'
      if (!alnum && !ws) punct += 1
      ci += Character.charCount(cp)
    }
    val m = wordRe.matcher(s.toLowerCase(java.util.Locale.ROOT))
    var nWords = 0
    var wordChars = 0L
    var stopHits = 0
    val scores = new Array[Int](markerSets.length)
    while (m.find()) {
      val w = m.group()
      nWords += 1
      wordChars += w.length
      if (stopSet.contains(w)) stopHits += 1
      var li = 0
      while (li < markerSets.length) {
        if (markerSets(li)._2.contains(w)) scores(li) += 1
        li += 1
      }
    }
    var best = 0
    var li = 0
    while (li < scores.length) { if (scores(li) > best) best = scores(li); li += 1 }
    var lang = "und"
    li = 0
    while (li < scores.length && lang == "und") {
      if (scores(li) > 0 && scores(li) == best) lang = markerSets(li)._1
      li += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nChars,
      nWords,
      if (nWords > 0) r4(wordChars.toDouble / nWords) else 0.0,
      if (nWords > 0) r4(stopHits.toDouble / nWords) else 0.0,
      if (nChars > 0) r4(punct.toDouble / nChars) else 0.0,
      UTF8String.fromString(lang)))
  }
}

/** Winnowed rolling-hash document fingerprints (Schleimer/Wilkerson/
  * Aiken 2003, the MOSS scheme): character k-gram Rabin hashes
  * (Horner base 31, mod 2^20 — small enough that a SQL oracle can
  * reproduce every value exactly), then each window of `w` consecutive
  * hashes contributes its minimum. Output: sorted distinct selected
  * hashes — a compact position-independent sketch with the winnowing
  * guarantee (any shared substring of length >= k + w - 1 yields at
  * least one shared fingerprint). Feed it NORMALIZED text (lowercase,
  * punctuation collapsed) so the alphabet stays ASCII and engines
  * agree on character codes. */
final case class WinnowHashes(child: Expression, k: Int, w: Int)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt == StringType
  protected def childTypeWanted: String = "string"
  require(k >= 1 && w >= 1, "winnow_hashes: k and w must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_hashes"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(WinnowHashes.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, w))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.WinnowHashes.compute($c, $k, $w))")

  override protected def withNewChildInternal(newChild: Expression): WinnowHashes =
    copy(child = newChild)
}

object WinnowHashes {
  private val Mod = 1048576L // 2^20

  def compute(s: org.apache.spark.unsafe.types.UTF8String, k: Int, w: Int): Array[Long] = {
    val str = s.toString
    val n = str.length
    val nk = n - k + 1
    if (nk <= 0) return Array.emptyLongArray
    // per-position Horner (k is small; O(n·k) beats maintaining the
    // rolling subtraction term and matches the oracle's list_reduce)
    val hashes = new Array[Long](nk)
    var i = 0
    while (i < nk) {
      var h = 0L
      var j = 0
      while (j < k) {
        h = (h * 31 + str.charAt(i + j)) % Mod
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    val nw = nk - w + 1
    if (nw <= 0) return Array.emptyLongArray
    val sel = new Array[Long](nw)
    i = 0
    while (i < nw) {
      var m = Long.MaxValue
      var j = 0
      while (j < w) {
        if (hashes(i + j) < m) m = hashes(i + j)
        j += 1
      }
      sel(i) = m
      i += 1
    }
    ExprUtil.sortedDistinct(sel)
  }
}

/** Unit-L2-normalize a double array (zero vectors pass through
  * unchanged). Native so normalize-then-encode pipelines stay inside
  * whole-stage codegen — the `transform(v, x -> x / nrm)` HOF form is
  * interpreted with per-element boxing. */
final case class VecUnit(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = TypedChild.doubleArray(dt)
  protected def childTypeWanted: String = "array<double>"

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_unit"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      VecUnit.compute(input.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.VecUnit.compute($c))")

  override protected def withNewChildInternal(newChild: Expression): VecUnit =
    copy(child = newChild)
}

object VecUnit {
  def compute(a: ArrayData): Array[Double] = {
    ExprUtil.noNulls(a, "vec_unit")
    val n = a.numElements()
    val v = new Array[Double](n)
    var ss = 0.0
    var i = 0
    while (i < n) { val x = a.getDouble(i); v(i) = x; ss += x * x; i += 1 }
    if (ss > 0.0) {
      val inv = 1.0 / math.sqrt(ss)
      i = 0
      while (i < n) { v(i) *= inv; i += 1 }
    }
    v
  }
}

/** Element-wise difference of two equal-length double arrays (residual
  * computation for IVF-PQ: r = x - centroid(cell(x))). */
final case class VecSub(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (TypedChild.doubleArray(left.dataType) &&
        TypedChild.doubleArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two array<double> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "vec_sub"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(VecSub.compute(
      a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData" +
        s".fromPrimitiveArray(graft.functions.VecSub.compute($a, $b))")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): VecSub = copy(left = newLeft, right = newRight)
}

object VecSub {
  def compute(a: ArrayData, b: ArrayData): Array[Double] = {
    ExprUtil.noNulls(a, "vec_sub")
    ExprUtil.noNulls(b, "vec_sub")
    val n = a.numElements()
    require(b.numElements() == n,
      s"vec_sub: length mismatch ${n} vs ${b.numElements()}")
    val out = new Array[Double](n)
    var i = 0
    while (i < n) { out(i) = a.getDouble(i) - b.getDouble(i); i += 1 }
    out
  }
}

/** Per-document repetition statistics (the Gopher/MassiveText repetition
  * rules — Rae et al. 2021 §A1.1 — in their token-count form): documents
  * dominated by a few repeated n-grams are boilerplate/spam and score
  * high here. One tokenization pass per row, counts in per-row hash
  * maps bounded by document length; no shuffle, no explode — the
  * composed `explode(ngrams) → groupBy(doc_id)` shape would shuffle
  * every token of a 100 TB corpus just to count within-document.
  *
  * Fields: `n_words`; `distinct_word_ratio` = |types|/|tokens|;
  * `top_2gram_frac` = occurrences of the most frequent word 2-gram /
  * total 2-grams; `dup_3gram_frac` = fraction of 3-gram tokens whose
  * gram occurs more than once. Tokenization and rounding match
  * [[TextFeaturesExpr]] (lowercase `[a-z0-9]+`, HALF_UP to 4 dp) so a
  * SQL oracle reproduces every value exactly. */
final case class RepetitionStatsExpr(child: Expression)
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt == StringType
  protected def childTypeWanted: String = "string"

  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "repetition_stats"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    RepetitionStatsExpr.compute(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.RepetitionStatsExpr.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

object RepetitionStatsExpr {
  import org.apache.spark.unsafe.types.UTF8String

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("distinct_word_ratio", DoubleType, nullable = false),
    StructField("top_2gram_frac", DoubleType, nullable = false),
    StructField("dup_3gram_frac", DoubleType, nullable = false)))

  private val wordRe = ExprUtil.wordRe

  private def r4(x: Double): Double = ExprUtil.r4(x)

  def compute(text: UTF8String): InternalRow = {
    val m = wordRe.matcher(text.toString.toLowerCase(java.util.Locale.ROOT))
    val words = new java.util.ArrayList[String]()
    while (m.find()) words.add(m.group())
    val n = words.size
    val types = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { types.add(words.get(i)); i += 1 }
    // n-gram counts; grams keyed by space-joined words (the tokenizer
    // never emits spaces, so the join is collision-free)
    val g2 = new java.util.HashMap[String, Int]()
    i = 0
    while (i < n - 1) {
      g2.merge(words.get(i) + " " + words.get(i + 1), 1, Integer.sum)
      i += 1
    }
    var top2 = 0
    val it2 = g2.values().iterator()
    while (it2.hasNext) { val c = it2.next(); if (c > top2) top2 = c }
    val g3 = new java.util.HashMap[String, Int]()
    i = 0
    while (i < n - 2) {
      g3.merge(words.get(i) + " " + words.get(i + 1) + " " + words.get(i + 2), 1, Integer.sum)
      i += 1
    }
    var dup3 = 0
    val it3 = g3.values().iterator()
    while (it3.hasNext) { val c = it3.next(); if (c > 1) dup3 += c }
    val n2 = n - 1
    val n3 = n - 2
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n,
      if (n > 0) r4(types.size.toDouble / n) else 0.0,
      if (n2 > 0) r4(top2.toDouble / n2) else 0.0,
      if (n3 > 0) r4(dup3.toDouble / n3) else 0.0))
  }
}

/** Byte-level content statistics for opaque binary (media) payloads:
  * total size, distinct-byte diversity over a leading `sampleBytes`
  * window (compression/corruption heuristic — encrypted or compressed
  * payloads saturate toward 1.0, text sits much lower), and the leading
  * `magicBytes` as uppercase hex (container sniffing). ONE compiled
  * pass over the sampled bytes — the composed
  * `transform(sequence(...), i -> hex.substr(...))` HOF form is
  * interpreted with a per-element string allocation (the repo's #1
  * documented perf trap; VERDICT r3 "what's wrong" #2). */
final case class ByteStatsExpr(child: Expression, sampleBytes: Int,
    magicBytes: Int) extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt == BinaryType
  protected def childTypeWanted: String = "binary"
  require(sampleBytes >= 1 && magicBytes >= 1, "byte_stats: sizes must be >= 1")

  override def dataType: DataType = ByteStatsExpr.schema
  override def prettyName: String = "byte_stats"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ByteStatsExpr.compute(input.asInstanceOf[Array[Byte]], sampleBytes, magicBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ByteStatsExpr.compute($c, $sampleBytes, $magicBytes)")

  override protected def withNewChildInternal(newChild: Expression): ByteStatsExpr =
    copy(child = newChild)
}

object ByteStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("byte_diversity", DoubleType, nullable = false),
    StructField("magic", StringType, nullable = false)))

  private val hexDigits = "0123456789ABCDEF".toCharArray

  private def r4(x: Double): Double = ExprUtil.r4(x)

  def compute(bytes: Array[Byte], sampleBytes: Int, magicBytes: Int): InternalRow = {
    val n = bytes.length
    val sample = math.min(n, sampleBytes)
    val seen = new Array[Boolean](256)
    var distinct = 0
    var i = 0
    while (i < sample) {
      val b = bytes(i) & 0xff
      if (!seen(b)) { seen(b) = true; distinct += 1 }
      i += 1
    }
    val mLen = math.min(n, magicBytes)
    val magic = new Array[Char](mLen * 2)
    i = 0
    while (i < mLen) {
      val b = bytes(i) & 0xff
      magic(i * 2) = hexDigits(b >>> 4)
      magic(i * 2 + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      n,
      r4(distinct.toDouble / 256.0),
      org.apache.spark.unsafe.types.UTF8String.fromString(new String(magic))))
  }
}

/** Single-pass counters for the Gopher document-shape rule battery
  * (graft.ops.GopherRules): word/char/line/symbol/stop-word counts in
  * ONE scan of the string. The composed split/filter/rlike form used
  * six higher-order-function columns — HOFs are interpreted, not
  * codegen'd (the NOTES #1 perf trap), and re-evaluated the whitespace
  * split per rule; measured 24 s → ~2 s for the full battery at sf1.
  * Semantics REPLICATE the regex forms exactly (the d44/d48 oracles
  * replay those regexes verbatim, so this expression must agree
  * bit-for-bit):
  *  - words: maximal runs between ASCII [ \t\n\x0B\f\r]; lengths in
  *    CODE POINTS (Spark length());
  *  - lines: '\n' segments INCLUDING trailing empties;
  *  - bullet line: optional [ \t]* then one of - * •;
  *  - ellipsis-ended line: trailing [ \t\r] ignored, then ASCII "..."
  *    or U+2026;
  *  - ASCII ellipsis count: leftmost non-overlapping "..." matches
  *    (regexp_replace semantics: "...." counts once);
  *  - stop hits: membership of each stop word among the [a-z0-9]+
  *    runs of the UTF8String-LOWERCASED text (exactly lower() +
  *    regexp_extract_all — the lowering must be Spark's, not ASCII:
  *    e.g. İ lowers to i + combining dot and contributes an 'i' run).
  */
final case class GopherStatsExpr(child: Expression, stops: Seq[String])
    extends UnaryExpression with TypedChild {
  protected def childTypeOk(dt: DataType): Boolean = dt == StringType
  protected def childTypeWanted: String = "string"

  override def dataType: DataType = GopherStatsExpr.schema
  override def prettyName: String = "gopher_stats"
  override def nullIntolerant: Boolean = true

  @transient private lazy val stopArr: Array[String] = stops.toArray

  override def nullSafeEval(input: Any): Any =
    GopherStatsExpr.compute(
      input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], stopArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // Java SOURCE type, never classOf[Array[String]].getName — that is
    // the JVM binary name "[Ljava.lang.String;", which janino rejects
    // ("Unexpected token [") and the whole stage silently fell back to
    // INTERPRETED eval for every d44/d46/d48 plan containing this
    // expression (review r14; the Bpe merges reference had it right)
    val ref = ctx.addReferenceObj("gopherStops", stopArr,
      "java.lang.String[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.GopherStatsExpr.compute($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): GopherStatsExpr =
    copy(child = newChild)
}

object GopherStatsExpr {
  import org.apache.spark.unsafe.types.UTF8String

  val schema: StructType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("char_sum", LongType, nullable = false),
    StructField("n_hash", IntegerType, nullable = false),
    StructField("n_ellipsis", LongType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet", IntegerType, nullable = false),
    StructField("n_ell_end", IntegerType, nullable = false),
    StructField("n_alpha", IntegerType, nullable = false),
    StructField("n_stop", IntegerType, nullable = false),
    StructField("n_alnum", IntegerType, nullable = false)))

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def compute(text: UTF8String, stops: Array[String]): InternalRow = {
    val s = text.toString
    val n = s.length
    // ---- word scan (whitespace-delimited tokens) ----
    var nWords = 0
    var charSum = 0L
    var nAlpha = 0
    var i = 0
    while (i < n) {
      if (isWs(s.charAt(i))) i += 1
      else {
        val start = i
        var hasAlpha = false
        while (i < n && !isWs(s.charAt(i))) {
          val c = s.charAt(i)
          if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) hasAlpha = true
          i += 1
        }
        nWords += 1
        charSum += s.codePointCount(start, i)
        if (hasAlpha) nAlpha += 1
      }
    }
    // ---- symbol counts ----
    var nHash = 0
    var nEllipsis = 0L
    i = 0
    while (i < n) {
      val c = s.charAt(i)
      if (c == '#') { nHash += 1; i += 1 }
      else if (c == '.' && i + 2 < n && s.charAt(i + 1) == '.' &&
        s.charAt(i + 2) == '.') { nEllipsis += 1; i += 3 } // leftmost non-overlap
      else if (c == '…') { nEllipsis += 1; i += 1 }
      else i += 1
    }
    // ---- line scan ----
    var nLines = 1
    var nBullet = 0
    var nEllEnd = 0
    var lineStart = 0
    var pos = 0
    def scanLine(from: Int, until: Int): Unit = {
      // bullet: ^[ \t]*[-*•]
      var j = from
      while (j < until && (s.charAt(j) == ' ' || s.charAt(j) == '\t')) j += 1
      if (j < until) {
        val c = s.charAt(j)
        if (c == '-' || c == '*' || c == '•') nBullet += 1
      }
      // ellipsis end: (\.\.\.|…)[ \t\r]*$
      var k = until
      while (k > from && {
        val c = s.charAt(k - 1)
        c == ' ' || c == '\t' || c == '\r'
      }) k -= 1
      if (k - from >= 3 && s.charAt(k - 1) == '.' && s.charAt(k - 2) == '.' &&
        s.charAt(k - 3) == '.') nEllEnd += 1
      else if (k > from && s.charAt(k - 1) == '…') nEllEnd += 1
    }
    while (pos < n) {
      if (s.charAt(pos) == '\n') {
        scanLine(lineStart, pos)
        nLines += 1
        lineStart = pos + 1
      }
      pos += 1
    }
    scanLine(lineStart, n)
    // ---- [a-z0-9]+ runs of lower(): token count + stop membership ----
    var nStop = 0
    var nAlnum = 0
    locally {
      val low = text.toLowerCase.toString // Spark lower() semantics
      val seen = new java.util.HashSet[String]()
      var li = 0
      val ln = low.length
      while (li < ln) {
        val c = low.charAt(li)
        if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
          val st = li
          var c2 = c
          while (li < ln && {
            c2 = low.charAt(li)
            (c2 >= 'a' && c2 <= 'z') || (c2 >= '0' && c2 <= '9')
          }) li += 1
          nAlnum += 1
          if (stops.length > 0) seen.add(low.substring(st, li))
        } else li += 1
      }
      var sj = 0
      while (sj < stops.length) {
        if (seen.contains(stops(sj))) nStop += 1
        sj += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](
      nWords, charSum, nHash, nEllipsis, nLines, nBullet, nEllEnd,
      nAlpha, nStop, nAlnum))
  }
}

/** Column-API entry points for the native expressions. */
object CatalystFunctions {
  def vecDot(a: Column, b: Column): Column =
    ExpressionUtils.column(VecDot(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def minhashSignature(sh: Column, k: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(sh), k))
  def shingleHashes(ws: Column, n: Int): Column =
    ExpressionUtils.column(ShingleHashes(ExpressionUtils.expression(ws), n))
  def simhash64(ws: Column): Column =
    ExpressionUtils.column(SimHash64Expr(ExpressionUtils.expression(ws)))
  def hyperplaneSig(vec: Column, bits: Int): Column =
    ExpressionUtils.column(HyperplaneSig(ExpressionUtils.expression(vec), bits))
  def signBits(vec: Column): Column =
    ExpressionUtils.column(SignBitsExpr(ExpressionUtils.expression(vec)))
  def simhashMd5(ws: Column): Column =
    ExpressionUtils.column(SimHashMd5Expr(ExpressionUtils.expression(ws)))
  def byteSimhash64(content: Column): Column =
    ExpressionUtils.column(ByteSimhash64Expr(ExpressionUtils.expression(content)))
  def textFeatures(text: Column): Column =
    ExpressionUtils.column(TextFeaturesExpr(ExpressionUtils.expression(text)))
  def winnowHashes(text: Column, k: Int, w: Int): Column =
    ExpressionUtils.column(WinnowHashes(ExpressionUtils.expression(text), k, w))
  def repetitionStats(text: Column): Column =
    ExpressionUtils.column(RepetitionStatsExpr(ExpressionUtils.expression(text)))
  def gopherStats(text: Column, stops: Seq[String]): Column =
    ExpressionUtils.column(GopherStatsExpr(ExpressionUtils.expression(text), stops))
  def vecUnit(a: Column): Column =
    ExpressionUtils.column(VecUnit(ExpressionUtils.expression(a)))
  def vecSub(a: Column, b: Column): Column =
    ExpressionUtils.column(VecSub(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
  def byteStats(content: Column, sampleBytes: Int = 1024, magicBytes: Int = 8): Column =
    ExpressionUtils.column(ByteStatsExpr(
      ExpressionUtils.expression(content), sampleBytes, magicBytes))
}
