package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftExprBridge => ExpressionUtils}

/** Per-dimension linear (scalar) quantizer model: `vmin(d)..vmax(d)`
  * maps to byte codes 0..255. A driver-local value of 2·dim doubles
  * (1 KB at dim=64) shipped to executors as a codegen reference
  * object — no codebook training, no rotation; the cheapest member of
  * the quantization family. */
final case class SqModel(vmin: Array[Double], vmax: Array[Double]) {
  require(vmin.length == vmax.length && vmin.length > 0,
    "sq model: vmin/vmax length mismatch or empty")
  // a NaN range poisons every decode silently (NaN fails both clamp
  // comparisons in encode, so EVERY value would code to 0) — the same
  // loud contract as the null-element guards (ADVICE r12)
  locally {
    var d = 0
    while (d < vmin.length) {
      require(!vmin(d).isNaN && !vmax(d).isNaN,
        s"sq model: NaN range bound at dimension $d - clean NaN vectors upstream")
      d += 1
    }
  }
  def dim: Int = vmin.length
}

/** Scalar quantization (the FAISS `SQ8` shape): each vector dimension
  * compresses independently to one byte via a per-dimension linear
  * range, so a 64-dim float32 vector (256 B) stores as 64 B — 4×
  * smaller, much higher fidelity than PQ's 32× (recon error ≤ half a
  * quantization step per dimension vs PQ's per-subspace centroid
  * residual), and training is a single min/max pass instead of Lloyd
  * iterations. The right first rung on the compression ladder: try SQ8
  * before PQ; move to PQ/OPQ ([[Pq]]) only when 4× is not enough.
  *
  * Scale shape: train is ONE aggregation whose 2·dim cells
  * partial-aggregate map-side (only 2·dim numbers shuffle, never
  * vectors); encode and ADC scoring are native codegen'd map-side
  * expressions; the only shuffle in [[Sq.adcKnn]] is the final
  * per-query top-k window moving (qid, id, sim) triples.
  *
  * Every float op (encode rounding, decode, dot accumulation) is
  * sequential in index order, so a SQL oracle reproduces codes AND
  * similarity scores bit-for-bit — unlike PQ's trained paths, the
  * whole SQ pipeline is oracle-provable with zero refinement caveats.
  */
object Sq {

  /** Train = per-dimension min/max over the corpus in ONE
    * partial-aggregated pass. min/max are exact (no float summation),
    * so the model is engine-reproducible by construction. Fails
    * loudly on an empty corpus and on a dimension with no non-null
    * values (a ragged corpus would otherwise silently train 0-width
    * ranges). */
  def train(corpus: DataFrame, vecCol: String): SqModel = {
    val c = corpus.select(col(vecCol).cast("array<double>").as("__v"))
    val firstRow = c.select(size(col("__v"))).limit(1).collect()
    require(firstRow.nonEmpty, "sq train: corpus is empty")
    // size(NULL) is NULL and limit(1) picks a nondeterministic row —
    // a bare getInt would NPE on one run and pass on the next
    // (review r12)
    require(!firstRow.head.isNullAt(0),
      "sq train: sampled row has a null vector - clean nulls upstream")
    val dim = firstRow.head.getInt(0)
    require(dim > 0, "sq train: zero-length vectors")
    val aggs = (0 until dim).flatMap { d =>
      Seq(min(element_at(col("__v"), d + 1)).as(s"n$d"),
        max(element_at(col("__v"), d + 1)).as(s"x$d"))
    }
    val row = c.agg(aggs.head, aggs.tail: _*).collect().head
    val mn = new Array[Double](dim)
    val mx = new Array[Double](dim)
    var d = 0
    while (d < dim) {
      require(!row.isNullAt(2 * d) && !row.isNullAt(2 * d + 1),
        s"sq train: dimension $d has no values (ragged or all-null corpus)")
      mn(d) = row.getDouble(2 * d)
      mx(d) = row.getDouble(2 * d + 1)
      d += 1
    }
    SqModel(mn, mx)
  }

  /** Column of per-dimension byte codes (array<tinyint>, length dim —
    * genuinely ONE byte per dimension in Tungsten caches and shuffles,
    * which is where the 4× memory claim has to hold, not just in
    * bit-packed parquet; consumers mask with `& 0xff` since JVM bytes
    * are signed). */
  def encodeCol(vec: Column, model: SqModel): Column =
    ExpressionUtils.column(SqEncodeExpr(
      ExpressionUtils.expression(vec.cast("array<double>")), model))

  /** Corpus-encode convenience (the [[Pq.encode]] shape). */
  def encode(df: DataFrame, vecCol: String, model: SqModel): DataFrame =
    df.withColumn("codes", encodeCol(col(vecCol), model))

  /** [[encode]] for a SEARCH corpus: zero-norm rows drop FIRST (the
    * IvfPq/IvfSq build rule). A zero vector's reconstruction is pure
    * quantization noise with an arbitrary direction, and cosine is
    * scale-invariant — undropped, one failed-embedder row could
    * outrank true neighbors for every query in [[adcKnn]]. */
  def encodeCorpus(df: DataFrame, vecCol: String, model: SqModel): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    encode(df.filter(Similarity.dot(v, v) > 0), vecCol, model)
  }

  /** Unsigned view of one code (JVM bytes are signed; 255 stores as
    * -1) — the single masking idiom for gates/specs reading codes. */
  def codeAsInt(code: Column): Column = code.cast("int").bitwiseAND(lit(255))

  /** Asymmetric cosine of a RAW query vector against an SQ-encoded
    * corpus row: the codes decode inline (`mn + code·step`) and dot /
    * norms accumulate in one sequential pass. NULL when either side is
    * zero-norm (the [[Similarity.cosineSim]] guard — NaN would sort
    * above every real similarity). */
  def cosineCol(codes: Column, qvec: Column, model: SqModel): Column =
    ExpressionUtils.column(SqCosineExpr(
      ExpressionUtils.expression(codes),
      ExpressionUtils.expression(qvec.cast("array<double>")), model))

  /** Raw asymmetric dot(qvec, decode(codes)) — the [[IvfSq]] residual
    * score term (no normalization: residuals are not unit vectors). */
  def dotCol(codes: Column, qvec: Column, model: SqModel): Column =
    ExpressionUtils.column(SqDotExpr(
      ExpressionUtils.expression(codes),
      ExpressionUtils.expression(qvec.cast("array<double>")), model))

  /** Top-k by asymmetric cosine over an SQ8-encoded corpus — the
    * compressed-domain kNN: queries broadcast raw, every candidate
    * costs one dim-length fused decode+dot pass, and the per-query
    * top-k window is the only shuffle. At SQ8 fidelity an exact rerank
    * is usually unnecessary (recon error ≤ step/2 per dim); when the
    * corpus also keeps raw vectors, [[Pq.adcKnnRerank]]'s shortlist
    * pattern applies unchanged.
    *
    * Same conventions as [[Similarity.bruteForceKnn]]: `id == qid`
    * self-matches drop, ties break by id, sim rounds to 4dp. Feed the
    * corpus through [[encodeCorpus]] (not plain [[encode]]): zero-norm
    * originals must drop BEFORE encoding — their codes reconstruct to
    * arbitrary-direction quantization noise this side cannot detect. */
  def adcKnn(encoded: DataFrame, queries: DataFrame, model: SqModel,
      k: Int): DataFrame = {
    // same analysis-time guard as IvfSq.query (review r12): without
    // it an incomparable qid/id pairing dies mid-job in the ANSI cast
    // instead of failing loudly here
    Similarity.requireComparableIds(queries, encoded)
    val q = queries.select(col("qid"),
      col("qvec").cast("array<double>").as("qvec"))
    val scored = encoded.select(col("id"), col("codes")).crossJoin(broadcast(q))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim", cosineCol(col("codes"), col("qvec"), model))
      .filter(col("sim").isNotNull) // zero-norm rows have no cosine rank
      .select(col("qid"), col("id"), col("sim"))
    Similarity.topKByKey(scored, "qid", "id", "sim", metricDesc = true, k)
      .select(col("qid"), col("rank"), col("id"), round(col("sim"), 4).as("sim"))
  }
}

/** Raw asymmetric dot for (codes, qvec): one sequential fused
  * decode+multiply pass, NO normalization — the residual-scoring term
  * of [[IvfSq]] (cell dot + residual dot; residuals are not unit
  * vectors, so cosine normalization would be wrong here). */
final case class SqDotExpr(left: Expression, right: Expression,
    model: SqModel) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_dot"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(codes: Any, qvec: Any): Any =
    SqDotExpr.compute(codes.asInstanceOf[ArrayData],
      qvec.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqmodel", model, classOf[SqModel].getName)
    defineCodeGen(ctx, ev, (c, q) =>
      s"graft.ops.SqDotExpr.compute($c, $q, $ref)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqDotExpr =
    copy(left = newLeft, right = newRight)
}

object SqDotExpr {
  def compute(codes: ArrayData, qvec: ArrayData, model: SqModel): Double = {
    val dim = model.dim
    require(codes.numElements() == dim,
      s"sq_dot: codes length ${codes.numElements()} != model dim $dim")
    require(qvec.numElements() == dim,
      s"sq_dot: query dim ${qvec.numElements()} != model dim $dim")
    var dot = 0.0
    var d = 0
    while (d < dim) {
      require(!codes.isNullAt(d), s"sq: null code at index $d")
      require(!qvec.isNullAt(d), s"sq: null query element at index $d")
      val mn = model.vmin(d)
      val mx = model.vmax(d)
      dot += qvec.getDouble(d) *
        (mn + (codes.getByte(d) & 0xff) * ((mx - mn) / 255.0))
      d += 1
    }
    dot
  }
}

/** Per-dimension linear byte codes for one vector:
  * `floor((x-mn)/(mx-mn)·255 + 0.5)` clamped to [0, 255]; a
  * zero-width dimension (mx == mn) codes 0. The formula is the ONE
  * copy both engines mirror — every op is deterministic double
  * arithmetic, so codes are bit-reproducible cross-engine. Output is
  * array<tinyint> — one Tungsten byte per dimension (the realized 4×;
  * an int array would cost the same 256 B as the raw float vector);
  * values 128..255 store as the signed bytes -128..-1 and every
  * consumer masks with `& 0xff`. */
final case class SqEncodeExpr(child: Expression, model: SqModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "sq_encode"
  override def nullIntolerant: Boolean = true

  // UnsafeArrayData.fromPrimitiveArray, not GenericArrayData: the
  // byte[] GenericArrayData constructor boxes every element (one
  // java.lang.Byte per dimension per corpus row in the hottest build
  // loop) — the same idiom every CatalystExprs array producer uses
  // (review r12)
  override def nullSafeEval(input: Any): Any =
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(
      SqEncodeExpr.compute(input.asInstanceOf[ArrayData], model))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqmodel", model, classOf[SqModel].getName)
    defineCodeGen(ctx, ev, c =>
      s"org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(" +
        s"graft.ops.SqEncodeExpr.compute($c, $ref))")
  }

  override protected def withNewChildInternal(newChild: Expression): SqEncodeExpr =
    copy(child = newChild)
}

object SqEncodeExpr {
  def compute(a: ArrayData, model: SqModel): Array[Byte] = {
    val dim = model.dim
    require(a.numElements() == dim,
      s"sq_encode: vector dim ${a.numElements()} != model dim $dim")
    val codes = new Array[Byte](dim)
    var d = 0
    while (d < dim) {
      require(!a.isNullAt(d), s"sq: null vector element at index $d")
      val x = a.getDouble(d)
      // NaN fails BOTH clamp comparisons and toInt's to 0 — a NaN
      // element would silently encode as code 0 (= vmin) instead of
      // failing like a null element does (ADVICE r12)
      require(!x.isNaN, s"sq: NaN vector element at index $d")
      val mn = model.vmin(d)
      val mx = model.vmax(d)
      val c: Int =
        if (mx == mn) 0
        else {
          val r = math.floor((x - mn) / (mx - mn) * 255.0 + 0.5)
          if (r < 0.0) 0 else if (r > 255.0) 255 else r.toInt
        }
      codes(d) = c.toByte // 128..255 wrap to signed; consumers mask
      d += 1
    }
    codes
  }
}

/** Fused decode + cosine for (codes, qvec): one sequential pass
  * accumulates dot, recon-norm² and query-norm²; decode is
  * `mn + code·((mx-mn)/255)`. Returns NULL (not NaN) when either side
  * is zero-norm. Summation order and the final
  * `dot / (sqrt(rss)·sqrt(qss))` parenthesization are the contract a
  * SQL oracle mirrors. */
final case class SqCosineExpr(left: Expression, right: Expression,
    model: SqModel) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq_cosine"
  override def nullIntolerant: Boolean = true
  override def nullable: Boolean = true

  override def nullSafeEval(codes: Any, qvec: Any): Any =
    SqCosineExpr.compute(codes.asInstanceOf[ArrayData],
      qvec.asInstanceOf[ArrayData], model)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("sqmodel", model, classOf[SqModel].getName)
    nullSafeCodeGen(ctx, ev, (c, q) => {
      val tmp = ctx.freshName("sqcos")
      s"""java.lang.Double $tmp = graft.ops.SqCosineExpr.compute($c, $q, $ref);
         |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SqCosineExpr =
    copy(left = newLeft, right = newRight)
}

object SqCosineExpr {
  def compute(codes: ArrayData, qvec: ArrayData,
      model: SqModel): java.lang.Double = {
    val dim = model.dim
    require(codes.numElements() == dim,
      s"sq_cosine: codes length ${codes.numElements()} != model dim $dim")
    require(qvec.numElements() == dim,
      s"sq_cosine: query dim ${qvec.numElements()} != model dim $dim")
    var dot = 0.0
    var rss = 0.0
    var qss = 0.0
    var d = 0
    while (d < dim) {
      require(!codes.isNullAt(d), s"sq: null code at index $d")
      require(!qvec.isNullAt(d), s"sq: null query element at index $d")
      val mn = model.vmin(d)
      val mx = model.vmax(d)
      val recon = mn + (codes.getByte(d) & 0xff) * ((mx - mn) / 255.0)
      val q = qvec.getDouble(d)
      dot += q * recon
      rss += recon * recon
      qss += q * q
      d += 1
    }
    if (rss > 0.0 && qss > 0.0)
      java.lang.Double.valueOf(dot / (math.sqrt(rss) * math.sqrt(qss)))
    else null
  }
}
