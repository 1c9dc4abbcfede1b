package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.sql.{GraftExprBridge => ExpressionUtils}

/** Linear quality classifier over hashed n-gram features — the
  * fastText-shaped model (Joulin et al. 2016, "Bag of Tricks for
  * Efficient Text Classification") that production curation pipelines
  * train on curated-vs-crawl examples (the GPT-3 WebText classifier,
  * FineWeb-Edu's educational scorer) and then apply corpus-wide.
  * Complements the two unsupervised quality signals here: heuristic
  * features (d04) and reference-LM perplexity (d27/d28).
  *
  * Features are word uni+bigram counts hashed into `buckets` cells
  * (xxhash64 — training needs run-to-run determinism, not
  * cross-engine reproducibility, so the fast hash is the right
  * default; [[score]] accepts any featurizer via its weights table).
  *
  * Training is full-batch logistic regression by gradient descent:
  * deterministic given data (no sampling, no RNG init — w starts at
  * 0), with each iteration ONE pass over the persisted doc-level
  * feature frame (margin via a native dot expression with the weight
  * vector as codegen reference object) plus one narrow (bucket,
  * gradient) aggregation whose output is at most `buckets` rows
  * collected to the driver. The model is a fixed-size dense vector —
  * like [[LangModel]] and the DSIR histograms it never grows with the
  * corpus, so at 100 TB you train on a labeled sample and broadcast
  * the weights everywhere. Weight floats inherit partial-aggregation
  * ordering, so weights are reproducible to float-sum jitter; the
  * DECISIONS are stable (spec asserts label agreement across
  * partitionings, not bitwise weights).
  */
object QualityClassifier {

  /** Trained model: dense weights indexed by bucket, plus bias. */
  final case class Model(weights: Array[Double], bias: Double) {
    def buckets: Int = weights.length
  }

  /** Word uni+bigram bucket ids (array<long>) for a words column —
    * xxhash64 % buckets, all builtin codegen'd expressions
    * (the shared [[graft.functions.TextFunctions.uniBigrams]]
    * featurizer under the fast in-engine hash). */
  def featureBuckets(ws: Column, buckets: Int): Column =
    transform(graft.functions.TextFunctions.uniBigrams(ws),
      g => pmod(xxhash64(g), lit(buckets)))

  /** Character n-grams of every word, boundary-marked (`<word>`) — the
    * SUBWORD half of fastText (Bojanowski 2017, "Enriching Word
    * Vectors with Subword Information"): `<ru`, `run`, `ing`, `ng>`, …
    * for n in [minN, maxN]. What lets the classifier generalize to
    * words it never saw — morphology transfers ("-ung>" fires on any
    * German nominalization). All builtin codegen'd expressions. */
  def charGrams(ws: Column, minN: Int = 3, maxN: Int = 5): Column = {
    require(minN >= 2 && maxN >= minN,
      s"charGrams: need 2 <= minN <= maxN, got ($minN, $maxN)")
    flatten(transform(ws, w => {
      val padded = concat(lit("<"), w, lit(">"))
      val perN = (minN to maxN).map { n =>
        when(length(padded) >= n,
          transform(sequence(lit(1), length(padded) - n + 1),
            i => padded.substr(i, lit(n))))
          .otherwise(array())
      }
      flatten(array(perN: _*))
    }))
  }

  /** Word uni+bigrams PLUS char n-grams, bucketed — the full fastText
    * feature set. Train and score must agree on (minN, maxN); the
    * [[MultiModel]] carries them so the pair can never desync. */
  def featureBucketsSubword(ws: Column, buckets: Int, minN: Int,
      maxN: Int): Column =
    transform(
      concat(graft.functions.TextFunctions.uniBigrams(ws),
        charGrams(ws, minN, maxN)),
      g => pmod(xxhash64(g), lit(buckets)))

  /** Train on labeled docs (`labelCol` boolean — true = keep-quality).
    * Full-batch GD on the logistic loss, `iters` epochs at rate `lr`
    * with L2 decay `l2`. */
  def train(docs: DataFrame, labelCol: Column, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 1 << 15, iters: Int = 20,
      lr: Double = 0.5, l2: Double = 1e-6): Model = {
    require(iters >= 1 && buckets >= 2, "train: iters >= 1, buckets >= 2")
    val fx = docs.select(col(idCol).as("id"),
        labelCol.cast("double").as("y"),
        featureBuckets(graft.functions.TextFunctions.words(col(textCol)),
          buckets).as("bs"))
      .filter(size(col("bs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val nRow = fx.count()
      require(nRow > 0, "train: no documents with at least one token")
      val n = nRow.toDouble
      var w = new Array[Double](buckets)
      var bias = 0.0
      var it = 0
      while (it < iters) {
        val margin = bucketDot(col("bs"), w, bias)
        // residual of the logistic: sigmoid(margin) - y
        val res = fx.withColumn("r",
          lit(1.0) / (lit(1.0) + exp(-margin)) - col("y"))
        // ONE job per epoch (review r11): the bias gradient rides the
        // same aggregation as the bucket gradients via a sentinel
        // bucket -1 appended per row — the separate res.agg re-ran the
        // margin/sigmoid scan a second time every iteration
        val gRows = res.select(
            explode(concat(col("bs"), array(lit(-1L)))).as("b"), col("r"))
          .groupBy("b").agg(sum("r").as("g"))
          .collect()
        val next = new Array[Double](buckets)
        var i = 0
        while (i < buckets) { next(i) = w(i) * (1.0 - lr * l2); i += 1 }
        var gBias = 0.0
        gRows.foreach { r =>
          val b = r.getLong(0)
          if (b == -1L) gBias = r.getDouble(1) / n
          else next(b.toInt) -= lr * r.getDouble(1) / n
        }
        bias -= lr * gBias
        w = next
        it += 1
      }
      Model(w, bias)
    } finally { fx.unpersist(blocking = false); () }
  }

  /** Margin column under a trained model (native dot over the bucket
    * array; the dense weight vector ships as a codegen reference
    * object). Positive margin = quality. */
  def bucketDot(bs: Column, weights: Array[Double], bias: Double): Column =
    ExpressionUtils.column(BucketDotExpr(
      ExpressionUtils.expression(bs), weights, bias))

  /** Score every document: (id, n_feats, margin). One corpus scan,
    * map-side only. */
  def score(docs: DataFrame, model: Model, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    docs.select(col(idCol).as("id"),
        featureBuckets(graft.functions.TextFunctions.words(col(textCol)),
          model.buckets).as("bs"))
      .select(col("id"), size(col("bs")).as("n_feats"),
        bucketDot(col("bs"), model.weights, model.bias).as("margin"))

  /** The [[score]] margin as ONE inline column — the binary twin of
    * [[predMulti]] (gate a frame on trained quality IN PLACE; a
    * separate scored frame would need a join back). Positive margin =
    * keep-quality under the training labels. */
  def margin(model: Model, text: Column): Column =
    bucketDot(featureBuckets(
      graft.functions.TextFunctions.words(text), model.buckets),
      model.weights, model.bias)

  /** Persist a trained binary [[Model]] as ONE single-row parquet
    * table (the [[saveMulti]] pattern — train-once / use-everywhere). */
  def save(spark: org.apache.spark.sql.SparkSession, model: Model,
      path: String): Unit = {
    import spark.implicits._
    MetaSwap.commit(
      Seq((model.weights.toSeq, model.bias)).toDF("weights", "bias"), path)
  }

  /** Reload a [[save]]d binary model — margins bit-identical to the
    * in-memory original (doubles round-trip parquet exactly). */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Model = {
    // direct driver-side read (MetaIo, r19 — single-row artifact)
    val r = MetaIo.readHead(spark, MetaSwap.readDir(spark, path))
    Model(r.getSeq[Double](0).toArray, r.getDouble(1))
  }

  /** Relational scorer for a SPARSE weights table (bucket, weight) —
    * the cross-engine-checkable path (gate d34 uses md5 buckets and
    * dyadic-rational literal weights so the margin is exact in any
    * engine): broadcast join + one narrow (id, contribution) sum. */
  def scoreSparse(feats: DataFrame, weights: DataFrame,
      bias: Double): DataFrame =
    feats.join(broadcast(weights), Seq("b"), "left_outer")
      .withColumn("__w", coalesce(col("w"), lit(0.0)))
      .groupBy("id")
      .agg(count(lit(1)).as("n_feats"),
        (sum(col("__w")) + bias).as("margin"))

  // ——— multi-class (the fastText-shaped language-ID head) ———

  /** Trained K-class model: one dense weight vector + bias per class,
    * argmax decides. `classes` order is the tie-break order (ties go
    * to the earliest class). (subwordMin, subwordMax) > 0 means the
    * model was trained WITH char n-gram features — carried here so
    * [[scoreMulti]] featurizes identically by construction. */
  final case class MultiModel(classes: Vector[String],
      weights: Vector[Array[Double]], bias: Array[Double],
      subwordMin: Int = 0, subwordMax: Int = 0) {
    require(classes.size >= 2, s"multi model: need >= 2 classes")
    require(classes.distinct.size == classes.size,
      "multi model: duplicate class names")
    require(weights.size == classes.size && bias.length == classes.size,
      s"multi model: ${classes.size} classes vs ${weights.size} weight " +
        s"vectors / ${bias.length} biases")
    require(weights.map(_.length).distinct.size == 1,
      "multi model: ragged weight vectors")
    require(subwordMin == 0 || (subwordMin >= 2 && subwordMax >= subwordMin),
      s"multi model: subword range ($subwordMin, $subwordMax) must be " +
        "(0, 0) = off or 2 <= min <= max")
    def buckets: Int = weights.head.length
    private[ops] def bucketsCol(ws: Column): Column =
      if (subwordMin > 0)
        featureBucketsSubword(ws, buckets, subwordMin, subwordMax)
      else featureBuckets(ws, buckets)
  }

  /** Train a K-class softmax classifier on labeled docs (`labelCol`
    * string — the class name; the CCNet/RefinedWeb language-ID gate,
    * Joulin 2016 §2 with K outputs). Full-batch gradient descent on
    * the cross-entropy loss: deterministic given data (w starts at 0,
    * classes sort lexicographically), each epoch ONE distributed job —
    * K margins per doc via [[bucketDot]] (weight vectors as codegen
    * reference objects), softmax residuals p_k − 1[y=k], then one
    * (bucket, K gradients) aggregation of at most `buckets` rows
    * collected to the driver; the bias gradients ride the same
    * aggregation via the sentinel bucket −1 (the binary [[train]]
    * recipe). The model is K fixed-size vectors — at 100 TB you train
    * on a labeled sample and broadcast the weights everywhere. */
  def trainMulti(docs: DataFrame, labelCol: Column, idCol: String = "doc_id",
      textCol: String = "text", buckets: Int = 1 << 15, iters: Int = 30,
      lr: Double = 0.5, l2: Double = 1e-6, subwordMin: Int = 0,
      subwordMax: Int = 0): MultiModel = {
    require(iters >= 1 && buckets >= 2, "trainMulti: iters >= 1, buckets >= 2")
    // a throwaway model carries the featurizer choice (bucketsCol) so
    // train and score share ONE definition
    val featShape = MultiModel(Vector("a", "b"),
      Vector.fill(2)(new Array[Double](buckets)), new Array[Double](2),
      subwordMin, subwordMax)
    val fx = docs.select(labelCol.cast("string").as("y"),
        featShape.bucketsCol(
          graft.functions.TextFunctions.words(col(textCol))).as("bs"))
      .filter(col("y").isNotNull && size(col("bs")) > 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // class list: driver-bounded (K names), sorted = deterministic
      val classes = fx.select("y").distinct().collect()
        .map(_.getString(0)).sorted.toVector
      require(classes.size >= 2,
        s"trainMulti: need >= 2 label classes, got $classes")
      val k = classes.size
      val nRow = fx.count()
      require(nRow > 0, "trainMulti: no labeled documents with tokens")
      val n = nRow.toDouble
      var w = Vector.fill(k)(new Array[Double](buckets))
      var bias = new Array[Double](k)
      var it = 0
      while (it < iters) {
        val ms = (0 until k).map(c => bucketDot(col("bs"), w(c), bias(c)))
        // max-shifted softmax: exp never overflows however far a
        // diverged margin runs
        val mx = greatest(ms: _*)
        val es = ms.map(m => exp(m - mx))
        val z = es.reduce(_ + _)
        val rs = (0 until k).map(c =>
          (es(c) / z - (col("y") === classes(c)).cast("double")).as(s"__r$c"))
        val gRows = fx.select(col("bs") +: rs: _*)
          .select(explode(concat(col("bs"), array(lit(-1L)))).as("b") +:
            (0 until k).map(c => col(s"__r$c")): _*)
          .groupBy("b")
          .agg(sum(s"__r0").as("g0"),
            (1 until k).map(c => sum(s"__r$c").as(s"g$c")): _*)
          .collect()
        val next = Vector.fill(k)(new Array[Double](buckets))
        var c = 0
        while (c < k) {
          var i = 0
          while (i < buckets) { next(c)(i) = w(c)(i) * (1.0 - lr * l2); i += 1 }
          c += 1
        }
        val nextBias = bias.clone()
        gRows.foreach { r =>
          val b = r.getLong(0)
          var ci = 0
          while (ci < k) {
            val g = r.getDouble(1 + ci) / n
            if (b == -1L) nextBias(ci) -= lr * g
            else next(ci)(b.toInt) -= lr * g
            ci += 1
          }
        }
        w = next; bias = nextBias
        it += 1
      }
      MultiModel(classes, w, bias, subwordMin, subwordMax)
    } finally { fx.unpersist(blocking = false); () }
  }

  /** Score every document under a trained [[MultiModel]]: (id,
    * n_feats, margins array<double> in class order, pred). One corpus
    * scan, map-side only — K native dots per row, argmax via the
    * first-max rule (ties to the earliest class). */
  def scoreMulti(docs: DataFrame, model: MultiModel,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val k = model.classes.size
    docs.select(col(idCol).as("id"),
        model.bucketsCol(
          graft.functions.TextFunctions.words(col(textCol))).as("bs"))
      .select(col("id"), size(col("bs")).as("n_feats"),
        array((0 until k).map(c =>
          bucketDot(col("bs"), model.weights(c), model.bias(c))): _*)
          .as("margins"))
      .withColumn("pred", element_at(typedLit(model.classes),
        array_position(col("margins"), array_max(col("margins"))).cast("int")))
  }

  /** The [[scoreMulti]] argmax as ONE inline column (pred only) — for
    * pipelines that gate on the predicted class IN PLACE (the Cli
    * curate language gate, VERDICT r14 #5): a separate scored frame
    * would need a join back, which a streaming caller cannot afford
    * (stream-stream). Same first-max tie rule as scoreMulti; the K
    * bucket arrays share one subexpression under whole-stage codegen
    * CSE. */
  def predMulti(model: MultiModel, text: Column): Column = {
    val k = model.classes.size
    val bs = model.bucketsCol(graft.functions.TextFunctions.words(text))
    val margins = array((0 until k).map(c =>
      bucketDot(bs, model.weights(c), model.bias(c))): _*)
    element_at(typedLit(model.classes),
      array_position(margins, array_max(margins)).cast("int"))
  }

  /** Persist a trained [[MultiModel]] as ONE single-row parquet table
    * (the Unigram.save pattern — classifiers are train-once /
    * use-everywhere, and a model living only in a JVM dies with the
    * session). Overwrite-atomic at this size. */
  def saveMulti(spark: org.apache.spark.sql.SparkSession, model: MultiModel,
      path: String): Unit = {
    import spark.implicits._
    // swap-committed (r15): a crashed re-train save never destroys the
    // standing model — see MetaSwap
    MetaSwap.commit(
      Seq((model.classes, model.weights.map(_.toSeq), model.bias.toSeq,
        model.subwordMin, model.subwordMax))
        .toDF("classes", "weights", "bias", "subword_min", "subword_max"),
      path)
  }

  /** Reload a [[saveMulti]]-persisted model — predictions bit-identical
    * to the in-memory original (doubles round-trip parquet exactly;
    * the featurizer range rides along so scoring cannot desync). */
  def loadMulti(spark: org.apache.spark.sql.SparkSession,
      path: String): MultiModel = {
    val r = spark.read.parquet(MetaSwap.readDir(spark, path)).head()
    MultiModel(r.getSeq[String](0).toVector,
      r.getSeq[scala.collection.Seq[Double]](1).map(_.toArray).toVector,
      r.getSeq[Double](2).toArray, r.getInt(3), r.getInt(4))
  }

  /** Relational K-class scorer for a SPARSE (b, cls, w) weights table —
    * the cross-engine-checkable path (gate d56: md5 buckets, dyadic
    * literal weights ⇒ every margin exact in any engine). One broadcast
    * join + one (id, K margins) aggregation; `biases` fixes the class
    * ORDER (argmax ties go to the earliest entry). */
  def scoreSparseMulti(feats: DataFrame, weights: DataFrame,
      biases: Seq[(String, Double)]): DataFrame = {
    require(biases.size >= 2, "scoreSparseMulti: need >= 2 classes")
    val classes = biases.map(_._1)
    require(classes.distinct.size == classes.size,
      "scoreSparseMulti: duplicate class names")
    // wide per-bucket row (one column per class; collision-safe —
    // duplicate (b, cls) rows sum, the d34 groupBy rule)
    val wCols = classes.map(c =>
      sum(when(col("cls") === c, col("w"))).as(s"__w_$c"))
    val wide = weights.groupBy("b").agg(wCols.head, wCols.tail: _*)
    val aggs = count(lit(1)).as("n_feats") +: biases.map { case (c, bz) =>
      (sum(coalesce(col(s"__w_$c"), lit(0.0))) + bz).as(s"margin_$c") }
    val m = feats.join(broadcast(wide), Seq("b"), "left_outer")
      .groupBy("id").agg(aggs.head, aggs.tail: _*)
    val marr = array(classes.map(c => col(s"margin_$c")): _*)
    m.withColumn("pred", element_at(typedLit(classes),
      array_position(marr, array_max(marr)).cast("int")))
  }
}

/** Σ w(b) + bias over a bucket-id array — the per-row scorer for
  * [[QualityClassifier]]; same reference-object pattern as
  * `PqCodebook`. */
final case class BucketDotExpr(child: Expression, weights: Array[Double],
    bias: Double) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "bucket_dot"
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    BucketDotExpr.compute(input.asInstanceOf[ArrayData], weights, bias)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("qcw", weights, "double[]")
    // bit-pattern splice, not Double.toString (review r9): a diverged
    // training run can hand over bias = NaN/Infinity, which are not
    // valid Java literals and would fail codegen compilation on every
    // task; longBitsToDouble round-trips every double exactly
    val biasJ =
      s"java.lang.Double.longBitsToDouble(${java.lang.Double.doubleToLongBits(bias)}L)"
    defineCodeGen(ctx, ev, c =>
      s"graft.ops.BucketDotExpr.compute($c, $ref, $biasJ)")
  }

  override protected def withNewChildInternal(newChild: Expression): BucketDotExpr =
    copy(child = newChild)
}

object BucketDotExpr {
  def compute(bs: ArrayData, w: Array[Double], bias: Double): Double = {
    val n = bs.numElements()
    var s = bias
    var i = 0
    while (i < n) { s += w(bs.getLong(i).toInt); i += 1 }
    s
  }
}
