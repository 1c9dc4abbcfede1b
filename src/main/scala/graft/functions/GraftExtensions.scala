package graft.functions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL registration of the native expressions, so `spark.sql` users can
  * call them directly (`SELECT minhash_sig(shingle_hashes(words, 3),
  * 64) …`). Two entry points:
  *
  *  - `GraftExtensions` for `spark.sql.extensions=graft.functions.
  *    GraftExtensions` (config-time injection, works cluster-wide);
  *  - `GraftExtensions.register(spark)` for an already-built session.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.all.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftExtensions {

  private def intArg(e: Expression, fn: String, pos: Int): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: argument $pos must be an integer literal, got $other")
  }

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  /** Arity-checked builder: `SELECT vec_dot(a)` reports a function
    * error at analysis, not an IndexOutOfBoundsException from es(1). */
  private def arity(name: String, n: Int)(
      b: Seq[Expression] => Expression): Seq[Expression] => Expression =
    es => {
      if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
        errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
        messageParameters = Map("functionName" -> name,
          "expectedNum" -> n.toString, "actualNum" -> es.length.toString,
          "docroot" -> ""))
      b(es)
    }

  private[functions] val all: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      arity("vec_dot", 2)(es => VecDot(es(0), es(1)))),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(words, n) - distinct hashed word n-grams"),
      arity("shingle_hashes", 2)(es => ShingleHashes(es(0), intArg(es(1), "shingle_hashes", 2)))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingles, k) - k-slot MinHash signature"),
      arity("minhash_sig", 2)(es => MinHashSig(es(0), intArg(es(1), "minhash_sig", 2)))),
    ("simhash64",
      info("simhash64", "simhash64(words) - 64-bit SimHash fingerprint"),
      arity("simhash64", 1)(es => SimHash64Expr(es(0)))),
    ("simhash_md5",
      info("simhash_md5", "simhash_md5(words) - SimHash over md5 word hashes"),
      arity("simhash_md5", 1)(es => SimHashMd5Expr(es(0)))),
    ("hyperplane_sig",
      info("hyperplane_sig", "hyperplane_sig(vec, bits) - sign-LSH signature bits"),
      arity("hyperplane_sig", 2)(es => HyperplaneSig(es(0), intArg(es(1), "hyperplane_sig", 2)))),
    ("text_features",
      info("text_features", "text_features(text) - quality/language feature struct"),
      arity("text_features", 1)(es => TextFeaturesExpr(es(0)))),
    ("winnow_hashes",
      info("winnow_hashes", "winnow_hashes(text, k, w) - winnowed k-gram rolling-hash fingerprints"),
      arity("winnow_hashes", 3)(es => WinnowHashes(es(0),
        intArg(es(1), "winnow_hashes", 2), intArg(es(2), "winnow_hashes", 3)))),
    ("repetition_stats",
      info("repetition_stats", "repetition_stats(text) - within-document n-gram repetition struct"),
      arity("repetition_stats", 1)(es => RepetitionStatsExpr(es(0)))),
    ("vec_unit",
      info("vec_unit", "vec_unit(a) - unit-L2-normalized copy of a double array"),
      arity("vec_unit", 1)(es => VecUnit(es(0)))),
    ("vec_sub",
      info("vec_sub", "vec_sub(a, b) - element-wise difference of two double arrays"),
      arity("vec_sub", 2)(es => VecSub(es(0), es(1)))),
    ("byte_simhash64",
      info("byte_simhash64", "byte_simhash64(bin) - SimHash over 4-byte binary chunks"),
      arity("byte_simhash64", 1)(es => ByteSimhash64Expr(es(0)))),
    ("byte_stats",
      info("byte_stats", "byte_stats(bin) - single-pass binary payload statistics struct (1 KiB entropy sample, 8 magic bytes - the Column-API defaults)"),
      arity("byte_stats", 1)(es =>
        ByteStatsExpr(es(0), sampleBytes = 1024, magicBytes = 8))))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
