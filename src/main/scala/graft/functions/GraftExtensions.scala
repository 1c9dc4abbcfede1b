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

  private[functions] val all: Seq[(String, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    ("vec_dot",
      info("vec_dot", "vec_dot(a, b) - dot product of two double arrays"),
      (es: Seq[Expression]) => VecDot(es(0), es(1))),
    ("shingle_hashes",
      info("shingle_hashes", "shingle_hashes(words, n) - distinct hashed word n-grams"),
      (es: Seq[Expression]) => ShingleHashes(es(0), intArg(es(1), "shingle_hashes", 2))),
    ("minhash_sig",
      info("minhash_sig", "minhash_sig(shingles, k) - k-slot MinHash signature"),
      (es: Seq[Expression]) => MinHashSig(es(0), intArg(es(1), "minhash_sig", 2))),
    ("simhash64",
      info("simhash64", "simhash64(words) - 64-bit SimHash fingerprint"),
      (es: Seq[Expression]) => SimHash64Expr(es(0))),
    ("simhash_md5",
      info("simhash_md5", "simhash_md5(words) - SimHash over md5 word hashes"),
      (es: Seq[Expression]) => SimHashMd5Expr(es(0))),
    ("hyperplane_sig",
      info("hyperplane_sig", "hyperplane_sig(vec, bits) - sign-LSH signature bits"),
      (es: Seq[Expression]) => HyperplaneSig(es(0), intArg(es(1), "hyperplane_sig", 2))),
    ("text_features",
      info("text_features", "text_features(text) - quality/language feature struct"),
      (es: Seq[Expression]) => TextFeaturesExpr(es(0))),
    ("winnow_hashes",
      info("winnow_hashes", "winnow_hashes(text, k, w) - winnowed k-gram rolling-hash fingerprints"),
      (es: Seq[Expression]) => WinnowHashes(es(0),
        intArg(es(1), "winnow_hashes", 2), intArg(es(2), "winnow_hashes", 3))),
    ("repetition_stats",
      info("repetition_stats", "repetition_stats(text) - within-document n-gram repetition struct"),
      (es: Seq[Expression]) => RepetitionStatsExpr(es(0))),
    ("vec_unit",
      info("vec_unit", "vec_unit(a) - unit-L2-normalized copy of a double array"),
      (es: Seq[Expression]) => VecUnit(es(0))),
    ("vec_sub",
      info("vec_sub", "vec_sub(a, b) - element-wise difference of two double arrays"),
      (es: Seq[Expression]) => VecSub(es(0), es(1))))

  /** Register into an already-built session's function registry. */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, inf, builder) =>
      spark.sessionState.functionRegistry
        .registerFunction(FunctionIdentifier(name), inf, builder)
    }
}
