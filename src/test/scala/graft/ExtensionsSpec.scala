package graft

import graft.functions.GraftExtensions

/** SQL-facing registration of the native expressions: both the
  * `SparkSessionExtensions` injection path (spark.sql.extensions) and
  * runtime registration into an existing session. */
class ExtensionsSpec extends SparkSpec {

  test("register(spark) makes the native functions SQL-callable") {
    GraftExtensions.register(spark)
    assert(spark.sql("SELECT vec_dot(array(1.0d,2.0d), array(3.0d,4.0d)) v")
      .head().getDouble(0) == 11.0)
    val sig = spark.sql(
      "SELECT minhash_sig(shingle_hashes(array('a','b','c','d'), 2), 4) s")
      .head().getSeq[Long](0)
    assert(sig.length == 4)
    assert(spark.sql("SELECT simhash64(array('x','y')) h").head().getLong(0) !=
      spark.sql("SELECT simhash64(array('p','q')) h").head().getLong(0))
    val tf = spark.sql("SELECT text_features('the cat and the dog') f")
      .select("f.n_words", "f.lang").head()
    assert(tf.getInt(0) == 5 && tf.getString(1) == "en")
    // identical 15-char windows share a winnowed fingerprint
    val wf = spark.sql(
      "SELECT winnow_hashes('abcdefghijklmnop', 8, 8) a, " +
        "winnow_hashes('zzz abcdefghijklmnop zzz', 8, 8) b").head()
    assert(wf.getSeq[Long](0).toSet.intersect(wf.getSeq[Long](1).toSet).nonEmpty)
    // non-literal k is rejected with a clear message
    val err = intercept[Exception](
      spark.sql("SELECT minhash_sig(array(1L), cast(rand()*4 as int)) s").collect())
    assert(err.getMessage.contains("integer literal"))
    // wrong arity is an analysis error, not an IndexOutOfBounds
    val ar = intercept[Exception](
      spark.sql("SELECT vec_dot(array(1.0d)) v").collect())
    assert(ar.getMessage.contains("vec_dot"))
    // the binary expressions are registered too
    assert(spark.sql("SELECT byte_simhash64(cast('abcdefgh' as binary)) h")
      .head().getLong(0) != 0L)
    assert(spark.sql("SELECT byte_stats(cast('abcdefgh' as binary)) s")
      .select("s.n_bytes").head().getAs[Number](0).longValue == 8L)
  }

  test("SQL surface rejects wrong types/params at analysis time (review r9)") {
    graft.functions.GraftExtensions.register(spark)
    // wrong child type: analysis error naming the function, not an
    // executor ClassCastException after codegen fallback
    val e1 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT simhash64('not an array')").collect()
    }
    assert(e1.getMessage.contains("simhash64"))
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT vec_dot(array(1.0d, 2.0d), 'oops')").collect()
    }
    assert(e2.getMessage.contains("vec_dot"))
    // bad literal params: construction-time requires, not
    // ArrayIndexOutOfBounds/NegativeArraySize on executors
    intercept[Exception] {
      spark.sql("SELECT shingle_hashes(array('a','b'), 0)").collect()
    }
    intercept[Exception] {
      spark.sql("SELECT minhash_sig(array('a'), -1)").collect()
    }
    ()
  }

  test("vec_dot rejects mismatched dimensions instead of truncating") {
    GraftExtensions.register(spark)
    val e = intercept[Exception](
      spark.sql("SELECT vec_dot(array(1.0d,2.0d,3.0d), array(1.0d,2.0d)) v")
        .collect())
    assert(e.getMessage.contains("length mismatch"))
  }

  test("SparkSessionExtensions injection path applies cleanly") {
    // a suite-shared session already exists, so building a second one
    // with spark.sql.extensions would silently reuse it; apply the
    // extension object directly instead (what the config path invokes)
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    // and the full surface resolves through the runtime registration
    GraftExtensions.register(spark)
    for (fn <- Seq("vec_dot", "shingle_hashes", "minhash_sig", "simhash64",
        "simhash_md5", "hyperplane_sig", "text_features", "winnow_hashes"))
      assert(spark.catalog.functionExists(fn), fn)
    assert(spark.sql("SELECT hyperplane_sig(array(0.5d, -0.25d), 16) h")
      .head().getLong(0) >= 0L)
    assert(spark.sql("SELECT simhash_md5(array('w')) h").head().getLong(0) != 0L)
  }
}
