package graft

import org.apache.spark.sql.functions._

/** Whole-library codegen regression net (review r14's bug class, made
  * structural): GopherStatsExpr had silently never compiled since r12 —
  * janino rejected the generated cast, Spark fell back to INTERPRETED
  * whole-stage eval for every d44/d46/d48 plan, and nothing failed.
  * GopherRulesSpec pinned that ONE expression; this suite pins the
  * rest: under `factoryMode = CODEGEN_ONLY` with fallback disabled, a
  * compile failure in ANY custom expression throws instead of
  * degrading, so a regression in generated Java (reference-object type
  * strings, bad casts, name splices) fails the build loudly.
  *
  * Coverage is by GATE — each listed gate's plan runs the named
  * expression(s) in its hot path — plus direct calls for the two
  * surfaces no oracle gate compiles natively (the trained-classifier
  * `bucketDot` margin and the sampled unigram encode). */
class CodegenSpec extends SparkSpec {
  import spark.implicits._

  test("every custom Catalyst expression compiles under CODEGEN_ONLY " +
      "(no silent interpreted fallback anywhere in the library)") {
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val gates = Seq(
        "d04_quality",              // TextFeaturesExpr
        "d06_minhash_lsh",          // ShingleHashes + MinHashSig
        "d12_simhash_pairs_verify", // SimHashMd5
        "d08_simhash_pairs",        // SimHash64Expr
        "d13_winnow_fingerprint",   // WinnowHashes
        "d15_repetition",           // RepetitionStatsExpr
        "d33_bpe_encode",           // BpeEncodeExpr
        "d62_bpe_bytes",            // BpeEncodeExpr byteFallback
        "d59_wordpiece",            // WordPieceEncodeExpr
        "d61_wordpiece_bytes",      // WordPieceEncodeExpr byteFallback
        "d44_gopher_rules",         // GopherStatsExpr (the r14 find)
        "d49_unigram_encode",       // UnigramEncodeExpr
        "d51_unigram_nbest",        // UnigramNbestExpr
        "e01_knn_brute",            // VecDot
        "e03_cosine_near_dup",      // HyperplaneSig + VecUnit
        "e04_pq_codes",             // PQ encode expr
        "e08_pq_rotated",           // OPQ rotate + sign-permute exprs
        "e11_sq_codes",             // SQ encode + codeAsInt
        "e13_knn_ivfsq_verify",     // SqDotExpr (fused decode+dot) + VecSub
        "e20_knn_bq",               // SignBitsExpr
        "m01_multimodal",           // ByteStatsExpr
        "m03_byte_simhash")         // ByteSimhash64
      gates.foreach { g =>
        val n = SparkEntry.queries(g)(spark, "/root/testdata/sf0.001").count()
        assert(n >= 0, s"$g must run compiled")
      }

      // bucketDot: the d34/d56 gates grade the RELATIONAL sparse
      // scorer, so the native margin expression needs its own drive
      val docs = Seq((1L, "the quick brown fox jumps over the dog"),
        (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
      val qm = graft.ops.QualityClassifier.train(
        docs.withColumn("label", col("doc_id") === 1L), col("label"),
        buckets = 64, iters = 2)
      assert(graft.ops.QualityClassifier.score(docs, qm).count() == 2)
      // predMulti: the K-class inline argmax (the Cli curate gate path)
      val mm = graft.ops.QualityClassifier.trainMulti(
        docs.withColumn("label",
          when(col("doc_id") === 1L, "a").otherwise("b")), col("label"),
        buckets = 64, iters = 2)
      assert(docs.select(graft.ops.QualityClassifier.predMulti(mm,
        col("text"))).count() == 2)

      // sampled unigram encode (UnigramSampleExpr) — streaming-spec'd,
      // never oracle-gated
      val um = graft.ops.Unigram.train(docs, vocabSize = 30,
        maxPieceLen = 3, iters = 1)
      assert(docs.select(graft.ops.Unigram.encodeSampledCol(
        graft.functions.TextFunctions.words(col("text")),
        lit(7L), um, k = 4, alpha = 0.2)).count() == 2)
      // byte-fallback encode shares UnigramEncodeExpr's codegen but
      // takes the byteFallback branch
      assert(docs.select(graft.ops.Unigram.encodeBytesCol(
        graft.functions.TextFunctions.words(col("text")), um)).count() == 2)
      // distributed EM drives SubstringsExpr (seeding) and
      // UnigramEmExpr (the per-word E-step kernel) — both r15
      assert(graft.ops.Unigram.trainEmDistributed(docs, vocabSize = 30,
        maxPieceLen = 3, seedSize = 50, iters = 1).pieces.nonEmpty)
      // distributed hard-EM drives UnigramViterbiPiecesExpr (r15)
      assert(graft.ops.Unigram.trainDistributed(docs, vocabSize = 30,
        maxPieceLen = 3, seedSize = 50, iters = 1).pieces.nonEmpty)
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }
}
