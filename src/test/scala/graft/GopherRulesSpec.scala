package graft

import org.apache.spark.sql.functions._

import graft.ops.GopherRules

/** The Gopher/MassiveText document-shape rule battery
  * (graft.ops.GopherRules) — hand-computed features per rule. */
class GopherRulesSpec extends SparkSpec {
  import spark.implicits._

  private def flagsOf(text: String, minWords: Int = 50) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    GopherRules.flags(df, minWords = minWords).collect().head
  }

  private val goodText = {
    // 56 words, all 2-5 chars, stopword-rich, no bullets/ellipses
    val s = "the quick brown fox jumps over that lazy dog to rest " +
      "and we have seen it move with grace of form be calm"
    s + " " + s + " again more words pad"
  }

  test("gopher_stats codegen COMPILES - no silent interpreted fallback " +
      "(review r14: the [Ljava.lang.String; reference-type bug meant " +
      "every d44/d46/d48 stage fell back to interpreted eval)") {
    // CODEGEN_ONLY + fallback off: a compile failure throws instead of
    // silently degrading the whole stage
    val prevMode = spark.conf.getOption("spark.sql.codegen.factoryMode")
    val prevFb = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try {
      val n = GopherRules.flags(
        Seq((1L, goodText)).toDF("doc_id", "text")).count()
      assert(n == 1L)
    } finally {
      prevMode.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
      prevFb.fold(spark.conf.unset("spark.sql.codegen.fallback"))(
        spark.conf.set("spark.sql.codegen.fallback", _))
    }
  }

  test("a clean prose doc passes every rule") {
    val r = flagsOf(goodText)
    assert(r.getAs[Int]("n_words") >= 50)
    val ml = r.getAs[Double]("mean_word_len")
    assert(ml >= 3.0 && ml <= 10.0, s"mean_word_len $ml")
    assert(r.getAs[Int]("n_stop_hits") >= 2)
    Seq("r_word_count", "r_mean_word_len", "r_symbol_ratio",
      "r_bullet_lines", "r_ellipsis_lines", "r_alpha_words",
      "r_stop_words", "keep").foreach(c =>
      assert(r.getAs[Boolean](c), s"$c must pass"))
  }

  test("hand-computed features: mean word length, hash ratio, bullet frac") {
    // "ab cde" -> 2 words, 5 chars, mean 2.5 (fails the 3..10 rule)
    val a = flagsOf("ab cde", minWords = 1)
    assert(a.getAs[Int]("n_words") == 2)
    assert(a.getAs[Double]("mean_word_len") == 2.5)
    assert(!a.getAs[Boolean]("r_mean_word_len"))
    // "# ab" -> 1 hash / 2 words = 0.5 > 0.1
    val b = flagsOf("# ab", minWords = 1)
    assert(b.getAs[Double]("hash_ratio") == 0.5)
    assert(!b.getAs[Boolean]("r_symbol_ratio"))
    // "- x\ny" -> 1 bullet line of 2
    val c = flagsOf("- x\ny", minWords = 1)
    assert(c.getAs[Double]("bullet_frac") == 0.5)
    assert(c.getAs[Boolean]("r_bullet_lines")) // 0.5 < 0.9 passes
  }

  test("bullet-dominated and ellipsis-dominated docs fail their line rules") {
    val bullets = flagsOf("- one\n* two\n• three\n  - four", minWords = 1)
    assert(bullets.getAs[Double]("bullet_frac") == 1.0)
    assert(!bullets.getAs[Boolean]("r_bullet_lines"))
    assert(!bullets.getAs[Boolean]("keep"))
    val ell = flagsOf("foo...\nbar…  \nplain line", minWords = 1)
    assert(math.abs(ell.getAs[Double]("ellipsis_line_frac") - 2.0 / 3) < 1e-12)
    assert(!ell.getAs[Boolean]("r_ellipsis_lines"))
    // both ellipsis spellings count toward the symbol ratio (review
    // r12): '...' + '…' = 2 over the 4 whitespace words
    assert(ell.getAs[Double]("ellipsis_ratio") == 0.5)
  }

  test("unicode ellipsis counts like ASCII in the symbol rule; CRLF line " +
    "endings don't hide the ellipsis-line rule (review r12)") {
    // 4 words, 1 U+2026: same 0.25 ratio as the ASCII spelling
    val u = flagsOf("she paused… then left", minWords = 1)
    assert(u.getAs[Double]("ellipsis_ratio") == 0.25)
    // CRLF: both ellipsis-ended lines count despite the trailing \r
    val crlf = flagsOf("foo...\r\nbar…\r\nplain line here", minWords = 1)
    assert(math.abs(crlf.getAs[Double]("ellipsis_line_frac") - 2.0 / 3) < 1e-12)
  }

  test("alpha-word and stop-word rules: digits-only text fails both") {
    val r = flagsOf("11 22 33 44 55", minWords = 1)
    assert(r.getAs[Double]("alpha_frac") == 0.0)
    assert(!r.getAs[Boolean]("r_alpha_words"))
    assert(r.getAs[Int]("n_stop_hits") == 0)
    assert(!r.getAs[Boolean]("r_stop_words"))
    // 4 of 5 words alphabetic: 0.8 passes the >= 0.8 boundary
    val m = flagsOf("aa bb cc dd 55", minWords = 1)
    assert(m.getAs[Double]("alpha_frac") == 0.8)
    assert(m.getAs[Boolean]("r_alpha_words"))
  }

  test("native single-pass counters pin the regex semantics (review r12)") {
    // surrogate pair counts as ONE code point in word length (Spark
    // length() semantics): words a😀b(3) cd(2) -> mean 2.5
    val emoji = flagsOf("a😀b cd", minWords = 1)
    assert(emoji.getAs[Int]("n_words") == 2)
    assert(emoji.getAs[Double]("mean_word_len") == 2.5)
    // '....' counts ONE leftmost non-overlapping ASCII ellipsis
    // (regexp_replace semantics)
    val dots = flagsOf("....", minWords = 1)
    assert(dots.getAs[Double]("ellipsis_ratio") == 1.0)
    assert(!dots.getAs[Boolean]("r_symbol_ratio"))
    // vertical tab and form feed split words like the explicit class
    val vt = flagsOf("x\u000By\fz", minWords = 1)
    assert(vt.getAs[Int]("n_words") == 3)
    // stop membership follows Spark lower(): 'İ' lowers to i +
    // combining dot, so the run breaks after 'i' — but 'the'/'a'
    // still hit; n_alnum_words counts the [a-z0-9]+ runs
    val tr = {
      val df = Seq((1L, "İstanbul the a")).toDF("doc_id", "text")
      GopherRules.flags(df, minWords = 1, stops = Seq("the", "a")).collect().head
    }
    assert(tr.getAs[Int]("n_stop_hits") == 2)
    assert(tr.getAs[Int]("n_alnum_words") == 4) // i, stanbul, the, a
    // '####' is 4 hash symbols over 2 words
    val h = flagsOf("#### ok", minWords = 1)
    assert(h.getAs[Double]("hash_ratio") == 2.0)
  }

  test("empty and whitespace-only docs fail cleanly (no nulls in keep)") {
    for (t <- Seq("", "   \n\t  ")) {
      val r = flagsOf(t, minWords = 1)
      assert(r.getAs[Int]("n_words") == 0)
      assert(r.isNullAt(r.fieldIndex("mean_word_len")))
      assert(!r.getAs[Boolean]("r_mean_word_len"))
      assert(!r.getAs[Boolean]("keep"))
    }
  }

  test("keep() filter matches flags().filter(keep) and stays map-side") {
    val df = Seq(
      (1L, goodText), (2L, "- a\n- b\n- c"), (3L, "ab cd"),
      (4L, goodText + " ######## extra " + "#" * 40)
    ).toDF("doc_id", "text")
    val viaFlags = GopherRules.flags(df).filter(col("keep"))
      .select("doc_id").as[Long].collect().toSet
    val viaKeep = GopherRules.keep(df).select("doc_id").as[Long]
      .collect().toSet
    assert(viaKeep == viaFlags)
    assert(viaKeep == Set(1L))
    // the filter form must not introduce a shuffle or join
    val plan = GopherRules.keep(df).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"keep() must be one map-side filter, got:\n$plan")
  }

  test("d48 composed pipeline: strip+rules fuse map-side, ONE aggregation " +
    "shuffle") {
    val df = graft.queries.Pipeline.all("d48_curation_pipeline")(
      spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // markdown chain + rule battery fuse into the scan projection;
    // only the (lang, stats) groupBy hash-exchanges (the final orderBy
    // adds a range exchange, which is the gate's presentation sort)
    assert("Exchange hashpartitioning".r.findAllIn(plan).size <= 1,
      s"composed pipeline must shuffle once:\n$plan")
    assert(!plan.contains("Join"), "no join belongs in this pipeline")
    assert(df.count() > 0)
  }

  test("differential fuzz: native counters equal an independent " +
    "java-regex reference on adversarial strings (review r12)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the oracle's regex semantics, re-implemented independently with
    // java.util.regex (the same family DuckDB's RE2 agrees with on
    // these patterns — proven by the 500-doc d44 hash match)
    def reference(s: String, stops: Seq[String]) = {
      val ws = s.split("[ \t\n\u000B\f\r]+", -1).filter(_.nonEmpty)
      val lines = s.split("\n", -1)
      val lw = "[a-z0-9]+".r.findAllIn(s.toLowerCase).toSet
      val bullet = java.util.regex.Pattern.compile("^[ \t]*[-*•]")
      val ellEnd = java.util.regex.Pattern.compile("(\\.\\.\\.|…)[ \t\r]*$")
      (ws.length,
        ws.map(w => w.codePointCount(0, w.length).toLong).sum,
        s.count(_ == '#'),
        (s.length - s.replace("...", "").length) / 3 +
          s.count(_ == '…'),
        lines.length,
        lines.count(l => bullet.matcher(l).find()),
        lines.count(l => ellEnd.matcher(l).find()),
        ws.count(_.exists(c => (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z'))),
        stops.count(lw.contains),
        "[a-z0-9]+".r.findAllIn(s.toLowerCase).length)
    }
    val piece = Gen.oneOf("the", "a", "word", "#", "...", "….", "- x",
      "\n", "\r\n", " ", "\t", "42", "ab.", "!?", "\u000B", "•",
      "😀", "longerword", "…", ".", "x...", "\f", "İx")
    val gen = Gen.listOfN(12, piece).map(_.mkString)
    val stops = Seq("the", "a", "word")
    val texts = (0 until 400).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        graft.functions.CatalystFunctions.gopherStats(col("text"), stops)
          .as("g"))
      .select(col("doc_id"), col("g.*")).collect()
      .map(r => r.getLong(0) -> (
        (r.getAs[Int]("n_words"), r.getAs[Long]("char_sum"),
          r.getAs[Int]("n_hash"), r.getAs[Long]("n_ellipsis"),
          r.getAs[Int]("n_lines"), r.getAs[Int]("n_bullet"),
          r.getAs[Int]("n_ell_end"), r.getAs[Int]("n_alpha"),
          r.getAs[Int]("n_stop"), r.getAs[Int]("n_alnum")))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val (a, b, c, d, e, f, g2, h, s9, al) = reference(t, stops)
      val want = (a, b, c.toInt, d.toLong, e, f, g2, h, s9, al)
      assert(got(i.toLong) == want,
        s"text ${t.map(ch => f"\\u${ch.toInt}%04x").mkString} native " +
          s"${got(i.toLong)} vs reference $want")
    }
  }

  test("bounds validation fails loudly") {
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      GopherRules.flags(df, minWords = 10, maxWords = 5).collect()
    }
  }
}
