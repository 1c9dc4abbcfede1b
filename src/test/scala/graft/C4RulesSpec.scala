package graft

import org.apache.spark.sql.functions._

import graft.ops.C4Rules

/** C4 page-cleaning rules (graft.ops.C4Rules) — hand-computed line
  * keeps and page gates. */
class C4RulesSpec extends SparkSpec {
  import spark.implicits._

  private def flagsOf(text: String) = {
    val df = Seq((1L, text)).toDF("doc_id", "text")
    C4Rules.flags(df).collect().head
  }

  test("line rules: terminal punctuation AND five words, trailing blanks ignored") {
    val page = Seq(
      "Good first sentence goes right here.", // kept
      "bad", // no punct, short
      "Another full sentence right here!", // kept
      "four word question line?", // punct but 4 words
      "no terminal punctuation on this line", // words but no punct
      "Ends with a period after spaces.   ", // kept: rtrim before test
      "A truly quoted ending \"here\"" // kept: closing-quote terminal
    ).mkString("\n")
    val r = flagsOf(page)
    assert(r.getAs[Int]("n_lines") == 7)
    assert(r.getAs[Int]("n_kept_lines") == 4)
    val clean = r.getAs[String]("clean_text")
    assert(clean == Seq("Good first sentence goes right here.",
      "Another full sentence right here!",
      "Ends with a period after spaces.   ",
      "A truly quoted ending \"here\"").mkString("\n"))
    // sentences = terminal marks in the CLEAN text: . ! . = 3
    assert(r.getAs[Int]("n_sentences") == 3)
    assert(r.getAs[Boolean]("keep"))
  }

  test("null text: keep is FALSE, never three-valued (ADVICE r12)") {
    val df = Seq((1L, Some("One good full sentence right here. And two " +
        "more sentences follow. Third one closes it.")),
      (2L, None: Option[String])).toDF("doc_id", "text")
    val rows = C4Rules.flags(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // the null-text page is COUNTED as rejected, not skipped: keep is a
    // real false (a filter(!keep) consumer sees it)
    assert(!rows(2L).isNullAt(rows(2L).fieldIndex("keep")))
    assert(!rows(2L).getAs[Boolean]("keep"))
    assert(rows(1L).getAs[Boolean]("keep"))
    val rejected = C4Rules.flags(df).filter(!col("keep")).count()
    assert(rejected == 1L)
    // clean() agrees: the null page drops
    assert(C4Rules.clean(df).collect().map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("page gates: lorem ipsum (case-insensitive), brace, sentence floor") {
    val good = "One full sentence stands here.\n" +
      "Two full sentences stand here.\nThree full sentences stand here."
    assert(flagsOf(good).getAs[Boolean]("keep"))
    val lorem = good + "\nSome Lorem IPSUM filler text."
    val rl = flagsOf(lorem)
    assert(rl.getAs[Boolean]("has_lorem") && !rl.getAs[Boolean]("keep"))
    val brace = good + "\nconfig = { a }"
    val rb = flagsOf(brace)
    assert(rb.getAs[Boolean]("has_brace") && !rb.getAs[Boolean]("keep"))
    // only two surviving sentences -> below the 3-sentence floor
    val thin = "One full sentence stands here.\nshort\n" +
      "Two full sentences stand here.\nno terminal punctuation here at all"
    val rt = flagsOf(thin)
    assert(rt.getAs[Int]("n_sentences") == 2 && !rt.getAs[Boolean]("keep"))
  }

  test("clean() keeps survivors only, replaces text, stays map-side") {
    val docs = Seq(
      (1L, "en", "First good sentence is here.\nmid junk\n" +
        "Second good sentence is here.\nThird good sentence is here."),
      (2L, "de", "Nothing here terminates properly"),
      (3L, "fr", "Has a brace { inside.\nSecond good sentence is here.\n" +
        "Third good sentence is here.\nFourth good sentence is here.")
    ).toDF("doc_id", "lang", "text")
    val out = C4Rules.clean(docs).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L))
    val r = out.head
    assert(r.getAs[String]("lang") == "en") // other columns survive
    assert(r.getAs[String]("text") ==
      "First good sentence is here.\nSecond good sentence is here.\n" +
        "Third good sentence is here.")
    val plan = C4Rules.clean(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange") && !plan.contains("Join"),
      s"clean() must be one map-side pass, got:\n$plan")
  }

  test("CRLF pages survive: trailing \\r never hides a line ending (review r12)") {
    val crlf = "First good sentence is here.\r\nmid junk\r\n" +
      "Second good sentence is here.\r\nThird good sentence is here.\r"
    val r = flagsOf(crlf)
    assert(r.getAs[Int]("n_kept_lines") == 3,
      s"CRLF lines must keep: ${r.getAs[Int]("n_kept_lines")}")
    assert(r.getAs[Int]("n_sentences") == 3 && r.getAs[Boolean]("keep"))
  }

  test("empty page and validation") {
    val r = flagsOf("")
    assert(r.getAs[Int]("n_kept_lines") == 0 &&
      r.getAs[Int]("n_sentences") == 0 && !r.getAs[Boolean]("keep"))
    intercept[IllegalArgumentException] {
      C4Rules.flags(Seq((1L, "x")).toDF("doc_id", "text"), minLineWords = 0)
    }
  }

  test("differential fuzz: flags equal an independent plain-string " +
      "reference on adversarial pages (VERDICT r12 #4)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // the C4 page decomposition, re-implemented independently with
    // plain string operations (the GopherRulesSpec fuzz recipe); only
    // the terminal-punctuation line test shares the regex FAMILY,
    // compiled directly with java.util.regex
    val lineEnd = java.util.regex.Pattern.compile("[.!?\"][ \\t\\r]*$")
    def reference(s: String): (Int, Int, String, Int, Boolean, Boolean, Boolean) = {
      val lines = s.split("\n", -1)
      def nWords(l: String) =
        l.split("[ \t\n\u000B\f\r]+", -1).count(_.nonEmpty)
      val kept = lines.filter(l => lineEnd.matcher(l).find() && nWords(l) >= 5)
      val clean = kept.mkString("\n")
      val ns = clean.count(c => c == '.' || c == '!' || c == '?')
      val lorem = s.toLowerCase.contains("lorem ipsum")
      val brace = s.contains("{")
      (lines.length, kept.length, clean, ns, lorem, brace,
        !lorem && !brace && ns >= 3)
    }
    val piece = Gen.oneOf(
      "Good first sentence goes right here.", "short.", "\n", "\r\n",
      "four word question line?", "it has exactly five words!",
      "A quoted terminal ending \"here\"", "{", "lorem ipsum",
      "Lorem Ipsum dolor", "no terminal punctuation on this line",
      "Ends after trailing blanks.   ", "\t", " ", "…", "...",
      "tab\tseparated words count here too.", "", "😀 emoji words",
      "İstanbul casing line with words.", "\r", "one two three four five.")
    val gen = Gen.listOfN(8, piece).map(_.mkString(" "))
    val texts = (0 until 400).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong))).distinct
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = C4Rules.flags(df).collect().map(r =>
      r.getAs[Long]("doc_id") -> ((r.getAs[Int]("n_lines"),
        r.getAs[Int]("n_kept_lines"), r.getAs[String]("clean_text"),
        r.getAs[Int]("n_sentences"), r.getAs[Boolean]("has_lorem"),
        r.getAs[Boolean]("has_brace"), r.getAs[Boolean]("keep")))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) == reference(t),
        s"text ${t.map(ch => f"\\u${ch.toInt}%04x").mkString}: native " +
          s"${got(i.toLong)} vs reference ${reference(t)}")
    }
  }
}
