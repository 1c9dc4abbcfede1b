package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing

/** Sequence-packing planners (graft.ops.Packing). */
class PackingSpec extends SparkSpec {
  import spark.implicits._

  // (id, group, tokens): group a = 50+60+30+100, group b = 10+200+10
  private lazy val docs = Seq(
    (1L, "a", 50L), (2L, "a", 60L), (3L, "a", 30L), (4L, "a", 100L),
    (5L, "b", 10L), (6L, "b", 200L), (7L, "b", 10L)
  ).toDF("id", "grp", "n")

  test("concatChunkPlan: offsets are the running sum, chunks the closed-form span") {
    val out = Packing.concatChunkPlan(docs, "id", "grp", col("n"), budget = 100)
      .select("id", "token_offset", "chunk_first", "n_chunks")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // group a stream: [0,50) [50,110) [110,140) [140,240)
    assert(out(1L) == (0L, 0L, 1L))
    assert(out(2L) == (50L, 0L, 2L)) // straddles chunk 0 -> 1
    assert(out(3L) == (110L, 1L, 1L))
    assert(out(4L) == (140L, 1L, 2L)) // spans chunks 1,2
    // group b stream restarts at 0: [0,10) [10,210) [210,220)
    assert(out(5L) == (0L, 0L, 1L))
    assert(out(6L) == (10L, 0L, 3L))
    assert(out(7L) == (210L, 2L, 1L))
  }

  test("concatChunkPlan: zero-token docs occupy no chunk (n_chunks = 0)") {
    // before ADVICE r5 the span formula gave an empty doc 0 or 1 chunks
    // depending on whether its offset fell on a chunk boundary
    val d = Seq((1L, "a", 100L), (2L, "a", 0L), (3L, "a", 50L),
      (4L, "a", 0L)).toDF("id", "grp", "n")
    val out = Packing.concatChunkPlan(d, "id", "grp", col("n"), budget = 100)
      .select("id", "token_offset", "chunk_first", "n_chunks")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(2L) == (100L, 1L, 0L)) // exactly ON a boundary
    assert(out(4L) == (150L, 1L, 0L)) // mid-chunk
    assert(out(1L) == (0L, 0L, 1L) && out(3L) == (100L, 1L, 1L))
  }

  test("concatChunkPlan: duplicate ids get consecutive, non-overlapping " +
    "spans (ROWS frame, review r11)") {
    // under the default RANGE frame the two id=1 rows were peers
    // sharing one running sum — overlapping spans, orphaned tokens
    val d = Seq((1L, "g", 10L), (1L, "g", 20L), (2L, "g", 5L))
      .toDF("doc_id", "src", "n")
    val got = graft.ops.Packing.concatChunkPlan(d, "doc_id", "src",
        col("n"), budget = 1000)
      .select("n", "token_offset").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._2)
    // offsets partition [0, 35): 0+10 -> 10+20 -> 30+5, whatever the
    // tie order between the duplicate ids
    assert(got.map(_._2).toSeq == Seq(0L, 10L, 30L) &&
      got.zip(got.drop(1)).forall { case ((n, o), (_, o2)) => o + n == o2 },
      s"spans must tile without overlap: ${got.toSeq}")
  }

  test("greedyPack diagnoses string ids and null token counts at its " +
    "contract (review r11)") {
    val strIds = Seq(("u1", "g", 5L)).toDF("doc_id", "src", "n")
    val ex = intercept[IllegalArgumentException] {
      graft.ops.Packing.greedyPack(strIds, "doc_id", "src", col("n"), 10L)
    }
    assert(ex.getMessage.contains("integral"), ex.getMessage)
    val nullTok = Seq((1L, "g", Some(5L)), (2L, "g", Option.empty[Long]))
      .toDF("doc_id", "src", "n")
    val ex2 = intercept[Exception] {
      graft.ops.Packing.greedyPack(nullTok, "doc_id", "src", col("n"), 10L)
        .collect()
    }
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(t.getMessage)
    assert((ex2.getMessage + rootMsg(ex2)).contains("null token count"),
      s"got: ${ex2.getMessage}")
  }

  test("slidingChunks: full coverage, exact overlap, lossless reconstruction") {
    val toks = (1 to 57).map(i => s"w$i")
    val d = Seq((1L, toks), (2L, Seq("a", "b")), (3L, Seq.empty[String]))
      .toDF("id", "ws")
    val out = Packing.slidingChunks(d, "id", col("ws"), chunkTokens = 32, overlap = 8)
      .orderBy("id", "chunk_id")
      .select("id", "chunk_id", "chunk").as[(Long, Int, String)].collect()
    val c1 = out.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    assert(c1.length == 3) // ceil((57-8)/24) = 3 windows
    assert(c1(0) == toks.slice(0, 32) && c1(1) == toks.slice(24, 56)
      && c1(2) == toks.slice(48, 57))
    // consecutive windows share exactly the 8-token overlap
    assert(c1(0).takeRight(8) == c1(1).take(8))
    // reconstruction: window 0 + each subsequent window minus overlap
    val rebuilt = c1(0) ++ c1.tail.flatMap(_.drop(8))
    assert(rebuilt == toks)
    // short and empty docs produce exactly one (possibly empty) chunk
    assert(out.filter(_._1 == 2L).map(_._3).toSeq == Seq("a b"))
    assert(out.filter(_._1 == 3L).map(_._3).toSeq == Seq(""))
  }

  test("greedyPack: first-fit in id order, oversize docs get their own bin") {
    val out = Packing.greedyPack(docs, "id", "grp", col("n"), budget = 100)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    // a: 50 -> bin0; 60 overflows -> bin1; 30 fits bin1 (90); 100 -> bin2
    assert(out(1L) == 0L && out(2L) == 1L && out(3L) == 1L && out(4L) == 2L)
    // b: 10 -> bin0; 200 (oversize) -> bin1 alone; 10 -> bin2 (200 overflowed its bin)
    assert(out(5L) == 0L && out(6L) == 1L && out(7L) == 2L)
  }

  test("greedyPack never splits a doc and never overfills a bin (except oversize singletons)") {
    val out = Packing.greedyPack(docs, "id", "grp", col("n"), budget = 100)
    val bins = out.groupBy("group", "bin_id")
      .agg(sum("n_tokens").as("fill"), count(lit(1)).as("m"))
      .as[(String, Long, Long, Long)].collect()
    bins.foreach { case (_, _, fill, m) =>
      assert(fill <= 100 || m == 1, s"overfilled multi-doc bin: fill=$fill m=$m")
    }
    assert(out.count() == 7) // every doc packed exactly once
  }

  test("plan shapes: one exchange for the pack window, zero for chunking") {
    def exchanges(df: org.apache.spark.sql.DataFrame): Int =
      "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString
        .replace("BroadcastExchange", "")).length
    // concat-and-chunk = the one hash exchange feeding the window
    assert(exchanges(Packing.concatChunkPlan(docs, "id", "grp", col("n"), 100)) == 1)
    // greedy pack = the one repartition feeding the streaming pass
    assert(exchanges(Packing.greedyPack(docs, "id", "grp", col("n"), 100)) == 1)
    // sliding chunks are a pure per-row map: no exchange at all
    val toks = Seq((1L, Seq("a", "b", "c"))).toDF("id", "ws")
    assert(exchanges(Packing.slidingChunks(toks, "id", col("ws"), 2, 1)) == 0)
  }

  test("unigram encode composes with concatChunkPlan (the p04 anchor: " +
      "the planner consumes REAL unigram tokenizer output)") {
    import graft.ops.{Unigram, UnigramModel}
    val pairs = (('a' to 'z').map(c => String.valueOf(c) -> 8)) ++
      Seq("th" -> 11, "er" -> 12, "in" -> 11)
    val m = UnigramModel(pairs.map(_._1).toVector,
      pairs.map(p => -p._2.toDouble).toVector, unkLogp = -64.0)
    val docs = Seq(
      (1L, "en", "there there"), // th er e ×2 -> 6 pieces
      (2L, "en", "inner ring"), // in n er | r in g -> 6 pieces
      (3L, "de", "zz") // z z -> 2 pieces
    ).toDF("doc_id", "lang", "text")
    val enc = docs.select(col("doc_id"), col("lang"),
      Unigram.encodeCol(graft.functions.TextFunctions.words(col("text")), m)
        .getField("n_pieces").cast("long").as("n_tok"))
    val plan = Packing.concatChunkPlan(enc, "doc_id", "lang",
        col("n_tok"), budget = 8)
      .select("doc_id", "token_offset", "n_chunks")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // en stream: doc1 [0,6) chunk 0; doc2 [6,12) straddles chunks 0-1
    assert(plan(1L) == (0L, 1L))
    assert(plan(2L) == (6L, 2L))
    // de stream restarts
    assert(plan(3L) == (0L, 1L))
  }

  test("null token counts, token arrays, and ids fail loudly (review r12)") {
    def rootMsg(t: Throwable): String =
      Option(t.getCause).map(rootMsg).getOrElse(Option(t.getMessage).getOrElse(""))
    // concatChunkPlan: a words()-of-null doc reads size = -1 and used
    // to silently shift every later offset in the group
    val bad = Seq((1L, "g", Some(5L)), (2L, "g", None: Option[Long]))
      .toDF("id", "grp", "n")
    val ex = intercept[Exception] {
      Packing.concatChunkPlan(bad, "id", "grp", col("n"), 10).collect()
    }
    assert((ex.getMessage + rootMsg(ex)).contains("token count"), ex.getMessage)
    // slidingChunks: null token array used to emit a phantom
    // (n_tokens = -1, chunk = null) row
    val badArr = Seq((1L, Some(Seq("a", "b"))), (2L, None: Option[Seq[String]]))
      .toDF("id", "toks")
    val ex2 = intercept[Exception] {
      Packing.slidingChunks(badArr, "id", col("toks"), 2, 0).collect()
    }
    assert((ex2.getMessage + rootMsg(ex2)).contains("token array"), ex2.getMessage)
    // greedyPack: a null id passed the integral-TYPE require and then
    // crashed the tuple encoder mid-job with an opaque message
    val badId = Seq((Some(1L), "g", 3L), (None: Option[Long], "g", 4L))
      .toDF("id", "grp", "n")
    val ex3 = intercept[Exception] {
      Packing.greedyPack(badId, "id", "grp", col("n"), 10L).collect()
    }
    assert((ex3.getMessage + rootMsg(ex3)).contains("null id"), ex3.getMessage)
  }

  test("greedyPack matches a driver-side reference fold on pseudo-random sizes") {
    val rows = (1L to 200L).map { i =>
      (i, s"g${i % 3}", 1L + math.abs(java.util.Arrays.hashCode(Array(i)) % 97))
    }
    val df = rows.toDF("id", "grp", "n")
    val got = Packing.greedyPack(df, "id", "grp", col("n"), budget = 150)
      .select("id", "bin_id").as[(Long, Long)].collect().toMap
    val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
      var bin = 0L; var used = 0L
      rs.sortBy(_._1).map { case (id, _, n) =>
        if (used > 0 && used + n > 150) { bin += 1; used = 0L }
        used += n
        id -> bin
      }
    }
    assert(got == want)
  }
}
