package graft

import org.apache.spark.sql.functions._

import graft.core.Platform
import graft.model.DantzigModel

/** Drives every CLI command end-to-end against a scratch store
  * (reference cli.py:57-259 command surface). */
class CliSpec extends SparkSpec {
  import spark.implicits._

  test("index command group: status/drift/compact/maintain drive every " +
      "persisted index family end to end (r16)") {
    import graft.ops.{Dedup, IvfSq, Relevance}
    def vecA(i: Int) = Array.tabulate(8)(d =>
      (if (d == 0) 1.0f else 0.02f * ((i + d) % 5)))
    def vecS(i: Int) = Array.tabulate(8)(d =>
      (if (d == 4) 1.0f else 0.01f * ((i + d) % 3)))
    def captured(f: => Unit): String = {
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(f)
      bos.toString("UTF-8")
    }
    // IVF-SQ: status, drift table, maintain (quiet path compacts)
    val ivf = tmpDir("cli-idx-ivfsq")
    IvfSq.build((0 until 24).map(i => (i.toLong, vecA(i))).toDF("id", "vec"),
      nCells = 2, refineIters = 1, persist = false).save(ivf)
    IvfSq.append((100 until 106).map(i => (i.toLong, vecA(i)))
      .toDF("id", "vec"), ivf, tag = "d1")
    val st = captured { Cli.indexCmd(spark, Array("status", "ivfsq", ivf)) }
    assert(st.contains("2 live shard"), st)
    assert(!st.contains("writer lock"), "no lock -> no lock line")
    // a standing writer lock surfaces in status (holder + age), and a
    // --lock'd command while it stands fails loudly naming the holder
    java.nio.file.Files.write(java.nio.file.Paths.get(
      graft.ops.WriterLock.lockPath(ivf)), "ops-team#abc".getBytes("UTF-8"))
    val stL = captured { Cli.indexCmd(spark, Array("status", "ivfsq", ivf)) }
    assert(stL.contains("writer lock HELD by 'ops-team#abc'"), stL)
    val exL = intercept[graft.ops.WriterLock.LockHeldException] {
      Cli.indexCmd(spark, Array("compact", "ivfsq", ivf, "--lock", "0"))
    }
    assert(exL.getMessage.contains("ops-team#abc"), exL.getMessage)
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      graft.ops.WriterLock.lockPath(ivf)))
    val dr = captured { Cli.indexCmd(spark, Array("drift", "ivfsq", ivf)) }
    assert(dr.contains("drift_ratio"), dr)
    val mt = captured { Cli.indexCmd(spark,
      Array("maintain", "ivfsq", ivf, "--max-live", "1")) }
    assert(mt.contains("compacted=true") && !mt.contains("REBUILD"), mt)
    // shifted append -> maintain prints the rebuild recommendation
    IvfSq.append((200 until 212).map(i => (i.toLong, vecS(i)))
      .toDF("id", "vec"), ivf, tag = "d2")
    val mt2 = captured { Cli.indexCmd(spark,
      Array("maintain", "ivfsq", ivf, "--max-live", "1")) }
    assert(mt2.contains("REBUILD RECOMMENDED"), mt2)
    // ...and the rebuild subcommand acts on the recommendation
    val rb = captured { Cli.indexCmd(spark, Array("rebuild", "ivfsq", ivf)) }
    assert(rb.contains("retrained from the stored corpus, 1 live shard"), rb)
    val mt3 = captured { Cli.indexCmd(spark,
      Array("maintain", "ivfsq", ivf, "--max-live", "1")) }
    assert(!mt3.contains("REBUILD"), mt3)
    val exR = intercept[IllegalArgumentException] {
      Cli.indexCmd(spark, Array("rebuild", "lsh", ivf))
    }
    assert(exR.getMessage.contains("no trained geometry"), exR.getMessage)
    // LSH: maintain compacts past the cap; drift is refused by name
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "patient cat watches from the old wooden fence near the gate"
    val lsh = tmpDir("cli-idx-lsh")
    Dedup.buildLshIndex(Seq((1L, base)).toDF("doc_id", "text"),
      "doc_id", "text", lsh)
    Dedup.appendToLshIndex(Seq((2L, base + " x")).toDF("doc_id", "text"),
      "doc_id", "text", lsh, tag = "b1")
    Dedup.appendToLshIndex(Seq((3L, base + " y")).toDF("doc_id", "text"),
      "doc_id", "text", lsh, tag = "b2")
    val ml = captured { Cli.indexCmd(spark,
      Array("maintain", "lsh", lsh, "--max-live", "2")) }
    assert(ml.contains("compacted to 1 live shard"), ml)
    val exD = intercept[IllegalArgumentException] {
      Cli.indexCmd(spark, Array("drift", "lsh", lsh))
    }
    assert(exD.getMessage.contains("only for the IVF family"), exD.getMessage)
    // BM25: explicit compact through the CLI
    val bm = tmpDir("cli-idx-bm25")
    Relevance.buildIndex(Seq((1L, "join hash scan"), (2L, "join dup"))
      .toDF("doc_id", "text"), "doc_id", "text", bm)
    Relevance.appendToIndex(Seq((3L, "hash dup merge")).toDF("doc_id", "text"),
      "doc_id", "text", bm, tag = "b1")
    val cb = captured { Cli.indexCmd(spark, Array("compact", "bm25", bm)) }
    assert(cb.contains("compacted, 1 live shard"), cb)
    // status is family-gated: an ivfpq claim over an ivfsq layout
    // reads missing/incomplete, never healthy (r16 review)
    val exK = intercept[IllegalArgumentException] {
      Cli.indexCmd(spark, Array("status", "ivfpq", ivf))
    }
    assert(exK.getMessage.contains("missing or incomplete"), exK.getMessage)
    // unknown kind / flag fail loudly with usage
    intercept[IllegalArgumentException] {
      Cli.indexCmd(spark, Array("status", "hnsw", bm))
    }
    intercept[IllegalArgumentException] {
      Cli.indexCmd(spark, Array("maintain", "bm25", bm, "--bogus", "1"))
    }
  }

  test("scenarios/list, solve, export, import, report commands") {
    val mp = new Platform(spark, tmpDir("graft-cli"))
    mp.addUnit("USD")
    val s = mp.newScenario("canning problem", "standard")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    s.setAsDefault()

    Cli.run(mp, Array("scenarios"))
    Cli.run(mp, Array("list", "canning"))

    Cli.run(mp, Array("solve", "canning problem/standard"))
    assert(s.hasSolution)

    // export writes the TS csv; import reads it into a fresh scenario
    val t = mp.newScenario("canning problem", "imported")
    t.transact("seed ts") {
      t.addTimeseries(Seq(("World", "GDP", "USD", 2020, 1.5))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    t.setAsDefault()
    val out = tmpDir("graft-cli-export")
    Cli.run(mp, Array("export", "canning problem/imported", out))
    val u = mp.newScenario("canning problem", "reimported")
    u.setAsDefault()
    Cli.run(mp, Array("import", "canning problem/reimported", out))
    assert(u.timeseries().select("value").as[Double].collect().toSeq == Seq(1.5))

    Cli.run(mp, Array("report", "canning problem/standard", "d:i"))

    // report with a 4th arg writes the IAMC CSV (convert_pyam path):
    // d:i has no region/year-named dims, so everything sums to one
    // World row under the IAMC_IDX header
    val iamcOut = tmpDir("graft-cli-iamc")
    Cli.run(mp, Array("report", "canning problem/standard", "d:i", iamcOut))
    val lines = spark.read.textFile(iamcOut).collect().toSeq
    assert(lines.contains("model,scenario,region,variable,unit,value,subannual"))
    val world = lines.filter(_.startsWith("canning problem,standard,World,d,km,"))
    assert(world.size == 1)
    assert(math.abs(world.head.split(",")(5).toDouble - 11.7) < 1e-9)

    intercept[IllegalArgumentException](Cli.run(mp, Array("bogus")))
  }

  test("curate command: quality gate, PII redaction, exact + line dedup, JSONL out") {
    val in = tmpDir("graft-cli-curate-in")
    val longText = (1 to 30).map(i => s"the quick word$i fox and some more".take(40))
      .mkString(" ")
    Seq(
      (1L, s"$longText\nCOOKIE BANNER\ncontact me a.b@ex.org ok", "en", "web"),
      (2L, s"$longText\nCOOKIE BANNER\ncontact me a.b@ex.org ok", "en", "web"), // exact dup of 1
      (3L, s"different $longText here\nCOOKIE BANNER\ntail line", "en", "web"),
      (4L, "too short", "en", "web"), // fails the min-words gate
      (5L, s"$longText unique tail five", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").json(in)
    val outDir = tmpDir("graft-cli-curate-out")
    Cli.curateCmd(spark, Array(in, outDir, "10"))
    val out = spark.read.json(outDir)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // doc 2 (exact dup) and doc 4 (too short) are gone
    assert(out.keySet == Set(1L, 3L, 5L))
    // the corpus-repeated banner line was stripped, real lines survive
    assert(!out(1L).contains("COOKIE BANNER") && out(3L).contains("tail line"))
    // PII was redacted in-flight
    assert(!out(1L).contains("a.b@ex.org") && out(1L).contains("<EMAIL>"))
  }

  test("curate command: empty output and blank-line boilerplate docs (review r9)") {
    val in = tmpDir("graft-cli-curate2-in")
    val longText = (1 to 30).map(i => s"the quick word$i fox and some more".take(40))
      .mkString(" ")
    Seq(
      // whitespace-only variant of doc 1: the STREAMING path dedups by
      // normalized fingerprint, so the batch path must drop it too
      (1L, s"$longText tail", "en", "web"),
      (2L, s"$longText  tail ", "en", "web"),
      // all-boilerplate doc with a trailing newline: lineDedup keeps
      // the blank line (n_kept = 1) but the text is empty — must drop
      (3L, "SHARED BANNER\n", "en", "web"),
      (4L, s"SHARED BANNER\nmore $longText", "en", "web"),
      (5L, s"SHARED BANNER\nother $longText", "en", "web")
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").json(in)
    val outDir = tmpDir("graft-cli-curate2-out")
    Cli.curateCmd(spark, Array(in, outDir, "10"))
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING")
    val out = spark.read.schema(schema).json(outDir)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(1L, 4L, 5L), s"got $out")

    // every doc fails the gate -> empty output must report cleanly,
    // not crash on schema inference of an empty directory
    val in2 = tmpDir("graft-cli-curate3-in")
    Seq((1L, "too short", "en", "web")).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").json(in2)
    val out2 = tmpDir("graft-cli-curate3-out")
    Cli.curateCmd(spark, Array(in2, out2, "10")) // must not throw
    assert(spark.read.schema(schema).json(out2).count() == 0)
  }

  test("curate command: --lang-model routes the gate through a trained " +
      "MultiModel that drops what the marker heuristic misses (VERDICT r14 #5)") {
    import graft.ops.QualityClassifier
    // synthetic language "zz" salted with English stopword markers: the
    // d05 marker heuristic labels it "en" (markers are all it sees),
    // but hashed uni+bigram features separate it trivially
    def en(i: Int) = s"the quick brown fox number$i jumps over the lazy " +
      "dog and it runs through the garden with a happy friendly sound"
    def zz(i: Int) = s"the gorp blivet$i snarf quux zibble the wumpus " +
      "frobnicate and glorp snork the blargh wibble zot grue fnord plugh"
    val train = ((0 until 12).map(i => (i.toLong, en(i), "en")) ++
      (100 until 112).map(i => (i.toLong, zz(i), "zz")))
      .toDF("doc_id", "text", "label")
    val model = QualityClassifier.trainMulti(train, col("label"),
      buckets = 1 << 10, iters = 20)
    val modelDir = tmpDir("graft-cli-langmodel")
    QualityClassifier.saveMulti(spark, model, modelDir)

    val in = tmpDir("graft-cli-curate4-in")
    Seq(
      (1L, en(900), "en", "web"),
      (2L, zz(901), "en", "web") // marker heuristic says "en"
    ).toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").json(in)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING")

    // heuristic path keeps BOTH (the miss this feature exists for)
    val outH = tmpDir("graft-cli-curate4-outh")
    Cli.curateCmd(spark, Array(in, outH, "10"))
    assert(spark.read.schema(schema).json(outH)
      .select("doc_id").as[Long].collect().toSet == Set(1L, 2L))

    // trained gate drops the disguised doc and RELABELS the survivor
    // from the model (not the heuristic)
    val outM = tmpDir("graft-cli-curate4-outm")
    Cli.curateCmd(spark, Array(in, outM, "10",
      "--lang-model", modelDir, "--langs", "en"))
    val got = spark.read.schema(schema).json(outM)
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "en"), s"got $got")

    // ...and --langs zz inverts the keep set (the model's class
    // vocabulary is the gate, not the heuristic's four markers)
    val outZ = tmpDir("graft-cli-curate4-outz")
    Cli.curateCmd(spark, Array(in, outZ, "10",
      "--lang-model", modelDir, "--langs", "zz"))
    assert(spark.read.schema(schema).json(outZ)
      .select("doc_id").as[Long].collect().toSet == Set(2L))

    // unknown flag is loud
    intercept[IllegalArgumentException] {
      Cli.curateCmd(spark, Array(in, outZ, "10", "--bogus", "x"))
    }

    // --quality-model: a trained binary margin drops fluent-but-junk
    // docs the heuristic gate (word count + stopword ratio) passes
    def spam(i: Int) = s"the best cheap pills$i and the top deals now " +
      "with the free casino bonus and the instant winner prize today"
    val qtrain = ((0 until 12).map(i => (i.toLong, en(i), true)) ++
      (100 until 112).map(i => (i.toLong, spam(i), false)))
      .toDF("doc_id", "text", "label")
    val qm = QualityClassifier.train(qtrain, col("label"),
      buckets = 1 << 10, iters = 20)
    val qmDir = tmpDir("graft-cli-qmodel")
    QualityClassifier.save(spark, qm, qmDir)
    // round-trip sanity: the persisted model scores like the original
    val qmBack = QualityClassifier.load(spark, qmDir)
    assert(qmBack.bias == qm.bias &&
      qmBack.weights.sameElements(qm.weights))
    val inQ = tmpDir("graft-cli-curate5-in")
    Seq((1L, en(900), "en", "web"), (2L, spam(901), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").json(inQ)
    val outQ = tmpDir("graft-cli-curate5-out")
    Cli.curateCmd(spark, Array(inQ, outQ, "10", "--quality-model", qmDir))
    assert(spark.read.schema(schema).json(outQ)
      .select("doc_id").as[Long].collect().toSet == Set(1L),
      "trained quality margin must drop the fluent spam doc")
    // --quality-min without --quality-model is loud
    intercept[IllegalArgumentException] {
      Cli.curateCmd(spark, Array(inQ, outQ, "10", "--quality-min", "0.5"))
    }
    ()
  }

  test("platform registry: add/list/remove + named ixmp:// URL resolution") {
    import graft.core.PlatformRegistry
    val cfg = java.nio.file.Paths.get(tmpDir("graft-reg"), "platforms.properties")
    val reg = new PlatformRegistry(cfg)

    // CLI group (cli.py:332-360): add two platforms, first is default
    val rootA = tmpDir("graft-regA")
    val rootB = tmpDir("graft-regB")
    Cli.platformCmd(Array("add", "alpha", rootA), reg)
    Cli.platformCmd(Array("add", "beta", rootB), reg)
    Cli.platformCmd(Array("list"), reg)
    assert(reg.list() == Seq("alpha" -> rootA, "beta" -> rootB))
    assert(reg.defaultName.contains("alpha"))
    reg.setDefault("beta")
    assert(reg.resolve("default") == rootB)
    assert(reg.resolve("alpha") == rootA)

    // a scenario stored on beta opens through its NAMED URL
    val mpB = new Platform(spark, rootB)
    val s = mpB.newScenario("m", "s")
    s.setAsDefault()
    val (mp2, opened) = graft.core.Platform.fromUrl(spark, "ixmp://beta/m/s", reg)
    assert(mp2.root == rootB && opened.runId == s.runId)
    // the default platform resolves when the URL names none
    val (mp3, _) = graft.core.Platform.fromUrl(spark, "ixmp://default/m/s", reg)
    assert(mp3.root == rootB)

    Cli.platformCmd(Array("remove", "alpha"), reg)
    assert(reg.list().map(_._1) == Seq("beta"))
    intercept[IllegalArgumentException](reg.resolve("alpha"))
    intercept[IllegalArgumentException](Cli.platformCmd(Array("bogus"), reg))
  }

  test("curate command: --tokenizer/--tok-model annotate the output " +
      "with per-doc n_tokens from a persisted trained tokenizer (r15)") {
    import graft.ops.{Unigram, WordPiece}
    def en(i: Int) = s"the quick brown fox number$i jumps over the lazy " +
      "dog and it runs through the garden with a happy friendly sound"
    val docsDf = Seq((1L, en(1)), (2L, en(2))).toDF("doc_id", "text")
    val in = tmpDir("graft-cli-curate6-in")
    Seq((1L, en(1), "en", "web"), (2L, en(2), "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .coalesce(1).write.mode("overwrite").json(in)
    val schemaT = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, lang STRING, source STRING, n_tokens INT")

    // wordpiece route: n_tokens equals a direct encode of the WRITTEN
    // text (the count runs on the final curated text, post-dedup)
    val v = WordPiece.train(docsDf, vocabSize = 120, minPairCount = 2L)
    val vDir = tmpDir("graft-cli-wpvocab")
    WordPiece.saveVocab(spark, v, vDir)
    val outW = tmpDir("graft-cli-curate6-outw")
    Cli.curateCmd(spark, Array(in, outW, "10",
      "--tokenizer", "wordpiece", "--tok-model", vDir))
    val gotW = spark.read.schema(schemaT).json(outW)
      .select(col("doc_id"), col("n_tokens"),
        WordPiece.encodeCol(graft.functions.TextFunctions.words(col("text")), v)
          .getField("n_wp").as("direct"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    assert(gotW.length == 2 &&
      gotW.forall { case (_, n, direct) => n == direct && n > 0 },
      gotW.mkString(", "))

    // unigram route shares the plumbing
    val um = Unigram.train(docsDf, vocabSize = 60, maxPieceLen = 3,
      iters = 1)
    val uDir = tmpDir("graft-cli-unimodel")
    Unigram.save(spark, um, uDir)
    val outU = tmpDir("graft-cli-curate6-outu")
    Cli.curateCmd(spark, Array(in, outU, "10",
      "--tokenizer", "unigram", "--tok-model", uDir))
    assert(spark.read.schema(schemaT).json(outU)
      .select("n_tokens").as[Int].collect().forall(_ > 0))

    // flag misuse is loud: half a pair, or an unknown tokenizer name
    val outX = tmpDir("graft-cli-curate6-outx")
    intercept[IllegalArgumentException] {
      Cli.curateCmd(spark, Array(in, outX, "10", "--tok-model", vDir))
    }
    intercept[IllegalArgumentException] {
      Cli.curateCmd(spark, Array(in, outX, "10",
        "--tokenizer", "sentencepiece", "--tok-model", vDir))
    }
  }
}
