package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.EventStream

case class Ev(user_id: Long, event_type: String, ts: Timestamp, value: Double)

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def t(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowed activity with watermark emits closed windows (append)") {
    val input = MemoryStream[Ev](spark)
    val q = EventStream.windowedActivity(input.toDF(), "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("agg_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Ev(1, "purchase", t("2026-01-01 10:05:00"), 10.0),
        Ev(2, "purchase", t("2026-01-01 10:40:00"), 5.0),
        Ev(3, "signup", t("2026-01-01 10:50:00"), 1.0))
      q.processAllAvailable()
      // advance the watermark far past the 10:00-11:00 window
      input.addData(Ev(4, "purchase", t("2026-01-01 13:00:00"), 2.0))
      q.processAllAvailable()
      val out = spark.table("agg_out")
        .select("event_type", "n_events", "value").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
      assert(out.contains(("purchase", 2L, 15.0)))
      assert(out.contains(("signup", 1L, 1.0)))
    } finally q.stop()
  }

  test("session windows split on the inactivity gap") {
    val input = MemoryStream[Ev](spark)
    val q = EventStream.sessions(input.toDF(), gap = "30 minutes", watermark = "1 minute")
      .writeStream.format("memory").queryName("sess_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        Ev(7, "a", t("2026-01-01 10:00:00"), 1.0),
        Ev(7, "a", t("2026-01-01 10:10:00"), 1.0), // same session
        Ev(7, "a", t("2026-01-01 12:00:00"), 1.0)) // new session
      q.processAllAvailable()
      input.addData(Ev(8, "a", t("2026-01-01 15:00:00"), 0.0)) // advance watermark
      q.processAllAvailable()
      val sessions = spark.table("sess_out").filter(col("user_id") === 7)
        .select("n_events").as[Long].collect().sorted.toSeq
      assert(sessions == Seq(1L, 2L))
    } finally q.stop()
  }

  test("streaming dedup drops in-horizon duplicates, keeps distinct docs") {
    case class Doc(doc_id: Long, text: String, ts: Timestamp)
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.dedupStream(docs, watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the quick brown fox", t("2026-01-01 10:00:00")),
        (2L, "a different document", t("2026-01-01 10:01:00")),
        (3L, "The  Quick   Brown Fox", t("2026-01-01 10:02:00"))) // dup of 1 under normalization
      q.processAllAvailable()
      input.addData(
        (4L, "the quick brown fox", t("2026-01-01 10:30:00"))) // in-horizon dup
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("doc_id").as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L))
    } finally q.stop()
  }

  test("stateless curation gate runs in streaming unchanged") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.curateStream(docs, minWords = 5)
      .writeStream.format("memory").queryName("curate_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the cat and the dog sat on a mat in the sun for an hour", t("2026-01-01 10:00:00")),
        (2L, "short", t("2026-01-01 10:01:00")),
        (3L, "zzz qqq xxx www vvv uuu ttt sss rrr nnn", t("2026-01-01 10:02:00")))
      q.processAllAvailable()
      val rows = spark.table("curate_out").select("doc_id", "lang").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet == Set(1L))
      assert(rows(1L) == "en")
    } finally q.stop()
  }

  test("mixtureSampleStream fails loudly on an unplanned source instead " +
    "of silently emitting nothing (review r12); sketch/digest guards") {
    import spark.implicits._
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "src", "ts")
    // an EMPTY rates frame (bootstrap-before-replan) refuses at call
    // time — the stream would otherwise run "healthy" emitting nothing
    val empty = Seq.empty[(String, Double)].toDF("src", "rate")
    val exEmpty = intercept[IllegalArgumentException] {
      EventStream.mixtureSampleStream(docs, "doc_id", "src", empty)
    }
    assert(exEmpty.getMessage.contains("empty rates frame"))
    // strict mode: a NON-empty plan missing a mid-stream source fails
    // the query by name (default keeps the batch drop-unweighted rule)
    val partial = Seq(("wiki", 1.0)).toDF("src", "rate")
    val q = EventStream.mixtureSampleStream(docs, "doc_id", "src",
        partial, onUnplanned = "fail")
      .writeStream.format("memory").queryName("mix_fail_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData((1L, "code", t("2026-01-01 10:00:00")))
      val ex = intercept[Exception] { q.processAllAvailable() }
      def rootMsg(th: Throwable): String =
        Option(th.getCause).map(rootMsg).getOrElse(
          Option(th.getMessage).getOrElse(""))
      assert((Option(ex.getMessage).getOrElse("") + rootMsg(ex))
        .contains("no planned rate"), s"got: ${ex.getMessage}")
    } finally q.stop()
    // sub-second windows: the fractional form corrupts keys like the
    // milli form (review r12)
    intercept[IllegalArgumentException] {
      EventStream.boilerplateDigestsSketch(docs, window_ = "0.25 seconds")
    }
    // minCount < 2 publishes every distinct line (batch lineDedup's
    // guard, now on both streaming twins)
    intercept[IllegalArgumentException] {
      EventStream.boilerplateDigests(docs, minCount = 1)
    }
    intercept[IllegalArgumentException] {
      EventStream.boilerplateDigestsSketch(docs, minCount = 1)
    }
  }

  test("dedupDeltaStream: micro-batches dedup against the index AND each " +
      "other via the append loop; retried appends are no-ops") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "patient cat watches from the old wooden fence near the garden gate"
    val dir = tmpDir("graft-lshstream")
    graft.ops.Dedup.buildLshIndex(
      Seq((1L, base),
        (2L, "completely different content about spark engines and shuffles"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/idx")
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStream.dedupDeltaStream(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/idx", s"$dir/pairs")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // batch 0: a dup of indexed doc 1 + an unrelated doc
      input.addData((10L, base),
        (11L, "nothing matching anything else in this corpus at all truly"))
      q.processAllAvailable()
      // batch 1: a dup of BATCH-0 doc 10 — only visible if batch 0 was
      // folded into the index by the append loop
      input.addData((20L, base + " extra tail"))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b", "batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 10L, 0)), s"index-vs-batch0 pair: $pairs")
    assert(pairs.contains((10L, 20L, 1)),
      s"batch0 doc must be IN the index when batch1 arrives: $pairs")
    assert(pairs.contains((1L, 20L, 1)), s"original corpus still pairs: $pairs")
    assert(!pairs.exists(p => p._1 == 11L || p._2 == 11L),
      s"unrelated doc pairs nothing: $pairs")
    // retried append (same tag) is a no-op: shard count must not grow
    // (by NAME — r15 added n_buckets to the meta row)
    def shards() = { val m = spark.read.parquet(s"$dir/idx/meta").head()
      m.getAs[Int]("shards") }
    val before = shards()
    graft.ops.Dedup.appendToLshIndex(
      Seq((20L, base + " extra tail")).toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/idx", tag = "batch-1")
    assert(shards() == before, "same-tag append must be a no-op")
    graft.ops.Dedup.appendToLshIndex(
      Seq((30L, "genuinely new words arriving later on this stream"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/idx", tag = "batch-2")
    assert(shards() == before + 1, "new-tag append must land")
  }

  test("compactPairs (r18, VERDICT #6): the streaming loop's batch pair " +
      "dirs fold into a committed cluster table whose keep-set equals " +
      "the global clusterPairs over ALL pairs - incrementally, across " +
      "folds, with a watermark no-op") {
    import spark.implicits._
    import graft.ops.Dedup
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "patient cat watches from the old wooden fence near the garden gate"
    val dir = tmpDir("graft-pairfold")
    Dedup.buildLshIndex(
      Seq((1L, base),
        (2L, "completely different content about spark engines and shuffles"))
        .toDF("doc_id", "text"),
      "doc_id", "text", s"$dir/idx")
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStream.dedupDeltaStream(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/idx", s"$dir/pairs")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((10L, base),
        (11L, "nothing matching anything else in this corpus at all truly"))
      q.processAllAvailable()
      input.addData((20L, base + " extra tail"))
      q.processAllAvailable()
    } finally q.stop()
    def docsDf(ids: Seq[Long]) = ids.toDF("doc_id")
    def keepSet(df: org.apache.spark.sql.DataFrame) = df
      .filter(org.apache.spark.sql.functions.col("is_canonical") === 1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    def labelMap(df: org.apache.spark.sql.DataFrame) = df
      .select("doc_id", "cluster_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val docs1 = Seq(1L, 2L, 10L, 11L, 20L)
    // first fold: both batch dirs
    assert(Dedup.compactPairs(docsDf(docs1), "doc_id",
      s"$dir/pairs", s"$dir/clusters") == 2)
    val global1 = Dedup.clusterPairs(
      spark.read.parquet(s"$dir/pairs").select("id_a", "id_b"),
      docsDf(docs1), "doc_id")
    val got1 = Dedup.loadClusters(spark, s"$dir/clusters")
    assert(labelMap(got1) == labelMap(global1),
      "committed fold must equal the global clusterPairs")
    assert(keepSet(got1) == keepSet(global1))
    assert(keepSet(got1) == Set(1L, 2L, 11L),
      s"dups of doc 1 collapse onto it: ${keepSet(got1)}")
    // watermark: nothing new -> no-op, table untouched
    assert(Dedup.compactPairs(docsDf(docs1), "doc_id",
      s"$dir/pairs", s"$dir/clusters") == 0)
    // a later batch arrives (30 dups batch-0's 11) - the second fold
    // consumes ONLY batch=2, re-entering the previous fold as
    // contracted edges, and still equals the from-scratch collapse
    Dedup.dedupDelta(
        Seq((30L, "nothing matching anything else in this corpus at all " +
          "truly yes")).toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/idx", threshold = 0.5)
      .write.mode("overwrite").parquet(s"$dir/pairs/batch=2")
    val docs2 = docs1 :+ 30L
    assert(Dedup.compactPairs(docsDf(docs2), "doc_id",
      s"$dir/pairs", s"$dir/clusters") == 1)
    val global2 = Dedup.clusterPairs(
      spark.read.parquet(s"$dir/pairs").select("id_a", "id_b"),
      docsDf(docs2), "doc_id")
    val got2 = Dedup.loadClusters(spark, s"$dir/clusters")
    assert(labelMap(got2) == labelMap(global2),
      "incremental fold must equal the global collapse over all pairs")
    assert(keepSet(got2).contains(11L) && !keepSet(got2).contains(30L),
      s"the new dup must collapse onto its batch-0 canonical: ${keepSet(got2)}")
    // commit hygiene: exactly one live shard dir survives the sweep,
    // and the meta carries the fold watermark
    val shardDirs = new java.io.File(s"$dir/clusters/clusters").list()
      .filter(_.startsWith("shard=")).toSet
    assert(shardDirs == Set("shard=1"), shardDirs.toString)
    val m = spark.read.parquet(s"$dir/clusters/meta").head()
    assert(m.getAs[String]("tag") == "upto-2", m.toString)
  }

  test("simhashDeltaStream: the lean fingerprint twin of the LSH loop " +
      "pairs batches against the index and each other") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "patient cat watches from the old wooden fence near the garden gate"
    val dir = tmpDir("graft-simstream")
    graft.ops.Dedup.buildSimhashIndex(
      graft.ops.Dedup.simhash(
        Seq((1L, base),
          (2L, "completely different content about spark engines and shuffles"))
          .toDF("doc_id", "text")),
      s"$dir/idx", maxHamming = 3)
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStream.simhashDeltaStream(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/idx", s"$dir/pairs")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((10L, base),
        (11L, "nothing matching anything else in this corpus at all truly"))
      q.processAllAvailable()
      // batch 1 pairs against batch 0's doc only if the append landed
      input.addData((20L, base))
      q.processAllAvailable()
    } finally q.stop()
    val pairs = spark.read.parquet(s"$dir/pairs")
      .select("id_a", "id_b", "batch").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs.contains((1L, 10L, 0)), s"index-vs-batch0 pair: $pairs")
    assert(pairs.contains((10L, 20L, 1)),
      s"batch0 doc must be IN the index when batch1 arrives: $pairs")
    assert(pairs.contains((1L, 20L, 1)), s"original corpus still pairs: $pairs")
    assert(!pairs.exists(p => p._1 == 11L || p._2 == 11L),
      s"unrelated doc pairs nothing: $pairs")
    // retried tag is a no-op on the index frontier
    val before = spark.read.parquet(s"$dir/idx/meta").head()
      .getAs[Int]("shards")
    graft.ops.Dedup.appendToSimhashIndex(
      graft.ops.Dedup.simhash(Seq((20L, base)).toDF("doc_id", "text")),
      s"$dir/idx", tag = "batch-1")
    assert(spark.read.parquet(s"$dir/idx/meta").head()
      .getAs[Int]("shards") == before, "same-tag append must be a no-op")
  }

  test("bqAppendStream (r18): micro-batched vectors fold into the " +
      "persisted BQ index exactly; compaction interleaves with the " +
      "loop and the post-compact append carries the raised base") {
    import spark.implicits._
    import graft.ops.BqIndex
    def vec(i: Int) = Array.tabulate(12)(d =>
      math.sin(0.7 * i + 1.3 * d).toFloat)
    val dir = tmpDir("graft-bqstream")
    BqIndex.build((0 until 16).map(i => (i.toLong, vec(i)))
      .toDF("id", "vec"), s"$dir/idx")
    val input = MemoryStream[(Long, Array[Float])](spark)
    def loop() = EventStream.bqAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx")
      .option("checkpointLocation", s"$dir/ckpt").start()
    val q = loop()
    try {
      input.addData((100L, vec(100)), (101L, vec(101)))
      q.processAllAvailable()
      input.addData((102L, vec(102)))
      q.processAllAvailable()
    } finally q.stop()
    def top(qv: Int, k: Int) = BqIndex.query(spark, s"$dir/idx",
        Seq((-1L, vec(qv))).toDF("qid", "qvec"), k, fetch = 8)
      .collect().map(r => r.getLong(2)).toSet
    assert(top(102, 1) == Set(102L),
      "a streamed vector must be queryable as its batch commits")
    def meta() = { val m = spark.read.parquet(s"$dir/idx/meta").head()
      (m.getInt(m.fieldIndex("shards")), m.getInt(m.fieldIndex("base"))) }
    assert(meta() == ((2, 0)), "one shard per batch")
    // compact between stream runs; the next append carries the base
    BqIndex.compact(spark, s"$dir/idx")
    val q2 = loop()
    try {
      input.addData((103L, vec(103)))
      q2.processAllAvailable()
    } finally q2.stop()
    assert(meta() == ((5, 4)),
      "stream append after compact must carry base forward")
    assert(top(103, 1) == Set(103L),
      "pre- and post-compaction vectors must coexist")
    // exactness law across the whole streamed lifecycle: the sharded
    // index answers exactly as one-shot bqKnn over everything ingested
    val all = ((0 until 16).map(i => (i.toLong, vec(i))) ++
      (100 to 103).map(i => (i.toLong, vec(i)))).toDF("id", "vec")
    val queries = Seq((0L, vec(0)), (102L, vec(102))).toDF("qid", "qvec")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(t => (t._1, t._2))
    assert(rows(BqIndex.query(spark, s"$dir/idx", queries, 4, fetch = 10)) ==
      rows(graft.ops.Similarity.bqKnn(all, queries, 4, fetch = 10)),
      "streamed BQ lifecycle must equal the one-shot operator")
    // retried tag (the LAST committed batch) is a no-op on the frontier
    BqIndex.append(Seq((103L, vec(103))).toDF("id", "vec"), s"$dir/idx",
      tag = "batch-2")
    assert(meta() == ((5, 4)), "same-tag append must be a no-op")
  }

  test("ivfAppendStream: micro-batched vectors become queryable as " +
      "their batch commits; frozen centroids") {
    import spark.implicits._
    import graft.ops.IvfIndex
    def vecA(i: Int) = Array.tabulate(4)(d =>
      (if (d == 0) 1.0f else 0.01f * ((i + d) % 3)))
    def vecB(i: Int) = Array.tabulate(4)(d =>
      (if (d == 1) 1.0f else 0.01f * ((i + d) % 3)))
    val dir = tmpDir("graft-ivfstream")
    IvfIndex.build((0 until 16).map(i => (i.toLong, vecA(i))).toDF("id", "vec"),
      nCells = 2, refineIters = 1, persist = false).save(s"$dir/idx")
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = EventStream.ivfAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((100L, vecB(100)), (101L, vecB(101)))
      q.processAllAvailable()
      input.addData((102L, vecB(102)))
      q.processAllAvailable()
    } finally q.stop()
    val idx = IvfIndex.load(spark, s"$dir/idx", persist = false)
    val got = idx.query(Seq((-1L, vecB(102))).toDF("qid", "qvec"),
        k = 3, nProbe = 2)
      .collect().map(r => r.getLong(2)).toSet
    assert(got == Set(100L, 101L, 102L),
      s"both batches' vectors must be queryable: $got")
    val m = spark.read.parquet(s"$dir/idx/meta").head()
    assert(m.getInt(m.fieldIndex("shards")) == 2, "one shard per batch")

    // compaction interleaves with the ingest loop (r15): merge the
    // accumulated shards, then keep streaming — the append after
    // compaction must carry the raised base (a reset would re-select
    // crashed-cleanup garbage) and every vector stays queryable
    IvfIndex.compact(spark, s"$dir/idx")
    val q2 = EventStream.ivfAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((103L, vecB(103)))
      q2.processAllAvailable()
    } finally q2.stop()
    val idx3 = IvfIndex.load(spark, s"$dir/idx", persist = false)
    val got3 = idx3.query(Seq((-1L, vecB(102))).toDF("qid", "qvec"),
        k = 4, nProbe = 2)
      .collect().map(r => r.getLong(2)).toSet
    assert(got3 == Set(100L, 101L, 102L, 103L),
      s"pre-compaction and post-compaction vectors must coexist: $got3")
    val m3 = spark.read.parquet(s"$dir/idx/meta").head()
    assert(m3.getInt(m3.fieldIndex("shards")) == 5 &&
      m3.getInt(m3.fieldIndex("base")) == 4,
      "stream append after compact must carry base forward")

    // CAS guard (r16): a compact that commits DURING a streaming
    // append's window makes the append lose loudly — the batch fails,
    // the compact's commit stands untouched, and the stream's retry of
    // the same batch lands on the new frontier. Never a silently
    // clobbered shard.
    graft.ops.IvfIndex.beforeCasCommit = () => {
      graft.ops.IvfIndex.beforeCasCommit = () => ()
      graft.ops.IvfIndex.compact(spark, s"$dir/idx")
    }
    try {
      val q3 = EventStream.ivfAppendStream(
          input.toDF().toDF("id", "vec"), s"$dir/idx")
        .option("checkpointLocation", s"$dir/ckpt").start()
      val exq = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
        try {
          input.addData((104L, vecB(104)))
          q3.processAllAvailable()
        } finally q3.stop()
      }
      def rootMsg(t: Throwable): String =
        (Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
          .map(e => Option(e.getMessage).getOrElse("")) ++ Iterator("")).mkString(" | ")
      assert(rootMsg(exq).contains("lost the commit race"), rootMsg(exq))
    } finally { graft.ops.IvfIndex.beforeCasCommit = () => () }
    // the compact (winner) committed: base == shards == merged dir
    val m4 = spark.read.parquet(s"$dir/idx/meta").head()
    assert(m4.getInt(m4.fieldIndex("shards")) == 7 &&
      m4.getInt(m4.fieldIndex("base")) == 7,
      "compact's commit must stand after winning the race")
    // stream restart replays the failed batch against the new frontier
    val q4 = EventStream.ivfAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try q4.processAllAvailable() finally q4.stop()
    val idx5 = IvfIndex.load(spark, s"$dir/idx", persist = false)
    val got5 = idx5.query(Seq((-1L, vecB(102))).toDF("qid", "qvec"),
        k = 5, nProbe = 2)
      .collect().map(r => r.getLong(2)).toSet
    assert(got5 == Set(100L, 101L, 102L, 103L, 104L),
      s"retried batch must land after the lost race: $got5")
    val m5 = spark.read.parquet(s"$dir/idx/meta").head()
    assert(m5.getInt(m5.fieldIndex("shards")) == 8 &&
      m5.getInt(m5.fieldIndex("base")) == 7, "retry lands on the new frontier")
  }

  test("bm25AppendStream: queries between batches equal a batch rebuild " +
      "over everything ingested; maintenance bounds live shards (r16)") {
    import spark.implicits._
    import graft.ops.Relevance
    def doc(i: Int, extra: String) =
      s"spark $extra pipeline with shuffle and sort keys " +
        ("filler words pad the document length " * (1 + i % 3))
    val seed = (0 until 4).map(i => (i.toLong,
      doc(i, if (i % 2 == 0) "join hash" else "join")))
    val dir = tmpDir("graft-bm25stream")
    Relevance.buildIndex(seed.toDF("doc_id", "text"), "doc_id", "text",
      s"$dir/idx")
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStream.bm25AppendStream(
        input.toDF().toDF("doc_id", "text"), "doc_id", "text", s"$dir/idx",
        maintainEvery = 2, maxLiveShards = 2)
      .option("checkpointLocation", s"$dir/ckpt").start()
    val streamed = (0 until 5).map(b =>
      (100L + b, doc(100 + b, if (b % 2 == 0) "dup hash" else "dup join")))
    try {
      streamed.foreach { row =>
        input.addData(row)
        q.processAllAvailable()
      }
    } finally q.stop()
    val terms = Seq("join", "hash", "dup")
    val viaIndex = Relevance.queryIndex(spark, s"$dir/idx", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val direct = Relevance.bm25((seed ++ streamed).toDF("doc_id", "text"),
        "doc_id", "text", terms)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == direct,
      s"streamed index must equal the batch rebuild:\n$viaIndex\n$direct")
    val m = spark.read.parquet(s"$dir/idx/stats").head()
    val live = m.getInt(m.fieldIndex("shards")) - m.getInt(m.fieldIndex("base")) + 1
    assert(live <= 3, s"maintenance must bound live shards: $live")
    assert(m.getInt(m.fieldIndex("base")) > 0, "at least one compact ran")
  }

  test("dedupDeltaStream with maintainEvery: the ingest loop compacts " +
      "its own LSH index - live shards bounded, cross-batch pairing " +
      "intact through the merges (r16)") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog while the " +
      "patient cat watches from the old wooden fence near the garden gate"
    val dir = tmpDir("graft-lshmaint")
    graft.ops.Dedup.buildLshIndex(
      Seq((1L, base)).toDF("doc_id", "text"), "doc_id", "text", s"$dir/idx")
    val input = MemoryStream[(Long, String)](spark)
    val q = EventStream.dedupDeltaStream(
        input.toDF().toDF("doc_id", "text"),
        "doc_id", "text", s"$dir/idx", s"$dir/pairs",
        maintainEvery = 2, maxLiveShards = 2)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      (0 until 6).foreach { b =>
        // every batch carries one dup of the base doc (pairs against
        // the BUILD shard and all prior batches) + one unique doc
        input.addData((100L + 2 * b, base + s" tail$b"),
          (101L + 2 * b, s"unique content $b that matches nothing else here at all"))
        q.processAllAvailable()
      }
    } finally q.stop()
    val m = spark.read.parquet(s"$dir/idx/meta").head()
    val live = m.getInt(m.fieldIndex("shards")) - m.getInt(m.fieldIndex("base")) + 1
    assert(live <= 3, s"ingest-loop maintenance must bound live shards: $live")
    assert(m.getInt(m.fieldIndex("base")) > 0, "at least one compact ran")
    // batch 5's dup pairs against the build doc AND every earlier
    // batch's dup — all of which live in MERGED shards by now
    val last = spark.read.parquet(s"$dir/pairs/batch=5")
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = (Seq(1L) ++ (0 until 5).map(b => 100L + 2 * b))
      .map(a => (a, 110L)).toSet
    assert(last == expect,
      s"cross-batch pairing must survive the merges: $last vs $expect")
  }

  test("ivfAppendStream with maintainEvery: live shards stay bounded " +
      "for the stream's life, maintenance reports surface, drift " +
      "blocks the merge (r16)") {
    import spark.implicits._
    import graft.ops.IvfIndex
    def vecA(i: Int) = Array.tabulate(4)(d =>
      (if (d == 0) 1.0f else 0.01f * ((i + d) % 3)))
    def vecS(i: Int) = Array.tabulate(4)(d =>
      (if (d == 2) 1.0f else 0.005f * ((i + d) % 3)))
    val dir = tmpDir("graft-ivfmaint")
    IvfIndex.build((0 until 16).map(i => (i.toLong, vecA(i))).toDF("id", "vec"),
      nCells = 2, refineIters = 1, persist = false).save(s"$dir/idx")
    val reports = scala.collection.mutable.ArrayBuffer.empty[IvfIndex.Maintenance]
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = EventStream.ivfAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx",
        maintainEvery = 2, maxLiveShards = 1,
        onMaintain = r => { reports += r; () })
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      // 6 rows per batch covering the fixture's full %3 pattern cycle:
      // a shard's mean residual then matches the build population's
      // (a 1-row shard would read as drift — one far pattern variant
      // alone crosses 1.5x the build mean)
      (0 until 5).foreach { b =>
        input.addData((0 until 6).map(j =>
          (100L + 10 * b + j, vecA(100 + 10 * b + j))): _*)
        q.processAllAvailable()
      }
    } finally q.stop()
    val m = spark.read.parquet(s"$dir/idx/meta").head()
    val live = m.getInt(m.fieldIndex("shards")) - m.getInt(m.fieldIndex("base")) + 1
    assert(live <= 2, s"maintenance must bound live shards: $live")
    assert(reports.count(_.compacted) == 2 && !reports.exists(_.rebuildFlagged),
      s"in-distribution ingest: every maintenance pass merges: $reports")
    // one probe per batch: every batch's vectors survive the merges
    // no row lost through any merge: all 16 build + 30 streamed ids
    // stand in the live layout (the %3-periodic fixture makes top-k
    // membership untestable — exact ties resolve to smallest ids)
    val liveIds = spark.read.parquet(s"$dir/idx/assigned")
      .filter(col("shard") >= m.getInt(m.fieldIndex("base")) &&
        col("shard") <= m.getInt(m.fieldIndex("shards")))
      .select("id").collect().map(_.getLong(0)).toSet
    val wantIds = (0 until 16).map(_.toLong).toSet ++
      (0 until 5).flatMap(b => (0 until 6).map(j => 100L + 10 * b + j))
    assert(liveIds == wantIds,
      s"every build and batch id must survive the maintenance merges: " +
        s"missing=${wantIds -- liveIds} extra=${liveIds -- wantIds}")

    // a DRIFTED batch flags the rebuild and leaves the layout alone
    val q2 = EventStream.ivfAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx",
        maintainEvery = 1, maxLiveShards = 1,
        onMaintain = r => { reports += r; () })
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((200L, vecS(0)), (201L, vecS(1)))
      q2.processAllAvailable()
    } finally q2.stop()
    val last = reports.last
    assert(last.rebuildFlagged && !last.compacted && last.maxDriftRatio > 1.5,
      s"shifted batch must flag, not merge: $last")
  }

  test("Gopher and C4 filters are stateless: streaming output equals batch") {
    val rows = Seq(
      (1L, ("the quick brown fox jumps over a lazy dog to rest " +
        "and we have seen it move with grace of form be calm ") * 3,
        t("2026-01-01 10:00:00")),
      (2L, "- a\n- b\n- c", t("2026-01-01 10:01:00")),
      (3L, "Good first sentence is here.\njunk\nSecond good sentence " +
        "is here.\nThird good sentence is here.", t("2026-01-01 10:02:00")))
    val batchDf = spark.createDataFrame(rows).toDF("doc_id", "text", "ts")
    val gBatch = graft.ops.GopherRules.keep(batchDf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val cBatch = graft.ops.C4Rules.clean(batchDf)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap

    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q1 = graft.ops.GopherRules.keep(docs)
      .writeStream.format("memory").queryName("gopher_out")
      .outputMode(OutputMode.Append()).start()
    val q2 = graft.ops.C4Rules.clean(docs)
      .writeStream.format("memory").queryName("c4_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q1.processAllAvailable(); q2.processAllAvailable()
      val gStream = spark.table("gopher_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val cStream = spark.table("c4_out").select("doc_id", "text")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(gStream == gBatch && gBatch == Set(1L))
      assert(cStream == cBatch && cBatch.keySet == Set(3L))
      assert(cBatch(3L) == "Good first sentence is here.\nSecond good " +
        "sentence is here.\nThird good sentence is here.")
    } finally { q1.stop(); q2.stop() }
  }

  test("unigram encode is stateless: streaming output equals batch " +
      "(deterministic sampled form included under a fixed seed)") {
    import graft.ops.{Unigram, UnigramModel}
    val pairs = (('a' to 'z').map(c => String.valueOf(c) -> 8)) ++
      Seq("th" -> 11, "er" -> 12, "in" -> 11)
    val m = UnigramModel(pairs.map(_._1).toVector,
      pairs.map(p => -p._2.toDouble).toVector, unkLogp = -64.0)
    val rows = Seq(
      (1L, "there is something here", t("2026-01-01 10:00:00")),
      (2L, "inner thing spins", t("2026-01-01 10:01:00")))
    def enc(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        Unigram.encodeCol(
          graft.functions.TextFunctions.words(col("text")), m)
          .getField("toks").as("toks"),
        Unigram.encodeSampledCol(
          graft.functions.TextFunctions.words(col("text")),
          col("doc_id"), m, k = 4, alpha = 0.2)
          .getField("toks").as("sampled"))
    val batch = enc(spark.createDataFrame(rows).toDF("doc_id", "text", "ts"))
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getString(2))))
      .toMap
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = enc(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("uni_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("uni_out").collect()
        .map(r => r.getLong(0) -> ((r.getString(1), r.getString(2)))).toMap
      assert(stream == batch, s"stream $stream vs batch $batch")
    } finally q.stop()
  }

  test("wordpiece encode is stateless: streaming output equals batch (r15)") {
    import graft.ops.{WordPiece, WordPieceVocab}
    val v = WordPieceVocab(
      ('a' to 'z').flatMap(c => Seq(c.toString, "##" + c)).toVector ++
        Vector("th", "##er", "in", "##ing"))
    val rows = Seq(
      (1L, "there is something here", t("2026-01-01 10:00:00")),
      (2L, "inner thing spins", t("2026-01-01 10:01:00")))
    def enc(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"),
        WordPiece.encodeCol(
          graft.functions.TextFunctions.words(col("text")), v)
          .getField("toks").as("toks"))
    val batch = enc(spark.createDataFrame(rows).toDF("doc_id", "text", "ts"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val q = enc(input.toDF().toDF("doc_id", "text", "ts"))
      .writeStream.format("memory").queryName("wp_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(rows: _*)
      q.processAllAvailable()
      val stream = spark.table("wp_out").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(stream == batch, s"stream $stream vs batch $batch")
      assert(batch(1L).startsWith("th ##er ##e"), batch(1L))
    } finally q.stop()
  }

  test("dedupStream runs on a BATCH frame; all-boilerplate docs can emit " +
    "a marker (review r11)") {
    // batch fallback: dropDuplicatesWithinWatermark is stream-only
    val batch = Seq(
      (1L, "same text", t("2026-01-01 10:00:00")),
      (2L, "same text", t("2026-01-01 10:01:00")),
      (3L, "other", t("2026-01-01 10:02:00"))).toDF("doc_id", "text", "ts")
    assert(EventStream.dedupStream(batch).count() == 2)
    // marker row lets a sink distinguish became-empty from never-arrived
    val digests = Seq(md5hex("all boiler")).toDF("__h")
    val docs = Seq((1L, "all boiler", t("2026-01-01 10:00:00")),
      (2L, "kept line", t("2026-01-01 10:00:00"))).toDF("doc_id", "text", "ts")
    val noMarker = EventStream.stripBoilerplateLines(docs, digests)
      .select("doc_id").as[Long].collect().toSet
    assert(noMarker == Set(2L))
    val marked = EventStream.stripBoilerplateLines(docs, digests,
        emitDocMarker = true)
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(marked == Set((1L, -1), (2L, -1), (2L, 0)),
      s"every doc must carry a marker, survivors their lines: $marked")
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  test("stripBoilerplateLines drops blocked lines statelessly in streaming") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val boiler = Seq(Tuple1("COOKIE BANNER")).toDF("line")
      .select(md5(col("line").cast("binary")).as("__h"))
    val q = EventStream.stripBoilerplateLines(docs, boiler)
      .writeStream.format("memory").queryName("strip_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "keep one\nCOOKIE BANNER\nkeep two", t("2026-01-01 10:00:00")),
        (2L, "COOKIE BANNER", t("2026-01-01 10:01:00")))
      q.processAllAvailable()
      val rows = spark.table("strip_out").select("doc_id", "pos", "line")
        .as[(Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(rows == Seq((1L, 0, "keep one"), (1L, 2, "keep two")))
    } finally q.stop()
  }

  test("decontaminateHits: stateless streaming verdicts match batch " +
    "decontaminate") {
    // benchmark: one fixed 3-gram phrase; doc 1 contains it twice,
    // doc 2 is clean, doc 3 contains it once
    val bench = Seq((100L, "the secret eval phrase")).toDF("doc_id", "text")
    val docsB = Seq(
      (1L, "x the secret eval phrase y the secret eval phrase"),
      (2L, "completely unrelated text here"),
      (3L, "prefix the secret eval phrase")).toDF("doc_id", "text")
    val batch = graft.ops.Dedup.decontaminate(docsB, bench)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val shingles = graft.ops.Dedup.benchmarkShingles(bench)
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.decontaminateHits(docs, shingles)
      .writeStream.format("memory").queryName("decon_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "x the secret eval phrase y the secret eval phrase", t("2026-01-01 10:00:00")),
        (2L, "completely unrelated text here", t("2026-01-01 10:01:00")),
        (3L, "prefix the secret eval phrase", t("2026-01-01 10:02:00")))
      q.processAllAvailable()
      // sink-side per-doc count of hit rows IS the batch n_hits
      val stream = spark.table("decon_out").groupBy("doc_id")
        .agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
      assert(stream == batch && batch.keySet == Set(1L, 3L),
        s"stream $stream must equal batch $batch")
      // shingle sets are DISTINCT per doc (ShingleHashes canonicalizes),
      // so both contaminated docs hit the benchmark's 2 shared 3-grams
      assert(batch(1L) == 2L && batch(3L) == 2L, s"got $batch")
    } finally q.stop()
  }

  test("curateStream redacts PII in-flight when asked") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.curateStream(docs, minWords = 5, redact = true)
      .writeStream.format("memory").queryName("curate_pii_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "the cat and the dog wrote to a.b@ex.org from 10.0.0.1 today",
          t("2026-01-01 10:00:00")))
      q.processAllAvailable()
      val txt = spark.table("curate_pii_out").select("text").as[String].head()
      assert(txt == "the cat and the dog wrote to <EMAIL> from <IP> today")
    } finally q.stop()
  }

  test("deterministic sampling + repetition gate compose in streaming") {
    // stateless hash-filters (Sampling.bernoulli) and the per-row
    // repetition expression run unchanged on a stream — and the kept
    // set is the SAME set a batch run over the same rows keeps
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val gated = graft.ops.Sampling.bernoulli(docs, "doc_id", 0.5)
      .withColumn("r", graft.functions.CatalystFunctions.repetitionStats(col("text")))
      .filter(col("r.top_2gram_frac") < 0.9)
      .select("doc_id")
    val q = gated.writeStream.format("memory").queryName("sample_out")
      .outputMode(OutputMode.Append()).start()
    val data = (1L to 40L).map(i =>
      (i, if (i % 10 == 0) "spam spam spam spam" else s"unique words number $i here",
        t("2026-01-01 10:00:00")))
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("sample_out").as[Long].collect().toSet
      val batch = graft.ops.Sampling.bernoulli(
          data.toDF("doc_id", "text", "ts"), "doc_id", 0.5)
        .withColumn("r", graft.functions.CatalystFunctions.repetitionStats(col("text")))
        .filter(col("r.top_2gram_frac") < 0.9)
        .select("doc_id").as[Long].collect().toSet
      assert(streamed == batch, "stream and batch must keep the same sample")
      assert(streamed.nonEmpty && streamed.size < 40)
      // the boilerplate docs (every 10th) are pure repetition — the
      // gate drops them no matter how the sample fell
      assert(!streamed.exists(_ % 10 == 0))
    } finally q.stop()
  }

  test("stream-published boilerplate digests converge to the batch d21 set") {
    // the COUNT half of lineDedup in-stream: the stream publishes its
    // own digest set; strip(stream digests) must equal batch lineDedup
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.boilerplateDigests(docs, minCount = 2,
        watermark = "10 minutes", window_ = "1 hour")
      .writeStream.format("memory").queryName("boiler_out")
      .outputMode(OutputMode.Append()).start()
    val data = Seq(
      (1L, "subscribe now\nreal content one\n\nshared footer", t("2026-01-01 10:01:00")),
      (2L, "subscribe now\nreal content two\n\nshared footer", t("2026-01-01 10:12:00")),
      (3L, "all original here\nnothing repeated", t("2026-01-01 10:25:00")))
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((99L, "tick", t("2026-01-01 12:00:00"))) // close the window
      q.processAllAvailable()
      val streamed = spark.table("boiler_out").select("__h")
        .as[String].collect().toSet
      // batch rule over the same docs: content-bearing lines with
      // count >= 2 (blank separator lines are structure, never counted)
      val batchBoiler = data.toDF("doc_id", "text", "ts")
        .select(posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
        .filter(length(col("line")) > 0)
        .groupBy(md5(col("line").cast("binary")).as("__h"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .select("__h").as[String].collect().toSet
      assert(streamed == batchBoiler,
        s"stream digests $streamed != batch $batchBoiler")
      assert(streamed.size == 2) // "subscribe now" + "shared footer"
      // end-to-end: stripping with the STREAM-published set leaves the
      // same surviving lines as the batch lineDedup boilerplate rule
      val digests = spark.table("boiler_out").select("__h")
      val stripped = EventStream.stripBoilerplateLines(
          data.toDF("doc_id", "text", "ts"), digests)
        .groupBy("doc_id")
        .agg(expr("concat_ws('\n', transform(array_sort(" +
          "collect_list(struct(pos, line))), x -> x.line))").as("text"))
      val batch = graft.ops.Dedup.lineDedup(
          data.toDF("doc_id", "text", "ts"), minCount = 2)
        .select("doc_id", "text")
      val got = stripped.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = batch.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"stripped $got != batch lineDedup $want")
    } finally q.stop()
  }

  test("boilerplateDigests drops data later than the watermark (bounded state)") {
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.boilerplateDigests(docs, minCount = 2,
        watermark = "10 minutes", window_ = "1 hour")
      .writeStream.format("memory").queryName("boiler_late")
      .outputMode(OutputMode.Append()).start()
    try {
      // one occurrence inside the 10:00 window, then advance the
      // watermark far past that window's end
      input.addData((1L, "late line", t("2026-01-01 10:05:00")))
      q.processAllAvailable()
      input.addData((2L, "tick", t("2026-01-01 15:00:00")))
      q.processAllAvailable()
      // a second "late line" occurrence arrives hours late: its window
      // is closed, so state was reclaimed and the pair NEVER reaches
      // minCount — bounded state means late stragglers cannot resurrect
      // expired windows
      input.addData((3L, "late line", t("2026-01-01 10:06:00")))
      q.processAllAvailable()
      input.addData((4L, "tick2", t("2026-01-01 16:00:00")))
      q.processAllAvailable()
      assert(spark.table("boiler_late").count() == 0,
        "closed-window stragglers must not publish digests")
    } finally q.stop()
  }

  test("streaming mixture sampler: window-planned rates equal the batch " +
    "plan; the stateless apply half keeps the identical set") {
    // plan half: per-window (source, tokens) totals finalize in append
    // mode; ratesFromTotals (the SAME algebra as batch mixtureRates)
    // then plans from the closed window
    val input = MemoryStream[(Long, String, Long, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "source", "n_words", "ts")
    val q = EventStream.mixtureTokenTotals(docs, "source", col("n_words"),
        watermark = "10 minutes", window_ = "1 hour")
      .writeStream.format("memory").queryName("mix_totals")
      .outputMode(OutputMode.Append()).start()
    val data = (1L to 300L).map { i =>
      val src = if (i % 3 == 0) "web" else if (i % 3 == 1) "books" else "code"
      (i, src, 40L + i % 7, t(f"2026-01-01 10:${i % 60}%02d:00"))
    }
    val weights = Map("web" -> 0.6, "books" -> 0.4) // code unlisted: drops
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      input.addData((999L, "web", 1L, t("2026-01-01 13:00:00"))) // close
      q.processAllAvailable()
      val closed = spark.table("mix_totals")
        .filter(col("window_start") === t("2026-01-01 10:00:00"))
        .select("source", "n_tokens")
      val streamRates = graft.ops.Sampling
        .ratesFromTotals(closed, "source", weights)
        .select("source", "rate").as[(String, Double)].collect().toMap
      val batchDf = data.toDF("doc_id", "source", "n_words", "ts")
      val batchRates = graft.ops.Sampling
        .mixtureRates(batchDf, "source", col("n_words"), weights)
        .select("source", "rate").as[(String, Double)].collect().toMap
      // bit-for-bit: same totals, same double arithmetic
      assert(streamRates == batchRates,
        s"stream-planned rates $streamRates != batch $batchRates")
      assert(streamRates.values.max == 1.0, "binding source at rate 1.0")
    } finally q.stop()

    // apply half: the stateless stream-static join keeps EXACTLY the
    // batch mixtureSample set for the same rates
    val batchDf = data.toDF("doc_id", "source", "n_words", "ts")
    val rates = graft.ops.Sampling.mixtureRates(batchDf, "source",
      col("n_words"), weights)
    val input2 = MemoryStream[(Long, String, Long, Timestamp)](spark)
    val q2 = EventStream.mixtureSampleStream(
        input2.toDF().toDF("doc_id", "source", "n_words", "ts"),
        "doc_id", "source", rates)
      .writeStream.format("memory").queryName("mix_kept")
      .outputMode(OutputMode.Append()).start()
    try {
      input2.addData(data: _*)
      q2.processAllAvailable()
      val streamKept = spark.table("mix_kept").select("doc_id")
        .as[Long].collect().toSet
      val batchKept = graft.ops.Sampling.mixtureSample(batchDf, "doc_id",
        "source", col("n_words"), weights).select("doc_id")
        .as[Long].collect().toSet
      assert(streamKept == batchKept,
        s"stream kept ${streamKept.size} != batch kept ${batchKept.size}")
      assert(streamKept.nonEmpty && !data.map(_._1).toSet.subsetOf(streamKept),
        "sampler must keep a strict non-empty subset")
    } finally q2.stop()
  }

  test("boilerplateDigestsSketch converges to the exact digest set (no collisions)") {
    // at fixture scale the sketch has no collisions, so its published
    // set must equal the exact variant's — and feeding it to
    // stripBoilerplateLines must reproduce the batch lineDedup rule,
    // proving the sketch is a drop-in for the same downstream
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.boilerplateDigestsSketch(docs, minCount = 2,
        watermark = "10 minutes", window_ = "1 hour")
      .writeStream.format("memory").queryName("boiler_cms_conv")
      .outputMode(OutputMode.Append()).start()
    val data = Seq(
      (1L, "subscribe now\nreal content one\n\nshared footer", t("2026-01-01 10:01:00")),
      (2L, "subscribe now\nreal content two\n\nshared footer", t("2026-01-01 10:12:00")),
      (3L, "all original here\nnothing repeated", t("2026-01-01 10:25:00")))
    try {
      input.addData(data: _*)
      q.processAllAvailable()
      val streamed = spark.table("boiler_cms_conv").select("__h")
        .as[String].collect().toSet
      val batchBoiler = data.toDF("doc_id", "text", "ts")
        .select(posexplode(split(col("text"), "\n")).as(Seq("pos", "line")))
        .filter(length(col("line")) > 0)
        .groupBy(md5(col("line").cast("binary")).as("__h"))
        .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
        .select("__h").as[String].collect().toSet
      assert(streamed == batchBoiler,
        s"sketch digests $streamed != exact $batchBoiler")
      val stripped = EventStream.stripBoilerplateLines(
          data.toDF("doc_id", "text", "ts"),
          spark.table("boiler_cms_conv").select("__h"))
        .groupBy("doc_id")
        .agg(expr("concat_ws('\n', transform(array_sort(" +
          "collect_list(struct(pos, line))), x -> x.line))").as("text"))
      val batch = graft.ops.Dedup.lineDedup(
          data.toDF("doc_id", "text", "ts"), minCount = 2)
        .select("doc_id", "text")
      val got = stripped.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      val want = batch.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == want, s"stripped $got != batch lineDedup $want")
    } finally q.stop()
  }

  test("boilerplateDigestsSketch: bounded state under a unique-line flood") {
    // the adversarial regime the exact variant cannot bound: 200 docs,
    // 400 distinct lines, one repeated banner. The sketch must publish
    // exactly the banner and hold ONE state row (the active window) —
    // the exact variant would hold one row per distinct digest.
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.boilerplateDigestsSketch(docs, minCount = 2,
        watermark = "10 minutes", window_ = "1 hour", width = 4096)
      .writeStream.format("memory").queryName("boiler_cms")
      .outputMode(OutputMode.Append()).start()
    try {
      val flood = (1L to 200L).map(i => (i,
        s"unique line $i alpha\nSUBSCRIBE BANNER\nunique line $i beta",
        t("2026-01-01 10:01:00")))
      input.addData(flood: _*)
      q.processAllAvailable()
      // accumulation across batches too: a second batch re-crossing
      // minCount must not re-publish the already-published digest
      input.addData((500L, "SUBSCRIBE BANNER\nfresh tail", t("2026-01-01 10:30:00")))
      q.processAllAvailable()
      val banner = Seq("SUBSCRIBE BANNER").toDF("l")
        .select(md5(col("l").cast("binary"))).as[String].head()
      val published = spark.table("boiler_cms").select("__h")
        .as[String].collect().toSeq
      assert(published == Seq(banner),
        s"published $published, want exactly the banner digest once")
      val stateRows = q.recentProgress
        .flatMap(_.stateOperators.map(_.numRowsTotal)).max
      assert(stateRows == 1,
        s"sketch state must scale with active windows, not lines; got $stateRows rows")
      // state reclaimed once the watermark passes the window end: the
      // two ticks open their own (still-live) window groups, so after
      // the flood window times out exactly those 2 rows remain — the
      // flood window's 128 KB sketch is gone
      input.addData((900L, "tick", t("2026-01-01 15:00:00")))
      q.processAllAvailable()
      input.addData((901L, "tick2", t("2026-01-01 16:00:00")))
      q.processAllAvailable()
      val lastRows = q.recentProgress.last.stateOperators.map(_.numRowsTotal).sum
      assert(lastRows == 2, s"expired flood-window state not reclaimed: $lastRows rows")
    } finally q.stop()
  }

  test("boilerplateDigestsSketch emits the saturation sentinel exactly at the cap") {
    // maxPublish = 2, FOUR boilerplate lines each crossing minCount:
    // exactly 2 real digests publish, then ONE sentinel row marks the
    // cap — and later qualifying digests (line D, and a second batch
    // re-crossing) must not repeat it (VERDICT r7 #2)
    val input = MemoryStream[(Long, String, Timestamp)](spark)
    val docs = input.toDF().toDF("doc_id", "text", "ts")
    val q = EventStream.boilerplateDigestsSketch(docs, minCount = 2,
        watermark = "10 minutes", window_ = "1 hour", maxPublish = 2)
      .writeStream.format("memory").queryName("boiler_cms_sat")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        (1L, "AAA banner\nBBB banner\nCCC banner", t("2026-01-01 10:01:00")),
        (2L, "AAA banner\nBBB banner\nCCC banner", t("2026-01-01 10:02:00")))
      q.processAllAvailable()
      input.addData(
        (3L, "DDD banner\nCCC banner", t("2026-01-01 10:03:00")),
        (4L, "DDD banner", t("2026-01-01 10:04:00")))
      q.processAllAvailable()
      val rows = spark.table("boiler_cms_sat")
        .select("__h", "n_est", "saturated").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
      // the saturated flag is the authoritative marker (ADVICE r8) and
      // must agree exactly with the in-band sentinel digest
      assert(rows.forall(r =>
          r._3 == (r._1 == EventStream.SaturatedSentinel)),
        s"saturated flag must mark exactly the sentinel row, got ${rows.toSeq}")
      val sentinels = rows.filter(_._3)
      val real = rows.filter(!_._3)
      assert(real.length == 2,
        s"cap must buy exactly maxPublish real digests, got ${real.toSeq}")
      assert(sentinels.toSeq ==
          Seq((EventStream.SaturatedSentinel, 2L, true)),
        s"want ONE sentinel carrying the cap, got ${sentinels.toSeq}")
      // the sentinel is inert downstream: stripBoilerplateLines must
      // not drop any line because of it
      val survivors = EventStream.stripBoilerplateLines(
          Seq((9L, "ZZZ unique line", t("2026-01-01 10:05:00")))
            .toDF("doc_id", "text", "ts"),
          spark.table("boiler_cms_sat").select("__h"))
      assert(survivors.count() == 1, "sentinel digest must never match a line")
    } finally q.stop()
  }

  test("streaming WARC landing dir: per-micro-batch file pickup, " +
      "extraction equals the batch reader (stream-batch parity)") {
    import graft.io.{WarcIO, WarcRecord}
    val dir = tmpDir("graft-warc-stream")
    val landing = s"$dir/landing"
    new java.io.File(landing).mkdirs()
    def responseRecord(id: Int): WarcRecord = {
      val html = s"<html><body><p>Streamed page $id text body.</p></body></html>"
      WarcRecord("", id, "response", s"https://s.test/$id",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        Map.empty, ("HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" +
          html).getBytes("UTF-8"))
    }
    WarcIO.writeWarc(s"$landing/a.warc.gz", Seq(responseRecord(1)), gzip = true)
    // the SAME downstream chain as batch: envelope split + HTML strip
    val extracted = WarcIO.readWarcStream(spark, landing)
      .filter(col("warc_type") === "response")
      .select(col("target_uri"),
        graft.functions.TextFunctions.stripHtml(
          WarcIO.payloadText(WarcIO.httpBody(col("content")))).as("text"))
    val q = extracted.writeStream.format("memory").queryName("warc_out")
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      q.processAllAvailable()
      // second file lands AFTER the first micro-batch — only the new
      // file is parsed next round
      WarcIO.writeWarc(s"$landing/b.warc.gz",
        Seq(responseRecord(2), responseRecord(3)), gzip = true)
      q.processAllAvailable()
      val got = spark.table("warc_out")
        .as[(String, String)].collect().toSet
      val batch = WarcIO.readWarc(spark, s"$landing/*.warc.gz")
        .filter(col("warc_type") === "response")
        .select(col("target_uri"),
          graft.functions.TextFunctions.stripHtml(
            WarcIO.payloadText(WarcIO.httpBody(col("content")))).as("text"))
        .as[(String, String)].collect().toSet
      assert(got == batch, s"stream $got vs batch $batch")
      assert(got == Set(
        ("https://s.test/1", "Streamed page 1 text body."),
        ("https://s.test/2", "Streamed page 2 text body."),
        ("https://s.test/3", "Streamed page 3 text body.")))
    } finally q.stop()
  }

  test("mapGroupsWithState running totals accumulate across batches") {
    val input = MemoryStream[Ev](spark)
    val q = EventStream.runningTotals(input.toDF())
      .writeStream.format("memory").queryName("tot_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(Ev(1, "a", t("2026-01-01 10:00:00"), 2.0),
        Ev(1, "a", t("2026-01-01 10:01:00"), 3.0))
      q.processAllAvailable()
      input.addData(Ev(1, "a", t("2026-01-01 10:02:00"), 5.0))
      q.processAllAvailable()
      val last = spark.table("tot_out").filter(col("userId") === 1)
        .orderBy(col("nEvents").desc).select("nEvents", "total")
        .collect().head
      assert(last.getLong(0) == 3L && last.getDouble(1) == 10.0)
    } finally q.stop()
  }

  test("ingest loop with lockWaitMs (r17): a batch arriving while a " +
      "maintenance process holds the index writer lock WAITS for the " +
      "release instead of CAS-racing, then lands; the lock is clean " +
      "after") {
    import spark.implicits._
    import graft.ops.{IvfIndex, WriterLock}
    def vecA(i: Int) = Array.tabulate(4)(d =>
      (if (d == 0) 1.0f else 0.01f * ((i + d) % 3)))
    val dir = tmpDir("graft-ivflock")
    IvfIndex.build((0 until 8).map(i => (i.toLong, vecA(i))).toDF("id", "vec"),
      nCells = 2, refineIters = 1, persist = false).save(s"$dir/idx")
    // a cooperating "CLI maintenance process" holds the lock
    val holding = new java.util.concurrent.CountDownLatch(1)
    val releaseIt = new java.util.concurrent.CountDownLatch(1)
    val holder = new Thread(() =>
      WriterLock.withLock(spark, s"$dir/idx", owner = "cli-compact") {
        holding.countDown()
        releaseIt.await(60, java.util.concurrent.TimeUnit.SECONDS)
        ()
      })
    holder.start()
    assert(holding.await(15, java.util.concurrent.TimeUnit.SECONDS))
    val input = MemoryStream[(Long, Array[Float])](spark)
    val q = EventStream.ivfAppendStream(
        input.toDF().toDF("id", "vec"), s"$dir/idx", lockWaitMs = 60000L)
      .option("checkpointLocation", s"$dir/ckpt").start()
    try {
      input.addData((100 until 104).map(i => (i.toLong, vecA(i))): _*)
      // while the lock is held the batch must not have committed
      Thread.sleep(2000L)
      val m0 = spark.read.parquet(s"$dir/idx/meta").head()
      assert(m0.getInt(m0.fieldIndex("shards")) == 0,
        "the locked batch must wait, not commit")
      releaseIt.countDown(); holder.join(30000L)
      q.processAllAvailable()
      val m1 = spark.read.parquet(s"$dir/idx/meta").head()
      assert(m1.getInt(m1.fieldIndex("shards")) == 1 &&
        m1.getString(m1.fieldIndex("tag")) == "batch-0",
        "the batch must land once the maintenance process releases")
    } finally { q.stop(); releaseIt.countDown() }
    assert(!new java.io.File(WriterLock.lockPath(s"$dir/idx")).exists(),
      "the stream's per-batch lock must release")
  }
}
