package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream shape
  * (event_id, user_id, event_type, ts, value, props).
  *
  * The reference has NO streaming surface (SURVEY §2.10) — its closest
  * analogue is the versioned commit log — so this layer is part of the
  * beyond-reference training-pipeline capability: the same codegen'd
  * aggregations as the batch battery, driven incrementally with
  * watermarks bounding state. All operators take a DataFrame that may
  * be either `readStream` or batch (identical plans, Spark decides).
  */
object EventStream {

  /** Event-time windowed activity rollup: the streaming analogue of
    * q16_ts_export. Watermark bounds the aggregation state; window
    * state is dropped once the watermark passes. */
  def windowedActivity(events: DataFrame, watermark: String = "10 minutes",
      window_ : String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("value"))

  /** Session windows per user with an inactivity gap — the built-in
    * `session_window` keeps per-key state until watermark + gap. */
  def sessions(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value"))

  /** Streaming ingestion dedup for a document stream: exact dedup by
    * content fingerprint with state bounded by the event-time
    * watermark (`dropDuplicatesWithinWatermark` — a duplicate arriving
    * within the watermark horizon of its first copy is dropped; state
    * for older fingerprints is reclaimed). The batch curation pipeline
    * (graft.ops.Dedup) shares the same fingerprint expression, so a
    * backfill and the incremental path agree on identity. On a BATCH
    * frame this falls back to plain dropDuplicates on the fingerprint
    * (review r11: dropDuplicatesWithinWatermark is rejected outright
    * on batch frames, so the backfill agreement the doc promises was
    * unobtainable from this function).
    *
    * @param docs frame with `text` and an event-time `ts` */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val fp = docs.withColumn("fp",
      graft.functions.TextFunctions.fingerprint(col("text")))
    if (!docs.isStreaming) fp.dropDuplicates("fp")
    else fp.withWatermark("ts", watermark).dropDuplicatesWithinWatermark("fp")
  }

  /** Stateless curation gate over a document stream: quality features +
    * language ID run unchanged in streaming (no state, no watermark
    * needed) — the same codegen'd expressions as batch d04/d05.
    * `redact = true` additionally scrubs PII in-flight (the batch d22
    * operator; also stateless, so it streams for free).
    *
    * `langModel` (VERDICT r14 #5) swaps the stopword-marker heuristic
    * for a TRAINED K-class classifier
    * ([[graft.ops.QualityClassifier.trainMulti]], the d56 path): the
    * `lang` column becomes the model's argmax class and the gate keeps
    * `langs` ∩ the model's vocabulary. Still stateless (K native dots
    * per row, weights as codegen reference objects), so the trained
    * gate streams exactly like the heuristic one. The heuristic only
    * knows four marker sets — a production pipeline trains on labeled
    * samples and gates with the model. */
  def curateStream(docs: DataFrame, minWords: Int = 20,
      langs: Seq[String] = Seq("en", "de", "fr", "es"),
      redact: Boolean = false,
      langModel: Option[graft.ops.QualityClassifier.MultiModel] = None)
      : DataFrame = {
    val quality = docs
      .withColumn("q", graft.functions.TextFunctions.textFeatures(col("text")))
      .filter(col("q.n_words") >= minWords && col("q.stopword_ratio") >= 0.02)
    val labeled = langModel match {
      case Some(m) => quality.withColumn("lang",
        graft.ops.QualityClassifier.predMulti(m, col("text")))
      case None => quality.withColumn("lang", col("q.lang"))
    }
    val gated = labeled.filter(col("lang").isin(langs: _*)).drop("q")
    if (redact)
      gated.withColumn("text",
        graft.functions.TextFunctions.redactPii(col("text")))
    else gated
  }

  /** Streaming twin of the FILTER half of graft.ops.Dedup.lineDedup:
    * drop boilerplate lines from in-flight documents against a
    * batch-built digest set (the over-frequency lines a periodic
    * batch lineDedup run publishes — counting frequencies needs the
    * whole corpus, so the COUNT half stays batch). Documents explode
    * to (doc_id, pos, line) and anti-join the static digest frame —
    * stream-static joins are stateless, so no watermark is needed and
    * state never grows. Emits surviving lines with their positions;
    * reassembly belongs to the sink (order within a doc is preserved
    * by `pos`). `boilerDigests` needs one column `__h` = md5 of the
    * line.
    *
    * A doc whose EVERY line is boilerplate emits nothing — unlike
    * batch lineDedup, which keeps it as (n_kept = 0, "") (review
    * r11). A sink that must distinguish "became empty" from "never
    * arrived" sets `emitDocMarker = true`: every input doc then also
    * emits one (doc_id, pos = -1, line = "") marker row (stateless —
    * a map-side projection of the same input); reassembly ignores
    * pos < 0. */
  def stripBoilerplateLines(docs: DataFrame, boilerDigests: DataFrame,
      sep: String = "\n", emitDocMarker: Boolean = false): DataFrame = {
    val stripped = docs.select(col("doc_id"),
        posexplode(graft.ops.Dedup.lineSplit(col("text"), sep))
          .as(Seq("pos", "line")))
      .withColumn("__h", graft.ops.Dedup.lineDigest(col("line")))
      .join(broadcast(boilerDigests), Seq("__h"), "left_anti")
      .drop("__h")
    if (!emitDocMarker) stripped
    else stripped.unionByName(docs.select(col("doc_id"),
      lit(-1).as("pos"), lit("").as("line")))
  }

  /** Streaming twin of graft.ops.Dedup.decontaminate: flag in-flight
    * documents sharing any word n-gram with a STATIC benchmark shingle
    * set (build it batch-side with [[graft.ops.Dedup.benchmarkShingles]]
    * — benchmarks are fixed corpora, so the expensive side never
    * streams). Stateless stream-static inner join on the shingle hash:
    * no watermark, no state growth. Emits one (doc_id, g) row per
    * matching shingle occurrence; the per-doc verdict (`n_hits >=
    * minHits`) belongs to the sink/foreachBatch — the
    * [[stripBoilerplateLines]] reassembly rule — because a per-doc
    * aggregation would force stateful complete/update output for what
    * is otherwise a pure filter. Counting hit ROWS per doc at the sink
    * reproduces the batch operator's n_hits exactly: both sides
    * explode the doc's DISTINCT shingle set (ShingleHashes
    * canonicalizes) and join the distinct benchmark set, so each
    * shared n-gram contributes exactly one row.
    * Shares ShingleHashes identity with batch d20/d23, so a backfill
    * and the incremental path agree on what is contaminated. */
  /** Opt-in cross-process serialization for the ingest loops (the
    * [[graft.ops.WriterLock]] story, r17): `waitMs` < 0 runs the
    * batch body bare — in-process ordering is Structured Streaming's
    * job and the CAS backstops out-of-process writers; >= 0 holds the
    * index's writer lock across the batch's plan+commit so a
    * cooperating locked maintenance process (CLI/cron `--lock`) and
    * this stream never discard each other's work. */
  private def locked(batch: DataFrame, indexPath: String, batchId: Long,
      waitMs: Long)(body: => Unit): Unit =
    if (waitMs < 0) body
    else graft.ops.WriterLock.withLock(batch.sparkSession, indexPath,
      owner = s"stream-batch-$batchId", waitMs = waitMs)(body)

  /** Continuous near-dup dedup of an arriving document stream against
    * a persisted LSH index — the full incremental-crawl loop
    * ([[graft.ops.Dedup.buildLshIndex]] once, then this) as ONE
    * foreachBatch composition. Per micro-batch:
    *   1. `dedupDelta(batch)` emits the batch's delta-touching pairs
    *      (vs the index AND within the batch);
    *   2. the pairs land at `pairsDir/batch=<id>` with OVERWRITE —
    *      a retried batch rewrites its own directory, so the pair
    *      audit trail is exactly-once per batch id;
    *   3. `appendToLshIndex(batch, tag = "batch-<id>")` folds the
    *      batch into the index, so the NEXT micro-batch pairs against
    *      everything that came before; the tag makes a retried append
    *      a no-op (Structured Streaming re-runs a failed batch N to
    *      completion before N+1, so guarding against the LAST applied
    *      tag is sufficient for exactly-once index growth).
    *
    * Caller contract: globally unique doc ids across the stream's
    * lifetime (the dedupDelta disjointness precondition, batch to
    * batch). Returns the configured DataStreamWriter — caller picks
    * trigger/checkpoint and starts it. */
  /** @param maintainEvery > 0 compacts the index
    *   ([[graft.ops.Dedup.compactLshIndex]]) after every Nth batch
    *   when live shards exceed `maxLiveShards` — INSIDE the same
    *   foreachBatch, so ingest and maintenance are serialized by
    *   Structured Streaming itself (the ivfAppendStream rule) and the
    *   loop's read amplification stays bounded for its whole life.
    * @param lockWaitMs >= 0 wraps each batch's plan+commit in the
    *   index's [[graft.ops.WriterLock]] (owner `stream-batch-<id>`,
    *   blocking up to the given wait) — opt-in serialization against
    *   CROSS-PROCESS cooperating writers (a cron `Cli index compact
    *   --lock` beside this stream): neither side's work is ever
    *   CAS-discarded. Default −1 = off; in-process ordering is
    *   already Structured Streaming's job, and lockless writers
    *   still fall back to the CAS contract. */
  def dedupDeltaStream(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsDir: String, threshold: Double = 0.5,
      maxBucket: Int = 0, maintainEvery: Int = 0, maxLiveShards: Int = 4,
      lockWaitMs: Long = -1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) locked(batch, indexPath, batchId, lockWaitMs) {
          val tag = s"batch-$batchId"
          // retry guard (ADVICE r14): a batch that crashed AFTER the
          // append's meta commit is already IN the index — re-pairing
          // would violate dedupDelta's disjoint-ids precondition (the
          // batch's ids would self-pair against their indexed copies
          // and the rewritten pairs/batch=N would carry duplicate
          // rows). A committed tag proves BOTH halves finished (pairs
          // land before the append starts), so the whole retry is a
          // no-op — the appendToLshIndex tag check alone only guarded
          // the second half.
          if (graft.ops.Dedup.lshIndexTag(batch.sparkSession, indexPath)
              != tag) {
            graft.ops.Dedup
              .dedupDelta(batch, idCol, textCol, indexPath, threshold,
                maxBucket)
              .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
            graft.ops.Dedup.appendToLshIndex(batch, idCol, textCol, indexPath,
              tag = tag)
            if (maintainEvery > 0 &&
                batchId % maintainEvery == maintainEvery - 1 &&
                graft.ops.Dedup.lshLiveShards(batch.sparkSession, indexPath)
                  > maxLiveShards)
              graft.ops.Dedup.compactLshIndex(batch.sparkSession, indexPath)
          }
        }
    }

  /** [[dedupDeltaStream]]'s SimHash twin: continuous near-dup dedup of
    * a document stream against a persisted
    * [[graft.ops.Dedup.buildSimhashIndex]] index. Per micro-batch:
    * fingerprint in-flight ([[graft.ops.Dedup.simhash]] — word-less
    * docs drop, the batch d08 rule), emit the batch's delta-touching
    * pairs at `pairsDir/batch=<id>` (overwrite — exactly-once per
    * batch id), fold the fingerprints in with `tag = batch-<id>`. Same
    * retry guard as the LSH twin: a committed tag proves both halves
    * finished, so the whole retry no-ops instead of re-pairing a batch
    * that is already IN the index. LEANER than the LSH loop end to
    * end: 8-byte sigs in, xor+popcount verify, no shingle storage.
    * Caller contract: globally unique doc ids across the stream. */
  /** @param maintainEvery the [[dedupDeltaStream]] compaction trigger,
    *   over [[graft.ops.Dedup.compactSimhashIndex]]. */
  def simhashDeltaStream(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, pairsDir: String, maxBucket: Int = 0,
      maintainEvery: Int = 0, maxLiveShards: Int = 4,
      lockWaitMs: Long = -1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) locked(batch, indexPath, batchId, lockWaitMs) {
          val tag = s"batch-$batchId"
          if (graft.ops.Dedup.simhashIndexTag(batch.sparkSession, indexPath)
              != tag) {
            // one fingerprint pass serves the pairing AND the append
            val fp = graft.ops.Dedup.simhash(batch, idCol, textCol)
              .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
            try {
              graft.ops.Dedup.simhashDelta(fp, indexPath, maxBucket)
                .write.mode("overwrite").parquet(s"$pairsDir/batch=$batchId")
              graft.ops.Dedup.appendToSimhashIndex(fp, indexPath, tag = tag)
              if (maintainEvery > 0 &&
                  batchId % maintainEvery == maintainEvery - 1 &&
                  graft.ops.Dedup.simhashLiveShards(batch.sparkSession,
                    indexPath) > maxLiveShards)
                graft.ops.Dedup.compactSimhashIndex(batch.sparkSession,
                  indexPath)
            } finally { fp.unpersist(blocking = false); () }
          }
        }
    }

  /** Continuous ANN-index ingestion — the vector-database write path:
    * each micro-batch of (id, vec) rows folds into a saved
    * [[graft.ops.IvfIndex]] via `append` (frozen centroids, one
    * delta-sized assignment pass, exactly-once via the batch tag —
    * the [[dedupDeltaStream]] contract). Queries against the index
    * see each batch as soon as its meta commit lands. Caller contract:
    * ids globally unique across the stream, vectors preprocessed like
    * the build corpus.
    *
    * `maintainEvery` > 0 runs [[graft.ops.IvfIndex.maintain]] after
    * every Nth batch's append, INSIDE the same foreachBatch — appends
    * and compactions are then serialized by Structured Streaming
    * itself, so the loop never races its own maintenance (the CAS
    * guard stays as the backstop for out-of-process writers). Shards
    * stay bounded at `maxLiveShards` for the life of the stream; a
    * drift-flagged pass skips the merge (the maintain contract) and
    * surfaces through `onMaintain`, the operator's hook for alerting
    * or scheduling the rebuild. */
  def ivfAppendStream(vecs: DataFrame, indexPath: String,
      maintainEvery: Int = 0, maxLiveShards: Int = 4,
      onMaintain: graft.ops.IvfIndex.Maintenance => Unit = _ => (),
      lockWaitMs: Long = -1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) locked(batch, indexPath, batchId, lockWaitMs) {
          graft.ops.IvfIndex.append(batch, indexPath, tag = s"batch-$batchId")
          if (maintainEvery > 0 && batchId % maintainEvery == maintainEvery - 1)
            onMaintain(graft.ops.IvfIndex.maintain(batch.sparkSession,
              indexPath, maxLiveShards))
        }
    }

  /** Continuous retrieval-index ingestion — [[ivfAppendStream]] for
    * the BM25 family: each micro-batch folds into a persisted
    * [[graft.ops.Relevance.buildIndex]] index via `appendToIndex`
    * (exact global stats, so queries between batches always equal a
    * batch rebuild over everything ingested so far — no stale-idf
    * window). Tag idempotence makes retried batches no-ops;
    * `maintainEvery` compacts inside the loop when live shards exceed
    * the cap (serialized by Structured Streaming, the ivfAppendStream
    * rule). Caller contract: doc ids globally unique across the
    * stream. */
  def bm25AppendStream(docs: DataFrame, idCol: String, textCol: String,
      indexPath: String, maintainEvery: Int = 0, maxLiveShards: Int = 4,
      lockWaitMs: Long = -1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) locked(batch, indexPath, batchId, lockWaitMs) {
          graft.ops.Relevance.appendToIndex(batch, idCol, textCol,
            indexPath, tag = s"batch-$batchId")
          if (maintainEvery > 0 &&
              batchId % maintainEvery == maintainEvery - 1 &&
              graft.ops.Relevance.liveShards(batch.sparkSession, indexPath)
                > maxLiveShards)
            graft.ops.Relevance.compactIndex(batch.sparkSession, indexPath)
        }
    }

  /** Continuous BQ-index ingestion — [[ivfAppendStream]] for the
    * binary-quantization family (r18): each micro-batch of (id, vec)
    * rows folds into a persisted [[graft.ops.BqIndex]] via `append`.
    * BQ appends are EXACT (no trained state — a row's signature does
    * not depend on when it arrived), so queries between batches
    * always equal a batch rebuild over everything ingested so far,
    * with no drift dimension to monitor: `maintainEvery` compacts
    * when live shards exceed the cap (serialized by Structured
    * Streaming, the ivfAppendStream rule) and that is the family's
    * ENTIRE maintenance story. Tag idempotence makes retried batches
    * no-ops; same unique-ids caller contract as the other loops. */
  def bqAppendStream(vecs: DataFrame, indexPath: String,
      maintainEvery: Int = 0, maxLiveShards: Int = 4,
      lockWaitMs: Long = -1L)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    vecs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) locked(batch, indexPath, batchId, lockWaitMs) {
          graft.ops.BqIndex.append(batch, indexPath, tag = s"batch-$batchId")
          if (maintainEvery > 0 &&
              batchId % maintainEvery == maintainEvery - 1 &&
              graft.ops.BqIndex.liveShards(batch.sparkSession, indexPath)
                > maxLiveShards)
            graft.ops.BqIndex.compact(batch.sparkSession, indexPath)
        }
    }

  def decontaminateHits(docs: DataFrame, benchShingles: DataFrame,
      nGram: Int = 3): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.CatalystFunctions.shingleHashes(
          graft.functions.TextFunctions.words(col("text")), nGram)).as("g"))
      .join(broadcast(benchShingles), "g")
      .select("doc_id", "g")

  /** The COUNT half of graft.ops.Dedup.lineDedup, in-stream: the
    * boilerplate-digest set the stream publishes ITSELF, instead of
    * requiring a periodic batch pre-pass (VERDICT r5 #5). Documents
    * explode to content-bearing lines (blank lines are structure, the
    * same d21 rule as batch), and a watermarked event-time-windowed
    * count emits every (window, digest) whose in-window frequency
    * reaches `minCount`. State is BOUNDED: one count per distinct
    * in-horizon (window, digest), reclaimed when the watermark passes
    * the window's end — memory tracks the horizon's line diversity,
    * never the stream's lifetime. Append mode: a window's digest set
    * finalizes (and can be fed to [[stripBoilerplateLines]], e.g. via
    * a foreachBatch republish) once the watermark closes the window.
    *
    * Windowed counts converge to the batch rule: any line reaching
    * `minCount` within one window is published exactly as a batch
    * lineDedup over that window's documents would find it; a line
    * spread thinner than `minCount` per window is the rule's
    * frequency threshold applied at the window granularity — choose
    * `window_` at the cadence the batch job used to run.
    *
    * State is one count per distinct in-horizon (window, digest): fine
    * for real corpora, linear in an adversarial all-unique-line flood —
    * [[boilerplateDigestsSketch]] is the constant-memory variant for
    * that regime (this exact variant remains the d21-convergence
    * reference). */
  def boilerplateDigests(docs: DataFrame, minCount: Int = 2,
      watermark: String = "1 hour", window_ : String = "1 hour",
      sep: String = "\n"): DataFrame = {
    // batch lineDedup enforces this; the streaming twins feed the
    // same stripBoilerplateLines consumer, and minCount < 2 would
    // publish EVERY distinct line as boilerplate (review r12)
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.ops.Dedup.lineSplit(col("text"), sep)).as("line"))
      .filter(length(col("line")) > 0)
      .withColumn("__h", graft.ops.Dedup.lineDigest(col("line")))
      .groupBy(window(col("ts"), window_), col("__h"))
      .agg(count(lit(1)).as("n"))
      .filter(col("n") >= minCount)
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("__h"), col("n"))
  }

  /** The PLAN half of a streaming corpus-mixture sampler (the NOTES
    * depth idea; the batch one-shot is graft.ops.Sampling
    * .mixtureSample): per event-time window, the (source, token)
    * totals the rate algebra needs — the boilerplateDigests
    * publication pattern. A window's totals finalize in append mode
    * once the watermark passes; a foreachBatch republisher runs them
    * through Sampling.ratesFromTotals (the SAME budget/rate arithmetic
    * as batch — one copy) and swaps the tiny rates frame that the
    * stateless apply half ([[mixtureSampleStream]]) joins. Planning on
    * the last closed window is the streaming approximation of the
    * batch full-corpus plan: right when the mixture is stationary at
    * the window cadence, self-correcting one window later when it
    * drifts. State is one (window, source) row per in-horizon source —
    * bounded by source diversity, never stream lifetime. */
  def mixtureTokenTotals(docs: DataFrame, sourceCol: String,
      tokensCol: org.apache.spark.sql.Column, watermark: String = "1 hour",
      window_ : String = "1 hour"): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col(sourceCol))
      .agg(sum(tokensCol.cast("long")).as("n_tokens"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col(sourceCol), col("n_tokens"))

  /** The APPLY half: per-source deterministic Bernoulli against the
    * current rates frame — delegates to Sampling.applyRates (broadcast
    * stream-static join + md5-hash filter), which is stateless, so it
    * needs no watermark and its output is reproducible for a given
    * rates frame: re-running a window after a rates republish keeps or
    * drops exactly the same documents.
    *
    * Coverage contract (review r12): an EMPTY rates frame is refused
    * at call time — the inner join would otherwise silently emit
    * NOTHING for the whole stream (the bootstrap-before-first-replan
    * trap); publish an initial plan (rate-1.0 passthrough or a prior
    * window's plan) before starting the query. A NON-empty plan that
    * merely omits a source keeps the batch planner's documented
    * drop-unweighted semantics by default; pass
    * `onUnplanned = "fail"` to instead fail the query by name when an
    * unplanned source appears mid-stream. */
  def mixtureSampleStream(docs: DataFrame, idCol: String,
      sourceCol: String, rates: DataFrame,
      onUnplanned: String = "drop"): DataFrame = {
    require(!rates.isEmpty,
      "mixtureSampleStream: empty rates frame - the stream-static " +
        "join would silently emit nothing; publish an initial plan " +
        "before starting the query")
    graft.ops.Sampling.applyRates(docs, idCol, sourceCol, rates,
      onUnplanned = onUnplanned)
  }

  final case class CmsState(counters: Array[Int], published: Seq[String])
  final case class CmsDigest(windowStart: java.sql.Timestamp,
      windowEnd: java.sql.Timestamp, digest: String, nEst: Long,
      saturated: Boolean)

  /** Sentinel `__h` value [[boilerplateDigestsSketch]] emits once per
    * window the moment its `maxPublish` cap first suppresses a
    * qualifying digest — so a consumer can distinguish "the stream has
    * no more boilerplate" from "the cap was hit and publication went
    * quiet" (VERDICT r7 #2). Deliberately not a 32-hex string: it can
    * never collide with (or join against) a real md5 digest. The same
    * row also carries `saturated = true` — the authoritative marker;
    * prefer filtering on the boolean over comparing to this string. */
  val SaturatedSentinel = "__SATURATED__"

  /** Bounded-memory [[boilerplateDigests]] (VERDICT r6 #4): the exact
    * variant keeps one count per distinct in-horizon (window, digest)
    * pair, so a hostile stream of all-unique lines grows state
    * linearly until the watermark closes the window. This variant
    * keeps a count-min sketch (Cormode & Muthukrishnan 2005) per
    * active window instead: `depth`×`width` int counters — 128 KB at
    * the defaults — REGARDLESS of line diversity, plus the published
    * digest set itself (bounded by `maxPublish`; real boilerplate is a
    * tiny minority of distinct lines by definition).
    *
    * Guarantees: CMS estimates only ever OVERcount (estimate >= true
    * count), so no truly-frequent line is missed; a colliding rare
    * line can be published early with probability ~(e/width)^depth per
    * distinct line — the classic ε/δ trade, tune `width` to the
    * horizon's expected distinct-line count. The `depth` row indices
    * derive from disjoint 32-bit words of the line's own md5 (the same
    * digest the batch d21 rule keys on), so behavior is deterministic
    * and engine-reproducible. Unlike the exact variant (whose windowed
    * aggregate finalizes on window close), digests publish the moment
    * their estimate crosses `minCount` — strictly earlier, which is
    * what a live [[stripBoilerplateLines]] feed wants.
    *
    * State lifecycle: event-time timeout at the window end; when the
    * watermark passes it, the group's sketch is dropped — same horizon
    * rule as the exact variant.
    *
    * Saturation: once a window has published `maxPublish` real digests,
    * the first additional qualifying digest emits one saturation row
    * and further publication for that window goes quiet — consumers can
    * tell "cap hit" from "stream clean". The saturation row is marked
    * BOTH ways (ADVICE r8 — the contract must not depend on consumers
    * knowing a magic string): its `saturated` column is true (every
    * real digest row carries false), and its `__h` is
    * [[SaturatedSentinel]], which can never equal an md5 digest, so
    * digest-joining consumers like [[stripBoilerplateLines]] ignore it
    * even if they never look at the flag. Contract for any OTHER
    * consumer: filter `!saturated` before counting digests or
    * aggregating `n_est` — on the saturation row `n_est` carries the
    * cap in force, not a frequency. */
  def boilerplateDigestsSketch(docs: DataFrame, minCount: Int = 2,
      watermark: String = "1 hour", window_ : String = "1 hour",
      sep: String = "\n", width: Int = 8192, depth: Int = 4,
      maxPublish: Int = 100000): DataFrame = {
    // batch lineDedup enforces this; the streaming twins feed the
    // same stripBoilerplateLines consumer, and minCount < 2 would
    // publish EVERY distinct line as boilerplate (review r12)
    require(minCount >= 2, s"minCount must be >= 2, got $minCount")
    require(depth >= 1 && depth <= 4, s"depth must be 1..4 (md5 has 4 words), got $depth")
    require(width >= 16, s"width must be >= 16, got $width")
    // window bounds are keyed at WHOLE-SECOND resolution (the
    // cast("long")s below): a sub-second window would truncate both
    // bounds and silently merge counts of distinct windows (review r11)
    val wLower = window_.toLowerCase(java.util.Locale.ROOT)
    // fractional seconds ('0.25 seconds') are as corrupting as milli
    // units — Spark parses them, the cast("long") truncates them
    // (review r12)
    require(!wLower.matches(".*(milli|micro|nano).*") &&
        !wLower.matches(".*\\.[0-9]+\\s*sec.*"),
      s"boilerplateDigestsSketch keys windows at second resolution; " +
        s"sub-second window '$window_' would corrupt group keys")
    val spark = docs.sparkSession
    import spark.implicits._
    val lines = docs
      .withWatermark("ts", watermark)
      .select(col("ts"),
        explode(graft.ops.Dedup.lineSplit(col("text"), sep)).as("line"))
      .filter(length(col("line")) > 0)
      .select(window(col("ts"), window_).as("w"), col("ts"),
        graft.ops.Dedup.lineDigest(col("line")).as("h"))
      // the watermarked ts attribute must survive into the grouped
      // dataset — EventTimeTimeout refuses a child plan without it
      .select(col("w.start").cast("long").as("ws"),
        col("w.end").cast("long").as("we"), col("ts"), col("h"))
      .as[(Long, Long, java.sql.Timestamp, String)]
    lines.groupByKey(r => (r._1, r._2))
      .flatMapGroupsWithState[CmsState, CmsDigest](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((ws, we), rows, state) =>
          // batch runs carry NO watermark (the optimizer strips the
          // node) and the watermark/timeout accessors THROW (review
          // r11 — the file header promises batch/stream parity):
          // treat the watermark as -inf (no window is ever "already
          // closed" in a one-shot batch pass) and skip timeouts.
          def wmMs: Long =
            try state.getCurrentWatermarkMs()
            catch { case _: UnsupportedOperationException => Long.MinValue }
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          // late rows for an already-CLOSED window (review r9): after
          // the event-time timeout removed this window's state, a
          // straggler would otherwise recreate it from scratch with an
          // empty published set and could re-publish digests the first
          // incarnation already emitted. flatMapGroupsWithState leaves
          // sub-watermark data to USER code — enforce the same horizon
          // rule as the exact (windowed-agg) variant: drop them.
          else if (state.getOption.isEmpty && wmMs >= we * 1000)
            Iterator.empty
          else {
            val st = state.getOption.getOrElse(
              CmsState(new Array[Int](width * depth), Nil))
            val counters = st.counters
            var published = st.published.toSet
            val out = scala.collection.mutable.ArrayBuffer.empty[CmsDigest]
            rows.foreach { case (_, _, _, h) =>
              var est = Int.MaxValue
              var r = 0
              while (r < depth) {
                val word = java.lang.Long
                  .parseLong(h.substring(r * 8, r * 8 + 8), 16).toInt
                val idx = r * width + math.floorMod(word, width)
                // saturate: this operator exists for hostile volumes,
                // and a wrapped counter would go negative and suppress
                // publication forever
                if (counters(idx) != Int.MaxValue) counters(idx) += 1
                if (counters(idx) < est) est = counters(idx)
                r += 1
              }
              // O(1) cap check (review r9): counting non-sentinel
              // members scanned the whole published set per qualifying
              // digest — quadratic exactly at hostile volumes
              def realPublished =
                published.size -
                  (if (published.contains(SaturatedSentinel)) 1 else 0)
              if (est >= minCount && !published.contains(h)) {
                // cap accounting excludes the sentinel itself, so the
                // cap always buys maxPublish REAL digests
                if (realPublished < maxPublish) {
                  published += h
                  out += CmsDigest(new java.sql.Timestamp(ws * 1000),
                    new java.sql.Timestamp(we * 1000), h, est.toLong,
                    saturated = false)
                } else if (!published.contains(SaturatedSentinel)) {
                  // first qualifying digest the cap suppresses: emit the
                  // saturation sentinel exactly once for this window
                  // (nEst carries the cap in force, not a frequency)
                  published += SaturatedSentinel
                  out += CmsDigest(new java.sql.Timestamp(ws * 1000),
                    new java.sql.Timestamp(we * 1000), SaturatedSentinel,
                    maxPublish.toLong, saturated = true)
                }
              }
            }
            state.update(CmsState(counters, published.toSeq))
            try state.setTimeoutTimestamp(math.max(we * 1000, wmMs + 1))
            catch { case _: UnsupportedOperationException => () } // batch
            out.iterator
          }
      }
      .toDF("window_start", "window_end", "__h", "n_est", "saturated")
  }

  final case class UserTotal(userId: Long, nEvents: Long, total: Double)

  /** Custom keyed state: running per-user totals via
    * `mapGroupsWithState` (the KeyValueGroupedDataset path for
    * semantics `session_window` can't express). Update output mode.
    *
    * State is one entry per distinct user and is NEVER reclaimed
    * (NoTimeout) — right for a bounded user universe, wrong under
    * anonymous-id churn; add a timeout before pointing it at one
    * (review r11). Null user_id/value rows are DROPPED: the
    * primitive-tuple encoder would otherwise kill the whole streaming
    * query on the first null (every other operator here tolerates
    * nulls through DataFrame aggregates). */
  def runningTotals(events: DataFrame): Dataset[UserTotal] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id").cast("long"), col("value").cast("double"))
      .filter(col("user_id").isNotNull && col("value").isNotNull)
      .as[(Long, Double)]
      .groupByKey(_._1)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[(Long, Double)], state: GroupState[UserTotal]) =>
          val prior = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prior.nEvents
          var tot = prior.total
          rows.foreach { case (_, v) => n += 1; tot += v }
          val next = UserTotal(userId, n, tot)
          state.update(next)
          next
      }
  }
}
