package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Lexical relevance scoring — Okapi BM25 (Robertson/Walker 1994; the
  * idf variant is Lucene's `ln(1 + (N - df + 0.5)/(df + 0.5))`, which
  * is non-negative for every df). The corpus-search primitive of a
  * training-data pipeline: targeted slice extraction ("every doc about
  * X"), seed-document expansion for DSIR-style importance sampling,
  * and eval-set retrieval checks all reduce to a deterministic ranked
  * term query over the corpus.
  *
  * Tokenization is [[TextFunctions.words]] (lowercase `[a-z0-9]+`),
  * shared with d03/d24/d26, so term counts agree with every other
  * text-side operator and a SQL oracle reproduces them exactly.
  *
  * Scale shape (100 TB): two map passes over the corpus and nothing
  * corpus-sized persisted or collected —
  *  - pass 1 aggregates (N, Σdl) into ONE driver row (avgdl is a
  *    driver-computed literal, like the broadcast LM models);
  *  - pass 2 explodes tokens with the `isin(terms)` filter INSIDE the
  *    projection, so only matching (doc, term) rows — at most |terms|
  *    per doc after the map-side partial count — reach the shuffle;
  *  - per-term document frequencies are a ≤ |terms|-row collect
  *    (codelist-bounded), embedded as a literal when-chain, never a
  *    join;
  *  - the final top-k plans as TakeOrderedAndProject (per-partition
  *    heaps + driver merge), never a global sort.
  *
  * Determinism/oracle-exactness: every float in the score derives from
  * integers (tf, df, dl, N) plus the one avgdl division, combined in a
  * FIXED parenthesization both engines evaluate identically; the
  * per-doc score sums the per-term contributions in static `terms`
  * order (a fixed-order column add, not an order-dependent float
  * aggregate), so scores are bit-identical run-to-run and
  * engine-to-engine. Ranking breaks ties on (rounded score desc, id).
  */
object Relevance {

  // ONE evaluation of the caller's corpus (the addPar persist-once
  // rule, review r9/r12): the stats aggregate and the tf pass must
  // read the SAME rows — two separate evaluations of a
  // non-deterministic input (a sampled frame, a changing source)
  // would silently mix N/avgdl from one corpus with tf/df from
  // another. The tokenized frame is persisted, so tokenization also
  // runs once instead of once per pass.
  private val wPersist = new PersistSlot
  // the tf frame is referenced twice — the per-term df collect and the
  // returned scoring plan — and each un-cached reference re-runs the
  // explode+aggregate over the cached corpus (the double-reference
  // law; un-persisted, the gate paid three corpus passes per run)
  private val tfPersist = new PersistSlot

  /** Top-`topK` documents by BM25 over `terms`. Returns (doc_id,
    * score) — only documents containing at least one query term rank.
    * `terms` must be lowercase single tokens of the `[a-z0-9]+`
    * tokenizer (anything else can never match and is refused loudly
    * rather than silently scoring nothing).
    *
    * The result is DRIVER-LOCALIZED (a LocalRelation of ≤ topK rows —
    * the validatedStats recipe, ADVICE r12): the lazy ranking plan
    * roots at this object's shared persist slots, so a still-lazy
    * result would re-tokenize after a second bm25 call evicted them,
    * silently mixing one corpus's N/avgdl with another's tf when the
    * input is nondeterministic. Collecting here makes the returned
    * frame independent of both the slots and later calls.
    *
    * PRECONDITION: `idCol` is unique per document. Duplicate ids
    * inflate df (each (id, dl) pair counts toward document frequency)
    * and give the per-term sums multiple rows, which surrenders the
    * fixed-order float-sum guarantee at 3+ copies; dedup upstream
    * (d01/d02) first — checking here would cost a corpus aggregation
    * per call. */
  def bm25(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    val ranked = bm25Plan(docs, idCol, textCol, terms, k1, b, topK)
    val rows = ranked.collect()
    docs.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), ranked.schema)
  }

  /** The lazy ranking plan behind [[bm25]] (package-visible so specs
    * can assert the TakeOrderedAndProject top-k shape — the public
    * form localizes it away). Consume before the next call: it reads
    * the shared slots. */
  private[graft] def bm25Plan(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    validateQuery(terms, k1, b, topK)
    val w = wPersist(docs.select(col(idCol).as("doc_id"),
      TextFunctions.words(col(textCol)).as("ws")))

    // pass 1: corpus stats — one row to the driver (materializes the
    // tokenized cache; the tf pass below reads the same rows)
    val (n, tot) = corpusStats(w)
    val avgdl = tot.toDouble / n // same division as the oracle

    // pass 2: matching (doc, term) frequencies; the isin filter rides
    // the explode projection, so non-query tokens die map-side
    val tf = tfPersist(w.select(col("doc_id"), size(col("ws")).as("dl"),
        explode(col("ws")).as("word"))
      .filter(col("word").isin(terms: _*))
      .groupBy("doc_id", "dl", "word").agg(count(lit(1)).as("tf")))

    scorePlan(tf, n, avgdl, terms, k1, b, topK)
  }

  private def validateQuery(terms: Seq[String], k1: Double, b: Double,
      topK: Int): Unit = {
    require(terms.nonEmpty, "bm25: at least one query term")
    require(terms.size <= 64,
      s"bm25: ${terms.size} terms - the fixed-order score add is built " +
        "per term; split absurdly wide queries")
    require(terms.distinct.size == terms.size,
      s"bm25: duplicate query terms (${terms.mkString(", ")})")
    terms.foreach(t => require(t.matches("[a-z0-9]+"),
      s"bm25: term '$t' is not a lowercase [a-z0-9]+ token - it can never match"))
    require(k1 > 0 && b >= 0 && b <= 1, s"bm25: k1 > 0 and b in [0,1]")
    require(topK >= 1, "bm25: topK must be >= 1")
  }

  /** (doc count, token total) in ONE aggregation — avgdl is derived by
    * the caller with the identical `tot/n` division the oracle uses. */
  private def corpusStats(w: DataFrame): (Long, Long) = {
    val st = w.agg(count(lit(1)).as("n"),
      sum(size(col("ws")).cast("long")).as("tot")).head()
    val n = st.getLong(0)
    require(n > 0, "bm25: empty corpus")
    // a corpus whose EVERY text is null sums to a null token total —
    // name the error instead of an NPE at getLong (review r12)
    require(!st.isNullAt(1),
      "bm25: every document's text is null - nothing to tokenize")
    (n, st.getLong(1))
  }

  /** The ONE scoring tail shared by the direct scan and the persisted
    * index: takes a (doc_id, dl, word, tf) frame restricted to the
    * query terms plus the corpus stats, produces the ranked top-k. */
  private def scorePlan(tf: DataFrame, n: Long, avgdl: Double,
      terms: Seq[String], k1: Double, b: Double, topK: Int): DataFrame = {
    // per-term document frequency: ≤ |terms| rows, driver-bounded
    val dfMap = tf.groupBy("word").agg(count(lit(1)).as("df")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val dfCol = terms.tail.foldLeft(
        when(col("word") === terms.head, lit(dfMap.getOrElse(terms.head, 0L)))) {
      (acc, t) => acc.when(col("word") === t, lit(dfMap.getOrElse(t, 0L)))
    }

    // fixed parenthesization mirrored verbatim in the SQL oracle:
    // idf = ln(1 + (N - df + 0.5)/(df + 0.5))
    // tfn = tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
    val idf = log(lit(1.0) +
      (lit(n) - col("__df") + lit(0.5)) / (col("__df") + lit(0.5)))
    val tfn = (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl") / lit(avgdl)))
    val contrib = tf.withColumn("__df", dfCol)
      .withColumn("__contrib", idf * tfn)

    // fixed-order per-doc sum: one aggregate column per term (each
    // sums exactly one row), added in static term order — never an
    // order-dependent float sum over an arbitrary row stream
    val perTerm = terms.map(t =>
      sum(when(col("word") === t, col("__contrib"))).as(s"__c_$t"))
    val score = terms.map(t => coalesce(col(s"__c_$t"), lit(0.0)))
      .reduce(_ + _)
    contrib.groupBy("doc_id").agg(perTerm.head, perTerm.tail: _*)
      .withColumn("score", round(score, 4))
      .select("doc_id", "score")
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topK)
  }

  /** Persist the inverted index: build ONCE (one tokenize pass), query
    * many times without ever rescanning the corpus — the production
    * retrieval shape [[bm25]]'s per-call scan cannot offer. Layout:
    *  - `postings` (word, doc_id, dl, tf), repartitioned BY WORD and
    *    sorted within partitions, so parquet row-group min/max stats
    *    prune every non-query term at scan time (the pushed `isin`
    *    reads only matching row groups — at 100 TB the per-query read
    *    is proportional to the terms' posting lists, not the corpus);
    *  - a one-row `stats` table (n, avgdl's numerator/denominator),
    *    written LAST as the commit marker (the IvfIndex meta-last
    *    protocol: a crashed build never looks complete).
    *
    * REBUILD over an existing path drops the stats marker FIRST (the
    * buildLshIndex/IvfIndex.save rule, r15): without it a crash
    * mid-rebuild left the OLD committed stats standing over new or
    * partial postings — complete-looking and silently wrong. */
  def buildIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String): Unit = {
    val spark = docs.sparkSession
    MetaSwap.invalidate(spark, s"$path/stats")
    // rebuild rule: the postings tree drops BEFORE any write, so a
    // crashed rebuild can never read as old-shards-beside-new
    locally {
      val p = new org.apache.hadoop.fs.Path(s"$path/postings")
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      ()
    }
    writePostingsShard(docs, idCol, textCol, path, shard = 0,
      prior = None, tag = "")
  }

  /** One committed stats row: the corpus totals PLUS the shard frontier
    * — BM25's global statistics (N, total length, and through the
    * postings union every df) are exact integer sums, so incremental
    * maintenance reproduces a batch rebuild EXACTLY, score for score
    * (gate d60 proves it on the full-corpus oracle). */
  private[ops] final case class Bm25Meta(n: Long, tot: Long, shards: Int,
      base: Int, tag: String, epoch: Long)

  private def readBm25Meta(spark: org.apache.spark.sql.SparkSession,
      path: String): Bm25Meta = {
    require(MetaSwap.committed(spark, s"$path/stats"),
      s"bm25 index at '$path' is missing or incomplete " +
        "(no committed stats table - builds write it last)")
    // direct driver-side read (MetaIo, r19): genuine every call, no job
    val st = MetaIo.readHead(spark,
      MetaSwap.readDir(spark, s"$path/stats"))
    // layout guard: a pre-r16 index (unsharded postings, plain
    // two-column stats) fails LOUDLY here and must be rebuilt by the
    // caller — [[exists]] is the soft probe that reads such a layout
    // as absent, the IVF-family pattern (ADVICE r16: this comment
    // used to claim a silent one-redundant-rebuild that never
    // happened through this hard require)
    require(st.schema.fieldNames.contains("shards"),
      s"bm25 index at '$path' predates the sharded-postings layout - rebuild it")
    val base = if (st.schema.fieldNames.contains("base"))
      st.getInt(st.fieldIndex("base")) else 0
    val epoch = if (st.schema.fieldNames.contains("epoch"))
      st.getLong(st.fieldIndex("epoch")) else 0L
    Bm25Meta(st.getLong(st.fieldIndex("n")), st.getLong(st.fieldIndex("tot")),
      st.getInt(st.fieldIndex("shards")), base,
      st.getString(st.fieldIndex("tag")), epoch)
  }

  /** True when a complete CURRENT-layout index stands at `path` — the
    * IVF-family exists() pattern (ADVICE r16): missing, uncommitted
    * (crashed build), and pre-sharded legacy layouts all read false,
    * so callers can branch to [[buildIndex]] instead of catching the
    * loud readBm25Meta require. */
  def exists(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean =
    MetaSwap.committed(spark, s"$path/stats") &&
      MetaIo.readHead(spark, MetaSwap.readDir(spark, s"$path/stats"))
        .schema.fieldNames.contains("shards")

  /** ONE shard writer shared by build (shard 0) and append (G+1):
    * tokenize ONE pass, postings repartitioned by word within the
    * shard, then the stats commit — swap-committed, CAS-guarded when
    * `prior` carries a planning read (the Dedup.commitLshMeta rule;
    * builds pass None). Corpus totals fold the delta's into the
    * prior's — exact integer adds. */
  private def writePostingsShard(docs: DataFrame, idCol: String,
      textCol: String, path: String, shard: Int, prior: Option[Bm25Meta],
      tag: String): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    val w = docs.select(col(idCol).as("doc_id"),
        TextFunctions.words(col(textCol)).as("ws"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the stats aggregate and the postings write both read the
      // persisted `w` and are independent — overlap them (guide §2.6;
      // the stats only feed the meta commit below, which still lands
      // strictly after both)
      val ((nd, totd), _) = ParActions.run2(
        () => corpusStats(w),
        () => w.select(col("doc_id"), size(col("ws")).as("dl"),
            explode(col("ws")).as("word"))
          .groupBy("doc_id", "dl", "word").agg(count(lit(1)).as("tf"))
          .repartition(col("word")).sortWithinPartitions("word", "doc_id")
          .write.mode("overwrite").parquet(s"$path/postings/shard=$shard"))
      prior.foreach { e =>
        graft.ops.IvfIndex.beforeCasCommit()
        val cur = readBm25Meta(spark, path)
        graft.ops.IvfIndex.casCompare("bm25 index write", path,
          e.shards, e.tag, e.epoch, cur.shards, cur.tag, cur.epoch)
      }
      val (n, tot) = prior.map(e => (e.n + nd, e.tot + totd))
        .getOrElse((nd, totd))
      val base = prior.map(_.base).getOrElse(0)
      // layout epoch: builds (prior = None) mint, appends carry (the
      // Dedup.commitLshMeta ABA rationale — without it an append
      // planned before an out-of-process rebuild commits stale corpus
      // totals n/tot over the fresh build)
      val epoch = prior.map(_.epoch)
        .getOrElse(graft.ops.IvfIndex.newEpoch())
      MetaSwap.commit(Seq((n, tot, shard, base, tag, epoch))
        .toDF("n", "tot", "shards", "base", "tag", "epoch"), s"$path/stats")
    } finally { w.unpersist(blocking = false); () }
  }

  /** Fold new documents into a [[buildIndex]]-persisted index WITHOUT
    * rebuilding — and WITHOUT approximation: BM25's corpus statistics
    * are integer sums (N, total length) and per-term df is counted
    * over the unioned postings at query time, so a query against the
    * appended index is EXACTLY the query against a batch rebuild over
    * the union — stale-idf drift, the usual incremental-BM25 trade,
    * never exists here (gate d60 pins the equality on the full-corpus
    * oracle). One tokenize pass over the delta; the standing postings
    * are never re-read. Same `tag` idempotence and disjoint-doc-ids
    * contract as every append in the library ([[graft.ops.Dedup
    * .appendToLshIndex]]); `checkIds` buys the loud disjointness scan
    * (one column-pruned pass over the postings' doc_id column). */
  def appendToIndex(docs: DataFrame, idCol: String, textCol: String,
      path: String, tag: String = "", checkIds: Boolean = false): Unit = {
    val spark = docs.sparkSession
    val m = readBm25Meta(spark, path)
    if (tag.nonEmpty && tag == m.tag) return // retry of an applied append
    if (checkIds) {
      val dup = docs.select(col(idCol).as("doc_id")).join(
          spark.read.parquet(s"$path/postings")
            .filter(col("shard") >= m.base && col("shard") <= m.shards)
            .select("doc_id"),
          Seq("doc_id"), "left_semi")
        .limit(1).collect()
      require(dup.isEmpty,
        s"bm25 index at '$path' already contains delta doc_id " +
          s"'${dup.headOption.map(_.get(0)).orNull}' - delta ids must " +
          "be disjoint from indexed ids (a re-added doc would " +
          "double-count df and tf); key deltas upstream")
    }
    writePostingsShard(docs, idCol, textCol, path, shard = m.shards + 1,
      prior = Some(m), tag = tag)
  }

  /** Merge every live postings shard into one — the library's standard
    * segment merge ([[graft.ops.IvfIndex.compactTables]] protocol:
    * orphan at frontier+2, CAS-guarded stats swap with totals and tag
    * preserved, sweep below base best-effort last). The merge
    * re-clusters by word ACROSS the old shard boundary, restoring the
    * row-group min/max pruning a query pays for when a term's postings
    * are smeared over many small appended shards. */
  def compactIndex(spark: org.apache.spark.sql.SparkSession,
      path: String): Unit = {
    val m = readBm25Meta(spark, path)
    import spark.implicits._
    def sweep(b: Int): Unit =
      graft.ops.ShardDirs.sweepBelow(spark, s"$path/postings", b)
    if (m.base == m.shards) { sweep(m.base); return }
    val merged = m.shards + 2
    // staged + renamed into place (the IvfIndex.compactTables F5
    // protocol: a losing concurrent compact never rewrites a dir a
    // winner just made live)
    val tmp = graft.ops.ShardDirs.compactTmp(s"$path/postings")
    spark.read.parquet(s"$path/postings")
      .filter(col("shard") >= m.base && col("shard") <= m.shards)
      .select("doc_id", "dl", "word", "tf")
      .repartition(col("word")).sortWithinPartitions("word", "doc_id")
      .write.mode("overwrite").parquet(tmp)
    graft.ops.ShardDirs.renameIntoShard(spark, tmp,
      s"$path/postings/shard=$merged", "bm25 compact", () => {
        val c = readBm25Meta(spark, path)
        c.shards != m.shards || c.tag != m.tag || c.epoch != m.epoch
      })
    graft.ops.IvfIndex.beforeCasCommit()
    val cur = readBm25Meta(spark, path)
    graft.ops.IvfIndex.casCompare("bm25 compact", path,
      m.shards, m.tag, m.epoch, cur.shards, cur.tag, cur.epoch)
    MetaSwap.commit(Seq((m.n, m.tot, merged, merged, m.tag, m.epoch))
      .toDF("n", "tot", "shards", "base", "tag", "epoch"), s"$path/stats")
    sweep(merged)
  }

  /** Live shard count — the streaming ingest loop's compaction
    * trigger (the Dedup.lshLiveShards shape). */
  private[graft] def liveShards(spark: org.apache.spark.sql.SparkSession,
      path: String): Int = {
    val m = readBm25Meta(spark, path); m.shards - m.base + 1
  }

  /** Query a [[buildIndex]]-persisted index: scores are IDENTICAL to
    * [[bm25]] over the same corpus — including every appended shard
    * (gates d53/d60 prove it against d41's oracle). The scan reads
    * only LIVE shards (partition pruning on [base, frontier]) and only
    * the query terms' row groups (the pushed isin); df/N/avgdl are
    * global, so scores never drift from the batch answer.
    * Driver-localized result, same as [[bm25]]. */
  def queryIndex(spark: org.apache.spark.sql.SparkSession, path: String,
      terms: Seq[String], k1: Double = 1.2, b: Double = 0.75,
      topK: Int = 20): DataFrame = {
    validateQuery(terms, k1, b, topK)
    val m = readBm25Meta(spark, path)
    val avgdl = m.tot.toDouble / m.n
    val tf = spark.read.parquet(s"$path/postings")
      .filter(col("shard") >= m.base && col("shard") <= m.shards)
      .filter(col("word").isin(terms: _*)) // pushed to the parquet scan
      .select("doc_id", "dl", "word", "tf")
    val ranked = scorePlan(tf, m.n, avgdl, terms, k1, b, topK)
    val rows = ranked.collect()
    spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), ranked.schema)
  }
}
