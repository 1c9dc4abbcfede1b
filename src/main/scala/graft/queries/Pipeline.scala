package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.TextFunctions
import graft.ops.{Dedup, Similarity}

/** Training-data pipeline operators over the `documents` and
  * `embeddings` tables: dedup, text analysis, similarity search.
  * See graft.ops / graft.functions for the reusable implementations.
  */
object Pipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // d48's stripped-text intermediate: referenced by the rule-battery
  // filter AND the stats projection (see the gate's scaladoc)
  private val d48Persist = new graft.ops.PersistSlot
  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "embeddings")

  /** Exact dedup by full text (hash-groupBy). */
  def d01DedupExact(s: SparkSession, dir: String): DataFrame =
    Dedup.exact(docs(s, dir)).orderBy("keep_id")

  /** Exact dedup under whitespace/case normalization via md5
    * fingerprint; md5 is reproducible in the oracle. */
  def d02Fingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextFunctions.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  /** Token counting: whitespace-ish word tokens + BPE-ish tokens. */
  def d03TokenCount(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(
      col("doc_id"),
      size(TextFunctions.words(col("text"))).as("n_words"),
      size(TextFunctions.bpeTokens(col("text"))).as("n_bpe_tokens"))
      .orderBy("doc_id")

  /** Quality scoring: length/word/stopword/punctuation features, all
    * from the single-pass native expression. */
  def d04Quality(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), TextFunctions.textFeatures(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_chars").as("n_chars"),
        col("q.n_words").as("n_words"), col("q.avg_word_len").as("avg_word_len"),
        col("q.stopword_ratio").as("stopword_ratio"),
        col("q.punct_ratio").as("punct_ratio"))
      .orderBy("doc_id")

  /** Marker-word language ID heuristic (native single-pass). */
  def d05LangId(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        TextFunctions.textFeatures(col("text")).getField("lang").as("lang_pred"))
      .orderBy("doc_id")

  /** MinHash+LSH near-dup pairs, exact-Jaccard-verified. The oracle is
    * the exact O(n^2) Jaccard join: with b=32/r=4 the LSH recall at the
    * J>=0.5 pairs present in this corpus (all >=0.9) is 1-1e-15, so the
    * outputs coincide. */
  def d06MinhashLsh(s: SparkSession, dir: String): DataFrame =
    Dedup.minhashLsh(docs(s, dir)).orderBy("id_a", "id_b")

  /** Exact n-gram Jaccard pairs (the small-corpus/verification path;
    * capped to the first 500 docs — all of sf0.01 — because the exact
    * variant is intentionally O(n^2): the scale path is d06). */
  def d07NgramJaccard(s: SparkSession, dir: String): DataFrame =
    Dedup.ngramJaccardExact(docs(s, dir).filter(col("doc_id") < 500))
      .orderBy("id_a", "id_b")

  /** SimHash near-dup pairs at radius 2 on the engine-reproducible
    * md5 word-hash path (review r10, VERDICT r9 #3: the gate was the
    * last rows-only entry with a deterministic twin — switching the
    * fingerprint to simhashMd5 makes it hash-checkable). Radius 2 is
    * NOT redundant with d12 (radius 3): the pigeonhole layout changes
    * from 4×16-bit to 3×{22,21,21}-bit blocks, so this grades the
    * blocked join's non-uniform block-width path against the oracle's
    * brute-force scan. The XXH64 production fingerprint keeps its
    * spec coverage in OpsSpec (identical voting logic, word hash
    * swapped). */
  def d08SimhashPairs(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsFrom(
      docs(s, dir).select(col("doc_id"),
        graft.functions.CatalystFunctions.simhashMd5(
          TextFunctions.words(col("text"))).as("simhash")),
      maxHamming = 2)
      .orderBy("id_a", "id_b")

  /** Saved-index path for gate `tag` over `dir`'s embeddings: the key
    * folds in the source parquet's (length, mtime), so overwriting the
    * data in place invalidates the cache instead of serving a stale
    * index (VERDICT r5 wrong #4 — the dir-only key needed a manual
    * version bump on data change). For a Spark-written parquet
    * DIRECTORY the top-level status is useless (getLen is not the data
    * length; the dir mtime need not change on an in-place part-file
    * rewrite), so the stamp aggregates the recursive file listing —
    * sum of file lengths, max file mtime, file count (ADVICE r6). */
  private[graft] def idxPath(s: SparkSession, dir: String, tag: String): String = {
    val key = dir.replaceAll("[^A-Za-z0-9.-]", "_")
    val src = new org.apache.hadoop.fs.Path(s"$dir/embeddings.parquet")
    val fs = src.getFileSystem(s.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(src)
    val stamp =
      if (st.isFile) s"${st.getLen}-${st.getModificationTime}"
      else {
        var len = 0L; var mt = 0L; var n = 0L
        val it = fs.listFiles(src, true)
        while (it.hasNext) {
          val f = it.next()
          len += f.getLen; mt = math.max(mt, f.getModificationTime); n += 1
        }
        s"$len-$mt-$n"
      }
    // Prefer the tmpfs scratch for the cache root (review r11): the
    // saved-index gates (e02/e05/e09/e10) re-read these parquet tables
    // per query, and a page-cache-pressured /tmp made that read the
    // dominant, wildly variable cost in full-battery runs (r10's e05
    // "4.4x regression" adjudicated to exactly this — isolated reruns
    // warm AND cold sat at ~1s on a 2.1x-degraded box). The indexes
    // are MBs, far under the 16 GiB scratch floor; the stamp key keeps
    // invalidation correct, and losing a tmpfs cache on reboot just
    // costs one rebuild.
    // '=' separates key from stamp (review r12): the sanitizer keeps
    // '-', so a '-'-joined name made one dataset's GC prefix a PREFIX
    // of a sibling dataset's entries (key "_data_abc" matched
    // "_data_abc-1-<stamp>") — an hour-idle but still-queried sibling
    // index could be reclaimed out from under its reader. '=' is
    // sanitized out of keys, so the prefix is unambiguous.
    val target = s"$idxCacheRoot/$tag$key=$stamp"
    // Stale-stamp GC (review r11): regenerating the source data
    // changes the stamp, and nothing else ever removes the old entry —
    // in tmpfs that is RAM leaking until reboot. Same (tag, key),
    // different stamp ⇒ unreachable through idxPath, but NOT provably
    // idle (ADVICE r11): a concurrent JVM that resolved the old path
    // before the regeneration can still be reading it. Deleting a
    // directory out from under a live parquet scan kills that query,
    // so only entries whose newest file is older than `gcGraceMs`
    // stay eligible — an active reader's entry was written recently
    // (builders write, readers follow within the same session), and
    // an hour-stale one has survived any plausible in-flight query.
    try {
      val root = new java.io.File(idxCacheRoot)
      val prefix = s"$tag$key="
      val cutoff = System.currentTimeMillis() - gcGraceMs
      def newestMtime(f: java.io.File): Long =
        (f.lastModified() +:
          Option(f.listFiles()).getOrElse(Array.empty).map(newestMtime).toSeq).max
      Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.getName.startsWith(prefix) &&
          f.getName != s"$tag$key=$stamp" && newestMtime(f) < cutoff)
        .foreach { stale =>
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(stale)
        }
    } catch { case _: Exception => () } // GC is advisory, never fatal
    target
  }

  /** Stale-entry GC grace period (ADVICE r11): an hour outlives any
    * in-flight local query against a pre-regeneration index. */
  private val gcGraceMs: Long = 3600L * 1000L

  /** One cache-root decision per JVM (review r11): re-evaluating
    * Tables.scratchDir per call could FLIP the root mid-session if a
    * shuffle-heavy run drops /dev/shm below the 16 GiB floor — the
    * next lookup would miss every shm-resident index and rebuild.
    * The root is scoped PER USER (ADVICE r11): /dev/shm and /tmp are
    * world-shared, so a fixed path meant cross-user permission
    * failures on the first foreign-owned entry and a cache-poisoning
    * surface (another user pre-writing an index at your path). */
  private lazy val idxCacheRoot: String = {
    val user = sys.props.getOrElse("user.name", "anon")
      .replaceAll("[^A-Za-z0-9._-]", "_")
    Tables.scratchDir.map(d => s"$d-idx-$user")
      .getOrElse(
        s"${sys.props.getOrElse("java.io.tmpdir", "/tmp")}/graft-idx-v1-$user")
  }

  private def knnInputs(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val q = e.filter(col("id") < 10).select(col("id").as("qid"), col("vec").as("qvec"))
    (e, q)
  }

  /** Brute-force cosine top-5 for the first 10 vectors as queries. */
  def e01KnnBrute(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    Similarity.bruteForceKnn(e, q, 5).orderBy("qid", "rank")
  }

  /** Matryoshka funnel kNN (Similarity.matryoshkaKnn, Kusupati 2022):
    * 16-d truncated-cosine shortlist (fetch 30), exact 64-d rerank to
    * top-5. No trained state anywhere in the path, so unlike the IVF
    * family this ANN gate is fully oracle-proven — shortlist set,
    * rerank scores, and ranks all reproduce bit-for-bit. */
  def e14KnnMatryoshka(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    Similarity.matryoshkaKnn(e, q, k = 5, dims = 16, fetch = 30)
      .orderBy("qid", "rank")
  }

  /** Binary-quantization kNN (Similarity.bqKnn, r17): 1-bit-per-dim
    * sign codes, hamming shortlist (fetch 32), exact unit-dot rerank
    * to top-5. Like e14 there is NO trained state anywhere in the
    * path, so the whole funnel — sign rule, hamming ranks, rerank
    * scores — is fully oracle-proven. */
  def e20KnnBq(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    Similarity.bqKnn(e, q, k = 5, fetch = 32).orderBy("qid", "rank")
  }

  /** Sharded BQ index lifecycle proven end-to-end by ORACLE (r18,
    * VERDICT #2): build over 3/4 of the corpus, two appends covering
    * the rest, query through the committed shards. BQ has NO trained
    * state — a row's stored signature is independent of WHEN it
    * arrived — so appends are exact by construction and the sharded
    * lifecycle answers bit-identically to the one-shot
    * [[graft.ops.Similarity.bqKnn]]: the oracle IS e20's SQL
    * verbatim (the e18 sharing pattern). Fresh temp dir per call
    * (the e15 rule: appends must not accumulate across reps). */
  def e21KnnBqSharded(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-e21")
      .toString + "/idx"
    graft.ops.BqIndex.build(e.filter(col("id") % 4 =!= 0), path)
    graft.ops.BqIndex.append(e.filter(col("id") % 8 === 0), path, tag = "delta-a")
    graft.ops.BqIndex.append(e.filter(col("id") % 8 === 4), path, tag = "delta-b")
    graft.ops.BqIndex.query(s, path, q, k = 5, fetch = 32)
      .orderBy("qid", "rank")
  }

  /** IVF-bucketed ANN over the same queries (approximate; rows-only).
    * Build-once/query-many like e05: the index persists as parquet
    * keyed by the data directory, so the gate measures probe cost —
    * a per-call `IvfIndex.build` was pure rebuild overhead (VERDICT
    * r5 wrong #2); `Similarity.ivfKnn` stays the one-shot API. */
  def e02KnnIvf(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val path = idxPath(s, dir, "e02")
    if (!graft.ops.IvfIndex.exists(s, path))
      graft.ops.IvfIndex.build(e, persist = false).save(path)
    val idx = graft.ops.IvfIndex.load(s, path, persist = false)
    idx.query(q, 5, nProbe = envProbe).orderBy("qid", "rank")
  }

  /** Recall-vs-cost knobs for the three approximate ANN gates
    * (VERDICT r7 stretch #6): the driver runs the deterministic
    * defaults (quarter-cell probe; fetch 100 for the PQ-coded gates
    * e05/e10 per the NOTES knob curve — recall ~0.9 at bounded rerank
    * cost, the shortlist stays broadcast-sized); a user trading latency
    * for recall sets SPARK_GRAFT_NPROBE / SPARK_GRAFT_FETCH — probing
    * all cells removes the IVF term entirely (recall then bounded only
    * by quantization/rerank, ~0.93 at sf0.1; see NOTES recall curve). */
  /** Knob lookup: the system property wins over the env var — env
    * vars cannot change inside a running JVM, and Bench needs to grade
    * recall at TWO configs (gate + production default) in one session
    * (VERDICT r9 ask #2). Value "lib" = the library's own default
    * (half-cell probe / auto-rerank fetch = max(20k, 100) since
    * VERDICT r12 #3), distinct from unset, which the gate wrappers
    * override to their bench-scale tuning. */
  private def knobVal(env: String, prop: String): Option[String] =
    sys.props.get(prop).orElse(sys.env.get(env))
      .map(_.trim).filter(_.nonEmpty)
  private def envProbe: Int =
    knobVal("SPARK_GRAFT_NPROBE", "graft.bench.nprobe") match {
      case Some("lib") => -1 // negative = let query() use its default
      case Some(v) => v.toInt
      case None => 0
    }
  private def envFetch(default: Int): Int =
    knobVal("SPARK_GRAFT_FETCH", "graft.bench.fetch") match {
      case Some("lib") => -1 // query() treats negative as its auto default
      case Some(v) => v.toInt
      case None => default
    }
  /** Gate-default probe count for the PQ-coded gates (r9): 80% of
    * cells, above even the library's half-cell default (r12 #3 — was a
    * quarter). The test corpus is tiny (2k vectors at sf0.1) and its
    * synthetic embeddings cluster weakly, so centroid ordering
    * correlates loosely with true-neighbor location and a quarter-cell
    * probe left recall at ~0.55 no matter the fetch (NOTES knob curve:
    * fetch=100 alone moved e05 only 0.44→0.54; nProbe=80% with
    * fetch=100 reaches 0.92/0.90; the half-cell library default with
    * auto-fetch lands ≥0.7). At production scale — millions of
    * clustered embeddings, √n cells — callers tune nProbe down (1-10%
    * of cells); these gate wrappers tune UP for the driver-graded
    * recall floor at bench scale. */
  private def gateProbe(nCells: Int): Int =
    if (envProbe < 0) 0 // "lib": defer to query()'s half-cell default
    else if (envProbe > 0) envProbe
    else math.ceil(nCells * 0.8).toInt

  /** Embedding-cosine near-duplicate pairs, exact blocked all-pairs.
    * This corpus's true near-dups sit at cosine 0.4-0.5, where sign-LSH
    * cannot prune (bit agreement 0.63 vs 0.5 random) — the exact tiled
    * path is the correct tool and is DuckDB-oracle-checked; the LSH
    * variant (Similarity.cosineNearDup) is the high-threshold scale
    * path, covered by OpsSpec. */
  def e03CosineNearDup(s: SparkSession, dir: String): DataFrame =
    Similarity.cosineNearDupExact(emb(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec")))
      .orderBy("id_a", "id_b")

  /** Product-quantization sub-codes under the seeds-only codebook
    * (iters=0, md5-hash-ordered seed sample): every float op in the
    * encode argmin is sequential in index order, so the DuckDB oracle
    * reproduces each of the corpus's 8 sub-codes per vector
    * bit-for-bit. The trained-codebook ADC path (graft.ops.Pq.adcKnn)
    * is approximate by design and graded by PqSpec's recall/identity
    * checks instead. */
  def e04PqCodes(s: SparkSession, dir: String): DataFrame =
    pqCodesGate(emb(s, dir)
      .select(col("vec_id").as("id"), col("embedding").as("vec")))

  /** Shared seeds-only (iters=0, md5-ordered) PQ encode gate body for
    * e04 (plain) and e08 (rotated) — one copy keeps the twin gates'
    * shapes in lockstep. */
  private def pqCodesGate(e: DataFrame): DataFrame = {
    val cb = graft.ops.Pq.train(e, "id", "vec", m = 8, ks = 16, iters = 0)
    graft.ops.Pq.encode(e, "vec", cb)
      .select(col("id").as("vec_id"),
        posexplode(col("codes")).as(Seq("m", "code")))
      .orderBy("vec_id", "m")
  }

  /** Rotated product quantization (OPQ-lite): the e04 pipeline under
    * graft.ops.Pq.rotateCol's deterministic signed-permutation
    * rotation — PQ wastes codebook capacity on correlated dimensions,
    * and a cheap orthogonal transform is the standard decorrelation
    * step. The rotation is ±1·permute (IEEE-exact), so the whole
    * rotate→seed→encode chain stays bit-reproducible by the DuckDB
    * oracle, which re-derives perm and signs from the same md5 rule. */
  def e08PqRotated(s: SparkSession, dir: String): DataFrame =
    pqCodesGate(emb(s, dir).select(col("vec_id").as("id"),
      graft.ops.Pq.rotateCol(col("embedding"), 64).as("vec")))

  /** Learned OPQ (Ge et al. 2013, non-parametric): alternating Lloyd
    * codebooks / orthogonal-Procrustes rotation updates, warm-started
    * from e08's fixed signed permutation, then ADC top-5 with exact
    * rerank under the learned rotation. The rotation is a driver-side
    * d×d SVD — not expressible in a SQL oracle, so this is a rows-only
    * gate; the monotone-MSE-improvement claim is graded in PqSpec and
    * the encode/ADC machinery is oracle-proven by e04/e06/e08. Exact
    * cosine rerank is rotation-invariant (orthogonal R), so ranks are
    * comparable to e01's. */
  /** Train-if-absent the shared e09 OPQ model and return its path —
    * ONE copy of the training hyperparameters: e09 and e10 share the
    * cache key, so two literal copies of (m, ks, iters, opqIters)
    * could drift and leave one gate silently loading a model trained
    * with the other's parameters. */
  private def ensureOpqModel(s: SparkSession, dir: String,
      e: DataFrame): String = {
    val mPath = idxPath(s, dir, "e09")
    if (!graft.ops.Pq.opqExists(s, mPath)) {
      val (cb0, r0) = graft.ops.Pq.trainOpq(e, "id", "vec",
        m = 8, ks = 16, iters = 1, opqIters = 2)
      graft.ops.Pq.saveOpq(mPath, cb0, r0, s)
    }
    mPath
  }

  def e09PqOpq(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    // build-once/query-many like e02/e05: the alternating Lloyd/SVD
    // training persists as a saved model keyed by the data directory,
    // so the gate measures rotate+encode+ADC+rerank probe cost
    val (cb, r) = graft.ops.Pq.loadOpq(s, ensureOpqModel(s, dir, e))
    val rot = e.select(col("id"),
      graft.ops.Pq.matVecCol(col("vec"), r, 64).as("vec"))
    val enc = graft.ops.Pq.encode(rot, "vec", cb)
    val qr = q.select(col("qid"),
      graft.ops.Pq.matVecCol(col("qvec"), r, 64).as("qvec"))
    graft.ops.Pq.adcKnnRerank(enc, rot, qr, cb, 5).orderBy("qid", "rank")
  }

  /** OPQ + IVF-PQ composition — the full FAISS "OPQ_M,IVFx,PQM" shape:
    * the learned orthogonal rotation (e09's saved model) decorrelates
    * the space, IVF-PQ indexes the ROTATED corpus, and queries rotate
    * before probing. Exact-cosine rerank is rotation-invariant
    * (orthogonal R preserves dot products and norms), so results are
    * comparable to e01/e05 ranks. Approximate by design (rows-only);
    * every component is proven elsewhere: rotation math by PqSpec
    * (RRᵀ=I, monotone MSE), encode by e04/e08, the IVFADC pipeline by
    * e06's deterministic oracle. Both artifacts load from saved
    * parquet — at scale this is train-once/serve-many. */
  def e10KnnOpqIvfPq(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    // the rotation reuses e09's saved OPQ model (ensureOpqModel holds
    // the single copy of the training params); building it here when
    // e09 has not run keeps the gate standalone
    val (_, r) = graft.ops.Pq.loadOpq(s, ensureOpqModel(s, dir, e))
    val rot = e.select(col("id"),
      graft.ops.Pq.matVecCol(col("vec"), r, 64).as("vec"))
    // the saved IVF-PQ index is only valid UNDER this rotation: fold a
    // hash of R into the cache key so retraining just the e09 model
    // (e.g. after deleting its dir) can never leave a surviving e10
    // index silently queried under a mismatched rotation (ADVICE r6).
    // Since r16 the hash is also PINNED in the index meta and enforced
    // on append and (here) on the rotated query path — the path-naming
    // convention alone guarded nothing (VERDICT r15 #2).
    val path = idxPath(s, dir, s"e10-${graft.ops.Pq.rotationHash(r)}")
    if (!graft.ops.IvfPq.exists(s, path))
      graft.ops.IvfPq.build(rot, m = 8, ks = 64, pqIters = 1,
        persist = false).save(path, rot = graft.ops.Pq.rotationHash(r))
    graft.ops.Pq.checkRotation(s, path, r)
    val idx = graft.ops.IvfPq.load(s, path, persist = false)
    val qr = q.select(col("qid"),
      graft.ops.Pq.matVecCol(col("qvec"), r, 64).as("qvec"))
    idx.query(qr, 5, nProbe = gateProbe(idx.nCells), fetch = envFetch(100))
      .orderBy("qid", "rank")
  }

  /** IVF-PQ (IVFADC) top-5 with exact rerank — the production
    * billion-scale ANN shape: coarse cells prune, residual PQ codes
    * score, raw vectors rerank the shortlist. Approximate by design
    * (rows-only check); the encode path is oracle-proven by e04, the
    * FULL deterministic pipeline by e06, and the recall ladder by
    * PqSpec.
    *
    * Build-once/query-many: the index persists as parquet tables
    * (IvfPqIndex.save) keyed by the data directory, and EVERY query —
    * including the first, right after building — runs from the saved
    * tables, so results are identical across repetitions and across
    * sessions, and repeated bench/verify runs pay the build cost once
    * (VERDICT r3: rebuilding per call was 21% of the whole bench). */
  def e05KnnIvfPq(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val path = idxPath(s, dir, "e05")
    if (!graft.ops.IvfPq.exists(s, path))
      graft.ops.IvfPq.build(e, m = 8, ks = 64, pqIters = 1, persist = false)
        .save(path)
    val idx = graft.ops.IvfPq.load(s, path, persist = false)
    idx.query(q, 5, nProbe = gateProbe(idx.nCells), fetch = envFetch(100))
      .orderBy("qid", "rank")
  }

  /** Deterministic IVF-PQ verification gate: md5-ordered seeding for
    * BOTH quantizers, zero Lloyd/PQ refinement iterations, fixed 4
    * cells / 2 probes — every float op in cells→residuals→codes→LUT→
    * ADC→rerank is sequential in index order, so the DuckDB oracle
    * reproduces the whole pipeline bit-for-bit (e05 stays the
    * production approximate path; this gate proves its plumbing). */
  def e06KnnIvfPqVerify(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val idx = graft.ops.IvfPq.build(e, nCells = 4, m = 8, ks = 16,
      pqIters = 0, refineIters = 0, persist = false, md5Seeds = true)
    idx.query(q, 5, nProbe = 2, fetch = 20).orderBy("qid", "rank")
  }

  /** Scalar-quantization (SQ8) byte codes under the per-dimension
    * min/max model trained on the corpus itself (graft.ops.Sq) — the
    * cheapest rung of the quantization ladder (4× memory, one min/max
    * training pass, no codebook). min/max are exact aggregates and the
    * encode rounding is deterministic double arithmetic, so the oracle
    * re-derives the model AND every byte code bit-for-bit. */
  def e11SqCodes(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec"))
    val model = graft.ops.Sq.train(e, "vec")
    graft.ops.Sq.encode(e, "vec", model)
      .select(col("id").as("vec_id"),
        posexplode(col("codes")).as(Seq("d", "code")))
      // codes store as signed tinyints (the realized 4×); the gate
      // reports the unsigned 0..255 value the oracle derives
      .select(col("vec_id"), col("d"),
        graft.ops.Sq.codeAsInt(col("code")).as("code"))
      .orderBy("vec_id", "d")
  }

  /** Compressed-domain kNN over SQ8 codes (graft.ops.Sq.adcKnn):
    * asymmetric cosine of the raw query against inline-decoded
    * candidates. Unlike the trained PQ/IVF search gates this one is
    * FULLY oracle-proven — decode, dot and norms are sequential double
    * math, so every similarity and rank hash-matches DuckDB (no
    * rows-only caveat anywhere in the SQ pipeline). */
  def e12KnnSq8(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val model = graft.ops.Sq.train(e, "vec")
    graft.ops.Sq.adcKnn(graft.ops.Sq.encodeCorpus(e, "vec", model),
      q, model, 5).orderBy("qid", "rank")
  }

  /** Deterministic IVF-SQ8 verification gate (graft.ops.IvfSq — the
    * FAISS "IVF4,SQ8" shape): md5-ordered cell seeding, zero Lloyd
    * refinement — cells → residuals → per-dim min/max → byte codes →
    * fused decode+dot scoring → exact rerank are ALL sequential double
    * math, so the DuckDB oracle reproduces the composed index end to
    * end (e06's recipe, with the residual quantizer swapped from PQ to
    * SQ8 — unlike trained PQ, the SQ residual model itself is
    * oracle-derivable, so nothing in this pipeline is engine-specific). */
  def e13KnnIvfSqVerify(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val idx = graft.ops.IvfSq.build(e, nCells = 4, refineIters = 0,
      persist = false, md5Seeds = true)
    idx.query(q, 5, nProbe = 2, fetch = 20).orderBy("qid", "rank")
  }

  /** End-to-end SHARDED-ANN verification gate (VERDICT r14 #7): build
    * a deterministic IVF-SQ index (e13's recipe — md5 seeds, zero
    * refinement) over 3/4 of the corpus, fold the remaining quarter in
    * as TWO append shards (frozen centroids + frozen SQ model), and
    * query THROUGH the persisted three-shard layout. This pins the
    * sharded read path itself — meta frontier, shard-union scans,
    * per-shard encode, the swap-committed meta — to a full-hash DuckDB
    * oracle (the e13 math with centroid seeding and the SQ min/max
    * model restricted to the BUILD subset; appended rows encode under
    * the frozen model exactly as `IvfSq.append` does, clamping
    * included). Until now the sharded layout was only spec-checked
    * (identity vs pre-append results), never oracle-proven.
    *
    * A FRESH temp dir per call: the gate's appends must not accumulate
    * onto a cached index across bench/verify repetitions. */
  def e15KnnIvfSqSharded(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-e15")
      .toString + "/idx"
    graft.ops.IvfSq.build(e.filter(col("id") % 4 =!= 0), nCells = 4,
      refineIters = 0, persist = false, md5Seeds = true).save(path)
    graft.ops.IvfSq.append(e.filter(col("id") % 8 === 0), path, tag = "delta-a")
    graft.ops.IvfSq.append(e.filter(col("id") % 8 === 4), path, tag = "delta-b")
    val idx = graft.ops.IvfSq.load(s, path, persist = false)
    idx.query(q, 5, nProbe = 2, fetch = 20).orderBy("qid", "rank")
  }

  /** Shard compaction proven end-to-end by ORACLE, not just by spec
    * identity (r16, the merge's own gate): e15's exact recipe —
    * deterministic sharded IVF-SQ build plus two frozen-model appends
    * — followed by [[graft.ops.IvfSq.compact]], querying THROUGH the
    * merged single-shard layout. Compaction is result-invariant by
    * contract, so the oracle IS e15's SQL verbatim: a merge that
    * changed any byte of any result (rewrite, CAS meta commit,
    * base-raised reads, sweep) would hash-mismatch this gate. Fresh
    * temp dir per call (the e15 rule). */
  def e18KnnIvfSqCompacted(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-e18")
      .toString + "/idx"
    graft.ops.IvfSq.build(e.filter(col("id") % 4 =!= 0), nCells = 4,
      refineIters = 0, persist = false, md5Seeds = true).save(path)
    graft.ops.IvfSq.append(e.filter(col("id") % 8 === 0), path, tag = "delta-a")
    graft.ops.IvfSq.append(e.filter(col("id") % 8 === 4), path, tag = "delta-b")
    graft.ops.IvfSq.compact(s, path)
    val idx = graft.ops.IvfSq.load(s, path, persist = false)
    idx.query(q, 5, nProbe = 2, fetch = 20).orderBy("qid", "rank")
  }

  /** REBUILD proven end-to-end by ORACLE (r16, the lifecycle's last
    * step): e15's recipe (deterministic build over 3/4 + two
    * frozen-model appends), then [[graft.ops.IvfSq.rebuild]] — which
    * retrains centroids and the SQ model from the index's own stored
    * corpus (now the FULL corpus) — then query. A correct rebuild is
    * bit-identical to building from scratch over the full corpus, so
    * the oracle IS e13's SQL verbatim (the e18 sharing pattern):
    * stored vectors re-enter training WITHOUT re-normalization
    * (buildFromUnit — re-applying vecUnit would perturb each
    * coordinate by an ulp and break the equality). Fresh temp dir per
    * call (the e15 rule). */
  def e19KnnIvfSqRebuilt(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-e19")
      .toString + "/idx"
    graft.ops.IvfSq.build(e.filter(col("id") % 4 =!= 0), nCells = 4,
      refineIters = 0, persist = false, md5Seeds = true).save(path)
    graft.ops.IvfSq.append(e.filter(col("id") % 8 === 0), path, tag = "delta-a")
    graft.ops.IvfSq.append(e.filter(col("id") % 8 === 4), path, tag = "delta-b")
    graft.ops.IvfSq.rebuild(s, path, nCells = 4, refineIters = 0,
      md5Seeds = true)
    val idx = graft.ops.IvfSq.load(s, path, persist = false)
    idx.query(q, 5, nProbe = 2, fetch = 20).orderBy("qid", "rank")
  }

  /** End-to-end SHARDED OPQ+IVF-PQ verification gate — the e15
    * treatment for the IVF-PQ append path (until now spec-only), with
    * the e08 FIXED signed-permutation rotation standing in for the
    * trained OPQ matrix so the whole composition stays
    * oracle-derivable: rotate the corpus (±1·permute — IEEE-exact),
    * build a deterministic IVF-PQ index (e06's recipe — md5 seeds for
    * cells AND codebook, zero refinement) over 3/4 of the rotated
    * corpus, fold the remaining quarter in as TWO `IvfPq.append`
    * shards (frozen centroids + frozen codebook — the exact arithmetic
    * `Pq.appendOpq` runs after its rotation step), and query through
    * the persisted three-shard layout with rotated queries. The oracle
    * is e06's SQL with the rotation CTE prefixed and the cell/codebook
    * seed pools restricted to the BUILD subset; appended rows assign
    * and encode under the frozen model with the same formulas as build
    * rows, so ONE enc CTE covers all three shards. Fresh temp dir per
    * call (the e15 rule: appends must not accumulate across reps). */
  def e17KnnOpqIvfPqSharded(s: SparkSession, dir: String): DataFrame = {
    val (e, q) = knnInputs(s, dir)
    val er = e.select(col("id"), graft.ops.Pq.rotateCol(col("vec"), 64).as("vec"))
    val path = java.nio.file.Files.createTempDirectory("graft-e17")
      .toString + "/idx"
    graft.ops.IvfPq.build(er.filter(col("id") % 4 =!= 0), nCells = 4,
      m = 8, ks = 16, pqIters = 0, refineIters = 0, persist = false,
      md5Seeds = true).save(path)
    graft.ops.IvfPq.append(er.filter(col("id") % 8 === 0), path,
      tag = "delta-a")
    graft.ops.IvfPq.append(er.filter(col("id") % 8 === 4), path,
      tag = "delta-b")
    val idx = graft.ops.IvfPq.load(s, path, persist = false)
    val qr = q.select(col("qid"),
      graft.ops.Pq.rotateCol(col("qvec"), 64).as("qvec"))
    idx.query(qr, 5, nProbe = 2, fetch = 20).orderBy("qid", "rank")
  }

  /** Drift telemetry as a hash-gated pipeline (the d58 rule: a
    * scale-ops tool is machinery once an oracle re-derives it, not
    * just a spec claim): deterministic IVF-SQ build (e13's recipe)
    * over 3/4 of the corpus, ONE append shard, then
    * `IvfSq.driftStats` — per-shard row count, mean residual norm
    * and drift_ratio vs the build shard. Every number is sequential
    * double math over a deterministic assignment, so DuckDB re-derives
    * the whole table (residual norms per row, per-shard means, the
    * ratio); the build shard's ratio is exactly 1.0 by construction.
    * Fresh temp dir per call (the e15 rule). */
  def e16DriftStats(s: SparkSession, dir: String): DataFrame = {
    val (e, _) = knnInputs(s, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-e16")
      .toString + "/idx"
    graft.ops.IvfSq.build(e.filter(col("id") % 4 =!= 0), nCells = 4,
      refineIters = 0, persist = false, md5Seeds = true).save(path)
    graft.ops.IvfSq.append(e.filter(col("id") % 4 === 0), path, tag = "delta")
    graft.ops.IvfSq.driftStats(s, path).orderBy("shard")
  }

  /** SemDeDup-style semantic dedup over the embeddings table
    * (cluster → within-cell cosine pairs → connected-component
    * collapse → canonical keep-set), fully deterministic (md5-seeded
    * cells, no refinement) so the DuckDB oracle reproduces the whole
    * operator: assignment, rounded-cosine thresholding, and the
    * recursive-CTE component labels. */
  def e07SemanticDedup(s: SparkSession, dir: String): DataFrame =
    Similarity.semanticDedup(
        emb(s, dir).select(col("vec_id").as("id"), col("embedding").as("vec")),
        threshold = 0.4, nCells = 4, refineIters = 0, md5Seeds = true)
      .select(col("id").as("vec_id"), col("cluster_id"), col("is_canonical"))
      .orderBy("vec_id")

  /** Multimodal binary plumbing: documents' text payloads treated as
    * opaque binary assets — byte stats + strided chunk sampling
    * (graft.ops.Multimodal; decode is stubbed, plumbing is real). */
  def m01Multimodal(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val assets = docs(s, dir)
      .withColumn("content", col("text").cast("binary"))
    val stats = assets.withColumn("bs", Multimodal.byteStats(col("content")))
    val chunks = Multimodal.sampleChunksDf(assets, "content", chunkBytes = 256, stride = 2)
      .groupBy("doc_id").agg(count(lit(1)).as("n_chunks_sampled"))
    stats.select(col("doc_id"), col("bs.n_bytes").as("n_bytes"),
        col("bs.magic").as("magic"))
      .join(chunks, "doc_id")
      .orderBy("doc_id")
  }

  /** Mime sniffing over synthetic media containers: deterministic magic
    * bytes (JPEG/PNG/ID3 by doc_id mod 4) prepended to the text payload
    * on BOTH engines, then graft.ops.Multimodal.sniffMime classifies
    * and the per-mime distribution is compared — proves the magic-byte
    * dispatch, not just the plumbing. */
  def m02MimeSniff(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    val magic = when(col("doc_id") % 4 === 0,
        lit(Array(0xFF, 0xD8).map(_.toByte)))
      .when(col("doc_id") % 4 === 1,
        lit(Array(0x89, 0x50, 0x4E, 0x47).map(_.toByte)))
      .when(col("doc_id") % 4 === 2,
        lit(Array(0x49, 0x44, 0x33).map(_.toByte)))
      .otherwise(lit(Array.empty[Byte]))
    docs(s, dir)
      .withColumn("content", concat(magic, col("text").cast("binary")))
      .select(col("doc_id"), Multimodal.sniffMime(col("content")).as("mime"))
      .groupBy("mime")
      .agg(count(lit(1)).as("n"), min("doc_id").as("first_doc"))
      .orderBy("mime")
  }

  /** Byte-level SimHash over binary payloads (the multimodal dedup
    * sketch): 4-byte chunks vote, md5 chunk hashing so the DuckDB
    * oracle re-derives every bit (m03 grades the sketch; the XXH64
    * variant is the production path, and pair generation reuses the
    * d08/d12 blocked join on the resulting (id, simhash) frame). */
  def m03ByteSimhash(s: SparkSession, dir: String): DataFrame = {
    import graft.ops.Multimodal
    docs(s, dir)
      .withColumn("content", col("text").cast("binary"))
      .select(col("doc_id"),
        lpad(bin(Multimodal.byteSimhash(col("content"), md5Words = true)),
          64, "0").as("sig"))
      .orderBy("doc_id")
  }

  /** SimHash fingerprint with an engine-reproducible word hash (first
    * 8 md5 bytes), emitted as a 64-char bit string: proves the Charikar
    * voting logic against the DuckDB oracle. The production path (d08)
    * keeps XXH64 word hashes, which no SQL engine reproduces. */
  def d11SimhashVerify(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      lpad(bin(graft.functions.CatalystFunctions.simhashMd5(
        TextFunctions.words(col("text")))), 64, "0").as("sig"))
      .orderBy("doc_id")

  /** SimHash near-dup PAIRS on the engine-reproducible md5 word-hash
    * path, radius 3: with maxHamming+1 = 4 blocks the pigeonhole
    * guarantee makes candidate recall exactly 100%, so the blocked
    * banded join must reproduce the oracle's brute-force O(n^2)
    * hamming scan bit-for-bit — this gate grades the d08 production
    * path's recall contract, not just its row count (VERDICT r2). */
  def d12SimhashPairsVerify(s: SparkSession, dir: String): DataFrame =
    Dedup.simhashPairsFrom(
      docs(s, dir).select(col("doc_id"),
        graft.functions.CatalystFunctions.simhashMd5(
          TextFunctions.words(col("text"))).as("simhash")),
      maxHamming = 3)
      .orderBy("id_a", "id_b")

  /** Winnowed rolling-hash fingerprints (MOSS document sketch) per
    * doc, exploded long-format; mod-2^20 Rabin hashes are reproduced
    * exactly by the DuckDB oracle's list_reduce. */
  def d13WinnowFingerprint(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      explode(TextFunctions.winnowFingerprints(col("text"), 8, 8)).as("fp"))
      .orderBy("doc_id", "fp")

  /** Partial-overlap pairs by fingerprint containment (inverted-index
    * join; threshold 0.3 so the corpus's near-dup clusters surface). */
  def d14WinnowOverlap(s: SparkSession, dir: String): DataFrame =
    Dedup.winnowOverlapPairs(docs(s, dir), threshold = 0.3)
      .orderBy("id_a", "id_b")

  /** Benchmark decontamination: docs 480+ play the held-out benchmark,
    * the rest the training corpus; any training doc sharing a distinct
    * 3-gram shingle with a benchmark doc is flagged with its overlap
    * count (the corpus's near-dup clusters straddle the split, so the
    * gate exercises real hits). Shingle-hash counts equal string-
    * shingle counts w.h.p., which the DuckDB oracle verifies. */
  def d20Decontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    Dedup.decontaminate(d.filter(col("doc_id") < 480),
        d.filter(col("doc_id") >= 480))
      .orderBy("doc_id")
  }

  /** Near-dup cluster collapse — the last mile of the dedup suite
    * (VERDICT r3 missing #1): md5-simhash candidate pairs (the
    * engine-reproducible d12 path) collapse into connected components
    * via alternating large-star/small-star, every doc gets its
    * cluster's min id and a canonical flag. The DuckDB oracle
    * re-derives components with a recursive-CTE transitive closure —
    * an O(n²·diameter) formulation nobody would run at scale, which is
    * exactly why it makes a trustworthy oracle for the O(log n)
    * distributed algorithm. */
  def d19DedupClusters(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.simhashPairsFrom(
      d.select(col("doc_id"),
        graft.functions.CatalystFunctions.simhashMd5(
          TextFunctions.words(col("text"))).as("simhash")),
      maxHamming = 3)
    Dedup.clusterPairs(pairs, d).orderBy("doc_id")
  }

  /** Keep-best dedup policy (graft.ops.Dedup.keepBestByScore — the
    * FineWeb selection rule): d19's near-dup clusters, but per cluster
    * the LONGEST document survives instead of the arbitrary min-id
    * canonical. Score = length(text), deterministic in both engines;
    * ties break to the smaller id. */
  def d54DedupKeepBest(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val pairs = Dedup.simhashPairsFrom(
      d.select(col("doc_id"),
        graft.functions.CatalystFunctions.simhashMd5(
          TextFunctions.words(col("text"))).as("simhash")),
      maxHamming = 3)
    val labels = Dedup.clusterPairs(pairs, d).select("doc_id", "cluster_id")
    Dedup.keepBestByScore(labels,
        d.select(col("doc_id"), length(col("text")).as("score")))
      .select("doc_id", "cluster_id", "keep")
      .orderBy("doc_id")
  }

  /** Incremental near-dup dedup against a persisted LSH index
    * (graft.ops.Dedup.buildLshIndex / dedupDelta — the d53 BM25-index
    * protocol applied to MinHash-LSH): the corpus splits into a
    * standing part (doc_id % 5 ≠ 0, indexed once) and an arriving
    * delta shard (doc_id % 5 = 0), and the delta path must emit
    * EXACTLY the delta-touching pairs of a full-corpus recompute — the
    * oracle is d06's exact all-pairs Jaccard restricted to pairs with
    * a delta member (LSH recall at this corpus's J ≥ 0.9 pairs is
    * 1−1e-15, the d06 argument). The gate rebuilds the index each call
    * (sequential gates, bounded corpus); real deployments build once
    * and run dedupDelta per arriving shard. */
  def d55LshDeltaDedup(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-d55-${System.getProperty("user.name", "u")}-" +
        dir.replaceAll("[^A-Za-z0-9.-]", "_")).getPath
    val d = docs(s, dir)
    Dedup.buildLshIndex(d.filter(col("doc_id") % 5 =!= 0),
      "doc_id", "text", path)
    Dedup.dedupDelta(d.filter(col("doc_id") % 5 === 0),
        "doc_id", "text", path)
      .orderBy("id_a", "id_b")
  }

  /** Incremental SimHash near-dup dedup against a persisted index
    * (graft.ops.Dedup.buildSimhashIndex / simhashDelta — the d55
    * protocol for the Charikar-sketch family, and unlike LSH the
    * pigeonhole recall is EXACT): same %5 corpus/delta split, md5
    * fingerprints (the d12 engine-reproducible path), radius 3 read
    * from the index meta. Oracle = d12's brute-force hamming scan
    * restricted to delta-touching pairs — full hash gate. */
  def d57SimhashDelta(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-d57-${System.getProperty("user.name", "u")}-" +
        dir.replaceAll("[^A-Za-z0-9.-]", "_")).getPath
    val fp = docs(s, dir).select(col("doc_id"),
      graft.functions.CatalystFunctions.simhashMd5(
        TextFunctions.words(col("text"))).as("simhash"))
    Dedup.buildSimhashIndex(fp.filter(col("doc_id") % 5 =!= 0), path)
    Dedup.simhashDelta(fp.filter(col("doc_id") % 5 === 0), path)
      .orderBy("id_a", "id_b")
  }

  /** Count-min-sketch vocabulary top-k (graft.ops.Telemetry
    * .vocabTopKSketch — d26's bounded-state 100 TB twin): because the
    * CMS rows hash via disjoint 32-bit words of each word's md5 (the
    * streaming-sketch recipe), the whole sketch is DETERMINISTIC and
    * engine-reproducible — the oracle rebuilds the counters in SQL
    * (same signed-int32 wrap, same floorMod) and re-derives every
    * estimate. At this corpus's vocabulary the width (2^14) is ample,
    * so estimates equal exact counts AND the top-k equals d26's; the
    * gate still grades the sketch MACHINERY (row indexing, counter
    * sums, min-over-rows, tie order), not just the counts. */
  def d58VocabSketch(s: SparkSession, dir: String): DataFrame =
    graft.ops.Telemetry.vocabTopKSketch(docs(s, dir), "text",
        k = 100, width = 1 << 14, depth = 4, cand = 4096)
      .orderBy(col("n_est").desc, col("word"))

  /** Trained-shape multi-class language ID
    * (graft.ops.QualityClassifier.scoreSparseMulti — the fastText K-
    * class head, Joulin 2016 §2, that CCNet/RefinedWeb run as their
    * first gate): per-class margins over md5-bucketed uni+bigram
    * features with FIXED dyadic weights (the d34 train-via-spec /
    * apply-via-oracle split — a trained weight vector is a runtime
    * float artifact no cross-engine oracle can reproduce; OpsSpec
    * proves [[graft.ops.QualityClassifier.trainMulti]] learns a
    * separable 3-language corpus), argmax with ties to the earliest
    * class in fixed [en, de, fr, es, zh] order. Dyadic weights make
    * every margin an exact multiple of 2⁻⁶ — order-independent sums,
    * so margins AND the argmax hash-match in any engine. */
  def d56LangIdScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = (c: org.apache.spark.sql.Column) =>
      graft.ops.Sampling.featureBucket(c, 10000)
    val weights = d56Weights.toDF("word", "cls", "w")
      .select(bucket(col("word")).as("b"), col("cls"), col("w"))
    val feats = docs(s, dir)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        explode(TextFunctions.uniBigrams(
          TextFunctions.words(col("text")))).as("f"))
      .select(col("id"), bucket(col("f")).as("b"))
    graft.ops.QualityClassifier.scoreSparseMulti(feats, weights, d56Biases)
      .select(col("id").as("doc_id") +: col("n_feats") +:
        d56Biases.map { case (c, _) =>
          round(col(s"margin_$c"), 4).as(s"margin_$c") } :+
        col("pred").as("lang_pred"): _*)
      .orderBy("doc_id")
  }

  /** The d56 weight table — ONE copy both the gate and its oracle
    * render (marker words chosen from the synthetic vocabulary so
    * margins actually vary per doc; one bigram feature exercises the
    * bigram half of the featurizer). All weights dyadic. */
  private val d56Weights: Seq[(String, String, Double)] = Seq(
    ("the", "en", 0.5), ("table", "en", 0.25), ("order", "en", 0.125),
    ("the a", "en", 0.0625),
    ("customer", "de", 0.5), ("batch", "de", 0.25), ("hash", "de", 0.125),
    ("scan", "fr", 0.5), ("query", "fr", 0.25), ("data", "fr", 0.125),
    ("slow", "es", 0.5), ("agg", "es", 0.25), ("merge", "es", 0.125),
    ("join", "zh", 0.5), ("row", "zh", 0.25), ("small", "zh", 0.125))
  private val d56Biases: Seq[(String, Double)] = Seq(
    "en" -> 0.125, "de" -> 0.0625, "fr" -> 0.03125,
    "es" -> 0.0, "zh" -> -0.03125)

  /** C4/RefinedWeb-style corpus-level line dedup: the documents table
    * has no newlines (single-line word soup), so the gate first lays
    * each doc out as 10-word lines — deterministically, on BOTH
    * engines (the m02 fixture pattern) — then runs the real operator:
    * global line frequency, drop every occurrence of any line seen
    * twice+ corpus-wide, reassemble survivors in order. 127 of the
    * sf0.01 corpus's 2798 lines repeat across docs (near-dup docs
    * share aligned runs), so the gate exercises real removals. */
  def d21LineDedup(s: SparkSession, dir: String): DataFrame = {
    val ws = TextFunctions.words(col("text"))
    // clamp: a 0-word doc is ONE empty line on both engines (an
    // unclamped sequence(0, -1) DESCENDS — the byteStats bug class)
    val nch = greatest(ceil(size(ws) / lit(10.0)).cast("int"), lit(1))
    val lined = docs(s, dir).select(col("doc_id"),
      array_join(transform(sequence(lit(0), nch - 1),
        i => array_join(slice(ws, i * lit(10) + 1, lit(10)), " ")), "\n")
        .as("text"))
    graft.ops.Dedup.lineDedup(lined, "doc_id", "text", minCount = 2)
      .select(col("doc_id"), col("n_lines"), col("n_kept"),
        md5(col("text").cast("binary")).as("kept_fp"))
      .orderBy("doc_id")
  }

  /** PII scrubbing: count and redact emails / IPv4s / phone numbers.
    * The corpus contains no PII, so the gate injects deterministic
    * synthetic PII per doc_id on BOTH engines (the m02 fixture
    * pattern) — docs get an email unless doc_id%3=0, an IP unless
    * doc_id%4=0, a phone unless doc_id%5=0 — then the real operator
    * counts and redacts; the md5 of the redacted text proves the
    * replacement positions, not just the counts. */
  def d22PiiRedact(s: SparkSession, dir: String): DataFrame = {
    val injected = docs(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 > 0,
          concat(lit(" reach user"), col("doc_id").cast("string"),
            lit("@mail.example.com"))).otherwise(lit("")),
        when(col("doc_id") % 4 > 0,
          concat(lit(" from 10."), (col("doc_id") % 200).cast("string"),
            lit(".7.44"))).otherwise(lit("")),
        when(col("doc_id") % 5 > 0,
          concat(lit(" tel +1-555-"),
            (lit(1000) + col("doc_id") % 9000).cast("string")))
          .otherwise(lit(""))).as("text"))
    injected.select(col("doc_id"),
        TextFunctions.piiCounts(col("text")).as("p"),
        md5(TextFunctions.redactPii(col("text")).cast("binary")).as("red_fp"))
      .select(col("doc_id"), col("p.n_emails").as("n_emails"),
        col("p.n_ips").as("n_ips"), col("p.n_phones").as("n_phones"),
        col("red_fp"))
      .orderBy("doc_id")
  }

  /** Decontamination via a broadcast Bloom filter instead of a
    * broadcast join build side — the shape for benchmark suites too
    * big to broadcast whole. No false negatives + exact confirm join
    * on the survivors ⇒ bit-identical to the d20 semantics (here on a
    * different split: doc_id < 450 vs the rest — 450/50 at sf0.01; at
    * larger SFs the benchmark side becomes the LARGE side, which is
    * precisely the bloom path's stress case), so the same SQL oracles
    * it. */
  def d23BloomDecontaminate(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.ops.Dedup.bloomDecontaminate(d.filter(col("doc_id") < 450),
        d.filter(col("doc_id") >= 450))
      .orderBy("doc_id")
  }

  /** GPT-style concat-and-chunk packing plan: per source, docs in id
    * order, 256-token chunks; each doc's offset and chunk span is
    * closed-form window algebra — the zero-padding-waste packing
    * discipline. */
  def p01PackChunks(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.concatChunkPlan(
        docs(s, dir).select(col("doc_id"), col("source"),
          size(TextFunctions.words(col("text"))).as("n_words")),
        "doc_id", "source", col("n_words"), budget = 256)
      .select(col("doc_id"), col("source"), col("n_words"),
        col("token_offset"), col("chunk_first"), col("n_chunks"))
      .orderBy("doc_id")

  /** First-fit greedy bin packing (docs stay intact): per source, in
    * id order, 120-token bins. The Spark side is the secondary-sort
    * streaming pass; the oracle re-derives the same bins with a
    * recursive CTE stepping row-by-row — sequential semantics nobody
    * could fake with a window function, which is what makes it a
    * trustworthy oracle. */
  def p02PackGreedy(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.greedyPack(docs(s, dir), "doc_id", "source",
        size(TextFunctions.words(col("text"))), budget = 120)
      .select(col("id").as("doc_id"), col("group").as("source"),
        col("n_tokens"), col("bin_id"))
      .orderBy("doc_id")

  /** Sliding-window chunking for RAG/embedding prep: 32-token windows
    * advancing by 24 (8-token overlap), the no-token-lost discipline;
    * pure per-row map, fingerprinted per chunk so the oracle proves
    * content and boundaries, not just counts. */
  def p03ChunkOverlap(s: SparkSession, dir: String): DataFrame =
    graft.ops.Packing.slidingChunks(
        docs(s, dir).select(col("doc_id"),
          TextFunctions.words(col("text")).as("ws")),
        "doc_id", col("ws"), chunkTokens = 32, overlap = 8)
      .select(col("doc_id"), col("chunk_id"), col("n_tokens"),
        md5(col("chunk").cast("binary")).as("chunk_fp"))
      .orderBy("doc_id", "chunk_id")

  /** Bucketed range join (graft.ops.Temporal.rangeJoin): views landing
    * inside each purchase's 2-hour attribution window, per user —
    * hour-bucket equi-join + residual containment, never the |P|·|I|
    * per-key blowup of a naive inequality join. Purchases with no
    * views keep zero counts (left semantics). */
  def q24RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id"),
        col("ts").as("start_ts"),
        (col("ts") + expr("interval 2 hours")).as("end_ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("v_ts"), col("value").as("v_value"))
    val joined = graft.ops.Temporal.rangeJoin(views, purchases,
      Seq("user_id"), "v_ts", "start_ts", "end_ts", "hour")
    val agg = joined.groupBy("p_id")
      .agg(count(lit(1)).as("n_views"),
        round(sum("v_value"), 4).as("sum_view_value"))
    purchases.select("p_id").join(agg, Seq("p_id"), "left_outer")
      .select(col("p_id"), coalesce(col("n_views"), lit(0L)).as("n_views"),
        coalesce(col("sum_view_value"), lit(0.0)).as("sum_view_value"))
      .orderBy("p_id")
  }

  /** Corpus vocabulary: top-100 word frequencies with a deterministic
    * (count desc, word) tie-break — the precursor pass of tokenizer/
    * vocab training and the canonical map-side-combine aggregation:
    * partial counts collapse per task before the one (word, count)
    * shuffle, and the top-k plans as TakeOrderedAndProject (per-
    * partition heaps + driver merge), never a full global sort. */
  def d26VocabTopk(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(explode(TextFunctions.words(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word")).limit(100)

  /** URL audit against a domain blocklist (the C4/RefinedWeb first
    * gate): the corpus has no URLs, so the gate injects deterministic
    * ones per doc_id on BOTH engines (the m02 fixture pattern), then
    * the real operator extracts, resolves domains, and flags docs
    * referencing blocklisted hosts via the broadcast-join path. */
  def d25UrlFilter(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val injected = docs(s, dir).select(col("doc_id"),
      concat(col("text"),
        lit(" see https://site"), (col("doc_id") % 7).cast("string"),
        lit(".example.org/p/"), col("doc_id").cast("string"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" and http://cdn"), (col("doc_id") % 4).cast("string"),
            lit(".example.net/x"))).otherwise(lit(""))).as("text"))
    val blocklist = Seq("site2.example.org", "site5.example.org",
      "cdn1.example.net").toDF("domain")
    graft.ops.UrlOps.auditUrls(injected, blocklist).orderBy("doc_id")
  }

  /** Corpus telemetry: per-language doc counts, distinct sources,
    * token totals, and EXACT length percentiles. Exact `percentile`
    * is a sort-based aggregate (per-group value buffer) — the right
    * tool at codelist-sized group counts; the 100 TB path swaps in
    * `approx_percentile` (t-digest, mergeable partial aggregates,
    * bounded memory) at the cost of oracle exactness. Both engines
    * define the quantile as linear interpolation at rank p·(n-1), so
    * the gate hash-matches. */
  def d24CorpusStats(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("n_words", size(TextFunctions.words(col("text"))))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("source")).as("n_sources"),
        sum("n_words").cast("long").as("total_words"),
        round(avg("n_words"), 4).as("avg_words"),
        round(expr("percentile(n_words, 0.5)"), 4).as("p50_words"),
        round(expr("percentile(n_words, 0.9)"), 4).as("p90_words"))
      .orderBy("lang")

  /** Perplexity quality scoring (CCNet, Wenzek 2020): bigram LM with
    * add-one smoothing trained on a trusted reference slice (first
    * half of the corpus by doc_id), every document scored by mean
    * negative log-likelihood. Model tables broadcast; the corpus is
    * scored map-side and aggregates on one narrow (id, logp) shuffle
    * (graft.ops.LangModel). All counts are integers and each pair's
    * logp is ln of an integer ratio, so the oracle reproduces the
    * score to float rounding. */
  def d27Perplexity(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (bg, cx, v) = graft.ops.LangModel.trainBigram(
      d.filter(col("doc_id") < 250))
    graft.ops.LangModel.scoreNll(d, bg, cx, v)
      .select(col("id").as("doc_id"), col("n_pairs"),
        round(col("avg_nll"), 4).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** Interpolated-trigram perplexity (VERDICT r8 #4 — the credible
    * CCNet-style quality gate: trigram evidence with λ-interpolated
    * fallback through bigram to add-one unigram, λ = 5/10, 3/10, 2/10
    * as exact rationals). Same fixed reference slice and the same
    * oracle-exactness recipe as d27, upgraded to the three-term
    * common-denominator integer ratio (graft.ops.LangModel
    * .scoreNllTrigram). Five broadcast joins, map-side scoring, one
    * narrow (id, nll) aggregate — the model never grows with the
    * corpus. */
  def d28PerplexityTrigram(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val m = graft.ops.LangModel.trainTrigram(d.filter(col("doc_id") < 250))
    graft.ops.LangModel.scoreNllTrigram(d, m)
      .select(col("id").as("doc_id"), col("n_tri"),
        round(col("avg_nll"), 4).as("avg_nll"))
      .orderBy("doc_id")
  }

  /** Exact duplicated-substring spans (Lee et al. 2022): every maximal
    * cross-document run of >= 20 identical word tokens, via k=8 gram
    * anchors chained along match diagonals (graft.ops.Dedup
    * .substringSpans). The anchor hash is the engine-portable 60-bit
    * md5 recipe, so the oracle reproduces the spans exactly. */
  def d29SubstringSpans(s: SparkSession, dir: String): DataFrame =
    graft.ops.Dedup.substringSpans(docs(s, dir))
      .orderBy("id_a", "id_b", "a_pos", "b_pos")

  /** Duplicated-span REMOVAL (the cut half of Lee 2022): spans from
    * d29 cut from the higher-id doc so the min-id occurrence survives
    * (graft.ops.Dedup.removeSpans). Output carries the md5 of the
    * cleaned token stream so the gate proves content + boundaries
    * without shipping full texts. */
  def d31RemoveSpans(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    graft.ops.Dedup.removeSpans(d, graft.ops.Dedup.substringSpans(d))
      .select(col("doc_id"), col("n_tokens"), col("n_kept"),
        md5(col("text_clean").cast("binary")).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** HTML → text extraction (the C4/RefinedWeb web-pipeline first
    * step): the corpus is plain text, so the gate wraps every doc in a
    * deterministic HTML page — head/style/title, a comment, an
    * entity-bearing heading, script, self-closed br, entities — on
    * BOTH engines (the d25/m02 injection pattern), then
    * TextFunctions.stripHtml extracts and the gate compares length +
    * md5 of the recovered text. */
  /** The d32 deterministic HTML page around each doc — ONE copy,
    * shared with d50's WARC round-trip (whose oracle is d32's oracle:
    * lossless ingestion means the framing cancels out exactly). */
  private def d32InjectHtml(d: DataFrame): DataFrame =
    d.select(col("doc_id"), concat(
      lit("<html><head><title>D"), col("doc_id").cast("string"),
      lit("</title><style>p{c:1}</style></head><body><!-- note "),
      col("doc_id").cast("string"),
      lit(" --><h1 class=\"t\">Doc &amp; &lt;"), col("doc_id").cast("string"),
      lit("&gt;</h1><p>"), col("text"),
      lit("</p><script>var x = 1 < 2;</script><br/>&nbsp;tail</body></html>"))
      .as("html"))

  def d32HtmlExtract(s: SparkSession, dir: String): DataFrame = {
    d32InjectHtml(docs(s, dir))
      .select(col("doc_id"),
        TextFunctions.stripHtml(col("html")).as("t"))
      .select(col("doc_id"), length(col("t")).as("n_chars"),
        md5(col("t").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** WARC ingestion round-trip (graft.io.WarcIO — the CommonCrawl
    * entry format): wrap every doc's d32 HTML page in an HTTP response
    * + WARC response record, write ONE real .warc.gz (per-record gzip
    * members, the CC layout), read it back with readWarc, split the
    * HTTP envelope, extract text. The oracle is d32's EXACT query —
    * a hash match proves the whole container path (WARC framing,
    * gzip members, Content-Length byte math, HTTP split, UTF-8
    * round-trip) is byte-lossless. The fixture write is driver-side
    * (the m02/d21 fixture convention; real ingestion reads existing
    * archives); the READ path is the production map-side task. */
  /** Build (if needed, each call — gates run sequentially) the WARC
    * fixture holding every doc's d32 HTML page as an HTTP response
    * record, and return the extracted (doc_id, t) frame — shared by
    * d50 (extraction proof) and d52 (tokenization of the extraction). */
  private def warcExtractedText(s: SparkSession, dir: String): DataFrame = {
    import graft.io.{WarcIO, WarcRecord}
    val pages = d32InjectHtml(docs(s, dir))
      .select(col("doc_id").cast("long"), col("html"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val records = pages.map { case (id, html) =>
      val body = html.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val http = ("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
        s"charset=utf-8\r\nContent-Length: ${body.length}\r\n\r\n")
        .getBytes(java.nio.charset.StandardCharsets.UTF_8) ++ body
      WarcRecord("", id.toInt, "response", s"https://corpus.test/$id",
        "2026-01-01T00:00:00Z", "application/http; msgtype=response",
        Map.empty, http)
    }
    // fixed per-user scratch path, overwritten per call (a fresh temp
    // file per bench rep would leak)
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-d50-${System.getProperty("user.name", "u")}-" +
        dir.replaceAll("[^A-Za-z0-9.-]", "_") + ".warc.gz").getPath
    WarcIO.writeWarc(path, records.toSeq, gzip = true)
    WarcIO.readWarc(s, path)
      .filter(col("warc_type") === "response")
      .select(
        regexp_extract(col("target_uri"), "/([0-9]+)$", 1)
          .cast("long").as("doc_id"),
        TextFunctions.stripHtml(WarcIO.payloadText(
          WarcIO.httpBody(col("content")))).as("t"))
  }

  def d50WarcExtract(s: SparkSession, dir: String): DataFrame =
    warcExtractedText(s, dir)
      .select(col("doc_id"), length(col("t")).as("n_chars"),
        md5(col("t").cast("binary")).as("text_md5"))
      .orderBy("doc_id")

  /** The full container→tokens chain (the round-13 composition story):
    * WARC archive → HTTP envelope split → HTML text extraction →
    * unigram-LM Viterbi tokenization (d49's vocabulary) → per-language
    * token statistics. Every stage is a verbatim-replayable piece the
    * oracle composes from d32's strip CTEs + d49's enumeration; lang
    * rides a broadcast join against the documents table (at real
    * scale, metadata-by-id joins against a docs catalog are exactly
    * this shape). */
  def d52WarcTokenize(s: SparkSession, dir: String): DataFrame = {
    val text = warcExtractedText(s, dir)
    val withLang = text.join(
      broadcast(docs(s, dir).select(col("doc_id"), col("lang"))), "doc_id")
    withLang
      .select(col("lang"), TextFunctions.words(col("t")).as("ws"))
      .select(col("lang"), size(col("ws")).as("nw"),
        graft.ops.Unigram.encodeCol(col("ws"), d49Model).as("u"))
      .groupBy("lang")
      .agg(count(lit(1)).cast("int").as("n_docs"),
        sum(col("nw")).as("n_words"),
        sum(col("u.n_pieces").cast("long")).as("n_pieces"),
        sum((-col("u.score")).cast("long")).as("total_cost"))
      .orderBy("lang")
  }

  /** BPE subword encoding under a FIXED demo merge list (gate-proves
    * the ENCODER: graft.ops.Bpe.encodeCol applies merges in Sennrich
    * order, which is exactly a chain of non-overlapping string
    * replaces over a ·-delimited symbol stream — the oracle runs that
    * chain verbatim). Training determinism is BpeSpec's job (the
    * trained merge list is a runtime value, so it cannot appear in a
    * static oracle). */
  // Fixed demo merge list shared by d33 (encode) and p04 (encode→pack):
  // a static oracle can't contain a trained runtime value, so the gates
  // prove the ENCODER under a fixed list; training is BpeSpec's job.
  private val demoMerges = Seq("t" -> "h", "th" -> "e", "i" -> "n",
    "a" -> "n", "an" -> "d", "e" -> "r", "o" -> "n", "r" -> "e")

  def d33BpeEncode(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .select(col("doc_id"),
        graft.ops.Bpe.encodeCol(TextFunctions.words(col("text")), demoMerges)
          .as("b"))
      .select(col("doc_id"), col("b.n_bpe").as("n_bpe"),
        md5(col("b.toks").cast("binary")).as("toks_md5"))
      .orderBy("doc_id")
  }

  /** BPE byte fallback (graft.ops.Bpe.encodeBytesCol, r18): the d33
    * merge chain over `bpeTokens` of the text plus an injected
    * out-of-alphabet suffix (uppercase, accents, a combining-free °,
    * a Greek letter, an astral emoji — the d36 injection pattern), so
    * every document exercises the `<0xXX>` expansion: characters
    * outside the [a-z0-9] training alphabet byte-expand in maximal
    * runs (astral pair kept whole), in-alphabet runs merge exactly as
    * d33. The oracle re-derives the expansion per CODEPOINT from
    * DuckDB's hex() — equivalent to the run rule, since a run's UTF-8
    * is the concatenation of its codepoints' UTF-8. */
  def d62BpeBytes(s: SparkSession, dir: String): DataFrame = {
    val suffix = " Café 90° straße λ " +
      new String(Character.toChars(0x1F600))
    docs(s, dir)
      .select(col("doc_id"),
        graft.ops.Bpe.encodeBytesCol(
          TextFunctions.bpeTokens(concat(col("text"), lit(suffix))),
          demoMerges).as("b"))
      .select(col("doc_id"), col("b.n_bpe").as("n_bpe"),
        md5(col("b.toks").cast("binary")).as("toks_md5"))
      .orderBy("doc_id")
  }

  /** Streaming pairs fold proven end-to-end by ORACLE (r18, the
    * compactPairs lifecycle): d07's exact n-gram-Jaccard pairs split
    * into two "micro-batch" dirs by id parity, folded in TWO
    * `Dedup.compactPairs` passes — the second consumes ONLY batch=1,
    * re-entering the first fold's committed assignment as contracted
    * edges — then the committed table read back through
    * `loadClusters`. CC over the contracted graph + new edges equals
    * CC over all pairs, so the oracle is d07's pair SQL + d19's
    * recursive-CTE collapse over the SAME documents slice: a fold
    * that dropped an edge, mis-carried the watermark, or broke the
    * contracted-edge algebra would hash-mismatch. Fresh temp dir per
    * call (the e15 rule). */
  def d63PairsFold(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 500)
    val pairs = Dedup.ngramJaccardExact(d)
    val tmp = java.nio.file.Files.createTempDirectory("graft-d63")
      .toString
    pairs.filter(col("id_b") % 2 === 0)
      .write.parquet(s"$tmp/pairs/batch=0")
    Dedup.compactPairs(d.select("doc_id"), "doc_id",
      s"$tmp/pairs", s"$tmp/clusters")
    pairs.filter(col("id_b") % 2 =!= 0)
      .write.parquet(s"$tmp/pairs/batch=1")
    Dedup.compactPairs(d.select("doc_id"), "doc_id",
      s"$tmp/pairs", s"$tmp/clusters")
    Dedup.loadClusters(s, s"$tmp/clusters").orderBy("doc_id")
  }

  /** WordPiece greedy longest-match encode (graft.ops.WordPiece — the
    * BERT tokenizer, completing the big-three subword family next to
    * BPE d33 and unigram-LM d49) under a FIXED demo vocabulary: all
    * [a-z0-9] singles in both positions (so [UNK] never fires and the
    * oracle's per-position fallback is always the single char) plus
    * multi-char pieces whose cores are all >= 2 chars. The oracle
    * replays greedy matching exactly: longest multi-piece match per
    * (word, position) — position 1 takes word-initial pieces, later
    * positions ##-continuations — else the single char, walked
    * linearly by a recursive CTE. Training is OpsSpec's job (the
    * d33/d34 split: a trained vocab is a runtime value). Pure
    * map-side codegen encode; one scan. */
  private val d59Multis = Seq("the", "##he", "##er", "an", "##an",
    "##nd", "in", "##ing", "th", "##ed", "er", "##es")
  private val demoWpVocab = graft.ops.WordPieceVocab(
    (('a' to 'z') ++ ('0' to '9'))
      .flatMap(ch => Seq(ch.toString, "##" + ch)).toVector ++ d59Multis)

  def d59Wordpiece(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .select(col("doc_id"),
        graft.ops.WordPiece.encodeCol(TextFunctions.words(col("text")),
          demoWpVocab).as("b"))
      .select(col("doc_id"), col("b.n_wp").as("n_wp"),
        md5(col("b.toks").cast("binary")).as("toks_md5"))
      .orderBy("doc_id")
  }

  /** WordPiece BYTE-FALLBACK encode (r17, [[graft.ops.WordPiece
    * .encodeBytesCol]]): the d59 greedy matcher under a DELIBERATELY
    * GAPPED vocabulary — consonant singles only, so a word whose
    * vowels/digits fall outside a multi-piece match cannot segment —
    * and each such word (BERT's whole-word [UNK] unit) expands to its
    * UTF-8 `<0xXX>` byte pieces instead. The oracle replays the d59
    * greedy walk WITHOUT the always-present-single fallback: a stuck
    * walk never reaches the end position, and exactly those words
    * byte-expand via hex() — words() emits [a-z0-9]+ runs, so every
    * char is one UTF-8 byte. Proves the closed-vocabulary contract
    * (no [UNK] ever reaches training data) at the ORACLE level; the
    * round-trip/astral cases are OpsSpec's. */
  // consonants + a/e: most corpus words segment (exercising the
  // shared greedy walk), words holding i/o/u/digits outside a
  // multi-piece byte-expand (exercising the fallback) - both paths
  // carry real weight in the hash
  private val d61Singles =
    "abcdefghjklmnpqrstvwxyz".toSeq.map(_.toString)
  private val d61Vocab = graft.ops.WordPieceVocab(
    d61Singles.flatMap(c => Seq(c, "##" + c)).toVector ++ d59Multis)

  def d61WordpieceBytes(s: SparkSession, dir: String): DataFrame = {
    docs(s, dir)
      .select(col("doc_id"),
        graft.ops.WordPiece.encodeBytesCol(TextFunctions.words(col("text")),
          d61Vocab).as("b"))
      .select(col("doc_id"), col("b.n_wp").as("n_wp"),
        md5(col("b.toks").cast("binary")).as("toks_md5"))
      .orderBy("doc_id")
  }

  /** Linear quality-classifier scoring (the fastText-shaped apply
    * path, graft.ops.QualityClassifier.scoreSparse) under a FIXED
    * sparse weight table: weights are dyadic rationals keyed by words
    * whose md5 buckets BOTH engines derive themselves, so the margin
    * is an exact dyadic sum and hash-matches. TRAINED weights are a
    * runtime value (and xxhash64-bucketed) — training correctness is
    * OpsSpec's job, the same split as d33. */
  def d34QualityScore(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val bucket = (c: org.apache.spark.sql.Column) =>
      graft.ops.Sampling.featureBucket(c, 10000)
    val weights = Seq("the" -> 0.25, "and" -> 0.25, "of" -> 0.125,
      "der" -> -0.25, "le" -> -0.25, "el" -> -0.125, "und" -> -0.125,
      "que" -> -0.125).toDF("word", "w")
      .select(bucket(col("word")).as("b"), col("w"))
      .groupBy("b").agg(sum("w").as("w")) // collision-safe: one row per bucket
    val d = docs(s, dir)
    val feats = d
      // one-row-group source = one task; decouple the md5-dense
      // featurization from file-split geometry (Dedup.spread)
      .repartition(s.sparkContext.defaultParallelism)
      .select(col("doc_id").as("id"),
        explode(TextFunctions.uniBigrams(
          TextFunctions.words(col("text")))).as("f"))
      .select(col("id"), bucket(col("f")).as("b"))
    graft.ops.QualityClassifier.scoreSparse(feats, weights, bias = 0.125)
      .select(col("id").as("doc_id"), col("n_feats"),
        round(col("margin"), 4).as("margin"))
      .orderBy("doc_id")
  }

  /** Cluster-balanced deterministic sampling over the embedding space
    * (graft.ops.Similarity.clusterBalancedSample): the 8 lowest
    * vec_ids form the FIXED centroid set (a trained k-means is a
    * runtime value — the d33/d34 train-via-spec/apply-via-oracle
    * split; ClusterSampleSpec proves the operator under IvfIndex
    * centroids), every vector assigns to its max-cosine centroid
    * (unit vectors via the e06 `x·(1/√ss)` recipe, sequential-sum
    * dot, ties to the smaller cell), and each cluster keeps its 10
    * smallest-md5-hash members (the d16 rank recipe). */
  def d35ClusterSample(s: SparkSession, dir: String): DataFrame = {
    val e = emb(s, dir).select(col("vec_id").as("id"),
      col("embedding").as("vec"))
    val cent = e.filter(col("id") < 8)
      .select(col("id").as("cell"), col("vec").as("cvec"))
    Similarity.clusterBalancedSample(e, cent, cap = 10)
      .orderBy("cluster", "rk")
  }

  /** Mojibake repair (the ftfy-style encoding fix ahead of
    * tokenization): every doc gets a deterministic UTF-8-as-
    * Windows-1252-corrupted suffix appended on BOTH engines (the
    * d32/d25 injection pattern — the corpus itself is clean), then
    * TextFunctions.fixMojibake chain-replaces the fixed corruption
    * table and the gate compares length + md5 of the repaired text.
    * Pure map-side replace chain, one scan. */
  def d36FixEncoding(s: SparkSession, dir: String): DataFrame = {
    // CafÃ© â€” itâ€™s â€œnaÃ¯veâ€¦ Ã¼ber Ã§a straÃŸe 90Â° Â©
    val moji = " CafÃ© â€” itâ€™s â€œnaÃ¯veâ€¦ Ã¼ber Ã§a straÃŸe 90Â° Â©"
    docs(s, dir)
      .select(col("doc_id"),
        TextFunctions.fixMojibake(concat(col("text"), lit(moji))).as("t"))
      .select(col("doc_id"), length(col("t")).as("n_chars"),
        md5(col("t").cast("binary")).as("text_md5"))
      .orderBy("doc_id")
  }

  /** Tokenize → pack, end to end: BPE token counts under the fixed
    * d33 merge list feed the GPT-style concat-and-chunk planner
    * (graft.ops.Packing.concatChunkPlan, budget 512, grouped by
    * lang) — the last two stages of a training-data pipeline
    * composed, proving the planner consumes REAL tokenizer output,
    * not the word-count proxy p01 uses. Encode is map-side; the one
    * shuffle is the planner's group window. */
  def p04TokenizePack(s: SparkSession, dir: String): DataFrame = {
    val enc = docs(s, dir).select(col("doc_id"), col("lang"),
      graft.ops.Bpe.encodeCol(TextFunctions.words(col("text")), demoMerges)
        .getField("n_bpe").as("n_bpe"))
    graft.ops.Packing.concatChunkPlan(enc, "doc_id", "lang",
        col("n_bpe"), budget = 512)
      .select(col("doc_id"), col("lang"), col("n_bpe"),
        col("token_offset"), col("chunk_first"), col("n_chunks"))
      .orderBy("doc_id")
  }

  /** Static corpus-mixture sampling (graft.ops.Sampling.mixtureRates/
    * mixtureSample — The Pile-style source weights): plan the largest
    * no-upsampling token budget for lang weights en .6 / de .25 /
    * fr .15, keep each language at its planned deterministic rate
    * (unlisted languages drop), report per-language kept docs+tokens.
    * All-double plan arithmetic and the 60-bit hash filter are
    * engine-exact, so the kept SET (not just its size) matches. */
  def d37MixtureSample(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("n_words",
      size(TextFunctions.words(col("text"))))
    graft.ops.Sampling.mixtureSample(d, "doc_id", "lang",
        col("n_words"), Map("en" -> 0.6, "de" -> 0.25, "fr" -> 0.15))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"))
      .orderBy("lang")
  }

  /** URL canonicalization + URL-keyed dedup (the RefinedWeb FIRST
    * step — one document per canonical URL before any content work):
    * every doc gets a deterministic surface-noisy URL injected on both
    * engines (mixed-case scheme/host, default :443 port, utm/fbclid
    * tracking params, fragment), graft.ops.UrlOps.canonicalizeUrl
    * collapses the noise, and the min-id-per-canonical-URL keep rule
    * reports (curl, keep_id, n_copies). */
  def d39UrlDedup(s: SparkSession, dir: String): DataFrame = {
    val injected = docs(s, dir).select(col("doc_id"), concat(
      lit("HTTPS://Site"), (col("doc_id") % 7).cast("string"),
      lit(".Example.org:443/p/"), (col("doc_id") % 20).cast("string"),
      lit("?utm_source=x"),
      when(col("doc_id") % 2 === 0, lit("&fbclid=abc")).otherwise(lit("")),
      when(col("doc_id") % 3 === 0, lit("&id=9")).otherwise(lit("")),
      lit("#s"), col("doc_id").cast("string")).as("url"))
    injected
      .select(col("doc_id"),
        graft.ops.UrlOps.canonicalizeUrl(col("url")).as("curl"))
      .groupBy("curl")
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy("keep_id")
  }

  /** Fixed-budget multi-epoch mixture (graft.ops.Sampling
    * .mixtureEpochPlan/Expand): a 100k-token target over lang
    * weights en .5 / de .3 / zh .2 forces up-sampling (each slice
    * holds far fewer tokens than its share), so sources repeat —
    * full epochs plus a hashFrac-sampled final pass. The gate
    * aggregates the materialized epoch manifest per language. */
  def d38MixtureEpochs(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("n_words",
      size(TextFunctions.words(col("text"))))
    graft.ops.Sampling.mixtureEpochExpand(d, "doc_id", "lang",
        col("n_words"), Map("en" -> 0.5, "de" -> 0.3, "zh" -> 0.2),
        budgetTokens = 100000L, payloadCols = Seq("n_words"))
      .groupBy("lang")
      .agg(max("full_epochs").as("full_epochs"),
        round(max("last_rate"), 6).as("last_rate"),
        count(lit(1)).as("n_rows"), sum("n_words").as("n_tokens"))
      .orderBy("lang")
  }

  /** Deterministic epoch shuffle (graft.ops.Sampling.epochShuffle):
    * reproducible pseudo-random training order + balanced sharding,
    * seed "ep0" over 8 shards. The 60-bit md5 placement hash is the
    * engine-portable recipe, so the oracle re-derives every (shard,
    * pos) assignment — the gate proves the ORDER, not just counts. */
  def d40EpochShuffle(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.epochShuffle(
        docs(s, dir).select(col("doc_id")), "doc_id", "ep0", nShards = 8)
      .select(col("doc_id"), col("shard"), col("pos"))
      .orderBy("shard", "pos")

  /** DSIR importance scores (Xie 2023): every document scored by the
    * mean hashed-n-gram log importance ratio against the `lang = 'en'`
    * target slice (graft.ops.Sampling.dsirScores). Histograms are
    * integer counts, every log is ln of an exact int64 ratio, so the
    * oracle matches to float rounding (the d27/d28 recipe). */
  def d30DsirScores(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.dsirScores(docs(s, dir), col("lang") === "en")
      .select(col("id").as("doc_id"), col("n_feats"),
        round(col("dsir_score"), 4).as("dsir_score"))
      .orderBy("doc_id")

  /** JSON property extraction from the events props column (scalar
    * function surface: get_json_object). */
  def d09JsonExtract(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
      .groupBy("k")
      .agg(count(lit(1)).as("n"))
      .orderBy("k")

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  /** Backward as-of join (graft.ops.Temporal): each purchase picks the
    * latest preceding view of the same user — the tagged-union/window
    * form (one key shuffle, no pair blowup); DuckDB's native ASOF JOIN
    * is the oracle. Inner-asof: unmatched purchases drop. */
  def q20AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"))
    graft.ops.Temporal.asOfJoin(purchases, views, Seq("user_id"), "ts",
        Seq("view_value"))
      .filter(col("__rtime").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("__rtime")).as("view_ts_us"),
        col("view_value"))
      .orderBy("event_id")
  }

  /** Forward as-of join with tolerance (graft.ops.Temporal): each
    * purchase picks the EARLIEST view at-or-after it, but only within
    * 2 hours — the other half of the as-of surface (q20 gates
    * backward/unbounded). Same tagged-union plan with the sort
    * direction flipped; DuckDB's ASOF JOIN with `<=` plus a gap filter
    * is the oracle. */
  def q23AsofForward(s: SparkSession, dir: String): DataFrame = {
    val ev = events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("value").as("view_value"))
    graft.ops.Temporal.asOfJoin(purchases, views, Seq("user_id"), "ts",
        Seq("view_value"), toleranceSec = Some(7200), direction = "forward")
      .filter(col("__rtime").isNotNull)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        unix_micros(col("__rtime")).as("view_ts_us"),
        col("view_value"))
      .orderBy("event_id")
  }

  /** Gap-based sessionization (1-hour inactivity): per-user ordinal
    * session ids from one lag + running sum over a single key shuffle;
    * the oracle re-derives sessions with the same window algebra. */
  def q21Sessionize(s: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.sessionize(events(s, dir), Seq("user_id"), "ts",
        gapSec = 3600)
      .groupBy("user_id", "session_id")
      .agg(count(lit(1)).as("n_events"),
        min(unix_micros(col("ts"))).as("start_us"),
        max(unix_micros(col("ts"))).as("end_us"))
      .orderBy("user_id", "session_id")

  /** Tumbling hourly window aggregation per event type (the batch twin
    * of EventStream's watermarked windows). */
  def q22WindowAgg(s: SparkSession, dir: String): DataFrame =
    graft.ops.Temporal.tumblingAgg(events(s, dir), "ts", "hour",
        Seq("event_type"),
        Seq(count(lit(1)).as("n"), round(sum("value"), 4).as("sum_value")))
      .select(unix_micros(col("window_start")).as("window_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy("window_us", "event_type")

  /** Composed curation pipeline (the realistic shape: quality filter →
    * language gate → exact dedup → per-language stats), all one
    * Catalyst plan — filters fuse into the scan, one aggregation
    * shuffle for the dedup, one for the stats. */
  def d10PipelineCompose(s: SparkSession, dir: String): DataFrame = {
    val curated = docs(s, dir)
      .withColumn("q", TextFunctions.textFeatures(col("text")))
      .filter(col("q.n_words") >= 20 && col("q.stopword_ratio") >= 0.02)
      .withColumn("lang", col("q.lang"))
      .filter(col("lang").isin("en", "de", "fr", "es"))
      .groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
      // first() without ordering is normally nondeterministic — here it
      // is deterministic BY VALUE: every row in an fp-group shares the
      // whitespace/case-normalized text, so lang and n_words (both
      // functions of the normalized words) are identical across the
      // group, and any "first" returns the same value
      .agg(min("doc_id").as("keep_id"), first("lang").as("lang"),
        first(col("q.n_words")).as("n_words"))
    curated.groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        round(avg("n_words"), 4).as("avg_words"))
      .orderBy("lang")
  }

  /** Within-document repetition stats (Gopher/MassiveText repetition
    * rules, token-count form): one native per-row pass, no explode —
    * counting n-grams inside a document must not shuffle the corpus. */
  def d15Repetition(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        graft.functions.CatalystFunctions.repetitionStats(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.distinct_word_ratio").as("distinct_word_ratio"),
        col("r.top_2gram_frac").as("top_2gram_frac"),
        col("r.dup_3gram_frac").as("dup_3gram_frac"))
      .orderBy("doc_id")

  /** Deterministic per-domain quota: at most 15 docs per source, chosen
    * by md5-hash order (graft.ops.Sampling.groupQuota — the corpus-mix
    * rebalancing op; engine-reproducible, so the oracle recomputes the
    * identical kept set). */
  def d16GroupQuota(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.groupQuota(
      docs(s, dir).select(col("doc_id"), col("source")),
      "doc_id", "source", cap = 15)
      .orderBy("doc_id")

  /** Stratified deterministic sample by language: en kept at 50%,
    * de at 25%, everything else at 10% — the corpus-mixing primitive
    * (hash-filter only; no shuffle, no RNG). */
  def d17StratifiedSample(s: SparkSession, dir: String): DataFrame =
    graft.ops.Sampling.stratified(
      docs(s, dir).select(col("doc_id"), col("lang")),
      "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.25), defaultRate = 0.1)
      .orderBy("doc_id")

  /** Curation-at-scale composition v2: repetition/boilerplate gate →
    * stratified language sample → per-source quota → per-source stats.
    * The whole chain is ONE Catalyst plan: the repetition filter fuses
    * into the scan projection (no shuffle), the stratified sample is a
    * broadcast-join hash filter (no shuffle), and only the quota
    * window and final aggregation exchange data. */
  def d18CurationSample(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .withColumn("r", graft.functions.CatalystFunctions.repetitionStats(col("text")))
      .filter(col("r.n_words") >= 20 && col("r.dup_3gram_frac") <= 0.1)
      .select(col("doc_id"), col("lang"), col("source"),
        col("r.n_words").as("n_words"))
    val sampled = graft.ops.Sampling.stratified(base, "doc_id", "lang",
      Map("en" -> 0.8, "de" -> 0.5), defaultRate = 0.3)
    val capped = graft.ops.Sampling.groupQuota(sampled, "doc_id", "source", 10)
    capped.groupBy("source")
      .agg(count(lit(1)).as("n_docs"), round(avg("n_words"), 4).as("avg_words"))
      .orderBy("source")
  }

  /** BM25 ranked retrieval (graft.ops.Relevance.bm25) over the corpus
    * for a fixed 3-term query mixing common terms ("join", "hash" —
    * low idf, tf/length-normalization decides) with a rare one ("dup"
    * — high idf dominates wherever it appears). Top-20 by (rounded
    * score desc, doc_id); every float derives from integer counts in
    * a fixed parenthesization, so the oracle reproduces scores
    * bit-for-bit. */
  def d41Bm25(s: SparkSession, dir: String): DataFrame =
    graft.ops.Relevance.bm25(docs(s, dir), "doc_id", "text",
      Seq("join", "hash", "dup"))

  /** Incremental BM25 proven end-to-end by ORACLE (r16): build the
    * persisted index over 3/4 of the corpus, fold the rest in as TWO
    * `Relevance.appendToIndex` shards, query through the sharded
    * layout. The oracle is d41's FULL-corpus SQL verbatim, because
    * incremental BM25 here is EXACT, not stale-idf approximate: N and
    * total length are integer sums maintained in the stats commit, and
    * per-term df counts over the unioned live postings at query time —
    * a query against the appended index IS the query against a batch
    * rebuild over the union. Fresh temp dir per call (the e15 rule:
    * appends must not accumulate across bench/verify reps). */
  def d60Bm25Delta(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val path = java.nio.file.Files.createTempDirectory("graft-d60")
      .toString + "/idx"
    graft.ops.Relevance.buildIndex(d.filter(col("doc_id") % 4 =!= 0),
      "doc_id", "text", path)
    graft.ops.Relevance.appendToIndex(d.filter(col("doc_id") % 8 === 0),
      "doc_id", "text", path, tag = "delta-a")
    graft.ops.Relevance.appendToIndex(d.filter(col("doc_id") % 8 === 4),
      "doc_id", "text", path, tag = "delta-b")
    graft.ops.Relevance.queryIndex(s, path, Seq("join", "hash", "dup"))
  }

  /** Index-backed BM25 (graft.ops.Relevance.buildIndex/queryIndex —
    * the build-once/query-many production retrieval shape): postings
    * persist word-partitioned parquet, the query's pushed `isin` reads
    * only matching row groups, and scores are bit-identical to d41's
    * direct scan (shared scorePlan, shared oracle). The gate rebuilds
    * the index each call (sequential gates, bounded corpus); real
    * deployments build once. */
  def d53Bm25Index(s: SparkSession, dir: String): DataFrame = {
    val path = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"graft-d53-${System.getProperty("user.name", "u")}-" +
        dir.replaceAll("[^A-Za-z0-9.-]", "_")).getPath
    graft.ops.Relevance.buildIndex(docs(s, dir), "doc_id", "text", path)
    graft.ops.Relevance.queryIndex(s, path, Seq("join", "hash", "dup"))
  }

  /** CCNet perplexity bucketing (graft.ops.LangModel
    * .perplexityBuckets): d27's bigram-LM scores split per language
    * into equal head/middle/tail thirds by ntile over (rounded score,
    * doc_id) — integer rank logic end to end, so the oracle reproduces
    * every bucket assignment, not just the split sizes. Docs with < 2
    * words have no score and drop (gate those on length, not
    * perplexity — scoreNll's contract). */
  def d42CcnetBuckets(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val (bg, cx, v) = graft.ops.LangModel.trainBigram(
      d.filter(col("doc_id") < 250))
    val scored = graft.ops.LangModel.scoreNll(d, bg, cx, v)
      .select(col("id").as("doc_id"), round(col("avg_nll"), 4).as("ppl"))
      .join(d.select(col("doc_id"), col("lang")), "doc_id")
    graft.ops.LangModel.perplexityBuckets(scored, "lang", "ppl", "doc_id")
      .select(col("doc_id"), col("lang"), col("ppl"), col("bucket"))
      .orderBy("doc_id")
  }

  /** Temperature-scaled (α = 0.5) mixture sampling — the mT5/XLM-R
    * α-sampling pattern over graft.ops.Sampling.temperatureRates +
    * applyRates: per-language weights w ∝ √tokens (sqrt is IEEE
    * correctly-rounded, so unlike general pow the weights are
    * bit-identical cross-engine), normalized in sorted-language order,
    * fed through the no-upsampling rate algebra, applied as the 60-bit
    * hash Bernoulli. The gate reports each language's planned rate AND
    * its kept docs/tokens — plan and kept SET both oracle-proven. */
  def d43TemperatureMix(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).withColumn("n_words",
      size(TextFunctions.words(col("text"))))
    val rates = graft.ops.Sampling.temperatureRates(
      d, "lang", col("n_words"), alpha = 0.5)
    graft.ops.Sampling.applyRates(d, "doc_id", "lang", rates)
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"), sum("n_words").as("n_tokens"))
      .join(rates.select(col("lang"), round(col("rate"), 6).as("rate")), "lang")
      .select(col("lang"), col("rate"), col("n_docs"), col("n_tokens"))
      .orderBy("lang")
  }

  /** Gopher/MassiveText document-shape rule battery
    * (graft.ops.GopherRules, Rae 2021 A1.1): the seven word/line-shape
    * rules as one map-side codegen pass — every feature is a quotient
    * of exact small integers from split/regexp builtins in the
    * java.regex ∩ RE2 intersection, so the oracle reproduces each
    * ratio AND each boolean bit-for-bit. Composes with d15
    * (repetition) for the paper's full filter. The stop list is the
    * corpus-appropriate {the, a} (the synthetic vocabulary carries no
    * other English function word — the paper's 8-word default would
    * grade rule 7 as constant-false; the library default stays the
    * paper's list). */
  def d44GopherRules(s: SparkSession, dir: String): DataFrame =
    graft.ops.GopherRules.flags(docs(s, dir), stops = Seq("the", "a"))
      .select(col("doc_id"), col("n_words"),
        round(col("mean_word_len"), 4).as("mean_word_len"),
        round(col("hash_ratio"), 4).as("hash_ratio"),
        round(col("ellipsis_ratio"), 4).as("ellipsis_ratio"),
        round(col("bullet_frac"), 4).as("bullet_frac"),
        round(col("ellipsis_line_frac"), 4).as("ellipsis_line_frac"),
        round(col("alpha_frac"), 4).as("alpha_frac"),
        col("n_stop_hits"), col("r_word_count"), col("r_mean_word_len"),
        col("r_symbol_ratio"), col("r_bullet_lines"),
        col("r_ellipsis_lines"), col("r_alpha_words"), col("r_stop_words"),
        col("keep"))
      .orderBy("doc_id")

  /** UniMax epoch-capped budget allocation (graft.ops.Sampling
    * .unimaxPlan, Chung 2023): water-filling the budget across sources
    * under a 2-epoch repeat cap. Budget = 90% of two corpus passes
    * (9·total div 5 — integer division, scale-invariant), which puts
    * the smallest sources AT their cap and the rest at the uniform λ
    * level, so the gate exercises both branches of the closed form.
    * Everything is exact int64 until the single λ division — the
    * oracle reproduces every allocation bit-for-bit. */
  def d45Unimax(s: SparkSession, dir: String): DataFrame = {
    val totalsLazy = docs(s, dir).groupBy("source")
      .agg(sum(size(TextFunctions.words(col("text"))).cast("long"))
        .as("n_tokens"))
    val rows = totalsLazy.collect() // ≤ |sources| rows, evaluated once
    val totals = s.createDataFrame(
      java.util.Arrays.asList(rows: _*), totalsLazy.schema)
    val budget =
      9L * rows.map(r => if (r.isNullAt(1)) 0L else r.getLong(1)).sum / 5L
    graft.ops.Sampling.unimaxPlan(totals, "source", budget, maxEpochs = 2)
      .select(col("source"), col("n_tokens"), col("cap"),
        round(col("alloc"), 4).as("alloc"),
        round(col("epochs"), 4).as("epochs"), col("full_epochs"),
        round(col("last_rate"), 4).as("last_rate"))
      .orderBy("source")
  }

  /** C4 page cleaning (graft.ops.C4Rules, Raffel 2020 §2.2): the
    * line-level terminal-punctuation / ≥5-word filter with the
    * lorem-ipsum / brace / ≥3-sentence page gates. The corpus text is
    * single-line and unpunctuated, so the gate injects a deterministic
    * page around each doc (the d32 fixture pattern): a kept long
    * sentence, a dropped short line, a kept 5-word sentence, a dropped
    * 4-word question, plus per-residue lorem / brace / third-sentence
    * lines so every rule fires both ways. clean_text is compared via
    * md5 — reconstruction must be byte-identical, not just counted. */
  def d46C4Rules(s: SparkSession, dir: String): DataFrame = {
    val inj = docs(s, dir).select(col("doc_id"), concat(
      col("text"), lit("."),
      lit("\nshort line here"),
      lit("\nit has exactly five words."),
      lit("\nfour word question line?"),
      when(col("doc_id") % 7 === 0,
        lit("\nand one more closing sentence appears here.")).otherwise(lit("")),
      when(col("doc_id") % 11 === 0,
        lit("\nLorem Ipsum dolor sit amet.")).otherwise(lit("")),
      when(col("doc_id") % 13 === 0,
        lit("\nvar x = { 1 };")).otherwise(lit(""))).as("text"))
    graft.ops.C4Rules.flags(inj)
      .select(col("doc_id"), col("n_lines"), col("n_kept_lines"),
        md5(col("clean_text").cast("binary")).as("clean_md5"),
        col("n_sentences"), col("has_lorem"), col("has_brace"), col("keep"))
      .orderBy("doc_id")
  }

  /** Markdown → text extraction (TextFunctions.stripMarkdown — the
    * README/docs-corpus twin of d32's HTML path): fences drop with
    * contents, links/images keep their text, headers/quotes/bullets/
    * rules strip, asterisk emphasis unwraps. Injected fixture wraps
    * each doc in a full markdown page (the d32 pattern); every regex
    * is in the java.regex ∩ RE2 intersection so the oracle replays
    * the chain verbatim (Spark `$1` = DuckDB `\1` is the one
    * replacement-syntax difference; RE2 has no backreferences, hence
    * one pass per fence delimiter). */
  def d47MarkdownExtract(s: SparkSession, dir: String): DataFrame = {
    val inj = docs(s, dir).select(col("doc_id"), concat(
      lit("# Title "), col("doc_id"),
      lit("\n**Bold** and *em* text with `code span` here.\n"),
      lit("> quoted wisdom line\n- item one\n2. item two\n"),
      lit("[link text](https://example.com/"), col("doc_id"),
      lit(") and ![alt text](img.png)\n```\nvar code = "), col("doc_id"),
      lit(";\n```\n---\n"), col("text")).as("md"))
    // length + md5, not the full text (the d32 artifact convention —
    // same proof, no corpus-sized verify dumps; review r12)
    inj.select(col("doc_id"),
        length(TextFunctions.stripMarkdown(col("md"))).as("n_chars"),
        md5(TextFunctions.stripMarkdown(col("md")).cast("binary")).as("clean_md5"))
      .orderBy("doc_id")
  }

  /** Composed modern-curation pipeline over the round-12 operators
    * (the d10/d18 composition story with the NEW stages): markdown →
    * text (d47's chain), Gopher document-shape gate (d44's rules via
    * GopherRules.keep — one fused filter), then per-language survivor
    * stats. The whole chain is ONE Catalyst plan: every stage is
    * map-side (regexp chain + rule arithmetic fuse into the scan
    * projection), and the only shuffle is the final partial-aggregated
    * (lang, stats) groupBy. The fixture re-wraps each doc in the d47
    * markdown page, so the strip stage has real work to undo.
    *
    * The stripped text PERSISTS between the strip and rule stages
    * (the NOTES double-reference law: the rule battery references the
    * text many times and predicate pushdown inlines the 12-pass
    * regexp chain into a filter — un-cached AND filter-gated the gate
    * read 3.85 s at sf0.1 / 24 s at sf1; persisted, with the verdict
    * as an aggregation-side column instead of a filter, 1.48 s /
    * 10.5 s, of which the strip chain itself is ~9 s at sf1 — the
    * floor is honest regexp CPU, linear and map-side). */
  def d48CurationPipeline(s: SparkSession, dir: String): DataFrame = {
    val inj = docs(s, dir).select(col("doc_id"), col("lang"), concat(
      lit("# Title "), col("doc_id"),
      lit("\n**Bold** and *em* text with `code span` here.\n"),
      lit("[link text](https://example.com/"), col("doc_id"),
      lit(")\n```\nvar code = "), col("doc_id"),
      lit(";\n```\n"), col("text")).as("md"))
    val text = d48Persist(inj.select(col("doc_id"), col("lang"),
      TextFunctions.stripMarkdown(col("md")).as("text")))
    // rule verdict via flags() (struct materialized in its own
    // projection — the GopherRules CSE contract), gated at the
    // aggregation rather than a filter so nothing re-inlines the
    // battery under a pushed-down predicate
    graft.ops.GopherRules.flags(text, minWords = 40,
        stops = Seq("the", "a"), carry = Seq("lang"))
      .groupBy("lang")
      .agg(count(when(col("keep"), 1)).as("n_docs"),
        round(avg(when(col("keep"), col("n_alnum_words"))), 4).as("avg_words"))
      .filter(col("n_docs") > 0)
      .orderBy("lang")
  }

  /** The d49 gate vocabulary: dyadic-style INTEGER piece costs
    * (cost = −logp), the ONE copy both engines derive from — the gate
    * model maps each cost to logp = −cost and the oracle renders the
    * same pairs as its VALUES table. Integer costs make every Viterbi
    * path score an exact int64, so min-cost comparisons are
    * engine-exact (the d28 exact-rational recipe in tokenizer form).
    * Singles cover the whole [a-z0-9] words() alphabet at cost 8, so
    * the <unk> fallback never fires and every word segments. */
  private val d49MultiCosts: Seq[(String, Int)] = Seq(
    "th" -> 11, "he" -> 12, "in" -> 11, "er" -> 12, "an" -> 12,
    "on" -> 12, "re" -> 13, "ed" -> 13, "nd" -> 13, "at" -> 13,
    "or" -> 13, "es" -> 13, "ing" -> 16, "ion" -> 17, "ent" -> 17,
    "ter" -> 17)
  private val d49Singles: Seq[String] =
    (('a' to 'z') ++ ('0' to '9')).map(String.valueOf)
  private lazy val d49Model: graft.ops.UnigramModel = {
    val pairs = d49Singles.map(_ -> 8) ++ d49MultiCosts
    graft.ops.UnigramModel(pairs.map(_._1).toVector,
      pairs.map(p => -p._2.toDouble).toVector, unkLogp = -64.0)
  }

  /** Unigram-LM Viterbi encode (graft.ops.Unigram, Kudo 2018 — the
    * SentencePiece algorithm) under the fixed dyadic-cost vocabulary
    * above. Output per doc: word count, total Viterbi piece count and
    * total path cost — both tie-INVARIANT aggregates (min cost is
    * unique by definition; min pieces among min-cost paths is unique
    * as a number), so the oracle needs no tie-break mirroring: it
    * ENUMERATES every segmentation of every distinct word with a
    * recursive CTE and takes the same (min cost, min pieces) pair.
    * The token sequences themselves are pinned by OpsSpec's
    * hand-computed segmentations. One map-side codegen pass + the
    * d04 two-projection struct pattern. */
  def d49UnigramEncode(s: SparkSession, dir: String): DataFrame = {
    val ws = docs(s, dir).select(col("doc_id"),
      TextFunctions.words(col("text")).as("ws"))
    ws.select(col("doc_id"), size(col("ws")).as("n_words"),
        graft.ops.Unigram.encodeCol(col("ws"), d49Model).as("u"))
      .select(col("doc_id"), col("n_words"),
        col("u.n_pieces").as("n_pieces"),
        (-col("u.score")).cast("long").as("total_cost"))
      .orderBy("doc_id")
  }

  /** Unigram n-best costs (graft.ops.Unigram.nbestCol — the
    * tie-invariant skeleton of subword-regularization sampling, Kudo
    * 2018 §3): per doc, the summed BEST and SECOND-best DISTINCT
    * segmentation costs under the d49 vocabulary, plus the count of
    * single-segmentation words. Cost ranks are unique numbers, so the
    * d49 enumeration oracle extends to rank 2 with one window
    * function; the actual sampled paths are spec territory
    * (OpsSpec: kbest ranking, softmax draw determinism). */
  def d51UnigramNbest(s: SparkSession, dir: String): DataFrame = {
    val ws = docs(s, dir).select(col("doc_id"),
      TextFunctions.words(col("text")).as("ws"))
    ws.select(col("doc_id"), size(col("ws")).as("n_words"),
        graft.ops.Unigram.nbestCol(col("ws"), d49Model).as("u"))
      .select(col("doc_id"), col("n_words"),
        col("u.total_best").cast("long").as("total_best"),
        col("u.total_second").cast("long").as("total_second"),
        col("u.n_single").as("n_single"))
      .orderBy("doc_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "d49_unigram_encode" -> d49UnigramEncode _,
    "d50_warc_extract" -> d50WarcExtract _,
    "d51_unigram_nbest" -> d51UnigramNbest _,
    "d52_warc_tokenize" -> d52WarcTokenize _,
    "d53_bm25_index" -> d53Bm25Index _,
    "d60_bm25_delta" -> d60Bm25Delta _,
    "d54_dedup_keep_best" -> d54DedupKeepBest _,
    "d55_lsh_delta_dedup" -> d55LshDeltaDedup _,
    "d56_langid_score" -> d56LangIdScore _,
    "d57_simhash_delta" -> d57SimhashDelta _,
    "d58_vocab_sketch" -> d58VocabSketch _,
    "d44_gopher_rules" -> d44GopherRules _,
    "d45_unimax" -> d45Unimax _,
    "d46_c4_rules" -> d46C4Rules _,
    "d47_markdown_extract" -> d47MarkdownExtract _,
    "d48_curation_pipeline" -> d48CurationPipeline _,
    "d41_bm25" -> d41Bm25 _,
    "d42_ccnet_buckets" -> d42CcnetBuckets _,
    "d43_temperature_mix" -> d43TemperatureMix _,
    "d10_pipeline_compose" -> d10PipelineCompose _,
    "d01_dedup_exact" -> d01DedupExact _,
    "d02_fingerprint" -> d02Fingerprint _,
    "d03_token_count" -> d03TokenCount _,
    "d04_quality" -> d04Quality _,
    "d05_langid" -> d05LangId _,
    "d06_minhash_lsh" -> d06MinhashLsh _,
    "d07_ngram_jaccard" -> d07NgramJaccard _,
    "d08_simhash_pairs" -> d08SimhashPairs _,
    "d09_json_extract" -> d09JsonExtract _,
    "d11_simhash_verify" -> d11SimhashVerify _,
    "d12_simhash_pairs_verify" -> d12SimhashPairsVerify _,
    "d13_winnow_fingerprint" -> d13WinnowFingerprint _,
    "d14_winnow_overlap" -> d14WinnowOverlap _,
    "d15_repetition" -> d15Repetition _,
    "d16_group_quota" -> d16GroupQuota _,
    "d17_stratified_sample" -> d17StratifiedSample _,
    "d18_curation_sample" -> d18CurationSample _,
    "d19_dedup_clusters" -> d19DedupClusters _,
    "d20_decontaminate" -> d20Decontaminate _,
    "d21_line_dedup" -> d21LineDedup _,
    "d22_pii_redact" -> d22PiiRedact _,
    "d23_bloom_decontaminate" -> d23BloomDecontaminate _,
    "d24_corpus_stats" -> d24CorpusStats _,
    "d25_url_filter" -> d25UrlFilter _,
    "d26_vocab_topk" -> d26VocabTopk _,
    "d27_perplexity" -> d27Perplexity _,
    "d28_perplexity_trigram" -> d28PerplexityTrigram _,
    "d29_substring_spans" -> d29SubstringSpans _,
    "d30_dsir_scores" -> d30DsirScores _,
    "d31_remove_spans" -> d31RemoveSpans _,
    "d32_html_extract" -> d32HtmlExtract _,
    "d33_bpe_encode" -> d33BpeEncode _,
    "d62_bpe_bytes" -> d62BpeBytes _,
    "d63_pairs_fold" -> d63PairsFold _,
    "d59_wordpiece" -> d59Wordpiece _,
    "d61_wordpiece_bytes" -> d61WordpieceBytes _,
    "d34_quality_score" -> d34QualityScore _,
    "d35_cluster_sample" -> d35ClusterSample _,
    "d36_fix_encoding" -> d36FixEncoding _,
    "d37_mixture_sample" -> d37MixtureSample _,
    "d38_mixture_epochs" -> d38MixtureEpochs _,
    "d39_url_dedup" -> d39UrlDedup _,
    "d40_epoch_shuffle" -> d40EpochShuffle _,
    "p01_pack_chunks" -> p01PackChunks _,
    "p02_pack_greedy" -> p02PackGreedy _,
    "p03_chunk_overlap" -> p03ChunkOverlap _,
    "p04_tokenize_pack" -> p04TokenizePack _,
    "q24_range_join" -> q24RangeJoin _,
    "q20_asof_join" -> q20AsofJoin _,
    "q21_sessionize" -> q21Sessionize _,
    "q22_window_agg" -> q22WindowAgg _,
    "q23_asof_forward" -> q23AsofForward _,
    "m01_multimodal" -> m01Multimodal _,
    "m02_mime_sniff" -> m02MimeSniff _,
    "m03_byte_simhash" -> m03ByteSimhash _,
    "e01_knn_brute" -> e01KnnBrute _,
    "e02_knn_ivf" -> e02KnnIvf _,
    "e03_cosine_near_dup" -> e03CosineNearDup _,
    "e04_pq_codes" -> e04PqCodes _,
    "e05_knn_ivfpq" -> e05KnnIvfPq _,
    "e06_knn_ivfpq_verify" -> e06KnnIvfPqVerify _,
    "e07_semantic_dedup" -> e07SemanticDedup _,
    "e08_pq_rotated" -> e08PqRotated _,
    "e09_pq_opq" -> e09PqOpq _,
    "e10_knn_opq_ivfpq" -> e10KnnOpqIvfPq _,
    "e11_sq_codes" -> e11SqCodes _,
    "e12_knn_sq8" -> e12KnnSq8 _,
    "e13_knn_ivfsq_verify" -> e13KnnIvfSqVerify _,
    "e14_knn_matryoshka" -> e14KnnMatryoshka _,
    "e15_knn_ivfsq_sharded" -> e15KnnIvfSqSharded _,
    "e16_drift_stats" -> e16DriftStats _,
    "e18_knn_ivfsq_compacted" -> e18KnnIvfSqCompacted _,
    "e19_knn_ivfsq_rebuilt" -> e19KnnIvfSqRebuilt _,
    "e17_knn_opq_sharded" -> e17KnnOpqIvfPqSharded _,
    "e20_knn_bq" -> e20KnnBq _,
    "e21_knn_bq_sharded" -> e21KnnBqSharded _)

  /** The ONE copy of the md5-simhash signature CTEs (review r11: d08/
    * d11/d12/d19 carried four hand-synced copies — a change to the
    * word hash or voting rule edited identically in each, and a missed
    * one silently desynchronizes an oracle). Yields `s(doc_id, sig)`
    * with sig a 64-char bit string; must mirror
    * graft.functions.CatalystFunctions.simhashMd5 exactly. */
  private val simhashSigCtes =
    """w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
      |h AS (SELECT doc_id, list_transform(ws, w -> ('0x' || substr(md5(w), 1, 16))::UBIGINT) AS hs FROM w),
      |s AS (SELECT doc_id,
      | list_aggregate(list_transform(range(0, 64), b ->
      |   CASE WHEN 2 * len(list_filter(hs, x -> (x >> (63 - b)) & 1 = 1)) > len(hs)
      |        THEN '1' ELSE '0' END), 'string_agg', '') AS sig
      | FROM h)""".stripMargin

  /** Brute-force hamming pair scan at `radius` over [[simhashSigCtes]]
    * — the d08 (radius 2) / d12 (radius 3) oracle body; `pairWhere`
    * restricts to delta-touching pairs for d57 (the oracle stays the
    * full-union recompute). */
  private def simhashPairsOracle(radius: Int, pairWhere: String = "") =
    s"""WITH $simhashSigCtes
       |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       | CAST(len(list_filter(range(1, 65), i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) AS INTEGER) AS hamming
       |FROM s a JOIN s b ON a.doc_id < b.doc_id$pairWhere
       |WHERE len(list_filter(range(1, 65), i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) <= $radius
       |ORDER BY id_a, id_b""".stripMargin

  /** The exact all-pairs n-gram Jaccard oracle body (d06/d07), with an
    * optional PAIR-level restriction (d55: only delta-touching pairs —
    * the oracle stays the full-union recompute, proving the delta path
    * re-derives exactly what a one-shot run would). */
  private def jaccardOracle(where: String, pairWhere: String = "") =
    s"""WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents$where),
      |sh AS (SELECT doc_id,
      |  list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
      |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
      |  FROM w WHERE len(ws) >= 3)
      |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
      | round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |   / len(list_distinct(list_concat(a.s, b.s))), 4) AS jaccard
      |FROM sh a JOIN sh b ON a.doc_id < b.doc_id$pairWhere
      |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
      |   / len(list_distinct(list_concat(a.s, b.s))) >= 0.5
      |ORDER BY id_a, id_b""".stripMargin

  /** The d32 HTML-injection + strip chain as a reusable CTE prefix
    * ending in `fin(doc_id, t)` — composed by d32's oracle, d50's
    * (identical by the lossless-round-trip contract) and d52's (which
    * tokenizes `t`). */
  private val d32StripCtes: String =
    """inj AS (SELECT doc_id,
      |  '<html><head><title>D' || doc_id || '</title><style>p{c:1}</style></head><body><!-- note '
      |  || doc_id || ' --><h1 class="t">Doc &amp; &lt;' || doc_id || '&gt;</h1><p>' || text
      |  || '</p><script>var x = 1 < 2;</script><br/>&nbsp;tail</body></html>' AS html
      | FROM documents),
      |x1a AS (SELECT doc_id, regexp_replace(html,
      |  '(?is)<script\b[^>]*>.*?</script[ \t\n\x0B\f\r]*>', ' ', 'g') AS s FROM inj),
      |x1b AS (SELECT doc_id, regexp_replace(s,
      |  '(?is)<style\b[^>]*>.*?</style[ \t\n\x0B\f\r]*>', ' ', 'g') AS s FROM x1a),
      |x1 AS (SELECT doc_id, regexp_replace(s,
      |  '(?is)<head\b[^>]*>.*?</head[ \t\n\x0B\f\r]*>', ' ', 'g') AS s FROM x1b),
      |x2 AS (SELECT doc_id, regexp_replace(s, '(?s)<!--.*?-->', ' ', 'g') AS s FROM x1),
      |x3 AS (SELECT doc_id, regexp_replace(s, '(?s)</?[A-Za-z!][^>]*>', ' ', 'g') AS s FROM x2),
      |x4 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(s,
      |  '&nbsp;', ' '), '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''), '&amp;', '&') AS s FROM x3),
      |fin AS (SELECT doc_id, trim(regexp_replace(s, '[ \t\n\x0B\f\r]+', ' ', 'g')) AS t FROM x4)""".stripMargin

  /** d32's oracle — the HTML injection + strip chain replayed in SQL;
    * ALSO d50's oracle (the WARC round-trip must be byte-lossless, so
    * the two gates' outputs are identical by contract). */
  // NB: concatenated, NOT interpolated under stripMargin — the CTE
  // block's '|| doc_id' concat lines begin with whitespace + '|', which
  // a second stripMargin pass would mangle into bare '|' operators
  private val d32OracleSql: String =
    "WITH " + d32StripCtes + "\n" +
      """SELECT doc_id, CAST(length(t) AS INTEGER) AS n_chars, md5(t) AS text_md5
        |FROM fin ORDER BY doc_id""".stripMargin

  /** d19's simhash-pair connected-components CTE block ending in
    * `lab(doc_id, cluster_id)` — shared by d19's oracle and d54's
    * keep-best ranking on top of the same clusters. */
  private lazy val d19ClusterCtes: String =
    s"""$simhashSigCtes,
      |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
      | FROM s a JOIN s b ON a.doc_id < b.doc_id
      | WHERE len(list_filter(range(1, 65), i -> substr(a.sig, i, 1) <> substr(b.sig, i, 1))) <= 3),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION SELECT id_b, id_a FROM pairs),
      |reach(src, dst) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.src, e.v FROM reach r JOIN edges e ON e.u = r.dst),
      |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
      |        FROM reach GROUP BY src)""".stripMargin

  /** d41's oracle — Okapi BM25 with Lucene idf over three fixed terms;
    * ALSO d53's (an index-backed query must reproduce the direct
    * scan's scores bit-for-bit). */
  private val d41OracleSql: String =
    """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
      |st AS (SELECT count(*) AS n, CAST(sum(len(ws)) AS DOUBLE)/count(*) AS avgdl FROM w),
      |tok AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS word FROM w),
      |tf AS (SELECT doc_id, dl, word, count(*) AS tf FROM tok
      |  WHERE word IN ('join', 'hash', 'dup') GROUP BY 1, 2, 3),
      |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
      |c AS (SELECT doc_id, word,
      |  ln(1 + (n - df + 0.5)/(df + 0.5)) *
      |    (tf * (1.2 + 1)) / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl)) AS contrib
      | FROM tf JOIN df USING (word) CROSS JOIN st),
      |s AS (SELECT doc_id,
      |  sum(CASE WHEN word = 'join' THEN contrib END) AS c1,
      |  sum(CASE WHEN word = 'hash' THEN contrib END) AS c2,
      |  sum(CASE WHEN word = 'dup' THEN contrib END) AS c3
      | FROM c GROUP BY doc_id)
      |SELECT doc_id,
      |  round(coalesce(c1, 0) + coalesce(c2, 0) + coalesce(c3, 0), 4) AS score
      |FROM s ORDER BY score DESC, doc_id LIMIT 20""".stripMargin

  // e13's oracle with the TRAINED state (centroid seeds + SQ min/max)
  // restricted to the BUILD subset (id % 4 <> 0): appended rows (the
  // two delta shards) assign and encode under the FROZEN model —
  // including the 0/255 clamp on out-of-range residuals — exactly as
  // IvfSq.append does, so the whole sharded layout is hash-provable.
  // Shared by e15 (sharded read path) and e18 (the same layout after
  // IvfSq.compact — the merge must be bit-invariant).
  // e06's deterministic-IVF skeleton with the residual quantizer
  // swapped to SQ8: per-dim residual min/max (exact aggregates),
  // linear codes, inline decode, cell-dot + residual-dot score.
  // Shared by e13 (full-corpus deterministic build) and e19 (the same
  // corpus reached through build-3/4 + appends + REBUILD).
  private val e13OracleSql =
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nrm AS (SELECT id, v, list_sum(list_transform(v, x -> x * x)) AS ss FROM e),
        |u AS (SELECT id, CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(ss))) ELSE v END AS v FROM nrm),
        |cent AS (SELECT row_number() OVER (ORDER BY h, id) AS cell, cv FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, v AS cv FROM u ORDER BY h, id LIMIT 4)),
        |asg AS (SELECT id, v, cell, cv FROM
        |  (SELECT u.id, u.v, c.cell, c.cv,
        |     row_number() OVER (PARTITION BY u.id
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> u.v[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM u CROSS JOIN cent c) WHERE rk = 1),
        |resid AS (SELECT id, cell, list_transform(range(1, 65), i -> v[i] - cv[i]) AS r FROM asg),
        |dims AS (SELECT unnest(range(0, 64)) AS d),
        |stat AS (SELECT d, min(r[d + 1]) AS mn, max(r[d + 1]) AS mx
        |         FROM resid CROSS JOIN dims GROUP BY d),
        |st AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM stat),
        |enc AS (SELECT id, cell, list_transform(range(0, 64), d ->
        |   CASE WHEN mxs[d + 1] = mns[d + 1] THEN 0.0
        |        ELSE least(255.0, greatest(0.0,
        |          floor((r[d + 1] - mns[d + 1]) / (mxs[d + 1] - mns[d + 1]) * 255.0 + 0.5))) END)
        |  AS codes FROM resid CROSS JOIN st),
        |rec AS (SELECT id, cell, list_transform(range(0, 64), d ->
        |   mns[d + 1] + codes[d + 1] * ((mxs[d + 1] - mns[d + 1]) / 255.0)) AS recon
        |  FROM enc CROSS JOIN st),
        |qu AS (SELECT id AS qid, v AS qv FROM u WHERE id < 10),
        |qp AS (SELECT qid, cell, cscore FROM
        |  (SELECT q.qid, c.cell,
        |     list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) AS cscore,
        |     row_number() OVER (PARTITION BY q.qid
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM qu q CROSS JOIN cent c) WHERE rk <= 2),
        |cand AS (SELECT p.qid, t.id,
        |    p.cscore + list_sum(list_transform(range(1, 65), i -> q.qv[i] * t.recon[i])) AS score
        |  FROM qp p JOIN rec t ON t.cell = p.cell JOIN qu q ON q.qid = p.qid
        |  WHERE t.id <> p.qid),
        |short AS (SELECT qid, id FROM
        |  (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk FROM cand)
        |  WHERE rk <= 20),
        |rer AS (SELECT s.qid, s.id,
        |    list_sum(list_transform(range(1, 65), i -> cu.v[i] * q.qv[i])) AS sim
        |  FROM short s JOIN u cu ON cu.id = s.id JOIN qu q ON q.qid = s.qid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim FROM
        |  (SELECT qid, id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM rer)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  /** The BQ-funnel oracle (strict x > 0 sign bits, per-query hamming
    * shortlist of 32 with ties to the smaller id, e14's unit-dot
    * rerank): gate e20 (one-shot bqKnn) and gate e21 (the sharded
    * BqIndex lifecycle — exact appends make build+appends answer
    * bit-identically over the same corpus) both hash against it. */
  private val e20OracleSql =
      """WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
        |q AS (SELECT id AS qid, vec AS qvec FROM v WHERE id < 10),
        |sgn AS (SELECT id, list_transform(vec, x -> x > 0) AS sg FROM v),
        |sgq AS (SELECT qid, list_transform(qvec, x -> x > 0) AS sq FROM q),
        |h AS (SELECT qid, id,
        |  len(list_filter(range(1, len(sg) + 1), i -> sg[i] <> sq[i])) AS hamming
        |  FROM sgn CROSS JOIN sgq WHERE id <> qid),
        |short AS (SELECT qid, id FROM (SELECT qid, id,
        |  row_number() OVER (PARTITION BY qid ORDER BY hamming, id) AS rk FROM h)
        |  WHERE rk <= 32),
        |u AS (SELECT id, list_transform(vec,
        |    x -> x / sqrt(list_sum(list_transform(vec, y -> y * y)))) AS uv FROM v
        |  WHERE list_sum(list_transform(vec, y -> y * y)) > 0),
        |uq AS (SELECT qid, list_transform(qvec,
        |    x -> x / sqrt(list_sum(list_transform(qvec, y -> y * y)))) AS uqv FROM q
        |  WHERE list_sum(list_transform(qvec, y -> y * y)) > 0),
        |rr AS (SELECT s.qid, s.id,
        |  list_sum(list_transform(range(1, len(uv) + 1), i -> uv[i] * uqv[i])) AS sim
        |  FROM short s JOIN u ON s.id = u.id JOIN uq ON s.qid = uq.qid),
        |ranked AS (SELECT qid, id, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM rr)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  private val e15OracleSql =
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nrm AS (SELECT id, v, list_sum(list_transform(v, x -> x * x)) AS ss FROM e),
        |u AS (SELECT id, CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(ss))) ELSE v END AS v FROM nrm),
        |cent AS (SELECT row_number() OVER (ORDER BY h, id) AS cell, cv FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, v AS cv FROM u
        |   WHERE id % 4 <> 0 ORDER BY h, id LIMIT 4)),
        |asg AS (SELECT id, v, cell, cv FROM
        |  (SELECT u.id, u.v, c.cell, c.cv,
        |     row_number() OVER (PARTITION BY u.id
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> u.v[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM u CROSS JOIN cent c) WHERE rk = 1),
        |resid AS (SELECT id, cell, list_transform(range(1, 65), i -> v[i] - cv[i]) AS r FROM asg),
        |dims AS (SELECT unnest(range(0, 64)) AS d),
        |stat AS (SELECT d, min(r[d + 1]) AS mn, max(r[d + 1]) AS mx
        |         FROM resid CROSS JOIN dims WHERE id % 4 <> 0 GROUP BY d),
        |st AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM stat),
        |enc AS (SELECT id, cell, list_transform(range(0, 64), d ->
        |   CASE WHEN mxs[d + 1] = mns[d + 1] THEN 0.0
        |        ELSE least(255.0, greatest(0.0,
        |          floor((r[d + 1] - mns[d + 1]) / (mxs[d + 1] - mns[d + 1]) * 255.0 + 0.5))) END)
        |  AS codes FROM resid CROSS JOIN st),
        |rec AS (SELECT id, cell, list_transform(range(0, 64), d ->
        |   mns[d + 1] + codes[d + 1] * ((mxs[d + 1] - mns[d + 1]) / 255.0)) AS recon
        |  FROM enc CROSS JOIN st),
        |qu AS (SELECT id AS qid, v AS qv FROM u WHERE id < 10),
        |qp AS (SELECT qid, cell, cscore FROM
        |  (SELECT q.qid, c.cell,
        |     list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) AS cscore,
        |     row_number() OVER (PARTITION BY q.qid
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM qu q CROSS JOIN cent c) WHERE rk <= 2),
        |cand AS (SELECT p.qid, t.id,
        |    p.cscore + list_sum(list_transform(range(1, 65), i -> q.qv[i] * t.recon[i])) AS score
        |  FROM qp p JOIN rec t ON t.cell = p.cell JOIN qu q ON q.qid = p.qid
        |  WHERE t.id <> p.qid),
        |short AS (SELECT qid, id FROM
        |  (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk FROM cand)
        |  WHERE rk <= 20),
        |rer AS (SELECT s.qid, s.id,
        |    list_sum(list_transform(range(1, 65), i -> cu.v[i] * q.qv[i])) AS sim
        |  FROM short s JOIN u cu ON cu.id = s.id JOIN qu q ON q.qid = s.qid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim FROM
        |  (SELECT qid, id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM rer)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin

  val oracles: Map[String, String] = Map(
    // Unigram Viterbi via FULL-path enumeration: the recursive CTE
    // expands every segmentation of every distinct word over the same
    // (piece, cost) VALUES the Spark gate's model derives from
    // (d49MultiCosts/d49Singles — ONE vocabulary copy), then takes
    // min cost and min pieces-at-min-cost per word. UNION (distinct)
    // collapses equal (word, pos, cost, np) states, which bounds the
    // expansion; integer costs make every comparison exact. The LEFT
    // JOIN keeps wordless docs at (0, 0, 0) like the Spark side.
    "d49_unigram_encode" -> {
      val vocabRows = (d49Singles.map(s => s"('$s',8)") ++
        d49MultiCosts.map { case (p, c) => s"('$p',$c)" }).mkString(",")
      s"""WITH RECURSIVE wpos AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |dw AS (SELECT DISTINCT w FROM wpos),
        |vocab(piece, cost) AS (VALUES $vocabRows),
        |r AS (
        |  SELECT w, 0 AS pos, 0 AS cost, 0 AS np FROM dw
        |  UNION
        |  SELECT r.w, r.pos + length(v.piece), r.cost + v.cost, r.np + 1
        |  FROM r JOIN vocab v
        |    ON substr(r.w, r.pos + 1, length(v.piece)) = v.piece
        |  WHERE r.pos < length(r.w)),
        |fin AS (SELECT w, cost, np FROM r WHERE pos = length(w)),
        |best AS (SELECT w, min(cost) AS mc FROM fin GROUP BY w),
        |bw AS (SELECT f.w, b.mc AS cost, min(f.np) AS np
        |       FROM fin f JOIN best b ON f.w = b.w AND f.cost = b.mc
        |       GROUP BY f.w, b.mc),
        |agg AS (SELECT wp.doc_id, count(*) AS nw, sum(bw.np) AS np,
        |          sum(bw.cost) AS c
        |        FROM wpos wp JOIN bw ON wp.w = bw.w GROUP BY wp.doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.nw, 0) AS INTEGER) AS n_words,
        |  CAST(coalesce(agg.np, 0) AS INTEGER) AS n_pieces,
        |  CAST(coalesce(agg.c, 0) AS BIGINT) AS total_cost
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin
    },
    // d49's enumeration extended to rank 2: distinct costs per word,
    // row_number picks rank 1 and 2; a word with no rank-2 cost is a
    // single-segmentation word (n_single) and its second = best
    "d51_unigram_nbest" -> {
      val vocabRows = (d49Singles.map(s => s"('$s',8)") ++
        d49MultiCosts.map { case (p, c) => s"('$p',$c)" }).mkString(",")
      s"""WITH RECURSIVE wpos AS (
        |  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
        |  FROM documents),
        |dw AS (SELECT DISTINCT w FROM wpos),
        |vocab(piece, cost) AS (VALUES $vocabRows),
        |r AS (
        |  SELECT w, 0 AS pos, 0 AS cost, 0 AS np FROM dw
        |  UNION
        |  SELECT r.w, r.pos + length(v.piece), r.cost + v.cost, r.np + 1
        |  FROM r JOIN vocab v
        |    ON substr(r.w, r.pos + 1, length(v.piece)) = v.piece
        |  WHERE r.pos < length(r.w)),
        |dcost AS (SELECT DISTINCT w, cost FROM r WHERE pos = length(w)),
        |ranked AS (SELECT w, cost,
        |  row_number() OVER (PARTITION BY w ORDER BY cost) AS rk FROM dcost),
        |bw AS (SELECT w, min(CASE WHEN rk = 1 THEN cost END) AS c1,
        |         min(CASE WHEN rk = 2 THEN cost END) AS c2
        |       FROM ranked GROUP BY w),
        |agg AS (SELECT wp.doc_id, count(*) AS nw,
        |          sum(bw.c1) AS tb, sum(coalesce(bw.c2, bw.c1)) AS ts,
        |          sum(CASE WHEN bw.c2 IS NULL THEN 1 ELSE 0 END) AS ns
        |        FROM wpos wp JOIN bw ON wp.w = bw.w GROUP BY wp.doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.nw, 0) AS INTEGER) AS n_words,
        |  CAST(coalesce(agg.tb, 0) AS BIGINT) AS total_best,
        |  CAST(coalesce(agg.ts, 0) AS BIGINT) AS total_second,
        |  CAST(coalesce(agg.ns, 0) AS INTEGER) AS n_single
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin
    },
    // the full container→tokens chain: d32's strip CTEs feed d49's
    // enumeration machinery (renamed vfin — the strip chain owns
    // 'fin'), aggregated per language; docs with NO words still count
    // toward n_docs via the LEFT JOIN
    "d52_warc_tokenize" -> {
      val vocabRows = (d49Singles.map(s => s"('$s',8)") ++
        d49MultiCosts.map { case (p, c) => s"('$p',$c)" }).mkString(",")
      // prefix concatenated, not re-stripMargin'd (see d32OracleSql)
      "WITH RECURSIVE " + d32StripCtes + ",\n" + s"""wpos AS (SELECT doc_id, unnest(regexp_extract_all(lower(t), '[a-z0-9]+')) AS w FROM fin),
        |dw AS (SELECT DISTINCT w FROM wpos),
        |vocab(piece, cost) AS (VALUES $vocabRows),
        |r AS (
        |  SELECT w, 0 AS pos, 0 AS cost, 0 AS np FROM dw
        |  UNION
        |  SELECT r.w, r.pos + length(v.piece), r.cost + v.cost, r.np + 1
        |  FROM r JOIN vocab v
        |    ON substr(r.w, r.pos + 1, length(v.piece)) = v.piece
        |  WHERE r.pos < length(r.w)),
        |vfin AS (SELECT w, cost, np FROM r WHERE pos = length(w)),
        |best AS (SELECT w, min(cost) AS mc FROM vfin GROUP BY w),
        |bw AS (SELECT f.w, b.mc AS cost, min(f.np) AS np
        |       FROM vfin f JOIN best b ON f.w = b.w AND f.cost = b.mc
        |       GROUP BY f.w, b.mc),
        |agg AS (SELECT wp.doc_id, count(*) AS nw, sum(bw.np) AS np,
        |          sum(bw.cost) AS c
        |        FROM wpos wp JOIN bw ON wp.w = bw.w GROUP BY wp.doc_id)
        |SELECT d.lang, CAST(count(*) AS INTEGER) AS n_docs,
        |  CAST(sum(coalesce(agg.nw, 0)) AS BIGINT) AS n_words,
        |  CAST(sum(coalesce(agg.np, 0)) AS BIGINT) AS n_pieces,
        |  CAST(sum(coalesce(agg.c, 0)) AS BIGINT) AS total_cost
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |GROUP BY d.lang ORDER BY d.lang""".stripMargin
    },
    "d01_dedup_exact" ->
      """SELECT min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY text ORDER BY keep_id""".stripMargin,
    "d02_fingerprint" ->
      """SELECT doc_id,
        | md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d03_token_count" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INTEGER) AS n_words,
        | CAST(len(regexp_extract_all(text, '[a-zA-Z0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]')) AS INTEGER) AS n_bpe_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "d04_quality" ->
      """WITH f AS (SELECT doc_id, length(text) AS n_chars,
        |  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws,
        |  length(regexp_replace(text, '[a-zA-Z0-9 \t\n\x0B\f\r]', '', 'g')) AS punct
        |  FROM documents)
        |SELECT doc_id, CAST(n_chars AS INTEGER) AS n_chars,
        | CAST(len(ws) AS INTEGER) AS n_words,
        | round(CASE WHEN len(ws) > 0 THEN CAST(list_sum(list_transform(ws, w -> length(w))) AS DOUBLE) / len(ws) ELSE 0.0 END, 4) AS avg_word_len,
        | round(CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is','it','for','on'], w))) AS DOUBLE) / len(ws) ELSE 0.0 END, 4) AS stopword_ratio,
        | round(CASE WHEN n_chars > 0 THEN CAST(punct AS DOUBLE) / n_chars ELSE 0.0 END, 4) AS punct_ratio
        |FROM f ORDER BY doc_id""".stripMargin,
    "d05_langid" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |s AS (SELECT doc_id,
        |  len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))) AS s_en,
        |  len(list_filter(ws, x -> list_contains(['der','die','und','das','ein','nicht'], x))) AS s_de,
        |  len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une'], x))) AS s_fr,
        |  len(list_filter(ws, x -> list_contains(['el','los','las','y','una','que'], x))) AS s_es
        |  FROM w)
        |SELECT doc_id, CASE
        |  WHEN s_en > 0 AND s_en >= greatest(s_en, s_de, s_fr, s_es) THEN 'en'
        |  WHEN s_de > 0 AND s_de >= greatest(s_en, s_de, s_fr, s_es) THEN 'de'
        |  WHEN s_fr > 0 AND s_fr >= greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
        |  WHEN s_es > 0 AND s_es >= greatest(s_en, s_de, s_fr, s_es) THEN 'es'
        |  ELSE 'und' END AS lang_pred
        |FROM s ORDER BY doc_id""".stripMargin,
    "d06_minhash_lsh" -> jaccardOracle(""),
    // same full-corpus recompute, restricted to pairs touching the
    // doc_id%5=0 delta shard (either side: a corpus-delta pair has the
    // delta member on EITHER side of the a<b orientation)
    "d55_lsh_delta_dedup" ->
      jaccardOracle("", " AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)"),
    "d07_ngram_jaccard" -> jaccardOracle(" WHERE doc_id < 500"),
    // brute-force hamming scan at radius 2 (the d08 gate's md5 simhash
    // path, VERDICT r10 #1: the r10 gate switch forgot this entry,
    // leaving d08 graded no_oracle).
    "d08_simhash_pairs" -> simhashPairsOracle(2),
    "d09_json_extract" ->
      // NULLS FIRST pins DuckDB to Spark's ascending default in case a
      // props value ever lacks an integer k (today's generator always
      // emits one, but a null group must not land at opposite ends)
      """SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k NULLS FIRST""".stripMargin,
    "d11_simhash_verify" ->
      s"""WITH $simhashSigCtes
         |SELECT doc_id, sig FROM s ORDER BY doc_id""".stripMargin,
    "d12_simhash_pairs_verify" -> simhashPairsOracle(3),
    // d12's full-union brute-force scan restricted to pairs touching
    // the doc_id%5=0 delta shard (the d55 restriction pattern)
    "d57_simhash_delta" -> simhashPairsOracle(3,
      " AND (a.doc_id % 5 = 0 OR b.doc_id % 5 = 0)"),
    // the CMS rebuilt in SQL: per depth-row r, the row index is
    // floorMod(int32(md5-word r), width) with java's signed-int32
    // wrap replayed via the +/- 2^32 CASE; counters sum true counts,
    // estimates are min over rows, top-k by (est desc, word)
    "d58_vocab_sketch" ->
      """WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word FROM documents),
        |c AS (SELECT word, count(*) AS n FROM w GROUP BY word),
        |rws AS (SELECT word, n, r,
        |   CAST(('0x' || substr(md5(word), r * 8 + 1, 8))::UBIGINT AS BIGINT) AS v
        | FROM c, range(0, 4) t(r)),
        |ix AS (SELECT word, n, r,
        |   ((CASE WHEN v >= 2147483648 THEN v - 4294967296 ELSE v END % 16384) + 16384) % 16384 AS idx
        | FROM rws),
        |counters AS (SELECT r, idx, sum(n) AS cnt FROM ix GROUP BY r, idx),
        |est AS (SELECT i.word, min(co.cnt) AS n_est
        | FROM ix i JOIN counters co ON i.r = co.r AND i.idx = co.idx
        | GROUP BY i.word)
        |SELECT word, CAST(n_est AS BIGINT) AS n_est FROM est
        |ORDER BY n_est DESC, word LIMIT 100""".stripMargin,
    "d13_winnow_fingerprint" ->
      """WITH t AS (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s FROM documents),
        |kg AS (SELECT doc_id, list_transform(range(1, len(s) - 8 + 2), i ->
        |   list_reduce(list_transform(range(0, 8), j -> unicode(substr(s, i + j, 1))),
        |               (a, b) -> (a * 31 + b) % 1048576)) AS hs
        | FROM t WHERE len(s) >= 8),
        |win AS (SELECT doc_id, list_sort(list_distinct(list_transform(range(1, len(hs) - 8 + 2), i ->
        |   list_aggregate(hs[i:i+7], 'min')))) AS fps
        | FROM kg WHERE len(hs) >= 8)
        |SELECT doc_id, CAST(unnest(fps) AS BIGINT) AS fp FROM win ORDER BY doc_id, fp""".stripMargin,
    "d14_winnow_overlap" ->
      """WITH t AS (SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS s FROM documents),
        |kg AS (SELECT doc_id, list_transform(range(1, len(s) - 8 + 2), i ->
        |   list_reduce(list_transform(range(0, 8), j -> unicode(substr(s, i + j, 1))),
        |               (a, b) -> (a * 31 + b) % 1048576)) AS hs
        | FROM t WHERE len(s) >= 8),
        |win AS (SELECT doc_id, list_distinct(list_transform(range(1, len(hs) - 8 + 2), i ->
        |   list_aggregate(hs[i:i+7], 'min'))) AS fps
        | FROM kg WHERE len(hs) >= 8),
        |inv0 AS (SELECT doc_id, unnest(fps) AS fp FROM win),
        |freq AS (SELECT fp, count(*) AS df FROM inv0 GROUP BY fp),
        |inv AS (SELECT i.doc_id, i.fp FROM inv0 i JOIN freq USING (fp)
        |        WHERE freq.df <= 20),
        |sz AS (SELECT doc_id, count(*) AS n_fp FROM inv GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        | round(CAST(count(*) AS DOUBLE) / least(min(sa.n_fp), min(sb.n_fp)), 4) AS containment
        |FROM inv a JOIN inv b ON a.fp = b.fp AND a.doc_id < b.doc_id
        |JOIN sz sa ON sa.doc_id = a.doc_id
        |JOIN sz sb ON sb.doc_id = b.doc_id
        |GROUP BY a.doc_id, b.doc_id
        |HAVING round(CAST(count(*) AS DOUBLE) / least(min(sa.n_fp), min(sb.n_fp)), 4) >= 0.3
        |ORDER BY id_a, id_b""".stripMargin,
    "d15_repetition" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |g AS (SELECT doc_id, ws,
        |  list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1]) AS g2,
        |  list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        | FROM t)
        |SELECT doc_id,
        | CAST(len(ws) AS INTEGER) AS n_words,
        | CASE WHEN len(ws) = 0 THEN 0.0 ELSE round(len(list_distinct(ws))::DOUBLE / len(ws), 4) END AS distinct_word_ratio,
        | CASE WHEN len(g2) = 0 THEN 0.0 ELSE round(list_max(list_transform(list_distinct(g2), x -> len(list_filter(g2, y -> y = x))))::DOUBLE / len(g2), 4) END AS top_2gram_frac,
        | CASE WHEN len(g3) = 0 THEN 0.0 ELSE round(list_sum(list_transform(g3, x -> CASE WHEN len(list_filter(g3, y -> y = x)) > 1 THEN 1 ELSE 0 END))::DOUBLE / len(g3), 4) END AS dup_3gram_frac
        |FROM g ORDER BY doc_id""".stripMargin,
    "d16_group_quota" ->
      """WITH h AS (SELECT doc_id, source,
        |  ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT % 10000 AS hb
        | FROM documents),
        |r AS (SELECT doc_id, source,
        |  row_number() OVER (PARTITION BY source ORDER BY hb, doc_id) AS rk FROM h)
        |SELECT doc_id, source FROM r WHERE rk <= 15 ORDER BY doc_id""".stripMargin,
    // 60-bit md5 fraction vs the rate (review r9: bucket thresholds
    // floor sub-5e-5 rates to empty); 1152921504606846976 = 2^60.
    "d17_stratified_sample" ->
      """SELECT doc_id, lang FROM documents
        |WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS DOUBLE)
        |    / 1152921504606846976.0
        |  < CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 0.25 ELSE 0.1 END
        |ORDER BY doc_id""".stripMargin,
    "d18_curation_sample" ->
      """WITH t AS (SELECT doc_id, lang, source, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |g AS (SELECT doc_id, lang, source, len(ws) AS n_words,
        |  list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]) AS g3
        | FROM t),
        |f AS (SELECT doc_id, lang, source, n_words FROM g
        | WHERE n_words >= 20 AND
        |  (CASE WHEN len(g3) = 0 THEN 0.0 ELSE round(list_sum(list_transform(g3, x -> CASE WHEN len(list_filter(g3, y -> y = x)) > 1 THEN 1 ELSE 0 END))::DOUBLE / len(g3), 4) END) <= 0.1),
        |sm AS (SELECT doc_id, source, n_words FROM f
        | WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS DOUBLE)
        |     / 1152921504606846976.0
        |   < CASE lang WHEN 'en' THEN 0.8 WHEN 'de' THEN 0.5 ELSE 0.3 END),
        |cp AS (SELECT doc_id, source, n_words,
        |  row_number() OVER (PARTITION BY source
        |    ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT % 10000, doc_id) AS rk
        | FROM sm)
        |SELECT source, count(*) AS n_docs, round(avg(n_words), 4) AS avg_words
        |FROM cp WHERE rk <= 10 GROUP BY source ORDER BY source""".stripMargin,
    "d19_dedup_clusters" ->
      (s"WITH RECURSIVE\n$d19ClusterCtes\n" +
        """SELECT d.doc_id,
          | coalesce(l.cluster_id, d.doc_id) AS cluster_id,
          | CAST(CASE WHEN coalesce(l.cluster_id, d.doc_id) = d.doc_id
          |      THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
          |FROM documents d LEFT JOIN lab l USING (doc_id)
          |ORDER BY doc_id""".stripMargin),
    // d19's components + the keep-best policy: rank each cluster by
    // (length desc, doc_id) and keep rank 1 — the FineWeb rule
    "d54_dedup_keep_best" ->
      (s"WITH RECURSIVE\n$d19ClusterCtes,\n" +
        """allrows AS (SELECT d.doc_id,
          |  coalesce(l.cluster_id, d.doc_id) AS cluster_id,
          |  length(d.text) AS score
          |  FROM documents d LEFT JOIN lab l USING (doc_id)),
          |ranked AS (SELECT doc_id, cluster_id,
          |  row_number() OVER (PARTITION BY cluster_id
          |    ORDER BY score DESC, doc_id) AS rk FROM allrows)
          |SELECT doc_id, cluster_id, (rk = 1) AS keep
          |FROM ranked ORDER BY doc_id""".stripMargin),
    // Same deterministic 10-word-line fixture as the Spark side, then
    // the line-dedup algebra: global line frequency, anti-join, ordered
    // string_agg reassembly.
    "d21_line_dedup" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |c0 AS (SELECT doc_id, list_transform(range(0, greatest(CAST(ceil(len(ws) / 10.0) AS INT), 1)),
        |    i -> array_to_string(ws[i*10+1 : i*10+10], ' ')) AS chunks FROM w),
        |c AS (SELECT doc_id, unnest(range(0, len(chunks))) AS pos, unnest(chunks) AS line FROM c0),
        |boiler AS (SELECT line FROM c WHERE line <> ''
        |          GROUP BY line HAVING count(*) >= 2),
        |kept AS (SELECT doc_id, pos, line FROM c WHERE line NOT IN (SELECT line FROM boiler)),
        |reb AS (SELECT doc_id, count(*) AS n_kept,
        |        string_agg(line, chr(10) ORDER BY pos) AS txt
        |        FROM kept GROUP BY doc_id)
        |SELECT c0.doc_id, CAST(len(chunks) AS INT) AS n_lines,
        | CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
        | md5(coalesce(reb.txt, '')) AS kept_fp
        |FROM c0 LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Same deterministic PII injection as the Spark side, then the
    // identical RE2/java-compatible patterns: count, and redact in the
    // same email -> phone -> ip order.
    "d22_pii_redact" ->
      """WITH inj AS (SELECT doc_id, text
        |  || CASE WHEN doc_id % 3 > 0 THEN ' reach user' || doc_id || '@mail.example.com' ELSE '' END
        |  || CASE WHEN doc_id % 4 > 0 THEN ' from 10.' || (doc_id % 200) || '.7.44' ELSE '' END
        |  || CASE WHEN doc_id % 5 > 0 THEN ' tel +1-555-' || (1000 + doc_id % 9000) ELSE '' END AS text
        | FROM documents)
        |SELECT doc_id,
        | CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
        | CAST(len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b')) AS INT) AS n_ips,
        | CAST(len(regexp_extract_all(text, '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones,
        | md5(regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g'),
        |   '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g')) AS red_fp
        |FROM inj ORDER BY doc_id""".stripMargin,
    // The Bloom pre-filter is execution strategy only (no false
    // negatives + exact confirm), so the oracle is d20's shingle
    // intersection on the 450/50 split.
    "d23_bloom_decontaminate" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w WHERE len(ws) >= 3),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id >= 450),
        |d AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id < 450)
        |SELECT d.doc_id, count(*) AS n_hits
        |FROM d JOIN b USING (g)
        |GROUP BY d.doc_id HAVING count(*) >= 1
        |ORDER BY doc_id""".stripMargin,
    "d26_vocab_topk" ->
      """SELECT word, count(*) AS n
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
        |      FROM documents)
        |GROUP BY word ORDER BY n DESC, word LIMIT 100""".stripMargin,
    // Same add-one-smoothed bigram cross-entropy: integer counts, each
    // pair's nll = ln of an integer ratio (bit-identical inputs both
    // engines), mean rounded 4dp like every float aggregate.
    "d27_perplexity" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |pr AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws)), i -> {'prev': ws[i], 'cur': ws[i + 1]})) AS p
        |  FROM w WHERE len(ws) >= 2),
        |dp AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM pr),
        |bg AS (SELECT prev, cur, count(*) AS n FROM dp WHERE doc_id < 250 GROUP BY 1, 2),
        |cx AS (SELECT prev, count(*) AS n_ctx FROM dp WHERE doc_id < 250 GROUP BY 1),
        |vv AS (SELECT count(DISTINCT word) + 1 AS v FROM
        |  (SELECT unnest(ws) AS word FROM w WHERE doc_id < 250 AND len(ws) >= 2)),
        |sc AS (SELECT doc_id,
        |  -ln((coalesce(n, 0) + 1) / CAST(coalesce(n_ctx, 0) + v AS DOUBLE)) AS nll
        |  FROM dp LEFT JOIN bg USING (prev, cur) LEFT JOIN cx USING (prev) CROSS JOIN vv)
        |SELECT doc_id, count(*) AS n_pairs, round(avg(nll), 4) AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Interpolated trigram (λ = 5/10, 3/10, 2/10): the three terms sit
    // over the common denominator 10·c(uv·)·c(v·)·(N+V), so num and den
    // are exact 64-bit integers in both engines (unseen prefixes
    // contribute (0, 1)) and ln of the one double division matches
    // bit-for-bit; mean rounded 4dp like every float aggregate.
    "d28_perplexity_trigram" ->
      """WITH wd AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |tr AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws) - 1),
        |    i -> {'u': ws[i], 'v': ws[i + 1], 'w': ws[i + 2]})) AS t
        |  FROM wd WHERE len(ws) >= 3),
        |dt3 AS (SELECT doc_id, t.u AS u, t.v AS v, t.w AS w FROM tr),
        |pr AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws)), i -> {'v': ws[i], 'w': ws[i + 1]})) AS p
        |  FROM wd WHERE len(ws) >= 2),
        |dp AS (SELECT doc_id, p.v AS v, p.w AS w FROM pr),
        |tg  AS (SELECT u, v, w, count(*) AS n3 FROM dt3 WHERE doc_id < 250 GROUP BY 1, 2, 3),
        |tgc AS (SELECT u, v, count(*) AS c3 FROM dt3 WHERE doc_id < 250 GROUP BY 1, 2),
        |bg  AS (SELECT v, w, count(*) AS n2 FROM dp WHERE doc_id < 250 GROUP BY 1, 2),
        |bgc AS (SELECT v, count(*) AS c2 FROM dp WHERE doc_id < 250 GROUP BY 1),
        |ug  AS (SELECT w, count(*) AS n1 FROM
        |  (SELECT unnest(ws) AS w FROM wd WHERE doc_id < 250) GROUP BY 1),
        |nv  AS (SELECT count(*) AS n_tok, count(DISTINCT w) + 1 AS vsz FROM
        |  (SELECT unnest(ws) AS w FROM wd WHERE doc_id < 250)),
        |sc AS (SELECT doc_id,
        |  -ln(CAST(5 * coalesce(n3, 0) * coalesce(c2, 1) * (n_tok + vsz)
        |       + 3 * coalesce(n2, 0) * coalesce(c3, 1) * (n_tok + vsz)
        |       + 2 * (coalesce(n1, 0) + 1) * coalesce(c3, 1) * coalesce(c2, 1) AS DOUBLE)
        |     / CAST(10 * coalesce(c3, 1) * coalesce(c2, 1) * (n_tok + vsz) AS DOUBLE)) AS nll
        |  FROM dt3
        |  LEFT JOIN tg USING (u, v, w)
        |  LEFT JOIN tgc USING (u, v)
        |  LEFT JOIN bg USING (v, w)
        |  LEFT JOIN bgc USING (v)
        |  LEFT JOIN ug USING (w)
        |  CROSS JOIN nv)
        |SELECT doc_id, count(*) AS n_tri, round(avg(nll), 4) AS avg_nll
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // Same k=8-token md5-60bit anchors, df-capped at 100, chained along
    // the pa - pb diagonal; island = pa - row_number, span length =
    // island size + k - 1, reported at >= 20 tokens.
    "d29_substring_spans" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |kg AS (SELECT doc_id, list_transform(range(1, len(ws) - 8 + 2), i ->
        |   ('0x' || substr(md5(list_aggregate(ws[i:i+7], 'string_agg', ' ')), 1, 15))::UBIGINT) AS gs
        | FROM t WHERE len(ws) >= 8),
        |pos AS (SELECT doc_id,
        |   unnest(list_transform(range(1, len(gs) + 1), i -> {'pos': i, 'h': gs[i]}), recursive := true)
        | FROM kg),
        |freq AS (SELECT h, count(DISTINCT doc_id) AS df, count(*) AS tot FROM pos GROUP BY h),
        |posf AS (SELECT p.doc_id, p.pos, p.h FROM pos p JOIN freq USING (h) WHERE freq.df <= 100 AND freq.tot <= 1000),
        |m AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
        |      FROM posf a JOIN posf b ON a.h = b.h AND a.doc_id < b.doc_id),
        |isl AS (SELECT id_a, id_b, pa, pb,
        |          pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS island
        |        FROM m),
        |sp AS (SELECT id_a, id_b, CAST(min(pa) AS INTEGER) AS a_pos, CAST(min(pb) AS INTEGER) AS b_pos,
        |          CAST(count(*) + 7 AS INTEGER) AS n_tokens
        |       FROM isl GROUP BY id_a, id_b, pa - pb, island)
        |SELECT id_a, id_b, a_pos, b_pos, n_tokens FROM sp WHERE n_tokens >= 20
        |ORDER BY id_a, id_b, a_pos, b_pos""".stripMargin,
    // d29's span CTEs, then: cut intervals from the higher-id doc,
    // running-max island merge, positional anti-join, ordered
    // string_agg reassembly, md5 of the cleaned token stream.
    "d31_remove_spans" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |kg AS (SELECT doc_id, list_transform(range(1, len(ws) - 8 + 2), i ->
        |   ('0x' || substr(md5(list_aggregate(ws[i:i+7], 'string_agg', ' ')), 1, 15))::UBIGINT) AS gs
        | FROM t WHERE len(ws) >= 8),
        |pos AS (SELECT doc_id,
        |   unnest(list_transform(range(1, len(gs) + 1), i -> {'pos': i, 'h': gs[i]}), recursive := true)
        | FROM kg),
        |freq AS (SELECT h, count(DISTINCT doc_id) AS df, count(*) AS tot FROM pos GROUP BY h),
        |posf AS (SELECT p.doc_id, p.pos, p.h FROM pos p JOIN freq USING (h) WHERE freq.df <= 100 AND freq.tot <= 1000),
        |mm AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.pos AS pa, b.pos AS pb
        |      FROM posf a JOIN posf b ON a.h = b.h AND a.doc_id < b.doc_id),
        |isl AS (SELECT id_a, id_b, pa, pb,
        |          pa - row_number() OVER (PARTITION BY id_a, id_b, pa - pb ORDER BY pa) AS island
        |        FROM mm),
        |sp AS (SELECT id_a, id_b, min(pa) AS a_pos, min(pb) AS b_pos,
        |          count(*) + 7 AS n_tokens
        |       FROM isl GROUP BY id_a, id_b, pa - pb, island),
        |cuts AS (SELECT id_b AS doc_id, b_pos AS f, b_pos + n_tokens AS u
        |         FROM sp WHERE n_tokens >= 20),
        |mg0 AS (SELECT doc_id, f, u, max(u) OVER (PARTITION BY doc_id ORDER BY f, u
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax FROM cuts),
        |mg1 AS (SELECT doc_id, f, u,
        |          CASE WHEN pmax IS NULL OR f > pmax THEN 1 ELSE 0 END AS nw FROM mg0),
        |mg2 AS (SELECT doc_id, f, u, sum(nw) OVER (PARTITION BY doc_id ORDER BY f, u) AS isl2 FROM mg1),
        |mg AS (SELECT doc_id, min(f) AS f, max(u) AS u FROM mg2 GROUP BY doc_id, isl2),
        |tk AS (SELECT doc_id,
        |   unnest(list_transform(range(1, len(ws) + 1), i -> {'p': i, 'tok': ws[i]}), recursive := true)
        | FROM t),
        |kept AS (SELECT tk.doc_id, p, tok FROM tk WHERE NOT EXISTS
        |  (SELECT 1 FROM mg WHERE mg.doc_id = tk.doc_id AND tk.p >= mg.f AND tk.p < mg.u)),
        |rb AS (SELECT doc_id, count(*) AS n_kept, string_agg(tok, ' ' ORDER BY p) AS tc
        |       FROM kept GROUP BY doc_id)
        |SELECT t.doc_id, CAST(len(t.ws) AS INTEGER) AS n_tokens,
        |  coalesce(rb.n_kept, 0) AS n_kept, md5(coalesce(rb.tc, '')) AS clean_md5
        |FROM t LEFT JOIN rb USING (doc_id) ORDER BY doc_id""".stripMargin,
    // Same md5-bucket featurization as d30; weight buckets derived
    // in-engine from the literal word list (grouped by bucket so a
    // collision cannot duplicate join rows), dyadic-rational weights
    // -> the margin sum is float-exact in any order.
    // the d34 featurization (md5 uni+bigram buckets) widened to one
    // margin per class + a CASE-chain argmax whose comparison ORDER
    // mirrors scoreSparseMulti's first-max rule over [en,de,fr,es,zh];
    // margins are exact dyadic sums, so >=-comparisons are engine-exact
    "d56_langid_score" ->
      ("""WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |f0 AS (SELECT doc_id, list_concat(ws,
        |   CASE WHEN len(ws) >= 2
        |        THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |        ELSE [] END) AS fs
        | FROM t),
        |f AS (SELECT doc_id,
        |   ('0x' || substr(md5(unnest(fs)), 1, 15))::UBIGINT % 10000 AS b
        | FROM f0),
        |wl AS (SELECT b,
        |   sum(CASE WHEN cls = 'en' THEN w END) AS w_en,
        |   sum(CASE WHEN cls = 'de' THEN w END) AS w_de,
        |   sum(CASE WHEN cls = 'fr' THEN w END) AS w_fr,
        |   sum(CASE WHEN cls = 'es' THEN w END) AS w_es,
        |   sum(CASE WHEN cls = 'zh' THEN w END) AS w_zh
        | FROM (SELECT ('0x' || substr(md5(word), 1, 15))::UBIGINT % 10000 AS b, cls, w
        |   FROM (VALUES """.stripMargin +
        d56Weights.map { case (wd, c, w) => s"('$wd', '$c', $w)" }
          .mkString(", ") +
        """) AS v(word, cls, w)) GROUP BY b),
        |sc AS (SELECT doc_id, count(*) AS n_feats,
        |   sum(coalesce(w_en, 0.0)) + 0.125 AS m_en,
        |   sum(coalesce(w_de, 0.0)) + 0.0625 AS m_de,
        |   sum(coalesce(w_fr, 0.0)) + 0.03125 AS m_fr,
        |   sum(coalesce(w_es, 0.0)) + 0.0 AS m_es,
        |   sum(coalesce(w_zh, 0.0)) - 0.03125 AS m_zh
        | FROM f LEFT JOIN wl USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_feats,
        | round(m_en, 4) AS margin_en, round(m_de, 4) AS margin_de,
        | round(m_fr, 4) AS margin_fr, round(m_es, 4) AS margin_es,
        | round(m_zh, 4) AS margin_zh,
        | CASE WHEN m_en >= m_de AND m_en >= m_fr AND m_en >= m_es AND m_en >= m_zh THEN 'en'
        |      WHEN m_de >= m_fr AND m_de >= m_es AND m_de >= m_zh THEN 'de'
        |      WHEN m_fr >= m_es AND m_fr >= m_zh THEN 'fr'
        |      WHEN m_es >= m_zh THEN 'es' ELSE 'zh' END AS lang_pred
        |FROM sc ORDER BY doc_id""".stripMargin),
    "d34_quality_score" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |f0 AS (SELECT doc_id, list_concat(ws,
        |   CASE WHEN len(ws) >= 2
        |        THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |        ELSE [] END) AS fs
        | FROM t),
        |f AS (SELECT doc_id,
        |   ('0x' || substr(md5(unnest(fs)), 1, 15))::UBIGINT % 10000 AS b
        | FROM f0),
        |wl AS (SELECT b, sum(w) AS w FROM (
        |   SELECT ('0x' || substr(md5(word), 1, 15))::UBIGINT % 10000 AS b, w
        |   FROM (VALUES ('the', 0.25), ('and', 0.25), ('of', 0.125),
        |     ('der', -0.25), ('le', -0.25), ('el', -0.125), ('und', -0.125),
        |     ('que', -0.125)) AS v(word, w)) GROUP BY b),
        |sc AS (SELECT doc_id, count(*) AS n_feats,
        |   sum(coalesce(w, 0.0)) + 0.125 AS margin
        | FROM f LEFT JOIN wl USING (b) GROUP BY doc_id)
        |SELECT doc_id, n_feats, round(margin, 4) AS margin
        |FROM sc ORDER BY doc_id""".stripMargin,
    // Each word renders as a ·-delimited symbol stream (·l··o··w·);
    // every merge is one non-overlapping replace (boundaries never
    // share characters, so replace ≡ the scan-merge), applied in the
    // same fixed order as the Spark expression's merge table.
    "d33_bpe_encode" ->
      """WITH t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |e AS (SELECT doc_id, list_transform(ws, w ->
        |   replace(replace(replace(replace(replace(replace(replace(replace(
        |     '·' || array_to_string(list_transform(range(1, len(w) + 1), i -> w[i]), '··') || '·',
        |     '·t··h·', '·th·'), '·th··e·', '·the·'), '·i··n·', '·in·'), '·a··n·', '·an·'),
        |     '·an··d·', '·and·'), '·e··r·', '·er·'), '·o··n·', '·on·'), '·r··e·', '·re·')) AS enc
        | FROM t),
        |r AS (SELECT doc_id,
        |   CAST(coalesce(list_sum(list_transform(enc, s -> len(str_split(trim(s, '·'), '··')))), 0) AS INTEGER) AS n_bpe,
        |   array_to_string(list_transform(enc, s -> array_to_string(str_split(trim(s, '·'), '··'), ' ')), ' | ') AS toks
        | FROM e)
        |SELECT doc_id, n_bpe, md5(toks) AS toks_md5 FROM r ORDER BY doc_id""".stripMargin,
    // d33's replace chain over bpeTokens + the injected OOV suffix;
    // out-of-alphabet codepoints expand to '<0x'||hex-byte||'>' pieces
    // (hex() is uppercase, matching Unigram.bytePiece's %02X), then
    // the SAME delimited-stream merges — byte pieces can never match a
    // merge pattern, so they pass through like the Scala symbols do
    "d62_bpe_bytes" ->
      """WITH t AS (SELECT doc_id,
        |    regexp_extract_all(text || ' Café 90° straße λ ' || chr(128512),
        |      '[a-zA-Z0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]') AS ws FROM documents),
        |tok AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi, unnest(ws) AS w FROM t),
        |sy AS (SELECT doc_id, wi, flatten(list_transform(range(1, length(w) + 1), i ->
        |    CASE WHEN regexp_matches(w[i], '^[a-z0-9]$') THEN [w[i]]
        |         ELSE list_transform(range(1, length(hex(w[i])) // 2 + 1),
        |           j -> '<0x' || substr(hex(w[i]), 2 * j - 1, 2) || '>') END)) AS syms
        |  FROM tok),
        |e AS (SELECT doc_id, wi,
        |   replace(replace(replace(replace(replace(replace(replace(replace(
        |     '·' || array_to_string(syms, '··') || '·',
        |     '·t··h·', '·th·'), '·th··e·', '·the·'), '·i··n·', '·in·'), '·a··n·', '·an·'),
        |     '·an··d·', '·and·'), '·e··r·', '·er·'), '·o··n·', '·on·'), '·r··e·', '·re·') AS enc
        | FROM sy),
        |r AS (SELECT doc_id,
        |   CAST(coalesce(sum(len(str_split(trim(enc, '·'), '··'))), 0) AS INTEGER) AS n_bpe,
        |   string_agg(array_to_string(str_split(trim(enc, '·'), '··'), ' '), ' | ' ORDER BY wi) AS toks
        | FROM e GROUP BY doc_id)
        |SELECT doc_id, n_bpe, md5(toks) AS toks_md5 FROM r ORDER BY doc_id""".stripMargin,
    // compactPairs fold: d07's exact-Jaccard pairs (same slice, same
    // unrounded threshold), then d19's recursive-CTE collapse - the
    // committed two-fold incremental assignment must equal CC over
    // ALL pairs, canonical = min id, singletons via the LEFT JOIN
    "d63_pairs_fold" ->
      """WITH RECURSIVE
        |w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents WHERE doc_id < 500),
        |sh AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w WHERE len(ws) >= 3),
        |pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
        |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |  WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
        |     / len(list_distinct(list_concat(a.s, b.s))) >= 0.5),
        |edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT eu, ev FROM edges
        |  UNION
        |  SELECT r.src, g.ev FROM reach r JOIN edges g ON g.eu = r.dst),
        |lab AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
        |        FROM reach GROUP BY src)
        |SELECT d.doc_id,
        | coalesce(l.cluster_id, d.doc_id) AS cluster_id,
        | CAST(CASE WHEN coalesce(l.cluster_id, d.doc_id) = d.doc_id
        |      THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
        |FROM (SELECT doc_id FROM documents WHERE doc_id < 500) d
        |LEFT JOIN lab l USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    // Greedy longest-match replay: `best` precomputes the longest
    // multi-piece match per (word, position) — position 1 takes
    // word-initial pieces, later positions ##-continuations; two
    // same-length matches at one position are necessarily the SAME
    // piece, so clen DESC alone is deterministic — `step` falls back
    // to the always-present single char, and the recursive walk is
    // linear (exactly one step row per position). Docs with no words
    // keep n_wp 0 / md5('') via the LEFT JOIN.
    "d59_wordpiece" -> {
      val vmRows = d59Multis.map(p => s"('$p')").mkString(",")
      s"""WITH RECURSIVE
        |t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |wpos AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi, unnest(ws) AS w FROM t),
        |dw AS (SELECT DISTINCT w FROM wpos),
        |vm(piece) AS (VALUES $vmRows),
        |pp AS (SELECT w, unnest(range(1, length(w) + 1)) AS pos FROM dw),
        |cand AS (SELECT pp.w, pp.pos, v.piece,
        |    CASE WHEN v.piece LIKE '##%' THEN length(v.piece) - 2 ELSE length(v.piece) END AS clen
        |  FROM pp JOIN vm v
        |    ON ((pp.pos = 1) = (v.piece NOT LIKE '##%'))
        |   AND substr(pp.w, pp.pos, CASE WHEN v.piece LIKE '##%' THEN length(v.piece) - 2 ELSE length(v.piece) END)
        |       = CASE WHEN v.piece LIKE '##%' THEN substr(v.piece, 3) ELSE v.piece END),
        |best AS (SELECT w, pos, piece, clen FROM (SELECT w, pos, piece, clen,
        |    row_number() OVER (PARTITION BY w, pos ORDER BY clen DESC) AS rk FROM cand) WHERE rk = 1),
        |step AS (SELECT pp.w, pp.pos,
        |    coalesce(b.piece, CASE WHEN pp.pos = 1 THEN substr(pp.w, 1, 1)
        |                           ELSE '##' || substr(pp.w, pp.pos, 1) END) AS piece,
        |    coalesce(b.clen, 1) AS clen
        |  FROM pp LEFT JOIN best b ON b.w = pp.w AND b.pos = pp.pos),
        |g AS (
        |  SELECT w, 1 AS pos, CAST('' AS VARCHAR) AS toks, 0 AS np FROM dw
        |  UNION ALL
        |  SELECT g.w, g.pos + s.clen,
        |    g.toks || CASE WHEN g.pos = 1 THEN '' ELSE ' ' END || s.piece, g.np + 1
        |  FROM g JOIN step s ON s.w = g.w AND s.pos = g.pos
        |  WHERE g.pos <= length(g.w)),
        |seg AS (SELECT w, toks, np FROM g WHERE pos = length(w) + 1),
        |j AS (SELECT wp.doc_id, wp.wi, s.toks, s.np FROM wpos wp JOIN seg s ON s.w = wp.w),
        |agg AS (SELECT doc_id, sum(np) AS n_wp,
        |    string_agg(toks, ' | ' ORDER BY wi) AS toks FROM j GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.n_wp, 0) AS INTEGER) AS n_wp,
        |  md5(coalesce(agg.toks, '')) AS toks_md5
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin
    },
    // d59's walk under the gapped vocab, WITHOUT the single-char
    // fallback: vm carries the consonant singles explicitly, step is
    // an INNER join on best, and a walk that gets stuck never reaches
    // pos = len+1 - those words land in ub and byte-expand (hex() of
    // each [a-z0-9] char = its one UTF-8 byte, uppercase, matching
    // Unigram.bytePiece's %02X rendering).
    "d61_wordpiece_bytes" -> {
      val pieces = d61Singles.flatMap(c => Seq(c, s"##$c")) ++ d59Multis
      val vmRows = pieces.map(p => s"('$p')").mkString(",")
      s"""WITH RECURSIVE
        |t AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |wpos AS (SELECT doc_id, unnest(range(1, len(ws) + 1)) AS wi, unnest(ws) AS w FROM t),
        |dw AS (SELECT DISTINCT w FROM wpos),
        |vm(piece) AS (VALUES $vmRows),
        |pp AS (SELECT w, unnest(range(1, length(w) + 1)) AS pos FROM dw),
        |cand AS (SELECT pp.w, pp.pos, v.piece,
        |    CASE WHEN v.piece LIKE '##%' THEN length(v.piece) - 2 ELSE length(v.piece) END AS clen
        |  FROM pp JOIN vm v
        |    ON ((pp.pos = 1) = (v.piece NOT LIKE '##%'))
        |   AND substr(pp.w, pp.pos, CASE WHEN v.piece LIKE '##%' THEN length(v.piece) - 2 ELSE length(v.piece) END)
        |       = CASE WHEN v.piece LIKE '##%' THEN substr(v.piece, 3) ELSE v.piece END),
        |best AS (SELECT w, pos, piece, clen FROM (SELECT w, pos, piece, clen,
        |    row_number() OVER (PARTITION BY w, pos ORDER BY clen DESC) AS rk FROM cand) WHERE rk = 1),
        |g AS (
        |  SELECT w, 1 AS pos, CAST('' AS VARCHAR) AS toks, 0 AS np FROM dw
        |  UNION ALL
        |  SELECT g.w, g.pos + b.clen,
        |    g.toks || CASE WHEN g.pos = 1 THEN '' ELSE ' ' END || b.piece, g.np + 1
        |  FROM g JOIN best b ON b.w = g.w AND b.pos = g.pos
        |  WHERE g.pos <= length(g.w)),
        |seg AS (SELECT w, toks, np FROM g WHERE pos = length(w) + 1),
        |ub AS (SELECT w,
        |    string_agg('<0x' || hex(substr(w, pos, 1)) || '>', ' ' ORDER BY pos) AS toks,
        |    length(w) AS np
        |  FROM pp WHERE w NOT IN (SELECT w FROM seg) GROUP BY w),
        |allseg AS (SELECT w, toks, np FROM seg UNION ALL SELECT w, toks, np FROM ub),
        |j AS (SELECT wp.doc_id, wp.wi, s.toks, s.np FROM wpos wp JOIN allseg s ON s.w = wp.w),
        |agg AS (SELECT doc_id, sum(np) AS n_wp,
        |    string_agg(toks, ' | ' ORDER BY wi) AS toks FROM j GROUP BY doc_id)
        |SELECT d.doc_id, CAST(coalesce(agg.n_wp, 0) AS INTEGER) AS n_wp,
        |  md5(coalesce(agg.toks, '')) AS toks_md5
        |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
        |ORDER BY d.doc_id""".stripMargin
    },
    // Unit-normalize (x · (1/√ss), the e06 recipe), argmax-cosine
    // assign to the fixed 8-seed centroid set (ties to the smaller
    // cell), then the d16 md5-rank quota per cluster.
    "d35_cluster_sample" ->
      """WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
        |u AS (SELECT id, list_transform(vec, x -> x * (1.0 / sqrt(list_sum(list_transform(vec, y -> y * y))))) AS uv FROM v),
        |c AS (SELECT id AS cell, uv AS cv FROM u WHERE id < 8),
        |sims AS (SELECT u.id, c.cell,
        |  list_sum(list_transform(range(1, len(uv) + 1), i -> uv[i] * cv[i])) AS s
        |  FROM u CROSS JOIN c),
        |asg AS (SELECT id, cell FROM (SELECT id, cell,
        |    row_number() OVER (PARTITION BY id ORDER BY s DESC, cell) AS rk FROM sims)
        |  WHERE rk = 1),
        |sz AS (SELECT cell, count(*) AS n_members FROM asg GROUP BY cell),
        |rnk AS (SELECT id, cell, row_number() OVER (PARTITION BY cell
        |    ORDER BY ('0x' || substr(md5(CAST(id AS VARCHAR)), 1, 15))::UBIGINT % 10000, id) AS rk
        |  FROM asg)
        |SELECT r.cell AS cluster, s.n_members, r.id, CAST(r.rk AS INT) AS rk
        |FROM rnk r JOIN sz s USING (cell) WHERE r.rk <= 10
        |ORDER BY cluster, rk""".stripMargin,
    // Same injected corrupted suffix; the repair table runs verbatim
    // in the same order ('Ã' || chr(160) is the à entry — the 0xA0
    // byte renders as NBSP, kept out of the literal for legibility).
    "d36_fix_encoding" ->
      """WITH raw AS (SELECT doc_id,
        |  text || ' CafÃ© â€” itâ€™s â€œnaÃ¯veâ€¦ Ã¼ber Ã§a straÃŸe 90Â° Â©' AS r
        | FROM documents),
        |fx AS (SELECT doc_id,
        |  replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(
        |  replace(replace(replace(replace(replace(replace(replace(replace(replace(replace(r,
        |  'â€™', '’'), 'â€œ', '“'), 'â€“', '–'), 'â€”', '—'), 'â€¦', '…'),
        |  'Ã©', 'é'), 'Ã¨', 'è'), 'Ã¼', 'ü'), 'Ã¶', 'ö'), 'Ã¤', 'ä'),
        |  'Ã±', 'ñ'), 'Ã§', 'ç'), 'Ã¡', 'á'), 'Ã³', 'ó'), 'Ãº', 'ú'),
        |  'Ã¯', 'ï'), 'ÃŸ', 'ß'), 'Ã' || chr(160), 'à'), 'Â°', '°'), 'Â©', '©') AS t
        | FROM raw)
        |SELECT doc_id, CAST(length(t) AS INTEGER) AS n_chars, md5(t) AS text_md5
        |FROM fx ORDER BY doc_id""".stripMargin,
    // budget B = min_s tokens_s/w_s, rate_s = w_s*B/tokens_s (left-
    // assoc double ops in both engines); kept set via the 60-bit
    // hash-fraction filter.
    "d37_mixture_sample" ->
      """WITH t AS (SELECT doc_id, lang,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM documents),
        |w(lang, wt) AS (VALUES ('en', 0.6), ('de', 0.25), ('fr', 0.15)),
        |st AS (SELECT lang, CAST(sum(nw) AS BIGINT) AS n FROM t GROUP BY lang),
        |sw AS (SELECT st.lang, n, wt FROM st JOIN w USING (lang)),
        |b AS (SELECT min(CAST(n AS DOUBLE) / wt) AS budget FROM sw),
        |r AS (SELECT lang, least(1.0, wt * budget / CAST(n AS DOUBLE)) AS rate
        |      FROM sw CROSS JOIN b),
        |kept AS (SELECT t.doc_id, t.lang, t.nw FROM t JOIN r USING (lang)
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS DOUBLE)
        |      / 1152921504606846976.0 < rate)
        |SELECT lang, count(*) AS n_docs, CAST(sum(nw) AS BIGINT) AS n_tokens
        |FROM kept GROUP BY lang ORDER BY lang""".stripMargin,
    // share = w*T/n; full epochs = floor(share), final pass at the
    // fractional rate via the 60-bit hash fraction. All-double plan
    // arithmetic — identical in both engines.
    "d38_mixture_epochs" ->
      """WITH t AS (SELECT doc_id, lang,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM documents),
        |w(lang, wt) AS (VALUES ('en', 0.5), ('de', 0.3), ('zh', 0.2)),
        |st AS (SELECT lang, CAST(sum(nw) AS BIGINT) AS n FROM t GROUP BY lang),
        |pl AS (SELECT st.lang, n,
        |   wt * 100000.0 / CAST(n AS DOUBLE) AS share FROM st JOIN w USING (lang)),
        |p2 AS (SELECT lang, n, CAST(floor(share) AS BIGINT) AS fe,
        |   share - floor(share) AS lr FROM pl),
        |ex AS (SELECT t.doc_id, t.lang, t.nw, e.epoch, p2.fe, p2.lr
        |  FROM t JOIN p2 USING (lang),
        |  LATERAL (SELECT unnest(range(0, fe + 1)) AS epoch) e
        |  WHERE e.epoch < fe
        |     OR CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS DOUBLE)
        |        / 1152921504606846976.0 < lr)
        |SELECT lang, max(fe) AS full_epochs, round(max(lr), 6) AS last_rate,
        | count(*) AS n_rows, CAST(sum(nw) AS BIGINT) AS n_tokens
        |FROM ex GROUP BY lang ORDER BY lang""".stripMargin,
    // identical chain; DuckDB replacement groups are \1 and its
    // regexp_replace needs the 'g' flag for the global passes.
    // the same 60-bit md5 of "ep0-<id>": shard = hash % 8, pos = rank
    // of (hash, id) within the shard
    "d40_epoch_shuffle" ->
      """WITH h AS (SELECT doc_id,
        |  ('0x' || substr(md5('ep0-' || CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS hv
        | FROM documents)
        |SELECT doc_id, CAST(hv % 8 AS INTEGER) AS shard,
        | CAST(row_number() OVER (PARTITION BY hv % 8 ORDER BY hv, doc_id) AS INTEGER) AS pos
        |FROM h ORDER BY shard, pos""".stripMargin,
    // BM25 (Lucene idf): every float derives from integer counts plus
    // the one avgdl division; the parenthesization mirrors
    // Relevance.bm25 verbatim and the per-doc score adds the per-term
    // contributions in the same fixed order (c_join + c_hash + c_dup),
    // so scores match bit-for-bit before the 4dp display round.
    "d41_bm25" -> d41OracleSql,
    // index-backed retrieval must score IDENTICALLY to the direct
    // scan, so its oracle IS d41's query — the persisted postings
    // cancel out of the compare entirely (the d50/d32 contract shape)
    "d53_bm25_index" -> d41OracleSql,
    // incremental BM25 is EXACT (integer global stats + unioned-postings
    // df), so the appended index answers d41's full-corpus oracle
    "d60_bm25_delta" -> d41OracleSql,
    // d27's scoring CTEs + per-lang ntile(3) over (rounded score, id)
    // — integer rank logic, no interpolated-threshold knife-edge
    "d42_ccnet_buckets" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |pr AS (SELECT doc_id,
        |  unnest(list_transform(range(1, len(ws)), i -> {'prev': ws[i], 'cur': ws[i + 1]})) AS p
        |  FROM w WHERE len(ws) >= 2),
        |dp AS (SELECT doc_id, p.prev AS prev, p.cur AS cur FROM pr),
        |bg AS (SELECT prev, cur, count(*) AS n FROM dp WHERE doc_id < 250 GROUP BY 1, 2),
        |cx AS (SELECT prev, count(*) AS n_ctx FROM dp WHERE doc_id < 250 GROUP BY 1),
        |vv AS (SELECT count(DISTINCT word) + 1 AS v FROM
        |  (SELECT unnest(ws) AS word FROM w WHERE doc_id < 250 AND len(ws) >= 2)),
        |sc AS (SELECT doc_id,
        |  -ln((coalesce(n, 0) + 1) / CAST(coalesce(n_ctx, 0) + v AS DOUBLE)) AS nll
        |  FROM dp LEFT JOIN bg USING (prev, cur) LEFT JOIN cx USING (prev) CROSS JOIN vv),
        |ppl AS (SELECT doc_id, round(avg(nll), 4) AS ppl FROM sc GROUP BY doc_id),
        |pl AS (SELECT p.doc_id, d.lang, p.ppl FROM ppl p JOIN documents d USING (doc_id)),
        |nt AS (SELECT doc_id, lang, ppl,
        |  ntile(3) OVER (PARTITION BY lang ORDER BY ppl, doc_id) AS t FROM pl)
        |SELECT doc_id, lang, ppl,
        |  CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket
        |FROM nt ORDER BY doc_id""".stripMargin,
    // alpha-sampling at 0.5: w = sqrt(n) normalized in sorted-lang
    // order (sqrt is correctly rounded -> cross-engine bit-exact),
    // then d37's rate algebra and hash filter
    "d43_temperature_mix" ->
      """WITH t AS (SELECT doc_id, lang,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM documents),
        |st AS (SELECT lang, CAST(sum(nw) AS BIGINT) AS n FROM t GROUP BY lang),
        |pw AS (SELECT lang, n, sqrt(CAST(n AS DOUBLE)) AS pwr FROM st),
        |z AS (SELECT list_reduce(list(pwr ORDER BY lang), (a, b) -> a + b) AS z FROM pw),
        |sw AS (SELECT lang, n, pwr / z AS wt FROM pw CROSS JOIN z),
        |b AS (SELECT min(CAST(n AS DOUBLE) / wt) AS budget FROM sw),
        |r AS (SELECT lang, n, least(1.0, wt * budget / CAST(n AS DOUBLE)) AS rate
        |      FROM sw CROSS JOIN b),
        |kept AS (SELECT t.doc_id, t.lang, t.nw FROM t JOIN r USING (lang)
        |  WHERE CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::UBIGINT AS DOUBLE)
        |      / 1152921504606846976.0 < rate)
        |SELECT k.lang, round(r.rate, 6) AS rate,
        |  count(*) AS n_docs, CAST(sum(k.nw) AS BIGINT) AS n_tokens
        |FROM kept k JOIN r USING (lang) GROUP BY k.lang, r.rate
        |ORDER BY k.lang""".stripMargin,
    // The seven Gopher document-shape rules verbatim: whitespace-split
    // words via the explicit class (java/RE2 \s divergence), line
    // splits keep trailing empties in both engines, every ratio is a
    // single division of exact small integers
    "d44_gopher_rules" ->
      """WITH w AS (SELECT doc_id, text,
        |  list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws,
        |  regexp_split_to_array(text, '\n') AS lines,
        |  regexp_extract_all(lower(text), '[a-z0-9]+') AS lw FROM documents),
        |f AS (SELECT doc_id, len(ws) AS n_words,
        |  CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) AS char_sum,
        |  length(text) - length(replace(text, '#', '')) AS n_hash,
        |  (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) // 3
        |    + (length(text) - length(replace(text, '…', ''))) AS n_ellipsis,
        |  len(lines) AS n_lines,
        |  len(list_filter(lines, l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS n_bullet,
        |  len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)[ \t\r]*$'))) AS n_ell_end,
        |  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
        |  CASE WHEN list_contains(lw, 'the') THEN 1 ELSE 0 END
        |  + CASE WHEN list_contains(lw, 'a') THEN 1 ELSE 0 END AS n_stop
        | FROM w),
        |r AS (SELECT doc_id, n_words,
        |  CASE WHEN n_words > 0 THEN char_sum / CAST(n_words AS DOUBLE) END AS mean_word_len,
        |  CASE WHEN n_words > 0 THEN CAST(n_hash AS DOUBLE) / CAST(n_words AS DOUBLE) END AS hash_ratio,
        |  CASE WHEN n_words > 0 THEN CAST(n_ellipsis AS DOUBLE) / CAST(n_words AS DOUBLE) END AS ellipsis_ratio,
        |  CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) AS bullet_frac,
        |  CAST(n_ell_end AS DOUBLE) / CAST(n_lines AS DOUBLE) AS ellipsis_line_frac,
        |  CASE WHEN n_words > 0 THEN CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) END AS alpha_frac,
        |  n_stop FROM f),
        |g AS (SELECT *,
        |  (n_words >= 50 AND n_words <= 100000) AS r_word_count,
        |  coalesce(mean_word_len >= 3.0 AND mean_word_len <= 10.0, false) AS r_mean_word_len,
        |  coalesce(hash_ratio <= 0.1 AND ellipsis_ratio <= 0.1, false) AS r_symbol_ratio,
        |  bullet_frac < 0.9 AS r_bullet_lines,
        |  ellipsis_line_frac < 0.3 AS r_ellipsis_lines,
        |  coalesce(alpha_frac >= 0.8, false) AS r_alpha_words,
        |  n_stop >= 2 AS r_stop_words FROM r)
        |SELECT doc_id, n_words, round(mean_word_len, 4) AS mean_word_len,
        |  round(hash_ratio, 4) AS hash_ratio,
        |  round(ellipsis_ratio, 4) AS ellipsis_ratio,
        |  round(bullet_frac, 4) AS bullet_frac,
        |  round(ellipsis_line_frac, 4) AS ellipsis_line_frac,
        |  round(alpha_frac, 4) AS alpha_frac, n_stop AS n_stop_hits,
        |  r_word_count, r_mean_word_len, r_symbol_ratio, r_bullet_lines,
        |  r_ellipsis_lines, r_alpha_words, r_stop_words,
        |  (r_word_count AND r_mean_word_len AND r_symbol_ratio
        |   AND r_bullet_lines AND r_ellipsis_lines AND r_alpha_words
        |   AND r_stop_words) AS keep
        |FROM g ORDER BY doc_id""".stripMargin,
    // UniMax water-filling: capped iff budget - cumcap_i >= cap_i*(n-i)
    // (prefix-monotone because caps ascend); exact int64 until the one
    // lambda division
    "d45_unimax" ->
      """WITH t AS (SELECT source,
        |  CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source),
        |b AS (SELECT (9 * CAST(sum(n_tokens) AS BIGINT)) // 5 AS budget FROM t),
        |w AS (SELECT source, n_tokens, n_tokens * 2 AS cap,
        |  CAST(sum(n_tokens * 2) OVER (ORDER BY n_tokens, source
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
        |  CAST(row_number() OVER (ORDER BY n_tokens, source) AS BIGINT) AS rn,
        |  CAST(count(*) OVER () AS BIGINT) AS n FROM t),
        |c AS (SELECT w.*, b.budget,
        |  (b.budget - w.cum) >= w.cap * (w.n - w.rn) AS capped
        |  FROM w CROSS JOIN b),
        |a AS (SELECT *,
        |  CAST(coalesce(sum(CASE WHEN capped THEN cap END) OVER (), 0) AS BIGINT) AS ccap,
        |  CAST(count(CASE WHEN capped THEN 1 END) OVER () AS BIGINT) AS nc
        |  FROM c),
        |f AS (SELECT source, n_tokens, cap,
        |  CASE WHEN capped THEN CAST(cap AS DOUBLE)
        |       ELSE CAST(budget - ccap AS DOUBLE) / CAST(n - nc AS DOUBLE)
        |  END AS alloc FROM a),
        |g AS (SELECT source, n_tokens, cap, alloc,
        |  alloc / CAST(n_tokens AS DOUBLE) AS epochs FROM f)
        |SELECT source, n_tokens, cap, round(alloc, 4) AS alloc,
        |  round(epochs, 4) AS epochs,
        |  CAST(floor(epochs) AS BIGINT) AS full_epochs,
        |  round(epochs - floor(epochs), 4) AS last_rate
        |FROM g ORDER BY source""".stripMargin,
    // C4 line/page rules over the same injected page; rtrim strips
    // spaces only in both engines, md5 proves the rebuilt clean text
    // byte-for-byte
    "d46_c4_rules" ->
      """WITH inj AS (SELECT doc_id, text || '.' || chr(10) || 'short line here'
        |  || chr(10) || 'it has exactly five words.'
        |  || chr(10) || 'four word question line?'
        |  || CASE WHEN doc_id % 7 = 0 THEN chr(10) || 'and one more closing sentence appears here.' ELSE '' END
        |  || CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'Lorem Ipsum dolor sit amet.' ELSE '' END
        |  || CASE WHEN doc_id % 13 = 0 THEN chr(10) || 'var x = { 1 };' ELSE '' END AS page
        |  FROM documents),
        |l AS (SELECT doc_id, page, regexp_split_to_array(page, '\n') AS lines FROM inj),
        |k AS (SELECT doc_id, page, lines,
        |  list_filter(lines, x -> regexp_matches(x, '[.!?"][ \t\r]*$')
        |    AND len(list_filter(regexp_split_to_array(x, '[ \t\n\x0B\f\r]+'), w -> w <> '')) >= 5) AS kept
        |  FROM l),
        |c AS (SELECT doc_id, len(lines) AS n_lines, len(kept) AS n_kept_lines,
        |  array_to_string(kept, chr(10)) AS clean,
        |  contains(lower(page), 'lorem ipsum') AS has_lorem,
        |  contains(page, '{') AS has_brace FROM k),
        |f AS (SELECT *, length(clean) - length(regexp_replace(clean, '[.!?]', '', 'g')) AS n_sentences FROM c)
        |SELECT doc_id, n_lines, n_kept_lines, md5(clean) AS clean_md5,
        |  n_sentences, has_lorem, has_brace,
        |  COALESCE(NOT has_lorem AND NOT has_brace AND n_sentences >= 3, FALSE) AS keep
        |FROM f ORDER BY doc_id""".stripMargin,
    // Composed pipeline: the d47 markdown chain (smaller fixture) into
    // the d44 rule battery at minWords=40/stops={the,a}, then survivor
    // stats — every intermediate replayed verbatim
    "d48_curation_pipeline" ->
      """WITH RECURSIVE inj AS (SELECT doc_id, lang,
        |  '# Title ' || doc_id || chr(10)
        |  || '**Bold** and *em* text with `code span` here.' || chr(10)
        |  || '[link text](https://example.com/' || doc_id || ')' || chr(10)
        |  || '```' || chr(10) || 'var code = ' || doc_id || ';' || chr(10)
        |  || '```' || chr(10) || text AS md FROM documents),
        |c1 AS (SELECT doc_id, lang, regexp_replace(regexp_replace(regexp_replace(md,
        |  '[\x{E001}-\x{E00C}]', '', 'g'),
        |  '(?s)(?m)^[ \t]{0,3}```.*?^[ \t]{0,3}```[ \t]*\r?$', ' ', 'g'),
        |  '(?s)(?m)^[ \t]{0,3}~~~.*?^[ \t]{0,3}~~~[ \t]*\r?$', ' ', 'g') AS md FROM inj),
        |seg AS (SELECT doc_id, lang, string_split(md, chr(96)) AS segs FROM c1),
        |scan AS (
        |  SELECT doc_id, lang, segs, 1 AS i, segs[1] AS acc,
        |    false AS open, '' AS cand FROM seg
        |  UNION ALL
        |  SELECT doc_id, lang, segs, i + 1,
        |    CASE WHEN NOT open THEN acc
        |         WHEN contains(cand, chr(10)) THEN acc || chr(96) || cand
        |         ELSE acc || replace(replace(replace(replace(replace(replace(
        |           replace(replace(replace(replace(replace(replace(cand,
        |           '[', chr(57345)), ']', chr(57346)), '(', chr(57347)),
        |           ')', chr(57348)), '*', chr(57349)), '~', chr(57350)),
        |           '#', chr(57351)), '>', chr(57352)), '-', chr(57353)),
        |           '+', chr(57354)), '=', chr(57355)), '.', chr(57356))
        |           || segs[i + 1] END,
        |    CASE WHEN open AND NOT contains(cand, chr(10))
        |         THEN false ELSE true END,
        |    CASE WHEN open AND NOT contains(cand, chr(10))
        |         THEN '' ELSE segs[i + 1] END
        |  FROM scan WHERE i < len(segs)),
        |c2 AS (SELECT doc_id, lang,
        |  CASE WHEN open THEN acc || chr(96) || cand ELSE acc END AS md
        |  FROM scan WHERE i = len(segs)),
        |c3 AS (SELECT doc_id, lang, regexp_replace(regexp_replace(md,
        |  '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
        |  '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS md FROM c2),
        |c4 AS (SELECT doc_id, lang, regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(md,
        |  '(?m)^[ \t]{0,3}#{1,6}[ \t]+', '', 'g'),
        |  '(?m)^[ \t]{0,3}=+[ \t]*\r?$', ' ', 'g'),
        |  '(?m)^[ \t]{0,3}>[ \t]?', '', 'g'),
        |  '(?m)^[ \t]{0,3}([-*_][ \t]*){3,}\r?$', ' ', 'g') AS md FROM c3),
        |c5 AS (SELECT doc_id, lang, regexp_replace(regexp_replace(regexp_replace(md,
        |  '(?m)^[ \t]*([-*+]|[0-9]+[.)])[ \t]+', '', 'g'),
        |  '\*{1,3}([^*\n]+)\*{1,3}', '\1', 'g'),
        |  '~~([^~\n]+)~~', '\1', 'g') AS md FROM c4),
        |tx0 AS (SELECT doc_id, lang, trim(regexp_replace(md,
        |  '[ \t\n\x0B\f\r]+', ' ', 'g')) AS c0 FROM c5),
        |tx AS (SELECT doc_id, lang, replace(replace(replace(replace(replace(replace(
        |  replace(replace(replace(replace(replace(replace(c0,
        |  chr(57345), '['), chr(57346), ']'), chr(57347), '('),
        |  chr(57348), ')'), chr(57349), '*'), chr(57350), '~'),
        |  chr(57351), '#'), chr(57352), '>'), chr(57353), '-'),
        |  chr(57354), '+'), chr(57355), '='), chr(57356), '.') AS text FROM tx0),
        |w AS (SELECT doc_id, lang, text,
        |  list_filter(regexp_split_to_array(text, '[ \t\n\x0B\f\r]+'), x -> x <> '') AS ws,
        |  regexp_split_to_array(text, '\n') AS lines,
        |  regexp_extract_all(lower(text), '[a-z0-9]+') AS lw FROM tx),
        |f AS (SELECT doc_id, lang, lw, len(ws) AS n_words,
        |  CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) AS char_sum,
        |  length(text) - length(replace(text, '#', '')) AS n_hash,
        |  (length(text) - length(regexp_replace(text, '\.\.\.', '', 'g'))) // 3
        |    + (length(text) - length(replace(text, '…', ''))) AS n_ellipsis,
        |  len(lines) AS n_lines,
        |  len(list_filter(lines, l -> regexp_matches(l, '^[ \t]*[-*•]'))) AS n_bullet,
        |  len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)[ \t\r]*$'))) AS n_ell_end,
        |  len(list_filter(ws, x -> regexp_matches(x, '[A-Za-z]'))) AS n_alpha,
        |  CASE WHEN list_contains(lw, 'the') THEN 1 ELSE 0 END
        |  + CASE WHEN list_contains(lw, 'a') THEN 1 ELSE 0 END AS n_stop
        | FROM w),
        |g AS (SELECT doc_id, lang, len(lw) AS nw,
        |  ((n_words >= 40 AND n_words <= 100000)
        |  AND coalesce(char_sum / CAST(n_words AS DOUBLE) >= 3.0
        |    AND char_sum / CAST(n_words AS DOUBLE) <= 10.0, false)
        |  AND coalesce(CAST(n_hash AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1
        |    AND CAST(n_ellipsis AS DOUBLE) / CAST(n_words AS DOUBLE) <= 0.1, false)
        |  AND CAST(n_bullet AS DOUBLE) / CAST(n_lines AS DOUBLE) < 0.9
        |  AND CAST(n_ell_end AS DOUBLE) / CAST(n_lines AS DOUBLE) < 0.3
        |  AND coalesce(CAST(n_alpha AS DOUBLE) / CAST(n_words AS DOUBLE) >= 0.8, false)
        |  AND n_stop >= 2) AS keep FROM f)
        |SELECT lang, count(CASE WHEN keep THEN 1 END) AS n_docs,
        |  round(avg(CASE WHEN keep THEN nw END), 4) AS avg_words
        |FROM g GROUP BY lang
        |HAVING count(CASE WHEN keep THEN 1 END) > 0
        |ORDER BY lang""".stripMargin,
    // The same injected markdown page run through the strip chain
    // verbatim (DuckDB replacement groups are \1 where Spark writes
    // $1; the 'g' flag is mandatory — DuckDB replaces first-match-only
    // by default)
    // The protect stage (r16: code-span content survives verbatim) is
    // replayed as a LINEAR recursive CTE over the backtick segments —
    // the d59 oracle pattern: same fold, same java-regex scan
    // semantics, in-span markers escaped to chr(57345)..chr(57356)
    // (U+E001..U+E00C) and swapped back after the whitespace collapse.
    "d47_markdown_extract" ->
      """WITH RECURSIVE inj AS (SELECT doc_id,
        |  '# Title ' || doc_id || chr(10)
        |  || '**Bold** and *em* text with `code span` here.' || chr(10)
        |  || '> quoted wisdom line' || chr(10) || '- item one' || chr(10)
        |  || '2. item two' || chr(10)
        |  || '[link text](https://example.com/' || doc_id
        |  || ') and ![alt text](img.png)' || chr(10) || '```' || chr(10)
        |  || 'var code = ' || doc_id || ';' || chr(10) || '```' || chr(10)
        |  || '---' || chr(10) || text AS md FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(md,
        |  '[\x{E001}-\x{E00C}]', '', 'g'),
        |  '(?s)(?m)^[ \t]{0,3}```.*?^[ \t]{0,3}```[ \t]*\r?$', ' ', 'g'),
        |  '(?s)(?m)^[ \t]{0,3}~~~.*?^[ \t]{0,3}~~~[ \t]*\r?$', ' ', 'g') AS md FROM inj),
        |seg AS (SELECT doc_id, string_split(md, chr(96)) AS segs FROM c1),
        |scan AS (
        |  SELECT doc_id, segs, 1 AS i, segs[1] AS acc,
        |    false AS open, '' AS cand FROM seg
        |  UNION ALL
        |  SELECT doc_id, segs, i + 1,
        |    CASE WHEN NOT open THEN acc
        |         WHEN contains(cand, chr(10)) THEN acc || chr(96) || cand
        |         ELSE acc || replace(replace(replace(replace(replace(replace(
        |           replace(replace(replace(replace(replace(replace(cand,
        |           '[', chr(57345)), ']', chr(57346)), '(', chr(57347)),
        |           ')', chr(57348)), '*', chr(57349)), '~', chr(57350)),
        |           '#', chr(57351)), '>', chr(57352)), '-', chr(57353)),
        |           '+', chr(57354)), '=', chr(57355)), '.', chr(57356))
        |           || segs[i + 1] END,
        |    CASE WHEN open AND NOT contains(cand, chr(10))
        |         THEN false ELSE true END,
        |    CASE WHEN open AND NOT contains(cand, chr(10))
        |         THEN '' ELSE segs[i + 1] END
        |  FROM scan WHERE i < len(segs)),
        |c2 AS (SELECT doc_id,
        |  CASE WHEN open THEN acc || chr(96) || cand ELSE acc END AS md
        |  FROM scan WHERE i = len(segs)),
        |c3 AS (SELECT doc_id, regexp_replace(regexp_replace(md,
        |  '!\[([^\]]*)\]\(([^)]*)\)', '\1', 'g'),
        |  '\[([^\]]*)\]\(([^)]*)\)', '\1', 'g') AS md FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(regexp_replace(
        |  regexp_replace(regexp_replace(md,
        |  '(?m)^[ \t]{0,3}#{1,6}[ \t]+', '', 'g'),
        |  '(?m)^[ \t]{0,3}=+[ \t]*\r?$', ' ', 'g'),
        |  '(?m)^[ \t]{0,3}>[ \t]?', '', 'g'),
        |  '(?m)^[ \t]{0,3}([-*_][ \t]*){3,}\r?$', ' ', 'g') AS md FROM c3),
        |c5 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(md,
        |  '(?m)^[ \t]*([-*+]|[0-9]+[.)])[ \t]+', '', 'g'),
        |  '\*{1,3}([^*\n]+)\*{1,3}', '\1', 'g'),
        |  '~~([^~\n]+)~~', '\1', 'g') AS md FROM c4),
        |c6 AS (SELECT doc_id, trim(regexp_replace(md,
        |  '[ \t\n\x0B\f\r]+', ' ', 'g')) AS c0 FROM c5),
        |c7 AS (SELECT doc_id, replace(replace(replace(replace(replace(replace(
        |  replace(replace(replace(replace(replace(replace(c0,
        |  chr(57345), '['), chr(57346), ']'), chr(57347), '('),
        |  chr(57348), ')'), chr(57349), '*'), chr(57350), '~'),
        |  chr(57351), '#'), chr(57352), '>'), chr(57353), '-'),
        |  chr(57354), '+'), chr(57355), '='), chr(57356), '.') AS clean FROM c6)
        |SELECT doc_id, length(clean) AS n_chars, md5(clean) AS clean_md5
        |FROM c7 ORDER BY doc_id""".stripMargin,
    "d39_url_dedup" ->
      """WITH inj AS (SELECT doc_id,
        |  'HTTPS://Site' || (doc_id % 7) || '.Example.org:443/p/' || (doc_id % 20)
        |  || '?utm_source=x'
        |  || CASE WHEN doc_id % 2 = 0 THEN '&fbclid=abc' ELSE '' END
        |  || CASE WHEN doc_id % 3 = 0 THEN '&id=9' ELSE '' END
        |  || '#s' || doc_id AS url FROM documents),
        |c1 AS (SELECT doc_id, regexp_replace(url, '#.*', '', 'g') AS u FROM inj),
        |c2 AS (SELECT doc_id,
        |  lower(regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0))
        |  || regexp_replace(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', '') AS u FROM c1),
        |c3 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(u,
        |    '^(https://[^/:?#]*):443([/?#])', '\1\2'),
        |    '^(http://[^/:?#]*):80([/?#])', '\1\2'),
        |    '^(https://[^/:?#]*):443$', '\1'),
        |    '^(http://[^/:?#]*):80$', '\1') AS u FROM c2),
        |c4 AS (SELECT doc_id, regexp_replace(u,
        |  '([?&])(utm_[A-Za-z0-9_]*|fbclid|gclid)=[^&#]*', '\1', 'g') AS u FROM c3),
        |c5 AS (SELECT doc_id,
        |  regexp_replace(regexp_replace(regexp_replace(u,
        |    '\?&+', '?', 'g'), '&&+', '&', 'g'), '[?&]+$', '') AS u FROM c4),
        |c6 AS (SELECT doc_id, regexp_replace(regexp_replace(u,
        |  '([^/])/\?', '\1?'), '([^/])/$', '\1') AS curl FROM c5)
        |SELECT curl, min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM c6 GROUP BY curl ORDER BY keep_id""".stripMargin,
    // Same injected page; the regex chain is the java.regex ∩ RE2
    // intersection run verbatim (DuckDB needs the 'g' flag — its
    // regexp_replace replaces only the first match by default).
    "d32_html_extract" -> d32OracleSql,
    // WARC round-trip is byte-lossless by contract, so its oracle IS
    // d32's query — the framing cancels out of the compare entirely
    "d50_warc_extract" -> d32OracleSql,
    // Hashed uni+bigram features (md5-60bit % 10000), add-one-smoothed
    // target (lang='en') vs raw histograms; each feature's log ratio is
    // ln of one exact-int64 division, mean rounded 4dp.
    "d30_dsir_scores" ->
      """WITH t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |f0 AS (SELECT doc_id, lang, list_concat(ws,
        |   CASE WHEN len(ws) >= 2
        |        THEN list_transform(range(1, len(ws)), i -> ws[i] || ' ' || ws[i+1])
        |        ELSE [] END) AS fs
        | FROM t),
        |f AS (SELECT doc_id, lang,
        |   ('0x' || substr(md5(unnest(fs)), 1, 15))::UBIGINT % 10000 AS b
        | FROM f0),
        |rh AS (SELECT b, count(*) AS rc FROM f GROUP BY b),
        |th AS (SELECT b, count(*) AS tc FROM f WHERE lang = 'en' GROUP BY b),
        |nrt AS (SELECT count(*) AS nr, count(*) FILTER (lang = 'en') AS nt FROM f),
        |sc AS (SELECT doc_id,
        |   ln((CAST(coalesce(tc, 0) + 1 AS DOUBLE) * CAST(nr + 10000 AS DOUBLE))
        |      / (CAST(rc + 1 AS DOUBLE) * CAST(nt + 10000 AS DOUBLE))) AS lr
        | FROM f JOIN rh USING (b) LEFT JOIN th USING (b) CROSS JOIN nrt)
        |SELECT doc_id, count(*) AS n_feats, round(avg(lr), 4) AS dsir_score
        |FROM sc GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "d25_url_filter" ->
      """WITH inj AS (SELECT doc_id, text
        |  || ' see https://site' || (doc_id % 7) || '.example.org/p/' || doc_id
        |  || CASE WHEN doc_id % 3 = 0
        |     THEN ' and http://cdn' || (doc_id % 4) || '.example.net/x' ELSE '' END AS text
        | FROM documents),
        |u AS (SELECT doc_id,
        |  regexp_extract_all(text, 'https?://[A-Za-z0-9.-]*[A-Za-z0-9](?:/[A-Za-z0-9./_-]*[A-Za-z0-9_/-]|/)?') AS urls
        | FROM inj),
        |d AS (SELECT doc_id, len(urls) AS n_urls,
        |  list_distinct(list_transform(urls,
        |    x -> regexp_extract(x, 'https?://([A-Za-z0-9.-]*[A-Za-z0-9])', 1))) AS ds
        | FROM u)
        |SELECT doc_id, CAST(n_urls AS INT) AS n_urls,
        | CAST(len(ds) AS INT) AS n_domains,
        | CAST(CASE WHEN len(list_intersect(ds,
        |   ['site2.example.org', 'site5.example.org', 'cdn1.example.net'])) > 0
        |   THEN 1 ELSE 0 END AS INT) AS blocked
        |FROM d ORDER BY doc_id""".stripMargin,
    "d24_corpus_stats" ->
      """WITH t AS (SELECT lang, source,
        |  len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words
        | FROM documents)
        |SELECT lang, count(*) AS n_docs,
        | count(DISTINCT source) AS n_sources,
        | CAST(sum(n_words) AS BIGINT) AS total_words,
        | round(avg(n_words), 4) AS avg_words,
        | round(quantile_cont(n_words, 0.5), 4) AS p50_words,
        | round(quantile_cont(n_words, 0.9), 4) AS p90_words
        |FROM t GROUP BY lang ORDER BY lang""".stripMargin,
    "p01_pack_chunks" ->
      """WITH t AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS INT) AS n_words
        | FROM documents),
        |c AS (SELECT doc_id, source, n_words,
        |  sum(n_words) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS e FROM t)
        |SELECT doc_id, source, n_words,
        | CAST(e - n_words AS BIGINT) AS token_offset,
        | CAST((e - n_words) // 256 AS BIGINT) AS chunk_first,
        | CAST(CASE WHEN n_words = 0 THEN 0
        |      ELSE (e - 1) // 256 - (e - n_words) // 256 + 1 END AS BIGINT) AS n_chunks
        |FROM c ORDER BY doc_id""".stripMargin,
    // Row-by-row first-fit recursion: the recursive CTE steps each
    // source's docs in id order carrying (bin, fill) — genuinely
    // sequential semantics, so it cross-checks the secondary-sort
    // streaming pass rather than re-deriving it the same way.
    "p02_pack_greedy" ->
      """WITH RECURSIVE t AS (SELECT doc_id, source,
        |  CAST(len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS BIGINT) AS n,
        |  row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        | FROM documents),
        |step(source, rn, doc_id, n, bin, used) AS (
        |  SELECT source, rn, doc_id, n, CAST(0 AS BIGINT), n FROM t WHERE rn = 1
        |  UNION ALL
        |  SELECT t.source, t.rn, t.doc_id, t.n,
        |    CASE WHEN s.used > 0 AND s.used + t.n > 120 THEN s.bin + 1 ELSE s.bin END,
        |    CASE WHEN s.used > 0 AND s.used + t.n > 120 THEN t.n ELSE s.used + t.n END
        |  FROM step s JOIN t ON t.source = s.source AND t.rn = s.rn + 1)
        |SELECT doc_id, source, n AS n_tokens, bin AS bin_id
        |FROM step ORDER BY doc_id""".stripMargin,
    "p03_chunk_overlap" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |k AS (SELECT doc_id, ws,
        |  greatest(CAST(ceil((len(ws) - 8) / 24.0) AS INT), 1) AS nch FROM w),
        |c AS (SELECT doc_id, unnest(range(0, nch)) AS chunk_id,
        |  unnest(list_transform(range(0, nch), i -> ws[i*24+1 : i*24+32])) AS toks
        | FROM k)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        | CAST(len(toks) AS INT) AS n_tokens,
        | md5(array_to_string(toks, ' ')) AS chunk_fp
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    // d33's n_bpe CTE (the ·-delimited replace chain) feeding p01's
    // window algebra: real tokenizer counts into the chunk planner.
    "p04_tokenize_pack" ->
      """WITH t AS (SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |e AS (SELECT doc_id, lang, list_transform(ws, w ->
        |   replace(replace(replace(replace(replace(replace(replace(replace(
        |     '·' || array_to_string(list_transform(range(1, len(w) + 1), i -> w[i]), '··') || '·',
        |     '·t··h·', '·th·'), '·th··e·', '·the·'), '·i··n·', '·in·'), '·a··n·', '·an·'),
        |     '·an··d·', '·and·'), '·e··r·', '·er·'), '·o··n·', '·on·'), '·r··e·', '·re·')) AS enc
        | FROM t),
        |r AS (SELECT doc_id, lang,
        |   CAST(coalesce(list_sum(list_transform(enc, s -> len(str_split(trim(s, '·'), '··')))), 0) AS INTEGER) AS n_bpe
        | FROM e),
        |c AS (SELECT doc_id, lang, n_bpe,
        |  sum(n_bpe) OVER (PARTITION BY lang ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS e2 FROM r)
        |SELECT doc_id, lang, n_bpe,
        | CAST(e2 - n_bpe AS BIGINT) AS token_offset,
        | CAST((e2 - n_bpe) // 512 AS BIGINT) AS chunk_first,
        | CAST(CASE WHEN n_bpe = 0 THEN 0
        |      ELSE (e2 - 1) // 512 - (e2 - n_bpe) // 512 + 1 END AS BIGINT) AS n_chunks
        |FROM c ORDER BY doc_id""".stripMargin,
    "q24_range_join" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, ts AS start_ts,
        |  ts + INTERVAL 2 HOUR AS end_ts FROM events WHERE event_type = 'purchase'),
        |v AS (SELECT user_id, ts AS v_ts, value AS v_value FROM events
        |      WHERE event_type = 'view')
        |SELECT p.p_id, count(v.v_ts) AS n_views,
        | coalesce(round(sum(v.v_value), 4), 0.0) AS sum_view_value
        |FROM p LEFT JOIN v ON v.user_id = p.user_id
        |  AND v.v_ts >= p.start_ts AND v.v_ts < p.end_ts
        |GROUP BY p.p_id ORDER BY p_id""".stripMargin,
    "d20_decontaminate" ->
      """WITH w AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |sh AS (SELECT doc_id,
        |  list_distinct(list_transform(range(1, greatest(len(ws) - 1, 1)),
        |    i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS s
        |  FROM w WHERE len(ws) >= 3),
        |b AS (SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id >= 480),
        |d AS (SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id < 480)
        |SELECT d.doc_id, count(*) AS n_hits
        |FROM d JOIN b USING (g)
        |GROUP BY d.doc_id HAVING count(*) >= 1
        |ORDER BY doc_id""".stripMargin,
    "q20_asof_join" ->
      """SELECT p.event_id, p.user_id,
        | epoch_us(p.ts) AS ts_us, epoch_us(v.ts) AS view_ts_us,
        | v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts >= v.ts
        |ORDER BY p.event_id""".stripMargin,
    "q23_asof_forward" ->
      """SELECT p.event_id, p.user_id,
        | epoch_us(p.ts) AS ts_us, epoch_us(v.ts) AS view_ts_us,
        | v.value AS view_value
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'view') v
        |  ON p.user_id = v.user_id AND p.ts <= v.ts
        |WHERE epoch_us(v.ts) - epoch_us(p.ts) <= 7200000000
        |ORDER BY p.event_id""".stripMargin,
    "q21_sessionize" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS tus FROM events),
        |x AS (SELECT user_id, tus,
        |  CASE WHEN lag(tus) OVER (PARTITION BY user_id ORDER BY tus) IS NULL
        |        OR tus - lag(tus) OVER (PARTITION BY user_id ORDER BY tus) > 3600000000
        |       THEN 1 ELSE 0 END AS nw
        | FROM e),
        |s AS (SELECT user_id, tus,
        |  CAST(sum(nw) OVER (PARTITION BY user_id ORDER BY tus
        |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id FROM x)
        |SELECT user_id, session_id, count(*) AS n_events,
        | min(tus) AS start_us, max(tus) AS end_us
        |FROM s GROUP BY user_id, session_id
        |ORDER BY user_id, session_id""".stripMargin,
    "q22_window_agg" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_us, event_type,
        | count(*) AS n, round(sum(value), 4) AS sum_value
        |FROM events WHERE ts IS NOT NULL
        |GROUP BY 1, 2 ORDER BY window_us, event_type""".stripMargin,
    "d10_pipeline_compose" ->
      """WITH f AS (SELECT doc_id, text,
        |  regexp_extract_all(lower(text), '[a-z0-9]+') AS ws FROM documents),
        |q AS (SELECT doc_id, text, ws, len(ws) AS n_words,
        |  CASE WHEN len(ws) > 0 THEN CAST(len(list_filter(ws, w -> list_contains(['the','a','and','of','to','in','is','it','for','on'], w))) AS DOUBLE) / len(ws) ELSE 0.0 END AS stopword_ratio
        |  FROM f),
        |langed AS (SELECT doc_id, text, n_words, CASE
        |  WHEN len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))) > 0
        |   AND len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))) >= greatest(
        |     len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))),
        |     len(list_filter(ws, x -> list_contains(['der','die','und','das','ein','nicht'], x))),
        |     len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une'], x))),
        |     len(list_filter(ws, x -> list_contains(['el','los','las','y','una','que'], x)))) THEN 'en'
        |  WHEN len(list_filter(ws, x -> list_contains(['der','die','und','das','ein','nicht'], x))) > 0
        |   AND len(list_filter(ws, x -> list_contains(['der','die','und','das','ein','nicht'], x))) >= greatest(
        |     len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))),
        |     len(list_filter(ws, x -> list_contains(['der','die','und','das','ein','nicht'], x))),
        |     len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une'], x))),
        |     len(list_filter(ws, x -> list_contains(['el','los','las','y','una','que'], x)))) THEN 'de'
        |  WHEN len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une'], x))) > 0
        |   AND len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une'], x))) >= greatest(
        |     len(list_filter(ws, x -> list_contains(['the','a','and','of','to','in','is'], x))),
        |     len(list_filter(ws, x -> list_contains(['der','die','und','das','ein','nicht'], x))),
        |     len(list_filter(ws, x -> list_contains(['le','la','les','et','des','une'], x))),
        |     len(list_filter(ws, x -> list_contains(['el','los','las','y','una','que'], x)))) THEN 'fr'
        |  WHEN len(list_filter(ws, x -> list_contains(['el','los','las','y','una','que'], x))) > 0 THEN 'es'
        |  ELSE 'und' END AS lang
        |  FROM q WHERE n_words >= 20 AND stopword_ratio >= 0.02),
        |deduped AS (SELECT md5(trim(regexp_replace(lower(text), '[ \t\n\x0B\f\r]+', ' ', 'g'))) AS fp,
        |  min(doc_id) AS keep_id, min(lang) AS lang, min(n_words) AS n_words
        |  FROM langed WHERE lang IN ('en','de','fr','es') GROUP BY 1)
        |SELECT lang, count(*) AS n_docs, round(avg(n_words), 4) AS avg_words
        |FROM deduped GROUP BY lang ORDER BY lang""".stripMargin,
    "m01_multimodal" ->
      """SELECT doc_id,
        | CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
        | substring(hex(encode(text)), 1, 16) AS magic,
        | CAST(floor((greatest(CAST(ceil(octet_length(encode(text)) / 256.0) AS BIGINT), 1) - 1) / 2) + 1 AS BIGINT) AS n_chunks_sampled
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m02_mime_sniff" ->
      """WITH p AS (SELECT doc_id,
        |  CASE WHEN doc_id % 4 = 0 THEN from_hex('FFD8')
        |       WHEN doc_id % 4 = 1 THEN from_hex('89504E47')
        |       WHEN doc_id % 4 = 2 THEN from_hex('494433')
        |       ELSE from_hex('') END || encode(text) AS payload
        | FROM documents),
        |m AS (SELECT doc_id, hex(payload) AS h FROM p),
        |c AS (SELECT doc_id, CASE
        |  WHEN substr(h, 1, 4) = 'FFD8' THEN 'image/jpeg'
        |  WHEN substr(h, 1, 8) = '89504E47' THEN 'image/png'
        |  WHEN substr(h, 1, 6) = '494433' THEN 'audio/mpeg'
        |  WHEN substr(h, 1, 8) = '1A45DFA3' THEN 'video/webm'
        |  ELSE 'application/octet-stream' END AS mime
        | FROM m)
        |SELECT mime, count(*) AS n, min(doc_id) AS first_doc
        |FROM c GROUP BY mime ORDER BY mime""".stripMargin,
    "m03_byte_simhash" ->
      """WITH h AS (SELECT doc_id,
        |  regexp_extract_all(hex(encode(text)), '[0-9A-F]{8}') AS ws FROM documents),
        |hh AS (SELECT doc_id,
        |  list_transform(ws, w -> ('0x' || substr(md5(w), 1, 16))::UBIGINT) AS hs FROM h)
        |SELECT doc_id,
        | list_aggregate(list_transform(range(0, 64), b ->
        |   CASE WHEN 2 * len(list_filter(hs, x -> (x >> (63 - b)) & 1 = 1)) > len(hs)
        |        THEN '1' ELSE '0' END), 'string_agg', '') AS sig
        |FROM hh ORDER BY doc_id""".stripMargin,
    "e01_knn_brute" ->
      """WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
        |q AS (SELECT id AS qid, vec AS qvec FROM v WHERE id < 10),
        |sims AS (SELECT qid, id,
        |  list_sum(list_transform(range(1, len(vec) + 1), i -> vec[i] * qvec[i]))
        |   / (sqrt(list_sum(list_transform(vec, x -> x * x)))
        |      * sqrt(list_sum(list_transform(qvec, x -> x * x)))) AS sim
        |  FROM v CROSS JOIN q WHERE id <> qid),
        |ranked AS (SELECT qid, id, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM sims)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // Matryoshka funnel: 16-d slice cosine shortlist (raw slices —
    // cosine is scale-invariant), unit-vector dot rerank at 64-d;
    // zero-norm guards mirror the engine's NULL-cosine convention
    "e14_knn_matryoshka" ->
      """WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
        |q AS (SELECT id AS qid, vec AS qvec FROM v WHERE id < 10),
        |tv AS (SELECT id, vec[1:16] AS t FROM v),
        |tq AS (SELECT qid, qvec[1:16] AS tq FROM q),
        |s1 AS (SELECT qid, id,
        |  list_sum(list_transform(range(1, len(t) + 1), i -> t[i] * tq[i]))
        |   / (sqrt(list_sum(list_transform(t, x -> x * x)))
        |      * sqrt(list_sum(list_transform(tq, x -> x * x)))) AS sim
        |  FROM tv CROSS JOIN tq WHERE id <> qid
        |    AND list_sum(list_transform(t, x -> x * x)) > 0
        |    AND list_sum(list_transform(tq, x -> x * x)) > 0),
        |short AS (SELECT qid, id FROM (SELECT qid, id,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rk FROM s1)
        |  WHERE rk <= 30),
        |u AS (SELECT id, list_transform(vec,
        |    x -> x / sqrt(list_sum(list_transform(vec, y -> y * y)))) AS uv FROM v
        |  WHERE list_sum(list_transform(vec, y -> y * y)) > 0),
        |uq AS (SELECT qid, list_transform(qvec,
        |    x -> x / sqrt(list_sum(list_transform(qvec, y -> y * y)))) AS uqv FROM q
        |  WHERE list_sum(list_transform(qvec, y -> y * y)) > 0),
        |rr AS (SELECT s.qid, s.id,
        |  list_sum(list_transform(range(1, len(uv) + 1), i -> uv[i] * uqv[i])) AS sim
        |  FROM short s JOIN u ON s.id = u.id JOIN uq ON s.qid = uq.qid),
        |ranked AS (SELECT qid, id, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM rr)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // BQ funnel: strict x > 0 sign bits, hamming = count of differing
    // signs (ties to the smaller id), e14's unit-dot rerank verbatim.
    // e21 (sharded index over build + exact appends covering the SAME
    // corpus) shares it verbatim — the e18 sharing pattern
    "e20_knn_bq" -> e20OracleSql,
    "e21_knn_bq_sharded" -> e20OracleSql,
    "e03_cosine_near_dup" ->
      """WITH v AS (SELECT vec_id AS id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS vec FROM embeddings),
        |n AS (SELECT id, vec, sqrt(list_sum(list_transform(vec, x -> x * x))) AS nrm FROM v)
        |SELECT a.id AS id_a, b.id AS id_b,
        | round(list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
        |   / (a.nrm * b.nrm), 4) AS sim
        |FROM n a JOIN n b ON a.id < b.id
        |WHERE round(list_sum(list_transform(range(1, len(a.vec) + 1), i -> a.vec[i] * b.vec[i]))
        |   / (a.nrm * b.nrm), 4) >= 0.4
        |ORDER BY id_a, id_b""".stripMargin,
    "e04_pq_codes" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |seeds AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, v
        |  FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, v FROM e
        |        ORDER BY h, vec_id LIMIT 16)),
        |ms AS (SELECT unnest(range(0, 8)) AS mm),
        |sub AS (SELECT e.vec_id, s.j, ms.mm,
        |  list_reduce(list_transform(range(1, 9), i ->
        |    (e.v[ms.mm * 8 + i] - s.v[ms.mm * 8 + i]) * (e.v[ms.mm * 8 + i] - s.v[ms.mm * 8 + i])),
        |    (a, b) -> a + b) AS dist
        | FROM e CROSS JOIN seeds s CROSS JOIN ms),
        |r AS (SELECT vec_id, mm, j,
        |  row_number() OVER (PARTITION BY vec_id, mm ORDER BY dist, j) AS rk FROM sub)
        |SELECT vec_id, CAST(mm AS INTEGER) AS m, CAST(j AS INTEGER) AS code
        |FROM r WHERE rk = 1 ORDER BY vec_id, m""".stripMargin,
    // e04's seeds-only PQ encode, applied to md5-signed-permutation
    // ROTATED vectors: perm = dims in md5-hex order, sign(j) = -1 when
    // md5('s'||j) starts 0-7 — re-derived here from the same rule, so
    // the rotation needs no side channel. ±1 multiplies are IEEE-exact.
    "e08_pq_rotated" ->
      """WITH pm AS (SELECT list(i ORDER BY md5(CAST(i AS VARCHAR)), i) AS perm
        |  FROM range(0, 64) t(i)),
        |sg AS (SELECT list(CASE WHEN substr(md5('s' || CAST(i AS VARCHAR)), 1, 1) <= '7'
        |    THEN -1.0 ELSE 1.0 END ORDER BY i) AS signs FROM range(0, 64) t(i)),
        |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
        |r AS (SELECT vec_id,
        |  list_transform(range(1, 65), j -> e.v0[pm.perm[j] + 1] * sg.signs[j]) AS v
        | FROM e, pm, sg),
        |seeds AS (SELECT row_number() OVER (ORDER BY h, vec_id) - 1 AS j, v
        |  FROM (SELECT md5(CAST(vec_id AS VARCHAR)) AS h, vec_id, v FROM r
        |        ORDER BY h, vec_id LIMIT 16)),
        |ms AS (SELECT unnest(range(0, 8)) AS mm),
        |sub AS (SELECT r.vec_id, s.j, ms.mm,
        |  list_reduce(list_transform(range(1, 9), i ->
        |    (r.v[ms.mm * 8 + i] - s.v[ms.mm * 8 + i]) * (r.v[ms.mm * 8 + i] - s.v[ms.mm * 8 + i])),
        |    (a, b) -> a + b) AS dist
        | FROM r CROSS JOIN seeds s CROSS JOIN ms),
        |rk AS (SELECT vec_id, mm, j,
        |  row_number() OVER (PARTITION BY vec_id, mm ORDER BY dist, j) AS rk FROM sub)
        |SELECT vec_id, CAST(mm AS INTEGER) AS m, CAST(j AS INTEGER) AS code
        |FROM rk WHERE rk = 1 ORDER BY vec_id, m""".stripMargin,
    // SQ8: per-dim min/max are exact aggregates; code = floor((x-mn)/
    // (mx-mn)*255 + 0.5) clamped — the Sq.SqEncodeExpr formula verbatim
    "e11_sq_codes" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dims AS (SELECT unnest(range(0, 64)) AS d),
        |st AS (SELECT d, min(v[d + 1]) AS mn, max(v[d + 1]) AS mx
        |       FROM e CROSS JOIN dims GROUP BY d)
        |SELECT e.vec_id, CAST(st.d AS INTEGER) AS d,
        | CAST(CASE WHEN st.mx = st.mn THEN 0
        |      ELSE least(255.0, greatest(0.0,
        |        floor((e.v[st.d + 1] - st.mn) / (st.mx - st.mn) * 255.0 + 0.5))) END
        |   AS INTEGER) AS code
        |FROM e CROSS JOIN st ORDER BY vec_id, d""".stripMargin,
    // the whole SQ kNN pipeline re-derived: model -> codes -> inline
    // decode (mn + code*((mx-mn)/255)) -> e01's cosine/rank recipe
    "e12_knn_sq8" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |dims AS (SELECT unnest(range(0, 64)) AS d),
        |stat AS (SELECT d, min(v[d + 1]) AS mn, max(v[d + 1]) AS mx
        |         FROM e CROSS JOIN dims GROUP BY d),
        |st AS (SELECT list(mn ORDER BY d) AS mns, list(mx ORDER BY d) AS mxs FROM stat),
        |c AS (SELECT id, v, list_transform(range(0, 64), d ->
        |   CASE WHEN mxs[d + 1] = mns[d + 1] THEN 0.0
        |        ELSE least(255.0, greatest(0.0,
        |          floor((v[d + 1] - mns[d + 1]) / (mxs[d + 1] - mns[d + 1]) * 255.0 + 0.5))) END)
        |  AS codes FROM e CROSS JOIN st),
        |r AS (SELECT id, list_transform(range(0, 64), d ->
        |   mns[d + 1] + codes[d + 1] * ((mxs[d + 1] - mns[d + 1]) / 255.0)) AS recon
        |  FROM c CROSS JOIN st),
        |q AS (SELECT id AS qid, v AS qvec FROM e WHERE id < 10),
        |sims AS (SELECT qid, r.id,
        |  list_sum(list_transform(range(1, 65), i -> qvec[i] * recon[i]))
        |   / (sqrt(list_sum(list_transform(recon, x -> x * x)))
        |      * sqrt(list_sum(list_transform(qvec, x -> x * x)))) AS sim
        |  FROM r CROSS JOIN q WHERE r.id <> qid),
        |ranked AS (SELECT qid, id, sim,
        |  row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM sims)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim
        |FROM ranked WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // e06's deterministic-IVF skeleton with the residual quantizer
    // swapped to SQ8: per-dim residual min/max (exact aggregates),
    // linear codes, inline decode, cell-dot + residual-dot score
    "e13_knn_ivfsq_verify" -> e13OracleSql,
    // A correct REBUILD over the sharded layout is bit-identical to a
    // from-scratch build over the full corpus, so e19's oracle IS
    // e13's SQL verbatim (the e18 sharing pattern): any retrain that
    // re-normalized, reordered seeds, or lost a row would mismatch.
    "e19_knn_ivfsq_rebuilt" -> e13OracleSql,
    // e13's oracle with the TRAINED state (centroid seeds + SQ min/max)
    // restricted to the BUILD subset (id % 4 <> 0): appended rows (the
    // two delta shards) assign and encode under the FROZEN model —
    // including the 0/255 clamp on out-of-range residuals — exactly as
    // IvfSq.append does, so the whole sharded layout is hash-provable.
    "e15_knn_ivfsq_sharded" -> e15OracleSql,
    // Compaction is RESULT-INVARIANT by contract, so e18's oracle IS
    // e15's SQL verbatim (the d50/d32 sharing pattern): a merge that
    // changed any byte of any result would hash-mismatch the gate.
    "e18_knn_ivfsq_compacted" -> e15OracleSql,
    // e15's deterministic-assignment prefix (centroids from the BUILD
    // subset; zero vectors dropped like IvfSq.build does), then the
    // drift table itself: per-row residual norm (sequential double
    // math), per-shard mean, ratio vs shard 0 — shard membership is
    // the id split, so the whole telemetry re-derives in SQL.
    "e16_drift_stats" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nrm AS (SELECT id, v, list_sum(list_transform(v, x -> x * x)) AS ss FROM e),
        |u AS (SELECT id, list_transform(v, x -> x * (1.0 / sqrt(ss))) AS v
        |      FROM nrm WHERE ss > 0),
        |cent AS (SELECT row_number() OVER (ORDER BY h, id) AS cell, cv FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, v AS cv FROM u
        |   WHERE id % 4 <> 0 ORDER BY h, id LIMIT 4)),
        |asg AS (SELECT id, v, cell, cv FROM
        |  (SELECT u.id, u.v, c.cell, c.cv,
        |     row_number() OVER (PARTITION BY u.id
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> u.v[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM u CROSS JOIN cent c) WHERE rk = 1),
        |rn AS (SELECT id, CASE WHEN id % 4 = 0 THEN 1 ELSE 0 END AS shard,
        |   sqrt(list_sum(list_transform(range(1, 65), i -> (v[i] - cv[i]) * (v[i] - cv[i])))) AS res
        |  FROM asg),
        |st AS (SELECT shard, count(*) AS n, avg(res) AS mr FROM rn GROUP BY shard),
        |b AS (SELECT mr AS mr0 FROM st WHERE shard = 0)
        |SELECT CAST(st.shard AS INTEGER) AS shard, n,
        |  round(mr, 6) AS mean_residual, round(mr / mr0, 4) AS drift_ratio
        |FROM st CROSS JOIN b ORDER BY shard""".stripMargin,
    // Mirrors every float op of the deterministic IVF-PQ build+query in
    // Spark's exact sequential order: unit-normalize multiplies by
    // (1/sqrt(ss)) — NOT divides — because VecUnit does; dots/dists are
    // index-ascending folds; LUT and codes are flattened into
    // mm-ordered lists so the ADC sum reproduces PqAdcExpr's loop
    // order; ranking uses UNROUNDED scores with id tie-breaks, like
    // the Spark windows.
    "e06_knn_ivfpq_verify" ->
      """WITH e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nrm AS (SELECT id, v, list_sum(list_transform(v, x -> x * x)) AS ss FROM e),
        |u AS (SELECT id, CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(ss))) ELSE v END AS v FROM nrm),
        |cent AS (SELECT row_number() OVER (ORDER BY h, id) AS cell, cv FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, v AS cv FROM u ORDER BY h, id LIMIT 4)),
        |asg AS (SELECT id, v, cell, cv FROM
        |  (SELECT u.id, u.v, c.cell, c.cv,
        |     row_number() OVER (PARTITION BY u.id
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> u.v[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM u CROSS JOIN cent c) WHERE rk = 1),
        |resid AS (SELECT id, cell, list_transform(range(1, 65), i -> v[i] - cv[i]) AS r FROM asg),
        |pqseed AS (SELECT row_number() OVER (ORDER BY h, id) - 1 AS j, r FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, r FROM resid ORDER BY h, id LIMIT 16)),
        |ms AS (SELECT unnest(range(0, 8)) AS mm),
        |sub AS (SELECT t.id, t.cell, s.j, ms.mm,
        |   list_reduce(list_transform(range(1, 9), i ->
        |     (t.r[ms.mm * 8 + i] - s.r[ms.mm * 8 + i]) * (t.r[ms.mm * 8 + i] - s.r[ms.mm * 8 + i])),
        |     (a, b) -> a + b) AS dist
        |  FROM resid t CROSS JOIN pqseed s CROSS JOIN ms),
        |code1 AS (SELECT id, cell, mm, j FROM
        |  (SELECT id, cell, mm, j, row_number() OVER (PARTITION BY id, mm ORDER BY dist, j) AS rk FROM sub)
        |  WHERE rk = 1),
        |enc AS (SELECT id, any_value(cell) AS cell, list(j ORDER BY mm) AS codes FROM code1 GROUP BY id),
        |qu AS (SELECT id AS qid, v AS qv FROM u WHERE id < 10),
        |qp AS (SELECT qid, cell, cscore FROM
        |  (SELECT q.qid, c.cell,
        |     list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) AS cscore,
        |     row_number() OVER (PARTITION BY q.qid
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM qu q CROSS JOIN cent c) WHERE rk <= 2),
        |lutv AS (SELECT q.qid, ms.mm, s.j,
        |    list_sum(list_transform(range(1, 9), i -> q.qv[ms.mm * 8 + i] * s.r[ms.mm * 8 + i])) AS lv
        |  FROM qu q CROSS JOIN pqseed s CROSS JOIN ms),
        |lut AS (SELECT qid, list(lv ORDER BY mm, j) AS l FROM lutv GROUP BY qid),
        |cand AS (SELECT p.qid, t.id,
        |    p.cscore + list_sum(list_transform(range(0, 8), mm -> l.l[mm * 16 + t.codes[mm + 1] + 1])) AS score
        |  FROM qp p JOIN enc t ON t.cell = p.cell JOIN lut l ON l.qid = p.qid
        |  WHERE t.id <> p.qid),
        |short AS (SELECT qid, id FROM
        |  (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk FROM cand)
        |  WHERE rk <= 20),
        |rer AS (SELECT s.qid, s.id,
        |    list_sum(list_transform(range(1, 65), i -> cu.v[i] * q.qv[i])) AS sim
        |  FROM short s JOIN u cu ON cu.id = s.id JOIN qu q ON q.qid = s.qid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim FROM
        |  (SELECT qid, id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM rer)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // e06's pipeline with (a) the e08 fixed signed-permutation
    // rotation prefixed (rotation BEFORE unit-normalize — the norm's
    // float sum runs in ROTATED index order, matching vecUnit over the
    // rotated array), and (b) the cell/codebook seed pools restricted
    // to the BUILD subset (id % 4 <> 0). Appended rows (the remaining
    // quarter) assign and PQ-encode under the frozen model with the
    // same formulas as build rows, so one enc CTE covers all shards.
    "e17_knn_opq_sharded" ->
      """WITH pm AS (SELECT list(i ORDER BY md5(CAST(i AS VARCHAR)), i) AS perm
        |  FROM range(0, 64) t(i)),
        |sg AS (SELECT list(CASE WHEN substr(md5('s' || CAST(i AS VARCHAR)), 1, 1) <= '7'
        |    THEN -1.0 ELSE 1.0 END ORDER BY i) AS signs FROM range(0, 64) t(i)),
        |e0 AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
        |e AS (SELECT id,
        |  list_transform(range(1, 65), j -> e0.v0[pm.perm[j] + 1] * sg.signs[j]) AS v
        | FROM e0, pm, sg),
        |nrm AS (SELECT id, v, list_sum(list_transform(v, x -> x * x)) AS ss FROM e),
        |u AS (SELECT id, CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(ss))) ELSE v END AS v FROM nrm),
        |cent AS (SELECT row_number() OVER (ORDER BY h, id) AS cell, cv FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, v AS cv FROM u
        |   WHERE id % 4 <> 0 ORDER BY h, id LIMIT 4)),
        |asg AS (SELECT id, v, cell, cv FROM
        |  (SELECT u.id, u.v, c.cell, c.cv,
        |     row_number() OVER (PARTITION BY u.id
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> u.v[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM u CROSS JOIN cent c) WHERE rk = 1),
        |resid AS (SELECT id, cell, list_transform(range(1, 65), i -> v[i] - cv[i]) AS r FROM asg),
        |pqseed AS (SELECT row_number() OVER (ORDER BY h, id) - 1 AS j, r FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, r FROM resid
        |   WHERE id % 4 <> 0 ORDER BY h, id LIMIT 16)),
        |ms AS (SELECT unnest(range(0, 8)) AS mm),
        |sub AS (SELECT t.id, t.cell, s.j, ms.mm,
        |   list_reduce(list_transform(range(1, 9), i ->
        |     (t.r[ms.mm * 8 + i] - s.r[ms.mm * 8 + i]) * (t.r[ms.mm * 8 + i] - s.r[ms.mm * 8 + i])),
        |     (a, b) -> a + b) AS dist
        |  FROM resid t CROSS JOIN pqseed s CROSS JOIN ms),
        |code1 AS (SELECT id, cell, mm, j FROM
        |  (SELECT id, cell, mm, j, row_number() OVER (PARTITION BY id, mm ORDER BY dist, j) AS rk FROM sub)
        |  WHERE rk = 1),
        |enc AS (SELECT id, any_value(cell) AS cell, list(j ORDER BY mm) AS codes FROM code1 GROUP BY id),
        |qu AS (SELECT id AS qid, v AS qv FROM u WHERE id < 10),
        |qp AS (SELECT qid, cell, cscore FROM
        |  (SELECT q.qid, c.cell,
        |     list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) AS cscore,
        |     row_number() OVER (PARTITION BY q.qid
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> q.qv[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM qu q CROSS JOIN cent c) WHERE rk <= 2),
        |lutv AS (SELECT q.qid, ms.mm, s.j,
        |    list_sum(list_transform(range(1, 9), i -> q.qv[ms.mm * 8 + i] * s.r[ms.mm * 8 + i])) AS lv
        |  FROM qu q CROSS JOIN pqseed s CROSS JOIN ms),
        |lut AS (SELECT qid, list(lv ORDER BY mm, j) AS l FROM lutv GROUP BY qid),
        |cand AS (SELECT p.qid, t.id,
        |    p.cscore + list_sum(list_transform(range(0, 8), mm -> l.l[mm * 16 + t.codes[mm + 1] + 1])) AS score
        |  FROM qp p JOIN enc t ON t.cell = p.cell JOIN lut l ON l.qid = p.qid
        |  WHERE t.id <> p.qid),
        |short AS (SELECT qid, id FROM
        |  (SELECT qid, id, row_number() OVER (PARTITION BY qid ORDER BY score DESC, id) AS rk FROM cand)
        |  WHERE rk <= 20),
        |rer AS (SELECT s.qid, s.id,
        |    list_sum(list_transform(range(1, 65), i -> cu.v[i] * q.qv[i])) AS sim
        |  FROM short s JOIN u cu ON cu.id = s.id JOIN qu q ON q.qid = s.qid)
        |SELECT qid, CAST(rank AS INTEGER) AS rank, id, round(sim, 4) AS sim FROM
        |  (SELECT qid, id, sim, row_number() OVER (PARTITION BY qid ORDER BY sim DESC, id) AS rank FROM rer)
        |WHERE rank <= 5 ORDER BY qid, rank""".stripMargin,
    // Same deterministic-assignment prefix as e06, then rounded-cosine
    // within-cell pairs and the d19-style recursive-CTE component
    // labels with min-id canonicals.
    "e07_semantic_dedup" ->
      """WITH RECURSIVE
        |e AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        |nrm AS (SELECT id, v, list_sum(list_transform(v, x -> x * x)) AS ss FROM e),
        |u AS (SELECT id, CASE WHEN ss > 0 THEN list_transform(v, x -> x * (1.0 / sqrt(ss))) ELSE v END AS v FROM nrm),
        |cent AS (SELECT row_number() OVER (ORDER BY h, id) AS cell, cv FROM
        |  (SELECT md5(CAST(id AS VARCHAR)) AS h, id, v AS cv FROM u ORDER BY h, id LIMIT 4)),
        |asg AS (SELECT id, v, cell FROM
        |  (SELECT u.id, u.v, c.cell,
        |     row_number() OVER (PARTITION BY u.id
        |       ORDER BY list_sum(list_transform(range(1, 65), i -> u.v[i] * c.cv[i])) DESC, c.cell) AS rk
        |   FROM u CROSS JOIN cent c) WHERE rk = 1),
        |pairs AS (SELECT a.id AS id_a, b.id AS id_b
        |  FROM asg a JOIN asg b ON a.cell = b.cell AND a.id < b.id
        |  WHERE round(list_sum(list_transform(range(1, 65), i -> a.v[i] * b.v[i])), 4) >= 0.4),
        |edges AS (SELECT id_a AS eu, id_b AS ev FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach(src, dst) AS (
        |  SELECT eu, ev FROM edges
        |  UNION
        |  SELECT r.src, g.ev FROM reach r JOIN edges g ON g.eu = r.dst),
        |lab AS (SELECT src AS id, least(src, min(dst)) AS cluster_id
        |        FROM reach GROUP BY src)
        |SELECT e.id AS vec_id,
        | coalesce(l.cluster_id, e.id) AS cluster_id,
        | CAST(CASE WHEN coalesce(l.cluster_id, e.id) = e.id
        |      THEN 1 ELSE 0 END AS INTEGER) AS is_canonical
        |FROM e LEFT JOIN lab l ON l.id = e.id
        |ORDER BY vec_id""".stripMargin)
}
