package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Approximate twins of the exact corpus-telemetry gates (VERDICT r13
  * stretch #7): d24's exact `percentile` and d26's exact top-k both
  * have documented 100 TB swaps — this module LANDS them, so the swap
  * at scale is a flag flip, not a rewrite.
  *
  *  - [[lengthStats]]: d24's per-group shape with `exact = false`
  *    switching `percentile` (per-group value buffer — sort-based,
  *    memory ∝ group size) to `approx_percentile` (t-digest/KLL-style
  *    MERGEABLE partial aggregates, bounded memory per group
  *    regardless of group size). The accuracy knob is Spark's: rank
  *    error ≤ n/accuracy.
  *  - [[vocabTopKSketch]]: d26's top-k word frequencies with bounded
  *    state — per-partition count-min sketch (Cormode & Muthukrishnan
  *    2005; the same disjoint-md5-word row hashing as the streaming
  *    [[graft.streaming]] boilerplate sketch, so estimates are
  *    deterministic and engine-reproducible) plus a SpaceSaving-style
  *    candidate list (Metwally 2005), merged once on the driver via
  *    treeAggregate. State per task is depth×width longs + `cand`
  *    counters — CONSTANT in corpus size and vocabulary size, where
  *    the exact groupBy shuffles one row per distinct word (fine at
  *    natural-language vocabularies, unbounded at web-scale token
  *    soup: urls, hashes, numbers).
  *
  * Guarantees (spec-proven): CMS estimates only ever OVERcount, so
  * `n_est >= true count` for every reported word; with `width` well
  * above the distinct-word count and `cand` above the per-partition
  * distinct count the result coincides with the exact top-k. The
  * candidate union misses a global heavy hitter only if it fails to
  * enter ANY partition's SpaceSaving list — the standard (and
  * documented) heavy-hitter trade; size `cand` ≥ k/φ for the target
  * frequency floor φ. */
object Telemetry {

  /** d24's per-group length statistics, exact or approximate.
    * `exact = true` reproduces the d24 gate columns bit-for-bit;
    * `exact = false` is the bounded-memory 100 TB form (same schema,
    * rank error ≤ n/accuracy per group). */
  def lengthStats(docs: DataFrame, groupCol: String, valueCol: String,
      exact: Boolean = true, accuracy: Int = 10000): DataFrame = {
    require(accuracy >= 1, s"accuracy must be >= 1, got $accuracy")
    def pct(q: Double): org.apache.spark.sql.Column =
      if (exact) expr(s"percentile($valueCol, $q)")
      else expr(s"approx_percentile($valueCol, $q, $accuracy)").cast("double")
    docs.groupBy(groupCol)
      .agg(count(lit(1)).as("n_docs"),
        sum(valueCol).cast("long").as("total"),
        round(avg(valueCol), 4).as("avg"),
        round(pct(0.5), 4).as("p50"),
        round(pct(0.9), 4).as("p90"))
  }

  /** Lowercase-hex md5 of a word's UTF-8 bytes — the SAME digest the
    * streaming CMS keys on (there via the md5() column function), so
    * the two sketches' row indexing agrees. The digest instance is
    * reused per thread (getInstance-per-word was a hot-path
    * allocation; MessageDigest.digest() resets after each call, and
    * treeAggregate's seqOp is single-threaded per task). */
  private val md5Local =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }
  private def md5Hex(w: String): String = {
    val d = md5Local.get()
      .digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b =>
      sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b & 0xf, 16))
    }
    sb.toString
  }

  /** Per-task sketch state: depth×width CMS counters + a bounded
    * SpaceSaving candidate map. Mutable and task-local by
    * construction (treeAggregate deserializes a fresh copy of the
    * zero per task). */
  private final class Sketch(val depth: Int, val width: Int, val cand: Int)
      extends Serializable {
    val counters = new Array[Long](depth * width)
    val candidates = new java.util.HashMap[String, java.lang.Long](cand * 2)

    /** CMS row indices from disjoint 32-bit words of the word's md5 —
      * deterministic, engine-reproducible (the streaming-CMS recipe). */
    private def rowIdx(h: String, r: Int): Int =
      r * width + math.floorMod(
        java.lang.Long.parseLong(h.substring(r * 8, r * 8 + 8), 16).toInt,
        width)

    def add(w: String, n: Long): Unit = {
      val h = md5Hex(w)
      var r = 0
      while (r < depth) {
        counters(rowIdx(h, r)) += n
        r += 1
      }
      // SpaceSaving: track the word if present or there is room;
      // otherwise evict the (minCount, largest-word) entry and inherit
      // its count + n (the classic overestimate-in, never-undercount)
      val cur = candidates.get(w)
      if (cur != null) {
        candidates.put(w, cur + n); ()
      } else if (candidates.size < cand) {
        candidates.put(w, n); ()
      } else {
        var minK: String = null
        var minV = Long.MaxValue
        val it = candidates.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          // deterministic victim: smallest count, then LARGEST word
          // (so the kept set is a function of the multiset, not of
          // hash-map iteration order)
          val v = e.getValue.longValue()
          if (v < minV || (v == minV && (minK == null || e.getKey > minK))) {
            minV = v; minK = e.getKey
          }
        }
        candidates.remove(minK)
        candidates.put(w, minV + n)
        ()
      }
    }

    def estimate(h: String): Long = {
      var est = Long.MaxValue
      var r = 0
      while (r < depth) {
        val c = counters(rowIdx(h, r))
        if (c < est) est = c
        r += 1
      }
      est
    }

    def merge(o: Sketch): Sketch = {
      var i = 0
      while (i < counters.length) { counters(i) += o.counters(i); i += 1 }
      // merge candidate lists by SUM (both sides' counts are upper
      // bounds of their partitions' truth; the sum upper-bounds the
      // union), then re-truncate to the cand budget deterministically
      o.candidates.forEach((w, n) => {
        candidates.merge(w, n,
          (a: java.lang.Long, b: java.lang.Long) =>
            java.lang.Long.valueOf(a.longValue() + b.longValue()))
        ()
      })
      if (candidates.size > cand) {
        val arr = new scala.collection.mutable.ArrayBuffer[(String, Long)](
          candidates.size)
        candidates.forEach((w, n) => { arr += ((w, n.longValue())); () })
        val keep = arr.sortBy { case (w, n) => (-n, w) }.take(cand)
        candidates.clear()
        keep.foreach { case (w, n) => candidates.put(w, n) }
      }
      this
    }
  }

  /** Approximate top-`k` word frequencies (d26's twin): one
    * treeAggregate pass, bounded state, result driver-localized
    * (≤ k rows). Ranked by (CMS estimate desc, word) — the d26
    * tie-break under estimated counts. */
  def vocabTopKSketch(docs: DataFrame, textCol: String = "text",
      k: Int = 100, width: Int = 1 << 16, depth: Int = 4,
      cand: Int = 4096): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(depth >= 1 && depth <= 4,
      s"depth must be 1..4 (md5 has 4 words), got $depth")
    require(width >= 16, s"width must be >= 16, got $width")
    require(cand >= k, s"cand ($cand) must be >= k ($k) - the candidate " +
      "list is where the answer comes from")
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs
      .select(explode(TextFunctions.words(col(textCol))).as("word"))
      .as[String].rdd
    val merged = words.treeAggregate(new Sketch(depth, width, cand))(
      seqOp = (s, w) => { s.add(w, 1L); s },
      combOp = (a, b) => a.merge(b))
    val out = new scala.collection.mutable.ArrayBuffer[(String, Long)](
      merged.candidates.size)
    merged.candidates.forEach((w, _) => {
      out += ((w, merged.estimate(md5Hex(w))))
      ()
    })
    val top = out.sortBy { case (w, n) => (-n, w) }.take(k)
    spark.createDataFrame(top.toSeq).toDF("word", "n_est")
  }
}
