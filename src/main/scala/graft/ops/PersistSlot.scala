package graft.ops

import org.apache.spark.sql.DataFrame

/** Single-frame persist slot: acquiring the slot persists the new
  * frame (MEMORY_AND_DISK) and evicts the previous occupant, so
  * repeated pipeline runs never accumulate cached blocks for the
  * SparkContext's lifetime. Slots are per OPERATOR FAMILY — an
  * operator that holds its frame across a lazy downstream join must
  * own its slot, or a concurrent run of another family would evict it
  * mid-query (ADVICE r5, bloomDecontaminate).
  *
  * KNOWN COST (review r11, documented not fixed): within one family,
  * a SECOND call evicts the first call's frame — if the first result
  * is still lazy (not yet consumed), its multi-reference plan
  * recomputes the un-cached upstream per reference when finally run.
  * Correctness always survives (persist is advisory); the blowup is
  * cost-only and appears ONLY under call-then-call-then-consume
  * interleavings or concurrent same-family runs. The alternative —
  * per-call persists with caller-owned lifecycles — trades that for
  * unbounded cache growth in exactly the repeated-pipeline pattern
  * this type exists to cap, so the slot stays single-frame. Callers
  * needing two live results of one family should consume (or
  * checkpoint) the first before the second call. */
private[graft] final class PersistSlot {
  private var last: Option[DataFrame] = None
  def apply(df: DataFrame): DataFrame = synchronized {
    last.foreach(_.unpersist(blocking = false))
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    last = Some(p)
    p
  }
}
