package graft.ops

import org.apache.spark.sql.DataFrame

/** Single-frame persist slot: acquiring the slot persists the new
  * frame (MEMORY_AND_DISK) and evicts the previous occupant, so
  * repeated pipeline runs never accumulate cached blocks for the
  * SparkContext's lifetime. Slots are per OPERATOR FAMILY — an
  * operator that holds its frame across a lazy downstream join must
  * own its slot, or a concurrent run of another family would evict it
  * mid-query (ADVICE r5, bloomDecontaminate). */
private[ops] final class PersistSlot {
  private var last: Option[DataFrame] = None
  def apply(df: DataFrame): DataFrame = synchronized {
    last.foreach(_.unpersist(blocking = false))
    val p = df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    last = Some(p)
    p
  }
}
