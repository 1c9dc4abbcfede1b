package graft.store

import org.apache.spark.sql.DataFrame

/** Item families, mirroring the reference's ItemType flags
  * (reference: ixmp/backend/common.py:59-93). */
object ItemType extends Enumeration {
  val Set, Par, Var, Equ = Value
  def fromString(s: String): Value = s match {
    case "set" => Set
    case "par" => Par
    case "var" => Var
    case "equ" => Equ
    case other => throw new IllegalArgumentException(s"unknown item type $other")
  }
}

/** Run (= TimeSeries/Scenario version) descriptor: one row of the runs
  * catalog (reference: ixmp/core/timeseries.py:44-76 keying and
  * FIELDS["get_scenarios"], backend/common.py:18-32). */
final case class RunInfo(
    runId: Long,
    model: String,
    scenario: String,
    version: Int,
    scheme: String,
    isDefault: Boolean,
    annotation: String,
    lockUser: Option[String])

/** Item declaration (reference: ixmp/core/item.py:5-67 — `coords` are
  * the index *sets*, `dims` the index *names*, which default to the
  * sets). */
final case class ItemDef(
    name: String,
    itemType: ItemType.Value,
    idxSets: Seq[String],
    idxNames: Seq[String])

/** Storage abstraction = the reference's Backend ABC surface
  * (ixmp/backend/base.py:45-1288), re-cut for DataFrame-native IO.
  *
  * All item data flows through long-format DataFrames whose dimension
  * columns are the item's idx_names (all strings), plus
  * value/unit (par) or lvl/mrg (var/equ) — SURVEY §1.2.
  *
  * Concurrency: implementations must support any number of concurrent
  * READER processes, but may assume a single WRITER process per
  * backing store (the reference delegates multi-writer coordination to
  * its RDBMS, timeseries.py:208-239); how the writer slot is enforced
  * is implementation-defined — [[ParquetStore]] holds an advisory OS
  * file lock and fails a second writer process fast.
  */
trait Store {
  // --- runs catalog -------------------------------------------------
  def nextRunId(): Long
  def createRun(model: String, scenario: String, scheme: String, annotation: String): RunInfo
  def getRun(model: String, scenario: String, version: Option[Int]): RunInfo
  def listRuns(defaultOnly: Boolean = true, model: Option[String] = None,
      scenario: Option[String] = None): DataFrame
  def setDefault(runId: Long): Unit
  def discardRun(runId: Long): Unit
  /** Timestamp of the last committed update (Backend.last_update). */
  def lastUpdate(runId: Long): Option[String]

  // --- item catalog -------------------------------------------------
  def initItem(runId: Long, d: ItemDef): Unit
  def listItems(runId: Long, t: ItemType.Value): Seq[String]
  def itemDef(runId: Long, name: String): Option[ItemDef]
  def deleteItem(runId: Long, name: String): Unit

  // --- item data ----------------------------------------------------
  /** Filtered long-format read; filters: dim -> allowed values
    * (values absent from the data are silently ignored —
    * base.py:997-1005). */
  def itemData(runId: Long, name: String,
      filters: Map[String, Seq[String]] = Map.empty): DataFrame
  /** Replace the item's stored rows with `df` (full-state write; the
    * API layer composes add/remove against the current state). */
  def writeItemData(runId: Long, name: String, df: DataFrame): Unit

  // --- time series / geodata ----------------------------------------
  def tsData(runId: Long): DataFrame
  def writeTsData(runId: Long, df: DataFrame): Unit
  def geoData(runId: Long): DataFrame
  def writeGeoData(runId: Long, df: DataFrame): Unit
  /** All-runs TS fact join for Platform.export_timeseries_data. */
  def allTsData(): DataFrame

  // --- meta + codelists ----------------------------------------------
  def meta(): DataFrame
  def writeMeta(df: DataFrame): Unit
  def units(): Seq[String]
  def addUnit(u: String): Unit
  /** Explicit model/scenario name codelists (reference base.py:300-338
    * set_model_name/get_model_names): names exist INDEPENDENTLY of
    * runs — a name registered without a run must list; run creation
    * auto-extends the lists. */
  def modelNames(): Seq[String]
  def addModelName(name: String): Unit
  def scenarioNames(): Seq[String]
  def addScenarioName(name: String): Unit
  /** Monotonic count of item-data mutations in this session; consumers
    * (e.g. the Reporter quantity cache) compare snapshots to detect
    * staleness — the quantity-level analogue of the reference's
    * CachingBackend invalidation (jdbc.py:1358-1362). */
  def mutationCount: Long
  def regions(): DataFrame
  def addRegion(region: String, hierarchy: String, parent: Option[String]): Unit
  def addRegionSynonym(region: String, mappedTo: String): Unit
  def timeslices(): DataFrame
  def addTimeslice(name: String, category: String, duration: Double): Unit

  // --- categories (cat_list/cat_get/cat_set, base.py:1231-1288) ------
  def categories(runId: Long, setName: String): DataFrame
  def writeCategories(runId: Long, setName: String, df: DataFrame): Unit

  // --- transactions ---------------------------------------------------
  def checkOut(runId: Long, user: String): Unit
  def commit(runId: Long, user: String, comment: String): Unit
  /** Roll back every staged write since checkOut and release the lock
    * (reference discard_changes, timeseries.py:230-239). */
  def discardChanges(runId: Long): Unit
}
