package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.store.RunInfo
import graft.util.Util

/** Container of IAMC time-series data keyed by (model, scenario,
  * version) (reference: ixmp/core/timeseries.py:44-76).
  *
  * All writes are whole-DataFrame set operations against the run's
  * partition — the reference's per-row JNI loops become single Spark
  * jobs (SURVEY §4 "batched mutation").
  */
class TimeSeries(val platform: Platform, protected var run: RunInfo) {

  protected def spark: SparkSession = platform.spark
  protected def store = platform.store

  def runId: Long = run.runId

  /** Timestamp of the last committed update (creation time before the
    * first commit) — reference TimeSeries.last_update,
    * timeseries.py:298-304. */
  def lastUpdate: Option[String] = platform.store.lastUpdate(runId)
  def model: String = run.model
  def scenario: String = run.scenario
  def version: Int = run.version

  // ---- transactions (reference timeseries.py:208-296) ----------------

  protected var checkedOut = false

  def checkOut(user: String = "local"): Unit = {
    store.checkOut(runId, user)
    checkedOut = true
  }

  def commit(comment: String = "", user: String = "local"): Unit = {
    store.commit(runId, user, comment)
    checkedOut = false
  }

  /** Roll back all staged writes since checkOut (reference
    * discard_changes — the store drops the staged generations). */
  def discard(): Unit = {
    store.discardChanges(runId)
    checkedOut = false
  }

  protected def requireCheckedOut(): Unit =
    require(checkedOut, "this TimeSeries is not checked out — call checkOut() first")

  /** transact loan pattern (reference timeseries.py:241-288). */
  def transact[T](comment: String = "", discardOnError: Boolean = false)(f: => T): T = {
    checkOut()
    try { val r = f; commit(comment); r }
    catch {
      case e: Throwable =>
        if (discardOnError) discard()
        throw e
    }
  }

  def setAsDefault(): Unit = store.setDefault(runId)
  def isDefault: Boolean = store.getRunById(runId).isDefault

  // ---- TS data (reference timeseries.py:338-518) ----------------------

  private val tsKey = Seq("region", "variable", "unit", "subannual")

  /** Resolve region synonyms to their canonical region via a broadcast
    * join with the regions codelist (reference platform.py:335-349;
    * SURVEY §2 #23). private[graft]: ScenarioOperators.removeTs'
    * after-branch keys victims by region too (review r12). */
  private[graft] def resolveRegions(df: DataFrame): DataFrame = {
    val syn = store.regions().filter(col("mapped_to").isNotNull)
      .select(col("region").as("__alias"), col("mapped_to").as("__canonical"))
    df.join(broadcast(syn), df("region") === col("__alias"), "left")
      .withColumn("region", coalesce(col("__canonical"), col("region")))
      .drop("__alias", "__canonical")
  }

  /** Registered-codelist validation (review r9; reference
    * platform.py:335-349 — the backend REFUSES unregistered regions
    * and units rather than silently fragmenting the fact table on a
    * typo). Regions check AFTER synonym resolution against canonical
    * (non-synonym) entries; the region probe is one tiny
    * broadcast-anti-join job, the unit probe a collect of the frame's
    * distinct units. A fresh store already carries the reference
    * defaults (World; the ixmp4 unit list; see ParquetStore). */
  private def validateTsCodelists(incoming: DataFrame): Unit = {
    // null upsert keys fail LOUDLY (review r13): region/unit nulls
    // already die on the codelist checks below, but a null variable,
    // year or subannual sailed through — and the upsert's anti-join
    // EqualTo never matches null, so RE-adding the same row silently
    // ACCUMULATED a duplicate instead of replacing (the reference's
    // DB schema makes these columns NOT NULL)
    val nullKey = incoming.filter(col("variable").isNull ||
        col("year").isNull || col("subannual").isNull)
      .limit(1).collect()
    require(nullKey.isEmpty,
      "TS rows must carry non-null variable/year/subannual - a null " +
        s"upsert key can never be replaced or removed (got ${nullKey.headOption})")
    val canonical = store.regions()
      .filter(col("hierarchy") =!= "synonym").select("region")
    val badRegion = incoming.select("region").distinct()
      .join(broadcast(canonical), Seq("region"), "left_anti")
      .limit(1).collect()
    require(badRegion.isEmpty,
      s"region '${badRegion.headOption.map(_.getString(0)).getOrElse("")}' is not " +
        "registered on the Platform — addRegion() first")
    val known = store.units().toSet
    val badUnit = incoming.select("unit").distinct().collect()
      .map(_.getString(0)).filterNot(known.contains)
    require(badUnit.isEmpty,
      s"unit '${badUnit.headOption.getOrElse("")}' is not registered on the " +
        "Platform — addUnit() first")
  }

  /** Add/update TS data. Accepts long (`year`,`value` columns) or wide
    * (integer-named year columns) input; normalizes via the IAMC layout
    * rules; upserts on (region, variable, unit, subannual, year)
    * (reference timeseries.py:338-418). */
  def addTimeseries(df: DataFrame, meta: Boolean = false,
      yearLim: (Option[Int], Option[Int]) = (None, None)): Unit = {
    requireCheckedOut()
    var longDf = Util.wideToLong(Util.toIamcLayout(df))
    require(longDf.columns.contains("year") && longDf.columns.contains("value"),
      "input needs year/value columns (long) or integer year columns (wide)")
    yearLim._1.foreach(lo => longDf = longDf.filter(col("year") >= lo))
    yearLim._2.foreach(hi => longDf = longDf.filter(col("year") <= hi))
    val incoming = resolveRegions(longDf)
      .select(col("region").cast("string"), col("variable").cast("string"),
        col("unit").cast("string"), col("subannual").cast("string"),
        col("year").cast("int"), col("value").cast("double"),
        lit(meta).as("meta"))
    validateTsCodelists(incoming)
    val existing = store.tsData(runId)
    val kept = existing.join(incoming.select((tsKey :+ "year").map(col): _*).distinct(),
      tsKey :+ "year", "left_anti")
    store.writeTsData(runId, kept.unionByName(incoming))
  }

  /** Filtered TS read (reference timeseries.py:419-492). `iamc=true`
    * pivots years to columns; `subannual` is dropped when homogeneous
    * "Year" (timeseries.py:470-479). */
  def timeseries(region: Seq[String] = Nil, variable: Seq[String] = Nil,
      unit: Seq[String] = Nil, year: Seq[Int] = Nil,
      iamc: Boolean = false): DataFrame = {
    var df = store.tsData(runId)
    if (region.nonEmpty) df = df.filter(col("region").isin(region: _*))
    if (variable.nonEmpty) df = df.filter(col("variable").isin(variable: _*))
    if (unit.nonEmpty) df = df.filter(col("unit").isin(unit: _*))
    if (year.nonEmpty) df = df.filter(col("year").isin(year: _*))
    val withIds = df
      .withColumn("model", lit(model))
      .withColumn("scenario", lit(scenario))
      .withColumn("version", lit(version))
    val homogeneous = withIds.select("subannual").distinct().collect()
      .forall(_.getString(0) == "Year")
    val ordered = withIds.select("model", "scenario", "version", "region",
      "variable", "subannual", "unit", "year", "value")
    val out = if (homogeneous) ordered.drop("subannual") else ordered
    if (iamc) {
      val ids = out.columns.filterNot(Seq("year", "value").contains).toSeq
      Util.longToWide(out, ids)
    } else out.orderBy("region", "variable", "unit", "year")
  }

  /** Grouped delete by (region, variable, unit, subannual[, year])
    * (reference timeseries.py:494-518): one anti-join rewrite.
    * Region SYNONYMS resolve like the add path (review r12): data is
    * stored under canonical regions (resolveRegions on write), and the
    * reference backend's node lookup accepts "name or synonym" on both
    * paths (base.py:249) — an unresolved synonym key would silently
    * delete nothing. */
  def removeTimeseries(keys: DataFrame): Unit = {
    requireCheckedOut()
    val norm = resolveRegions(Util.toIamcLayout(keys))
    val joinCols = if (norm.columns.contains("year")) tsKey :+ "year" else tsKey
    store.writeTsData(runId,
      store.tsData(runId).join(norm.select(joinCols.map(col): _*).distinct(),
        joinCols, "left_anti"))
  }

  // ---- geodata (reference timeseries.py:550-599, values are strings) --

  def addGeodata(df: DataFrame, meta: Boolean = false): Unit = {
    requireCheckedOut()
    val incoming = resolveRegions(Util.toIamcLayout(df))
      .select(col("region").cast("string"), col("variable").cast("string"),
        col("unit").cast("string"), col("subannual").cast("string"),
        col("year").cast("int"), col("value").cast("string"),
        lit(meta).as("meta"))
    validateTsCodelists(incoming)
    val kept = store.geoData(runId).join(
      incoming.select((tsKey :+ "year").map(col): _*).distinct(),
      tsKey :+ "year", "left_anti")
    store.writeGeoData(runId, kept.unionByName(incoming))
  }

  def getGeodata(): DataFrame =
    store.geoData(runId)
      .withColumn("model", lit(model))
      .withColumn("scenario", lit(scenario))
      .orderBy("region", "variable", "year")

  def removeGeodata(keys: DataFrame): Unit = {
    requireCheckedOut()
    // synonym-resolved like removeTimeseries (review r12)
    val norm = resolveRegions(Util.toIamcLayout(keys))
    val joinCols = if (norm.columns.contains("year")) tsKey :+ "year" else tsKey
    store.writeGeoData(runId,
      store.geoData(runId).join(norm.select(joinCols.map(col): _*).distinct(),
        joinCols, "left_anti"))
  }

  /** Preload = persist the run's TS slice, released by the store on
    * the next TS write/discard (reference preload_timeseries,
    * timeseries.py:334-336 → SURVEY §4). */
  def preloadTimeseries(): Unit = store.preloadTs(runId)
}
