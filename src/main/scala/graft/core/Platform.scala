package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{ItemType, ParquetStore}

/** Top-level container: one storage root + codelists + meta/doc stores
  * (reference: ixmp/core/platform.py:25-108; doc/data-model.rst:21-34).
  *
  * Scale notes: codelists and catalogs are tiny broadcast-able tables;
  * all fact data lives in the store partitioned by run_id, so every
  * run-scoped read below is partition pruning, and the only all-runs
  * scan (`exportTimeseriesData`) is a single distributed job rather
  * than the reference's per-run loop.
  */
class Platform(val spark: SparkSession, val root: String) {

  val store = new ParquetStore(spark, root)

  // NOTE: construction performs NO store writes (review r9): the
  // "Year" timeslice (and the World region / default units) are
  // implicit read-side defaults in ParquetStore, so a read-only open
  // never touches the cross-process writer lock.

  // ---- logging (reference platform.py:118-157) -----------------------

  private var currentLogLevel: String = "WARNING"

  /** Set the log level for the underlying engine (reference
    * set_log_level; here that engine is Spark, so the level maps to
    * log4j via SparkContext). Accepts the reference's Python names;
    * CRITICAL/NOTSET map to their closest log4j levels.
    * [[getLogLevel]] round-trips the name AS SET (review r9: it used
    * to return the mapped log4j name, so "WARNING" came back
    * "WARN"). */
  def setLogLevel(level: String): Unit = {
    val l4j = level.toUpperCase match {
      case "CRITICAL" => "FATAL"
      case "WARNING" => "WARN"
      case "NOTSET" => "TRACE"
      case other => other
    }
    require(Seq("ALL", "DEBUG", "ERROR", "FATAL", "INFO", "OFF", "TRACE", "WARN")
      .contains(l4j), s"invalid log level: $level")
    spark.sparkContext.setLogLevel(l4j)
    currentLogLevel = level.toUpperCase
  }

  def getLogLevel: String = currentLogLevel

  /** Per-model access check (reference platform.py:399-430 /
    * base.py:177-200). Access control is OPTIONAL for a backend; a
    * filesystem-rooted store has exactly the filesystem's permissions,
    * so every registered model is readable and writability equals the
    * store root's writability — per-user grants would be a fiction
    * this backend cannot enforce and so does not pretend to. */
  def checkAccess(user: String, models: Seq[String],
      access: String = "view"): Map[String, Boolean] = {
    require(models.nonEmpty, "must supply at least 1 model name")
    require(Seq("view", "read", "edit", "write", "modify").contains(access),
      s"invalid access kind: $access")
    val known = modelNames().toSet
    // the root may be a URI (hdfs://, s3a://, file:/) for which
    // java.io.File.canWrite is ALWAYS false — probe local paths with
    // File, and trust remote filesystems to raise their own permission
    // errors on write (a fiction File cannot check for them anyway)
    val writable = {
      val uri = new org.apache.hadoop.fs.Path(root).toUri
      if (uri.getScheme == null) new java.io.File(root).canWrite
      else if (uri.getScheme == "file") new java.io.File(uri.getPath).canWrite
      else true
    }
    models.map { m =>
      m -> (known(m) && (access == "view" || access == "read" || writable))
    }.toMap
  }

  // ---- scenario/run inventory (reference platform.py:159-195) --------

  /** Run inventory in the reference's 13-column FIELDS["get_scenarios"]
    * order (backend/common.py:18-32): model, scenario, scheme,
    * is_default, is_locked, cre_user, cre_date, upd_user, upd_date,
    * lock_user, lock_date, annotation, version. `defaultOnly=true`
    * keeps only default versions (scenario_list, base.py:340-379). */
  def scenarioList(defaultOnly: Boolean = true, model: Option[String] = None,
      scenario: Option[String] = None): DataFrame =
    store.listRuns(defaultOnly, model, scenario)
      .withColumn("is_locked", col("lock_user").isNotNull)
      .select("model", "scenario", "scheme", "is_default", "is_locked",
        "cre_user", "cre_date", "upd_user", "upd_date",
        "lock_user", "lock_date", "annotation", "version")

  /** Per-(model, scenario) describe: N, min/max version, default
    * version, regex name match (reference `format_scenario_list`,
    * util/__init__.py:514-556). */
  def describeScenarios(matchRegex: Option[String] = None): DataFrame = {
    var runs = store.listRuns(defaultOnly = false, None, None)
    matchRegex.foreach { pat =>
      runs = runs.filter(col("model").rlike(pat) || col("scenario").rlike(pat))
    }
    runs.groupBy("model", "scenario")
      .agg(count(lit(1)).as("n"),
        min("version").as("min_version"),
        max("version").as("max_version"),
        max(when(col("is_default"), col("version"))).as("default_version"))
      .orderBy("model", "scenario")
  }

  def getScenario(model: String, scenario: String, version: Option[Int] = None): Scenario =
    new Scenario(this, store.getRun(model, scenario, version))

  def newScenario(model: String, scenario: String, scheme: String = "",
      annotation: String = ""): Scenario =
    new Scenario(this, store.createRun(model, scenario, scheme, annotation))

  /** Resolve an `ixmp://…` / `model/scenario#version` URL
    * (reference util/__init__.py:340-408). */
  def fromUrl(url: String): Scenario = {
    val u = graft.util.Util.parseUrl(url)
    u.version match {
      case Some(Right(_)) => newScenario(u.model, u.scenario)
      case Some(Left(v)) => getScenario(u.model, u.scenario, Some(v))
      case None => getScenario(u.model, u.scenario, None)
    }
  }

  // ---- codelists (reference base.py:203-408) -------------------------

  def units(): Seq[String] = store.units()
  def addUnit(u: String): Unit = store.addUnit(u)

  /** Model/scenario name codelists (reference base.py:300-338):
    * explicit `add*` entries plus the names auto-extended by run
    * creation — a name registered with no run still lists. */
  def modelNames(): Seq[String] = store.modelNames()
  def addModelName(name: String): Unit = store.addModelName(name)
  def scenarioNames(): Seq[String] = store.scenarioNames()
  def addScenarioName(name: String): Unit = store.addScenarioName(name)

  def regions(): DataFrame = store.regions()
  def addRegion(region: String, hierarchy: String, parent: Option[String] = None): Unit =
    store.addRegion(region, hierarchy, parent)
  def addRegionSynonym(region: String, mappedTo: String): Unit =
    store.addRegionSynonym(region, mappedTo)

  def timeslices(): DataFrame = store.timeslices()
  def addTimeslice(name: String, category: String, duration: Double): Unit =
    store.addTimeslice(name, category, duration)

  // ---- meta key-value store (reference base.py:1115-1220) ------------

  /** Set metadata on one of the four targets: (m,s,v), (m,s), (m,),
    * (s,). Values stored as JSON strings (reference jdbc.py:222-256
    * BigDecimal/ArrayList wrapping → JSON here). A name is unique
    * across targets for a given (model, scenario) pair. */
  def setMeta(name: String, valueJson: String, model: Option[String] = None,
      scenario: Option[String] = None, version: Option[Int] = None): Unit = {
    require(model.isDefined || scenario.isDefined, "meta target requires model or scenario")
    require(version.isEmpty || (model.isDefined && scenario.isDefined),
      "a version target requires model and scenario")
    // a name is unique ACROSS targets (doc/data-model.rst:145-169):
    // replace the name on every target that shares this model/scenario
    // context. "Shares" = the row and the new target AGREE on at least
    // one coordinate both specify, and contradict none — a row is kept
    // when it names a DIFFERENT value on a shared axis, and also when
    // the two targets touch disjoint axes entirely (a model-A entry
    // must survive a scenario-Z write: an unspecified axis used to
    // degenerate to `true` and over-delete unrelated levels).
    val cur = store.meta()
    val axes: Seq[(String, Option[Any])] = Seq(
      ("target_model", model), ("target_scenario", scenario),
      ("target_version", version.map(Integer.valueOf)))
    val sharedAny = axes.collect { case (c, Some(_)) => col(c).isNotNull }
      .foldLeft(lit(false))(_ || _)
    val sharedAgree = axes.collect { case (c, Some(x)) =>
      col(c).isNull || col(c) <=> lit(x)
    }.foldLeft(lit(true))(_ && _)
    val without = cur.filter(!(col("name") === name && sharedAny && sharedAgree))
    val row = Row(model.orNull, scenario.orNull,
      version.map(Integer.valueOf).orNull, name, valueJson)
    store.writeMeta(without.unionByName(spark.createDataFrame(
      java.util.Arrays.asList(row), ParquetStore.metaSchema)))
  }

  // shared meta-target matcher (review r9: was duplicated verbatim in
  // getMeta and removeMeta — a semantics fix must land once)
  private def eqOrNull(c: String, v: Option[Any]): org.apache.spark.sql.Column =
    v.map(x => col(c) <=> lit(x)).getOrElse(col(c).isNull)

  /** Non-strict read coalesces values from less-specific targets,
    * most-specific-wins per name (reference base.py:1129-1158; SURVEY
    * §2 #24: union of 4 filtered scans + priority window). */
  def getMeta(model: Option[String] = None, scenario: Option[String] = None,
      version: Option[Int] = None, strict: Boolean = false): DataFrame = {
    val m = store.meta()
    if (strict)
      m.filter(eqOrNull("target_model", model) &&
        eqOrNull("target_scenario", scenario) &&
        eqOrNull("target_version", version.map(Integer.valueOf)))
        .select("name", "value_json")
    else {
      // specificity: (m,s,v)=4 > (m,s)=3 > (m,)=2 > (s,)=1
      val candidates = m.withColumn("specificity",
        when(eqOrNull("target_model", model) && eqOrNull("target_scenario", scenario) &&
          eqOrNull("target_version", version.map(Integer.valueOf)) &&
          lit(version.isDefined), 4)
          .when(eqOrNull("target_model", model) && eqOrNull("target_scenario", scenario) &&
            col("target_version").isNull && lit(model.isDefined && scenario.isDefined), 3)
          .when(eqOrNull("target_model", model) && col("target_scenario").isNull &&
            col("target_version").isNull && lit(model.isDefined), 2)
          .when(col("target_model").isNull && eqOrNull("target_scenario", scenario) &&
            col("target_version").isNull && lit(scenario.isDefined), 1)
          .otherwise(0))
        .filter(col("specificity") > 0)
      val w = Window.partitionBy("name").orderBy(col("specificity").desc)
      candidates.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("name", "value_json")
    }
  }

  def removeMeta(names: Seq[String], model: Option[String] = None,
      scenario: Option[String] = None, version: Option[Int] = None): Unit = {
    store.writeMeta(store.meta().filter(!(
      col("name").isin(names: _*) &&
        eqOrNull("target_model", model) &&
        eqOrNull("target_scenario", scenario) &&
        eqOrNull("target_version", version.map(Integer.valueOf)))))
  }

  // ---- multi-run TS export (reference platform.py:197-260) -----------

  /** Filtered export across ALL runs as one distributed job, with the
    * reference's `FIELDS["write_file"]` upper-cased IAMC columns
    * (backend/common.py:35-46). `defaultOnly=false` + `allRuns` mirror
    * the reference's `default`/`export_all_runs` flags. */
  def exportTimeseriesData(
      model: Option[String] = None, scenario: Option[String] = None,
      variable: Seq[String] = Nil, unit: Seq[String] = Nil,
      region: Seq[String] = Nil, defaultOnly: Boolean = true): DataFrame = {
    var runs = store.listRuns(defaultOnly, model, scenario)
      .select(col("run_id"), col("model"), col("scenario"), col("version"))
    var fact = store.allTsData()
    if (variable.nonEmpty) fact = fact.filter(col("variable").isin(variable: _*))
    if (unit.nonEmpty) fact = fact.filter(col("unit").isin(unit: _*))
    if (region.nonEmpty) fact = fact.filter(col("region").isin(region: _*))
    fact.join(broadcast(runs), "run_id")
      .select(col("model").as("MODEL"), col("scenario").as("SCENARIO"),
        col("version").as("VERSION"), col("variable").as("VARIABLE"),
        col("unit").as("UNIT"), col("region").as("REGION"),
        col("meta").as("META"), col("subannual").as("SUBANNUAL"),
        col("year").as("YEAR"), col("value").as("VALUE"))
  }
}

object Platform {
  /** Resolve a full `ixmp://PLATFORM/MODEL/SCENARIO#VERSION` URL:
    * open the NAMED platform through the registry (so the platform
    * component is honored, not dropped — reference
    * TimeSeries.from_url + Config.get_platform_info,
    * _config.py:374-424), then the scenario within it. URLs without a
    * platform component use the registry default. */
  def fromUrl(spark: SparkSession, url: String,
      registry: PlatformRegistry = PlatformRegistry()): (Platform, Scenario) = {
    val u = graft.util.Util.parseUrl(url)
    val mp = PlatformRegistry.open(spark, u.platform.getOrElse("default"), registry)
    (mp, mp.fromUrl(url))
  }
}
