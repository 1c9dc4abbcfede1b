package graft.core

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.store.{ItemDef, ItemType, RunInfo}
import graft.util.Util

/** Scenario = TimeSeries + scheme + model data items
  * (reference: ixmp/core/scenario.py:44-66; doc/data-model.rst:55-68).
  */
class Scenario(platform0: Platform, run0: RunInfo)
    extends TimeSeries(platform0, run0) {

  def scheme: String = run.scheme

  // ---- item catalog (reference scenario.py:391-435, 562-608) ---------

  def initItem(name: String, t: ItemType.Value, idxSets: Seq[String] = Nil,
      idxNames: Seq[String] = Nil): Unit = {
    requireCheckedOut()
    val names = if (idxNames.nonEmpty) idxNames else idxSets
    require(names.length == idxSets.length,
      s"length mismatch: idx_names $names vs idx_sets $idxSets")
    store.initItem(runId, ItemDef(name, t, idxSets, names))
  }

  def initSet(name: String, idxSets: Seq[String] = Nil, idxNames: Seq[String] = Nil): Unit =
    initItem(name, ItemType.Set, idxSets, idxNames)
  def initPar(name: String, idxSets: Seq[String], idxNames: Seq[String] = Nil): Unit =
    initItem(name, ItemType.Par, idxSets, idxNames)
  def initVar(name: String, idxSets: Seq[String] = Nil, idxNames: Seq[String] = Nil): Unit =
    initItem(name, ItemType.Var, idxSets, idxNames)
  def initEqu(name: String, idxSets: Seq[String] = Nil, idxNames: Seq[String] = Nil): Unit =
    initItem(name, ItemType.Equ, idxSets, idxNames)

  /** 0-D parameter = scalar (reference scenario.py:755-795). */
  def initScalar(name: String, value: Double, unit: String): Unit = {
    initPar(name, Nil)
    changeScalar(name, value, unit)
  }

  def setList(): Seq[String] = store.listItems(runId, ItemType.Set)
  def parList(): Seq[String] = store.listItems(runId, ItemType.Par)
  def varList(): Seq[String] = store.listItems(runId, ItemType.Var)
  def equList(): Seq[String] = store.listItems(runId, ItemType.Equ)
  def hasItem(name: String): Boolean = store.itemDef(runId, name).isDefined
  def idxSets(name: String): Seq[String] = itemDefOf(name).idxSets
  def idxNames(name: String): Seq[String] = itemDefOf(name).idxNames
  /** Items whose index sets include `setName` (scenario.py:391-435). */
  def itemsIndexedBy(setName: String): Seq[String] = store.itemsIndexedBy(runId, setName)

  /** Bulk preload: warm the unfiltered item cache for EVERY item of
    * this run plus the TS slice (reference load_scenario_data,
    * scenario.py:145-160 — the bulk sibling of preloadTimeseries).
    * Each item frame enters the store's persisted CachingBackend
    * equivalent; the count() forces materialization so subsequent
    * reads — filtered or not — are served from memory. */
  def loadScenarioData(): Unit = {
    (setList() ++ parList() ++ varList() ++ equList()).foreach { n =>
      store.itemData(runId, n, Map.empty).count()
    }
    preloadTimeseries()
  }

  /** Iterate (name, data) over every item of type `t`, applying to each
    * item only the filter keys that overlap its dimensions; when a
    * non-empty filter shares NO key with an item, that item is skipped
    * entirely (reference iter_item_data, scenario.py:437-532). Lazy —
    * each DataFrame plan is built when the iterator reaches it, so
    * consuming only a prefix costs only that prefix. */
  def iterItemData(t: ItemType.Value,
      filters: Map[String, Seq[Any]] = Map.empty,
      indexedBy: Option[String] = None): Iterator[(String, DataFrame)] = {
    val names = indexedBy match {
      case Some(s) =>
        store.itemsIndexedBy(runId, s).filter(n => itemDefOf(n).itemType == t)
      case None => store.listItems(runId, t)
    }
    names.iterator.flatMap { n =>
      val dims = idxNames(n).toSet
      if (filters.nonEmpty && filters.keySet.intersect(dims).isEmpty) None
      else {
        val f = filters.filter { case (k, _) => dims(k) }
        val data = t match {
          case ItemType.Set => set(n, f)
          case ItemType.Par => par(n, f)
          case ItemType.Var => variable(n, f)
          case _ => equation(n, f)
        }
        Some(n -> data)
      }
    }
  }

  /** Iterate (name, data) over parameters (reference iter_par_data,
    * scenario.py:437-473). */
  def iterParData(filters: Map[String, Seq[Any]] = Map.empty,
      indexedBy: Option[String] = None): Iterator[(String, DataFrame)] =
    iterItemData(ItemType.Par, filters, indexedBy)

  private def itemDefOf(name: String): ItemDef =
    store.itemDef(runId, name).getOrElse(
      throw new NoSuchElementException(s"no item '$name' in run $runId"))

  // ---- key validation (reference base.py:1070-1074; SURVEY §2 #21) ---

  /** Every written key must be an element of its indexing set; the
    * violation message mirrors the reference
    * (tests/core/test_scenario.py:877-886). One left_anti per dim —
    * each a broadcast join against a (small) index set. */
  private def validateKeys(d: ItemDef, df: DataFrame): Unit = {
    d.idxNames.zip(d.idxSets).foreach { case (dim, setName) =>
      val sd = store.itemDef(runId, setName).getOrElse(
        throw new NoSuchElementException(s"no index set '$setName' in run $runId"))
      val elemCol = if (sd.idxNames.isEmpty) setName else sd.idxNames.head
      val missing = df.select(col(dim).as("__elem")).distinct()
        .join(itemData(setName).select(col(elemCol).as("__elem")).distinct(),
          Seq("__elem"), "left_anti")
        .limit(1).collect()
      if (missing.nonEmpty)
        throw new IllegalArgumentException(
          s"The index set '$setName' does not have an element '${missing.head.getString(0)}'!")
    }
  }

  private def itemData(name: String, filters: Map[String, Seq[Any]] = Map.empty): DataFrame =
    store.itemData(runId, name,
      filters.map { case (k, v) => k -> Util.asStrList(v) })

  // ---- sets (reference scenario.py:219-346) --------------------------

  /** Read a set: simple sets come back as a single-column frame of
    * elements; indexed sets as a frame of idx_names columns. */
  def set(name: String, filters: Map[String, Seq[Any]] = Map.empty): DataFrame = {
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Set, s"'$name' is not a set")
    if (d.idxNames.isEmpty) itemData(name, filters).toDF(name)
    else itemData(name, filters)
  }

  // shared element->Row coercion for the SET add/remove paths (review
  // r9: was duplicated verbatim — add and remove must agree on which
  // stored row a given element tuple addresses)
  private def elementRows(elements: Seq[Any]): Seq[Row] = elements.map {
    case s: Seq[_] => Row(s.map(Util.asStr): _*)
    case p: Product => Row(p.productIterator.map(Util.asStr).toSeq: _*)
    case one => Row(Util.asStr(one))
  }

  /** Add elements to a set; strings, sequences, or a DataFrame of
    * idx_names columns. Keys are str-coerced; duplicates collapse. */
  def addSet(name: String, elements: Seq[Any]): Unit = {
    requireCheckedOut()
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Set, s"'$name' is not a set")
    if (d.idxNames.isEmpty) {
      val rows = elements.map(e => Row(Util.asStr(e)))
      addSetDf(name, spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(Seq(StructField(name, StringType)))))
    } else {
      val rows = elementRows(elements)
      addSetDf(name, spark.createDataFrame(
        java.util.Arrays.asList(rows: _*),
        StructType(d.idxNames.map(n => StructField(n, StringType)))))
    }
  }

  def addSetDf(name: String, df: DataFrame): Unit = {
    requireCheckedOut()
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Set, s"'$name' is not a set")
    val cols = if (d.idxNames.isEmpty) Seq(name) else d.idxNames
    val incoming = df.select(cols.map(c => col(c).cast("string").as(c)): _*)
    if (d.idxNames.nonEmpty) validateKeys(d, incoming)
    val existing =
      if (d.idxNames.isEmpty) itemData(name).toDF(name) else itemData(name)
    store.writeItemData(runId, name,
      existing.unionByName(incoming).distinct())
  }

  def removeSet(name: String, elements: Seq[Any]): Unit = {
    requireCheckedOut()
    val d = itemDefOf(name)
    // same guard as addSet: without it a parameter name would silently
    // lose matching rows through a SET api (the anti-join keys on
    // idx_names and passes value/unit columns straight through)
    require(d.itemType == ItemType.Set, s"'$name' is not a set")
    if (d.idxNames.isEmpty) {
      val keep = itemData(name).toDF(name)
        .filter(!col(name).isin(Util.asStrList(elements): _*))
      store.writeItemData(runId, name, keep)
    } else {
      val rows = elementRows(elements)
      val toDrop = spark.createDataFrame(java.util.Arrays.asList(rows: _*),
        StructType(d.idxNames.map(n => StructField(n, StringType))))
      store.writeItemData(runId, name,
        itemData(name).join(toDrop, d.idxNames, "left_anti"))
    }
  }

  /** Delete the whole item and its catalog entry
    * (reference remove_set/remove_par without keys). */
  def deleteItem(name: String): Unit = {
    requireCheckedOut()
    store.deleteItem(runId, name)
  }

  // ---- parameters (reference scenario.py:640-795) --------------------

  /** Filtered parameter read; values absent from data are silently
    * ignored (base.py:997-1005). 0-D parameters: use [[scalar]]. */
  def par(name: String, filters: Map[String, Seq[Any]] = Map.empty): DataFrame = {
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Par, s"'$name' is not a parameter")
    itemData(name, filters)
  }

  /** Add/overwrite parameter rows from a DataFrame with idx_names +
    * value (+ unit) columns. New keys replace existing ones (reference
    * add_par upsert semantics). */
  def addPar(name: String, df: DataFrame, defaultUnit: Option[String] = None): Unit = {
    requireCheckedOut()
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Par, s"'$name' is not a parameter")
    var in = df
    if (!in.columns.contains("unit"))
      in = in.withColumn("unit",
        lit(defaultUnit.getOrElse(
          throw new IllegalArgumentException("no unit column and no default unit"))))
    // persist the caller's frame ONCE (review r9): per-dim key
    // validation + unit check + anti-join + write would otherwise
    // re-execute the input plan K+2 times — slow, and an upstream
    // non-deterministic source could validate different rows than it
    // writes
    val incoming = in.select(
      d.idxNames.map(c => col(c).cast("string").as(c)) ++
        Seq(col("value").cast("double"), col("unit").cast("string")): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      validateKeys(d, incoming)
      // units must exist in the Platform unit codelist
      // (doc/data-model.rst:275-284)
      val known = platform.units().toSet
      val unknown = incoming.select("unit").distinct().collect()
        .map(_.getString(0)).filterNot(known.contains)
      require(unknown.isEmpty,
        s"The unit '${unknown.head}' does not exist in the database!")
      val existing = itemData(name)
      val kept =
        if (d.idxNames.isEmpty) existing.limit(0) // scalar overwrite
        else existing.join(incoming.select(d.idxNames.map(col): _*).distinct(),
          d.idxNames, "left_anti")
      store.writeItemData(runId, name, kept.unionByName(incoming))
    } finally { incoming.unpersist(blocking = false); () }
  }

  /** Convenience form: one key tuple + value + unit. */
  def addPar(name: String, key: Seq[Any], value: Double, unit: String): Unit = {
    val d = itemDefOf(name)
    val row = Row(key.map(Util.asStr) :+ value :+ unit: _*)
    addPar(name, spark.createDataFrame(java.util.Arrays.asList(row),
      StructType(d.idxNames.map(n => StructField(n, StringType)) :+
        StructField("value", DoubleType) :+ StructField("unit", StringType))))
  }

  /** update_par: add only keys not already present (SURVEY §2 #20). */
  def updatePar(name: String, df: DataFrame, defaultUnit: Option[String] = None): Unit = {
    val d = itemDefOf(name)
    val onlyNew = Util.updatePar(itemData(name), df, d.idxNames)
    if (!onlyNew.isEmpty) addPar(name, onlyNew, defaultUnit)
  }

  def removePar(name: String, keys: DataFrame): Unit = {
    requireCheckedOut()
    val d = itemDefOf(name)
    // the removeSet guard, mirrored (review r12): without it a SET or
    // solution item named through the PAR api silently loses matching
    // rows — the anti-join keys on idx_names and would pass any item's
    // remaining columns straight through
    require(d.itemType == ItemType.Par, s"'$name' is not a parameter")
    store.writeItemData(runId, name,
      itemData(name).join(
        keys.select(d.idxNames.map(c => col(c).cast("string").as(c)): _*).distinct(),
        d.idxNames, "left_anti"))
  }

  /** 0-D scalar read → (value, unit) (reference scenario.py:735-753;
    * jdbc.py:1265-1270 returns {"value":…, "unit":…}). */
  def scalar(name: String): (Double, String) = {
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Par && d.idxNames.isEmpty, s"'$name' is not a scalar")
    val rows = itemData(name).select("value", "unit").limit(1).collect()
    // named error, not head-of-empty-iterator (review r9; the
    // getRunById precedent): declared-but-never-assigned scalars
    require(rows.nonEmpty, s"scalar '$name' has no value assigned")
    (rows.head.getDouble(0), rows.head.getString(1))
  }

  def changeScalar(name: String, value: Double, unit: String): Unit = {
    requireCheckedOut()
    val d = itemDefOf(name)
    // Par check too (review r9): a 0-D SET passed the idxNames-only
    // guard and failed later with a raw unresolved-column error
    require(d.itemType == ItemType.Par && d.idxNames.isEmpty,
      s"'$name' is not a scalar")
    require(platform.units().contains(unit),
      s"The unit '$unit' does not exist in the database!")
    store.writeItemData(runId, name, spark.createDataFrame(
      java.util.Arrays.asList(Row(value, unit)),
      StructType(Seq(StructField("value", DoubleType), StructField("unit", StringType)))))
  }

  // ---- solution var/equ (reference base.py:1075-1079) ----------------

  def variable(name: String, filters: Map[String, Seq[Any]] = Map.empty): DataFrame = {
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Var, s"'$name' is not a variable")
    itemData(name, filters)
  }

  def equation(name: String, filters: Map[String, Seq[Any]] = Map.empty): DataFrame = {
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Equ, s"'$name' is not an equation")
    itemData(name, filters)
  }

  /** Written only by a model solve, not the user API (base.py:1075-1079). */
  private[graft] def setSolution(name: String, df: DataFrame): Unit = {
    val d = itemDefOf(name)
    require(d.itemType == ItemType.Var || d.itemType == ItemType.Equ,
      s"'$name' is not a solution item")
    store.writeItemData(runId, name, df.select(
      d.idxNames.map(c => col(c).cast("string").as(c)) ++
        Seq(col("lvl").cast("double"), col("mrg").cast("double")): _*))
  }

  def hasSolution: Boolean =
    (varList() ++ equList()).exists(n => !itemData(n).isEmpty)

  /** Delete var/equ data + non-meta TS rows from `firstModelYear` on
    * (reference scenario.py:951-972; jdbc.py:1410-1421). */
  def removeSolution(firstModelYear: Option[Int] = None): Unit = {
    require(hasSolution, "This Scenario does not have a solution!")
    // never interleave with a live transaction (review r9): the
    // reference wraps clear_solution in the backend's own transaction;
    // here a checked-out run's later commit would publish its staged
    // TS generation OVER the removal, silently resurrecting the
    // solution — refuse instead
    val lockHolder = store.getRunById(runId).lockUser
    require(lockHolder.isEmpty && !checkedOut,
      "cannot remove the solution of a checked-out run" +
        lockHolder.fold("")(u => s" (checked out by '$u')") +
        " — commit or discard first")
    (varList() ++ equList()).foreach { n =>
      store.writeItemData(runId, n, itemData(n).limit(0))
    }
    val ts = store.tsData(runId)
    val kept = firstModelYear match {
      case Some(y) => ts.filter(col("meta") || col("year") < y)
      case None => ts.filter(col("meta"))
    }
    store.writeTsData(runId, kept)
  }

  // ---- categories (reference base.py:1231-1288) ----------------------

  def catList(setName: String): Seq[String] =
    store.categories(runId, setName).select("category").distinct()
      .collect().map(_.getString(0)).toSeq.sorted

  def cat(setName: String, category: String): Seq[String] =
    store.categories(runId, setName).filter(col("category") === category)
      .select("member").collect().map(_.getString(0)).toSeq.sorted

  def addCatElement(setName: String, category: String, elements: Seq[Any],
      isUnique: Boolean = false): Unit = {
    requireCheckedOut()
    val els = Util.asStrList(elements)
    // elements must exist in the mapped set (same FK rule as items)
    val d = itemDefOf(setName)
    val elemCol = if (d.idxNames.isEmpty) setName else d.idxNames.head
    val present = set(setName).select(col(elemCol)).collect().map(_.getString(0)).toSet
    els.foreach(e => require(present.contains(e),
      s"The index set '$setName' does not have an element '$e'!"))
    if (isUnique) require(els.size == 1, s"one element expected for is_unique")
    val cur = store.categories(runId, setName)
    val base = if (isUnique) cur.filter(col("category") =!= category) else cur
    val rows = els.map(e => Row(setName, category, e))
    store.writeCategories(runId, setName,
      base.select(col("category"), col("member")).unionByName(
        spark.createDataFrame(java.util.Arrays.asList(rows: _*),
          graft.store.ParquetStore.catSchema)
          .select(col("category"), col("member"))))
  }

  // ---- Excel facade (reference Scenario.to_excel / read_excel,
  // scenario.py:1078-1153) --------------------------------------------

  /** Write this scenario to a real .xlsx workbook (to_excel: sheet per
    * item, EXCEL_MAX_ROWS split, write filters on parameters). */
  def toExcel(path: String, includeSolution: Boolean = false,
      filters: Map[String, Seq[Any]] = Map.empty,
      maxRowsPerSheet: Int = graft.io.Xlsx.MaxRows): Unit =
    graft.io.ScenarioIO.writeScenarioXlsx(this, path, includeSolution,
      maxRowsPerSheet, filters)

  /** Read an .xlsx workbook into this (checked-out) scenario
    * (read_excel: init_items inference, add_units registration). */
  def readExcel(path: String, initItems: Boolean = false,
      addUnits: Boolean = false): Unit =
    graft.io.ScenarioIO.readScenarioXlsx(this, path, initItems, addUnits)

  /** Category mapping as a quantity: (category, member) → 1.0 plus an
    * 'all' row per member (reference map_as_qty, operator.py:204-241). */
  def mapAsQty(setName: String): DataFrame = {
    val d = itemDefOf(setName)
    val elemCol = if (d.idxNames.isEmpty) setName else d.idxNames.head
    store.categories(runId, setName)
      .select(col("category"), col("member"))
      .unionByName(set(setName).select(lit("all").as("category"),
        col(elemCol).as("member")))
      .withColumn("value", lit(1.0))
  }

  // ---- clone (reference scenario.py:870-945; SURVEY §2 #49) ----------

  /** Copy this Scenario to a new run: metadata-plus-data copy with a
    * new run_id (the reference's generic `_clone` path is the only
    * path here). `shiftFirstModelYear` truncates non-meta TS rows at
    * the year and drops the solution. */
  def cloneScenario(model: Option[String] = None, scenario: Option[String] = None,
      keepSolution: Boolean = true, shiftFirstModelYear: Option[Int] = None,
      platformDest: Option[Platform] = None): Scenario = {
    val dest = platformDest.getOrElse(platform)
    // a checked-out source would leak its UNCOMMITTED staged
    // generations into the clone (itemData resolves the pending
    // overlay); a later discard() on the source would then roll back
    // the source but not the clone (review r9) — refuse
    val lockHolder = store.getRunById(runId).lockUser
    require(lockHolder.isEmpty && !checkedOut,
      "cannot clone a checked-out run" +
        lockHolder.fold("")(u => s" (checked out by '$u')") +
        " — commit or discard first")
    val newRun = dest.store.createRun(model.getOrElse(this.model),
      scenario.getOrElse(this.scenario), scheme, run.annotation)
    val dropSolution = !keepSolution || shiftFirstModelYear.isDefined
    // item catalog + data
    for (t <- Seq(ItemType.Set, ItemType.Par, ItemType.Var, ItemType.Equ);
        name <- store.listItems(runId, t)) {
      val d = store.itemDef(runId, name).get
      dest.store.initItem(newRun.runId, d)
      val data = store.itemData(runId, name)
      val copied =
        if (dropSolution && (t == ItemType.Var || t == ItemType.Equ)) data.limit(0)
        else data
      dest.store.writeItemData(newRun.runId, name, copied)
    }
    // TS + geo facts: non-meta rows truncated before shift year
    val ts = store.tsData(runId)
    val tsKept = shiftFirstModelYear match {
      case Some(y0) => ts.filter(col("meta") || col("year") < y0)
      case None => if (keepSolution) ts else ts.filter(col("meta"))
    }
    dest.store.writeTsData(newRun.runId, tsKept)
    dest.store.writeGeoData(newRun.runId, store.geoData(runId))
    // categories
    for (setName <- store.listItems(runId, ItemType.Set)) {
      val cats = store.categories(runId, setName)
      if (!cats.isEmpty)
        dest.store.writeCategories(newRun.runId, setName,
          cats.select("category", "member"))
    }
    dest.store.setDefault(newRun.runId)
    new Scenario(dest, dest.store.getRunById(newRun.runId))
  }

  // ---- solve loop (reference scenario.py:974-1075) -------------------

  /** Run the model, iterating with an optional convergence callback
    * (reference solve(): loops model run + callback until truthy, with
    * an iteration cap mirroring max_iterations). */
  def solve(model: graft.model.ModelAdapter,
      callback: Scenario => Boolean = _ => true,
      maxIterations: Int = 100): Unit = {
    require(!hasSolution, "Scenario contains a model solution; call removeSolution() first")
    var it = 0
    var done = false
    while (!done && it < maxIterations) {
      model.run(this)
      it += 1
      done = callback(this)
    }
    require(done, s"solve did not converge in $maxIterations iterations")
  }
}
