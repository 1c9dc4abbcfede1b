package graft.io

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._

import graft.core.Scenario
import graft.store.ItemType

/** File round-trip of scenario item data, honoring the reference's
  * Excel contract (reference: ixmp/backend/io.py:55-362 +
  * doc/file-io.rst:22-80) re-cut for a distributed engine: one
  * CSV directory per item instead of a sheet (sheet-size caps are a
  * single-file artifact; CSV directories shard naturally), plus an
  * `ix_type_mapping` table listing (item, ix_type).
  *
  * Contract kept from the reference:
  *  - empty sets ARE written; empty par/var/equ are OMITTED
  *    (io.py:85-101);
  *  - 0-D scalars become 1-row value/unit frames (io.py:95-98);
  *  - var/equ data is written only on request and SKIPPED on read —
  *    solution data re-enters only via a solve (doc/file-io.rst:48-51);
  *  - reading initializes index sets before indexed sets (2-pass with
  *    requeue, io.py:232-308);
  *  - `initItems=true` infers missing item declarations with the
  *    documented ambiguity rules (doc/file-io.rst:53-80).
  */
object ScenarioIO {

  private val MappingFile = "ix_type_mapping"

  /** Write SET|PAR (default) or also VAR/EQU item data under `dir`. */
  def writeScenario(s: Scenario, dir: String, includeSolution: Boolean = false): Unit = {
    val entries = mutable.ListBuffer.empty[(String, String, String)]

    def writeItem(name: String, t: String, df: DataFrame, keepEmpty: Boolean): Unit = {
      if (keepEmpty || !df.isEmpty) {
        df.write.mode(SaveMode.Overwrite).option("header", true)
          .csv(s"$dir/item=$name")
        // Record the column list: Spark writes no files (hence no header)
        // for an empty DataFrame, so an empty set's schema must survive
        // through the mapping table for the read side (ADVICE r1).
        // '|' is the separator — a dim named "a|b" would silently
        // round-trip as two columns (review r9); refuse instead
        require(df.columns.forall(!_.contains("|")),
          s"item '$name': column names must not contain '|' " +
            s"(got ${df.columns.mkString(", ")})")
        entries += ((name, t, df.columns.mkString("|")))
      }
    }

    s.setList().foreach(n => writeItem(n, "set", s.set(n), keepEmpty = true))
    // scalars come through par() as 1-row value/unit frames (io.py:95-98)
    s.parList().foreach(n => writeItem(n, "par", s.par(n), keepEmpty = false))
    if (includeSolution) {
      s.varList().foreach(n => writeItem(n, "var", s.variable(n), keepEmpty = false))
      s.equList().foreach(n => writeItem(n, "equ", s.equation(n), keepEmpty = false))
    }
    val spark = s.platform.spark
    import spark.implicits._
    entries.toSeq.toDF("item", "ix_type", "columns")
      .coalesce(1).write.mode(SaveMode.Overwrite).option("header", true)
      .csv(s"$dir/$MappingFile")
  }

  /** Read item data from `dir` into the (checked-out) scenario.
    * Existing declarations are reused; with `initItems` missing items
    * are inferred (sets: all-string columns; pars: columns minus
    * value/unit are dims indexed by the same-named sets). */
  def readScenario(s: Scenario, dir: String, initItems: Boolean = false,
      addUnits: Boolean = false): Unit = {
    val spark = s.platform.spark
    val mappingDf = spark.read.option("header", true).csv(s"$dir/$MappingFile")
    val hasColumnList = mappingDf.columns.contains("columns")
    val mappingRows = mappingDf.collect() // one job, reused below
    val mapping = mappingRows.map(r => r.getString(0) -> r.getString(1))
    val declaredCols: Map[String, Seq[String]] =
      if (!hasColumnList) Map.empty
      else mappingRows.map { r =>
        r.getString(0) -> Option(r.getAs[String]("columns"))
          .map(_.split("\\|", -1).toSeq).getOrElse(Nil)
      }.toMap

    def loadItem(name: String): DataFrame =
      try spark.read.option("header", true).csv(s"$dir/item=$name")
      catch {
        // An empty item writes no part files, so schema inference has
        // nothing to read; rebuild an empty frame from the recorded
        // column list (all dims are strings in the data model, §1.4).
        case e: org.apache.spark.sql.AnalysisException =>
          val cols = declaredCols.getOrElse(name, Nil).filter(_.nonEmpty)
          if (cols.isEmpty) throw e
          import org.apache.spark.sql.types.{StringType, StructField, StructType}
          spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            StructType(cols.map(c => StructField(c, StringType))))
      }

    loadItems(s, mapping.toSeq, loadItem, initItems, addUnits)
  }

  /** Shared item-loading core for the CSV-directory and .xlsx readers:
    * 2-pass set topology (index sets before indexed sets, with requeue
    * — io.py:232-308), optional item inference, var/equ skipped
    * (doc/file-io.rst:48-51). */
  private def loadItems(s: Scenario, mapping: Seq[(String, String)],
      loadItem: String => DataFrame, initItems: Boolean,
      addUnits: Boolean = false): Unit = {
    // --- pass 1+2: sets, index sets before indexed sets (io.py:232-308)
    val fileSets = mapping.collect { case (n, "set") => n }.toIndexedSeq
    val fileSetNames = fileSets.toSet
    val setQueue = mutable.Queue(fileSets: _*)
    // a set requeued behind its index sets must not re-run the whole
    // source read (schema inference included) on every pass
    val preloaded = mutable.Map.empty[String, DataFrame]
    // review r9: readiness must mean the index set's ELEMENTS are
    // loaded, not merely that its declaration exists — a pre-declared
    // but still-empty index set earlier let an indexed set validate
    // against nothing and fail on a perfectly valid file
    val loaded = mutable.Set.empty[String]
    var stalls = 0
    while (setQueue.nonEmpty && stalls <= setQueue.size) {
      val name = setQueue.dequeue()
      val df = preloaded.getOrElseUpdate(name, loadItem(name))
      val isSimple = df.columns.length == 1
      val declared = s.hasItem(name)
      if (!declared) {
        require(initItems, s"item '$name' does not exist and initItems=false")
        if (isSimple) s.initSet(name)
        else s.initSet(name, df.columns.toSeq, df.columns.toSeq)
      }
      val idxSets = if (s.hasItem(name)) s.idxSets(name) else Nil
      val ready = idxSets.forall(is =>
        s.hasItem(is) && (!fileSetNames(is) || loaded(is)))
      if (!ready) { setQueue.enqueue(name); stalls += 1 }
      else {
        stalls = 0
        if (!df.isEmpty) s.addSetDf(name, df)
        loaded += name
      }
    }
    require(setQueue.isEmpty,
      s"circular or unsatisfiable index-set references among ${setQueue.mkString(", ")}")

    // --- pars; var/equ are intentionally skipped (doc/file-io.rst:48-51)
    var knownUnits = s.platform.units().toSet
    mapping.collect { case (n, "par") => n }.foreach { name =>
      val df = loadItem(name)
      if (!s.hasItem(name)) {
        require(initItems, s"item '$name' does not exist and initItems=false")
        val dims = df.columns.filterNot(Seq("value", "unit").contains).toSeq
        s.initPar(name, dims, dims)
      }
      if (addUnits && df.columns.contains("unit")) {
        // register units this parameter introduces (io.py:328-340)
        val fresh = df.select("unit").distinct().collect()
          .map(_.getString(0)).filter(u => u != null && !knownUnits.contains(u))
        fresh.foreach(s.platform.addUnit)
        knownUnits ++= fresh
      }
      s.addPar(name, df.withColumn("value", col("value").cast("double")))
    }
  }

  // ---- native .xlsx round-trip (reference s_write_excel /
  // s_read_excel, io.py:55-154 and 206-362) --------------------------

  /** Write the scenario to a real .xlsx workbook: one sheet per item,
    * split at `maxRowsPerSheet` rows into `name(2)`, `name(3)`, …
    * sheets (EXCEL_MAX_ROWS contract, io.py:22 + 126-139), plus an
    * `ix_type_mapping` sheet of (item, ix_type). Empty sets ARE
    * written (header-only sheet); empty par/var/equ are omitted;
    * scalars become 1-row value/unit frames; var/equ only on request
    * (io.py:85-101).
    *
    * Rows stream through `toLocalIterator`, so driver memory stays
    * O(sheet chunk) — the reference collects whole items into pandas
    * (scenario.py:1078-1117); items are catalog-small by contract. */
  def writeScenarioXlsx(s: Scenario, path: String,
      includeSolution: Boolean = false,
      maxRowsPerSheet: Int = Xlsx.MaxRows,
      filters: Map[String, Seq[Any]] = Map.empty): Unit = {
    require(maxRowsPerSheet >= 2, "need at least a header and one data row per sheet")
    import scala.jdk.CollectionConverters._
    val sheets = mutable.ListBuffer.empty[(String, Iterator[Seq[Any]])]
    val mapping = mutable.ListBuffer.empty[(String, String)]

    // write filters apply to PARAMETERS only, and per item only the
    // filters naming one of its dimensions (io.py:96-103)
    def parFilters(name: String): Map[String, Seq[Any]] = {
      val dims = s.idxNames(name).toSet
      filters.filter { case (k, _) => dims.contains(k) }
    }

    val persisted = mutable.ListBuffer.empty[DataFrame]
    def add(name: String, t: String, df0: DataFrame, keepEmpty: Boolean): Unit = {
      // ONE materialization serves both the row count and the later
      // sheet iterator (review r9: count() then toLocalIterator ran
      // the plan twice, and a store mutation between the two jobs
      // could silently drop rows past the counted chunk boundary)
      val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      persisted += df
      val n = df.count()
      if (n > 0 || keepEmpty) {
        mapping += ((name, t))
        val header: Seq[Any] = df.columns.toSeq
        val chunkRows = maxRowsPerSheet - 1 // header occupies one row
        val nChunks = math.max(1, math.ceil(n.toDouble / chunkRows).toInt)
        // one shared row iterator per item, consumed chunk-by-chunk as
        // the writer reaches each sheet (sheet names must be known up
        // front for workbook.xml, the data must not be resident)
        lazy val groups =
          df.toLocalIterator().asScala.map(_.toSeq).grouped(chunkRows)
        (0 until nChunks).foreach { ci =>
          val sheetName = if (ci == 0) name else s"$name(${ci + 1})"
          sheets += ((sheetName, Iterator(header) ++ new Iterator[Seq[Any]] {
            private lazy val chunk =
              if (groups.hasNext) groups.next().iterator else Iterator.empty
            def hasNext: Boolean = chunk.hasNext
            def next(): Seq[Any] = chunk.next()
          }))
        }
      }
    }

    s.setList().foreach(n => add(n, "set", s.set(n), keepEmpty = true))
    s.parList().foreach(n => add(n, "par", s.par(n, parFilters(n)), keepEmpty = false))
    if (includeSolution) {
      s.varList().foreach(n => add(n, "var", s.variable(n), keepEmpty = false))
      s.equList().foreach(n => add(n, "equ", s.equation(n), keepEmpty = false))
    }
    val mappingSheet = Iterator[Seq[Any]](Seq("item", "ix_type")) ++
      mapping.iterator.map { case (n, t) => Seq[Any](n, t) }
    try Xlsx.write(path, ("ix_type_mapping", mappingSheet) +: sheets.toSeq)
    finally persisted.foreach(_.unpersist(blocking = false))
  }

  /** Read a .xlsx workbook written by [[writeScenarioXlsx]] (or the
    * reference's to_excel) into the checked-out scenario: reassembles
    * `name(2)`… split sheets in order (io.py:236-248), then the shared
    * 2-pass item load. */
  def readScenarioXlsx(s: Scenario, path: String, initItems: Boolean = false,
      addUnits: Boolean = false): Unit = {
    val spark = s.platform.spark
    val all = Xlsx.read(path)
    val byName = all.toMap
    val mappingRows = byName.getOrElse("ix_type_mapping",
      throw new IllegalArgumentException(s"'$path' has no ix_type_mapping sheet"))
    val mapping = mappingRows.drop(1).map(r => (r(0), r(1)))

    def itemDf(name: String): DataFrame = {
      // shared split-sheet stitcher (review r12 — was a hand-rolled
      // copy of the same pattern Reporter.addFile carried)
      require(byName.contains(name) ||
          all.exists(_._1.matches(
            java.util.regex.Pattern.quote(name) + "\\(\\d+\\)")),
        s"no sheet for item '$name' in $path")
      val (header, data) = Xlsx.stitchSheets(all, name)
      Xlsx.rowsToDf(spark, header, data)
    }

    loadItems(s, mapping, itemDf, initItems, addUnits)
  }

  /** TS convenience: read an .xlsx of long or wide IAMC rows and
    * upsert (ts_read_file's Excel branch, io.py:25-52). First sheet
    * only; year/value columns re-typed from the untyped cells. */
  def readTimeseriesXlsx(s: Scenario, path: String,
      firstYear: Option[Int] = None, lastYear: Option[Int] = None): Unit = {
    val spark = s.platform.spark
    val rows = Xlsx.read(path).head._2
    require(rows.nonEmpty, s"'$path' first sheet is empty")
    val df0 = Xlsx.rowsToDf(spark, rows.head, rows.drop(1))
    val df = df0.columns.foldLeft(df0) { (d, c) =>
      if (c == "value" || c.toIntOption.isDefined) d.withColumn(c, col(c).cast("double"))
      // via double: pandas-written workbooks render integer years as
      // "2010.0", which a direct string->int cast nulls out
      else if (c == "year") d.withColumn(c, col(c).cast("double").cast("int"))
      else d
    }
    s.addTimeseries(df, yearLim = (firstYear, lastYear))
  }

  /** TS convenience: read a CSV of long or wide IAMC rows and upsert
    * (reference ts_read_file, io.py:25-52 + timeseries.py:665-692). */
  def readTimeseriesCsv(s: Scenario, path: String,
      firstYear: Option[Int] = None, lastYear: Option[Int] = None): Unit = {
    val df = s.platform.spark.read.option("header", true)
      .option("inferSchema", true).csv(path)
    s.addTimeseries(df, yearLim = (firstYear, lastYear))
  }

  /** TS export of this run to CSV (single header-ed directory). */
  def writeTimeseriesCsv(s: Scenario, path: String): Unit =
    s.timeseries().write.mode(SaveMode.Overwrite).option("header", true).csv(path)
}
