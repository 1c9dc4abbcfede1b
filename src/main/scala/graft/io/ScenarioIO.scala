package graft.io

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SaveMode}
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
  def readScenario(s: Scenario, dir: String, initItems: Boolean = false): Unit = {
    val spark = s.platform.spark
    val mappingDf = spark.read.option("header", true).csv(s"$dir/$MappingFile")
    val hasColumnList = mappingDf.columns.contains("columns")
    val mapping = mappingDf.collect().map(r => r.getString(0) -> r.getString(1))
    val declaredCols: Map[String, Seq[String]] =
      if (!hasColumnList) Map.empty
      else mappingDf.collect().map { r =>
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

    // --- pass 1+2: sets, index sets before indexed sets (io.py:232-308)
    val setQueue = mutable.Queue(mapping.collect { case (n, "set") => n }.toIndexedSeq: _*)
    var stalls = 0
    while (setQueue.nonEmpty && stalls <= setQueue.size) {
      val name = setQueue.dequeue()
      val df = loadItem(name)
      val isSimple = df.columns.length == 1
      val declared = s.hasItem(name)
      if (!declared) {
        require(initItems, s"item '$name' does not exist and initItems=false")
        if (isSimple) s.initSet(name)
        else s.initSet(name, df.columns.toSeq, df.columns.toSeq)
      }
      val idxSets = if (s.hasItem(name)) s.idxSets(name) else Nil
      val ready = idxSets.forall(s.hasItem)
      if (!ready) { setQueue.enqueue(name); stalls += 1 }
      else {
        stalls = 0
        if (!df.isEmpty) s.addSetDf(name, df)
      }
    }
    require(setQueue.isEmpty,
      s"circular or unsatisfiable index-set references among ${setQueue.mkString(", ")}")

    // --- pars; var/equ are intentionally skipped (doc/file-io.rst:48-51)
    mapping.collect { case (n, "par") => n }.foreach { name =>
      val df = loadItem(name)
      if (!s.hasItem(name)) {
        require(initItems, s"item '$name' does not exist and initItems=false")
        val dims = df.columns.filterNot(Seq("value", "unit").contains).toSeq
        s.initPar(name, dims, dims)
      }
      s.addPar(name, df.withColumn("value", col("value").cast("double")))
    }
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
