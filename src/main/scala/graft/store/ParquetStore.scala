package graft.store

import java.net.{URLDecoder, URLEncoder}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet-backed Store.
  *
  * Layout (all under `root`):
  * {{{
  *   catalog/runs/           runs table (atomic rewrite)
  *   catalog/items/          item catalog (atomic rewrite)
  *   data/set|par|sol/run_id=N/name=X/   long-format item rows
  *   data/ts/run_id=N/  data/geo/run_id=N/
  *   meta/  codelists/units|regions|timeslices/  cat/run_id=N/
  * }}}
  *
  * Scale design: item/TS facts are partitioned by `run_id` (and item
  * `name`), so run- and item-scoped reads are pure partition pruning —
  * a scan of one item never lists, let alone reads, another run's data.
  * Catalog tables are tiny and rewritten copy-on-write; the swap is a
  * pointer-file update, the Spark-native stand-in for the reference's
  * RDBMS row locks (SURVEY §7.5 hard part 1). Unlike the reference's
  * per-element JNI write loop (jdbc.py:1295-1310), writes here are
  * whole-DataFrame parquet appends.
  */
class ParquetStore(val spark: SparkSession, val root: String) extends Store {
  import ParquetStore._

  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
  fs.mkdirs(new Path(root))

  // ---- generic atomic-pointer table helpers -------------------------

  /** Read the current generation of an atomically-rewritten table. */
  private def readPointerTable(name: String, schema: StructType): DataFrame = {
    val ptr = new Path(s"$root/$name.current")
    if (!fs.exists(ptr)) spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    else {
      val gen = readSmallFile(ptr)
      spark.read.schema(schema).parquet(s"$root/$name.g$gen")
    }
  }

  /** Rewrite a table copy-on-write: write generation g+1, then swap the
    * pointer file (create-temp + rename = the atomic step). */
  private def writePointerTable(name: String, df: DataFrame): Unit = synchronized {
    val ptr = new Path(s"$root/$name.current")
    val gen = if (fs.exists(ptr)) readSmallFile(ptr).toLong + 1 else 0L
    df.coalesce(1).write.mode("overwrite").parquet(s"$root/$name.g$gen")
    val tmp = new Path(s"$root/$name.current.tmp")
    val out = fs.create(tmp, true)
    out.write(gen.toString.getBytes("UTF-8"))
    out.close()
    fs.delete(ptr, false)
    fs.rename(tmp, ptr)
    if (gen > 0) fs.delete(new Path(s"$root/$name.g${gen - 1}"), true)
  }

  private def readSmallFile(p: Path): String = {
    val in = fs.open(p)
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
    finally in.close()
  }

  // ---- runs catalog --------------------------------------------------

  private def runsDf: DataFrame = readPointerTable("catalog/runs", runsSchema)

  override def nextRunId(): Long = synchronized {
    val cur = runsDf.agg(max("run_id")).head()
    if (cur.isNullAt(0)) 1L else cur.getLong(0) + 1L
  }

  override def createRun(model: String, scenario: String, scheme: String,
      annotation: String): RunInfo = synchronized {
    val prior = runsDf.filter(col("model") === model && col("scenario") === scenario)
      .agg(max("version")).head()
    val version = (if (prior.isNullAt(0)) 0 else prior.getInt(0)) + 1
    val id = nextRunId()
    val row = Row(id, model, scenario, version, scheme, false, annotation, null)
    writePointerTable("catalog/runs",
      runsDf.unionByName(spark.createDataFrame(
        java.util.Arrays.asList(row), runsSchema)))
    RunInfo(id, model, scenario, version, scheme, isDefault = false, annotation, None)
  }

  override def getRun(model: String, scenario: String, version: Option[Int]): RunInfo = {
    val base = runsDf.filter(col("model") === model && col("scenario") === scenario)
    val sel = version match {
      case Some(v) => base.filter(col("version") === v)
      case None => base.filter(col("is_default"))
    }
    val rows = sel.collect()
    require(rows.nonEmpty, version match {
      case Some(v) => s"no run for model=$model scenario=$scenario version=$v"
      case None => s"no default version for model=$model scenario=$scenario"
    })
    fromRow(rows.head)
  }

  def getRunById(runId: Long): RunInfo =
    fromRow(runsDf.filter(col("run_id") === runId).head())

  private def fromRow(r: Row): RunInfo = RunInfo(
    r.getAs[Long]("run_id"), r.getAs[String]("model"), r.getAs[String]("scenario"),
    r.getAs[Int]("version"), r.getAs[String]("scheme"), r.getAs[Boolean]("is_default"),
    r.getAs[String]("annotation"), Option(r.getAs[String]("lock_user")))

  override def listRuns(defaultOnly: Boolean, model: Option[String],
      scenario: Option[String]): DataFrame = {
    var df = runsDf
    if (defaultOnly) df = df.filter(col("is_default"))
    model.foreach(m => df = df.filter(col("model") === m))
    scenario.foreach(s => df = df.filter(col("scenario") === s))
    df
  }

  override def setDefault(runId: Long): Unit = synchronized {
    val me = getRunById(runId)
    writePointerTable("catalog/runs", runsDf.withColumn("is_default",
      when(col("model") === me.model && col("scenario") === me.scenario,
        col("run_id") === runId).otherwise(col("is_default"))))
  }

  override def discardRun(runId: Long): Unit = synchronized {
    itemCache.keys.filter(_._1 == runId).foreach { k =>
      itemCache.remove(k).foreach(_.unpersist())
    }
    writePointerTable("catalog/runs", runsDf.filter(col("run_id") =!= runId))
    writePointerTable("catalog/items",
      itemsDf.filter(col("run_id") =!= runId))
    for (fam <- Seq("set", "par", "sol", "ts", "geo", "cat"))
      fs.delete(new Path(s"$root/data/$fam/run_id=$runId"), true)
  }

  private def mutateRun(runId: Long)(f: DataFrame => DataFrame): Unit =
    writePointerTable("catalog/runs", f(runsDf))

  // ---- item catalog ---------------------------------------------------

  private def itemsDf: DataFrame = readPointerTable("catalog/items", itemsSchema)

  override def initItem(runId: Long, d: ItemDef): Unit = synchronized {
    require(itemDef(runId, d.name).isEmpty,
      s"item '${d.name}' already exists in run $runId")
    val row = Row(runId, d.name, d.itemType.toString.toLowerCase, d.idxSets, d.idxNames)
    writePointerTable("catalog/items", itemsDf.unionByName(
      spark.createDataFrame(java.util.Arrays.asList(row), itemsSchema)))
  }

  override def listItems(runId: Long, t: ItemType.Value): Seq[String] =
    itemsDf.filter(col("run_id") === runId && col("type") === t.toString.toLowerCase)
      .select("name").collect().map(_.getString(0)).toSeq.sorted

  /** Items whose index sets include `setName` (scenario.py:391-435). */
  def itemsIndexedBy(runId: Long, setName: String): Seq[String] =
    itemsDf.filter(col("run_id") === runId && array_contains(col("idx_sets"), setName))
      .select("name").collect().map(_.getString(0)).toSeq.sorted

  override def itemDef(runId: Long, name: String): Option[ItemDef] =
    itemsDf.filter(col("run_id") === runId && col("name") === name)
      .collect().headOption.map { r =>
        ItemDef(r.getAs[String]("name"), ItemType.fromString(r.getAs[String]("type")),
          r.getSeq[String](r.fieldIndex("idx_sets")).toList,
          r.getSeq[String](r.fieldIndex("idx_names")).toList)
      }

  override def deleteItem(runId: Long, name: String): Unit = synchronized {
    val d = itemDef(runId, name)
    writePointerTable("catalog/items",
      itemsDf.filter(!(col("run_id") === runId && col("name") === name)))
    d.foreach { dd =>
      val fam = family(dd.itemType)
      fs.delete(new Path(itemPath(fam, runId, name)), true)
      invalidate(runId, name, isSet = dd.itemType == ItemType.Set)
    }
  }

  // ---- item data -------------------------------------------------------

  private def family(t: ItemType.Value): String = t match {
    case ItemType.Set => "set"
    case ItemType.Par => "par"
    case _ => "sol"
  }

  private def itemPath(fam: String, runId: Long, name: String): String =
    s"$root/data/$fam/run_id=$runId/name=${URLEncoder.encode(name, "UTF-8")}"

  private def dataSchema(d: ItemDef): StructType = {
    val dims = StructType(d.idxNames.map(n => StructField(n, StringType)))
    d.itemType match {
      // a simple (0-D) set is a single column of elements, named after
      // the set itself (reference base.py:1008-1010 returns a Series)
      case ItemType.Set if d.idxNames.isEmpty =>
        StructType(Seq(StructField(d.name, StringType)))
      case ItemType.Set => dims
      case ItemType.Par =>
        StructType(dims.fields :+ StructField("value", DoubleType) :+ StructField("unit", StringType))
      case _ =>
        StructType(dims.fields :+ StructField("lvl", DoubleType) :+ StructField("mrg", DoubleType))
    }
  }

  // Item result cache, mirroring the reference's CachingBackend
  // (base.py:1291-1454 + SURVEY §4): the UNFILTERED item frame is
  // persisted and filtered reads are served by re-filtering it
  // (util/__init__.py:467-479's trick, free under Catalyst). A write
  // to an item invalidates that item; any change to a SET invalidates
  // every item of the run (membership validation may depend on it —
  // jdbc.py:1358-1362's global invalidation).
  private val itemCache =
    scala.collection.concurrent.TrieMap.empty[(Long, String), DataFrame]

  private def invalidate(runId: Long, name: String, isSet: Boolean): Unit = {
    if (isSet) {
      itemCache.keys.filter(_._1 == runId).foreach { k =>
        itemCache.remove(k).foreach(_.unpersist())
      }
    } else itemCache.remove((runId, name)).foreach(_.unpersist())
  }

  def clearCache(): Unit = {
    itemCache.values.foreach(_.unpersist())
    itemCache.clear()
  }

  override def itemData(runId: Long, name: String,
      filters: Map[String, Seq[String]]): DataFrame = {
    val d = itemDef(runId, name).getOrElse(
      throw new NoSuchElementException(s"no item '$name' in run $runId"))
    val base = itemCache.getOrElseUpdate((runId, name), {
      val path = itemPath(family(d.itemType), runId, name)
      val schema = dataSchema(d)
      val df =
        if (fs.exists(new Path(path))) spark.read.schema(schema).parquet(path)
        else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    })
    filters.foldLeft(base) { case (df, (dim, vals)) =>
      require(d.idxNames.contains(dim),
        s"'$dim' is not an index name of item '$name' (${d.idxNames.mkString(",")})")
      // values are stringified and silently ignored when absent
      // (base.py:997-1005; util/__init__.py:86-110)
      df.filter(col(dim).isin(vals.map(_.toString): _*))
    }
  }

  override def writeItemData(runId: Long, name: String, df: DataFrame): Unit = {
    val d = itemDef(runId, name).getOrElse(
      throw new NoSuchElementException(s"no item '$name' in run $runId"))
    val path = itemPath(family(d.itemType), runId, name)
    val cols = dataSchema(d).fieldNames
    val tmp = path + ".tmp"
    df.selectExpr(cols.map(c => s"`$c`").toIndexedSeq: _*).write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(path), true)
    fs.rename(new Path(tmp), new Path(path))
    invalidate(runId, name, isSet = d.itemType == ItemType.Set)
  }

  // ---- time series -----------------------------------------------------

  private def runFactPath(fam: String, runId: Long) = s"$root/data/$fam/run_id=$runId"

  private def readRunFact(fam: String, runId: Long, schema: StructType): DataFrame = {
    val p = runFactPath(fam, runId)
    if (fs.exists(new Path(p))) spark.read.schema(schema).parquet(p)
    else spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
  }

  private def writeRunFact(fam: String, runId: Long, df: DataFrame, schema: StructType): Unit = {
    val p = runFactPath(fam, runId)
    val tmp = p + ".tmp"
    df.selectExpr(schema.fieldNames.map(c => s"`$c`").toIndexedSeq: _*)
      .write.mode("overwrite").parquet(tmp)
    fs.delete(new Path(p), true)
    fs.rename(new Path(tmp), new Path(p))
  }

  override def tsData(runId: Long): DataFrame = readRunFact("ts", runId, tsSchema)
  override def writeTsData(runId: Long, df: DataFrame): Unit =
    writeRunFact("ts", runId, df, tsSchema)
  override def geoData(runId: Long): DataFrame = readRunFact("geo", runId, geoSchema)
  override def writeGeoData(runId: Long, df: DataFrame): Unit =
    writeRunFact("geo", runId, df, geoSchema)

  override def allTsData(): DataFrame = {
    val base = new Path(s"$root/data/ts")
    if (!fs.exists(base))
      return spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
        tsSchema.add("run_id", LongType))
    // basePath preserves the run_id partition column for the all-runs scan
    spark.read.option("basePath", s"$root/data/ts").schema(tsSchema.add("run_id", LongType))
      .parquet(s"$root/data/ts/run_id=*")
  }

  // ---- meta + codelists -------------------------------------------------

  override def meta(): DataFrame = readPointerTable("meta", metaSchema)
  override def writeMeta(df: DataFrame): Unit = writePointerTable("meta", df)

  override def units(): Seq[String] =
    readPointerTable("codelists/units", unitsSchema)
      .collect().map(_.getString(0)).toSeq.sorted

  override def addUnit(u: String): Unit = synchronized {
    if (!units().contains(u))
      writePointerTable("codelists/units",
        readPointerTable("codelists/units", unitsSchema).unionByName(
          spark.createDataFrame(java.util.Arrays.asList(Row(u)), unitsSchema)))
  }

  override def regions(): DataFrame = readPointerTable("codelists/regions", regionsSchema)

  override def addRegion(region: String, hierarchy: String, parent: Option[String]): Unit =
    synchronized {
      writePointerTable("codelists/regions", regions().unionByName(
        spark.createDataFrame(java.util.Arrays.asList(
          Row(region, hierarchy, parent.orNull, null)), regionsSchema)))
    }

  override def addRegionSynonym(region: String, mappedTo: String): Unit = synchronized {
    writePointerTable("codelists/regions", regions().unionByName(
      spark.createDataFrame(java.util.Arrays.asList(
        Row(region, "synonym", null, mappedTo)), regionsSchema)))
  }

  override def timeslices(): DataFrame =
    readPointerTable("codelists/timeslices", timeslicesSchema)

  override def addTimeslice(name: String, category: String, duration: Double): Unit =
    synchronized {
      writePointerTable("codelists/timeslices", timeslices().unionByName(
        spark.createDataFrame(java.util.Arrays.asList(
          Row(name, category, duration)), timeslicesSchema)))
    }

  // ---- documentation KV store (base.py:131-162) ---------------------------

  /** (domain ∈ {model, scenario, region, metadata, timeseries},
    * identifier) → text. */
  def docs(domain: String): DataFrame =
    readPointerTable("docs", docsSchema).filter(col("domain") === domain)

  def setDoc(domain: String, identifier: String, text: String): Unit = synchronized {
    val cur = readPointerTable("docs", docsSchema)
      .filter(!(col("domain") === domain && col("identifier") === identifier))
    writePointerTable("docs", cur.unionByName(spark.createDataFrame(
      java.util.Arrays.asList(Row(domain, identifier, text)), docsSchema)))
  }

  def getDoc(domain: String, identifier: String): Option[String] =
    docs(domain).filter(col("identifier") === identifier)
      .collect().headOption.map(_.getString(2))

  def removeDoc(domain: String, identifier: String): Unit = synchronized {
    writePointerTable("docs", readPointerTable("docs", docsSchema)
      .filter(!(col("domain") === domain && col("identifier") === identifier)))
  }

  // ---- categories ---------------------------------------------------------

  override def categories(runId: Long, setName: String): DataFrame =
    readRunFact("cat", runId, catSchema).filter(col("set_name") === setName)

  override def writeCategories(runId: Long, setName: String, df: DataFrame): Unit = {
    val others = readRunFact("cat", runId, catSchema).filter(col("set_name") =!= setName)
    writeRunFact("cat", runId, others.unionByName(
      df.select(lit(setName).as("set_name"), col("category"), col("member"))), catSchema)
  }

  // ---- transactions ---------------------------------------------------------

  override def checkOut(runId: Long, user: String): Unit = synchronized {
    val r = getRunById(runId)
    require(r.lockUser.isEmpty, s"run $runId is already checked out by ${r.lockUser.get}")
    mutateRun(runId)(df => df.withColumn("lock_user",
      when(col("run_id") === runId, lit(user)).otherwise(col("lock_user"))))
  }

  override def commit(runId: Long, user: String, comment: String): Unit = synchronized {
    mutateRun(runId)(df => df.withColumn("lock_user",
      when(col("run_id") === runId, lit(null).cast(StringType)).otherwise(col("lock_user"))))
  }
}

object ParquetStore {
  val runsSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("scenario", StringType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("scheme", StringType),
    StructField("is_default", BooleanType, nullable = false),
    StructField("annotation", StringType),
    StructField("lock_user", StringType)))

  val itemsSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("idx_sets", ArrayType(StringType), nullable = false),
    StructField("idx_names", ArrayType(StringType), nullable = false)))

  val tsSchema: StructType = StructType(Seq(
    StructField("region", StringType),
    StructField("variable", StringType),
    StructField("unit", StringType),
    StructField("subannual", StringType),
    StructField("year", IntegerType),
    StructField("value", DoubleType),
    StructField("meta", BooleanType)))

  val geoSchema: StructType = StructType(Seq(
    StructField("region", StringType),
    StructField("variable", StringType),
    StructField("unit", StringType),
    StructField("subannual", StringType),
    StructField("year", IntegerType),
    StructField("value", StringType),
    StructField("meta", BooleanType)))

  val metaSchema: StructType = StructType(Seq(
    StructField("target_model", StringType),
    StructField("target_scenario", StringType),
    StructField("target_version", IntegerType),
    StructField("name", StringType),
    StructField("value_json", StringType)))

  val unitsSchema: StructType = StructType(Seq(StructField("unit", StringType)))

  val regionsSchema: StructType = StructType(Seq(
    StructField("region", StringType),
    StructField("hierarchy", StringType),
    StructField("parent", StringType),
    StructField("mapped_to", StringType)))

  val timeslicesSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("category", StringType),
    StructField("duration", DoubleType)))

  val docsSchema: StructType = StructType(Seq(
    StructField("domain", StringType, nullable = false),
    StructField("identifier", StringType, nullable = false),
    StructField("text", StringType)))

  val catSchema: StructType = StructType(Seq(
    StructField("set_name", StringType),
    StructField("category", StringType),
    StructField("member", StringType)))
}
