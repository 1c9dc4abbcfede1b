package graft.store

import java.net.URLEncoder

import scala.collection.concurrent.TrieMap

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet-backed Store.
  *
  * Layout (all under `root`):
  * {{{
  *   catalog/runs.gN/        runs table (generational rewrite)
  *   catalog/items.gN/       item catalog
  *   catalog/manifest/run_id=N.gG/  committed (run_id, name) -> data
  *                           generation, SHARDED BY RUN so a commit
  *                           rewrites only its own run's shard
  *                           (catalog/manifest.gN is the legacy
  *                           unsharded layout, still readable)
  *   data/set|par|sol/run_id=N/name=X/gG/   long-format item rows
  *   data/ts|geo|cat/run_id=N/name=__ts/gG/ per-run fact tables
  *   meta.gN/  codelists/units|regions|timeslices.gN/  docs.gN/
  * }}}
  *
  * Durability/atomicity model (SURVEY §7.5 hard part 1 — check-out/
  * commit on immutable storage):
  *  - Every table write goes to a FRESH generation directory; readers
  *    resolve the newest generation whose parquet `_SUCCESS` marker
  *    exists, so a crashed or in-flight write is invisible (the commit
  *    protocol's marker is the atomic step — no pointer-file race).
  *  - Old generations are retained (catalogs GC down to the last few),
  *    so lazy DataFrames handed to callers stay readable across later
  *    writes instead of hitting deleted files.
  *  - Item/fact writes during a check-out are staged: the new
  *    generation is recorded only in the in-memory `pending` overlay
  *    (visible to this session's reads, like the reference's
  *    uncommitted state). `commit` publishes the overlay into the
  *    manifest in one generational write; `discardChanges` deletes the
  *    staged directories — a REAL rollback. Writes outside a check-out
  *    (e.g. a model storing its solution) publish immediately.
  *
  * Concurrency contract: ONE writer process per store root. Within a
  * JVM, writers serialize on a PER-ROOT shared state monitor — any
  * number of threads AND instances on one root is safe (r8 stress
  * spec; r9 review: instances share one mirror-state copy, so a
  * second instance can neither race the pointer tables nor rewrite a
  * manifest shard from a stale private view); across processes, the
  * first durable mutation takes an exclusive OS lock on
  * `<root>/.writer.lock` (see [[acquireWriterLock]]) and a second
  * writer process fails fast. Pure readers never lock: the
  * `_SUCCESS`-gated generation protocol already gives them a
  * consistent (possibly slightly stale) view under a live writer.
  *
  * Scale design: item/TS facts are partitioned by `run_id` and item
  * `name`, so run- and item-scoped reads touch only their own
  * directories, and writes are whole-DataFrame parquet jobs — the
  * reference's per-element JNI write loop (jdbc.py:1295-1310) has no
  * analogue here.
  */
class ParquetStore(val spark: SparkSession, val root: String) extends Store {
  import ParquetStore._

  private val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  // shared per-root mirror state (see ParquetStore.SharedState); the
  // canonical key matches the writer-lock registry's
  private val stateKey: String = {
    val uri = new Path(root).toUri
    if (uri.getScheme == null || uri.getScheme == "file")
      new java.io.File(Option(uri.getPath).getOrElse(root)).getCanonicalPath
    else root
  }
  private val state = ParquetStore.stateFor(stateKey)
  private def manifest = state.manifest
  private def pending = state.pending
  private def checkedOut = state.checkedOut
  private def allocatedGen = state.allocatedGen
  private[graft] def inFlight = state.inFlight
  private def itemDefs = state.itemDefs
  private def itemCache = state.itemCache
  private def tsCache = state.tsCache
  private def mutations = state.mutations
  loadMirrors()
  fs.mkdirs(new Path(root))

  // ---- cross-process writer lock -------------------------------------

  /** Advisory single-writer guard (VERDICT r8 #3 — the reference's
    * RDBMS backend gets this from the database's own locking,
    * timeseries.py:208-239; immutable parquet has no database to lean
    * on). The in-class `synchronized` blocks serialize writers within
    * one JVM only: two PROCESSES opening the same root could both read
    * generation N and race to write N+1, or interleave manifest
    * generational rewrites. So the first durable mutation this store
    * performs acquires an exclusive OS lock (`FileChannel.tryLock`) on
    * `<root>/.writer.lock`, held until [[releaseWriterLock]] or process
    * exit (the OS releases it on crash — no stale-lock recovery
    * protocol needed, unlike a create-if-absent lease file). A second
    * process's first WRITE fails fast with the holder's identity;
    * readers never lock and stay consistent via the generation
    * `_SUCCESS` protocol (they resolve only fully-written
    * generations, and KeepGens retention keeps resolved frames alive
    * under a concurrent writer's GC).
    *
    * Scope: OS file locks exist only on real filesystems — for a
    * non-`file:` root (HDFS/object store) this is a no-op and the
    * single-writer-per-store contract is the CALLER's to uphold (at
    * cluster scale that coordination belongs to the job scheduler; an
    * atomic-create lease file would need a stale-lock takeover
    * protocol that is strictly weaker than what the OS gives us
    * locally). */
  private def acquireWriterLock(): Unit = {
    val uri = new Path(root).toUri
    if (uri.getScheme != null && uri.getScheme != "file") return
    val canonical = new java.io.File(
      Option(uri.getPath).getOrElse(root)).getCanonicalPath
    ParquetStore.writerLockMutex.synchronized {
      if (ParquetStore.writerLocks.contains(canonical)) return
      val f = new java.io.File(canonical, ".writer.lock")
      val raf = new java.io.RandomAccessFile(f, "rw")
      // an overlapping lock from a channel outside the registry is the
      // same condition as a foreign process holding it (and is how the
      // spec simulates one in a single JVM): fail the same clean way
      val lock =
        try raf.getChannel.tryLock()
        catch {
          case _: java.nio.channels.OverlappingFileLockException => null
          case e: Throwable => raf.close(); throw e
        }
      if (lock == null) {
        val holder =
          try {
            val buf = new Array[Byte](math.min(raf.length(), 256L).toInt)
            raf.readFully(buf); new String(buf, "UTF-8").trim
          } catch { case _: Throwable => "unknown" }
          finally raf.close()
        throw new IllegalStateException(
          s"store root $canonical is locked by another writer process [$holder]; " +
            "one writer per store - open a reader (no writes) or wait for the holder to exit")
      }
      // record the holder for the error message above (diagnostic only;
      // the OS lock, not this content, is the mutual exclusion)
      raf.setLength(0)
      raf.write(s"pid=${ProcessHandle.current().pid()} since=${nowStamp()}".getBytes("UTF-8"))
      raf.getChannel.force(true)
      ParquetStore.writerLocks(canonical) = (raf, lock)
    }
  }

  /** Release this JVM's writer lock on `root` (every instance sharing
    * the root loses it — the next mutation from any of them
    * re-acquires). For writer handoff without a process exit; tests
    * use it to simulate the second-process case in one JVM. */
  def releaseWriterLock(): Unit = {
    val uri = new Path(root).toUri
    if (uri.getScheme != null && uri.getScheme != "file") return
    val canonical = new java.io.File(
      Option(uri.getPath).getOrElse(root)).getCanonicalPath
    ParquetStore.writerLockMutex.synchronized {
      ParquetStore.writerLocks.remove(canonical).foreach { case (raf, lock) =>
        try lock.release() finally raf.close()
      }
    }
  }

  // ---- generational table helpers -----------------------------------

  /** Newest generation number of `name` with a _SUCCESS marker.
    * globStatus with the table's own prefix, NOT a full parent
    * listing: the manifest parent holds one shard per run — a plain
    * listStatus there made every commit pay an O(total runs) metadata
    * scan just to find one shard's newest generation. */
  private[graft] def currentGenOf(name: String): Option[Long] = {
    val parent = new Path(s"$root/$name").getParent
    val base = new Path(s"$root/$name").getName
    if (!fs.exists(parent)) return None
    val matches = fs.globStatus(new Path(parent, globEscape(base) + ".g*"))
    if (matches == null) return None
    val gens = matches.iterator.map(_.getPath.getName)
      .flatMap(n => n.stripPrefix(base + ".g").toLongOption)
      .filter(g => fs.exists(new Path(parent, s"$base.g$g/_SUCCESS")))
      .toSeq
    if (gens.isEmpty) None else Some(gens.max)
  }

  /** Backslash-escape Hadoop glob metacharacters so a table base name
    * containing `* ? [ ] { }` matches literally in globStatus (the
    * pre-glob listStatus+startsWith resolution was literal; the glob
    * rewrite must not change which names resolve). */
  private def globEscape(s: String): String =
    s.replaceAll("""([\\*?\[\]{}])""", """\\$1""")

  private def readPointerTable(name: String, schema: StructType): DataFrame =
    currentGenOf(name) match {
      case None => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
      case Some(g) => spark.read.schema(schema).parquet(s"$root/$name.g$g")
    }

  /** Write the next generation; retain the trailing `KeepGens` so
    * previously-returned lazy frames stay readable. */
  private def writePointerTable(name: String, df: DataFrame): Unit = state.synchronized {
    acquireWriterLock()
    val next = currentGenOf(name).getOrElse(-1L) + 1
    df.coalesce(1).write.mode("overwrite").parquet(s"$root/$name.g$next")
    val old = next - KeepGens
    if (old >= 0) fs.delete(new Path(s"$root/$name.g$old"), true)
  }

  // ---- runs catalog --------------------------------------------------

  private def runsDf: DataFrame = readPointerTable("catalog/runs", runsSchema)

  override def nextRunId(): Long = state.synchronized {
    val cur = runsDf.agg(max("run_id")).head()
    if (cur.isNullAt(0)) 1L else cur.getLong(0) + 1L
  }

  override def createRun(model: String, scenario: String, scheme: String,
      annotation: String): RunInfo = state.synchronized {
    val prior = runsDf.filter(col("model") === model && col("scenario") === scenario)
      .agg(max("version")).head()
    val version = (if (prior.isNullAt(0)) 0 else prior.getInt(0)) + 1
    val id = nextRunId()
    val row = Row(id, model, scenario, version, scheme, false, annotation, null,
      localUser, nowStamp(), null, null, null)
    writePointerTable("catalog/runs",
      runsDf.unionByName(spark.createDataFrame(
        java.util.Arrays.asList(row), runsSchema)))
    RunInfo(id, model, scenario, version, scheme, isDefault = false, annotation, None)
  }

  /** Backend-auth user recorded in audit columns (the reference gets
    * this from the DB connection; a local store has one principal). */
  private val localUser: String =
    sys.props.getOrElse("user.name", "local")

  private def nowStamp(): String =
    java.time.LocalDateTime.now(java.time.ZoneOffset.UTC)
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))

  /** Timestamp of the last committed update of a run (reference
    * Backend.last_update / TimeSeries.last_update, timeseries.py:298). */
  override def lastUpdate(runId: Long): Option[String] = {
    val r = runsDf.filter(col("run_id") === runId)
      .select(coalesce(col("upd_date"), col("cre_date"))).collect()
    r.headOption.flatMap(row => Option(row.getString(0)))
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

  def getRunById(runId: Long): RunInfo = {
    // collect + require, not head(): a missing id must say so, not
    // throw head-of-empty (r9 review — checkOut on a deleted run
    // surfaced "next on empty iterator")
    val rows = runsDf.filter(col("run_id") === runId).collect()
    require(rows.nonEmpty, s"no run with id $runId")
    fromRow(rows.head)
  }

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

  override def setDefault(runId: Long): Unit = state.synchronized {
    val me = getRunById(runId)
    writePointerTable("catalog/runs", runsDf.withColumn("is_default",
      when(col("model") === me.model && col("scenario") === me.scenario,
        col("run_id") === runId).otherwise(col("is_default"))))
  }

  override def discardRun(runId: Long): Unit = state.synchronized {
    invalidateRun(runId)
    pending.keys.filter(_._1 == runId).foreach(pending.remove)
    itemDefs.keys.filter(_._1 == runId).foreach(itemDefs.remove)
    manifest --= manifest.keys.filter(_._1 == runId)
    // a discarded max run_id is recycled by nextRunId: stale checkout
    // or generation-counter state under the old id would silently
    // stage the new run's writes into pending forever (never
    // persisted) or start its generations mid-sequence
    checkedOut.remove(runId)
    allocatedGen --= allocatedGen.keys.filter(_._1 == runId)
    persistManifest(runId)
    writePointerTable("catalog/runs", runsDf.filter(col("run_id") =!= runId))
    writePointerTable("catalog/items",
      itemsDf.filter(col("run_id") =!= runId))
    for (fam <- Seq("set", "par", "sol", "ts", "geo", "cat"))
      fs.delete(new Path(s"$root/data/$fam/run_id=$runId"), true)
  }

  private def mutateRun(runId: Long)(f: DataFrame => DataFrame): Unit =
    writePointerTable("catalog/runs", f(runsDf))

  // ---- item catalog ---------------------------------------------------
  // The catalog is consulted on EVERY item read/write (schema lookup,
  // validation), so it is mirrored driver-side like the reference's
  // in-process backend state; the parquet table is the durable copy.

  private def itemsDf: DataFrame = readPointerTable("catalog/items", itemsSchema)

  /** One-time durable-mirror load per JVM per root (first instance
    * pays it; later instances on the same root share the result). */
  private def loadMirrors(): Unit = state.synchronized {
    if (!state.loaded) {
      itemsDf.collect().foreach { r =>
        state.itemDefs((r.getAs[Long]("run_id"), r.getAs[String]("name"))) =
          ItemDef(r.getAs[String]("name"), ItemType.fromString(r.getAs[String]("type")),
            r.getSeq[String](r.fieldIndex("idx_sets")).toList,
            r.getSeq[String](r.fieldIndex("idx_names")).toList)
      }
      loadManifestMirror()
      state.loaded = true
    }
  }

  override def initItem(runId: Long, d: ItemDef): Unit = state.synchronized {
    // the per-run fact tables share the (runId, name) pointer keyspace
    // (review r9): an item literally named __ts/__geo/__cat would
    // cross-contaminate the fact tables' generation pointers
    require(!d.name.startsWith("__"),
      s"item name '${d.name}' is reserved (names must not start with '__')")
    require(itemDef(runId, d.name).isEmpty,
      s"item '${d.name}' already exists in run $runId")
    val row = Row(runId, d.name, d.itemType.toString.toLowerCase, d.idxSets, d.idxNames)
    writePointerTable("catalog/items", itemsDf.unionByName(
      spark.createDataFrame(java.util.Arrays.asList(row), itemsSchema)))
    itemDefs((runId, d.name)) = d
  }

  override def listItems(runId: Long, t: ItemType.Value): Seq[String] =
    itemDefs.collect {
      case ((r, n), d) if r == runId && d.itemType == t => n
    }.toSeq.sorted

  /** Items whose index sets include `setName` (scenario.py:391-435). */
  def itemsIndexedBy(runId: Long, setName: String): Seq[String] =
    itemDefs.collect {
      case ((r, n), d) if r == runId && d.idxSets.contains(setName) => n
    }.toSeq.sorted

  override def itemDef(runId: Long, name: String): Option[ItemDef] =
    itemDefs.get((runId, name))

  override def deleteItem(runId: Long, name: String): Unit = state.synchronized {
    val d = itemDef(runId, name)
    writePointerTable("catalog/items",
      itemsDf.filter(!(col("run_id") === runId && col("name") === name)))
    d.foreach { dd =>
      val fam = family(dd.itemType)
      itemDefs.remove((runId, name))
      pending.remove((runId, name))
      if (manifest.remove((runId, name)).isDefined) persistManifest(runId)
      fs.delete(new Path(itemDir(fam, runId, name)), true)
      invalidate(runId, name, isSet = dd.itemType == ItemType.Set)
    }
  }

  // ---- generational item/fact data -----------------------------------

  /** Committed (run_id, name) -> generation; the pending overlay holds
    * staged writes of checked-out runs.
    *
    * Persistence is SHARDED BY RUN (`catalog/manifest/run_id=N.gG`):
    * a commit rewrites only the committing run's shard — O(items in
    * that run) — where the old single pointer table made every commit
    * rewrite one row per item per run across ALL runs (VERDICT r3
    * "what's wrong" #1: at a 10k-run warehouse each commit paid
    * O(total warehouse rows) driver I/O — the write-path twin of the
    * union-plan problem the partitioned TS scan fixed). Loading reads
    * every run's current shard in ONE multi-path parquet scan. */
  private def loadManifestMirror(): Unit = {
    val m = state.manifest
    // legacy layout (pre-sharding): one global pointer table. Loaded
    // first; any run that has since written a shard is migrated — its
    // shard (even an empty one, after a discard) is authoritative and
    // masks the stale legacy rows.
    readPointerTable("catalog/manifest", manifestSchema).collect().foreach { r =>
      m((r.getLong(0), r.getString(1))) = r.getLong(2)
    }
    val shardIds = manifestShardIds()
    shardIds.foreach(id => m --= m.keys.filter(_._1 == id))
    val paths = shardIds.flatMap(id =>
      currentGenOf(manifestShardName(id)).map(g =>
        s"$root/${manifestShardName(id)}.g$g"))
    if (paths.nonEmpty)
      spark.read.schema(manifestSchema).parquet(paths: _*).collect().foreach { r =>
        m((r.getLong(0), r.getString(1))) = r.getLong(2)
      }
  }

  private def manifestShardName(runId: Long): String =
    s"catalog/manifest/run_id=$runId"

  /** Run ids that have at least one manifest shard generation. */
  private def manifestShardIds(): Seq[Long] = {
    val dir = new Path(s"$root/catalog/manifest")
    if (!fs.exists(dir)) return Seq.empty
    fs.listStatus(dir).iterator.map(_.getPath.getName)
      .flatMap { n =>
        val i = n.indexOf(".g")
        if (n.startsWith("run_id=") && i > 0)
          n.substring("run_id=".length, i).toLongOption
        else None
      }.toSeq.distinct
  }

  /** Rewrite ONE run's manifest shard from the in-memory view (an empty
    * shard — zero rows — is how a discarded run's entries disappear). */
  private def persistManifest(runId: Long): Unit = {
    val rows = manifest.toSeq.collect {
      case ((r, n), g) if r == runId => Row(r, n, g)
    }
    writePointerTable(manifestShardName(runId), spark.createDataFrame(
      java.util.Arrays.asList(rows: _*), manifestSchema))
  }

  private def family(t: ItemType.Value): String = t match {
    case ItemType.Set => "set"
    case ItemType.Par => "par"
    case _ => "sol"
  }

  private def itemDir(fam: String, runId: Long, name: String): String =
    s"$root/data/$fam/run_id=$runId/name=${URLEncoder.encode(name, "UTF-8")}"

  private def genPath(fam: String, runId: Long, name: String, gen: Long): String =
    s"${itemDir(fam, runId, name)}/g$gen"

  private def currentDataGen(runId: Long, name: String): Option[Long] =
    pending.get((runId, name)).orElse(manifest.get((runId, name)))

  private def readVersioned(fam: String, runId: Long, name: String,
      schema: StructType): DataFrame =
    currentDataGen(runId, name) match {
      case Some(g) => spark.read.schema(schema).parquet(genPath(fam, runId, name, g))
      case None => spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

  /** Per-(run,item) generation allocator. Synchronized so two concurrent
    * writers to the same item never pick the same generation number and
    * overwrite each other's in-flight directory (ADVICE r1): each writer
    * gets a distinct directory, and publish keeps the highest one. */
  // generations whose parquet write is currently running: vacuum must
  // not reclaim them (the directory exists before publish, outside the
  // lock) — entries clear in a finally, so even a failed write's
  // garbage becomes reclaimable immediately
  // private[graft] so specs can stage a synthetic slow writer

  private def allocateGen(runId: Long, name: String): Long = state.synchronized {
    acquireWriterLock()
    val next = math.max(
      allocatedGen.getOrElse((runId, name), -1L) + 1,
      currentDataGen(runId, name).getOrElse(-1L) + 1)
    allocatedGen((runId, name)) = next
    inFlight((runId, name, next)) = ()
    next
  }

  /** Write a fresh generation; stage it when the run is checked out,
    * publish immediately otherwise. */
  private def writeVersioned(fam: String, runId: Long, name: String,
      df: DataFrame, schema: StructType): Unit = {
    val next = allocateGen(runId, name)
    try {
      df.selectExpr(schema.fieldNames.map(c => s"`$c`").toIndexedSeq: _*)
        .write.mode("overwrite").parquet(genPath(fam, runId, name, next))
      if (checkedOut.contains(runId)) state.synchronized {
        if (pending.get((runId, name)).forall(_ < next)) pending((runId, name)) = next
      }
      else state.synchronized {
        // monotonic publish: a slower writer with an older generation must
        // not roll the manifest pointer backwards
        if (manifest.get((runId, name)).forall(_ < next)) {
          manifest((runId, name)) = next
          persistManifest(runId)
          gcGens(fam, runId, name, next)
        }
      }
    } finally { inFlight.remove((runId, name, next)); () }
  }

  /** Retain the trailing KeepGens generations of an item: sweep EVERY
    * older generation, not just `newest - KeepGens` — checkout cycles
    * publish in jumps (staged gens land several numbers above the last
    * committed one), so a delete-exactly-one rule left permanent holes
    * that only a manual vacuum() reclaimed. The listing is one small
    * per-item directory (≤ KeepGens + in-flight entries). */
  /** Test seam: invoked with (fam, runId, name, newest) right before a
    * gcGens sweep actually deletes directories. Specs use it to assert
    * the publish-order invariant — by the time old generations of an
    * item are reclaimed, the DURABLE manifest must already reference
    * `newest` (a crash mid-sweep must never leave the on-disk manifest
    * pointing at deleted data). Production no-op. */
  private[graft] var onGcSweep: (String, Long, String, Long) => Unit =
    (_, _, _, _) => ()

  /** Data families a (runId, name) key can live under: the reserved
    * fact names map 1:1; catalog items map by their declared type. */
  private def familiesOf(runId: Long, name: String): Seq[String] = name match {
    case TsName => Seq("ts")
    case GeoName => Seq("geo")
    case CatName => Seq("cat")
    case _ => itemDefs.get((runId, name)).map(_.itemType) match {
      case Some(ItemType.Set) => Seq("set")
      case Some(ItemType.Par) => Seq("par")
      case Some(ItemType.Var) | Some(ItemType.Equ) => Seq("sol")
      case None => Seq("set", "par", "sol", "ts", "geo", "cat") // unknown: probe all
    }
  }

  private def gcGens(fam: String, runId: Long, name: String, newest: Long): Unit = {
    val cutoff = newest - KeepGens
    if (cutoff < 0) return
    val dir = new Path(itemDir(fam, runId, name))
    if (!fs.exists(dir)) return
    onGcSweep(fam, runId, name, newest)
    // same rule as vacuum(): a generation a concurrent writer is still
    // producing must survive even below the cutoff — deleting it
    // mid-write would let that writer publish a pointer to partial data
    val busy = inFlight.keys
      .collect { case (r, n, g) if r == runId && n == name => g }.toSet
    fs.listStatus(dir).foreach { st =>
      st.getPath.getName.stripPrefix("g").toLongOption.foreach { g =>
        if (g <= cutoff && !busy.contains(g)) fs.delete(st.getPath, true)
      }
    }
  }

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

  // every item write/delete routes through invalidate/invalidateRun, so
  // this counter ticks exactly when cached quantities could be stale
  override def mutationCount: Long = mutations.get()

  private def invalidate(runId: Long, name: String, isSet: Boolean): Unit = {
    mutations.incrementAndGet()
    if (isSet) invalidateRun(runId)
    else itemCache.remove((runId, name)).foreach(_.unpersist())
  }

  private def invalidateRun(runId: Long): Unit = {
    mutations.incrementAndGet()
    itemCache.keys.filter(_._1 == runId).foreach { k =>
      itemCache.remove(k).foreach(_.unpersist())
    }
    tsCache.remove(runId).foreach(_.unpersist(blocking = false))
  }

  def clearCache(): Unit = {
    itemCache.values.foreach(_.unpersist())
    itemCache.clear()
    tsCache.values.foreach(_.unpersist(blocking = false))
    tsCache.clear()
  }

  override def itemData(runId: Long, name: String,
      filters: Map[String, Seq[String]]): DataFrame = {
    val d = itemDef(runId, name).getOrElse(
      throw new NoSuchElementException(s"no item '$name' in run $runId"))
    val base = itemCache.getOrElseUpdate((runId, name),
      readVersioned(family(d.itemType), runId, name, dataSchema(d))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
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
    writeVersioned(family(d.itemType), runId, name, df, dataSchema(d))
    invalidate(runId, name, isSet = d.itemType == ItemType.Set)
  }

  // ---- time series / geodata / categories ------------------------------

  // preload_timeseries cache: owned here so TS WRITES can invalidate
  // it — a caller-side persist() was never released and each
  // checkout/commit cycle left a dead old-generation frame cached for
  // the session lifetime (no plan could ever hit it again)

  /** Persist this run's TS slice until the next TS write (reference
    * preload_timeseries, timeseries.py:334-336). */
  def preloadTs(runId: Long): Unit = state.synchronized {
    tsCache.remove(runId).foreach(_.unpersist(blocking = false))
    tsCache(runId) = readVersioned("ts", runId, TsName, tsSchema)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  override def tsData(runId: Long): DataFrame =
    tsCache.getOrElse(runId, readVersioned("ts", runId, TsName, tsSchema))
  override def writeTsData(runId: Long, df: DataFrame): Unit = {
    writeVersioned("ts", runId, TsName, df, tsSchema)
    tsCache.remove(runId).foreach(_.unpersist(blocking = false))
  }
  override def geoData(runId: Long): DataFrame =
    readVersioned("geo", runId, GeoName, geoSchema)
  override def writeGeoData(runId: Long, df: DataFrame): Unit =
    writeVersioned("geo", runId, GeoName, df, geoSchema)

  override def allTsData(): DataFrame = {
    // ONE partitioned FileScan over every run's current TS generation,
    // not a union with one branch per run (VERDICT r2: a 10k-run
    // warehouse would hand the analyzer a 10k-branch plan — driver
    // CPU/memory blowup before a task runs). Listing the explicit
    // per-generation leaf directories masks staged/crashed generations
    // exactly like tsData(), and `basePath` makes Spark parse `run_id`
    // (and the constant `name`) back out of the directory structure as
    // partition columns of the single relation — a run_id predicate
    // above this scan is ordinary partition pruning.
    val runIds = runsDf.select("run_id").collect().map(_.getLong(0)).toSeq
    val paths = runIds.flatMap { id =>
      currentDataGen(id, TsName).map(g => genPath("ts", id, TsName, g))
    }
    val outFields = tsSchema.fields.toSeq :+ StructField("run_id", LongType, nullable = false)
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[Row], StructType(outFields))
    else
      spark.read
        .option("basePath", s"$root/data/ts")
        .schema(StructType(tsSchema.fields.toSeq
          :+ StructField("run_id", LongType) :+ StructField("name", StringType)))
        .parquet(paths: _*)
        .select(outFields.map(f => col(f.name)): _*)
  }

  override def categories(runId: Long, setName: String): DataFrame =
    readVersioned("cat", runId, CatName, catSchema).filter(col("set_name") === setName)

  override def writeCategories(runId: Long, setName: String, df: DataFrame): Unit = {
    val others = readVersioned("cat", runId, CatName, catSchema)
      .filter(col("set_name") =!= setName)
    writeVersioned("cat", runId, CatName, others.unionByName(
      df.select(lit(setName).as("set_name"), col("category"), col("member"))), catSchema)
  }

  // ---- meta + codelists -------------------------------------------------

  override def meta(): DataFrame = readPointerTable("meta", metaSchema)
  override def writeMeta(df: DataFrame): Unit = writePointerTable("meta", df)

  // Reference-seeded defaults (backend/ixmp4.py:175-176,214: a fresh
  // platform carries the 'World' region, a default unit list, and the
  // 'Year' timeslice without explicit registration). They are implicit
  // at READ time rather than written at construction (review r9): a
  // constructor write made every read-only Platform open seize the
  // cross-process writer lock — or fail when a writer held it —
  // contradicting the "pure readers never lock" contract. An explicit
  // add of the same name persists a real row and stays authoritative.
  private val defaultUnits =
    Seq("???", "GWa", "USD/km", "USD/kWa", "cases", "kg", "km")

  override def units(): Seq[String] =
    (readPointerTable("codelists/units", unitsSchema)
      .collect().map(_.getString(0)).toSeq ++ defaultUnits).distinct.sorted

  override def addUnit(u: String): Unit = state.synchronized {
    // check the STORED list (review r9): units() includes the implicit
    // defaults, which made an explicit add of a default a silent no-op
    // where the contract says the explicit row persists
    if (!readPointerTable("codelists/units", unitsSchema)
        .collect().map(_.getString(0)).contains(u))
      writePointerTable("codelists/units",
        readPointerTable("codelists/units", unitsSchema).unionByName(
          spark.createDataFrame(java.util.Arrays.asList(Row(u)), unitsSchema)))
  }

  // ---- model/scenario name codelists (base.py:300-338): explicit
  // entries union the names auto-extended by run creation, so a name
  // registered without a run still lists (VERDICT r2 missing #3).

  private def nameCodelist(table: String, runCol: String): Seq[String] =
    (readPointerTable(s"codelists/$table", nameListSchema)
      .collect().map(_.getString(0)) ++
      runsDf.select(runCol).distinct().collect().map(_.getString(0)))
      .distinct.sorted.toSeq

  private def addNameCodelist(table: String, runCol: String, n: String): Unit =
    state.synchronized {
      if (!nameCodelist(table, runCol).contains(n))
        writePointerTable(s"codelists/$table",
          readPointerTable(s"codelists/$table", nameListSchema).unionByName(
            spark.createDataFrame(java.util.Arrays.asList(Row(n)), nameListSchema)))
    }

  override def modelNames(): Seq[String] = nameCodelist("model_names", "model")
  override def addModelName(n: String): Unit = addNameCodelist("model_names", "model", n)
  override def scenarioNames(): Seq[String] = nameCodelist("scenario_names", "scenario")
  override def addScenarioName(n: String): Unit = addNameCodelist("scenario_names", "scenario", n)

  override def regions(): DataFrame = {
    // the 'World' default region, implicit unless explicitly stored
    // (see the defaults note above units())
    val stored = readPointerTable("codelists/regions", regionsSchema)
    val world = spark.createDataFrame(java.util.Arrays.asList(
      Row("World", "common", null, null)), regionsSchema)
    stored.unionByName(
      world.join(stored.select("region"), Seq("region"), "left_anti"))
  }

  // Idempotent like addUnit: a duplicated region row would fan out
  // resolveRegions' synonym left-join and store every datapoint for
  // that region twice (re-running a setup script must be safe).
  override def addRegion(region: String, hierarchy: String, parent: Option[String]): Unit =
    state.synchronized {
      // idempotency against STORED rows only (review r9): the implicit
      // 'World' default made addRegion("World", ...) a silent no-op,
      // discarding the caller's hierarchy/parent — the explicit row
      // must persist and become authoritative
      val stored = readPointerTable("codelists/regions", regionsSchema)
      if (stored.filter(col("region") === region).isEmpty)
        // union onto the STORED table: regions() includes the implicit
        // World default, which would materialize alongside an explicit
        // World row and duplicate it
        writePointerTable("codelists/regions", stored.unionByName(
          spark.createDataFrame(java.util.Arrays.asList(
            Row(region, hierarchy, parent.orNull, null)), regionsSchema)))
    }

  override def addRegionSynonym(region: String, mappedTo: String): Unit = state.synchronized {
    // a synonym must not shadow a REAL region (review r9): a second
    // 'World' row would remap or join-duplicate every datapoint
    // stored under the genuine region
    require(regions().filter(col("region") === region
        && col("hierarchy") =!= "synonym").isEmpty,
      s"'$region' is already a region — a synonym cannot shadow it")
    if (regions().filter(col("region") === region
        && col("hierarchy") === "synonym").isEmpty)
      writePointerTable("codelists/regions",
        readPointerTable("codelists/regions", regionsSchema).unionByName(
        spark.createDataFrame(java.util.Arrays.asList(
          Row(region, "synonym", null, mappedTo)), regionsSchema)))
  }

  override def timeslices(): DataFrame = {
    // the 'Year' (duration 1.0) default timeslice
    // (doc/data-model.rst:115-128), implicit unless explicitly stored
    val stored = readPointerTable("codelists/timeslices", timeslicesSchema)
    val year = spark.createDataFrame(java.util.Arrays.asList(
      Row("Year", "Common", 1.0)), timeslicesSchema)
    stored.unionByName(
      year.join(stored.select("name"), Seq("name"), "left_anti"))
  }

  // Reference semantics (platform.py:389-397): re-adding an existing
  // timeslice is a no-op when the duration is (numerically) the same
  // and an ERROR when it differs — never a duplicate row (r9 review:
  // the unconditional append diverged; a re-run setup script would
  // duplicate rows and a silent redefinition would keep both
  // durations). Tolerance mirrors np.isclose's defaults.
  override def addTimeslice(name: String, category: String, duration: Double): Unit =
    state.synchronized {
      val existing = timeslices().filter(col("name") === name)
        .select("duration").collect().headOption.map(_.getDouble(0))
      val stored = readPointerTable("codelists/timeslices", timeslicesSchema)
        .filter(col("name") === name).isEmpty
      existing match {
        case Some(d) =>
          require(math.abs(duration - d) <= 1e-8 + 1e-5 * math.abs(d),
            s"timeslice `$name` already defined with duration $d")
          // same duration over the IMPLICIT default: persist the
          // explicit row (review r9 — the contract says it persists)
          // with the CALLER's category (review r10 — materializing
          // timeslices() silently replaced it with the default row's
          // 'Common'); over a stored row: no-op as before
          if (stored)
            writePointerTable("codelists/timeslices",
              readPointerTable("codelists/timeslices", timeslicesSchema)
                .unionByName(spark.createDataFrame(java.util.Arrays.asList(
                  Row(name, category, duration)), timeslicesSchema)))
        case None =>
          writePointerTable("codelists/timeslices",
            readPointerTable("codelists/timeslices", timeslicesSchema)
              .unionByName(spark.createDataFrame(java.util.Arrays.asList(
                Row(name, category, duration)), timeslicesSchema)))
      }
    }

  // ---- documentation KV store (base.py:131-162) ---------------------------

  /** (domain ∈ {model, scenario, region, metadata, timeseries},
    * identifier) → text. */
  def docs(domain: String): DataFrame =
    readPointerTable("docs", docsSchema).filter(col("domain") === domain)

  def setDoc(domain: String, identifier: String, text: String): Unit = state.synchronized {
    val cur = readPointerTable("docs", docsSchema)
      .filter(!(col("domain") === domain && col("identifier") === identifier))
    writePointerTable("docs", cur.unionByName(spark.createDataFrame(
      java.util.Arrays.asList(Row(domain, identifier, text)), docsSchema)))
  }

  def getDoc(domain: String, identifier: String): Option[String] =
    docs(domain).filter(col("identifier") === identifier)
      .collect().headOption.map(_.getString(2))

  def removeDoc(domain: String, identifier: String): Unit = state.synchronized {
    writePointerTable("docs", readPointerTable("docs", docsSchema)
      .filter(!(col("domain") === domain && col("identifier") === identifier)))
  }

  // ---- maintenance -----------------------------------------------------------

  /** Delete item/fact generation directories that are neither the
    * committed generation, a staged one, nor inside the retention
    * window — orphans from crashed writes and discarded checkouts.
    * Returns the number of directories removed. */
  def vacuum(): Int = state.synchronized {
    acquireWriterLock()
    var removed = 0
    val dataRoot = new Path(s"$root/data")
    if (!fs.exists(dataRoot)) return 0
    for (famStatus <- fs.listStatus(dataRoot);
        runStatus <- fs.listStatus(famStatus.getPath)
          if runStatus.getPath.getName.startsWith("run_id=");
        nameStatus <- fs.listStatus(runStatus.getPath)
          if nameStatus.getPath.getName.startsWith("name=")) {
      val runId = runStatus.getPath.getName.stripPrefix("run_id=").toLong
      val name = java.net.URLDecoder.decode(
        nameStatus.getPath.getName.stripPrefix("name="), "UTF-8")
      // in-flight generations (allocated, parquet write still running
      // outside the lock) must survive — deleting one would let a
      // concurrent writer publish a pointer to vanished data
      val keep = (manifest.get((runId, name)).toSeq
          ++ pending.get((runId, name)).toSeq)
        .flatMap(g => (math.max(0, g - KeepGens) to g)).toSet ++
        inFlight.keys.collect { case (r, n, g) if r == runId && n == name => g }
      for (genStatus <- fs.listStatus(nameStatus.getPath)
          if genStatus.getPath.getName.startsWith("g")) {
        val g = genStatus.getPath.getName.stripPrefix("g").toLongOption
        if (g.isEmpty || !keep.contains(g.get)) {
          fs.delete(genStatus.getPath, true)
          removed += 1
        }
      }
    }
    removed
  }

  // ---- transactions ---------------------------------------------------------

  override def checkOut(runId: Long, user: String): Unit = state.synchronized {
    acquireWriterLock()
    val r = getRunById(runId)
    require(r.lockUser.isEmpty, s"run $runId is already checked out by ${r.lockUser.get}")
    checkedOut(runId) = user
    mutateRun(runId)(df => df
      .withColumn("lock_user",
        when(col("run_id") === runId, lit(user)).otherwise(col("lock_user")))
      .withColumn("lock_date",
        when(col("run_id") === runId, lit(nowStamp())).otherwise(col("lock_date"))))
  }

  /** Publish this run's staged generations into the manifest (one
    * generational write) and release the lock. */
  override def commit(runId: Long, user: String, comment: String): Unit = state.synchronized {
    // symmetric with checkOut (review r9): committing a nonexistent or
    // never-checked-out run must say so, not silently append a
    // commit-log row and stamp upd_* over nothing
    getRunById(runId) // named error on an unknown id
    require(checkedOut.contains(runId),
      s"run $runId is not checked out — nothing to commit")
    acquireWriterLock()
    val staged = pending.filter(_._1._1 == runId)
    if (staged.nonEmpty) {
      // publish order mirrors writeVersioned: make the new manifest
      // durable FIRST, then GC. A checkout staging > KeepGens
      // generations of one item pushes the cutoff past the last
      // durably-committed generation — sweeping before persist would
      // leave the on-disk manifest pointing at deleted data if we
      // crash (or are read out-of-process) in between.
      staged.foreach { case (k, g) =>
        manifest(k) = g
        pending.remove(k)
      }
      persistManifest(runId)
      // publish-time GC: the staged-write path skips gcGens (the
      // generation is not visible yet), so the commit must reclaim
      // the retention window or checkout cycles leak directories
      staged.foreach { case ((_, name), g) =>
        // resolve the item's actual family instead of probing all six
        // (review r9: 6 filesystem metadata calls per staged item)
        familiesOf(runId, name).foreach(fam => gcGens(fam, runId, name, g))
      }
    }
    // commit annotations survive (reference transact(commit_message));
    // append-mode: one small file per commit, read via commitLog()
    spark.createDataFrame(
        java.util.Arrays.asList(Row(runId, user, nowStamp(), comment)),
        commitLogSchema)
      .coalesce(1).write.mode("append").parquet(s"$root/catalog/commit_log")
    checkedOut.remove(runId)
    mutateRun(runId)(df => df
      .withColumn("lock_user",
        when(col("run_id") === runId, lit(null).cast(StringType)).otherwise(col("lock_user")))
      .withColumn("lock_date",
        when(col("run_id") === runId, lit(null).cast(StringType)).otherwise(col("lock_date")))
      .withColumn("upd_user",
        when(col("run_id") === runId, lit(user)).otherwise(col("upd_user")))
      .withColumn("upd_date",
        when(col("run_id") === runId, lit(nowStamp())).otherwise(col("upd_date"))))
  }

  /** Commit annotations for `runId` (or all runs), oldest first —
    * the durable record of every commit(run, user, comment). */
  def commitLog(runId: Option[Long] = None): DataFrame = {
    val p = new Path(s"$root/catalog/commit_log")
    if (!fs.exists(p))
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], commitLogSchema)
    val all = spark.read.schema(commitLogSchema).parquet(p.toString)
    runId.fold(all)(id => all.filter(col("run_id") === id)).orderBy("date")
  }

  /** Drop this run's staged generations — rollback to the last commit
    * (reference discard_changes reloads state, timeseries.py:230-239). */
  def discardChanges(runId: Long): Unit = state.synchronized {
    acquireWriterLock()
    pending.filter(_._1._1 == runId).foreach { case (k @ (_, name), g) =>
      pending.remove(k)
      // staged gens are above the committed one: delete every dir the
      // manifest doesn't own
      val committed = manifest.get(k)
      for (fam <- familiesOf(runId, name)) {
        val p = new Path(genPath(fam, runId, name, g))
        if (fs.exists(p) && !committed.contains(g)) fs.delete(p, true)
      }
    }
    invalidateRun(runId)
    checkedOut.remove(runId)
    mutateRun(runId)(df => df
      .withColumn("lock_user",
        when(col("run_id") === runId, lit(null).cast(StringType)).otherwise(col("lock_user")))
      .withColumn("lock_date",
        when(col("run_id") === runId, lit(null).cast(StringType)).otherwise(col("lock_date"))))
  }
}

object ParquetStore {
  /** Generations retained per table so lazy frames survive later writes. */
  val KeepGens = 4

  /** One held OS file lock per store root, shared by every
    * ParquetStore instance in this JVM (java.nio file locks are held
    * process-wide; a second tryLock on the same file from the same JVM
    * throws instead of queueing, so instances must share the handle —
    * their mutual exclusion within the JVM is the instance/registry
    * `synchronized` blocks' job, the OS lock's job is OTHER
    * processes). */
  private val writerLocks =
    TrieMap.empty[String, (java.io.RandomAccessFile, java.nio.channels.FileLock)]
  private val writerLockMutex = new Object

  /** Per-root shared in-JVM mirror state (review r9): the class doc
    * promises any number of threads AND instances on one root is
    * safe, but instance-private mirrors + synchronized-on-this let
    * two instances interleave pointer-table writes and rewrite a
    * run's manifest shard from a stale view. Every instance on the
    * same canonical root now shares ONE copy of the driver-side
    * mirrors (manifest/pending/checkout/allocator/catalog/caches)
    * and synchronizes mutations on it. */
  private[store] final class SharedState {
    val manifest = TrieMap.empty[(Long, String), Long]
    val pending = TrieMap.empty[(Long, String), Long]
    val checkedOut = TrieMap.empty[Long, String]
    val allocatedGen = TrieMap.empty[(Long, String), Long]
    val inFlight = TrieMap.empty[(Long, String, Long), Unit]
    val itemDefs = TrieMap.empty[(Long, String), ItemDef]
    val itemCache = TrieMap.empty[(Long, String), DataFrame]
    val tsCache = TrieMap.empty[Long, DataFrame]
    val mutations = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var loaded = false
  }
  private val states = TrieMap.empty[String, SharedState]
  private[store] def stateFor(key: String): SharedState =
    states.getOrElseUpdate(key, new SharedState)

  private val TsName = "__ts"
  private val GeoName = "__geo"
  private val CatName = "__cat"

  val runsSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("model", StringType, nullable = false),
    StructField("scenario", StringType, nullable = false),
    StructField("version", IntegerType, nullable = false),
    StructField("scheme", StringType),
    StructField("is_default", BooleanType, nullable = false),
    StructField("annotation", StringType),
    StructField("lock_user", StringType),
    // audit columns of the reference's 13-field run inventory
    // (FIELDS["get_scenarios"], backend/common.py:18-32)
    StructField("cre_user", StringType),
    StructField("cre_date", StringType),
    StructField("upd_user", StringType),
    StructField("upd_date", StringType),
    StructField("lock_date", StringType)))

  val itemsSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("type", StringType, nullable = false),
    StructField("idx_sets", ArrayType(StringType), nullable = false),
    StructField("idx_names", ArrayType(StringType), nullable = false)))

  val manifestSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("gen", LongType, nullable = false)))

  val commitLogSchema: StructType = StructType(Seq(
    StructField("run_id", LongType, nullable = false),
    StructField("user", StringType),
    StructField("date", StringType),
    StructField("comment", StringType)))

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

  val nameListSchema: StructType = StructType(Seq(StructField("name", StringType)))

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
