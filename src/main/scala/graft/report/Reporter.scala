package graft.report

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.Scenario
import graft.store.ItemType
import graft.util.Units

/** genno-style key: `name:dim1-dim2:tag` (reference: genno Key as used
  * by ixmp/report/util.py:37-70; dims sorted for canonical lookup). */
final case class Key(name: String, dims: Seq[String], tag: Option[String] = None) {
  /** Canonical dim order, for DISPLAY/comparison only — graph and
    * cache keys deliberately keep the registered dim order (a
    * permuted request like "p:j-i" resolves through the sum lattice
    * and is cached separately, since its OUTPUT column order
    * differs; review r9 confirmed this is a choice, not an
    * accident). */
  def sortedDims: Seq[String] = dims.sorted
  override def toString: String =
    s"$name:${dims.mkString("-")}" + tag.map(t => s":$t").getOrElse("")
}

object Key {
  def parse(s: String): Key = s.split(":", -1) match {
    case Array(n) => Key(n, Nil)
    case Array(n, d) => Key(n, if (d.isEmpty) Nil else d.split("-").toSeq)
    case Array(n, d, t) =>
      Key(n, if (d.isEmpty) Nil else d.split("-").toSeq, Some(t).filter(_.nonEmpty))
    case _ => throw new IllegalArgumentException(s"cannot parse key '$s'")
  }
}

/** A quantity = long-format DataFrame[dims…, value: double] plus a unit
  * attribute (reference genno.Quantity; unit handling per
  * operator.py:114-139). */
final case class Quantity(df: DataFrame, dims: Seq[String], unit: String) {
  def value: Column = col("value")
}

/** DAG-based reporting engine (reference: ixmp/report/reporter.py +
  * genno.Computer; doc/reporting.rst).
  *
  * Spark-first design (SURVEY §3.2): the graph holds **lazy DataFrame
  * builders**; forcing one key hands Catalyst the entire
  * scan→filter→join→agg chain as ONE logical plan, giving whole-query
  * optimization the reference's dask graph cannot do across node
  * boundaries. The 2^n all-subset sums lattice (reporter.py:64-79) is
  * therefore *inferred on demand* — `get("d:i")` derives the partial
  * sum from the full key without pre-registering the lattice.
  */
class Reporter {

  private val graph = mutable.Map.empty[String, () => Quantity]
  // Config lives behind setters so ANY change clears the quantity
  // cache — a cached frame computed under the old filters/units would
  // otherwise be served stale.
  private var _filters: Map[String, Seq[String]] = Map.empty
  private var _renameDims: Map[String, String] = Map.empty
  private var _unitOverrides: Map[String, String] = Map.empty

  /** Ex-ante filters pushed into leaf scans (reporter.py:111-117). */
  def filters: Map[String, Seq[String]] = _filters
  def filters_=(f: Map[String, Seq[String]]): Unit = { _filters = f; clearQuantityCache() }
  /** RENAME_DIMS equivalent (report/common.py:1-3). */
  def renameDims: Map[String, String] = _renameDims
  def renameDims_=(m: Map[String, String]): Unit = synchronized {
    // graph keys bake the mapping in at registration (fromScenario),
    // but leaves re-read renameDims at FORCE time — changing it after
    // registration leaves stale key strings over renamed data, and
    // the lattice's sumOver(keep = oldName) then crashes or a hit
    // returns dims contradicting its own key (review r11). Fail loudly
    // instead: set renameDims BEFORE fromScenario/addScenario.
    require(graph.isEmpty,
      "renameDims must be set before any keys are registered - " +
        "registered key strings already bake in the previous mapping")
    _renameDims = m; clearQuantityCache()
  }
  /** `units/apply` config (operator.py:114-139): item name → unit to
    * apply, overriding whatever the data carries (incl. mixed units). */
  def unitOverrides: Map[String, String] = _unitOverrides
  def unitOverrides_=(m: Map[String, String]): Unit = { _unitOverrides = m; clearQuantityCache() }

  def add(key: String, fn: () => Quantity): this.type = synchronized {
    // graph mutation invalidates the quantity cache (review r9): the
    // store-version check alone never ticks on add(), so a previously
    // INFERRED (sum-lattice) result cached under this key — or a
    // partial sum whose superset resolution this registration changes
    // — would keep winning over the new node
    clearQuantityCache()
    graph(key) = fn; this
  }
  def addDf(key: String, fn: () => DataFrame, dims: Seq[String], unit: String = ""): this.type =
    add(key, () => Quantity(fn(), dims, unit))

  /** Register a FILE as a quantity node (reference Computer.add_file /
    * genno load_file, doc/reporting.rst:82): CSV, parquet or .xlsx by
    * extension; non-value columns are the dims. The read is lazy like
    * every other node — forcing the key hands Catalyst the scan. */
  def addFile(key: String, path: String, spark: org.apache.spark.sql.SparkSession,
      unit: String = ""): this.type = {
    val dims = Key.parse(key).dims
    add(key, () => {
      val df =
        if (path.endsWith(".parquet")) spark.read.parquet(path)
        else if (path.endsWith(".xlsx")) {
          // stitch "(2)"-suffixed continuation sheets, the repo's OWN
          // split-at-1,048,576 write convention (review r11: reading
          // only the first sheet silently lost every row past the
          // split) — via the ONE shared stitcher (review r12)
          val all = graft.io.Xlsx.read(path)
          val base = all.head._1.replaceAll("\\(\\d+\\)$", "")
          val (header, data) = graft.io.Xlsx.stitchSheets(all, base)
          graft.io.Xlsx.rowsToDf(spark, header, data)
        }
        else spark.read.option("header", true).csv(path)
      Quantity(df.select((dims.map(col) :+ col("value").cast("double")): _*), dims, unit)
    })
  }

  /** Human-readable resolution tree for a key (reference
    * Computer.describe, doc/reporting.rst:69): how `get(key)` would
    * compute — a registered node, or a partial sum inferred from the
    * registered full-dimensionality key. */
  def describe(key: String): String = {
    val k = Key.parse(key)
    if (graph.contains(key) || graph.contains(k.toString))
      s"'$key' (registered node)"
    else
      resolveSuperset(k) match {
        case Some((reg, full)) if full.dims == k.dims =>
          s"'$key' (registered node, spelled '$reg')"
        case Some((_, full)) =>
          val summed = full.dims.filterNot(k.dims.contains)
          s"'$key' = sum of '${full.toString}' over [${summed.mkString(", ")}]"
        case None => s"'$key' (NOT RESOLVABLE)"
      }
  }

  /** Sum-lattice resolution shared by [[describe]] and [[get]]: the
    * smallest registered key with the same name/tag whose dims cover
    * the request, returned WITH its registered graph spelling (review
    * r12 — compute must route through the spelling that actually sits
    * in the graph: routing through the parsed key's canonical
    * toString recursed forever when the two differ, e.g. a bare-name
    * registration "i" requested as its canonical "i:"). */
  private def resolveSuperset(k: Key): Option[(String, Key)] =
    graph.keys.map(s => (s, Key.parse(s)))
      .filter { case (_, c) => c.name == k.name && c.tag == k.tag &&
        k.dims.forall(c.dims.contains) }
      // deterministic tie-break (review r11): equal-arity covering
      // keys used to resolve by mutable-Map hash iteration order — a
      // request covered by both "d:i-j" and "d:i-k" silently summed
      // over a DIFFERENT dim run-to-run. Lexicographic key order pins
      // the choice (and keeps describe() and get() agreeing forever).
      .minByOption { case (_, c) => (c.dims.length, c.toString) }

  def keys: Seq[String] = graph.keys.toSeq.sorted

  /** Reference-surface alias of the [[filters_=]] setter (the
    * reference spells it Reporter.set_filters, reporter.py:111-117);
    * routes through the setter so the cache-clearing invariant holds
    * for both spellings. */
  def setFilters(f: Map[String, Seq[String]]): Unit = { filters = f }

  // Quantity-level result cache (reference CachingBackend,
  // base.py:1291-1454, lifted from the item level to computed
  // quantities): a forced key keeps its persisted frame until the
  // underlying store mutates — `versionProvider` snapshots
  // store.mutationCount, which ticks on EVERY item write, giving the
  // any-set-change global invalidation of jdbc.py:1358-1362 — or the
  // filter config changes. Repeated `get`s of a hot key are then
  // memory-served instead of re-scanned (VERDICT r2 #8).
  private val qCache = mutable.Map.empty[String, (Long, Quantity)]
  private[report] var versionProvider: () => Long = () => 0L

  def clearQuantityCache(): Unit = synchronized {
    qCache.values.foreach(_._2.df.unpersist(blocking = false))
    qCache.clear()
  }

  /** Force a key (cached). Exact graph hit first; else sum-lattice
    * inference: a registered key with the same name whose dims ⊇ the
    * requested dims is partially summed (the moral `cube` of SURVEY
    * §2 #26, built lazily). */
  def get(key: String): Quantity = synchronized {
    val ver = versionProvider()
    qCache.get(key) match {
      case Some((v, q)) if v == ver => q
      case stale =>
        stale.foreach(_._2.df.unpersist(blocking = false))
        val q = compute(key)
        val cached = q.copy(df = q.df.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK))
        qCache(key) = (ver, cached)
        cached
    }
  }

  private def compute(key: String): Quantity = {
    val k = Key.parse(key)
    graph.get(key).orElse(graph.get(k.toString)).map(_()) getOrElse {
      val (regStr, full) = resolveSuperset(k)
        .getOrElse(throw new NoSuchElementException(s"no key '$key' in the graph"))
      // route through get() ON THE REGISTERED SPELLING, not the node
      // directly (review r11: synchronized is reentrant, and the
      // direct call re-ran the full leaf scan for EVERY distinct
      // partial-sum request) and not the canonical toString (review
      // r12: when the registration spelling differs — a bare-name "i"
      // requested as "i:" — get(full.toString) missed the graph,
      // resolved back here, and recursed to StackOverflowError).
      // regStr always hits graph.get directly, so this terminates.
      val q = get(regStr)
      if (full.dims == k.dims) q // same key, different spelling
      else Operators.sumOver(q, keep = k.dims)
    }
  }

  /** Force a key and return the DataFrame (dims + value). */
  def getDf(key: String): DataFrame = get(key).df

  /** One-call IAMC export of a computed key — the reference's
    * `convert_pyam` Reporter output path (doc/reporting.rst:85; column
    * contract = IAMC_IDX + year columns, backend/common.py:52): force
    * `key`, project onto long IAMC rows via [[Reporter.toIamc]] (dims
    * beyond region/year are summed out, never silently dropped),
    * normalize with [[graft.util.Util.toIamcLayout]], then pivot years
    * wide. Region/year dims are auto-detected from their common ixmp
    * spellings when not given explicitly. */
  def toIamc(key: String, model: String, scenario: String,
      variable: String = "", regionDim: String = "",
      yearDim: String = ""): DataFrame = {
    val q = get(key)
    def pick(explicit: String, cands: Seq[String]): Option[String] =
      if (explicit.nonEmpty) Some(explicit) else cands.find(q.dims.contains)
    // incl. message_ix RENAME_DIMS spellings (review r11: "nl" fell
    // through and per-region data was silently summed to World)
    val rd = pick(regionDim, Seq("region", "node", "n", "r", "nl", "node_loc"))
    val yd = pick(yearDim, Seq("year", "y", "ya", "yv"))
    val v = if (variable.nonEmpty) variable else Key.parse(key).name
    val long = graft.util.Util.toIamcLayout(
      Operators.toIamc(q, model, scenario, v, rd, yd))
    if (yd.isDefined)
      graft.util.Util.longToWide(long,
        Seq("model", "scenario", "region", "variable", "unit", "subannual"))
    else long
  }

  /** CSV sink for [[toIamc]]: a headered CSV at `path` (directory of
    * part files, like every sink here — the frame is one
    * already-aggregated report key, so this is small output, but the
    * write stays distributed for consistency). Years ascend left to
    * right because [[graft.util.Util.longToWide]] pivots on the sorted
    * distinct years. */
  def writeIamcCsv(key: String, path: String, model: String,
      scenario: String, variable: String = "", regionDim: String = "",
      yearDim: String = ""): Unit =
    toIamc(key, model, scenario, variable, regionDim, yearDim)
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .option("header", true).csv(path)
}

object Reporter {

  /** Build the quantity graph from a scenario (reference
    * Reporter.from_scenario, reporter.py:44-99): every par gives a
    * `name:dims` key; every var/equ gives level + `name-margin` keys;
    * sets are registered as element lists. */
  def fromScenario(s: Scenario, renameDims: Map[String, String] = Map.empty): Reporter = {
    val r = new Reporter
    r.renameDims = renameDims
    // cache staleness tracks the scenario's store: any item write
    // anywhere invalidates cached quantities on the next get
    r.versionProvider = () => s.platform.store.mutationCount

    def register(name: String, t: ItemType.Value): Unit = {
      val dims0 = s.idxNames(name)
      val dims = dims0.map(d => r.renameDims.getOrElse(d, d))
      val key = Key(name, dims).toString
      t match {
        case ItemType.Par =>
          r.add(key, () => dataForQuantity(s, name, "value", r))
        case ItemType.Var | ItemType.Equ =>
          r.add(key, () => dataForQuantity(s, name, "lvl", r))
          r.add(Key(s"$name-margin", dims).toString,
            () => dataForQuantity(s, name, "mrg", r))
        case _ =>
      }
    }

    s.parList().foreach(register(_, ItemType.Par))
    s.varList().foreach(register(_, ItemType.Var))
    s.equList().foreach(register(_, ItemType.Equ))
    // Sets register under their bare name (review r9: the docstring
    // promised them, reporter.py:44-99 provides them) as INDICATOR
    // quantities — each element row carries value 1.0, the DataFrame
    // analogue of genno's element lists, directly usable as a
    // membership mask in products.
    s.setList().foreach { name =>
      val dims0 = if (s.idxNames(name).isEmpty) Seq(name) else s.idxNames(name)
      val dims = dims0.map(d => r.renameDims.getOrElse(d, d))
      r.add(name, () => {
        val df0 = s.set(name)
        val renamed = df0.columns.zip(dims).foldLeft(df0) {
          case (d, (o, n)) => if (o != n) d.withColumnRenamed(o, n) else d
        }
        Quantity(renamed.withColumn("value", lit(1.0)), dims, "")
      })
    }
    r
  }

  /** Leaf scan → Quantity (reference data_for_quantity,
    * operator.py:27-159): push ex-ante filters into the scan (after
    * reverse dim-rename), pop the unit column into the quantity
    * attribute — **mixed units are discarded with a warning**
    * (operator.py:114-139) — and sum duplicate keys. */
  private[report] def dataForQuantity(s: Scenario, name: String,
      valueCol: String, r: Reporter): Quantity = {
    val dims0 = s.idxNames(name)
    val reverse = r.renameDims.map(_.swap)
    val applicable = r.filters.collect {
      case (dim, vals) if dims0.contains(reverse.getOrElse(dim, dim)) =>
        reverse.getOrElse(dim, dim) -> vals.map(x => x: Any)
    }
    val base = valueCol match {
      case "value" => s.par(name, applicable)
      case "lvl" => solutionData(s, name, applicable).withColumnRenamed("lvl", "value")
      case "mrg" => solutionData(s, name, applicable).withColumnRenamed("mrg", "value")
    }
    val unit: String = r.unitOverrides.get(name).getOrElse {
      if (!base.columns.contains("unit")) ""
      else {
        // null unit cells normalize to "" BEFORE headOption (review
        // r11: Some(null) defeated the getOrElse and Units.parse(null)
        // later NPE'd in unit algebra)
        val us = base.select("unit").distinct().limit(2).collect()
          .map(r => Option(r.getString(0)).getOrElse(""))
        if (us.length > 1) "" // mixed units discarded (operator.py:136-139)
        else us.headOption.getOrElse("")
      }
    }
    val dims = dims0.map(d => r.renameDims.getOrElse(d, d))
    val renamed = dims0.zip(dims).foldLeft(base) { case (df, (from, to)) =>
      if (from != to) df.withColumnRenamed(from, to) else df
    }
    val df =
      if (dims.isEmpty) renamed.select(col("value"))
      else renamed.groupBy(dims.map(col): _*)
        .agg(sum("value").as("value"))
    Quantity(df, dims, unit)
  }

  private def solutionData(s: Scenario, name: String,
      filters: Map[String, Seq[Any]]): DataFrame =
    if (s.varList().contains(name)) s.variable(name, filters)
    else s.equation(name, filters)
}

/** The reporting operator library (reference doc/reporting.rst:58-159;
  * genno operators surfaced by ixmp). All whole-quantity
  * DataFrame→DataFrame transforms — SURVEY §2.11. */
object Operators {

  /** Sum over all dims not in `keep` (genno sum / the all-subset sums
    * of reporter.py:64-79). */
  def sumOver(q: Quantity, keep: Seq[String]): Quantity = {
    val dropped = q.dims.filterNot(keep.contains)
    require(keep.forall(q.dims.contains),
      s"cannot keep ${keep.filterNot(q.dims.contains).mkString(",")}: not dims of the quantity")
    val df =
      if (keep.isEmpty) q.df.agg(sum("value").as("value"))
      else q.df.groupBy(keep.map(col): _*).agg(sum("value").as("value"))
    Quantity(df, keep, q.unit)
  }

  /** genno `aggregate`: relabel members of one dim into named groups
    * and sum within each group; `keep=true` appends the originals
    * (doc/reporting.rst:77-86). */
  def aggregate(q: Quantity, dim: String, groups: Map[String, Seq[String]],
      keep: Boolean = false): Quantity = {
    require(q.dims.contains(dim), s"'$dim' is not a dim of the quantity")
    val spark = q.df.sparkSession
    import spark.implicits._
    val mapping = groups.toSeq.flatMap { case (g, members) => members.map(m => (m, g)) }
      .toDF("__member", "__group")
    val agg = q.df.join(broadcast(mapping), q.df(dim) === col("__member"))
      .drop(dim, "__member").withColumnRenamed("__group", dim)
      .groupBy(q.dims.map(col): _*).agg(sum("value").as("value"))
    val df = if (keep) q.df.unionByName(agg) else agg
    Quantity(df, q.dims, q.unit)
  }

  /** Element-wise product on the union of dims (genno mul /
    * add_product, doc/reporting.rst:77-86): join on common dims,
    * broadcast along the others; unit algebra multiplies. */
  def product(a: Quantity, b: Quantity): Quantity =
    combine(a, b, (x, y) => x * y,
      (ua, ub) => (Units.parse(ua) * Units.parse(ub)).format)

  /** Element-wise ratio; unit algebra divides. */
  def ratio(a: Quantity, b: Quantity): Quantity =
    combine(a, b, (x, y) => x / y,
      (ua, ub) => (Units.parse(ua) / Units.parse(ub)).format)

  /** Element-wise sum of same-unit quantities (genno add). */
  /** Sum of two quantities. Units must agree or be CONVERTIBLE
    * (review r11: mismatched units previously summed raw magnitudes
    * and blanked the unit — 1 kg + 1 t read as 2 of nothing — while
    * sub in this same file raised; genno's add converts-or-raises):
    * b is scaled into a's unit when the linear factor is known,
    * otherwise this raises like sub. */
  def add(a: Quantity, b: Quantity): Quantity = {
    require(a.dims.sorted == b.dims.sorted, "add requires identical dims")
    val bAligned =
      if (a.unit == b.unit) b
      else Units.conversionFactor(
          Units.parse(b.unit), Units.parse(a.unit)) match {
        case Some(f) =>
          b.copy(df = b.df.withColumn("value", col("value") * f))
        case None => throw new IllegalArgumentException(
          s"add: incompatible units '${a.unit}' vs '${b.unit}'")
      }
    val df = a.df.unionByName(
        bAligned.df.select(a.df.columns.map(col).toSeq: _*))
      .groupBy(a.dims.map(col): _*).agg(sum("value").as("value"))
    Quantity(df, a.dims, a.unit)
  }

  private def combine(a: Quantity, b: Quantity, op: (Column, Column) => Column,
      unitOp: (String, String) => String): Quantity = {
    val common = a.dims.intersect(b.dims)
    val outDims = (a.dims ++ b.dims).distinct
    val joined =
      if (common.nonEmpty)
        a.df.withColumnRenamed("value", "__va")
          .join(b.df.withColumnRenamed("value", "__vb"), common)
      else a.df.withColumnRenamed("value", "__va")
        .crossJoin(b.df.withColumnRenamed("value", "__vb"))
    val df = joined.withColumn("value", op(col("__va"), col("__vb")))
      .select(outDims.map(col) :+ col("value"): _*)
    Quantity(df, outDims, unitOp(a.unit, b.unit))
  }

  /** genno select: keep only given labels along dims (ex-post filter). */
  def select(q: Quantity, selectors: Map[String, Seq[String]]): Quantity =
    Quantity(selectors.foldLeft(q.df) { case (df, (dim, vals)) =>
      df.filter(col(dim).isin(vals: _*))
    }, q.dims, q.unit)

  /** genno concat: union quantities with identical dims. */
  def concat(qs: Seq[Quantity]): Quantity = {
    require(qs.nonEmpty, "concat of no quantities")
    val dims = qs.head.dims
    require(qs.forall(_.dims.sorted == dims.sorted), "concat requires identical dims")
    val df = qs.map(_.df.select(qs.head.df.columns.map(col).toSeq: _*)).reduce(_ unionByName _)
    Quantity(df, dims, if (qs.map(_.unit).distinct.size == 1) qs.head.unit else "")
  }

  /** broadcast_map (reference operator.py:204-241 + SURVEY §2 #25):
    * join data with a (category, member, value) mapping along `dim`,
    * re-aggregate onto the category labels. */
  def broadcastMap(q: Quantity, mapping: DataFrame, dim: String,
      renameTo: Option[String] = None): Quantity = {
    val outDim = renameTo.getOrElse(dim)
    val outDims = q.dims.map(d => if (d == dim) outDim else d)
    val m = mapping.select(col("category"), col("member"),
      col("value").as("__weight"))
    val df = q.df.join(broadcast(m), q.df(dim) === m("member"))
      .withColumn("value", col("value") * col("__weight"))
      .drop(dim, "member", "__weight")
      .withColumnRenamed("category", outDim)
      .groupBy(outDims.map(col): _*)
      .agg(sum(col("value")).as("value"))
    Quantity(df, outDims, q.unit)
  }

  /** Disaggregate along a new dim using a share mapping
    * (doc/reporting.rst:77-86 `disaggregate_shares`): cross with
    * (newDim, share) rows and multiply. */
  def disaggregate(q: Quantity, shares: DataFrame, newDim: String): Quantity = {
    val df = q.df.crossJoin(broadcast(shares.select(col(newDim), col("share"))))
      .withColumn("value", col("value") * col("share")).drop("share")
    Quantity(df, q.dims :+ newDim, q.unit)
  }

  /** genno relabel: rename coordinate labels along dims (no
    * re-aggregation — distinct labels stay distinct; collapsing labels
    * is [[aggregate]]'s job). */
  def relabel(q: Quantity, mapping: Map[String, Map[String, String]]): Quantity = {
    require(mapping.keys.forall(q.dims.contains),
      s"relabel dims ${mapping.keys.filterNot(q.dims.contains).mkString(",")} not in quantity")
    val df = mapping.foldLeft(q.df) { case (d, (dim, m)) =>
      val mapped = m.foldLeft(col(dim)) { case (c, (from, to)) =>
        when(col(dim) === from, lit(to)).otherwise(c)
      }
      d.withColumn(dim, mapped)
    }
    Quantity(df, q.dims, q.unit)
  }

  /** genno index_to: values relative to the slice at `label` along
    * `dim` (e.g. index every year to 2020 = 1.0). The base slice joins
    * broadcast on the remaining dims; groups with no base row drop
    * (0/0 would otherwise poison downstream sums). Dimensionless. */
  def indexTo(q: Quantity, dim: String, label: String): Quantity = {
    require(q.dims.contains(dim), s"'$dim' is not a dim of the quantity")
    val others = q.dims.filterNot(_ == dim)
    val base = q.df.filter(col(dim) === label)
      .select(others.map(col) :+ col("value").as("__base"): _*)
    val joined =
      if (others.isEmpty) q.df.crossJoin(broadcast(base))
      else q.df.join(broadcast(base), others)
    Quantity(joined.withColumn("value", col("value") / col("__base"))
      .drop("__base"), q.dims, "")
  }

  /** genno combine: weighted sum Σ wᵢ·qᵢ of same-dim quantities (one
    * union + one aggregation — the weights fold into the map side).
    * COMPATIBLE units convert into the first quantity's unit before
    * summing; incompatible units raise (review r13: this had the exact
    * defect [[add]] was cured of in r11 — mixed units summed raw
    * magnitudes and blanked the unit, so 1 kg + 1 t combined to 2 of
    * nothing while the add/sub siblings converted). */
  def combineWeighted(qs: Seq[Quantity], weights: Seq[Double]): Quantity = {
    require(qs.nonEmpty && qs.size == weights.size,
      "combine needs one weight per quantity")
    val dims = qs.head.dims
    require(qs.forall(_.dims.sorted == dims.sorted),
      "combine requires identical dims")
    val aligned = qs.map { q =>
      if (q.unit == qs.head.unit) q
      else Units.conversionFactor(
          Units.parse(q.unit), Units.parse(qs.head.unit)) match {
        case Some(f) =>
          q.copy(df = q.df.withColumn("value", col("value") * f))
        case None => throw new IllegalArgumentException(
          s"combine: incompatible units '${qs.head.unit}' vs '${q.unit}'")
      }
    }
    val cols = qs.head.df.columns.map(col).toSeq
    val weighted = aligned.zip(weights).map { case (q, w) =>
      q.df.select(cols: _*).withColumn("value", col("value") * lit(w))
    }
    val df = weighted.reduce(_ unionByName _)
      .groupBy(dims.map(col): _*).agg(sum("value").as("value"))
    Quantity(df, dims, qs.head.unit)
  }

  /** genno pow: integer power of a quantity; units exponentiate. */
  def pow(q: Quantity, n: Int): Quantity =
    Quantity(q.df.withColumn("value", org.apache.spark.sql.functions.pow(col("value"), n)),
      q.dims, Units.parse(q.unit).pow(n).format)

  /** genno mul — the operator-name alias of [[product]] (genno exposes
    * both; graph configs reference either). */
  def mul(a: Quantity, b: Quantity): Quantity = product(a, b)

  /** genno div — the operator-name alias of [[ratio]]. */
  def div(a: Quantity, b: Quantity): Quantity = ratio(a, b)

  /** genno expand_dims: add a new dimension with a single constant
    * label (the xarray operation genno uses to align quantities before
    * concat/broadcast; values and units untouched). */
  def expandDims(q: Quantity, dim: String, label: String): Quantity = {
    require(!q.dims.contains(dim), s"'$dim' is already a dim of the quantity")
    Quantity(q.df.withColumn(dim, lit(label)), q.dims :+ dim, q.unit)
  }

  /** genno sub: element-wise difference a − b (same broadcast-on-
    * common-dims semantics as [[product]]/[[ratio]]). COMPATIBLE units
    * convert — b is scaled into a's unit like [[add]] does (review
    * r12: sub required byte-identical unit STRINGS while its sibling
    * converted, so `1 t − 500 kg` raised and even `kW*a` vs `a * kW`
    * — the same unit, spelled differently — was refused); truly
    * incompatible units still raise. */
  def sub(a: Quantity, b: Quantity): Quantity = {
    val bAligned =
      if (a.unit == b.unit) b
      else Units.conversionFactor(
          Units.parse(b.unit), Units.parse(a.unit)) match {
        case Some(f) =>
          b.copy(df = b.df.withColumn("value", col("value") * f))
        case None => throw new IllegalArgumentException(
          s"sub: incompatible units '${a.unit}' vs '${b.unit}'")
      }
    combine(a, bAligned, (x, y) => x - y, (ua, _) => ua)
  }

  /** genno group_sum: sum over dim `sum` within groups of dim `group`
    * — the named special case of [[sumOver]] keeping everything except
    * `sum` (genno's operator exists for graph-readability; so does
    * this one). */
  def groupSum(q: Quantity, group: String, sum: String): Quantity = {
    require(q.dims.contains(group), s"'$group' is not a dim of the quantity")
    require(q.dims.contains(sum), s"'$sum' is not a dim of the quantity")
    sumOver(q, q.dims.filterNot(_ == sum))
  }

  /** genno round: half-even to `digits` decimals (Spark `round` =
    * xarray/numpy banker-free HALF_UP — genno delegates to
    * DataArray.round which is half-even, so use bround). */
  def round(q: Quantity, digits: Int = 0): Quantity =
    Quantity(q.df.withColumn("value", bround(col("value"), digits)),
      q.dims, q.unit)

  /** genno clip: bound values to [min, max] (either side optional —
    * xarray clip semantics). */
  def clip(q: Quantity, min: Option[Double] = None,
      max: Option[Double] = None): Quantity = {
    val lo = min.map(m => greatest(col("value"), lit(m))).getOrElse(col("value"))
    val c = max.map(m => least(lo, lit(m))).getOrElse(lo)
    Quantity(q.df.withColumn("value", c), q.dims, q.unit)
  }

  /** genno rename / rename_dims as an operator: rename dimension NAMES
    * of one quantity (labels untouched — that is [[relabel]]; the
    * Reporter-level `renameDims` config does this at scan time for
    * every quantity). */
  def rename(q: Quantity, mapping: Map[String, String]): Quantity = {
    require(mapping.keys.forall(q.dims.contains),
      s"rename dims ${mapping.keys.filterNot(q.dims.contains).mkString(",")} not in quantity")
    val df = mapping.foldLeft(q.df) { case (d, (from, to)) =>
      d.withColumnRenamed(from, to)
    }
    Quantity(df, q.dims.map(d => mapping.getOrElse(d, d)), q.unit)
  }

  /** genno assign_units: overwrite the unit string, values untouched
    * (the escape hatch for mislabeled inputs). */
  def assignUnits(q: Quantity, unit: String): Quantity =
    Quantity(q.df, q.dims, unit)

  /** genno convert_units: strict linear conversion — values scale by
    * the factor between the two units' canonical forms; incompatible
    * dimensionalities throw (pint DimensionalityError). */
  def convertUnits(q: Quantity, unit: String): Quantity = {
    val f = Units.conversionFactor(Units.parse(q.unit), Units.parse(unit))
      .getOrElse(throw new IllegalArgumentException(
        s"cannot convert '${q.unit}' to '$unit': incompatible dimensionality"))
    val df = if (f == 1.0) q.df
      else q.df.withColumn("value", col("value") * lit(f))
    Quantity(df, q.dims, unit)
  }

  /** genno apply_units: convert when the dimensionality is compatible,
    * overwrite otherwise (genno's documented lenient behavior, minus
    * the warning log). */
  def applyUnits(q: Quantity, unit: String): Quantity =
    Units.conversionFactor(Units.parse(q.unit), Units.parse(unit)) match {
      case Some(_) => convertUnits(q, unit)
      case None => assignUnits(q, unit)
    }

  /** genno write_report: sink a quantity as a headered long-form table
    * — dims, `value`, constant `unit`. `.csv` writes a distributed
    * part-file directory (like every sink here); `.xlsx` writes a
    * single workbook via the bare-JDK codec (driver-side collect —
    * report keys are aggregated output, small by construction, same
    * contract as the reference's openpyxl path). */
  def writeReport(q: Quantity, path: String): Unit = {
    val out = q.df.select(q.dims.map(col) :+ col("value") :+
      lit(q.unit).as("unit"): _*)
    if (path.toLowerCase(java.util.Locale.ROOT).endsWith(".xlsx")) {
      val header: Seq[Any] = q.dims ++ Seq("value", "unit")
      val rows = out.collect().iterator.map(_.toSeq.map {
        case null => ""
        case v => v
      })
      // split at the sheet cap with ScenarioIO's "(n)" continuation
      // convention (review r11: one unsplit sheet made Xlsx.write's
      // MaxRows require throw MID-STREAM past 1,048,575 rows, leaving
      // a truncated/corrupt file at path)
      val cap = graft.io.Xlsx.MaxRows - 1 // the header occupies one row
      val sheets = rows.grouped(cap).zipWithIndex.map { case (chunk, i) =>
        val nm = if (i == 0) "data" else s"data(${i + 1})"
        nm -> (Iterator.single(header) ++ chunk.iterator)
      }.toSeq
      graft.io.Xlsx.write(path,
        if (sheets.isEmpty) Seq("data" -> Iterator.single(header)) else sheets)
    } else
      out.write.mode(org.apache.spark.sql.SaveMode.Overwrite)
        .option("header", true).csv(path)
  }

  /** genno interpolate (linear, along one NUMERIC dim — the year-fill
    * workflow): produce values at `targets` coordinates per group of
    * the remaining dims. One aggregation shuffle: each (group, target)
    * pair reduces the bracketing coordinates with conditional max/min —
    * no window, no sort. Targets outside a group's coordinate range
    * drop (xarray's NaN rows). Existing coordinates pass through
    * exactly. */
  def interpolate(q: Quantity, dim: String, targets: Seq[Double]): Quantity = {
    require(q.dims.contains(dim), s"'$dim' is not a dim of the quantity")
    val spark = q.df.sparkSession
    import spark.implicits._
    val others = q.dims.filterNot(_ == dim)
    val t = broadcast(targets.toDF("__t"))
    val y = col(dim).cast("double")
    val joined = q.df.crossJoin(t)
    val grouped = joined.groupBy((others.map(col) :+ col("__t")): _*)
      .agg(
        max(when(y <= col("__t"), y)).as("__y0"),
        min(when(y >= col("__t"), y)).as("__y1"),
        max_by(col("value"), when(y <= col("__t"), y)).as("__v0"),
        min_by(col("value"), when(y >= col("__t"), y)).as("__v1"))
      .filter(col("__y0").isNotNull && col("__y1").isNotNull)
      .withColumn("value",
        when(col("__y0") === col("__y1"), col("__v0"))
          .otherwise(col("__v0") + (col("__v1") - col("__v0")) *
            (col("__t") - col("__y0")) / (col("__y1") - col("__y0"))))
    // integral targets keep integer-style labels ("2015", not
    // "2015.0") so interpolated coordinates MERGE with the original
    // string labels in downstream unions/joins (review r9: the raw
    // double column silently forked "2015.0" vs "2015" group keys)
    val label = when(col("__t") === floor(col("__t")),
      col("__t").cast("long").cast("string"))
      .otherwise(col("__t").cast("string"))
    val df = grouped.select(
      (others.map(col) :+ label.as(dim) :+ col("value")): _*)
    Quantity(df, q.dims, q.unit)
  }

  /** convert_pyam-ish IAMC projection (reference util/__init__.py:411-452
    * column contract): map a quantity onto IAMC columns. */
  def toIamc(q: Quantity, model: String, scenario: String, variable: String,
      regionDim: Option[String], yearDim: Option[String]): DataFrame = {
    // a dim name that is not actually a dim would no-op the rename
    // below and surface later as a cryptic missing-column error
    (regionDim.toSeq ++ yearDim.toSeq).foreach(d =>
      require(q.dims.contains(d), s"'$d' is not a dim of the quantity " +
        s"(dims: ${q.dims.mkString(", ")})"))
    // dims beyond region/year are summed out first — never silently
    // dropped, which would emit duplicate IAMC keys
    val keep = (regionDim.toSeq ++ yearDim.toSeq)
    val q2 =
      if (q.dims.forall(keep.contains)) q
      else Operators.sumOver(q, keep.filter(q.dims.contains))
    var df = q2.df
      .withColumn("model", lit(model))
      .withColumn("scenario", lit(scenario))
      .withColumn("variable", lit(variable))
      .withColumn("unit", lit(q.unit))
    df = regionDim match {
      case Some(rd) => df.withColumnRenamed(rd, "region")
      case None => df.withColumn("region", lit("World"))
    }
    df = yearDim match {
      case Some(yd) => df.withColumn("year", col(yd).cast("double").cast("int"))
      case None => df
    }
    df.select(Seq("model", "scenario", "region", "variable", "unit")
      .map(col) ++ (if (yearDim.isDefined) Seq(col("year")) else Nil) :+ col("value"): _*)
  }
}
