package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Platform-URL coordinates (reference: ixmp/util/__init__.py:340-408 —
  * `ixmp://PLATFORM/MODEL/SCENARIO#VERSION`; model may not contain "/",
  * scenario may; version is an int or "new"). */
final case class ScenarioUrl(
    platform: Option[String],
    model: String,
    scenario: String,
    version: Option[Either[Int, String]])

/** Pure utility layer mirroring ixmp/util/__init__.py (public knowledge
  * only; semantics re-derived from the cited reference lines). */
object Util {

  /** Universal stringification of dimension keys / filter values
    * (reference: util/__init__.py:86-110 — ints become "42", so
    * {'foo':[42]} ≡ {'foo':['42']}). */
  def asStrList(vs: Iterable[Any]): Seq[String] = vs.map(asStr).toSeq

  def asStr(v: Any): String = v match {
    case s: String => s
    // whole doubles render as ints ONLY inside long range: beyond it
    // toLong saturates and 1e19 rendered as Long.MaxValue's digits
    // (review r11) — fall through to the faithful double rendering
    case d: Double if d.isWhole && math.abs(d) < 9.2e18 => d.toLong.toString
    case other => other.toString
  }

  /** check_year (util/__init__.py:127-133): None passes, non-int raises.
    * A long outside Int range RAISES too (review r11: toInt silently
    * truncated 5000000000 to 705032704 — a corrupt year must be loud,
    * per this function's own contract). */
  def checkYear(y: Option[Any], name: String): Option[Int] = y.map {
    case i: Int => i
    case l: Long if l >= Int.MinValue && l <= Int.MaxValue => l.toInt
    case other =>
      throw new IllegalArgumentException(s"$name ($other) must be an integer")
  }

  /** Parse `ixmp://PLATFORM/MODEL/SCENARIO#VERSION` or
    * `MODEL/SCENARIO#VERSION` (reference: util/__init__.py:340-408). */
  def parseUrl(url: String): ScenarioUrl = {
    val (platform, rest) =
      if (url.startsWith("ixmp://")) {
        val tail = url.stripPrefix("ixmp://")
        val slash = tail.indexOf('/')
        require(slash > 0, s"no model/scenario in URL '$url'")
        (Some(tail.substring(0, slash)), tail.substring(slash + 1))
      } else (None, url)
    val (coords, version) = rest.indexOf('#') match {
      case -1 => (rest, None)
      case i =>
        val v = rest.substring(i + 1)
        (rest.substring(0, i),
          Some(if (v == "new") Right("new")
          else Left(v.toIntOption.getOrElse(
            throw new IllegalArgumentException(s"version '$v' is not an int or 'new'")))))
    }
    // model may not contain "/"; scenario may (split on the FIRST slash)
    val slash = coords.indexOf('/')
    require(slash > 0 && slash < coords.length - 1,
      s"URL '$url' does not contain model/scenario")
    ScenarioUrl(platform, coords.substring(0, slash), coords.substring(slash + 1), version)
  }

  /** Conjunction of per-column isin masks (reference `util.filtered`,
    * util/__init__.py:467-479); values absent from the data are silently
    * ignored, non-strings coerced. Dims absent from the frame are
    * ignored (the reference intersects with df.columns). */
  def filtered(df: DataFrame, filters: Map[String, Seq[Any]]): DataFrame =
    filters.filter { case (dim, _) => df.columns.contains(dim) }
      .foldLeft(df) { case (d, (dim, vals)) =>
        d.filter(col(dim).isin(asStrList(vals): _*))
      }

  /** Year columns of a wide frame = names castable to int
    * (reference `year_list`, util/__init__.py:455-464). */
  def yearColumns(df: DataFrame): Seq[String] =
    df.columns.filter(_.toIntOption.isDefined).toSeq

  /** IAMC layout normalization (reference `to_iamc_layout`,
    * util/__init__.py:411-452): lower-case column names, node→region
    * rename, inject subannual="Year" default; region/variable/unit
    * required. */
  def toIamcLayout(df: DataFrame): DataFrame = {
    // Locale.ROOT (review r12): the default-locale toLowerCase turns
    // "REGION" into "regıon" on a Turkish-locale JVM — the require
    // below then rejects a perfectly valid IAMC frame
    var out = df.toDF(df.columns.map(
      _.toLowerCase(java.util.Locale.ROOT)).toIndexedSeq: _*)
    if (out.columns.contains("node") && !out.columns.contains("region"))
      out = out.withColumnRenamed("node", "region")
    val missing = Seq("region", "variable", "unit").filterNot(out.columns.contains)
    require(missing.isEmpty, s"missing required columns ${missing.mkString(", ")}")
    if (!out.columns.contains("subannual"))
      out = out.withColumn("subannual", lit("Year"))
    out
  }

  /** Wide (year columns) → long (year, value) melt. Non-year columns are
    * carried as id columns. */
  def wideToLong(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val years = yearColumns(df)
    if (years.isEmpty) df
    else {
      val ids = df.columns.filterNot(years.contains)
      val stackExpr = years.map(y => s"'$y', `$y`").mkString(", ")
      df.select(ids.map(col).toSeq :+
        expr(s"stack(${years.size}, $stackExpr) as (year, `$valueCol`)"): _*)
        .withColumn("year", col("year").cast("int"))
        .filter(col(valueCol).isNotNull)
    }
  }

  /** Long → wide pivot on year (IAMC output layout). */
  def longToWide(df: DataFrame, idCols: Seq[String], valueCol: String = "value"): DataFrame =
    df.groupBy(idCols.map(col): _*).pivot("year").agg(first(col(valueCol)))

  /** Scenario data diff (reference `util.diff`, util/__init__.py:136-204):
    * full outer join of two item frames on the dimension columns, with
    * `_a`/`_b` suffixed value columns and a merge-provenance column. */
  def diff(a: DataFrame, b: DataFrame, on: Seq[String]): DataFrame = {
    val valueCols = a.columns.filterNot(on.contains)
    // provenance from explicit presence markers, NOT null-ness of the
    // first value column (review r9: a legitimately-null value column
    // misclassified the row, and key-only frames crashed on a
    // nonexistent probe column) — pandas merge(indicator=True) tracks
    // key presence, so must we
    val valueColsB = b.columns.filterNot(on.contains)
    val ra = valueCols.foldLeft(a) { (d, c) => d.withColumnRenamed(c, s"${c}_a") }
      .withColumn("__in_a", lit(1)).alias("__dl")
    val rb = valueColsB
      .foldLeft(b) { (d, c) => d.withColumnRenamed(c, s"${c}_b") }
      .withColumn("__in_b", lit(1)).alias("__dr")
    // null-SAFE key equality (review r12, the updatePar r11 rule):
    // pandas merge — the stated reference — matches NaN keys, so a
    // null-dim row present on both sides is ONE 'both' row with its
    // values paired; a plain using-columns join's EqualTo never
    // matches null, which split it into a phantom left_only +
    // right_only pair and lost the value comparison.
    val cond = on.map(k => col(s"__dl.$k") <=> col(s"__dr.$k")).reduce(_ && _)
    ra.join(rb, cond, "full_outer")
      .select(on.map(k => coalesce(col(s"__dl.$k"), col(s"__dr.$k")).as(k)) ++
        valueCols.map(c => col(s"${c}_a")) ++
        valueColsB.map(c => col(s"${c}_b")) ++
        Seq(when(col("__in_a").isNull, "right_only")
          .when(col("__in_b").isNull, "left_only")
          .otherwise("both").as("merge_ind")): _*)
      .orderBy(on.map(col): _*)
  }

  /** update_par semantics (reference util/__init__.py:677-690: concat
    * then drop_duplicates(keep=False)): keep only rows of `newData`
    * whose key is not already in `existing` AND occurs exactly once
    * within `newData` — review r9: the plain anti-join passed
    * within-newData duplicate keys through, storing duplicate rows
    * where the reference's keep=False drops both copies. */
  def updatePar(existing: DataFrame, newData: DataFrame, keys: Seq[String]): DataFrame = {
    // null-SAFE anti join (review r11): dropAllDuplicates' window
    // groups null keys together (pandas NaN==NaN semantics), but a
    // plain anti-join's EqualTo never matches null to null — a
    // null-key row already present in `existing` passed as "new".
    // <=> keeps both halves of the function on pandas semantics.
    val l = dropAllDuplicates(newData, keys).alias("__upd_l")
    val r = existing.select(keys.map(col): _*).distinct().alias("__upd_r")
    val cond = keys.map(k => col(s"__upd_l.$k") <=> col(s"__upd_r.$k"))
      .reduce(_ && _)
    l.join(r, cond, "left_anti")
  }

  /** drop_duplicates(keep=False) symmetric-difference semantics
    * (reference util/__init__.py:687): keep rows whose key occurs
    * exactly once across the frame. */
  def dropAllDuplicates(df: DataFrame, keys: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*)
    df.withColumn("__cnt", count(lit(1)).over(w))
      .filter(col("__cnt") === 1).drop("__cnt")
  }

  /** Invalid-path-char scrub (reference model/base.py:41-44). */
  def cleanPath(s: String): String = s.replaceAll("""[<>:"/\\|?*]""", "_")
}

/** Minimal pint-like unit expression algebra (reference operator.py:61,
  * 116-139 uses pint; we need parse / multiply / divide / format of
  * simple `a*b/c**2`-style unit strings — SURVEY §7.4). */
final case class Units(exponents: Map[String, Int]) {
  def *(other: Units): Units = Units.combine(exponents, other.exponents, 1)
  def /(other: Units): Units = Units.combine(exponents, other.exponents, -1)
  /** Integer power (genno pow unit algebra): exponents scale by n;
    * n = 0 is dimensionless. */
  def pow(n: Int): Units =
    if (n == 0) Units.dimensionless
    else Units(exponents.map { case (k, e) => k -> e * n })
  def isDimensionless: Boolean = exponents.isEmpty

  /** pint "{:~}" short-format style: `USD / km`, `km ** 2`, `` for 1. */
  def format: String = {
    val (pos, neg) = exponents.toSeq.sortBy(_._1).partition(_._2 > 0)
    def term(t: (String, Int)): String =
      if (math.abs(t._2) == 1) t._1 else s"${t._1} ** ${math.abs(t._2)}"
    (pos.map(term), neg.map(term)) match {
      case (Nil, Nil) => ""
      case (p, Nil) => p.mkString(" * ")
      case (Nil, n) => "1 / " + n.mkString(" / ")
      case (p, n) => p.mkString(" * ") + " / " + n.mkString(" / ")
    }
  }
}

object Units {
  val dimensionless: Units = Units(Map.empty)

  /** Parse `USD/km`, `km**2`, `a * b / c` (and the reference's literal
    * unit strings like `cases`). Unknown tokens are treated as base
    * units, like pint's define-on-use. "???"/""/"unitless"/"1" map to
    * dimensionless; "%" is a SCALED dimensionless unit (pint: percent
    * = 0.01 dimensionless), so conversionFactor("%", "") = 0.01
    * (review r9: it used to be an opaque base unit, making
    * %-united quantities unconvertible where pint converts them). */
  def parse(s: String): Units = {
    val cleaned = s.trim
    if (cleaned.isEmpty || cleaned == "???" || cleaned == "unitless" || cleaned == "1")
      return dimensionless
    // Collapse exponent syntax (`km ** 2`, `km^2`) into a single token
    // before splitting on operators — a bare split would shred `km**2`
    // into ['km','*','*','2']. Parens are real tokens (review r11: the
    // flat loop turned "USD/(kW*a)" into garbage names "(kW" / "a)"
    // with the WRONG sign on a).
    val normalized = cleaned.replaceAll("\\s*(\\*\\*|\\^)\\s*", "^")
    val toks = normalized.split("(?=[*/()])|(?<=[*/()])").map(_.trim)
      .filter(_.nonEmpty).toList
    val (exps, rest) = parseSeq(toks, s)
    if (rest.nonEmpty)
      throw new IllegalArgumentException(s"cannot parse unit '$s' (unbalanced ')')")
    Units(exps.filter(_._2 != 0))
  }

  /** Factor sequence under '*' '/' with paren groups; division binds
    * to the single next FACTOR (token or whole paren group) —
    * pint-style, so "USD/(kW*a)" puts both kW and a in the
    * denominator. Whitespace inside a token is implicit
    * multiplication ("Mt CO2" = Mt·CO2, what pint does — review r11:
    * the opaque-token reading made "Mt CO2/yr" unconvertible to
    * "kt CO2/yr" where the reference converts by 1000); the pending
    * division sign binds to the first sub-factor only. A bare numeric
    * token other than "1" raises — magnitudes are not units. */
  private def parseSeq(toks0: List[String], s: String)
      : (Map[String, Int], List[String]) = {
    var exps = Map.empty[String, Int].withDefaultValue(0)
    var sign = 1
    var toks = toks0
    while (toks.nonEmpty && toks.head != ")") {
      toks.head match {
        case "/" => sign = -1; toks = toks.tail
        case "*" => toks = toks.tail
        case "(" =>
          val (inner, rest) = parseSeq(toks.tail, s)
          if (rest.isEmpty || rest.head != ")")
            throw new IllegalArgumentException(
              s"cannot parse unit '$s' (unbalanced '(')")
          toks = rest.tail
          // group exponent — "(kW*a)**2" (review r12): the normalizer
          // leaves "^2" as the token after ')'; it previously fell
          // through to the factor case, parsed as a phantom ''-named
          // token, and the squaring was silently DROPPED (canonical()
          // skips empty base tokens), so wrong-dimensionality
          // conversions succeeded
          val gexp = toks.headOption.filter(_.startsWith("^")) match {
            case Some(t) =>
              toks = toks.tail
              t.drop(1).trim.toIntOption.getOrElse(
                throw new IllegalArgumentException(
                  s"cannot parse unit '$s' (group exponent '$t')"))
            case None => 1
          }
          inner.foreach { case (k, e) =>
            exps = exps.updated(k, exps(k) + sign * e * gexp)
          }
          sign = 1
        case "1" =>
          // dimensionless factor (our own format emits "1 / x"); it
          // ABSORBS a pending division (review r11: "x / 1 * y" left
          // sign = -1 standing and inverted y)
          sign = 1; toks = toks.tail
        case t =>
          toks = toks.tail
          var sg = sign
          for (sub <- t.split("\\s+")) {
            val (name, exp) = sub.split("\\^").map(_.trim) match {
              case Array(n) => (n, 1)
              case Array(n, e) => (n, e.toInt)
              case _ =>
                throw new IllegalArgumentException(s"cannot parse unit '$s'")
            }
            if (name.isEmpty)
              throw new IllegalArgumentException(
                s"cannot parse unit '$s' (dangling exponent '$sub')")
            if (name.matches("[0-9.]+"))
              throw new IllegalArgumentException(
                s"cannot parse unit '$s' (numeric magnitude '$name')")
            exps = exps.updated(name, exps(name) + sg * exp)
            sg = 1 // implicit multiplication after the first sub-factor
          }
          sign = 1 // division binds to one factor (pint-style)
      }
    }
    (exps, toks)
  }

  private[util] def combine(a: Map[String, Int], b: Map[String, Int], mult: Int): Units =
    Units((a.keySet ++ b.keySet).map { k =>
      k -> (a.getOrElse(k, 0) + mult * b.getOrElse(k, 0))
    }.filter(_._2 != 0).toMap)

  /** Linear magnitude table for the common prefixed units the
    * reference's pint registry resolves (token → (base token,
    * factor-to-base)). Unknown tokens are their own base with factor 1
    * — pint's define-on-use, so purely symbolic units ("cases") stay
    * convertible only to themselves. */
  private val baseFactors: Map[String, (String, Double)] = Map(
    // scaled dimensionless (empty base token = no dimension)
    "%" -> ("", 0.01),
    // length
    "m" -> ("m", 1.0), "km" -> ("m", 1e3), "cm" -> ("m", 1e-2),
    "mm" -> ("m", 1e-3),
    // mass (pint base is kg; g keeps the arithmetic integral)
    "g" -> ("g", 1.0), "kg" -> ("g", 1e3), "t" -> ("g", 1e6),
    "kt" -> ("g", 1e9), "Mt" -> ("g", 1e12), "Gt" -> ("g", 1e15),
    // time
    "s" -> ("s", 1.0), "min" -> ("s", 60.0), "h" -> ("s", 3600.0),
    "hr" -> ("s", 3600.0), "day" -> ("s", 86400.0),
    "a" -> ("s", 31557600.0), "year" -> ("s", 31557600.0), // Julian year, as pint
    // energy / power
    "J" -> ("J", 1.0), "kJ" -> ("J", 1e3), "MJ" -> ("J", 1e6),
    "GJ" -> ("J", 1e9), "EJ" -> ("J", 1e18),
    "Wa" -> ("J", 31557600.0), "GWa" -> ("J", 31557600.0 * 1e9),
    "W" -> ("W", 1.0), "kW" -> ("W", 1e3), "MW" -> ("W", 1e6),
    "GW" -> ("W", 1e9), "TW" -> ("W", 1e12))

  /** Canonical form: exponents over BASE tokens plus the scalar factor
    * that maps a magnitude in `u` to a magnitude in the canonical
    * base. (km/h → ({m:1, s:-1}, 1000/3600).) */
  def canonical(u: Units): (Map[String, Int], Double) = {
    var factor = 1.0
    var exps = Map.empty[String, Int].withDefaultValue(0)
    for ((tok, e) <- u.exponents) {
      val (base, f) = baseFactors.getOrElse(tok, (tok, 1.0))
      factor *= math.pow(f, e.toDouble)
      // an empty base token ("%") carries only its factor — no dimension
      if (base.nonEmpty) exps = exps.updated(base, exps(base) + e)
    }
    (exps.filter(_._2 != 0).toMap, factor)
  }

  /** Multiplier converting magnitudes expressed in `from` to `to`;
    * None when the dimensionalities differ (pint
    * DimensionalityError). */
  def conversionFactor(from: Units, to: Units): Option[Double] = {
    val (db, fb) = canonical(from)
    val (tb, tf) = canonical(to)
    if (db == tb) Some(fb / tf) else None
  }
}
