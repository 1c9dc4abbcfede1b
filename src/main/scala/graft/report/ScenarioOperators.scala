package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.{Platform, Scenario, TimeSeries}

/** The remaining ixmp-contributed reporting operators (reference:
  * ixmp/report/operator.py:27-368, listed doc/reporting.rst:149-159 —
  * data_for_quantity and map_as_qty live in [[Reporter]]/
  * [[graft.core.Scenario]]; these are the scenario-interaction ones). */
object ScenarioOperators {

  /** from_url (operator.py): resolve a scenario URL against a platform. */
  def fromUrl(platform: Platform, url: String): Scenario = platform.fromUrl(url)

  /** get_ts (operator.py): filtered TS read from a scenario. */
  def getTs(ts: TimeSeries, region: Seq[String] = Nil, variable: Seq[String] = Nil,
      unit: Seq[String] = Nil, year: Seq[Int] = Nil, iamc: Boolean = false): DataFrame =
    ts.timeseries(region, variable, unit, year, iamc)

  /** store_ts (operator.py:281-320): write computed quantities back as
    * scenario time series inside one transaction. */
  def storeTs(ts: TimeSeries, data: DataFrame, comment: String = "store_ts"): Unit =
    ts.transact(comment) { ts.addTimeseries(data) }

  /** remove_ts (operator.py:246-278): remove TS rows — all years of the
    * given keys, or only years from `after` onward (INCLUSIVE — the
    * reference's `>=` boundary) when given. */
  def removeTs(ts: TimeSeries, keys: DataFrame, after: Option[Int] = None,
      comment: String = "remove_ts"): Unit =
    ts.transact(comment) {
      // normalize ONCE so both branches accept the same layouts
      // (review r9: the after-branch required exact lowercase columns
      // while the no-after branch tolerated IAMC-style headers), and
      // resolve region synonyms like every TS write/delete path
      // (review r12: the after-branch semi-joined RAW user regions
      // against canonical stored ones — a synonym-keyed removal
      // silently deleted nothing while the no-after branch, routing
      // through removeTimeseries, resolved and deleted)
      val k = ts.resolveRegions(graft.util.Util.toIamcLayout(keys))
      after match {
        case None => ts.removeTimeseries(k)
        case Some(y0) =>
          val existing = ts.timeseries()
          // carry subannual when the frame has it (review r9: dropping
          // it re-injected 'Year' in the downstream anti-join and
          // silently spared every non-'Year' subannual row)
          val victimCols =
            if (existing.columns.contains("subannual"))
              Seq("region", "variable", "unit", "subannual", "year")
            else Seq("region", "variable", "unit", "year")
          val victim = existing
            .join(k.select("region", "variable", "unit").distinct(),
              Seq("region", "variable", "unit"), "left_semi")
            .filter(col("year") >= y0)
            .select(victimCols.map(col): _*)
          ts.removeTimeseries(victim)
      }
    }

  /** update_scenario (operator.py:323-368): add/update parameter data
    * on a target scenario from a computed frame, one transaction. */
  def updateScenario(s: Scenario, parName: String, data: DataFrame,
      comment: String = "update_scenario"): Unit =
    s.transact(comment) { s.addPar(parName, data) }
}
