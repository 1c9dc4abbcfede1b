package graft

import org.apache.spark.sql.SparkSession

import graft.core.Platform
import graft.model.Models
import graft.report.Reporter

/** Command-line entry mirroring the reference CLI's surface
  * (reference: ixmp/cli.py:57-259 — `list`, `import`, `solve`,
  * `export`, `report`).
  *
  * Usage:
  * {{{
  *   graft.Cli <storeRoot> scenarios [matchRegex]   (alias: list)
  *   graft.Cli <storeRoot> solve  <model>/<scenario> [modelName]
  *   graft.Cli <storeRoot> export <model>/<scenario> <outDir>
  *   graft.Cli <storeRoot> import <model>/<scenario> <csvPath>
  *   graft.Cli <storeRoot> report <model>/<scenario> <key>
  * }}}
  */
object Cli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Cli <storeRoot> <scenarios|solve|export|report> …")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try run(new Platform(spark, args(0)), args.drop(1))
    finally spark.stop()
  }

  private[graft] def run(mp: Platform, args: Array[String]): Unit = args(0) match {
    case "scenarios" | "list" =>
      // `list --match` of the reference CLI (cli.py `list`, util
      // format_scenario_list's match regex)
      mp.describeScenarios(args.lift(1)).show(100, truncate = false)

    case "import" =>
      // reference `import` command: TS data file into a scenario
      val s = scenario(mp, args(1))
      s.transact("imported timeseries via CLI") {
        graft.io.ScenarioIO.readTimeseriesCsv(s, args(2))
      }
      println(s"imported ${args(2)} into ${args(1)}")

    case "solve" =>
      val s = scenario(mp, args(1))
      val model = Models(if (args.length > 2) args(2) else "dantzig")
      s.solve(model)
      println(s"solved ${args(1)} with ${model.name}")

    case "export" =>
      val s = scenario(mp, args(1))
      graft.io.ScenarioIO.writeTimeseriesCsv(s, args(2))
      println(s"exported timeseries of ${args(1)} to ${args(2)}")

    case "report" =>
      val s = scenario(mp, args(1))
      val q = Reporter.fromScenario(s).get(args(2))
      println(s"${args(2)}  [unit: ${q.unit}]")
      // deterministic ordered print, like the CLI golden-output test
      // (tests/report/test_reporter.py:193-204)
      val out = if (q.dims.nonEmpty) q.df.orderBy(q.dims.head, q.dims.tail: _*) else q.df
      out.show(100, truncate = false)

    case other =>
      throw new IllegalArgumentException(s"unknown command '$other'")
  }

  private def scenario(mp: Platform, url: String) = mp.fromUrl(url)
}
