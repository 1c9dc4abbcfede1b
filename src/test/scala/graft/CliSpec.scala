package graft

import org.apache.spark.sql.functions._

import graft.core.Platform
import graft.model.DantzigModel

/** Drives every CLI command end-to-end against a scratch store
  * (reference cli.py:57-259 command surface). */
class CliSpec extends SparkSpec {
  import spark.implicits._

  test("scenarios/list, solve, export, import, report commands") {
    val mp = new Platform(spark, tmpDir("graft-cli"))
    val s = mp.newScenario("canning problem", "standard")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    s.setAsDefault()

    Cli.run(mp, Array("scenarios"))
    Cli.run(mp, Array("list", "canning"))

    Cli.run(mp, Array("solve", "canning problem/standard"))
    assert(s.hasSolution)

    // export writes the TS csv; import reads it into a fresh scenario
    val t = mp.newScenario("canning problem", "imported")
    t.transact("seed ts") {
      t.addTimeseries(Seq(("World", "GDP", "USD", 2020, 1.5))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    t.setAsDefault()
    val out = tmpDir("graft-cli-export")
    Cli.run(mp, Array("export", "canning problem/imported", out))
    val u = mp.newScenario("canning problem", "reimported")
    u.setAsDefault()
    Cli.run(mp, Array("import", "canning problem/reimported", out))
    assert(u.timeseries().select("value").as[Double].collect().toSeq == Seq(1.5))

    Cli.run(mp, Array("report", "canning problem/standard", "d:i"))

    intercept[IllegalArgumentException](Cli.run(mp, Array("bogus")))
  }
}
