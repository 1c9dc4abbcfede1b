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

    // report with a 4th arg writes the IAMC CSV (convert_pyam path):
    // d:i has no region/year-named dims, so everything sums to one
    // World row under the IAMC_IDX header
    val iamcOut = tmpDir("graft-cli-iamc")
    Cli.run(mp, Array("report", "canning problem/standard", "d:i", iamcOut))
    val lines = spark.read.textFile(iamcOut).collect().toSeq
    assert(lines.contains("model,scenario,region,variable,unit,value,subannual"))
    val world = lines.filter(_.startsWith("canning problem,standard,World,d,km,"))
    assert(world.size == 1)
    assert(math.abs(world.head.split(",")(5).toDouble - 11.7) < 1e-9)

    intercept[IllegalArgumentException](Cli.run(mp, Array("bogus")))
  }

  test("platform registry: add/list/remove + named ixmp:// URL resolution") {
    import graft.core.PlatformRegistry
    val cfg = java.nio.file.Paths.get(tmpDir("graft-reg"), "platforms.properties")
    val reg = new PlatformRegistry(cfg)

    // CLI group (cli.py:332-360): add two platforms, first is default
    val rootA = tmpDir("graft-regA")
    val rootB = tmpDir("graft-regB")
    Cli.platformCmd(Array("add", "alpha", rootA), reg)
    Cli.platformCmd(Array("add", "beta", rootB), reg)
    Cli.platformCmd(Array("list"), reg)
    assert(reg.list() == Seq("alpha" -> rootA, "beta" -> rootB))
    assert(reg.defaultName.contains("alpha"))
    reg.setDefault("beta")
    assert(reg.resolve("default") == rootB)
    assert(reg.resolve("alpha") == rootA)

    // a scenario stored on beta opens through its NAMED URL
    val mpB = new Platform(spark, rootB)
    val s = mpB.newScenario("m", "s")
    s.setAsDefault()
    val (mp2, opened) = graft.core.Platform.fromUrl(spark, "ixmp://beta/m/s", reg)
    assert(mp2.root == rootB && opened.runId == s.runId)
    // the default platform resolves when the URL names none
    val (mp3, _) = graft.core.Platform.fromUrl(spark, "ixmp://default/m/s", reg)
    assert(mp3.root == rootB)

    Cli.platformCmd(Array("remove", "alpha"), reg)
    assert(reg.list().map(_._1) == Seq("beta"))
    intercept[IllegalArgumentException](reg.resolve("alpha"))
    intercept[IllegalArgumentException](Cli.platformCmd(Array("bogus"), reg))
  }
}
