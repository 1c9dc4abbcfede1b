package graft

import org.apache.spark.sql.functions._

import graft.core.Platform
import graft.store.ItemType

/** Mirrors the reference's add_par benchmark shape
  * (tests/test_perf.py:27-35: 2-D random par at 1e2..1e6 rows) at 1e5
  * rows — asserting the batched write path handles bulk item data in
  * one whole-DataFrame job (the reference's per-element JNI loop is
  * its known hot spot, jdbc.py:1295-1310). */
class PerfSpec extends SparkSpec {
  import spark.implicits._

  test("bulk add_par at 1e5 rows: one set-based write, filtered read back") {
    val mp = new Platform(spark, tmpDir("graft-perf"))
    mp.addUnit("kg")
    val s = mp.newScenario("perf", "bulk")
    val n = 100000
    val nI = 500
    s.checkOut()
    s.initSet("i"); s.initSet("j")
    s.addSetDf("i", (0 until nI).map(i => s"i$i").toDF("i"))
    s.addSetDf("j", (0 until n / nI).map(j => s"j$j").toDF("j"))
    s.initPar("big", Seq("i", "j"))
    val data = spark.range(n).select(
      concat(lit("i"), (col("id") % nI)).as("i"),
      concat(lit("j"), (col("id") / nI).cast("long")).as("j"),
      (col("id") * 1.5).as("value"), lit("kg").as("unit"))
    val t0 = System.nanoTime()
    s.addPar("big", data)
    s.commit("bulk")
    val writeSec = (System.nanoTime() - t0) / 1e9
    assert(s.par("big").count() == n)
    assert(s.par("big", Map("i" -> Seq("i7"))).count() == n / nI)
    // batched write must not degrade to per-row behavior: generous
    // ceiling that a row-loop (reference's minutes at 1e6) cannot meet
    assert(writeSec < 60.0, s"bulk write took ${writeSec}s")
  }
}
