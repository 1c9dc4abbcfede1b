package graft

import org.apache.spark.sql.functions._

import graft.core.Platform
import graft.io.ScenarioIO
import graft.model.DantzigModel
import graft.ops.Multimodal

class IOSpec extends SparkSpec {
  import spark.implicits._

  test("scenario CSV round-trip with initItems inference (io.py contract)") {
    val mp = new Platform(spark, tmpDir("graft-io"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    s.solve(DantzigModel)
    val dir = tmpDir("graft-io-dump")
    ScenarioIO.writeScenario(s, dir, includeSolution = true)

    // read into an EMPTY scenario with item inference
    val mp2 = new Platform(spark, tmpDir("graft-io2"))
    mp2.addUnit("cases"); mp2.addUnit("km"); mp2.addUnit("USD/km")
    val t = mp2.newScenario("m2", "s2")
    t.checkOut()
    ScenarioIO.readScenario(t, dir, initItems = true)
    t.commit("imported")
    assert(t.setList() == Seq("i", "j"))
    assert(t.parList() == Seq("a", "b", "d", "f"))
    assert(t.par("d").count() == 6)
    assert(t.scalar("f") == ((90.0, "USD/km")))
    // var/equ data are NOT read back (doc/file-io.rst:48-51)
    assert(!t.hasItem("x") || t.variable("x").isEmpty)
    // values survived the text round-trip
    val v = t.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head()
    assert(v == 1.7)
  }

  test("declared-but-empty set round-trips (io.py:85-101 empty sets ARE written)") {
    val mp = new Platform(spark, tmpDir("graft-io-empty"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    s.initSet("i")
    s.addSet("i", Seq("seattle"))
    s.initSet("empty_simple")                       // declared, never filled
    s.initSet("empty_indexed", Seq("i"), Seq("i"))  // indexed, never filled
    s.commit("data")
    val dir = tmpDir("graft-io-empty-dump")
    ScenarioIO.writeScenario(s, dir)

    val t = mp.newScenario("m-e", "s-e")
    t.checkOut()
    ScenarioIO.readScenario(t, dir, initItems = true)
    t.commit("imported")
    assert(t.setList().contains("empty_simple"))
    assert(t.set("empty_simple").isEmpty)
    assert(t.setList().contains("empty_indexed"))
    assert(t.set("empty_indexed").isEmpty)
    assert(t.set("i").count() == 1)
  }

  test("readScenario without initItems fails on unknown items") {
    val mp = new Platform(spark, tmpDir("graft-io3"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    val dir = tmpDir("graft-io-dump2")
    ScenarioIO.writeScenario(s, dir)
    val t = mp.newScenario("m3", "s3")
    t.checkOut()
    val err = intercept[IllegalArgumentException](
      ScenarioIO.readScenario(t, dir, initItems = false))
    assert(err.getMessage.contains("initItems=false"))
    t.discard()
  }

  test("timeseries CSV round-trip with year bounds") {
    val mp = new Platform(spark, tmpDir("graft-io4"))
    val s = mp.newScenario("m", "s")
    s.transact("ts") {
      s.addTimeseries(Seq(
        ("World", "GDP", "USD", 2000, 1.0), ("World", "GDP", "USD", 2010, 2.0))
        .toDF("region", "variable", "unit", "year", "value"))
    }
    val path = tmpDir("graft-ts-csv")
    ScenarioIO.writeTimeseriesCsv(s, path)
    val t = mp.newScenario("m", "s2")
    t.checkOut()
    ScenarioIO.readTimeseriesCsv(t, path, firstYear = Some(2005))
    t.commit("ts in")
    assert(t.timeseries().select("year").as[Int].collect().toSeq == Seq(2010))
  }

  test("multimodal: byte stats, mime sniff, chunk sampling, stub decode") {
    val df = Seq(
      (1L, Array[Byte](0xFF.toByte, 0xD8.toByte, 0x00, 0x01) ++ Array.fill[Byte](600)(7)),
      (2L, "plain text payload".getBytes("UTF-8"))
    ).toDF("id", "content")
    val withMeta = Multimodal.withAssetMeta(df, col("content"),
      Multimodal.sniffMime(col("content")))
    val metas = withMeta.select("id", "asset_meta.mime", "asset_meta.n_bytes")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2)))).toMap
    assert(metas(1L) == (("image/jpeg", 604)))
    assert(metas(2L)._1 == "application/octet-stream")

    val stats = df.select(col("id"), Multimodal.byteStats(col("content")).as("bs"))
      .select("id", "bs.n_bytes", "bs.byte_diversity", "bs.magic")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getDouble(2), r.getString(3)))).toMap
    assert(stats(1L)._1 == 604)
    assert(stats(1L)._2 > 0 && stats(1L)._2 <= 1.0)
    assert(stats(1L)._3.startsWith("FFD8"))

    // chunk sampling: 604 bytes / 256 → 3 chunks, stride 2 keeps idx 0, 2
    val chunks = Multimodal.sampleChunksDf(df.filter(col("id") === 1),
      "content", 256, 2)
    assert(chunks.select("chunk_idx").as[Int].collect().sorted.toSeq == Seq(0, 2))
    // deterministic stub decode: fixed dims, reproducible values
    val f1 = df.select(Multimodal.decodeFeaturesStub(col("content"), 8).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(f1.forall(_.length == 8))
    val f2 = df.select(Multimodal.decodeFeaturesStub(col("content"), 8).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(f1.toSeq == f2.toSeq)
    // resize stub truncates while keeping a valid payload
    assert(df.select(length(Multimodal.resizeStub(col("content"), 100)))
      .as[Int].collect().forall(_ <= 100))
  }
}
