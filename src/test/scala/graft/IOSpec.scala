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

  test("scenario .xlsx round-trip: real workbook, inference, empty sets, scalars") {
    val mp = new Platform(spark, tmpDir("graft-xlsx"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.initSet("empty_simple") // empty sets ARE written (io.py:85-101)
    s.commit("data")
    s.solve(DantzigModel)
    val path = tmpDir("graft-xlsx-dump") + "/scen.xlsx"
    ScenarioIO.writeScenarioXlsx(s, path, includeSolution = true)

    // the workbook is structurally sound: mapping sheet + per-item sheets
    val sheets = graft.io.Xlsx.read(path)
    val names = sheets.map(_._1)
    assert(names.head == "ix_type_mapping")
    assert(names.contains("i") && names.contains("d") && names.contains("f"))
    assert(names.contains("empty_simple") && names.contains("x")) // solution on request
    // empty set sheet = header only; scalar = 1-row value/unit frame
    assert(sheets.toMap.apply("empty_simple") == Seq(Seq("empty_simple")))
    assert(sheets.toMap.apply("f").head == Seq("value", "unit"))

    val mp2 = new Platform(spark, tmpDir("graft-xlsx2"))
    mp2.addUnit("cases"); mp2.addUnit("km"); mp2.addUnit("USD/km")
    val t = mp2.newScenario("m2", "s2")
    t.checkOut()
    ScenarioIO.readScenarioXlsx(t, path, initItems = true)
    t.commit("imported")
    assert(t.setList() == Seq("empty_simple", "i", "j"))
    assert(t.set("empty_simple").isEmpty)
    assert(t.parList() == Seq("a", "b", "d", "f"))
    assert(t.scalar("f") == ((90.0, "USD/km")))
    // var/equ sheets exist but are NOT read back (doc/file-io.rst:48-51)
    assert(!t.hasItem("x"))
    val v = t.par("d", Map("i" -> Seq("seattle"), "j" -> Seq("chicago")))
      .select("value").as[Double].head()
    assert(v == 1.7)
  }

  test("xlsx sheet split at the row cap into name(2)… and reassembly (io.py:22,126-139)") {
    val mp = new Platform(spark, tmpDir("graft-xlsx-split"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    s.initSet("i")
    val elements = (1 to 25).map(n => f"e$n%02d")
    s.addSet("i", elements)
    s.commit("data")
    val path = tmpDir("graft-xlsx-split-dump") + "/scen.xlsx"
    // cap chosen so 25 rows split across 3 sheets (9 data rows each)
    ScenarioIO.writeScenarioXlsx(s, path, maxRowsPerSheet = 10)
    val names = graft.io.Xlsx.read(path).map(_._1)
    assert(names.count(n => n == "i" || n.matches("i\\(\\d+\\)")) == 3)
    assert(names.contains("i") && names.contains("i(2)") && names.contains("i(3)"))

    val t = mp.newScenario("m2", "s2")
    t.checkOut()
    ScenarioIO.readScenarioXlsx(t, path, initItems = true)
    t.commit("imported")
    assert(t.set("i").as[String].collect().sorted.toSeq == elements)
  }

  test("toExcel/readExcel facade: write filters + add_units (scenario.py:1078-1153)") {
    val mp = new Platform(spark, tmpDir("graft-xlsx-fac"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    DantzigModel.initialize(s)
    s.commit("data")
    // a NON-default unit, so the addUnits=false read below still has
    // something missing to trip on (km/cases became implicit platform
    // defaults in r9, matching the reference's seeded unit list)
    mp.addUnit("USD")
    s.transact("usd scalar") {
      s.initPar("fee", Seq.empty)
      s.changeScalar("fee", 2.5, "USD")
    }
    val path = tmpDir("graft-xlsx-fac-dump") + "/scen.xlsx"
    // write filters apply to parameters only, and only the dims an
    // item actually has (io.py:96-103)
    s.toExcel(path, filters = Map("i" -> Seq("seattle"), "nosuchdim" -> Seq("x")))
    val byName = graft.io.Xlsx.read(path).toMap
    assert(byName("d").size == 4) // header + the 3 seattle rows
    assert(byName("i").size == 3) // sets NOT filtered
    assert(byName("b").size == 4) // 'b' has no dim 'i' -> unfiltered

    // read into a platform MISSING the units: addUnits=false fails,
    // addUnits=true registers them on the fly (io.py:328-340)
    val mp2 = new Platform(spark, tmpDir("graft-xlsx-fac2"))
    val t = mp2.newScenario("m2", "s2")
    t.checkOut()
    intercept[IllegalArgumentException](t.readExcel(path, initItems = true))
    t.discard()
    val u = mp2.newScenario("m3", "s3")
    u.checkOut()
    u.readExcel(path, initItems = true, addUnits = true)
    u.commit("imported")
    assert(mp2.units().contains("USD"), "addUnits=true registers on the fly")
    assert(mp2.units().contains("km") && mp2.units().contains("cases"))
    assert(u.par("d").count() == 3) // only the filtered rows were written
  }

  test("xlsx reader resolves sharedStrings + typed cells (foreign writers)") {
    // files written by Excel/pandas use a sharedStrings table and t="s"
    // cells — our writer never emits them, so synthesize a minimal one
    val path = tmpDir("graft-xlsx-foreign") + "/f.xlsx"
    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="2" uniqueCount="2">
        |<si><t>region</t></si><si><t>World &amp; co</t></si></sst>""".stripMargin)
    // row 2 skips column A (sparse, explicit refs) + bool + plain number
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1" t="str"><v>meta</v></c></row>
        |<row r="2"><c r="B2" t="b"><v>1</v></c><c r="C2"><v>42.5</v></c></row>
        |<row r="3"><c r="A3" t="s"><v>1</v></c></row>
        |<row r="4"><c r="C4"><v>9</v></c><c r="A4" t="str"><v>7</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()

    val sheets = graft.io.Xlsx.read(path)
    assert(sheets.map(_._1) == Seq("data"))
    val rows = sheets.head._2
    assert(rows(0) == Seq("region", "meta", ""))
    assert(rows(1) == Seq("", "true", "42.5")) // sparse A2 filled, bool mapped
    assert(rows(2) == Seq("World & co", "", "")) // shared string + escape
    // out-of-order cell refs land at their r-attribute columns
    // (review r9: append-after-pad shifted A4's value into column D)
    assert(rows(3) == Seq("7", "", "9"))
  }

  test("xlsx reader drops blank rows and phonetic runs (Excel-authored files)") {
    // Excel represents a blank row as either an omitted <row> or a
    // present styled-but-cell-less <row/>; the second previously became
    // an all-"" data row that item loaders ingest as empty-string keys.
    // And shared strings with phonetic guides (<rPh>) must not leak the
    // annotation into the value.
    val path = tmpDir("graft-xlsx-blank") + "/f.xlsx"
    val zip = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def entry(name: String, body: String): Unit = {
      zip.putNextEntry(new java.util.zip.ZipEntry(name))
      zip.write(body.getBytes("UTF-8")); zip.closeEntry()
    }
    entry("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
        |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
        |<Default Extension="xml" ContentType="application/xml"/>
        |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
        |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
        |<Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/>
        |</Types>""".stripMargin)
    entry("_rels/.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
        |</Relationships>""".stripMargin)
    entry("xl/workbook.xml",
      """<?xml version="1.0"?><workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="data" sheetId="1" r:id="rId1"/></sheets></workbook>""".stripMargin)
    entry("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?><Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    // si #0 carries a phonetic run: the value is the base text only
    entry("xl/sharedStrings.xml",
      """<?xml version="1.0"?><sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="1" uniqueCount="1">
        |<si><t>Tokyo</t><rPh sb="0" eb="2"><t>トウキョウ</t></rPh><phoneticPr fontId="1"/></si></sst>""".stripMargin)
    // row 2: present but cell-less; row 3: styled empty cells only;
    // row 4 omitted entirely; row 5: real data
    entry("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?><worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="A1" t="s"><v>0</v></c><c r="B1"><v>1</v></c></row>
        |<row r="2" spans="1:2"/>
        |<row r="3"><c r="A3" s="1"/><c r="B3" s="1"/></row>
        |<row r="5"><c r="A5" t="str"><v>end</v></c><c r="B5"><v>2</v></c></row>
        |</sheetData></worksheet>""".stripMargin)
    zip.close()

    val rows = graft.io.Xlsx.read(path).head._2
    assert(rows == Seq(Seq("Tokyo", "1"), Seq("end", "2")),
      s"blank rows must be dropped and phonetic text excluded; got $rows")
  }

  test("timeseries .xlsx read (ts_read_file Excel branch, io.py:25-52)") {
    val mp = new Platform(spark, tmpDir("graft-xlsx-ts"))
    mp.addUnit("USD")
    val path = tmpDir("graft-xlsx-ts-dump") + "/ts.xlsx"
    graft.io.Xlsx.write(path, Seq(("ts", Iterator[Seq[Any]](
      Seq("region", "variable", "unit", "year", "value"),
      Seq("World", "GDP", "USD", 2000, 1.0),
      Seq("World", "GDP", "USD", 2010, 2.0)))))
    val t = mp.newScenario("m", "s")
    t.checkOut()
    ScenarioIO.readTimeseriesXlsx(t, path, firstYear = Some(2005))
    t.commit("ts in")
    assert(t.timeseries().select("year").as[Int].collect().toSeq == Seq(2010))
  }

  test("xlsx year cells written as '2010.0' survive the import cast") {
    // pandas-written workbooks render integer years as float text; a
    // direct string->int cast nulled every row
    val mp = new Platform(spark, tmpDir("graft-xlsx-floatyr"))
    mp.addUnit("USD")
    val path = tmpDir("graft-xlsx-floatyr-dump") + "/ts.xlsx"
    graft.io.Xlsx.write(path, Seq(("ts", Iterator[Seq[Any]](
      Seq("region", "variable", "unit", "year", "value"),
      Seq("World", "GDP", "USD", 2010.0, 2.5)))))
    val t = mp.newScenario("m", "s")
    t.checkOut()
    ScenarioIO.readTimeseriesXlsx(t, path)
    t.commit("ts in")
    assert(t.timeseries().select("year").as[Int].collect().toSeq == Seq(2010))
  }

  test("xlsx writer drops XML-illegal controls and strings NaN/Infinity") {
    val path = tmpDir("graft-xlsx-hostile") + "/w.xlsx"
    graft.io.Xlsx.write(path, Seq(("data", Iterator[Seq[Any]](
      Seq("noisytext", Double.NaN, Double.PositiveInfinity, 1.5)))))
    // the workbook this library writes must be readable by its own
    // reader (an unescaped C0 control made the StAX parse throw)
    val rows = graft.io.Xlsx.read(path).head._2
    assert(rows(0)(0) == "noisytext") // the \u0001 was dropped
    assert(rows(0)(1) == "NaN" && rows(0)(2) == "Infinity")
    assert(rows(0)(3) == "1.5")
  }

  test("fingerprint canonicalizes trailing/leading non-space whitespace") {
    import graft.functions.TextFunctions
    val d = Seq((1L, "foo bar"), (2L, "foo bar\n"), (3L, "\tfoo  bar "))
      .toDF("doc_id", "text")
    val fps = d.select(TextFunctions.fingerprint(col("text")))
      .as[String].collect().toSet
    assert(fps.size == 1, "whitespace-only variants must share a fingerprint")
  }

  test("readScenario without initItems fails on unknown items") {
    val mp = new Platform(spark, tmpDir("graft-io3"))
    mp.addUnit("USD")
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

  test("indexed sets load after in-file index sets regardless of " +
    "alphabetical order (review r9)") {
    // 'cat' sorts before its index set 'tec'; with both pre-declared
    // but EMPTY, readiness used to mean mere declaration — 'cat'
    // validated its elements against a still-empty 'tec' and failed
    // on a perfectly valid export
    val mp = new Platform(spark, tmpDir("graft-io-order"))
    val s = mp.newScenario("m", "s")
    s.checkOut()
    s.initSet("tec")
    s.initSet("cat", Seq("tec"))
    s.addSet("tec", Seq("wind", "solar"))
    s.addSetDf("cat", Seq("wind").toDF("tec"))
    s.commit("base")
    val dir = tmpDir("graft-io-order-dump")
    ScenarioIO.writeScenario(s, dir)
    val t = mp.newScenario("m2", "s2")
    t.checkOut()
    t.initSet("tec")
    t.initSet("cat", Seq("tec"))
    ScenarioIO.readScenario(t, dir, initItems = false)
    t.commit("loaded")
    assert(t.set("cat").as[String].collect().toSeq == Seq("wind"))
    assert(t.set("tec").as[String].collect().sorted.toSeq == Seq("solar", "wind"))
  }

  test("xlsx writer rejects sheet names Excel refuses (review r9)") {
    val path = tmpDir("graft-xlsx-names") + "/bad.xlsx"
    intercept[IllegalArgumentException] {
      graft.io.Xlsx.write(path,
        Seq(("a_name_well_over_excels_31_character_limit",
          Iterator(Seq[Any]("x")))))
    }
    intercept[IllegalArgumentException] {
      graft.io.Xlsx.write(path, Seq(("bad[name]", Iterator(Seq[Any]("x")))))
    }
    intercept[IllegalArgumentException] {
      graft.io.Xlsx.write(path,
        Seq(("dup", Iterator(Seq[Any]("x"))), ("dup", Iterator(Seq[Any]("y")))))
    }
    ()
  }

  test("rowsToDf pads short continuation rows to the header width (review r9)") {
    val df = graft.io.Xlsx.rowsToDf(spark, Seq("a", "b", "c"),
      Seq(Seq("1", "2", "3"), Seq("4", "5"), Seq("6", "7", "8", "")))
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    val rows = df.collect().map(_.toSeq)
    assert(rows(1) == Seq("4", "5", ""), "short row pads with empties")
    assert(rows(2) == Seq("6", "7", "8"),
      "over-wide row with only EMPTY overflow cells trims (writer noise)")
  }

  test("rowsToDf fails loudly on non-empty cells past the header width (review r10)") {
    val ex = intercept[IllegalArgumentException] {
      graft.io.Xlsx.rowsToDf(spark, Seq("a", "b"),
        Seq(Seq("1", "2"), Seq("3", "4", "LOST")))
    }
    assert(ex.getMessage.contains("row 2") && ex.getMessage.contains("LOST"),
      s"error must name the row and the would-be-lost cell: ${ex.getMessage}")
  }

  test("stitchSheets: base sorts strictly before a literal 'base(1)' " +
      "continuation (ADVICE r12)") {
    val hdr = Seq("h")
    // input order puts base(1) FIRST — an input-order tie would
    // misplace its rows before the base sheet's
    val sheets = Seq(
      "s(1)" -> Seq(hdr, Seq("from-part-1")),
      "s" -> Seq(hdr, Seq("from-base")),
      "s(2)" -> Seq(hdr, Seq("from-part-2")),
      "other" -> Seq(hdr, Seq("unrelated")))
    val (header, rows) = graft.io.Xlsx.stitchSheets(sheets, "s")
    assert(header == hdr)
    assert(rows.map(_.head) ==
      Seq("from-base", "from-part-1", "from-part-2"))
  }

  test("timeseries CSV round-trip with year bounds") {
    val mp = new Platform(spark, tmpDir("graft-io4"))
    mp.addUnit("USD")
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

  test("multimodal null payloads: NULL mime and NULL features, never a " +
      "shared fake identity (review r13)") {
    val df = Seq((1L, Some("real bytes".getBytes("UTF-8"))),
      (2L, None: Option[Array[Byte]]),
      (3L, None: Option[Array[Byte]])).toDF("id", "content")
    // a null asset sniffs NULL, not octet-stream ("unreadable" and
    // "binary data" are different facts)
    val mimes = df.select(col("id"), Multimodal.sniffMime(col("content")))
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(mimes(1L).contains("application/octet-stream"))
    assert(mimes(2L).isEmpty && mimes(3L).isEmpty)
    // null assets get NULL feature vectors — xxhash64 skips null
    // children, so un-guarded they all shared ONE index-only vector
    // and clustered as perfect near-dups
    val feats = df.select(col("id"),
        Multimodal.decodeFeaturesStub(col("content"), 4).as("f"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(feats(1L).nonEmpty)
    assert(feats(2L).isEmpty && feats(3L).isEmpty)
  }

  test("WARC round-trip: plain + per-record gzip, HTTP envelope split, " +
      "composes into the HTML curation chain (VERDICT r12 #6)") {
    import graft.io.{WarcIO, WarcRecord}
    val dir = tmpDir("graft-warc")
    val html = "<html><body><h1>Title</h1><p>Real page text stays " +
      "here.</p><script>var junk = 1;</script></body></html>"
    val http = "HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=utf-8\r\nX-Other: y\r\n\r\n" + html
    val records = Seq(
      WarcRecord("", 0, "warcinfo", "", "2026-08-15T00:00:00Z",
        "application/warc-fields", Map.empty,
        "software: graft-test\r\n".getBytes("UTF-8")),
      WarcRecord("", 1, "request", "https://example.com/a",
        "2026-08-15T00:00:01Z", "application/http; msgtype=request",
        Map.empty, "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n"
          .getBytes("UTF-8")),
      WarcRecord("", 2, "response", "https://example.com/a",
        "2026-08-15T00:00:01Z", "application/http; msgtype=response",
        Map.empty, http.getBytes("UTF-8")))
    for (gz <- Seq(false, true)) {
      val f = s"$dir/fixture${if (gz) ".warc.gz" else ".warc"}"
      WarcIO.writeWarc(f, records, gzip = gz)
      val got = WarcIO.readWarc(spark, f).orderBy("record_idx").collect()
      assert(got.length == 3, s"gz=$gz: ${got.length} records")
      assert(got.map(_.getAs[String]("warc_type")).toSeq ==
        Seq("warcinfo", "request", "response"))
      assert(got(2).getAs[String]("target_uri") == "https://example.com/a")
      assert(got(2).getAs[String]("warc_date") == "2026-08-15T00:00:01Z")
      assert(new String(got(2).getAs[Array[Byte]]("content"), "UTF-8") == http,
        s"gz=$gz: response payload must round-trip byte-exact")
    }
    // composition: response record -> HTTP body -> stripHtml -> words —
    // the d48-style chain starting from the real-world entry format
    val text = WarcIO.readWarc(spark, s"$dir/fixture.warc.gz")
      .filter(col("warc_type") === "response")
      .select(col("target_uri"),
        graft.functions.TextFunctions.stripHtml(
          WarcIO.payloadText(WarcIO.httpBody(col("content")))).as("text"))
      .collect()
    assert(text.length == 1)
    assert(text.head.getString(1) == "Title Real page text stays here.",
      s"got '${text.head.getString(1)}'")
    // loud on truncation: a record claiming more bytes than remain
    val bad = s"$dir/trunc.warc"
    java.nio.file.Files.write(java.nio.file.Paths.get(bad),
      "WARC/1.0\r\nWARC-Type: response\r\nContent-Length: 999\r\n\r\nshort"
        .getBytes("UTF-8"))
    val ex = intercept[Exception] {
      WarcIO.readWarc(spark, bad).collect()
    }
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + "|" + chain(t.getCause)
    assert(chain(ex).contains("truncated"), chain(ex))
  }

  test("WARC headers: mandatory Record-ID emitted deterministically, " +
      "extra headers round-trip, legal duplicates comma-join (ADVICE r13)") {
    import graft.io.{WarcIO, WarcRecord}
    val rec = WarcRecord("", 0, "response", "https://example.com/x",
      "2026-08-15T00:00:00Z", "text/plain",
      Map("warc-concurrent-to" -> "<urn:uuid:aaa>",
        "warc-ip-address" -> "10.0.0.1"),
      "body text".getBytes("UTF-8"))
    val b1 = WarcIO.recordBytes(rec, gzip = false)
    // deterministic: same record -> same bytes (the Record-ID derives
    // from content, not a random UUID)
    assert(java.util.Arrays.equals(b1, WarcIO.recordBytes(rec, gzip = false)))
    val parsed = WarcIO.parseAll("t", b1)
    assert(parsed.length == 1)
    val h = parsed.head.headers
    assert(h.get("warc-record-id").exists(_.startsWith("<urn:uuid:")), h)
    assert(h.get("warc-ip-address").contains("10.0.0.1"), h)
    assert(h.get("warc-concurrent-to").contains("<urn:uuid:aaa>"), h)
    // a parsed Record-ID survives a re-write verbatim (round-trip)
    val again = WarcIO.parseAll("t",
      WarcIO.recordBytes(parsed.head, gzip = false)).head
    assert(again.headers.get("warc-record-id") == h.get("warc-record-id"))
    // legal repeated headers (WARC-Concurrent-To) comma-join instead
    // of last-wins dropping
    val dup = ("WARC/1.0\r\nWARC-Type: metadata\r\n" +
      "WARC-Concurrent-To: <urn:uuid:one>\r\n" +
      "WARC-Concurrent-To: <urn:uuid:two>\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val d = WarcIO.parseAll("t", dup).head
    assert(d.headers("warc-concurrent-to") == "<urn:uuid:one>, <urn:uuid:two>",
      d.headers.toString)
    // the streaming parser is record-incremental: a many-record gzip
    // archive (concatenated members) parses via the iterator without
    // whole-archive materialization
    val many = (0 until 200).flatMap(i => WarcIO.recordBytes(
      rec.copy(record_idx = i, content = s"body $i".getBytes("UTF-8")),
      gzip = true)).toArray
    val it = WarcIO.parseStream("m", new java.io.ByteArrayInputStream(many))
    assert(it.take(3).toSeq.map(r => new String(r.content, "UTF-8")) ==
      Seq("body 0", "body 1", "body 2"))
    // header VALUES decode as UTF-8 (ADVICE r14): a multi-byte
    // Target-URI must survive the streaming parser — the per-byte
    // toChar read decoded it Latin-1 ('é' came back as 'Ã©')
    val uri = "https://ex.test/café/日本"
    val utf = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Target-URI: $uri\r\n" +
      "Content-Length: 2\r\n\r\nok\r\n\r\n").getBytes("UTF-8")
    val u = WarcIO.parseStream("u",
      new java.io.ByteArrayInputStream(utf)).next()
    assert(u.target_uri == uri, u.target_uri)
  }

  test("WET round-trip: distributed per-partition sink, conversion-record " +
      "source, committed marker") {
    import graft.io.WarcIO
    val dir = tmpDir("graft-wet")
    val docs = Seq(
      ("https://a.test/1", "alpha beta gamma"),
      ("https://a.test/2", "delta epsilon"),
      ("https://a.test/3", "zeta eta theta iota")
    ).toDF("url", "text").repartition(2)
    WarcIO.writeWetDir(docs, s"$dir/wet")
    // committed-write marker lands
    assert(new java.io.File(s"$dir/wet/_SUCCESS").exists())
    val parts = new java.io.File(s"$dir/wet").listFiles()
      .filter(_.getName.endsWith(".warc.gz"))
    assert(parts.length == 2, s"one part per partition: ${parts.length}")
    val back = WarcIO.readWet(spark, s"$dir/wet/*.warc.gz")
      .select("target_uri", "text").as[(String, String)].collect().toSet
    assert(back == Set(
      ("https://a.test/1", "alpha beta gamma"),
      ("https://a.test/2", "delta epsilon"),
      ("https://a.test/3", "zeta eta theta iota")))
  }

  test("JSONL corpus round-trip: gzip parts, enforced schema, corrupt-line quarantine") {
    import graft.io.DocumentIO
    import org.apache.spark.sql.types._
    val dir = tmpDir("graft-jsonl")
    val docs = Seq((1L, "alpha beta", "en"), (2L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    DocumentIO.writeJsonl(docs, s"$dir/corpus")
    // part files actually gzip-compressed
    val parts = new java.io.File(s"$dir/corpus").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(parts.nonEmpty)
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType), StructField("lang", StringType)))
    val back = DocumentIO.readJsonlClean(spark, s"$dir/corpus", schema)
      .orderBy("doc_id").as[(Long, String, String)].collect().toSeq
    assert(back == Seq((1L, "alpha beta", "en"), (2L, "gamma", "de")))
    // corrupt lines: quarantined under __corrupt, not fatal, clean view drops them
    val raw = s"$dir/mixed.jsonl"
    java.nio.file.Files.writeString(java.nio.file.Paths.get(raw),
      """{"doc_id": 1, "text": "ok", "lang": "en"}
        |this is not json
        |{"doc_id": 2, "text": "also ok", "lang": "de"}""".stripMargin)
    // Spark refuses scans that reference ONLY the corrupt column —
    // materialize data columns alongside it (the documented pattern)
    val mixed = DocumentIO.readJsonl(spark, raw, schema)
      .select("doc_id", "__corrupt").collect()
    assert(mixed.count(r => !r.isNullAt(1)) == 1)
    assert(DocumentIO.readJsonlClean(spark, raw, schema).count() == 2)
  }
}
