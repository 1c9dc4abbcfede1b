package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Units, Util}

/** Property-based checks of the pure algebra/parse layers — the parts
  * whose correctness the DuckDB gates cannot grade (driver-side, no
  * DataFrames involved). Uses scalacheck generators with DETERMINISTIC
  * seeds (no scalatestplus bridge in the offline cache), so failures
  * are reproducible by construction. */
class PropertySpec extends AnyFunSuite {

  /** Evaluate `f` over `n` seeded samples of `g`. */
  private def forAllG[A](g: Gen[A], n: Int = 300)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      g.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val unitName: Gen[String] =
    Gen.choose(1, 6).flatMap(k => Gen.listOfN(k, Gen.alphaLowerChar))
      .map(_.mkString).suchThat(_ != "1")

  private val unitsGen: Gen[Units] = for {
    n <- Gen.choose(0, 4)
    names <- Gen.listOfN(n, unitName)
    exps <- Gen.listOfN(n, Gen.oneOf(-3, -2, -1, 1, 2, 3))
  } yield Units(names.zip(exps).toMap.filter(_._2 != 0))

  test("Units: parse(format(u)) == u for any exponent map") {
    forAllG(unitsGen) { u =>
      assert(Units.parse(u.format) == u, s"format='${u.format}'")
    }
  }

  test("Units: algebra laws — u/u = 1, (a*b)/b = a, * commutes") {
    forAllG(Gen.zip(unitsGen, unitsGen)) { case (a, b) =>
      assert((a / a).isDimensionless)
      assert((a * b) / b == a)
      assert(a * b == b * a)
    }
  }

  test("Units: format/parse closed under products and ratios") {
    forAllG(Gen.zip(unitsGen, unitsGen)) { case (a, b) =>
      assert(Units.parse((a * b).format) == a * b)
      assert(Units.parse((a / b).format) == a / b)
    }
  }

  private val prefixedGen: Gen[Units] = for {
    n <- Gen.choose(1, 3)
    names <- Gen.listOfN(n, Gen.oneOf("m", "km", "g", "kg", "t", "Mt",
      "s", "h", "W", "MW", "GW", "J", "GJ", "USD", "cases"))
    exps <- Gen.listOfN(n, Gen.oneOf(-2, -1, 1, 2))
  } yield Units(names.zip(exps).toMap.filter(_._2 != 0))

  test("Units.conversionFactor: self=1, round-trip inverts, chain composes") {
    forAllG(Gen.zip(prefixedGen, prefixedGen)) { case (a, b) =>
      assert(Units.conversionFactor(a, a).contains(1.0))
      Units.conversionFactor(a, b).foreach { f =>
        // defined one way ⇒ defined back, and the factors invert
        val back = Units.conversionFactor(b, a)
        assert(back.isDefined)
        assert(math.abs(f * back.get - 1.0) < 1e-9,
          s"${a.format} <-> ${b.format}: $f * ${back.get}")
      }
      // compatibility is symmetric
      assert(Units.conversionFactor(a, b).isDefined ==
        Units.conversionFactor(b, a).isDefined)
    }
  }

  private val nameGen: Gen[String] =
    Gen.choose(1, 12).flatMap(k => Gen.listOfN(k,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '-', '_', '.'))))
      .map(_.mkString.trim)
      .suchThat(s => s.nonEmpty && !s.contains("/") && !s.contains("#"))
  // scenario names MAY contain '/' (util/__init__.py:340-408)
  private val scenGen: Gen[String] = for {
    a <- nameGen
    b <- Gen.option(nameGen)
  } yield b.map(x => s"$a/$x").getOrElse(a)

  test("URL: parse(ixmp://p/m/s#v) recovers every component") {
    forAllG(Gen.zip(nameGen, nameGen, scenGen, Gen.choose(0, 10000))) {
      case (p, m, s, v) =>
        val u = Util.parseUrl(s"ixmp://$p/$m/$s#$v")
        assert(u.platform.contains(p))
        assert(u.model == m)
        assert(u.scenario == s)
        assert(u.version == Some(Left(v)))
    }
  }

  test("URL: bare model/scenario parses without platform or version") {
    forAllG(Gen.zip(nameGen, scenGen)) { case (m, s) =>
      val u = Util.parseUrl(s"$m/$s")
      assert(u.platform.isEmpty && u.model == m && u.scenario == s && u.version.isEmpty)
    }
  }

  test("xlsx column letters: colIndex(colLetters(i)) == i") {
    forAllG(Gen.choose(0, 20000)) { i =>
      val ref = graft.io.Xlsx.colLetters(i)
      assert(ref.forall(c => c >= 'A' && c <= 'Z'))
      assert(graft.io.Xlsx.colIndex(ref + "123") == i)
    }
    // spot anchors of the 26-adic encoding
    assert(graft.io.Xlsx.colLetters(0) == "A")
    assert(graft.io.Xlsx.colLetters(25) == "Z")
    assert(graft.io.Xlsx.colLetters(26) == "AA")
    assert(graft.io.Xlsx.colLetters(701) == "ZZ")
    assert(graft.io.Xlsx.colLetters(702) == "AAA")
  }

  test("unigram byte fallback: decode(encode(w)) == w and the piece " +
      "stream stays inside the closed vocab, for arbitrary unicode") {
    import graft.ops.{Unigram, UnigramModel}
    val model = UnigramModel(Vector("a", "b", "ab", "the"),
      Vector(-1.0, -1.5, -2.0, -1.2), unkLogp = math.log(0.001))
    // tokens mix model pieces, OOV ASCII, multi-byte BMP chars and
    // astral emoji (UTF-16 surrogate PAIRS — the run-rejoin corner)
    val tokenGen = Gen.oneOf("a", "b", "ab", "the", "z", "Q", "~",
      "é", "日", "語", "ß", "😀", "🦄", " ")
    val strGen = Gen.choose(1, 10)
      .flatMap(n => Gen.listOfN(n, tokenGen)).map(_.mkString)
    forAllG(strGen) { w =>
      val pieces = Unigram.viterbiBytes(w, model)
      assert(Unigram.decodePieces(pieces.toIndexedSeq) == w,
        s"round-trip failed for '$w' via ${pieces.mkString("|")}")
      // closed vocabulary: model pieces ∪ the 256 <0xXX> byte pieces
      assert(pieces.forall(p => model.pieces.contains(p) ||
        (p.length == 6 && p.startsWith("<0x") && p.endsWith(">"))),
        s"OOV piece leaked for '$w': ${pieces.mkString("|")}")
    }
  }

  test("simhash blockLayout: partition of 64 bits, any h in [0,63]") {
    (0 to 63).foreach { h =>
      val layout = graft.ops.Dedup.blockLayout(h)
      assert(layout.size == h + 1)
      assert(layout.map(_._3).sum == 64)
      assert(layout.forall(_._3 >= 1))
      layout.sliding(2).foreach {
        case Seq((_, o1, w1), (_, o2, _)) => assert(o1 + w1 == o2)
        case _ =>
      }
    }
  }

  test("as_str_list coercion: ints and strings stringify identically") {
    forAllG(Gen.listOf(Gen.choose(-1000000, 1000000))) { xs =>
      assert(Util.asStrList(xs) == xs.map(_.toString))
      assert(Util.asStrList(xs.map(_.toString)) == xs.map(_.toString))
    }
  }

  test("Units.pow: laws vs repeated multiplication, format round-trip") {
    forAllG(Gen.zip(unitsGen, Gen.choose(1, 4))) { case (u, n) =>
      assert(u.pow(0) == Units.dimensionless)
      assert(u.pow(1) == u)
      assert(u.pow(n) == (1 until n).foldLeft(u)((acc, _) => acc * u))
      assert(Units.parse(u.pow(n).format) == u.pow(n),
        s"format='${u.pow(n).format}'")
    }
  }

  private val textGen: Gen[String] =
    Gen.listOf(Gen.frequency(
      8 -> Gen.alphaLowerChar, 2 -> Gen.const(' '),
      1 -> Gen.oneOf('.', ',', '!', '9'))).map(_.mkString)

  test("repetition stats: bounded fractions, token count matches the regex") {
    import org.apache.spark.unsafe.types.UTF8String
    val re = "[a-z0-9]+".r
    forAllG(textGen, n = 200) { s =>
      val row = graft.functions.RepetitionStatsExpr.compute(
        UTF8String.fromString(s))
      val words = re.findAllIn(s.toLowerCase).toList
      assert(row.getInt(0) == words.size)
      // independent recomputation of the distinct-word ratio
      if (words.nonEmpty)
        assert(math.abs(row.getDouble(1) -
          words.distinct.size.toDouble / words.size) < 5e-5)
      (1 to 3).foreach(i => assert(row.getDouble(i) >= 0.0 && row.getDouble(i) <= 1.0))
    }
  }

  test("winnow guarantee: shared substring of length k+w-1 shares a fingerprint") {
    import org.apache.spark.unsafe.types.UTF8String
    val ascii = Gen.listOf(Gen.alphaLowerChar).map(_.mkString)
    val gen = Gen.zip(ascii, ascii, Gen.listOfN(15, Gen.alphaLowerChar).map(_.mkString))
    forAllG(gen, n = 200) { case (pre, post, shared) =>
      def fps(s: String) = graft.functions.WinnowHashes
        .compute(UTF8String.fromString(s), 8, 8).toSet
      val a = fps(pre + shared)
      val b = fps(shared + post)
      // k + w - 1 = 15 shared characters guarantee a common selected
      // fingerprint (Schleimer et al. 2003, the winnowing property)
      assert(a.intersect(b).nonEmpty,
        s"no shared fp for pre='$pre' post='$post'")
    }
  }

  test("pq encode: codes in range; a centroid encodes to itself") {
    val vecGen = Gen.listOfN(16, Gen.choose(-100, 100).map(_ / 10.0))
    forAllG(Gen.listOfN(4, vecGen), n = 100) { cents =>
      val distinct = cents.distinct
      val m = 2
      val dsub = 8
      val ks = distinct.size
      if (ks >= 2) {
        val flat = new Array[Double](m * ks * dsub)
        for (mm <- 0 until m; j <- 0 until ks; d <- 0 until dsub)
          flat((mm * ks + j) * dsub + d) = distinct(j)(mm * dsub + d)
        val cb = graft.ops.PqCodebook(m, ks, dsub, flat)
        distinct.zipWithIndex.foreach { case (v, j) =>
          val codes = graft.ops.PqEncodeExpr.compute(
            new org.apache.spark.sql.catalyst.util.GenericArrayData(v.toArray),
            cb, normalize = false)
          assert(codes.length == m)
          assert(codes.forall(c => c >= 0 && c < ks))
          // the centroid's own subvectors are distance 0 from slot j —
          // argmin ties break to the SMALLEST code id, so allow an
          // earlier identical subvector
          codes.zipWithIndex.foreach { case (c, mm) =>
            val sub = distinct(c).slice(mm * dsub, (mm + 1) * dsub)
            assert(sub == v.slice(mm * dsub, (mm + 1) * dsub),
              s"code $c is not a zero-distance slot for subspace $mm")
          }
        }
      }
    }
  }
}
