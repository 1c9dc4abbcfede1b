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
}
