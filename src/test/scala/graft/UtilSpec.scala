package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.util.{Units, Util}

class UtilSpec extends AnyFunSuite {

  test("asStr coerces ints like the reference ({'foo':[42]} ≡ {'foo':['42']})") {
    assert(Util.asStr(42) == "42")
    assert(Util.asStr(42L) == "42")
    assert(Util.asStr("x") == "x")
    assert(Util.asStrList(Seq(1, "two", 3.0)) == Seq("1", "two", "3"))
  }

  test("parseUrl full form") {
    val u = Util.parseUrl("ixmp://platform/model name/scen/with/slashes#42")
    assert(u == graft.util.ScenarioUrl(Some("platform"), "model name",
      "scen/with/slashes", Some(Left(42))))
  }

  test("parseUrl version 'new' and bare coords") {
    assert(Util.parseUrl("m/s#new").version == Some(Right("new")))
    assert(Util.parseUrl("m/s") ==
      graft.util.ScenarioUrl(None, "m", "s", None))
    intercept[IllegalArgumentException](Util.parseUrl("m/s#notanint"))
    intercept[IllegalArgumentException](Util.parseUrl("ixmp://p/modelonly"))
  }

  test("checkYear") {
    assert(Util.checkYear(Some(2020), "y") == Some(2020))
    assert(Util.checkYear(None, "y").isEmpty)
    intercept[IllegalArgumentException](Util.checkYear(Some("foo"), "y"))
  }

  test("unit algebra: parse, multiply, divide, format") {
    val usdPerKm = Units.parse("USD/km")
    assert(usdPerKm.exponents == Map("USD" -> 1, "km" -> -1))
    val km = Units.parse("km")
    assert((usdPerKm * km).format == "USD")
    assert((km * km).format == "km ** 2")
    assert((km / km).isDimensionless)
    assert(Units.parse("cases").format == "cases")
    assert(Units.parse("").isDimensionless)
    assert(Units.parse("???").isDimensionless)
    assert((Units.parse("USD") / Units.parse("km")).format == "USD / km")
    assert(Units.parse("a*b/c").exponents == Map("a" -> 1, "b" -> 1, "c" -> -1))
  }

  test("unit parse: parens, implicit multiplication, division-by-one " +
    "(review r11)") {
    // parens: the flat loop produced garbage names "(kW"/"a)" and the
    // WRONG sign on a
    assert(Units.parse("USD/(kW*a)").exponents ==
      Map("USD" -> 1, "kW" -> -1, "a" -> -1))
    assert(Units.parse("(a*b)/(c*d)").exponents ==
      Map("a" -> 1, "b" -> 1, "c" -> -1, "d" -> -1))
    // whitespace = implicit multiplication (pint: 'Mt CO2/yr'), so
    // prefixed-mass conversion works where the opaque token refused
    assert(Units.parse("Mt CO2/yr").exponents ==
      Map("Mt" -> 1, "CO2" -> 1, "yr" -> -1))
    assert(Units.conversionFactor(
      Units.parse("Mt CO2/yr"), Units.parse("kt CO2/yr")).contains(1000.0))
    // '/ 1' absorbs the division: x / 1 * y is x*y, not x/y
    assert(Units.parse("x / 1 * y").exponents == Map("x" -> 1, "y" -> 1))
    // loud on magnitudes and unbalanced parens
    intercept[IllegalArgumentException](Units.parse("2 * km"))
    intercept[IllegalArgumentException](Units.parse("USD/(kW"))
  }

  test("unit parse: paren-group exponents apply to every member " +
    "(review r12)") {
    // the "^2" after ')' previously parsed as a phantom ''-named token
    // and the squaring silently VANISHED — a wrong-dimensionality
    // conversion then succeeded with factor 1.0
    assert(Units.parse("(kW*a)**2").exponents == Map("kW" -> 2, "a" -> 2))
    assert(Units.parse("USD/(kW*a)^2").exponents ==
      Map("USD" -> 1, "kW" -> -2, "a" -> -2))
    assert(Units.conversionFactor(
      Units.parse("(kW*a)**2"), Units.parse("kW^2 * a^2")).contains(1.0))
    assert(Units.conversionFactor(
      Units.parse("(kW*a)**2"), Units.parse("kW*a")).isEmpty,
      "a squared unit must NOT convert to its first power")
    // dangling exponents are refused, not silently dropped
    intercept[IllegalArgumentException](Units.parse("^2"))
    intercept[IllegalArgumentException](Units.parse("km * ^2"))
  }


  test("checkYear/asStr stay faithful outside int/long range (review r11)") {
    intercept[IllegalArgumentException](
      Util.checkYear(Some(5000000000L), "y"))
    assert(Util.asStr(1e19) == "1.0E19", // not Long.MaxValue's digits
      Util.asStr(1e19))
    assert(Util.asStr(2010.0) == "2010")
  }

  test("unit exponent syntax round-trips through parse(format(u))") {
    assert(Units.parse("km ** 2").exponents == Map("km" -> 2))
    assert(Units.parse("km**2").exponents == Map("km" -> 2))
    assert(Units.parse("km^2").exponents == Map("km" -> 2))
    assert(Units.parse("USD / km ** 2").exponents == Map("USD" -> 1, "km" -> -2))
    val cases = Seq("km ** 2", "USD / km ** 2", "a ** 3 * b / c ** 2", "1 / km ** 2")
    for (s <- cases) {
      val u = Units.parse(s)
      assert(Units.parse(u.format) == u, s"round-trip failed for '$s' via '${u.format}'")
    }
    // chained algebra: (d*d)/d must format+reparse identically
    val d = Units.parse("km")
    val sq = d * d
    assert(Units.parse(sq.format) == sq)
    assert((sq / d).format == "km")
  }

  test("percent is a scaled dimensionless unit (pint: % = 0.01)") {
    assert(Units.conversionFactor(Units.parse("%"), Units.dimensionless)
      .contains(0.01))
    assert(Units.conversionFactor(Units.dimensionless, Units.parse("%"))
      .exists(f => math.abs(f - 100.0) < 1e-9))
    // % times a real unit carries the factor, keeps the dimension
    assert(Units.conversionFactor(
      Units.parse("%") * Units.parse("km"), Units.parse("m"))
      .contains(10.0))
  }

  test("cleanPath scrubs invalid chars (model/base.py:41-44)") {
    assert(Util.cleanPath("""a<b>c:d"e/f\g|h?i*j""") == "a_b_c_d_e_f_g_h_i_j")
  }
}
