package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Iso639, XsdTypes}

/** xsdp_types + iso_639 surfaces: hierarchy walk, lexical patterns
  * (checked with plain Java regex — the same strings the Column rlike and
  * the DuckDB oracle run), table consistency. */
class XsdIsoSpec extends AnyFunSuite {

  private def ok(t: String, v: String): Boolean = v.matches(XsdTypes.patterns(t))

  test("xsd subtype hierarchy is reflexive + transitive") {
    assert(XsdTypes.subtypeOf("byte", "byte"))
    assert(XsdTypes.subtypeOf("byte", "decimal")) // byte→short→int→long→integer→decimal
    assert(XsdTypes.subtypeOf("positiveInteger", "decimal"))
    assert(XsdTypes.subtypeOf("language", "string"))
    assert(!XsdTypes.subtypeOf("decimal", "integer")) // not symmetric
    assert(!XsdTypes.subtypeOf("boolean", "decimal"))
  }

  test("lexical patterns accept/reject per the XSD spec") {
    assert(ok("integer", "42") && ok("integer", "-7") && ok("integer", "+05"))
    assert(!ok("integer", "4.2") && !ok("integer", "") && !ok("integer", "1e3"))
    assert(ok("decimal", "3.14") && ok("decimal", ".5") && ok("decimal", "-2."))
    assert(ok("double", "6.02e23") && ok("double", "-INF") && ok("double", "NaN"))
    assert(!ok("double", "e3"))
    assert(ok("boolean", "true") && ok("boolean", "0") && !ok("boolean", "yes"))
    assert(ok("date", "2024-02-29") && ok("date", "2024-02-29Z") &&
      ok("date", "-0044-03-15"))
    assert(!ok("date", "2024-2-9") && !ok("date", "20240229"))
    assert(ok("dateTime", "2024-02-29T23:59:59.5+02:00"))
    assert(ok("time", "23:59:59") && !ok("time", "23:59"))
    assert(ok("gYear", "2024") && ok("gYear", "-0044") && !ok("gYear", "202"))
    assert(ok("hexBinary", "deadBEEF") && !ok("hexBinary", "abc"))
    assert(ok("NCName", "foo_bar-1.x") && !ok("NCName", "1abc") && !ok("NCName", "a:b"))
    assert(ok("QName", "ns:local") && !ok("QName", ":x"))
    assert(ok("language", "en") && ok("language", "zh-Hant") && !ok("language", "en--x"))
    assert(ok("token", "a b c") && !ok("token", " a") && !ok("token", "a  b"))
  }

  test("iso_639 table: aliases agree with their 2-letter canonical names") {
    assert(Iso639.names("en") == "English")
    assert(Iso639.names("eng") == "English")
    assert(Iso639.names("deu") == Iso639.names("de"))
    assert(Iso639.names("ger") == Iso639.names("de"))
    assert(Iso639.names("zho") == Iso639.names("zh"))
    assert(Iso639.names("chi") == Iso639.names("zh"))
    // every 3-letter alias maps to a name that some 2-letter code also has
    val twoLetterNames = Iso639.names.filter(_._1.length == 2).values.toSet
    assert(Iso639.names.values.toSet == twoLetterNames)
    // no SQL-breaking characters (the oracle interpolates these as VALUES)
    assert(Iso639.names.forall { case (c, n) => !c.contains("'") && !n.contains("'") })
  }
}
