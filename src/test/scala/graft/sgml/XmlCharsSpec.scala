package graft.sgml

import org.scalatest.funsuite.AnyFunSuite

/** Exact XML 1.0 name-char tables (XmlChars) vs a literal transcription
  * of productions [4]/[4a], exhaustively over the BMP. */
class XmlCharsSpec extends AnyFunSuite {

  // literal spec transcription (code-point level, BMP slice + surrogates
  // per XmlChars' documented per-unit convention)
  private def specStart(c: Int): Boolean =
    c == ':' || (c >= 'A' && c <= 'Z') || c == '_' || (c >= 'a' && c <= 'z') ||
    (c >= 0xC0 && c <= 0xD6) || (c >= 0xD8 && c <= 0xF6) ||
    (c >= 0xF8 && c <= 0x2FF) || (c >= 0x370 && c <= 0x37D) ||
    (c >= 0x37F && c <= 0x1FFF) || (c >= 0x200C && c <= 0x200D) ||
    (c >= 0x2070 && c <= 0x218F) || (c >= 0x2C00 && c <= 0x2FEF) ||
    (c >= 0x3001 && c <= 0xD7FF) ||
    (c >= 0xD800 && c <= 0xDB7F) || (c >= 0xDC00 && c <= 0xDFFF) ||
    (c >= 0xF900 && c <= 0xFDCF) || (c >= 0xFDF0 && c <= 0xFFFD)

  private def specChar(c: Int): Boolean =
    specStart(c) || c == '-' || c == '.' || (c >= '0' && c <= '9') ||
    c == 0xB7 || (c >= 0x300 && c <= 0x36F) || (c >= 0x203F && c <= 0x2040)

  test("tables match the XML 1.0 productions for every BMP unit") {
    var c = 0
    while (c <= 0xFFFF) {
      assert(XmlChars.isNameStart(c.toChar) == specStart(c), f"start U+$c%04X")
      assert(XmlChars.isNameChar(c.toChar) == specChar(c), f"char U+$c%04X")
      c += 1
    }
  }

  test("XML-excluded Unicode letters are rejected (divergence from java.lang.Character)") {
    // ª U+00AA, µ U+00B5, º U+00BA are Unicode letters but NOT XML name chars
    for (c <- Seq('ª', 'µ', 'º')) {
      assert(Character.isLetter(c))
      assert(!XmlChars.isNameStart(c))
      assert(!XmlChars.isNameChar(c))
    }
  }

  test("supplementary-plane names parse via surrogate pairs; F0000+ rejected") {
    val name = "t" + new String(Character.toChars(0x10330)) // GOTHIC AHSA
    val cfg = ParserConfig(dialect = Dialect.Xml, space = SpaceMode.Preserve)
    val r = SgmlParser.parse(s"<$name>x</$name>", cfg)
    val e = r.content.collectFirst { case e: Node.Elem => e }.get
    assert(e.name == name)
    assert(r.errors.isEmpty)
    // plane-15 private-use char is not a name char
    val hi = Character.toChars(0xF0001)(0)
    assert(!XmlChars.isNameStart(hi))
  }
}
