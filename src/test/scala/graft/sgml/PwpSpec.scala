package graft.sgml

import org.scalatest.funsuite.AnyFunSuite
import Pwp.{Rows, Scalar}

/** PWP template engine (SURVEY.md §2.5) — the documented relational
  * dialect of `pwp.pl — pwp_xml/3` [V]. */
class PwpSpec extends AnyFunSuite {

  test("pwp:ask replicates per row with field shadowing; pwp:use projects") {
    val b = Map[String, Pwp.Val](
      "title" -> Scalar("T"),
      "items" -> Rows(Seq(
        Map("name" -> Scalar("a"), "n" -> Scalar("1")),
        Map("name" -> Scalar("b"), "n" -> Scalar("2")))))
    val out = Pwp.renderXml(
      """<list t="$title"><li pwp:ask="items" n="$n"><v pwp:use="$name"></v></li></list>""", b)
    assert(out == """<list t="T"><li n="1"><v>a</v></li><li n="2"><v>b</v></li></list>""")
  }

  test("pwp:tag renames; pwp:tag='-' splices children; missing rel vanishes") {
    val b = Map[String, Pwp.Val]("xs" -> Rows(Seq(Map("v" -> Scalar("1")))))
    assert(Pwp.renderXml("""<a pwp:tag="b">t</a>""", b) == "<b>t</b>")
    assert(Pwp.renderXml("""<w><a pwp:tag="-"><c>t</c></a></w>""", b) == "<w><c>t</c></w>")
    assert(Pwp.renderXml("""<w><a pwp:ask="nope">gone</a><b>kept</b></w>""", b) ==
      "<w><b>kept</b></w>")
  }

  test("pwp:how=xml splices parsed markup; text (default) escapes") {
    val b = Map[String, Pwp.Val]("frag" -> Scalar("<b>x</b>"))
    assert(Pwp.renderXml("""<d pwp:use="$frag" pwp:how="xml"></d>""", b) ==
      "<d><b>x</b></d>")
    assert(Pwp.renderXml("""<d pwp:use="$frag"></d>""", b) ==
      "<d>&lt;b&gt;x&lt;/b&gt;</d>")
  }

  test("$ substitution: attributes yes, text no; $$ escape; unknown literal") {
    val b = Map[String, Pwp.Val]("x" -> Scalar("V"))
    assert(Pwp.renderXml("""<d a="$x b $$ $nope">$x</d>""", b) ==
      """<d a="V b $ $nope">$x</d>""")
  }

  test("scalar pwp:ask is one solution; nested asks compose") {
    val b = Map[String, Pwp.Val](
      "one" -> Scalar("yes"),
      "outer" -> Rows(Seq(
        Map("o" -> Scalar("A"), "inner" -> Rows(Seq(
          Map("i" -> Scalar("1")), Map("i" -> Scalar("2"))))),
        Map("o" -> Scalar("B"), "inner" -> Rows(Seq(
          Map("i" -> Scalar("3"))))))))
    assert(Pwp.renderXml("""<d pwp:ask="one">k</d>""", b) == "<d>k</d>")
    val out = Pwp.renderXml(
      """<r><g pwp:ask="outer" o="$o"><e pwp:ask="inner" pwp:use="$i"></e></g></r>""", b)
    assert(out == """<r><g o="A"><e>1</e><e>2</e></g><g o="B"><e>3</e></g></r>""")
  }
}
