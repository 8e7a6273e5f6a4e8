package graft.sgml

import org.scalatest.funsuite.AnyFunSuite
import javax.swing.text.html.parser.ParserDelegator
import javax.swing.text.html.{HTML, HTMLEditorKit}
import javax.swing.text.MutableAttributeSet
import java.io.StringReader

/** Differential conformance for D3 — omitted-tag inference — against a
  * SECOND independent oracle: the JDK's Swing HTML parser
  * (`javax.swing.text.html.parser.ParserDelegator`, public platform API).
  * Like upstream packages-sgml, it is a DTD-driven SGML-family parser with
  * content-model-based tag-omission repair (implied `html`/`head`/`body`,
  * auto-closed `p`/`li`/`dt`/`dd`/`tr`/`td`/`th`), so it exercises exactly
  * the subsystem SURVEY.md calls "the hard custom piece" — on a dialect the
  * SAX differential (well-formed XML) cannot reach.
  *
  * Protocol: generate random HTML with omitted optional end tags (and
  * sometimes omitted `<html>`/`<head>`/`<body>` start tags) from the
  * conservative subset where HTML 3.2 (Swing's DTD) and HTML 4.01 agree,
  * parse with both engines, and require the identical canonical sequence of
  * open / close / text events. Swing's implied elements are treated as
  * regular opens — our repair must materialize the same ones at the same
  * positions. */
class HtmlOmissionDifferentialSpec extends AnyFunSuite {

  // ---- Swing canonical -------------------------------------------------
  /** Attribute normalization: Swing tags implied elements with a
    * `_implied_` pseudo-attribute (filtered), and reports only SPECIFIED
    * attributes — its callback API never surfaces DTD defaults. */
  private def swingCanonical(doc: String): String = {
    val sb = new StringBuilder
    val cb = new HTMLEditorKit.ParserCallback {
      override def handleStartTag(t: HTML.Tag, a: MutableAttributeSet, pos: Int): Unit = {
        sb.append('<').append(t)
        val e = a.getAttributeNames
        val kvs = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
        while (e.hasMoreElements) {
          val k = e.nextElement()
          kvs += ((k.toString, a.getAttribute(k).toString))
        }
        kvs.filter(_._1 != "_implied_").sortBy(_._1)
          .foreach { case (k, v) => sb.append(' ').append(k).append('=').append(v) }
        sb.append('>')
      }
      override def handleEndTag(t: HTML.Tag, pos: Int): Unit =
        sb.append("</").append(t).append('>')
      override def handleSimpleTag(t: HTML.Tag, a: MutableAttributeSet, pos: Int): Unit =
        sb.append('<').append(t).append("/>")
      override def handleText(d: Array[Char], pos: Int): Unit =
        sb.append("T(").append(new String(d)).append(')')
    }
    new ParserDelegator().parse(new StringReader(doc), cb, true)
    sb.toString
  }

  // ---- ours ------------------------------------------------------------
  /** One deliberate normalization: our HTML 4.01 content model implies
    * `<tbody>` inside `<table>` (TABLE → (…, TBODY+), TBODY start+end both
    * omissible — exactly what upstream's shipped `DTD/HTML4.dtd` declares);
    * Swing's DTD is HTML 3.2, which predates TBODY. The implied tbody is
    * dropped from OUR canonical so the two DTD generations compare on the
    * repair semantics they share. Everything else is byte-for-byte. */
  private def ourCanonical(doc: String): (String, Vector[ParseErr]) = {
    val cfg = ParserConfig(dialect = Dialect.Html4, space = SpaceMode.Preserve)
    val r = SgmlParser.parse(doc, cfg)
    val sb = new StringBuilder
    // Our HTML 4.01 attlists MATERIALIZE DTD defaults (td/th get
    // rowspan=1 colspan=1 — upstream add_default_attributes semantics);
    // Swing's callback only surfaces specified attrs, so the known
    // defaults are filtered from OUR canonical. The generator never
    // writes span=1 explicitly, so no specified attr is hidden.
    def attrStr(attrs: Seq[Attr]): String =
      attrs.filterNot(a =>
          (a.name == "rowspan" || a.name == "colspan") && a.value.render == "1")
        .sortBy(_.name).map(a => s" ${a.name}=${a.value.render}").mkString
    def walk(ns: Seq[Node]): Unit = ns.foreach {
      case Node.Text(s, _, _) => sb.append("T(").append(s).append(')')
      case Node.Elem("tbody", _, kids, _) => walk(kids)
      case Node.Elem(n, attrs, kids, _) =>
        if (kids.isEmpty && Set("br", "hr", "img")(n)) sb.append('<').append(n).append("/>")
        else {
          sb.append('<').append(n).append(attrStr(attrs)).append('>')
          walk(kids)
          sb.append("</").append(n).append('>')
        }
      case _ => ()
    }
    walk(r.content)
    (sb.toString, r.errors)
  }

  private def check(doc: String, label: String): Unit = {
    val expected = swingCanonical(doc)
    val (got, errs) = ourCanonical(doc)
    assert(errs.isEmpty, s"$label: our parser reported errors ${errs.take(3)}\ndoc: $doc")
    assert(got == expected, s"$label\ndoc:   $doc\nswing: $expected\nours:  $got")
  }

  test("probe docs: our omission repair ≡ Swing ParserDelegator") {
    Seq(
      "<html><body><ul><li>one<li>two</ul><p>para<p>two</body></html>",
      "<html><body><table><tr><td>c1<td>c2<tr><td>r2</table></body></html>",
      "<p>bare paragraph",
      "<html><head><title>t</title><body><p>x<b>bold<i>bi</i></b>",
      "<dl><dt>term<dd>def<dt>t2<dd>d2</dl>")
      .zipWithIndex.foreach { case (d, i) => check(d, s"probe #$i") }
  }

  test("attribute + entity probes ≡ Swing (shared HTML3.2/4.01 vocabulary)") {
    Seq(
      """<html><body><p align="center">x</p></body></html>""",
      """<html><body><table><tr><td colspan=2 align=left>c<td>d</table>""",
      """<html><body><ul><li value=3>one<li>two</ul>""",
      """<html><body><p>a &amp; b &lt;c&gt; &#65;&#x42;</p>""",
      """<p align=right>bare para, implied chain, specified attr""",
      """<html><body><p>run-end ref: a &amp b</p>""")
      .zipWithIndex.foreach { case (d, i) => check(d, s"attr probe #$i") }
  }

  // ---- random-omission generator --------------------------------------
  // Conservative subset where HTML 3.2 and 4.01 agree: block structure
  // p / ul / ol / dl / table with their optional end tags randomly omitted,
  // inline b/i/em/strong/tt always properly closed, single-space ASCII text,
  // no whitespace between tags (Swing relocates inter-block whitespace).
  test("300 random docs with omitted end tags: repair ≡ Swing ParserDelegator") {
    val rng = new scala.util.Random(424342)
    val words = Vector("alpha", "beta", "gamma delta", "x1", "words here", "zz")
    // entity-laced fragments from the set both entity tables share; all
    // terminated with ';' (both engines also accept a bare '&amp' run-end,
    // covered by the probe test)
    val entWords = Vector("a &amp; b", "&lt;tag&gt;", "ch &#65;&#x42;", "q&amp;a")
    def text(): String =
      if (rng.nextInt(4) == 0) entWords(rng.nextInt(entWords.length))
      else words(rng.nextInt(words.length))
    def inline(depth: Int): String =
      if (depth <= 0 || rng.nextInt(3) > 0) text()
      else {
        val t = Vector("b", "i", "em", "strong", "tt")(rng.nextInt(5))
        s"<$t>${inline(depth - 1)}</$t>"
      }
    def close(tag: String): String = if (rng.nextBoolean()) s"</$tag>" else ""
    // attributes from the vocabulary HTML 3.2 and 4.01 declare identically
    def alignAttr(): String =
      if (rng.nextInt(3) == 0)
        " align=" + Vector("left", "center", "right")(rng.nextInt(3))
      else ""
    def spanAttr(): String = rng.nextInt(4) match {
      case 0 => s" colspan=${2 + rng.nextInt(2)}"
      case 1 => s" rowspan=${2 + rng.nextInt(2)}"
      case _ => ""
    }
    def block(depth: Int): String = rng.nextInt(4) match {
      case 0 =>
        s"<p${alignAttr()}>${inline(2)}${close("p")}"
      case 1 =>
        val t = if (rng.nextBoolean()) "ul" else "ol"
        val items = (0 to rng.nextInt(3)).map { _ =>
          val kids = if (depth > 0 && rng.nextInt(4) == 0) block(depth - 1) else inline(2)
          val v = if (rng.nextInt(4) == 0) s" value=${1 + rng.nextInt(9)}" else ""
          s"<li$v>$kids${close("li")}"
        }.mkString
        s"<$t>$items</$t>"
      case 2 =>
        val items = (0 to rng.nextInt(3)).map { _ =>
          val t = if (rng.nextBoolean()) "dt" else "dd"
          s"<$t>${inline(2)}${close(t)}"
        }.mkString
        s"<dl>$items</dl>"
      case _ =>
        val rows = (0 to rng.nextInt(2)).map { _ =>
          val cells = (0 to rng.nextInt(3)).map { _ =>
            val c = if (rng.nextInt(4) == 0) "th" else "td"
            val kids = if (depth > 0 && rng.nextInt(5) == 0) block(depth - 1) else inline(1)
            s"<$c${spanAttr()}${alignAttr()}>$kids${close(c)}"
          }.mkString
          s"<tr>$cells${close("tr")}"
        }.mkString
        s"<table>$rows</table>"
    }
    for (i <- 1 to 300) {
      val body = (0 until 1 + rng.nextInt(4)).map(_ => block(2)).mkString
      val doc = rng.nextInt(3) match {
        case 0 => body                                         // html/head/body all implied
        case 1 => s"<html><body>$body${close("body")}${close("html")}"
        case _ => s"<html><head><title>${text()}</title>${close("head")}<body>$body"
      }
      check(doc, s"random #$i")
    }
  }
}
