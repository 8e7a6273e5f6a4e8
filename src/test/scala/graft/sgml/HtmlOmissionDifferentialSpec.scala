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
  private def swingCanonical(doc: String): String = {
    val sb = new StringBuilder
    val cb = new HTMLEditorKit.ParserCallback {
      override def handleStartTag(t: HTML.Tag, a: MutableAttributeSet, pos: Int): Unit =
        sb.append('<').append(t).append('>')
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
    def walk(ns: Seq[Node]): Unit = ns.foreach {
      case Node.Text(s, _, _) => sb.append("T(").append(s).append(')')
      case Node.Elem("tbody", _, kids, _) => walk(kids)
      case Node.Elem(n, _, kids, _) =>
        if (kids.isEmpty && Set("br", "hr", "img")(n)) sb.append('<').append(n).append("/>")
        else {
          sb.append('<').append(n).append('>')
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

  // ---- random-omission generator --------------------------------------
  // Conservative subset where HTML 3.2 and 4.01 agree: block structure
  // p / ul / ol / dl / table with their optional end tags randomly omitted,
  // inline b/i/em/strong/tt always properly closed, single-space ASCII text,
  // no whitespace between tags (Swing relocates inter-block whitespace).
  test("300 random docs with omitted end tags: repair ≡ Swing ParserDelegator") {
    val rng = new scala.util.Random(424342)
    val words = Vector("alpha", "beta", "gamma delta", "x1", "words here", "zz")
    def text(): String = words(rng.nextInt(words.length))
    def inline(depth: Int): String =
      if (depth <= 0 || rng.nextInt(3) > 0) text()
      else {
        val t = Vector("b", "i", "em", "strong", "tt")(rng.nextInt(5))
        s"<$t>${inline(depth - 1)}</$t>"
      }
    def close(tag: String): String = if (rng.nextBoolean()) s"</$tag>" else ""
    def block(depth: Int): String = rng.nextInt(4) match {
      case 0 =>
        s"<p>${inline(2)}${close("p")}"
      case 1 =>
        val t = if (rng.nextBoolean()) "ul" else "ol"
        val items = (0 to rng.nextInt(3)).map { _ =>
          val kids = if (depth > 0 && rng.nextInt(4) == 0) block(depth - 1) else inline(2)
          s"<li>$kids${close("li")}"
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
            s"<$c>$kids${close(c)}"
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
