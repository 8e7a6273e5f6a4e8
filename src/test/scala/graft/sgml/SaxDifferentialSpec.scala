package graft.sgml

import org.scalatest.funsuite.AnyFunSuite
import org.xml.sax.Attributes
import org.xml.sax.helpers.DefaultHandler
import javax.xml.parsers.SAXParserFactory
import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets

/** Differential conformance vs an INDEPENDENT oracle: the JDK's own SAX
  * parser (`javax.xml.parsers`, public platform API). Every other fixture in
  * this suite was authored by the same mind that wrote the parser; this spec
  * breaks that circularity for the well-formed-XML subset of the dialect
  * matrix (reference semantics: `parser.c` XML mode, SURVEY.md §2 [V]).
  *
  * Protocol: generate random well-formed XML documents from a tree grammar
  * (elements, attributes with char/entity refs, text, CDATA, comments, PIs,
  * an internal DTD subset defining general entities), serialize, parse with
  * both engines, and require an identical canonical event string:
  * open tags with name-sorted attributes, merged character data, close tags.
  * Comments and PIs must be invisible to both. Our parser must additionally
  * report zero errors on every generated doc.
  */
class SaxDifferentialSpec extends AnyFunSuite {

  // ---- canonical form ------------------------------------------------
  private final class SaxCanon extends DefaultHandler {
    val out = new StringBuilder
    private val text = new StringBuilder
    private def flush(): Unit =
      if (text.nonEmpty) { out.append("T(").append(text).append(')'); text.clear() }
    override def startElement(uri: String, local: String, qName: String, atts: Attributes): Unit = {
      flush()
      out.append('<').append(qName)
      (0 until atts.getLength)
        .map(i => (atts.getQName(i), atts.getValue(i)))
        .sortBy(_._1)
        .foreach { case (k, v) => out.append(' ').append(k).append('=').append('"').append(v).append('"') }
      out.append('>')
    }
    override def endElement(uri: String, local: String, qName: String): Unit = {
      flush(); out.append("</").append(qName).append('>')
    }
    override def characters(ch: Array[Char], start: Int, len: Int): Unit =
      text.appendAll(ch, start, len)
    def result: String = { flush(); out.toString }
  }

  private def saxCanonical(doc: String): String = {
    val f = SAXParserFactory.newInstance()
    f.setNamespaceAware(false)
    f.setValidating(false)
    val h = new SaxCanon
    f.newSAXParser().parse(
      new ByteArrayInputStream(doc.getBytes(StandardCharsets.UTF_8)), h)
    h.result
  }

  private def ourCanonical(doc: String): (String, Vector[ParseErr]) = {
    val cfg = ParserConfig(dialect = Dialect.Xml, space = SpaceMode.Preserve)
    val r = SgmlParser.parse(doc, cfg)
    val out = new StringBuilder
    val text = new StringBuilder
    def flush(): Unit =
      if (text.nonEmpty) { out.append("T(").append(text).append(')'); text.clear() }
    def walk(ns: Seq[Node]): Unit = ns.foreach {
      case Node.Text(s, _, _) => text.append(s)
      case Node.Elem(n, attrs, kids, _) =>
        flush()
        out.append('<').append(n)
        attrs.sortBy(_.name).foreach { a =>
          out.append(' ').append(a.name).append('=').append('"').append(a.value.render).append('"')
        }
        out.append('>')
        walk(kids)
        flush()
        out.append("</").append(n).append('>')
      case Node.Pi(_, _)       => () // invisible on both sides
      case Node.EntityRef(n, _) => text.append("&UNRESOLVED:").append(n).append(';')
      case Node.Media(_, _)     => ()
    }
    walk(r.content)
    flush()
    (out.toString, r.errors)
  }

  // ---- generator -----------------------------------------------------
  private sealed trait G
  private final case class GElem(name: String, attrs: Seq[(String, String)], kids: Seq[G]) extends G
  private final case class GRaw(markup: String) extends G // well-formed content fragment

  private val names = Vector("a", "b", "item", "doc", "x1", "meta-data", "_u")
  // attribute-value markup (between double quotes): no raw `"` `<` `&`
  private val attrVals = Vector(
    "v", "a&amp;b", "x &#65;", "sp  aces", "tab\tx", "li\nne", "cr\rret",
    "&w;", "é中", "&#x2603;", "", "mix &w; &#66;")
  private val textFrags = Vector(
    "hello world", "a &lt; b &gt; c", "&amp;&apos;&quot;", "&#x2603; snow",
    "&#65;BC", "tabs\tand spaces", "line\nbreak", "]]&gt;", "&w; said &w;",
    "é中☃", "<![CDATA[raw <>& ]] stuff]]>", "<!-- comment -->",
    "<?pi some data?>", "&#x1F600;", "  padded  ")

  private def gen(rng: scala.util.Random, depth: Int): G =
    if (depth <= 0 || rng.nextInt(3) == 0) GRaw(textFrags(rng.nextInt(textFrags.length)))
    else {
      val nAttrs = rng.nextInt(3)
      val attrs = (0 until nAttrs).map { i =>
        (names(rng.nextInt(names.length)) + i, attrVals(rng.nextInt(attrVals.length)))
      }
      val kids = (0 until rng.nextInt(5)).map(_ => gen(rng, depth - 1))
      GElem(names(rng.nextInt(names.length)), attrs, kids)
    }

  private def serialize(g: G, sb: StringBuilder): Unit = g match {
    case GRaw(m) => sb.append(m)
    case GElem(n, attrs, kids) =>
      sb.append('<').append(n)
      attrs.foreach { case (k, v) => sb.append(' ').append(k).append('=').append('"').append(v).append('"') }
      if (kids.isEmpty && attrs.hashCode() % 2 == 0) sb.append("/>")
      else {
        sb.append('>')
        kids.foreach(serialize(_, sb))
        sb.append("</").append(n).append('>')
      }
  }

  private def randomDoc(rng: scala.util.Random): String = {
    val sb = new StringBuilder
    if (rng.nextBoolean()) sb.append("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n")
    sb.append("<!DOCTYPE root [<!ENTITY w \"word\"><!ENTITY wide \"&#x1F600;\">]>\n")
    val root = GElem("root",
      if (rng.nextBoolean()) Seq(("id", attrVals(rng.nextInt(attrVals.length)))) else Nil,
      (0 until 1 + rng.nextInt(6)).map(_ => gen(rng, 4)))
    serialize(root, sb)
    sb.toString
  }

  test("400 random well-formed XML docs: our parse ≡ JDK SAX, zero errors") {
    val rng = new scala.util.Random(20260817)
    var checked = 0
    for (i <- 1 to 400) {
      val doc = randomDoc(rng)
      val expected = saxCanonical(doc)
      val (got, errs) = ourCanonical(doc)
      assert(errs.isEmpty, s"doc #$i produced parse errors: $errs\n--- doc ---\n$doc")
      assert(got == expected,
        s"doc #$i canonical mismatch\n--- doc ---\n$doc\n--- sax ---\n$expected\n--- ours ---\n$got")
      checked += 1
    }
    assert(checked == 400)
  }

  test("fixture-style documents agree with SAX too") {
    val docs = Seq(
      "<!DOCTYPE r [<!ENTITY w \"word\">]>" +
        "<r><p a=\"1\" b=\"2\">x<q/>y</p><!--c--><?t d?><p>&amp;&w;</p></r>",
      "<!DOCTYPE r [<!ENTITY w \"word\">]><r>&w;<![CDATA[<raw>&amp;]]>tail</r>",
      "<r xml:space=\"preserve\">  keep  <i> this </i>  </r>",
      "<r>&#x1F600;&#120;<e at=\"&#9;tab\"/></r>")
    docs.foreach { doc =>
      val expected = saxCanonical(doc)
      val (got, errs) = ourCanonical(doc)
      assert(errs.isEmpty, s"errors on $doc: $errs")
      assert(got == expected, s"mismatch on $doc\nsax:  $expected\nours: $got")
    }
  }

  // ---- namespace mode (D7) vs SAX namespace-aware parsing -------------
  private final class SaxNsCanon extends DefaultHandler {
    val out = new StringBuilder
    private val text = new StringBuilder
    private val XmlNs = "http://www.w3.org/XML/1998/namespace"
    private def nm(uri: String, local: String, qName: String): String =
      if (uri == null || uri.isEmpty) (if (local != null && local.nonEmpty) local else qName)
      else if (uri == XmlNs) "xml:" + local
      else s"{$uri}$local"
    private def flush(): Unit =
      if (text.nonEmpty) { out.append("T(").append(text).append(')'); text.clear() }
    override def startElement(uri: String, local: String, qName: String, atts: Attributes): Unit = {
      flush()
      out.append('<').append(nm(uri, local, qName))
      (0 until atts.getLength)
        .map(i => (nm(atts.getURI(i), atts.getLocalName(i), atts.getQName(i)), atts.getValue(i)))
        .sortBy(_._1)
        .foreach { case (k, v) => out.append(' ').append(k).append('=').append('"').append(v).append('"') }
      out.append('>')
    }
    override def endElement(uri: String, local: String, qName: String): Unit = {
      flush(); out.append("</").append(nm(uri, local, qName)).append('>')
    }
    override def characters(ch: Array[Char], start: Int, len: Int): Unit =
      text.appendAll(ch, start, len)
    def result: String = { flush(); out.toString }
  }

  private def saxCanonicalNs(doc: String): String = {
    val f = SAXParserFactory.newInstance()
    f.setNamespaceAware(true)
    f.setValidating(false)
    val h = new SaxNsCanon
    f.newSAXParser().parse(
      new ByteArrayInputStream(doc.getBytes(StandardCharsets.UTF_8)), h)
    h.result
  }

  private def ourCanonicalNs(doc: String): (String, Vector[ParseErr]) = {
    val cfg = ParserConfig(dialect = Dialect.Xmlns, space = SpaceMode.Preserve)
    val r = SgmlParser.parse(doc, cfg)
    val out = new StringBuilder
    val text = new StringBuilder
    def flush(): Unit =
      if (text.nonEmpty) { out.append("T(").append(text).append(')'); text.clear() }
    def walk(ns: Seq[Node]): Unit = ns.foreach {
      case Node.Text(s, _, _) => text.append(s)
      case Node.Elem(n, attrs, kids, _) =>
        flush()
        out.append('<').append(n)
        attrs
          .filterNot(a => a.name == "xmlns" || a.name.startsWith("xmlns:"))
          .sortBy(_.name)
          .foreach(a => out.append(' ').append(a.name).append('=').append('"').append(a.value.render).append('"'))
        out.append('>')
        walk(kids)
        flush()
        out.append("</").append(n).append('>')
      case _ => ()
    }
    walk(r.content)
    flush()
    (out.toString, r.errors)
  }

  test("namespace mode ≡ SAX namespace-aware: scoping, defaults, overrides, xml:") {
    // our representation: elements (and prefixed attrs) as {uri}local,
    // xmlns declarations retained as plain attrs (filtered above on both
    // sides), unprefixed attrs NOT in the default namespace (per spec)
    val rng = new scala.util.Random(7151623)
    val uris = Vector("urn:a", "urn:b", "http://x.example/ns", "")
    def genNs(depth: Int, declared: Set[String]): String = {
      if (depth <= 0 || rng.nextInt(3) == 0)
        return textFrags(rng.nextInt(5)) // plain text only (entities need a DTD)
      val name = names(rng.nextInt(names.length))
      val declP = rng.nextInt(4) == 0
      val newPrefix = "p" + rng.nextInt(3)
      val decls = new StringBuilder
      var scope = declared
      if (declP) { decls.append(s""" xmlns:$newPrefix="${uris(rng.nextInt(3))}""""); scope += newPrefix }
      if (rng.nextInt(4) == 0) decls.append(s""" xmlns="${uris(rng.nextInt(uris.length))}"""")
      val prefix =
        if (scope.nonEmpty && rng.nextInt(3) == 0) scope.toSeq.sorted(Ordering.String)(rng.nextInt(scope.size)) + ":"
        else ""
      val attrs = new StringBuilder
      if (rng.nextInt(3) == 0) attrs.append(s""" at$depth="v$depth"""")
      if (scope.nonEmpty && rng.nextInt(4) == 0)
        attrs.append(s""" ${scope.head}:qat="qv"""")
      if (rng.nextInt(6) == 0) attrs.append(""" xml:lang="en"""")
      val kids = (0 until rng.nextInt(4)).map(_ => genNs(depth - 1, scope)).mkString
      s"<$prefix$name$decls$attrs>$kids</$prefix$name>"
    }
    for (i <- 1 to 300) {
      val doc = s"""<root xmlns:p0="urn:root0">${genNs(4, Set("p0"))}</root>"""
      val expected = saxCanonicalNs(doc)
      val (got, errs) = ourCanonicalNs(doc)
      assert(errs.isEmpty, s"doc #$i errors: $errs\n$doc")
      assert(got == expected, s"doc #$i ns mismatch\n--- doc ---\n$doc\n--- sax ---\n$expected\n--- ours ---\n$got")
    }
  }

  test("writer round-trip through SAX: serialize(tree) re-parses to the same events") {
    // Independent oracle for W1/W5: our canonical XML writer's output, read
    // back by Xerces, must describe exactly the tree we serialized.
    val rng = new scala.util.Random(424242)
    val attrPool = Vector("v", "a&b", "x<y", "two  sp", "t\tab", "l\nf",
      "c\rr", "q\"uote", "'apos'", "é中", "☃", "")
    val textPool = Vector("plain", "a<b&c>d", "  pad  ", "\n\n", "&lit;amp",
      "\r via charref", "é中☃", "😀", "]]>", "")
    def genNode(depth: Int): Node =
      if (depth <= 0 || rng.nextInt(3) == 0)
        Node.Text(textPool(rng.nextInt(textPool.length)), raw = false, 0)
      else Node.Elem(
        names(rng.nextInt(names.length)),
        (0 until rng.nextInt(3)).toList.map(i =>
          Attr("a" + i, AttrValue.Str(attrPool(rng.nextInt(attrPool.length))))),
        (0 until rng.nextInt(4)).map(_ => genNode(depth - 1)),
        0)
    def canonTree(ns: Seq[Node], out: StringBuilder, text: StringBuilder): Unit = {
      def flush(): Unit =
        if (text.nonEmpty) { out.append("T(").append(text).append(')'); text.clear() }
      ns.foreach {
        case Node.Text(s, _, _) => text.append(s)
        case Node.Elem(n, attrs, kids, _) =>
          flush()
          out.append('<').append(n)
          attrs.sortBy(_.name).foreach(a =>
            out.append(' ').append(a.name).append('=').append('"').append(a.value.render).append('"'))
          out.append('>')
          canonTree(kids, out, text)
          flush()
          out.append("</").append(n).append('>')
        case _ => ()
      }
      flush()
    }
    for (i <- 1 to 200) {
      val root = Node.Elem("root", Nil,
        (0 until 1 + rng.nextInt(4)).map(_ => genNode(3)), 0)
      // drop empty text nodes: they serialize to nothing, so the round
      // trip cannot (and should not) preserve them
      def prune(n: Node): Node = n match {
        case Node.Elem(nm, a, kids, o) =>
          Node.Elem(nm, a, kids.collect {
            case t @ Node.Text(s, _, _) if s.nonEmpty => t
            case e: Node.Elem => prune(e)
          }, o)
        case other => other
      }
      val tree = prune(root)
      val markup = Serializer.xml(Seq(tree), canonical = true)
      val expected = { val o = new StringBuilder; canonTree(Seq(tree), o, new StringBuilder); o.toString }
      val viaSax = saxCanonical(markup)
      assert(viaSax == expected,
        s"round-trip #$i diverged\n--- markup ---\n$markup\n--- tree ---\n$expected\n--- sax ---\n$viaSax")
    }
  }

  test("byte layer ≡ SAX: BOM sniffing and <?xml encoding=…?> on raw bytes") {
    // S2 independently checked: hand both engines the same BYTES and
    // require the same decoded events. Covers UTF-8 (bare + BOM),
    // UTF-16LE/BE with BOM, and a declared single-byte encoding.
    val body = "<r a=\"é\">déjà vu — ☃<i>中文</i>&#x1F600;</r>"
    val cases: Seq[(String, Array[Byte])] = Seq(
      "utf8-bare" -> body.getBytes(StandardCharsets.UTF_8),
      "utf8-bom" -> (Array(0xEF, 0xBB, 0xBF).map(_.toByte) ++ body.getBytes(StandardCharsets.UTF_8)),
      "utf16be-bom" -> ("\uFEFF" + body).getBytes(StandardCharsets.UTF_16BE),
      "utf16le-bom" -> ("\uFEFF" + body).getBytes(StandardCharsets.UTF_16LE),
      "latin1-declared" ->
        ("<?xml version=\"1.0\" encoding=\"ISO-8859-1\"?><r>déjà ±</r>")
          .getBytes(StandardCharsets.ISO_8859_1),
      // r3 declared-encoding breadth: charsets whose byte→char tables
      // DIFFER from Latin-1 on the payload bytes — a decoder that falls
      // back to Latin-1 fails these against SAX
      "iso-8859-2-declared" ->
        ("<?xml version=\"1.0\" encoding=\"ISO-8859-2\"?><r>hőség ťava ľad</r>")
          .getBytes(java.nio.charset.Charset.forName("ISO-8859-2")),
      "windows-1252-declared" ->
        ("<?xml version=\"1.0\" encoding=\"windows-1252\"?><r>€99 — “quoted”</r>")
          .getBytes(java.nio.charset.Charset.forName("windows-1252")))
    cases.foreach { case (label, bytes) =>
      val f = SAXParserFactory.newInstance()
      f.setNamespaceAware(false)
      val h = new SaxCanon
      f.newSAXParser().parse(new ByteArrayInputStream(bytes), h)
      val expected = h.result
      val cfg = ParserConfig(dialect = Dialect.Xml, space = SpaceMode.Preserve)
      val r = SgmlParser.parseBytes(bytes, cfg)
      assert(r.errors.isEmpty, s"[$label] errors: ${r.errors}")
      val out = new StringBuilder; val text = new StringBuilder
      def flush(): Unit = if (text.nonEmpty) { out.append("T(").append(text).append(')'); text.clear() }
      def walk(ns: Seq[Node]): Unit = ns.foreach {
        case Node.Text(s, _, _) => text.append(s)
        case Node.Elem(n, attrs, kids, _) =>
          flush(); out.append('<').append(n)
          attrs.sortBy(_.name).foreach(a =>
            out.append(' ').append(a.name).append('=').append('"').append(a.value.render).append('"'))
          out.append('>'); walk(kids); flush(); out.append("</").append(n).append('>')
        case _ => ()
      }
      walk(r.content); flush()
      assert(out.toString == expected, s"[$label] decode mismatch\nsax:  $expected\nours: ${out.toString}")
    }
  }

  test("XML 1.0 §2.11 line-ending normalization: CRLF and bare CR become LF") {
    val docs = Seq(
      "<r>a\r\nb</r>",
      "<r>a\rb\r</r>",
      "<r>\r\n<i>x</i>\r</r>",
      "<r><![CDATA[a\r\nb\rc]]></r>")
    docs.foreach { doc =>
      val expected = saxCanonical(doc)
      val (got, errs) = ourCanonical(doc)
      assert(errs.isEmpty, s"errors on ${doc.replace("\r", "\\r")}: $errs")
      assert(got == expected,
        s"mismatch on ${doc.replace("\r", "\\r")}\nsax:  ${expected.replace("\r", "\\r").replace("\n", "\\n")}\nours: ${got.replace("\r", "\\r").replace("\n", "\\n")}")
    }
  }
}
