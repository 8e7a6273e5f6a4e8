package graft.sgml

/** PWP — template/query engine over the task-local DOM (SURVEY.md §2.5).
  *
  * Reference: `pwp.pl — pwp_xml/3 and attribute interpreter` [V]
  * (Prolog Well-formed Pages: a DOM walk driven by attributes in the
  * `pwp:` namespace). The reference binds `pwp:ask` to a Prolog goal,
  * replicating the element once per solution; this engine re-expresses
  * that relationally — the documented dialect accepted here:
  *
  *  - `pwp:ask="rel"`   — `rel` names a row-set binding (array-of-struct
  *    column on the Spark side): the element is replicated once per row,
  *    with the row's fields bound (shadowing outer bindings) — the
  *    correlated-lateral-join reading of goal solutions.
  *  - `pwp:use="expr"`  — the element's content is replaced by `expr`
  *    after `$name` substitution.
  *  - `pwp:how="text|xml"` — how `pwp:use` is inserted: escaped text
  *    (default) or parsed markup spliced in.
  *  - `pwp:tag="name"` / `pwp:tag="-"` — rename the element, or drop the
  *    wrapper and splice its processed children.
  *  - `$name` tokens in ATTRIBUTE values (and in `pwp:use`) are
  *    substituted from the bindings; text content is left untouched.
  *    Unknown `$name` stays literal.
  *
  * Everything runs task-locally over [[Node]] trees; the Spark surface
  * (per-row rendering with columns as bindings) lives in
  * `graft.ops.PwpOps`.
  */
object Pwp {

  sealed trait Val
  final case class Scalar(s: String) extends Val
  final case class Rows(rows: Seq[Map[String, Val]]) extends Val

  type Bindings = Map[String, Val]

  private val xmlCfg = ParserConfig(dialect = Dialect.Xml, space = SpaceMode.Preserve)

  /** Parse a template once (reuse the result across rows in a partition). */
  def parseTemplate(template: String, cfg: ParserConfig = xmlCfg): IndexedSeq[Node] =
    SgmlParser.parse(template, cfg).content

  /** One-shot: parse, process, serialize canonically. */
  def renderXml(template: String, b: Bindings, cfg: ParserConfig = xmlCfg): String =
    render(parseTemplate(template, cfg), b)

  /** Process a parsed template against bindings and serialize. */
  def render(content: IndexedSeq[Node], b: Bindings): String =
    Serializer.xml(content.flatMap(process(_, b)), canonical = true)

  /** The pwp_xml/3 walk: DomIn × Bindings → DomOut (0..n nodes). */
  def process(n: Node, b: Bindings): Seq[Node] = n match {
    case e: Node.Elem =>
      attrOf(e, "pwp:ask") match {
        case Some(rel) => b.get(rel) match {
          case Some(Rows(rows)) => rows.flatMap(row => processOne(e, b ++ row))
          case Some(Scalar(_))  => processOne(e, b) // scalar: one solution
          case None             => Nil              // no solutions: element vanishes
        }
        case None => processOne(e, b)
      }
    case other => Seq(other) // text/pi/entity/media pass through untouched
  }

  private def processOne(e: Node.Elem, b: Bindings): Seq[Node] = {
    val keptAttrs = e.attrs
      .filterNot(_.name.startsWith("pwp:"))
      .map(a => Attr(a.name, AttrValue.Str(subst(a.value.render, b))))
    val children: IndexedSeq[Node] = attrOf(e, "pwp:use") match {
      case Some(expr0) =>
        val v = subst(expr0, b)
        attrOf(e, "pwp:how").getOrElse("text") match {
          case "xml" => SgmlParser.parse(v, xmlCfg).content
          case _     => Vector(Node.Text(v, raw = false, e.off))
        }
      case None =>
        e.children.flatMap(process(_, b)).toIndexedSeq
    }
    attrOf(e, "pwp:tag") match {
      case Some("-")  => children
      case Some(name) => Vector(Node.Elem(name, keptAttrs, children, e.off))
      case None       => Vector(Node.Elem(e.name, keptAttrs, children, e.off))
    }
  }

  private def attrOf(e: Node.Elem, name: String): Option[String] =
    e.attrs.collectFirst { case Attr(`name`, v) => v.render }

  /** Replace `$name` tokens from scalar bindings; unknown names stay
    * literal, `$$` escapes a dollar. */
  def subst(s: String, b: Bindings): String = {
    if (s.indexOf('$') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '$' && i + 1 < s.length && s.charAt(i + 1) == '$') {
        sb.append('$'); i += 2
      } else if (c == '$' && i + 1 < s.length && isNameStart(s.charAt(i + 1))) {
        var k = i + 1
        while (k < s.length && isNameChar(s.charAt(k))) k += 1
        val name = s.substring(i + 1, k)
        b.get(name) match {
          case Some(Scalar(v)) => sb.append(v)
          case _               => sb.append(s, i, k) // unknown / row-set: literal
        }
        i = k
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  private def isNameStart(c: Char): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_'
  private def isNameChar(c: Char): Boolean =
    isNameStart(c) || (c >= '0' && c <= '9')
}
