package graft.sgml

/** Main-content extraction: deterministic boilerplate strip over the
  * task-local DOM (north-star "HTML boilerplate strip"; SURVEY.md §7
  * risk 4 — a SEPARATE optional stage, OFF for reference conformance,
  * because the reference parser has no boilerplate notion).
  *
  * Two classic, fully deterministic heuristics (public knowledge —
  * tag-semantics + link-density a la the boilerplate-detection
  * literature; no ML, no randomness):
  *
  *  1. tag blacklist — chrome/meta subtrees never carry main content:
  *     head, script, style, nav, header, footer, aside, noscript, form,
  *     button, select, template, menu, iframe;
  *  2. link-density — a container whose visible text is mostly inside
  *     anchors (≥ `linkDensity`, default 0.5) with at least `minChars`
  *     link-ish characters is navigation/related-links chrome, dropped
  *     whole. Computed bottom-up in one pass, O(tree).
  *
  * Runs inside the same narrow parse stage (no extra shuffle); enabling
  * it only changes which spans are emitted.
  */
object Boilerplate {

  val blacklist: Set[String] = Set(
    "head", "script", "style", "nav", "header", "footer", "aside",
    "noscript", "form", "button", "select", "template", "menu", "iframe")

  final case class Cfg(linkDensity: Double = 0.5, minChars: Int = 20)

  /** Strip boilerplate subtrees; document order otherwise preserved. */
  def strip(content: IndexedSeq[Node], cfg: Cfg = Cfg()): IndexedSeq[Node] = {
    content.flatMap(keep(_, cfg))
  }

  /** Bottom-up: strip children first, then judge the element on its
    * SURVIVING content — otherwise a `body` holding both chrome and the
    * article would count the chrome's links against itself. */
  private def keep(n: Node, cfg: Cfg): Option[Node] = n match {
    case e: Node.Elem =>
      val local = localOf(e.name)
      if (blacklist.contains(local)) None
      else {
        val kids = e.children.flatMap(keep(_, cfg))
        val pruned = e.copy(children = kids)
        val (total, linked) = textStats(pruned, insideA = local == "a")
        if (local != "a" && total >= cfg.minChars &&
            linked.toDouble / total >= cfg.linkDensity) None
        else Some(pruned)
      }
    case other => Some(other)
  }

  /** (total text chars, text chars inside <a> subtrees), one pass. */
  private def textStats(n: Node, insideA: Boolean): (Int, Int) = n match {
    case Node.Text(s, _, _) => (s.length, if (insideA) s.length else 0)
    case e: Node.Elem =>
      val inA = insideA || localOf(e.name) == "a"
      var t = 0; var l = 0
      e.children.foreach { c =>
        val (ct, cl) = textStats(c, inA)
        t += ct; l += cl
      }
      (t, l)
    case _ => (0, 0)
  }

  private def localOf(name: String): String = {
    val j = name.indexOf('}')
    if (name.startsWith("{") && j > 0) name.substring(j + 1) else name
  }
}
