package graft.sgml

/** SGML SHORTREF support (SURVEY.md T14).
  *
  * Reference: `parser.c — shortref handling` and `dtd.h — shortref map
  * structures` [V] (upstream supports `<!SHORTREF>` / `<!USEMAP>`; the
  * checkout being empty, semantics follow ISO 8879's short-reference
  * feature as publicly documented): a SHORTREF map associates delimiter
  * strings with general-entity names; a USEMAP declaration activates a
  * map for the CONTENT of given elements (inherited by containment until
  * overridden; `#EMPTY` deactivates). While a map is active, delimiter
  * occurrences in PCDATA are replaced by a reference to the mapped
  * entity — whose replacement text is re-tokenized, so a map entry like
  * `"&#RE;&#RE;" ptag` with `<!ENTITY ptag "</p><p>">` turns blank lines
  * into paragraph breaks (the classic use).
  *
  * Supported delimiter notation (the subset ISO 8879 uses in its own
  * examples; documented contract of this engine):
  *  - literal characters (quotes, hyphens, `#`, …);
  *  - `B` — a blank sequence: one or more SPACE/TAB (an uppercase `B` in
  *    a shortref string is ALWAYS this token, per the standard);
  *  - `&#RE;` — record end (matches one newline);
  *  - `&#RS;` — record start (zero-width anchor: start of input or
  *    directly after a newline);
  *  - `&#TAB;` / `&#SPACE;` — explicit tab / space.
  *
  * Recognition is longest-match at each position, first-declared entry
  * winning ties; it applies to the assembled PCDATA run — which, per
  * ISO 8879's content-mode rescanning, INCLUDES text contributed by
  * general-entity expansion (so a delimiter may span an entity
  * boundary); it does not apply to CDATA/RCDATA element content, inside
  * a SHORTREF-mapped entity's own expansion (no recursive recognition),
  * or across intervening markup. All of that is evaluated task-locally
  * inside the parse kernel — nothing here touches Spark.
  */
object Shortref {

  /** Token encoding: >= 0 is a literal char; negatives are the special
    * pattern tokens. */
  final val B = -1  // blank run (one or more space/tab)
  final val RS = -2 // zero-width line-start anchor

  final class Rule(val toks: Array[Int], val ent: String) extends Serializable {
    override def toString: String =
      toks.map {
        case B => "B"
        case RS => "&#RS;"
        case c => c.toChar.toString
      }.mkString("\"", "", "\"") + "->" + ent
  }

  /** Compile a delimiter string; None if it cannot match any character
    * (e.g. anchors only — a zero-width rule would loop). */
  def compile(delim: String, ent: String): Option[Rule] = {
    val toks = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    val n = delim.length
    while (i < n) {
      val c = delim.charAt(i)
      if (c == 'B') { toks += B; i += 1 }
      else if (c == '&' && delim.regionMatches(true, i, "&#RS;", 0, 5)) {
        toks += RS; i += 5
      } else if (c == '&' && delim.regionMatches(true, i, "&#RE;", 0, 5)) {
        toks += '\n'.toInt; i += 5
      } else if (c == '&' && delim.regionMatches(true, i, "&#TAB;", 0, 6)) {
        toks += '\t'.toInt; i += 6
      } else if (c == '&' && delim.regionMatches(true, i, "&#SPACE;", 0, 8)) {
        toks += ' '.toInt; i += 8
      } else { toks += c.toInt; i += 1 }
    }
    if (toks.isEmpty || toks.forall(_ == RS)) None
    else Some(new Rule(toks.toArray, ent))
  }

  /** Chars consumed by `r` matching at `s(i0)`; 0 = no match.
    * `lineStart`: whether position i0 is at the start of a line. */
  def matchLen(r: Rule, s: String, i0: Int, lineStart: Boolean): Int = {
    val t = r.toks
    var i = i0
    var k = 0
    while (k < t.length) {
      t(k) match {
        case RS =>
          val ok = if (i == i0) lineStart else s.charAt(i - 1) == '\n'
          if (!ok) return 0
        case B =>
          var m = 0
          while (i < s.length && { val c = s.charAt(i); c == ' ' || c == '\t' }) {
            i += 1; m += 1
          }
          if (m == 0) return 0
        case lit =>
          if (i < s.length && s.charAt(i).toInt == lit) i += 1 else return 0
      }
      k += 1
    }
    i - i0
  }
}
