package graft.sgml

/** Character-entity tables and escaping.
  *
  * Reference: `charent.c` — the HTML named character-entity table
  * (`&nbsp;` → 160, …) [V]; XML predefined entities are per the XML 1.0
  * spec. The name→codepoint data below is the public W3C HTML 4.01
  * entity set (Latin-1, symbol and special blocks) plus a few widely used
  * HTML5 additions.
  */
object Entities {

  /** XML 1.0 predefined entities — always in scope. */
  val xml: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'")

  /** HTML 4.01 Latin-1 block: names for code points 160..255 in order. */
  private val lat1Names: Array[String] = Array(
    "nbsp", "iexcl", "cent", "pound", "curren", "yen", "brvbar", "sect",
    "uml", "copy", "ordf", "laquo", "not", "shy", "reg", "macr",
    "deg", "plusmn", "sup2", "sup3", "acute", "micro", "para", "middot",
    "cedil", "sup1", "ordm", "raquo", "frac14", "frac12", "frac34", "iquest",
    "Agrave", "Aacute", "Acirc", "Atilde", "Auml", "Aring", "AElig", "Ccedil",
    "Egrave", "Eacute", "Ecirc", "Euml", "Igrave", "Iacute", "Icirc", "Iuml",
    "ETH", "Ntilde", "Ograve", "Oacute", "Ocirc", "Otilde", "Ouml", "times",
    "Oslash", "Ugrave", "Uacute", "Ucirc", "Uuml", "Yacute", "THORN", "szlig",
    "agrave", "aacute", "acirc", "atilde", "auml", "aring", "aelig", "ccedil",
    "egrave", "eacute", "ecirc", "euml", "igrave", "iacute", "icirc", "iuml",
    "eth", "ntilde", "ograve", "oacute", "ocirc", "otilde", "ouml", "divide",
    "oslash", "ugrave", "uacute", "ucirc", "uuml", "yacute", "thorn", "yuml")

  private val greekAndSymbols: Map[String, Int] = Map(
    // HTML 4.01 symbol block (Greek letters)
    "Alpha" -> 0x391, "Beta" -> 0x392, "Gamma" -> 0x393, "Delta" -> 0x394,
    "Epsilon" -> 0x395, "Zeta" -> 0x396, "Eta" -> 0x397, "Theta" -> 0x398,
    "Iota" -> 0x399, "Kappa" -> 0x39A, "Lambda" -> 0x39B, "Mu" -> 0x39C,
    "Nu" -> 0x39D, "Xi" -> 0x39E, "Omicron" -> 0x39F, "Pi" -> 0x3A0,
    "Rho" -> 0x3A1, "Sigma" -> 0x3A3, "Tau" -> 0x3A4, "Upsilon" -> 0x3A5,
    "Phi" -> 0x3A6, "Chi" -> 0x3A7, "Psi" -> 0x3A8, "Omega" -> 0x3A9,
    "alpha" -> 0x3B1, "beta" -> 0x3B2, "gamma" -> 0x3B3, "delta" -> 0x3B4,
    "epsilon" -> 0x3B5, "zeta" -> 0x3B6, "eta" -> 0x3B7, "theta" -> 0x3B8,
    "iota" -> 0x3B9, "kappa" -> 0x3BA, "lambda" -> 0x3BB, "mu" -> 0x3BC,
    "nu" -> 0x3BD, "xi" -> 0x3BE, "omicron" -> 0x3BF, "pi" -> 0x3C0,
    "rho" -> 0x3C1, "sigmaf" -> 0x3C2, "sigma" -> 0x3C3, "tau" -> 0x3C4,
    "upsilon" -> 0x3C5, "phi" -> 0x3C6, "chi" -> 0x3C7, "psi" -> 0x3C8,
    "omega" -> 0x3C9, "thetasym" -> 0x3D1, "upsih" -> 0x3D2, "piv" -> 0x3D6,
    // general punctuation / typography
    "bull" -> 0x2022, "hellip" -> 0x2026, "prime" -> 0x2032,
    "Prime" -> 0x2033, "oline" -> 0x203E, "frasl" -> 0x2044,
    // letterlike
    "weierp" -> 0x2118, "image" -> 0x2111, "real" -> 0x211C,
    "trade" -> 0x2122, "alefsym" -> 0x2135,
    // arrows
    "larr" -> 0x2190, "uarr" -> 0x2191, "rarr" -> 0x2192, "darr" -> 0x2193,
    "harr" -> 0x2194, "crarr" -> 0x21B5, "lArr" -> 0x21D0, "uArr" -> 0x21D1,
    "rArr" -> 0x21D2, "dArr" -> 0x21D3, "hArr" -> 0x21D4,
    // mathematical
    "forall" -> 0x2200, "part" -> 0x2202, "exist" -> 0x2203,
    "empty" -> 0x2205, "nabla" -> 0x2207, "isin" -> 0x2208,
    "notin" -> 0x2209, "ni" -> 0x220B, "prod" -> 0x220F, "sum" -> 0x2211,
    "minus" -> 0x2212, "lowast" -> 0x2217, "radic" -> 0x221A,
    "prop" -> 0x221D, "infin" -> 0x221E, "ang" -> 0x2220, "and" -> 0x2227,
    "or" -> 0x2228, "cap" -> 0x2229, "cup" -> 0x222A, "int" -> 0x222B,
    "there4" -> 0x2234, "sim" -> 0x223C, "cong" -> 0x2245, "asymp" -> 0x2248,
    "ne" -> 0x2260, "equiv" -> 0x2261, "le" -> 0x2264, "ge" -> 0x2265,
    "sub" -> 0x2282, "sup" -> 0x2283, "nsub" -> 0x2284, "sube" -> 0x2286,
    "supe" -> 0x2287, "oplus" -> 0x2295, "otimes" -> 0x2297,
    "perp" -> 0x22A5, "sdot" -> 0x22C5,
    // technical / shapes / cards
    "lceil" -> 0x2308, "rceil" -> 0x2309, "lfloor" -> 0x230A,
    "rfloor" -> 0x230B, "lang" -> 0x2329, "rang" -> 0x232A,
    "loz" -> 0x25CA, "spades" -> 0x2660, "clubs" -> 0x2663,
    "hearts" -> 0x2665, "diams" -> 0x2666,
    // HTML 4.01 special block
    "OElig" -> 0x152, "oelig" -> 0x153, "Scaron" -> 0x160,
    "scaron" -> 0x161, "Yuml" -> 0x178, "fnof" -> 0x192, "circ" -> 0x2C6,
    "tilde" -> 0x2DC, "ensp" -> 0x2002, "emsp" -> 0x2003,
    "thinsp" -> 0x2009, "zwnj" -> 0x200C, "zwj" -> 0x200D, "lrm" -> 0x200E,
    "rlm" -> 0x200F, "ndash" -> 0x2013, "mdash" -> 0x2014,
    "lsquo" -> 0x2018, "rsquo" -> 0x2019, "sbquo" -> 0x201A,
    "ldquo" -> 0x201C, "rdquo" -> 0x201D, "bdquo" -> 0x201E,
    "dagger" -> 0x2020, "Dagger" -> 0x2021, "permil" -> 0x2030,
    "lsaquo" -> 0x2039, "rsaquo" -> 0x203A, "euro" -> 0x20AC,
    // common HTML5 additions
    "apos" -> 0x27, "copysr" -> 0x2117, "num" -> 0x23, "dollar" -> 0x24,
    "excl" -> 0x21, "quest" -> 0x3F, "star" -> 0x2606, "check" -> 0x2713)

  /** Full HTML named-entity table (name → replacement text). */
  val html: Map[String, String] = {
    val b = Map.newBuilder[String, String]
    b ++= xml
    var i = 0
    while (i < lat1Names.length) {
      b += lat1Names(i) -> (160 + i).toChar.toString
      i += 1
    }
    greekAndSymbols.foreach { case (n, cp) =>
      b += n -> new String(Character.toChars(cp))
    }
    b.result()
  }

  /** Full WHATWG HTML5 table (2125 names, generated from the public
    * entities.json data — Html5Entities.scala); a strict superset of the
    * HTML 4.01 set plus case-sensitive aliases (`Gt`, `longrightarrow`,
    * `varnothing`, …). Scoped to the html5/xhtml5 dialects so html4
    * keeps its faithful 252-name table. */
  val html5: Map[String, String] = Html5Entities.table ++ xml

  /** Resolve a named entity for a dialect + DTD. Returns the replacement
    * text, or None if undeclared. DTD-declared entities take priority
    * (they are re-tokenized by the caller, per SGML replacement-text
    * semantics); table entities are plain character data. */
  def resolve(name: String, dialect: Dialect, dtd: Dtd): Option[String] =
    dtd.entities.get(name).orElse {
      if (!dialect.htmlEntities) xml.get(name)
      else if (dialect == Dialect.Html5 || dialect == Dialect.Xhtml5) html5.get(name)
      else html.get(name)
    }

  /** Numeric character reference body (after `&#`) → string, or None. */
  def charRef(body: String): Option[String] = {
    if (body.isEmpty) return None
    try {
      val cp =
        if (body.charAt(0) == 'x' || body.charAt(0) == 'X')
          java.lang.Integer.parseInt(body.substring(1), 16)
        else java.lang.Integer.parseInt(body, 10)
      if (cp < 0 || cp > 0x10FFFF || (cp >= 0xD800 && cp <= 0xDFFF)) None
      else Some(new String(Character.toChars(cp)))
    } catch { case _: NumberFormatException => None }
  }

  /** Escape character data for serialization (`xml_quote_cdata/3` [V]). */
  def escapeText(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '>'  => sb.append("&gt;")
        // a literal CR in a text node can only come from `&#13;`; emitted
        // raw it would re-parse as LF (§2.11), so escape it (c14n §2.3)
        case '\r' => sb.append("&#13;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  /** Escape an attribute value (`xml_quote_attribute/3` [V]). */
  def escapeAttr(s: String): String = {
    val sb = new StringBuilder(s.length + 8)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '&'  => sb.append("&amp;")
        case '<'  => sb.append("&lt;")
        case '"'  => sb.append("&quot;")
        case '\n' => sb.append("&#10;")
        case '\t' => sb.append("&#9;")
        case '\r' => sb.append("&#13;")
        case c    => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }
}
