package graft.sgml

/** Bundled pragmatic HTML DTD.
  *
  * Reference ships `DTD/HTML4.dtd` and auto-loads it for html dialects
  * (`sgml.pl — dtd/2` cached per doctype [V]). This is a from-scratch
  * pragmatic equivalent written in DTD syntax from the public HTML 4.01
  * spec structure, extended with common HTML5 elements; it is parsed by
  * [[DtdParser]] exactly once per JVM (lazy val) — the per-executor cache
  * that mirrors the reference's DTD cache, and what a Spark broadcast of
  * the `Dtd` value would contain.
  *
  * Only structure that matters for span extraction is declared: content
  * models (for omitted-tag inference), omission flags, EMPTY elements,
  * CDATA/RCDATA content (script/style/textarea/title), inclusions/
  * exclusions. Attribute lists are left to per-document DOCTYPE subsets.
  */
object HtmlDtd {

  private val text: String = """
<!ENTITY % special "a | img | object | map | q | sub | sup | span | bdo | iframe | br | wbr | embed | audio | video | picture | canvas | svg | mark | time | ruby | ins | del | nobr">
<!ENTITY % fontstyle "tt | i | b | u | s | strike | big | small | font">
<!ENTITY % phrase "em | strong | dfn | code | samp | kbd | var | cite | abbr | acronym">
<!ENTITY % formctrl "input | select | textarea | label | button | output | progress | meter | datalist">
<!ENTITY % inline "#PCDATA | %special; | %fontstyle; | %phrase; | %formctrl; | script | template">
<!ENTITY % heading "h1 | h2 | h3 | h4 | h5 | h6">
<!ENTITY % lists "ul | ol | dl | menu | dir">
<!ENTITY % blocktext "pre | hr | blockquote | address | center">
<!ENTITY % block "p | %heading; | %lists; | %blocktext; | div | noscript | noframes | fieldset | form | table | article | section | nav | aside | header | footer | main | figure | details | dialog | blockquote">
<!ENTITY % flow "%block; | %inline;">

<!ELEMENT html O O (head, body)>
<!ELEMENT head O O (title | base | meta | link | style | script | noscript | object | template)*>
<!ELEMENT title - - (#PCDATA)>
<!ELEMENT (base | meta | link) - O EMPTY>
<!ELEMENT style - - CDATA>
<!ELEMENT script - - CDATA>
<!ELEMENT noscript - - (%flow;)*>
<!ELEMENT noframes - - (%flow;)*>
<!ELEMENT template - - (%flow;)*>
<!ELEMENT body O O (%flow;)* +(ins | del)>

<!ELEMENT p - O (%inline;)*>
<!ELEMENT (%heading;) - - (%inline;)*>
<!ELEMENT (ul | ol | menu | dir) - - (li)+>
<!ELEMENT li - O (%flow;)*>
<!ELEMENT dl - - (dt | dd)+>
<!ELEMENT dt - O (%inline;)*>
<!ELEMENT dd - O (%flow;)*>
<!ELEMENT (div | address | center | article | section | nav | aside | header | footer | main | figure | details | dialog) - - (%flow;)*>
<!ELEMENT figcaption - - (%flow;)*>
<!ELEMENT summary - - (%inline;)*>
<!ELEMENT pre - - (%inline;)* -(img | object | big | small | sub | sup)>
<!ELEMENT blockquote - - (%flow;)*>
<!ELEMENT (ins | del) - - (%flow;)*>
<!ELEMENT hr - O EMPTY>

<!ELEMENT a - - (%inline;)* -(a)>
<!ELEMENT (%fontstyle; | %phrase; | span | bdo | mark | time | ruby | nobr) - - (%inline;)*>
<!ELEMENT (sub | sup | q) - - (%inline;)*>
<!ELEMENT (br | wbr) - O EMPTY>
<!ELEMENT (img | embed | source | track | area | param | col | input | basefont | isindex | frame) - O EMPTY>
<!ELEMENT object - - (param | %flow;)*>
<!ELEMENT (audio | video) - - (source | track | %flow;)*>
<!ELEMENT picture - - (source | img | %flow;)*>
<!ELEMENT canvas - - (%flow;)*>
<!ELEMENT svg - - ANY>
<!ELEMENT map - - ((%block;) | area)+>
<!ELEMENT iframe - - (%flow;)*>

<!ELEMENT table - - (caption?, (col* | colgroup*), thead?, tfoot?, tbody+)>
<!ELEMENT caption - - (%inline;)*>
<!ELEMENT thead - O (tr)+>
<!ELEMENT tfoot - O (tr)+>
<!ELEMENT tbody O O (tr)+>
<!ELEMENT colgroup - O (col)*>
<!ELEMENT tr - O (th | td)+>
<!ELEMENT (th | td) - O (%flow;)*>

<!ELEMENT form - - (%flow;)* -(form)>
<!ELEMENT label - - (%inline;)* -(label)>
<!ELEMENT fieldset - - (legend | %flow;)*>
<!ELEMENT legend - - (%inline;)*>
<!ELEMENT button - - (%flow;)* -(a | %formctrl; | form | fieldset)>
<!ELEMENT select - - (optgroup | option)+>
<!ELEMENT optgroup - - (option)+>
<!ELEMENT option - O (#PCDATA)>
<!ELEMENT textarea - - RCDATA>
<!ELEMENT (output | progress | meter) - - (%inline;)*>
<!ELEMENT datalist - - (option | %inline;)*>
<!ELEMENT (xmp | listing | plaintext) - - CDATA>
<!ELEMENT frameset - - (frameset | frame | noframes)+>
"""

  /** Parsed once per JVM — the executor-local DTD cache. */
  lazy val dtd: Dtd = {
    val (d, errs) = DtdParser.parseSubset(text, Dtd.empty, foldCase = true)
    require(errs.isEmpty, s"bundled HTML DTD must parse cleanly: $errs")
    d.copy(doctype = Some("html"))
  }
}
