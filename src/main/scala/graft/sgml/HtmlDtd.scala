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
  * exclusions — plus the HTML 4.01 core attribute lists (enumerated
  * types, literal defaults like `form method get` / `td colspan 1`, and
  * minimizable boolean attrs), so T4 typing and T5 defaulting fire
  * without a per-document DOCTYPE subset. Pragmatic deviation from the
  * strict HTML4 DTD: `img alt` and `script type` are #IMPLIED (not
  * #REQUIRED) — real-web markup omits them constantly and an error per
  * occurrence would drown the recovery budget.
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

<!ENTITY % coreattrs "id ID #IMPLIED class CDATA #IMPLIED style CDATA #IMPLIED title CDATA #IMPLIED lang NAME #IMPLIED dir (ltr|rtl) #IMPLIED">
<!ATTLIST (html | head | body | p | div | span | a | img | ul | ol | li | dl | dt | dd | table | tr | th | td | form | input | select | option | textarea | button | label | h1 | h2 | h3 | h4 | h5 | h6 | pre | blockquote | em | strong | b | i | u | s | code | tt | big | small | cite | q | sub | sup | section | article | nav | aside | header | footer | main | figure | figcaption | details | summary | iframe | script | style | br | hr | area | map | object | caption | thead | tbody | tfoot | colgroup | col | fieldset | legend | address | center) %coreattrs;>
<!ATTLIST a href CDATA #IMPLIED name CDATA #IMPLIED target CDATA #IMPLIED rel CDATA #IMPLIED shape (rect|circle|poly|default) rect coords CDATA #IMPLIED>
<!ATTLIST img src CDATA #REQUIRED alt CDATA #IMPLIED width CDATA #IMPLIED height CDATA #IMPLIED border CDATA #IMPLIED ismap (ismap) #IMPLIED usemap CDATA #IMPLIED>
<!ATTLIST br clear (left|all|right|none) none>
<!ATTLIST form action CDATA #IMPLIED method (get|post) get enctype CDATA "application/x-www-form-urlencoded" name CDATA #IMPLIED>
<!ATTLIST input type (text|password|checkbox|radio|submit|reset|file|hidden|image|button) text name CDATA #IMPLIED value CDATA #IMPLIED checked (checked) #IMPLIED disabled (disabled) #IMPLIED readonly (readonly) #IMPLIED size CDATA #IMPLIED maxlength NUMBER #IMPLIED>
<!ATTLIST button type (button|submit|reset) submit name CDATA #IMPLIED value CDATA #IMPLIED disabled (disabled) #IMPLIED>
<!ATTLIST select name CDATA #IMPLIED size NUMBER #IMPLIED multiple (multiple) #IMPLIED disabled (disabled) #IMPLIED>
<!ATTLIST option selected (selected) #IMPLIED disabled (disabled) #IMPLIED value CDATA #IMPLIED>
<!ATTLIST textarea name CDATA #IMPLIED rows NUMBER #IMPLIED cols NUMBER #IMPLIED disabled (disabled) #IMPLIED readonly (readonly) #IMPLIED>
<!ATTLIST label for IDREF #IMPLIED>
<!ATTLIST table summary CDATA #IMPLIED width CDATA #IMPLIED border CDATA #IMPLIED cellspacing CDATA #IMPLIED cellpadding CDATA #IMPLIED>
<!ATTLIST (th | td) rowspan NUMBER 1 colspan NUMBER 1 abbr CDATA #IMPLIED scope (row|col|rowgroup|colgroup) #IMPLIED align (left|center|right|justify|char) #IMPLIED valign (top|middle|bottom|baseline) #IMPLIED>
<!ATTLIST (colgroup | col) span NUMBER 1 width CDATA #IMPLIED>
<!ATTLIST ol start NUMBER #IMPLIED type CDATA #IMPLIED>
<!ATTLIST li value NUMBER #IMPLIED>
<!ATTLIST script src CDATA #IMPLIED type CDATA #IMPLIED defer (defer) #IMPLIED async (async) #IMPLIED>
<!ATTLIST style type CDATA "text/css" media CDATA #IMPLIED>
<!ATTLIST iframe src CDATA #IMPLIED width CDATA #IMPLIED height CDATA #IMPLIED frameborder CDATA #IMPLIED scrolling (yes|no|auto) auto>
<!ATTLIST area shape (rect|circle|poly|default) rect coords CDATA #IMPLIED href CDATA #IMPLIED alt CDATA #IMPLIED nohref (nohref) #IMPLIED>
<!ATTLIST map name CDATA #IMPLIED>
<!ATTLIST meta name CDATA #IMPLIED content CDATA #IMPLIED http-equiv CDATA #IMPLIED charset CDATA #IMPLIED>
<!ATTLIST link rel CDATA #IMPLIED href CDATA #IMPLIED type CDATA #IMPLIED media CDATA #IMPLIED>
<!ATTLIST base href CDATA #IMPLIED>
"""

  /** Parsed once per JVM — the executor-local DTD cache. */
  lazy val dtd: Dtd = {
    val (d, errs) = DtdParser.parseSubset(text, Dtd.empty, foldCase = true)
    require(errs.isEmpty, s"bundled HTML DTD must parse cleanly: $errs")
    d.copy(doctype = Some("html"))
  }
}
