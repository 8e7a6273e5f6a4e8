package graft.sgml

/** OASIS-catalog-style PUBLIC/SYSTEM/DOCTYPE id → DTD resolution.
  *
  * Reference: `catalog.c — register_catalog_file, find_in_catalogue` [V].
  * In this engine the catalog is a driver-side map over *bundled* DTDs
  * only — a distributed job must never do per-row file I/O for schema
  * lookup (SURVEY.md S3: broadcast a small map instead).
  */
object Catalog {

  /** Match a `<!DOCTYPE name PUBLIC/SYSTEM …>` external id to a bundled
    * DTD. `rest` is the declaration text after the root name. */
  def resolveDoctype(rootName: String, rest: String, dialect: Dialect): Option[Dtd] = {
    val root = rootName.toLowerCase
    val up = rest.toUpperCase
    val isHtmlPublic =
      up.contains("//DTD HTML") || up.contains("//DTD XHTML") ||
      up.contains("HTML.DTD") || up.contains("HTML4")
    if (root == "html" && (isHtmlPublic || !rest.contains("["))) Some(HtmlDtd.dtd)
    else if (root == "html") Some(HtmlDtd.dtd)
    else None
  }
}
