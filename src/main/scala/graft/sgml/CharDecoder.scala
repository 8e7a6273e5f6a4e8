package graft.sgml

import java.nio.charset.{Charset, StandardCharsets}

/** Byte-stream → char-stream decoding with encoding sniffing.
  *
  * Reference: `utf8.c — utf8_get_char`; `parser.c — XML-declaration
  * handling` (BOM for UTF-8/UTF-16, `<?xml encoding=…?>`, SGML Latin-1
  * default, XML UTF-8 default) [V]. Used by the raw-ingestion path
  * (`binaryFile` source); parquet `string` columns are already decoded.
  */
object CharDecoder {

  final case class Decoded(text: String, charset: String, bomBytes: Int)

  def decode(bytes: Array[Byte], dialect: Dialect): Decoded = {
    // 1. BOM sniff
    if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xEF &&
        (bytes(1) & 0xFF) == 0xBB && (bytes(2) & 0xFF) == 0xBF)
      return Decoded(new String(bytes, 3, bytes.length - 3, StandardCharsets.UTF_8), "UTF-8", 3)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFE && (bytes(1) & 0xFF) == 0xFF)
      return Decoded(new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16BE), "UTF-16BE", 2)
    if (bytes.length >= 2 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xFE)
      return Decoded(new String(bytes, 2, bytes.length - 2, StandardCharsets.UTF_16LE), "UTF-16LE", 2)

    // 2. declared-encoding sniff on the ASCII-compatible prefix:
    //    `<?xml … encoding="…"?>`, else (HTML/SGML) `<meta charset=…>` /
    //    `<meta http-equiv="Content-Type" content="…; charset=…">` within
    //    the first 1024 bytes (the WHATWG prescan window). Any name
    //    java.nio.charset knows resolves (windows-1252, ISO-8859-x, Shift_JIS,
    //    KOI8-R, …) — an unknown name falls through to the dialect default
    //    rather than erroring (parse errors are rows, never task failures).
    val probeLen = math.min(bytes.length, 1024)
    val probe = new String(bytes, 0, probeLen, StandardCharsets.ISO_8859_1)
    val enc = sniffXmlDeclEncoding(probe)
      .orElse(if (dialect.xmlSyntax) None else sniffMetaCharset(probe))
    val cs = enc.flatMap { e =>
      try Some(Charset.forName(e)) catch { case _: Exception => None }
    }.getOrElse {
      // 3. dialect default: XML → UTF-8, SGML/HTML → Latin-1
      if (dialect.xmlSyntax) StandardCharsets.UTF_8 else StandardCharsets.ISO_8859_1
    }
    Decoded(new String(bytes, cs), cs.name(), 0)
  }

  /** HTML meta-charset prescan (simplified WHATWG algorithm): the first
    * `charset = <name>` attribute/parameter inside a `<meta …>` tag,
    * quoted or bare, case-insensitive — covers both the HTML5 shorthand
    * and the http-equiv Content-Type form. The `charset` token must be
    * preceded by whitespace, a quote, or `;` (the Content-Type parameter
    * separator), so incidental text like `content="…nocharset=x…"`
    * cannot match mid-word. */
  private val MetaCharsetRe =
    "(?is)<meta[^>]*?[\\s\"';]charset\\s*=\\s*[\"']?\\s*([A-Za-z0-9][A-Za-z0-9._-]*)".r

  private[sgml] def sniffMetaCharset(probe: String): Option[String] =
    MetaCharsetRe.findFirstMatchIn(probe).map(_.group(1)).map(normalizeMetaCharset)

  /** WHATWG prescan rule: the prescan only works on ASCII-compatible
    * bytes, so a document whose prescan FOUND `charset=utf-16*` cannot
    * actually be UTF-16 (a real UTF-16 stream is caught earlier by the
    * BOM sniff) — the spec says to treat the declared value as UTF-8. */
  private[sgml] def normalizeMetaCharset(name: String): String =
    name.toLowerCase match {
      case "utf-16" | "utf-16le" | "utf-16be" | "utf16" => "UTF-8"
      case _ => name
    }

  private[sgml] def sniffXmlDeclEncoding(probe: String): Option[String] = {
    if (!probe.startsWith("<?xml")) return None
    val end = probe.indexOf("?>")
    val decl = if (end > 0) probe.substring(0, end) else probe
    val i = decl.indexOf("encoding")
    if (i < 0) return None
    var j = i + 8
    while (j < decl.length && (decl.charAt(j) == '=' || decl.charAt(j).isWhitespace)) j += 1
    if (j >= decl.length) return None
    val q = decl.charAt(j)
    if (q != '"' && q != '\'') return None
    val k = decl.indexOf(q, j + 1)
    if (k < 0) None else Some(decl.substring(j + 1, k))
  }
}
