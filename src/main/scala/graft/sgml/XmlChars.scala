package graft.sgml

/** Exact XML 1.0 (5th ed.) name-character classification — the analogue
  * of the reference's generated `xml_unicode.c` binary-search tables [V].
  * Productions [4] NameStartChar / [4a] NameChar, encoded as sorted
  * char-range tables with an ASCII fast path and binary search above.
  *
  * Operates on UTF-16 units (the tokenizer is char-at-a-time):
  * supplementary name chars #x10000–#xEFFFF arrive as surrogate pairs, so
  * high surrogates D800–DB7F (planes 1–14, all name chars) and low
  * surrogates DC00–DFFF are accepted; DB80–DBFF (→ #xF0000+, excluded by
  * the production) are rejected. This matches the code-point table
  * exactly for every well-formed pair.
  */
object XmlChars {

  // NameStartChar: ":" | [A-Z] | "_" | [a-z] | [#xC0-#xD6] | [#xD8-#xF6]
  // | [#xF8-#x2FF] | [#x370-#x37D] | [#x37F-#x1FFF] | [#x200C-#x200D]
  // | [#x2070-#x218F] | [#x2C00-#x2FEF] | [#x3001-#xD7FF]
  // | [#xF900-#xFDCF] | [#xFDF0-#xFFFD] | (surrogates per scaladoc)
  private val nameStart: Array[Int] = Array(
    0x3A, 0x3A, 0x41, 0x5A, 0x5F, 0x5F, 0x61, 0x7A,
    0xC0, 0xD6, 0xD8, 0xF6, 0xF8, 0x2FF, 0x370, 0x37D,
    0x37F, 0x1FFF, 0x200C, 0x200D, 0x2070, 0x218F, 0x2C00, 0x2FEF,
    0x3001, 0xD7FF, 0xD800, 0xDB7F, 0xDC00, 0xDFFF, 0xF900, 0xFDCF,
    0xFDF0, 0xFFFD)

  // NameChar: NameStartChar | "-" | "." | [0-9] | #xB7 | [#x300-#x36F]
  // | [#x203F-#x2040]  (adjacent ranges pre-merged: F8-2FF+300-36F+370-37D
  // → F8-37D; 30-39 + 3A → 30-3A)
  private val nameChar: Array[Int] = Array(
    0x2D, 0x2E, 0x30, 0x3A, 0x41, 0x5A, 0x5F, 0x5F, 0x61, 0x7A,
    0xB7, 0xB7, 0xC0, 0xD6, 0xD8, 0xF6, 0xF8, 0x37D,
    0x37F, 0x1FFF, 0x200C, 0x200D, 0x203F, 0x2040, 0x2070, 0x218F,
    0x2C00, 0x2FEF, 0x3001, 0xD7FF, 0xD800, 0xDB7F, 0xDC00, 0xDFFF,
    0xF900, 0xFDCF, 0xFDF0, 0xFFFD)

  /** Binary search over (lo, hi) pairs flattened into one array. */
  private def in(ranges: Array[Int], c: Char): Boolean = {
    var lo = 0
    var hi = ranges.length / 2 - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (c < ranges(2 * mid)) hi = mid - 1
      else if (c > ranges(2 * mid + 1)) lo = mid + 1
      else return true
    }
    false
  }

  def isNameStart(c: Char): Boolean =
    if (c < 0x80)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') || c == '_' || c == ':'
    else in(nameStart, c)

  def isNameChar(c: Char): Boolean =
    if (c < 0x80)
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
      (c >= '0' && c <= '9') || c == '_' || c == ':' || c == '-' || c == '.'
    else in(nameChar, c)
}
