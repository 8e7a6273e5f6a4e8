package graft.pdf

import org.scalatest.funsuite.AnyFunSuite

/** PDF parse + write round-trip (north rule "PDF/layout parse"). */
class PdfSpec extends AnyFunSuite {

  private def roundtrip(text: String, compress: Boolean = true): Pdf.TextResult =
    Pdf.extractText(PdfWriter.singlePage(text, compress))

  test("round-trip: ASCII text, compressed and raw streams") {
    for (compress <- Seq(true, false)) {
      val r = roundtrip("Hello PDF world.\nSecond line.", compress)
      assert(r.text == "Hello PDF world.\nSecond line.")
      assert(r.nPages == 1)
      assert(r.errors.isEmpty)
    }
  }

  test("round-trip: escapes, parens, backslash, control chars, Latin-1") {
    val s = "a(b)c\\d\te\rf café ÿ"
    assert(roundtrip(s).text == s)
  }

  test("round-trip: wide unicode via UTF-16BE hex strings") {
    val s = "中文 текст ☃\nsecond 页"
    assert(roundtrip(s).text == s)
  }

  test("round-trip: empty text and trailing newlines") {
    assert(roundtrip("").text == "")
    assert(roundtrip("a\n").text == "a\n")
    assert(roundtrip("\n\n").text == "\n\n")
  }

  test("multi-page document: pages in Kids order, joined with newline") {
    val bytes = PdfWriter.document(Seq("page one", "page two", "page three"))
    val r = Pdf.extractText(bytes)
    assert(r.nPages == 3)
    assert(r.text == "page one\npage two\npage three")
  }

  test("ToUnicode CMap: embedded-font codes decode through bfchar/bfrange") {
    // "fghi" = sequential bfrange (len 4), "XY" = array-form bfrange
    // (len 2), the rest singleton bfchars (incl. a non-Latin-1 arrow)
    val text = "Héllo ⟶ fghi XY!"
    for (compress <- Seq(true, false)) {
      val r = Pdf.extractText(PdfWriter.cmapPage(text, compress))
      assert(r.text == text, s"compress=$compress")
      assert(r.nPages == 1 && r.errors.isEmpty)
    }
    // all three entry forms were actually generated for this text
    val raw = new String(
      Pdf.parse(PdfWriter.cmapPage(text, compress = false)).objects.values
        .collectFirst { case s: Pdf.PStream
          if !s.dict.m.contains("Type") && new String(s.raw, "ISO-8859-1").contains("begincmap") => s.raw }
        .get, "ISO-8859-1")
    assert(raw.contains("beginbfchar") && raw.contains("beginbfrange"))
    assert(raw.contains("[<0058> <0059>]")) // the XY array-form range
    // 1-byte codespace CMaps decode too, with Latin-1 fallback for
    // unmapped codes (mojibake stays visible, not silently dropped)
    val one = Pdf.parseCMap(
      ("begincodespacerange <00> <FF> endcodespacerange\n" +
        "2 beginbfchar <41> <0042> <42> <0041> endbfchar").getBytes("ISO-8859-1"))
    assert(one.codeBytes == 1)
    assert(one.decode("ABC".getBytes("ISO-8859-1")) == "BAC")
    // property: arbitrary BMP text round-trips through the CMap path
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 30) {
      val n = 1 + rng.nextInt(60)
      val s = new String((0 until n).map { _ =>
        rng.nextInt(3) match {
          case 0 => ('a' + rng.nextInt(26)).toChar
          case 1 => (0xA0 + rng.nextInt(0x500)).toChar
          case _ => (0x2190 + rng.nextInt(0x400)).toChar
        }
      }.toArray)
      assert(Pdf.extractText(PdfWriter.cmapPage(s)).text == s)
    }
  }

  test("simple-font /Encoding /Differences: uniXXXX and AGL names decode") {
    // uniXXXX glyph names (what subset-font writers emit)
    val text = "Héllo ⟶ café — €9 «x»"
    for (compress <- Seq(true, false)) {
      val r = Pdf.extractText(PdfWriter.diffPage(text, compress = compress))
      assert(r.text == text, s"compress=$compress")
      assert(r.nPages == 1 && r.errors.isEmpty)
    }
    // classic AGL names through the same table
    val agl = Map('é' -> "eacute", '€' -> "Euro", '—' -> "emdash",
      'ß' -> "germandbls", 'ﬁ' -> "fi")
    val text2 = "études — ﬁn €5 ß"
    assert(Pdf.extractText(PdfWriter.diffPage(text2, agl)).text == text2)
    // unknown glyph name decodes to U+FFFD — visible, not silent
    val enc = Pdf.parseDifferences(
      Vector(Pdf.PNum(128), Pdf.PName("notaglyphname")), "WinAnsiEncoding")
    assert(enc.decode(Array(128.toByte, 'a'.toByte)) == "�a")
    // WinAnsi base: 0x80 is € in windows-1252 when NOT overridden
    val base = Pdf.parseDifferences(Vector(Pdf.PNum(129), Pdf.PName("uni2713")),
      "WinAnsiEncoding")
    assert(base.decode(Array(0x80.toByte, 0x81.toByte)) == "€✓")
    // glyph name resolution unit checks
    assert(Pdf.glyphToUnicode("uni27F6") == Some("⟶"))
    assert(Pdf.glyphToUnicode("u1F600") == Some(new String(Character.toChars(0x1F600))))
    assert(Pdf.glyphToUnicode("odieresis") == Some("ö"))
    assert(Pdf.glyphToUnicode("bogusname") == None)
  }

  test("truncated CMap/Differences PDFs never throw: errors are data") {
    val cm = PdfWriter.cmapPage("Héllo ⟶ fghi XY!", compress = false)
    val df = PdfWriter.diffPage("études — €5", compress = false)
    for (pdf <- Seq(cm, df); n <- 0 to pdf.length by 37) {
      val r = Pdf.extractText(pdf.take(n)) // must not throw, whatever survives
      assert(r.nPages >= 0 && r.text != null)
    }
  }

  test("property: random unicode round-trips exactly") {
    val rng = new scala.util.Random(11)
    for (_ <- 1 to 100) {
      val n = rng.nextInt(200)
      val s = new String((0 until n).map { _ =>
        rng.nextInt(5) match {
          case 0 => ('a' + rng.nextInt(26)).toChar
          case 1 => "()\\\n\t 0123456789".charAt(rng.nextInt(14))
          case 2 => (0xA0 + rng.nextInt(0x5F)).toChar  // Latin-1 high
          case 3 => (0x4E00 + rng.nextInt(0x100)).toChar // CJK
          case _ => ' '
        }
      }.toArray)
      assert(roundtrip(s).text == s, s"failed for ${s.take(40)}…")
    }
  }

  test("TJ arrays, quote operators and Tm line breaks extract in order") {
    // hand-written content stream exercising operators the writer skips
    val content = "BT /F1 9 Tf 10 700 Td [(a) -120 (b)] TJ (next) ' " +
      "1 0 0 1 10 650 Tm (moved) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n" +
      "trailer << /Size 5 /Root 1 0 R >>").getBytes("ISO-8859-1")
    val r = Pdf.extractText(pdf)
    assert(r.text == "ab\nnext\nmoved")
  }

  test("hex strings decode, odd digit counts pad with zero") {
    val lx = new Pdf.Lexer("<48656C6C6F> <5>".getBytes("ISO-8859-1"))
    val Pdf.TStr(a) = lx.token(): @unchecked
    assert(new String(a, "ISO-8859-1") == "Hello")
    val Pdf.TStr(b) = lx.token(): @unchecked
    assert(b.toSeq == Seq(0x50.toByte))
  }

  test("broken page tree falls back to object-order /Type /Page scan") {
    val content = "BT (still here) Tj ET"
    val pdf = ("%PDF-1.4\n" + // no catalog, no trailer /Root
      "3 0 obj << /Type /Page /Contents 4 0 R >> endobj\n" +
      s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
      .getBytes("ISO-8859-1")
    val r = Pdf.extractText(pdf)
    assert(r.text == "still here")
    assert(r.nPages == 1)
  }

  test("written files end with the %%EOF marker (not %%%%EOF)") {
    val bytes = PdfWriter.singlePage("x")
    val tail = new String(bytes.takeRight(16), "ISO-8859-1")
    assert(tail.endsWith("%%EOF\n"), tail)
    assert(!tail.contains("%%%%"), tail)
  }

  test("malformed numbers and bad name escapes degrade, never throw") {
    // `1.2.3` used to escape the lexer as NumberFormatException
    val junk = "1 0 obj << /V 1.2.3 /N#4Z 5 >> endobj".getBytes("ISO-8859-1")
    assert(Pdf.extractText(junk) != null)
    val lx = new Pdf.Lexer("1.2.3 /A#4Z /B#41".getBytes("ISO-8859-1"))
    assert(lx.token().isInstanceOf[Pdf.TErr])
    val Pdf.TName(n1) = lx.token(): @unchecked
    assert(n1 == "A#4Z") // invalid second digit: literal '#' kept
    val Pdf.TName(n2) = lx.token(): @unchecked
    assert(n2 == "BA") // valid escape #41 = 'A'
  }

  test("garbage and truncated input never throw, errors are data") {
    val rng = new scala.util.Random(7)
    for (_ <- 1 to 100) {
      val junk = Array.fill(rng.nextInt(400))(rng.nextInt(256).toByte)
      val r = Pdf.extractText(junk)
      assert(r != null)
    }
    // truncation of a valid doc at every 37th byte
    val ok = PdfWriter.singlePage("truncate me\nplease")
    var i = 1
    while (i < ok.length) {
      assert(Pdf.extractText(ok.take(i)) != null)
      i += 37
    }
  }

  test("PDF 1.5 compressed object streams (/ObjStm) resolve members") {
    // page + catalog + pages dicts live INSIDE a Flate object stream;
    // only the content stream is a top-level object
    val content = "BT (from objstm) Tj ET"
    val members = "<< /Type /Catalog /Pages 2 0 R >> " +
      "<< /Type /Pages /Kids [3 0 R] /Count 1 >> " +
      "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val off2 = members.indexOf("<< /Type /Pages")
    val off3 = members.indexOf("<< /Type /Page /")
    val header = s"1 0 2 $off2 3 $off3 "
    val payload = (header + members).getBytes("ISO-8859-1")
    val deflated = PdfWriter.deflate(payload)
    val out = new java.io.ByteArrayOutputStream()
    def w(s: String): Unit = out.write(s.getBytes("ISO-8859-1"))
    w("%PDF-1.5\n")
    w(s"5 0 obj << /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${deflated.length} /Filter /FlateDecode >> stream\n")
    out.write(deflated)
    w("\nendstream endobj\n")
    w(s"4 0 obj << /Length ${content.length} >> stream\n$content\nendstream endobj\n")
    w("trailer << /Size 6 /Root 1 0 R >>")
    val r = Pdf.extractText(out.toByteArray)
    assert(r.text == "from objstm")
    assert(r.nPages == 1)
  }

  test("indirect /Length reference and stream-length fallback both work") {
    val content = "BT (len via ref) Tj ET"
    val pdf = ("%PDF-1.4\n" +
      "1 0 obj << /Type /Catalog /Pages 2 0 R >> endobj\n" +
      "2 0 obj << /Type /Pages /Kids [3 0 R] /Count 1 >> endobj\n" +
      "3 0 obj << /Type /Page /Parent 2 0 R /Contents 4 0 R >> endobj\n" +
      "5 0 obj " + content.length + " endobj\n" + // length object BEFORE use
      s"4 0 obj << /Length 5 0 R >> stream\n$content\nendstream endobj\n" +
      "trailer << /Size 6 /Root 1 0 R >>").getBytes("ISO-8859-1")
    assert(Pdf.extractText(pdf).text == "len via ref")
  }
}
