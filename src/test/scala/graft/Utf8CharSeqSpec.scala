package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, rng}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Utf8CharSeq

/** The reused UTF-8 decode buffer must agree with the JDK decoder on all
  * VALID input (the kernel's contract; malformed bytes are documented as
  * one-FFFD-per-byte, which may differ from JDK sequence counting). */
class Utf8CharSeqSpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit = {
    var seed = rng.Seed(42L)
    (0 until n).foreach { _ =>
      val a = gen.pureApply(Gen.Parameters.default, seed)
      f(a)
      seed = seed.next
    }
  }

  private val genCodePoint: Gen[Int] = Gen.frequency(
    6 -> Gen.choose(0x20, 0x7E), // ASCII
    2 -> Gen.choose(0x80, 0x7FF), // 2-byte
    2 -> Gen.choose(0x800, 0xD7FF), // 3-byte below surrogates
    1 -> Gen.choose(0xE000, 0xFFFD), // 3-byte above surrogates
    1 -> Gen.choose(0x10000, 0x10FFFF)) // 4-byte (surrogate pairs)

  private val genText: Gen[String] =
    Gen.chooseNum(0, 200).flatMap(n => Gen.listOfN(n, genCodePoint))
      .map(cps => new String(cps.toArray.flatMap(Character.toChars), 0,
        cps.map(Character.charCount).sum))

  test("decode ≡ new String(bytes, UTF_8) for all valid input, with reuse") {
    val buf = new Utf8CharSeq // ONE instance — exercises buffer reuse
    forAll(genText) { s =>
      val u = UTF8String.fromString(s)
      val d = buf.setFrom(u)
      assert(d.toString == s)
      assert(d.length == s.length)
      var i = 0
      while (i < s.length) { assert(d.charAt(i) == s.charAt(i)); i += 1 }
    }
  }

  test("parse through the array path ≡ parse of the String") {
    import graft.sgml._
    val cfg = ParserConfig(dialect = Dialect.Html4, space = SpaceMode.Preserve)
    val buf = new Utf8CharSeq
    forAll(genText, n = 200) { payload =>
      val doc = s"<html><body><p>$payload</body></html>"
      val u = UTF8String.fromString(doc)
      val d = buf.setFrom(u)
      val viaArr = {
        val p = new SgmlParser(cfg)
        p.feedChars(d.charArray, d.length, 0)
        p.finish().spans(cfg)
      }
      val viaStr = SgmlParser.parse(doc, cfg).spans(cfg)
      assert(viaArr == viaStr)
    }
  }
}
