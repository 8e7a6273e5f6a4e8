package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Reusable UTF-8 → UTF-16 decode buffer: turns a Catalyst [[UTF8String]]
  * into a [[CharSequence]] the tokenizer can consume WITHOUT allocating a
  * `java.lang.String` (and its backing array) per document — the round-1
  * kernel hotspot (`UTF8String.toString` copied every doc before parsing;
  * VERDICT #9). One instance per thread, grown geometrically, reused for
  * every row the thread parses.
  *
  * Decode behavior matches `new String(bytes, UTF_8)` for valid input
  * (including surrogate pairs for supplementary planes). Malformed bytes
  * become U+FFFD one-for-one, which may differ from the JDK's
  * multi-byte-sequence replacement counting — acceptable: the kernel
  * treats markup as text and the parse never depends on replacement-char
  * arity.
  */
final class Utf8CharSeq extends CharSequence {
  private[this] var buf = new Array[Char](4096)
  private[this] var len = 0

  // 8-bytes-at-a-time ASCII widening needs a fixed byte order; the scalar
  // loop below is the portable fallback (this sandbox/cluster is x86).
  private[this] val littleEndian =
    java.nio.ByteOrder.nativeOrder() == java.nio.ByteOrder.LITTLE_ENDIAN

  /** Decode `u` into the reused buffer; returns this. A UTF-16 char count
    * never exceeds the UTF-8 byte count, so sizing to numBytes is safe.
    * Hot loop: ASCII runs widen 8 bytes per iteration off one long read
    * (markup text is overwhelmingly ASCII; the JDK's vectorized String
    * decoder set the bar — a plain per-byte loop measured 10-25% slower
    * end-to-end on the parse kernel). */
  def setFrom(u: UTF8String): Utf8CharSeq = {
    val nb = u.numBytes()
    if (buf.length < nb) {
      var cap = buf.length
      while (cap < nb) cap <<= 1
      buf = new Array[Char](cap)
    }
    val base = u.getBaseObject
    val off0 = u.getBaseOffset
    var i = 0
    var l = 0
    while (i < nb) {
      if (littleEndian && i + 8 <= nb) {
        val v = org.apache.spark.unsafe.Platform.getLong(base, off0 + i)
        if ((v & 0x8080808080808080L) == 0L) { // 8 ASCII bytes
          buf(l) = (v & 0xFF).toChar
          buf(l + 1) = ((v >>> 8) & 0xFF).toChar
          buf(l + 2) = ((v >>> 16) & 0xFF).toChar
          buf(l + 3) = ((v >>> 24) & 0xFF).toChar
          buf(l + 4) = ((v >>> 32) & 0xFF).toChar
          buf(l + 5) = ((v >>> 40) & 0xFF).toChar
          buf(l + 6) = ((v >>> 48) & 0xFF).toChar
          buf(l + 7) = ((v >>> 56) & 0xFF).toChar
          l += 8
          i += 8
        } else {
          i = decodeOne(u, i, nb, l); l = lastL
        }
      } else {
        i = decodeOne(u, i, nb, l); l = lastL
      }
    }
    len = l
    this
  }

  // single-code-point scalar step; writes at l, returns next i, leaves the
  // new l in lastL (poor man's two-value return without allocation)
  private[this] var lastL = 0
  private def decodeOne(u: UTF8String, i0: Int, nb: Int, l0: Int): Int = {
    var i = i0
    var l = l0
    val b0 = u.getByte(i) & 0xFF
    if (b0 < 0x80) { buf(l) = b0.toChar; l += 1; i += 1 }
    else if ((b0 & 0xE0) == 0xC0 && i + 1 < nb &&
             (u.getByte(i + 1) & 0xC0) == 0x80) {
      buf(l) = (((b0 & 0x1F) << 6) | (u.getByte(i + 1) & 0x3F)).toChar
      l += 1; i += 2
    } else if ((b0 & 0xF0) == 0xE0 && i + 2 < nb &&
               (u.getByte(i + 1) & 0xC0) == 0x80 &&
               (u.getByte(i + 2) & 0xC0) == 0x80) {
      buf(l) = (((b0 & 0x0F) << 12) | ((u.getByte(i + 1) & 0x3F) << 6) |
        (u.getByte(i + 2) & 0x3F)).toChar
      l += 1; i += 3
    } else if ((b0 & 0xF8) == 0xF0 && i + 3 < nb &&
               (u.getByte(i + 1) & 0xC0) == 0x80 &&
               (u.getByte(i + 2) & 0xC0) == 0x80 &&
               (u.getByte(i + 3) & 0xC0) == 0x80) {
      val cp = ((b0 & 0x07) << 18) | ((u.getByte(i + 1) & 0x3F) << 12) |
        ((u.getByte(i + 2) & 0x3F) << 6) | (u.getByte(i + 3) & 0x3F)
      if (cp >= 0x10000 && cp <= 0x10FFFF) {
        buf(l) = Character.highSurrogate(cp)
        buf(l + 1) = Character.lowSurrogate(cp)
        l += 2
      } else { buf(l) = '�'; l += 1 }
      i += 4
    } else { buf(l) = '�'; l += 1; i += 1 }
    lastL = l
    i
  }

  /** Raw view for the tokenizer's array fast path: valid chars are
    * charArray(0 until length) until the next setFrom. */
  def charArray: Array[Char] = buf

  override def length: Int = len
  override def charAt(index: Int): Char = buf(index)
  override def subSequence(start: Int, end: Int): CharSequence =
    new String(buf, start, end - start)
  override def toString: String = new String(buf, 0, len)
}
