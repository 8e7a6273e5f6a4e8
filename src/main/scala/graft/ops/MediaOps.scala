package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata.
  *
  * The actual codec step is STUBBED (this container ships no image/audio
  * libraries — see the builder contract): `decodeStub` derives
  * deterministic fake metadata/features from the bytes. Everything
  * Spark-side is real and tested: schema, batch iteration shape
  * (mapPartitions over row batches ≈ the Pandas-UDF batch contract),
  * partitioning, and the join back to extracted media spans.
  */
object MediaOps {

  final case class MediaRow(media_ref: String, bytes: Array[Byte], mime: String)
  final case class MediaMeta(
      media_ref: String, mime: String, byte_len: Int,
      width: Int, height: Int, n_frames: Int,
      channels: Int, sample_rate: Int, feature: Array[Float])

  // Closed-form generator/stub constants (shared with the m1-m3 DuckDB
  // oracles): all arithmetic is mod-P integer math over the decimal
  // doc_id string — no PRNG stream, no wrapping 64-bit multiply — so the
  // oracle recomputes byte lengths, dimensions and frame counts in SQL.
  val MediaP = 4294967311L // prime > 2^32 (same as Dedup.HashP)
  val MediaK = 2654435761L // Knuth multiplicative constant

  /** Closed-form metadata for writer-generated assets (shared with the
    * m1/m2/m3 oracles, which recompute these from the seed in SQL while
    * the Spark side reads them back out of the REAL header bytes). */
  def assetDims(seed: Long): (Int, Int) =
    (16 + (seed % 1024).toInt, 16 + (seed / 1024 % 1024).toInt)
  def wavChannels(seed: Long): Int = 1 + (seed % 2).toInt
  def wavSampleRate(seed: Long): Int = 8000 + ((seed % 8) * 4000).toInt
  def mp4Frames(seed: Long): Int = 1 + (seed / 3 % 300).toInt

  /** Canonical 44-byte PCM RIFF/WAVE header (fmt + data chunk headers)
    * with the given channel count and sample rate — what any WAV metadata
    * sniffer reads. `totalLen` sizes the RIFF/data fields honestly. */
  def wavHeader(channels: Int, sampleRate: Int, totalLen: Int): Array[Byte] = {
    val out = new Array[Byte](44)
    def ascii(off: Int, s: String): Unit = {
      var i = 0
      while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    def le32(off: Int, v: Long): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
      out(off + 2) = (v >>> 16).toByte; out(off + 3) = (v >>> 24).toByte
    }
    def le16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >>> 8).toByte
    }
    val bytesPerSec = sampleRate.toLong * channels * 2
    ascii(0, "RIFF"); le32(4, totalLen - 8L); ascii(8, "WAVE")
    ascii(12, "fmt "); le32(16, 16L)
    le16(20, 1) // PCM
    le16(22, channels); le32(24, sampleRate.toLong)
    le32(28, bytesPerSec); le16(32, channels * 2); le16(34, 16) // block align, bits
    ascii(36, "data"); le32(40, totalLen - 44L)
    out
  }

  /** Minimal real MP4 box prefix: ftyp(16) + moov{ mvhd(108) + trak{
    * tkhd(92) } } = 240 bytes. mvhd carries timescale=30 and
    * duration=frames (so frame count reads straight out of the real box
    * at 30 fps), tkhd carries width/height as 16.16 fixed point. */
  val Mp4HeaderLen = 232 // ftyp(16) + moov(8 + mvhd 108 + trak(8 + tkhd 92))
  def mp4Header(w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new Array[Byte](Mp4HeaderLen)
    var p = 0
    def ascii(s: String): Unit = { var i = 0; while (i < s.length) { out(p) = s.charAt(i).toByte; p += 1; i += 1 } }
    def be32(v: Long): Unit = {
      out(p) = (v >>> 24).toByte; out(p + 1) = (v >>> 16).toByte
      out(p + 2) = (v >>> 8).toByte; out(p + 3) = v.toByte; p += 4
    }
    def skip(n: Int): Unit = p += n // zeroed fields
    be32(16L); ascii("ftyp"); ascii("isom"); be32(512L) // brand + version
    be32(8L + 108 + 8 + 92); ascii("moov")
    be32(108L); ascii("mvhd")
    skip(4) // version+flags
    skip(8) // creation + modification
    be32(30L) // timescale: 30 ticks/s
    be32(frames.toLong) // duration in ticks = frame count at 30 fps
    be32(0x00010000L) // rate 1.0
    skip(2 + 2 + 8) // volume, reserved
    skip(36) // matrix (identity omitted — zeros are fine for a sniffer)
    skip(24 + 4) // predefined + next track id
    be32(8L + 92); ascii("trak")
    be32(92L); ascii("tkhd")
    skip(4) // version+flags
    skip(8) // creation + modification
    be32(1L) // track id
    skip(4) // reserved
    be32(frames.toLong) // duration
    skip(8 + 2 + 2 + 2 + 2 + 36) // reserved, layer, group, volume, rsvd, matrix
    be32(w.toLong << 16); be32(h.toLong << 16) // 16.16 fixed
    out
  }

  /** WAV metadata from real header bytes: walk RIFF chunks to `fmt `,
    * read channels + sample rate. None when not a RIFF/WAVE stream. */
  def sniffWav(b: Array[Byte]): Option[(Int, Int)] = {
    if (b == null || b.length < 36) return None
    def ascii(off: Int, s: String): Boolean = {
      var i = 0
      while (i < s.length) { if (b(off + i) != s.charAt(i).toByte) return false; i += 1 }
      true
    }
    @inline def le16(off: Int): Int = (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)
    @inline def le32(off: Int): Long =
      (b(off) & 0xFFL) | ((b(off + 1) & 0xFFL) << 8) |
        ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)
    if (!ascii(0, "RIFF") || !ascii(8, "WAVE")) return None
    var p = 12
    while (p + 8 <= b.length) {
      val size = le32(p + 4)
      if (ascii(p, "fmt ") && p + 16 <= b.length)
        return Some((le16(p + 10), le32(p + 12).toInt))
      p += 8 + size.toInt + (size.toInt & 1) // chunks are word-aligned
      if (size < 0 || size > b.length) return None
    }
    None
  }

  /** MP4 metadata from real box structure: walk top-level boxes to moov,
    * then children for mvhd (timescale, duration → frames at the embedded
    * timescale treated as fps ticks) and trak/tkhd (16.16 width/height).
    * None when no ftyp/moov signature. */
  def sniffMp4(b: Array[Byte]): Option[(Int, Int, Int)] = {
    if (b == null || b.length < 16) return None
    def ascii(off: Int, s: String): Boolean = {
      if (off + s.length > b.length) return false
      var i = 0
      while (i < s.length) { if (b(off + i) != s.charAt(i).toByte) return false; i += 1 }
      true
    }
    @inline def be32(off: Int): Long =
      ((b(off) & 0xFFL) << 24) | ((b(off + 1) & 0xFFL) << 16) |
        ((b(off + 2) & 0xFFL) << 8) | (b(off + 3) & 0xFFL)
    if (!ascii(4, "ftyp")) return None
    var frames = 0
    var w = 0
    var h = 0
    def walk(start: Int, end: Int, depth: Int): Unit = {
      if (depth > 8) return
      var p = start
      while (p + 8 <= end) {
        val size = be32(p)
        if (size < 8 || p + size > end) return
        if (ascii(p + 4, "moov") || ascii(p + 4, "trak"))
          walk(p + 8, p + size.toInt, depth + 1)
        else if (ascii(p + 4, "mvhd") && p + 28 <= end) {
          val timescale = be32(p + 20)
          val duration = be32(p + 24)
          if (timescale > 0) frames = duration.toInt // ticks ARE frames at ts=30fps convention
        } else if (ascii(p + 4, "tkhd") && p + 92 <= end) {
          w = (be32(p + 84) >>> 16).toInt
          h = (be32(p + 88) >>> 16).toInt
        }
        p += size.toInt
      }
    }
    walk(0, b.length, 0)
    if (frames == 0 && w == 0) None else Some((w, h, math.max(1, frames)))
  }

  /** Minimal real PNG header: 8-byte signature + IHDR chunk (13-byte data,
    * real CRC32) — exactly what any conforming dimension sniffer reads.
    * 33 bytes. */
  def pngHeader(w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](33)
    val sig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    var i = 0
    while (i < 8) { out(i) = sig(i).toByte; i += 1 }
    def be32(off: Int, v: Long): Unit = {
      out(off) = (v >>> 24).toByte; out(off + 1) = (v >>> 16).toByte
      out(off + 2) = (v >>> 8).toByte; out(off + 3) = v.toByte
    }
    be32(8, 13L) // IHDR data length
    out(12) = 'I'; out(13) = 'H'; out(14) = 'D'; out(15) = 'R'
    be32(16, w.toLong); be32(20, h.toLong)
    out(24) = 8 // bit depth
    out(25) = 2 // color type: truecolor
    // compression = filter = interlace = 0 (already zeroed)
    val crc = new java.util.zip.CRC32()
    crc.update(out, 12, 17) // type + data
    be32(29, crc.getValue)
    out
  }

  /** Synthetic deterministic media-asset table derived from doc ids (no
    * external data): media_ref matches the refs emitted by
    * `wrapDocumentsMarked`. Every asset now carries a REAL format header
    * over the closed-form filler stream — PNG signature + IHDR (real
    * CRC), RIFF/WAVE fmt chunk, or MP4 ftyp/moov/mvhd/tkhd boxes — with
    * closed-form metadata values, so the decode path reads metadata back
    * out of the actual bytes and the oracle recomputes the same values
    * from the seed. Video assets are sized past the 232-byte box prefix. */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"))
      .as[String]
      .map { id =>
        val seed = Dedup.shingleHash(id) // base-31 poly mod 2^32 over digits
        val mime = (seed % 3) match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ => "video/mp4"
        }
        val len =
          if (mime == "video/mp4") 256 + (seed % 192).toInt
          else 64 + (seed % 192).toInt
        val bytes = new Array[Byte](len)
        var j = 0
        while (j < len) {
          bytes(j) = (((seed + (j + 1) * MediaK) % MediaP % 256) - 128).toByte
          j += 1
        }
        val (w, h) = assetDims(seed)
        val header = mime match {
          case "image/png" => pngHeader(w, h)
          case "audio/wav" => wavHeader(wavChannels(seed), wavSampleRate(seed), len)
          case _           => mp4Header(w, h, mp4Frames(seed))
        }
        System.arraycopy(header, 0, bytes, 0, header.length)
        MediaRow(graft.SgmlExtract.AssetPrefix + id + graft.SgmlExtract.AssetSuffix,
          bytes, mime)
      }
  }

  /** Image dimension sniffing from REAL header bytes — pure JVM, no codec
    * libraries: PNG (IHDR), GIF87a/89a (logical screen descriptor,
    * little-endian), JPEG (segment scan to the first SOFn frame header).
    * Returns (mime, width, height); None when no image signature matches
    * (the caller falls back to the documented stub). Runs per row inside
    * mapPartitions — narrow, allocation-free. */
  def sniffImage(b: Array[Byte]): Option[(String, Int, Int)] = {
    if (b == null) return None
    @inline def u8(i: Int): Int = b(i) & 0xFF
    @inline def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    @inline def be32(i: Int): Int =
      (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    @inline def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    if (b.length >= 24 && u8(0) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
        b(3) == 'G' && b(12) == 'I' && b(13) == 'H' && b(14) == 'D' && b(15) == 'R')
      Some(("image/png", be32(16), be32(20)))
    else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
        b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a')
      Some(("image/gif", le16(6), le16(8)))
    else if (b.length >= 4 && u8(0) == 0xFF && u8(1) == 0xD8) {
      // JPEG: walk marker segments to the first SOFn (C0–CF minus the
      // non-frame C4/C8/CC); SOF layout = len(2) precision(1) h(2) w(2)
      var i = 2
      while (i + 9 < b.length && u8(i) == 0xFF) {
        val marker = u8(i + 1)
        if (marker == 0xFF) i += 1 // fill byte
        else if (marker == 0x01 || (marker >= 0xD0 && marker <= 0xD9)) i += 2 // standalone
        else {
          val segLen = be16(i + 2)
          if (segLen < 2) return None
          if (marker >= 0xC0 && marker <= 0xCF &&
              marker != 0xC4 && marker != 0xC8 && marker != 0xCC)
            return Some(("image/jpeg", be16(i + 7), be16(i + 5)))
          i += 2 + segLen
        }
      }
      None
    } else None
  }

  /** Header metadata is REAL for every major format — `sniffImage`
    * (PNG/GIF/JPEG dimensions), `sniffWav` (channels + sample rate),
    * `sniffMp4` (mvhd frame count + tkhd dimensions) all parse the actual
    * bytes, no codec libraries needed. Only pixel/sample/frame DECODE
    * remains a clearly-marked stub (this container ships no AV codecs):
    * the 8-dim "feature" is a byte histogram, and unrecognized payloads
    * fall back to hash-derived dimensions. Batched per partition like a
    * Pandas UDF batch. */
  def decodeStub(assets: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { m =>
        // base-31 poly over UNSIGNED byte values mod P (oracle-replicable)
        var h = 0L
        var i = 0
        while (i < m.bytes.length) { h = (h * 31 + (m.bytes(i) + 128)) % MediaP; i += 1 }
        var w = 0
        var ht = 0
        var frames = 1
        var channels = 0
        var rate = 0
        sniffImage(m.bytes) match {
          case Some((_, iw, ih)) => w = iw; ht = ih
          case None => sniffWav(m.bytes) match {
            case Some((ch, sr)) => channels = ch; rate = sr
            case None => sniffMp4(m.bytes) match {
              case Some((mw, mh, fr)) => w = mw; ht = mh; frames = fr
              case None => // STUB fallback for unrecognized payloads
                w = 16 + (h % 1024).toInt
                ht = 16 + (h / 1024 % 1024).toInt
                if (m.mime.startsWith("video")) frames = 1 + (h / 1048576 % 300).toInt
            }
          }
        }
        val feat = new Array[Float](8)
        i = 0
        while (i < m.bytes.length) {
          feat(i % 8) += (m.bytes(i) & 0xFF) / 255.0f
          i += 1
        }
        MediaMeta(m.media_ref, m.mime, m.bytes.length, w, ht, frames,
          channels, rate, feat)
      }
    }
  }

  /** Join decoded media metadata back onto extracted media spans —
    * media side is derived-small here; at scale this is the spans⋈assets
    * equi-join on media_ref (broadcast when the asset dim is small). */
  def enrichSpans(spanRows: DataFrame, meta: DataFrame): DataFrame = {
    spanRows.filter(col("kind") === "media")
      .join(meta, Seq("media_ref"), "left")
  }

  /** Resize to fit a bounding box, aspect preserved. The ×1e6 scale
    * factor is fixed-point-via-double: Spark's `/` on integral columns is
    * IEEE double division (integer division is `div`), so the result is
    * bit-deterministic and the truncating int cast below replicates in
    * SQL as FLOOR. STUB: only the dimension arithmetic is real; a
    * production codec would also re-encode pixels here. Narrow, codegen'd
    * column expressions — no UDF needed for the geometry. */
  def resizeMeta(meta: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    // scale = min(maxW/w, maxH/h, 1), fixed-point ×1e6 carried in doubles
    val s = least(lit(maxW * 1000000L) / col("width"),
      lit(maxH * 1000000L) / col("height"), lit(1000000L))
    meta
      .withColumn("resized_w", greatest(lit(1), (col("width") * s / 1000000L).cast("int")))
      .withColumn("resized_h", greatest(lit(1), (col("height") * s / 1000000L).cast("int")))
  }

  /** Frame sampling for video assets: every `stride`-th frame index up to
    * `maxFrames`, one output row per sampled frame (sequence + explode —
    * the generator shape; at 100 TB each frame row later feeds the decode
    * stage, so sampling BEFORE decode prunes work). */
  def sampleFrames(meta: DataFrame, stride: Int = 30, maxFrames: Int = 8): DataFrame = {
    meta.filter(col("mime").startsWith("video"))
      .withColumn("frame_idx",
        explode(slice(sequence(lit(0), col("n_frames") - 1, lit(stride)), 1, maxFrames)))
      .select(col("media_ref"), col("n_frames"), col("frame_idx"))
  }
}
