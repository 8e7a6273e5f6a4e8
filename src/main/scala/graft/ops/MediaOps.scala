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
      width: Int, height: Int, n_frames: Int, feature: Array[Float])

  // Closed-form generator/stub constants (shared with the m1-m3 DuckDB
  // oracles): all arithmetic is mod-P integer math over the decimal
  // doc_id string — no PRNG stream, no wrapping 64-bit multiply — so the
  // oracle recomputes byte lengths, dimensions and frame counts in SQL.
  val MediaP = 4294967311L // prime > 2^32 (same as Dedup.HashP)
  val MediaK = 2654435761L // Knuth multiplicative constant

  /** Closed-form PNG dimensions for a writer-generated asset (shared with
    * the m1/m2 oracles, which recompute them from the seed in SQL while
    * the Spark side reads them back out of the REAL header bytes). */
  def pngDims(seed: Long): (Int, Int) =
    (16 + (seed % 1024).toInt, 16 + (seed / 1024 % 1024).toInt)

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
    * `wrapDocumentsMarked`. Image assets carry a REAL PNG signature +
    * IHDR header (closed-form dimensions, real CRC) followed by filler —
    * the decode path reads the dimensions back out of the bytes; audio/
    * video stay opaque closed-form streams for the stub. */
  def syntheticAssets(spark: SparkSession, sfDir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id").cast("string"))
      .as[String]
      .map { id =>
        val seed = Dedup.shingleHash(id) // base-31 poly mod 2^32 over digits
        val len = 64 + (seed % 192).toInt
        val bytes = new Array[Byte](len)
        var j = 0
        while (j < len) {
          bytes(j) = (((seed + (j + 1) * MediaK) % MediaP % 256) - 128).toByte
          j += 1
        }
        val mime = (seed % 3) match {
          case 0 => "image/png"
          case 1 => "audio/wav"
          case _ => "video/mp4"
        }
        if (mime == "image/png") {
          val (w, h) = pngDims(seed)
          System.arraycopy(pngHeader(w, h), 0, bytes, 0, 33)
        }
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

  /** Image metadata is REAL — `sniffImage` parses dimensions out of the
    * actual PNG/GIF/JPEG header bytes (no codec libraries needed for
    * headers). Audio/video decode stays a clearly-marked deterministic
    * fake (this container ships no AV codecs): hash-derived frames +
    * byte-histogram feature. Batched per partition like a Pandas UDF
    * batch. */
  def decodeStub(assets: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { m =>
        // base-31 poly over UNSIGNED byte values mod P (oracle-replicable)
        var h = 0L
        var i = 0
        while (i < m.bytes.length) { h = (h * 31 + (m.bytes(i) + 128)) % MediaP; i += 1 }
        val (w, ht) = sniffImage(m.bytes) match {
          case Some((_, iw, ih)) => (iw, ih) // real header parse
          case None => // STUB for non-image payloads: hash-derived
            (16 + (h % 1024).toInt, 16 + (h / 1024 % 1024).toInt)
        }
        val frames = if (m.mime.startsWith("video")) 1 + (h / 1048576 % 300).toInt else 1
        val feat = new Array[Float](8)
        i = 0
        while (i < m.bytes.length) {
          feat(i % 8) += (m.bytes(i) & 0xFF) / 255.0f
          i += 1
        }
        MediaMeta(m.media_ref, m.mime, m.bytes.length, w, ht, frames, feat)
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
