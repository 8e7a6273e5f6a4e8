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

  /** Synthetic deterministic media-asset table derived from doc ids (no
    * external data): media_ref matches the refs emitted by
    * `wrapDocumentsMarked`. */
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
        MediaRow(graft.SgmlExtract.AssetPrefix + id + graft.SgmlExtract.AssetSuffix,
          bytes, mime)
      }
  }

  /** ??? in spirit — the codec is a clearly-marked deterministic fake:
    * real decode would go here (image decode / audio PCM / frame sample).
    * Metadata and an 8-dim "feature" derive only from the bytes, so
    * results are stable for tests. Batched per partition like a Pandas
    * UDF batch. */
  def decodeStub(assets: Dataset[MediaRow]): Dataset[MediaMeta] = {
    import assets.sparkSession.implicits._
    assets.mapPartitions { it =>
      it.map { m =>
        // STUB decode: hash-derived dimensions/frames + byte-histogram
        // feature. Replace with a real codec in production. The hash is a
        // base-31 poly over UNSIGNED byte values mod P (oracle-replicable).
        var h = 0L
        var i = 0
        while (i < m.bytes.length) { h = (h * 31 + (m.bytes(i) + 128)) % MediaP; i += 1 }
        val w = 16 + (h % 1024).toInt
        val ht = 16 + (h / 1024 % 1024).toInt
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
