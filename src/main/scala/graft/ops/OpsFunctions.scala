package graft.ops

import org.apache.spark.sql.SparkSession

/** SQL surface for the training-data kernels — the same deterministic
  * functions the d/t/e-family operators build on, callable from `spark.sql`
  * so a SQL-first user composes their own pipelines (SURVEY.md §2.7
  * "UDF/UDTF surface"; the DataFrame operators remain the scale-tuned
  * path — these are the ergonomic escape hatch, not a replacement).
  *
  * All functions are pure and bit-deterministic (the same closed-form
  * mod-P arithmetic the DuckDB oracles replay), so SQL-built pipelines
  * verify against the same oracles as the built-ins.
  */
object OpsFunctions {

  def register(spark: SparkSession): Unit = {
    // word 3-shingles (LATERAL VIEW explode-able), and their oracle hash
    spark.udf.register("text_shingles",
      (t: String) => Dedup.shingles(t).toSeq.sorted)
    spark.udf.register("shingle_hash",
      (s: String) => Dedup.shingleHash(if (s == null) "" else s))
    // minhash signature / LSH band hashes — identical to d2's columns
    spark.udf.register("minhash_sig", (t: String) => Dedup.minhash(t))
    spark.udf.register("simhash64", (t: String) => Dedup.simhash(t))
    // exact n-gram Jaccard (the d3/d6 verification kernel)
    spark.udf.register("ngram_jaccard",
      (a: String, b: String) => Dedup.ngramJaccard(a, b))
    // winnowing fingerprint (t5)
    spark.udf.register("doc_fingerprint",
      (t: String) => TextOps.fingerprint(t))
    // media metadata from real header bytes (m1's kernel): mime guess
    // plus dimensions/channels/rate read out of the actual payload
    spark.udf.register("media_meta", (b: Array[Byte]) => {
      val img = MediaOps.sniffImage(b)
      val wav = if (img.isEmpty) MediaOps.sniffWav(b) else None
      val mp4 = if (img.isEmpty && wav.isEmpty) MediaOps.sniffMp4(b) else None
      MediaOps.MediaMeta(
        media_ref = null,
        mime = img.map(_._1)
          .orElse(wav.map(_ => "audio/wav"))
          .orElse(mp4.map(_ => "video/mp4")).orNull,
        byte_len = if (b == null) 0 else b.length,
        width = img.map(_._2).orElse(mp4.map(_._1)).getOrElse(0),
        height = img.map(_._3).orElse(mp4.map(_._2)).getOrElse(0),
        n_frames = mp4.map(_._3).getOrElse(1),
        channels = wav.map(_._1).getOrElse(0),
        sample_rate = wav.map(_._2).getOrElse(0),
        feature = Array.empty[Float])
    })
  }
}
