package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Baseline: brute-force cosine top-k with higher-order array functions
  * (`zip_with` + `aggregate` — whole-stage codegen, no UDF). Scale path:
  * random-hyperplane LSH bucketing so each query only scans its bucket —
  * the equi-join on bucket key replaces the cross join (at 100 TB the
  * cross join is the bottleneck; bucketing makes candidate generation a
  * shuffled hash join, and the small query side broadcasts).
  */
object Similarity {

  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")

  /** cosine(a, b) as a codegen'd Column expression (no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  /** Brute-force cosine top-k: queries × corpus; the query side is tiny
    * and broadcast, ranking via a window partitioned by query. */
  def knnBruteForce(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val emb = embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val scored = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"))
  }

  /** Deterministic random hyperplanes (seeded) for sign-LSH. */
  def hyperplanes(dim: Int, nPlanes: Int, seed: Long = 7L): Array[Array[Double]] = {
    val rng = new java.util.Random(seed)
    Array.fill(nPlanes)(Array.fill(dim)(rng.nextGaussian()))
  }

  /** Sign-LSH bucket id per vector (nPlanes bits). */
  def lshBuckets(spark: SparkSession, sfDir: String, nPlanes: Int = 8): DataFrame = {
    val planes = hyperplanes(64, nPlanes)
    val bucketOf = udf((v: Seq[Float]) => {
      var bucket = 0
      var p = 0
      while (p < planes.length) {
        var dot = 0.0
        var i = 0
        val pl = planes(p)
        while (i < v.length && i < pl.length) { dot += v(i) * pl(i); i += 1 }
        if (dot > 0) bucket |= (1 << p)
        p += 1
      }
      bucket
    })
    embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding"), bucketOf(col("embedding")).as("bucket"))
  }

  /** Approximate top-k: candidates restricted to the query's LSH bucket
    * (equi-join on bucket), ranked by exact cosine within the bucket. */
  def knnLsh(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nPlanes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bucketed = lshBuckets(spark, sfDir, nPlanes)
    val queries = bucketed.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("bucket").as("q_bucket"))
    val scored = bucketed
      .join(broadcast(queries),
        col("bucket") === col("q_bucket") && col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("vec_id").as("neighbor_id"),
        col("bucket"))
  }

  /** IVF (inverted-file) ANN: k-means coarse quantizer partitions the
    * corpus into nlist cells; a query scans only its own cell(s), ranked
    * by exact cosine. The scale path complement to sign-LSH (knnLsh):
    * cells adapt to the data distribution where hyperplanes are oblivious.
    * Deterministic (fixed seed). At 100 TB: fit on a sample, broadcast
    * centroids, cell assignment is a narrow map; candidate generation is
    * an equi-join on cell id — same shuffle shape as the LSH bucket join,
    * and the cell table can be bucketed at rest so repeated queries skip
    * the shuffle entirely. */
  def knnIvf(spark: SparkSession, sfDir: String,
      numQueries: Int = 10, k: Int = 5, nlist: Int = 16): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb = embeddings(spark, sfDir)
      .withColumn("features", array_to_vector(col("embedding").cast("array<double>")))
    val model = new KMeans().setK(nlist).setSeed(42L).setMaxIter(5).fit(emb)
    val cells = model.transform(emb)
      .select(col("vec_id"), col("embedding"), col("prediction").as("cell"))
    val queries = cells.filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        col("cell").as("q_cell"))
    val scored = cells
      .join(broadcast(queries),
        col("cell") === col("q_cell") && col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(col("q_emb"), col("embedding")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("vec_id").as("neighbor_id"), col("cell"))
  }

  /** Embedding-cosine near-duplicate pairs: bucket join + threshold. */
  def embeddingNearDups(spark: SparkSession, sfDir: String,
      minSim: Double = 0.95, nPlanes: Int = 8): DataFrame = {
    val bucketed = lshBuckets(spark, sfDir, nPlanes)
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", cosine(col("a.embedding"), col("b.embedding")))
      .filter(col("sim") >= minSim)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("sim"))
  }
}
