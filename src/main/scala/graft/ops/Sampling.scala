package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling operators — the downsample primitives a 100 TB
  * training-data pipeline needs before anything else runs: cut the corpus
  * to a target size per stratum (stratified) or overall (uniform) with a
  * seedable, restart-stable decision per row.
  *
  * Scale shape: the keep/drop decision is a closed-form hash of the row
  * key — a narrow, codegen'd filter evaluated at the scan, no shuffle, no
  * RNG state, no driver participation. Re-running the job (or resuming a
  * failed one) selects the exact same rows, which `rand()`-based sampling
  * cannot guarantee across task retries. The same arithmetic is
  * re-computable in ANSI SQL, so the DuckDB oracle checks values, not just
  * row counts.
  */
object Sampling {

  /** Closed-form per-row hash → bucket in [0, 1000). `doc_id` is reduced
    * mod a ~2^20 prime FIRST so the multiply never overflows a signed
    * 64-bit value — Spark and DuckDB BIGINT then agree bit-for-bit at any
    * id magnitude. Knuth multiplicative constant; P prime > 2^32. */
  val IdM: Long = 1299709L
  val HashK: Long = 2654435761L
  val HashP: Long = 4294967311L

  def bucket1000(id: Column): Column =
    pmod(pmod(id, lit(IdM)) * lit(HashK), lit(HashP)) % 1000

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Stratified sample over the documents table: per-source keep rates
    * (permille), decided per row from `bucket1000(doc_id)`. The rate rule
    * is itself closed-form on the stratum name so the oracle can replay
    * it; a production caller passes an explicit rate map instead. */
  def stratifiedSample(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir)
    // stratum 'srcN' → rate 100 + (N mod 5) * 200 permille (100..900)
    val srcNum = substring(col("source"), 4, 10).cast("long")
    val rate = lit(100) + pmod(srcNum, lit(5)) * 200
    d.select(col("doc_id"), col("source"),
        bucket1000(col("doc_id")).as("bucket"), rate.cast("long").as("rate_permille"))
      .filter(col("bucket") < col("rate_permille"))
  }

  /** Uniform fixed-size sample: the k rows with the smallest row hash —
    * a deterministic reservoir. Spark plans order-by + limit as
    * TakeOrderedAndProject: a per-partition top-k heap merged on the
    * driver, O(k) memory, NO global sort and no shuffle exchange. */
  def uniformSample(spark: SparkSession, sfDir: String, k: Int = 100): DataFrame =
    documents(spark, sfDir)
      .select(col("doc_id"), bucket1000(col("doc_id")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc)
      .limit(k)

  /** Deterministic train/val/test split assignment — the canonical
    * pre-training partition: each row's bucket (closed-form hash, same
    * restart-stability argument as the samplers) falls into cumulative
    * permille ranges, so membership is a narrow codegen'd CASE at the
    * scan — no shuffle, no RNG, stable under retries/repartition, and a
    * row can never land in two splits. `splits` are (name, permille)
    * pairs; they must sum to ≤1000 (rows past the last threshold get the
    * final name — pass an explicit remainder split to make that
    * visible). */
  def withSplit(d: DataFrame, idCol: String = "doc_id",
      splits: Seq[(String, Int)] =
        Seq(("train", 900), ("val", 50), ("test", 50))): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 >= 0) &&
      splits.map(_._2).sum <= 1000,
      s"split permilles must be >= 0 and sum to <= 1000: $splits")
    val b = bucket1000(col(idCol))
    val thresholds = splits.scanLeft(0)(_ + _._2).tail // cumulative uppers
    val assigned = splits.init.zip(thresholds.init).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), upper)) =>
        when(b < upper, name).otherwise(acc)
      }
    d.withColumn("split", assigned)
  }

  def splitAssign(spark: SparkSession, sfDir: String): DataFrame =
    withSplit(documents(spark, sfDir))
      .select(col("doc_id"), bucket1000(col("doc_id")).as("bucket"),
        col("split"))
}
