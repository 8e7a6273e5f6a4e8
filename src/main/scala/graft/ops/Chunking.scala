package graft.ops

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Shaping curated text into model-ready training sequences — the step
  * between curation (dedup/quality/split) and the training loader:
  * sliding-window chunking of long documents to a context length, and
  * token-budget sequence packing ("concatenate-and-slice") that assigns
  * every document a position in a fixed-size training block.
  *
  * Both are integer-exact over whitespace tokens, so the DuckDB oracle
  * replays them bit-for-bit; both are designed around the 100 TB
  * question: chunking is a map-only explode (no shuffle at all), and
  * packing needs a GLOBAL prefix sum — computed the distributed way
  * (one range shuffle + a partition-count-bounded driver collect + a
  * narrow running-sum pass), never a single-partition window.
  */
object Chunking {

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  // ---- t13: sliding-window chunking ---------------------------------------

  /** Explode `textCol` into windows of `window` whitespace tokens advancing
    * by `stride` (overlap = window - stride). Chunk k covers tokens
    * [k*stride, k*stride+window); the final chunk is short rather than
    * padded; every doc emits at least one chunk (short docs pass through
    * whole). Appends `chunk_idx`, `chunk_tokens`, `chunk_text`.
    *
    * Scale shape: pure built-ins (split / sequence / transform / slice +
    * posexplode) → one narrow whole-stage-codegen'd pass, zero shuffles,
    * zero UDFs. Output rows = Σ_docs max(1, ceil((n-window)/stride)+1);
    * at 100 TB this is a map-only stage bounded by the write, which is
    * exactly what a context-length shaping pass should be.
    */
  def withChunks(d: DataFrame, textCol: String = "text",
      window: Int = 32, stride: Int = 24): DataFrame = {
    require(window > 0 && stride > 0 && stride <= window,
      s"need 0 < stride <= window, got window=$window stride=$stride")
    val toks = split(col(textCol), " ")
    val n = size(toks)
    // ceil((n-window)/stride)+1 via integer arithmetic; 1 when n <= window
    val nChunks = when(n <= window, lit(1))
      .otherwise(floor((n - window + (stride - 1)) / stride).cast("int") + 1)
    d.withColumn("_toks", toks)
      .withColumn("_n", n)
      .select(col("*"),
        posexplode(transform(sequence(lit(0), nChunks - 1),
          k => array_join(slice(col("_toks"), k * stride + 1, lit(window)), " ")))
          .as(Seq("chunk_idx", "chunk_text")))
      .withColumn("chunk_tokens",
        least(lit(window), col("_n") - col("chunk_idx") * stride))
      .drop("_toks", "_n")
  }

  /** t13 oracle query: chunk the documents table at window=32 / stride=24
    * (doc avg ~55 tokens → a mix of 1-chunk and multi-chunk docs). */
  def chunkDocs(spark: SparkSession, sfDir: String): DataFrame =
    withChunks(documents(spark, sfDir).select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("chunk_idx"), col("chunk_tokens"), col("chunk_text"))

  // ---- c1: token-budget sequence packing ----------------------------------

  /** Assign each row (in ascending `idCol` order) its token start offset in
    * the concatenated corpus and the id of the fixed-size training block
    * containing that offset: `seq_start` = Σ tokens of all earlier ids,
    * `pack_id` = seq_start / blockSize. A doc longer than the remaining
    * block budget spills into the next block (standard concatenate-and-
    * slice packing — block boundaries cut documents, pack_id records where
    * each doc STARTS).
    *
    * The global prefix sum is computed distributed:
    *   1. ONE range shuffle on `idCol` (partition p holds ids below
    *      partition p+1's — Spark's RangePartitioner contract);
    *   2. per-partition token totals → driver (bounded by PARTITION COUNT,
    *      never data size) → exclusive prefix offsets, broadcast;
    *   3. a narrow per-partition running sum seeded with the partition's
    *      offset (sortWithinPartitions + mapPartitions).
    * No single-partition window anywhere — the classic distributed scan
    * (Blelloch two-pass). Result is partitioning-invariant: pack ids
    * depend only on the global id order, which `idCol` uniqueness pins.
    *
    * `idCol` must be globally unique (it defines the corpus order);
    * `tokensCol` must be non-negative. Output appends `seq_start` and
    * `pack_id` (both long).
    */
  def withPackIds(d: DataFrame, idCol: String = "doc_id",
      tokensCol: String = "tokens", blockSize: Long = 256L,
      partitions: Int = 32, cacheRanged: Boolean = true): DataFrame = {
    require(blockSize > 0, s"blockSize must be positive, got $blockSize")
    val spark = d.sparkSession
    // cacheRanged: both passes read the range-shuffled frame; caching it
    // (MEMORY_AND_DISK) shuffles once but holds a corpus-sized copy —
    // at 100 TB set false to recompute instead (two shuffles, zero cache;
    // safe because RangePartitioner's sampling is deterministic for the
    // same input + partition count, so both passes see identical pids)
    val shuffled = d.withColumn(tokensCol, col(tokensCol).cast(LongType))
      .repartitionByRange(partitions, col(idCol).asc)
    val ranged =
      if (cacheRanged) Dedup.swapCache("pack_ranged", shuffled) else shuffled
    // pass 1: per-partition totals (≤ `partitions` rows to the driver)
    val partSums = ranged
      .groupBy(spark_partition_id().as("_pid"))
      .agg(sum(col(tokensCol)).as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets: Map[Int, Long] = // exclusive prefix sum over present pids
      partSums.map(_._1).zip(partSums.scanLeft(0L)(_ + _._2)).toMap
    val bc = spark.sparkContext.broadcast(offsets)
    // pass 2: narrow running sum, id order within each range partition.
    // mapPartitionsWithIndex at the RDD level, NOT Dataset.mapPartitions +
    // TaskContext.getPartitionId(): the task id is not the partition id —
    // a downstream coalesce(1) (e.g. a single-file write) packs many range
    // partitions into one task, and every one would seed from offsets(0).
    // The RDD index is the parent partition index under any task packing.
    val sorted = ranged.sortWithinPartitions(col(idCol).asc)
    val tokIdx = sorted.schema.fieldIndex(tokensCol)
    val outSchema = sorted.schema.add("seq_start", LongType)
      .add("pack_id", LongType)
    val packed = sorted.rdd.mapPartitionsWithIndex({ (pid, it) =>
      var run = bc.value.getOrElse(pid, 0L)
      it.map { r =>
        val start = run
        run += r.getLong(tokIdx)
        Row.fromSeq(r.toSeq :+ start :+ (start / blockSize))
      }
    }, preservesPartitioning = true)
    spark.createDataFrame(packed, outSchema)
  }

  /** c1 oracle query: pack the documents corpus into 256-token blocks in
    * doc_id order (whitespace token counts — same tokenization as t2). */
  def packSequences(spark: SparkSession, sfDir: String): DataFrame =
    withPackIds(
      documents(spark, sfDir).select(col("doc_id"),
        size(split(col("text"), " ")).cast(LongType).as("tokens")))
      .select(col("doc_id"), col("tokens"), col("seq_start"), col("pack_id"))

  // ---- c2: materialized training blocks -----------------------------------

  /** The consumer of c1's offsets: materialize the fixed-length blocks
    * themselves — every token of the concatenated corpus lands in block
    * floor(globalPos / blockSize), block text is the tokens in global
    * order (the "concatenate-and-slice" batch a pretraining loader
    * reads). The last block is short rather than padded.
    *
    * Scale shape: one equi-join of the offsets frame back to the docs on
    * the id (both sides corpus-sized → sort-merge join), a narrow
    * posexplode to (globalPos, token) pairs, then ONE shuffle keyed by
    * block id whose per-group state is bounded by blockSize tokens —
    * never a whole-corpus collect or a single-partition window. The
    * oracle rebuilds the same blocks from a string_agg of the whole
    * corpus (fine at oracle SF, impossible at prod SF — which is the
    * point of the distributed shape). */
  def packedBlocks(spark: SparkSession, sfDir: String,
      blockSize: Long = 256L): DataFrame = {
    val offsets = packSequences(spark, sfDir).select(col("doc_id"), col("seq_start"))
    val toks = documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
    offsets.join(toks, Seq("doc_id"))
      .select(col("seq_start"), posexplode(col("toks")).as(Seq("i", "tok")))
      .withColumn("pos", col("seq_start") + col("i"))
      .groupBy(floor(col("pos") / blockSize).as("block_id"))
      .agg(
        count(lit(1)).cast("int").as("n_tokens"),
        array_join(
          sort_array(collect_list(struct(col("pos"), col("tok")))).getField("tok"),
          " ").as("block_text"))
  }
}
