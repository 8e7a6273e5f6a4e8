package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextOps}

/** End-to-end training-data curation over a contract-schema table — the
  * composition proof that the engine's pieces are one pipeline, not a
  * bag of demos: extract → quality-filter → exact dedup → fuzzy dedup →
  * language annotation, in FOUR shuffles total at any scale.
  *
  * Stage shapes (each documented at its operator):
  *  1. extract: skew-isolated narrow parse (SgmlExtract.extractDf over
  *     sizeAwareRepartition) — shuffle 0 (the repartition).
  *  2. text + quality: narrow column ops (TextOps.withQuality), filter.
  *  3. exact dedup: row_number over a window keyed by md5(text), keep
  *     the lowest doc_id — shuffle 1, no join.
  *  4. fuzzy dedup: MinHash band bucket-collect → Jaccard-verified pairs
  *     (Dedup.verifiedPairsOf) — shuffle 2 (band groupBy); survivors via
  *     left-anti join on the losers (every doc that is the GREATER member
  *     of a verified pair — deterministic, order-free) — shuffle 3.
  *     Losers are bounded by the duplicate rate, so the anti-join's
  *     small side broadcasts in practice (Spark decides; no hint forced).
  *  5. language annotation: narrow (TextOps.withLangId).
  *
  * Deterministic end to end, and SQL-expressible stage by stage — the
  * p1_curate query is value-verified against a DuckDB oracle that
  * replays the identical pipeline from scratch.
  */
object Pipeline {

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** spark-submit entry:
    * {{{
    * spark-submit --class graft.Pipeline <jar> <inPath> <outPath> \
    *   [dialect=html4] [space=preserve] [minJaccard=0.5] [partitions=0] \
    *   [runId=run-0] [format=parquet] [resume=true]
    * }}}
    * Writes `<outPath>/{extracted,curated,lineage}`. */
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Pipeline <inPath> <outPath> [k=v …]")
    val kv = args.drop(2).flatMap(_.split("=", 2) match {
      case Array(k, v) => Some(k -> v)
      case _ => None
    }).toMap
    val spark = SparkSession.builder()
      .appName("graft-pipeline")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .getOrCreate()
    val cfg = Config(
      extract = SgmlExtract.Config(
        dialect = kv.getOrElse("dialect", "html4"),
        space = kv.getOrElse("space", "preserve")),
      minJaccard = kv.getOrElse("minJaccard", "0.5").toDouble,
      partitions = kv.getOrElse("partitions", "0").toInt,
      maxBucket = kv.get("maxBucket").map(_.toInt)
        .getOrElse(Config().maxBucket))
    run(spark, args(0), args(1), cfg,
      runId = kv.getOrElse("runId", "run-0"),
      format = kv.getOrElse("format", "parquet"),
      resume = kv.getOrElse("resume", "true").toBoolean)
    spark.stop()
  }

  final case class Config(
      extract: SgmlExtract.Config = SgmlExtract.Config(dialect = "html4", space = "preserve"),
      minJaccard: Double = 0.5,
      partitions: Int = 0, // 0 = leave the input partitioning alone
      /** LSH mega-bucket cap (Dedup.verifiedPairsOf) — the 100 TB safety
        * valve, ON by default: a bucket holding >1000 docs is template/
        * boilerplate mass whose Σ|bucket|² pair explosion can stall a
        * stage, and exact dedup upstream already collapsed true copies.
        * BREAKING since r4 for library callers: the default was
        * Int.MaxValue (uncapped) through r3 — curate/curateExtracted/
        * curateClustered results can differ on corpora with >1000-doc
        * near-dup cohorts unless Int.MaxValue is passed explicitly.
        * Every capped run is auditable — `run` writes a
        * `fuzzy_dedup_cap` lineage row with dropped_buckets/dropped_rows,
        * and library callers of curate* get the same numbers from
        * `Pipeline.dropAudit`. The oracle entries (p1/p2) pass
        * Int.MaxValue explicitly: the uncapped path stays value-verified
        * against DuckDB. */
      maxBucket: Int = 1000)

  /** Valve audit for library callers of curate/curateExtracted (the
    * `run` entry writes this into lineage automatically): the
    * dropped-bucket stats of the SAME banded frame the fuzzy stage
    * builds, so a capped run never silently reads as "covered
    * everything". One row: (dropped_buckets, dropped_rows) — zeros when
    * nothing was over the cap. Callers of `curate(docs, cfg)` pass
    * `SgmlExtract.extractDf(docs, cfg.extract)` as `extracted`; the
    * banded frame is served from the capBuckets swapCache when the
    * curation ran on this session, so the audit does not re-pay the
    * signature pass. */
  def dropAudit(extracted: DataFrame, cfg: Config = Config()): DataFrame = {
    val exact = exactStage(qualityStage(extracted))
    Dedup.droppedBucketStats(Dedup.bandsOf(exact, "doc_id", "text"),
      Seq("band", "band_hash"), cfg.maxBucket)
  }

  /** Contract table (doc_id, spans) → curated (doc_id, text, predicted_lang,
    * n_words). */
  def curate(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val repart =
      if (cfg.partitions > 0)
        SgmlExtract.sizeAwareRepartition(docs, cfg.partitions)
      else docs
    curateExtracted(SgmlExtract.extractDf(repart, cfg.extract), cfg)
  }

  /** Stage 2: span-concat + error count + quality gate — shared verbatim
    * by the streaming leg (StreamingExtract.curatedStream), so the batch
    * and streaming quality semantics cannot drift apart. */
  private[graft] def qualityStage(extracted: DataFrame,
      keep: Seq[String] = Nil): DataFrame = {
    // `keep`: extra input columns carried through the projection (the
    // streaming leg threads its event-time column this way — a narrow
    // passthrough, not a join)
    val texts = extracted
      .select(col("doc_id") +:
        expr("aggregate(spans, '', (acc, sp) -> acc || sp.text)").as("text") +:
        size(col("errors")).as("n_errors") +:
        keep.map(col): _*)
    TextOps.withQuality(texts)
      .filter(col("is_quality") && col("n_errors") === 0)
      .select(col("doc_id") +: col("text") +: col("n_words") +:
        keep.map(col): _*)
  }

  /** Stage 3: exact dedup — keep the lowest doc_id per content hash.
    * Window + row_number, one shuffle, no join. */
  private def exactStage(quality: DataFrame): DataFrame = {
    val wHash = Window.partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    quality
      .withColumn("__rn", row_number().over(wHash))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Stages 2-5 over an ALREADY-extracted frame (doc_id, spans, errors) —
    * lets `run` parse once and feed several consumers. */
  def curateExtracted(extracted: DataFrame, cfg: Config = Config()): DataFrame = {
    // 2: concat text + quality metrics, drop failed/junk docs
    val quality = qualityStage(extracted)
    // 3: exact dedup — keep the lowest doc_id per content hash.
    // CACHED (Dedup.swapCache): the fuzzy stage references this subtree
    // four times (bands, both verify-join text sides, anti-join left);
    // without the cache each branch re-executes the parse kernel — the
    // dominant cost — under a different column pruning, which also
    // defeats exchange reuse. swapCache releases the copy a previous
    // invocation cached, so repeated calls on a long-lived session hold
    // at most one copy. MEMORY_AND_DISK holds the post-quality text
    // corpus; at sizes where that is unwelcome, materialize to a table
    // (Pipeline.run's extracted product plays that role for the parse
    // leg) and curate from the re-read.
    val exact = Dedup.swapCache("p1-exact", exactStage(quality))
    // 4+5: fuzzy dedup (drop the greater member of every verified pair)
    // + language annotation — shared with `run`
    finishCurate(exact,
      Dedup.verifiedPairsOf(exact, "doc_id", "text",
        cfg.minJaccard, cfg.maxBucket))
  }

  /** Stages 4-5 given the exact-deduped frame and its verified pairs:
    * losers (the greater member of each pair) drop via anti-join, then
    * language annotation and the curated column contract. ONE home for
    * this tail — `curateExtracted` and `run` must not drift. */
  private def finishCurate(exact: DataFrame, pairs: DataFrame): DataFrame = {
    val losers = pairs.select(col("id_b").as("doc_id")).distinct()
    TextOps.withLangId(exact.join(losers, Seq("doc_id"), "left_anti"))
      .select(col("doc_id"), col("text"), col("predicted_lang"), col("n_words"))
  }

  /** Cluster-keeper curation: stages 1–3 as `curate`, but fuzzy dedup
    * keeps exactly ONE doc per CONNECTED COMPONENT of the verified-pair
    * graph (the smallest doc_id — Dedup.clustersOf) instead of dropping
    * the greater member of each pair. The difference matters on
    * transitive chains with a skipped edge: pairs (3,9) and (1,9) form
    * the cluster {1,3,9}, but 3 is never a pair's greater member, so the
    * pairwise rule keeps BOTH 1 and 3 — the cluster rule keeps only 1.
    * Costs the component iteration (O(diameter) rounds over (id, label)
    * pairs) on top of curate's four shuffles; the p2 oracle replays it
    * with a recursive-CTE transitive closure. */
  def curateClustered(docs: DataFrame, cfg: Config = Config()): DataFrame = {
    val repart =
      if (cfg.partitions > 0)
        SgmlExtract.sizeAwareRepartition(docs, cfg.partitions)
      else docs
    val extracted = SgmlExtract.extractDf(repart, cfg.extract)
    val quality = qualityStage(extracted)
    val exact = Dedup.swapCache("p2-exact", exactStage(quality))
    val pairs = Dedup.verifiedPairsOf(exact, "doc_id", "text",
      cfg.minJaccard, cfg.maxBucket)
    val keepers = Dedup.clustersOf(pairs, exact.select(col("doc_id")))
      .filter(col("is_keeper")).select(col("doc_id"))
    val deduped = exact.join(keepers, Seq("doc_id"), "left_semi")
    TextOps.withLangId(deduped)
      .select(col("doc_id"), col("text"), col("predicted_lang"), col("n_words"))
  }

  /** Listing digest of an input path for the resume fingerprint: file
    * count, total bytes, max modification time over non-hidden files.
    * Metadata-only (no data read). Paths that cannot be listed (a table
    * identifier rather than a directory) degrade to a constant so resume
    * still works config-guarded, with a warning. */
  private[graft] def inputDigest(spark: SparkSession, inPath: String): String =
    try {
      val p = new org.apache.hadoop.fs.Path(inPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      var n = 0L
      var bytes = 0L
      var maxMtime = 0L
      while (it.hasNext) {
        val st = it.next()
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          n += 1
          bytes += st.getLen
          if (st.getModificationTime > maxMtime) maxMtime = st.getModificationTime
        }
      }
      s"files=$n bytes=$bytes maxMtime=$maxMtime"
    } catch {
      case e: Exception =>
        log.warn(s"inputDigest: cannot list '$inPath' (${e.getMessage}); " +
          "resume will guard on config only — stale-input reuse is possible")
        "unlisted"
    }

  /** Production entry: read a contract table, PARSE ONCE, write the
    * extracted product, then derive curated output + per-partition
    * lineage from the cheap columnar re-read — the expensive leg (the
    * parse kernel) never runs twice (same single-scan discipline as
    * graft.Resume; the r1 review flagged exactly this 2× amplification
    * pattern). */
  def run(spark: SparkSession, inPath: String, outPath: String,
      cfg: Config = Config(), runId: String = "run-0",
      format: String = "parquet", resume: Boolean = true): Unit = {
    // Stage-level resume (north rule "partial runs continue without
    // recomputation"): a committed extracted product (_SUCCESS present)
    // is the checkpoint — a re-run after a crash in the curation leg
    // skips the parse, the expensive stage, entirely. File-granular
    // resume WITHIN the parse leg is graft.Resume (manifest per input
    // file); compose them by pointing `inPath` at Resume's output.
    // The checkpoint is only valid for the SAME input and parse config:
    // a fingerprint written next to the product guards against silently
    // reusing a stale extract for a different inPath / dialect / layout —
    // AND for changed CONTENT at the same inPath: the fingerprint folds in
    // a listing digest of the input (file count, total bytes, max mtime),
    // so re-running after the input files were replaced or appended
    // re-parses instead of silently curating from stale data. The listing
    // is a metadata-only namenode op the read pays anyway; for
    // non-filesystem inputs (an Iceberg table identifier), the digest
    // degrades to a constant and config-only guarding — Iceberg's own
    // snapshot id is the right digest there (documented day-one gap).
    val fingerprint =
      s"in=$inPath format=$format partitions=${cfg.partitions} " +
        s"extract=${cfg.extract} input={${inputDigest(spark, inPath)}}"
    val successMarker =
      new org.apache.hadoop.fs.Path(s"$outPath/extracted/_SUCCESS")
    val metaPath = new org.apache.hadoop.fs.Path(s"$outPath/extracted/_graft_meta")
    val fs = successMarker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def committedFingerprint: Option[String] =
      if (!fs.exists(metaPath)) None
      else {
        val in = fs.open(metaPath)
        try Some(new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8))
        finally in.close()
      }
    val reusable = resume && fs.exists(successMarker) &&
      committedFingerprint.contains(fingerprint)
    if (resume && fs.exists(successMarker) && !reusable)
      log.warn(s"resume: committed extract at $outPath/extracted was built " +
        s"with ${committedFingerprint.getOrElse("<no fingerprint>")}; " +
        s"this run wants '$fingerprint' — re-parsing")
    if (reusable)
      log.info(s"resume: reusing committed extract at $outPath/extracted")
    else {
      val docs = SgmlExtract.readDocs(spark, inPath, format).toDF()
      val repart =
        if (cfg.partitions > 0)
          SgmlExtract.sizeAwareRepartition(docs, cfg.partitions)
        else docs
      SgmlExtract.extractDf(repart, cfg.extract)
        .withColumn("__pid", spark_partition_id())
        .write.mode("overwrite").parquet(s"$outPath/extracted")
      val out = fs.create(metaPath, true)
      try out.write(fingerprint.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      finally out.close()
    }
    val extracted = spark.read.parquet(s"$outPath/extracted")
    val extractRows = extracted
      .groupBy(col("__pid").as("partition_id"))
      .agg(count(lit(1)).as("docs"),
        sum(expr("aggregate(spans, 0L, (a, s) -> a + length(coalesce(s.text, '')))")).as("bytes"),
        sum(size(col("spans")).cast("long")).as("spans"),
        sum(size(col("errors")).cast("long")).as("errors"))
      .select(lit(runId).as("run_id"), lit("extract").as("stage"),
        col("partition_id"), col("docs"), col("bytes"), col("spans"),
        col("errors"),
        lit(null).cast("long").as("dropped_buckets"),
        lit(null).cast("long").as("dropped_rows"))
    // Stages 3-5 inlined (vs curateExtracted) so the banded frame is
    // SHARED between pair generation and the cap-audit lineage row —
    // a capped run must be auditable without a second signature pass.
    val exact = Dedup.swapCache("run-exact",
      exactStage(qualityStage(extracted.drop("__pid"))))
    val banded = Dedup.bandsOf(exact, "doc_id", "text")
    finishCurate(exact,
      Dedup.verifiedPairsFromBands(banded, exact, "doc_id", "text",
        cfg.minJaccard, cfg.maxBucket))
      .write.mode("overwrite").parquet(s"$outPath/curated")
    // Lineage LAST: per-partition extract metrics, plus the valve audit
    // row whenever a cap is active (zeros when nothing was dropped — the
    // row's presence is the audit; reads banded from the capBuckets
    // cache, no second signature pass). Uncapped runs have no valve to
    // audit and skip the row rather than pay an extra banded pass.
    val lineage =
      if (cfg.maxBucket == Int.MaxValue) extractRows
      else extractRows.unionByName(
        Dedup.droppedBucketStats(banded, Seq("band", "band_hash"),
            cfg.maxBucket)
          .select(lit(runId).as("run_id"),
            lit("fuzzy_dedup_cap").as("stage"),
            lit(null).cast("int").as("partition_id"),
            lit(null).cast("long").as("docs"),
            lit(null).cast("long").as("bytes"),
            lit(null).cast("long").as("spans"),
            lit(null).cast("long").as("errors"),
            col("dropped_buckets"), col("dropped_rows")))
    lineage.write.mode("overwrite").parquet(s"$outPath/lineage")
  }
}
