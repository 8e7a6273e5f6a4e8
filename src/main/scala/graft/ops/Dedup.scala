package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for the training-data pipeline, in increasing
  * fuzziness: exact (hash groupBy), MinHash+LSH (shingle → minhash → band
  * → bucket join), SimHash (hamming-banded), n-gram Jaccard verification.
  *
  * Scale notes (100 TB): every variant avoids the O(n²) cross join — LSH
  * band buckets and simhash bands turn near-dup search into an equi-join
  * on a band key, which Spark executes as a shuffled hash join keyed by
  * small band values; candidate verification happens only within buckets.
  * Exact dedup is a single hash aggregation with map-side partials.
  */
object Dedup {

  private def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Persist `df` and release the frame a PREVIOUS invocation cached
    * under the same tag. Lazy callers can't know when their consumer is
    * done with a cached subtree, so an eager unpersist would defeat the
    * cache — instead each new invocation evicts its predecessor's copy,
    * bounding a long-lived session (bench warm-up + trials, notebooks)
    * to ONE cached copy per tag instead of one per call. Unpersisting a
    * frame a still-running plan references is safe (InMemoryRelation
    * recomputes from its child); two concurrent same-tag invocations on
    * one session merely lose caching, not correctness. */
  private[graft] def swapCache(tag: String, df: DataFrame): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    // housekeeping: drop registry entries whose session is gone (a
    // multi-session JVM otherwise pins stopped sessions forever)
    cacheReg.keySet.removeIf(k => k._1.sparkContext.isStopped)
    // Unpersist the predecessor BEFORE persisting: if the new plan
    // canonicalizes sameResult to the old one, persist-first would no-op
    // on the shared CacheManager entry and the eviction would then
    // delete it — leaving the new frame uncached (zero copies, the
    // opposite of the intent). Evict-then-persist re-registers cleanly
    // in that case, at worst recomputing the shared subtree once.
    val prev = cacheReg.put((df.sparkSession, tag), df)
    if (prev != null && (prev ne df)) prev.unpersist(blocking = false)
    df.persist(StorageLevel.MEMORY_AND_DISK)
  }
  private val cacheReg =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  /** The mega-bucket valve, shared by every bucket-collect operator
    * (verifiedPairsOf, simhashPairs, Similarity.embeddingNearDupsOf):
    * keep only rows whose `keyCols` group has ≤ maxBucket members.
    *
    * The pre-pass matters: filtering collect_list OUTPUT by size still
    * materializes the mega bucket inside one aggregation buffer first —
    * the exact OOM the valve exists to prevent. So when a cap is set, a
    * count aggregation (map-side partials, tiny (key, n) result) runs
    * first and a left-semi join keeps only rows of surviving buckets;
    * the extra shuffle is the price of the guarantee and is only paid
    * when the valve is ON. Dropped buckets are dropped WHOLE — their
    * members are boilerplate/template mass better handled by exact dedup
    * upstream; droppedBucketStats counts what the cap discarded. At the
    * default Int.MaxValue this is the identity (oracle parity at test
    * SFs: zero plan change). */
  private[ops] def capBuckets(banded: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame =
    if (maxBucket == Int.MaxValue) banded
    else {
      // The banded frame feeds BOTH the count pre-pass and the semi-join
      // probe; uncached that runs the signature UDF pass (the dominant
      // cost) over every document twice. swapCache bounds it to ~one
      // computation + a small (doc_id, band, hash) cache — banded rows
      // are a few dozen bytes/doc, tiny next to the text they derive from.
      val b = swapCache(s"capBuckets:${keyCols.mkString(",")}", banded)
      val ok = b.groupBy(keyCols.map(col): _*)
        .agg(count(lit(1)).as("__n"))
        .filter(col("__n") <= maxBucket)
        .select(keyCols.map(col): _*)
      b.join(ok, keyCols, "left_semi")
    }

  /** Audit row for a capped run: how many buckets/rows the valve dropped
    * (one aggregate over the same banded frame — production pipelines log
    * this next to the pair output so a silent cap never reads as "covered
    * everything"). */
  def droppedBucketStats(banded: DataFrame, keyCols: Seq[String],
      maxBucket: Int): DataFrame =
    banded.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") > maxBucket)
      .agg(count(lit(1)).as("dropped_buckets"),
        coalesce(sum(col("__n")), lit(0L)).as("dropped_rows"))

  /** Exact dedup: group by content hash, keep min doc_id. One shuffle on
    * md5(text) (partial aggregation map-side). */
  def exact(spark: SparkSession, sfDir: String): DataFrame = {
    documents(spark, sfDir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("keeper_id"),
        count(lit(1)).as("dup_count"))
  }

  // -------------------------------------------------------------- MinHash

  val NumHashes = 64
  val Bands = 16 // 16 bands × 4 rows: ~threshold (1/16)^(1/4) ≈ 0.5 Jaccard
  val RowsPerBand: Int = NumHashes / Bands

  // ---- minhash scheme, shared bit-for-bit with the DuckDB oracle ----
  // shingle hash : base-31 polynomial over Unicode code points, mod 2^32
  // hash_i(h)    : (a_i·h + b_i) mod P with a_i,b_i < 2^31 so the product
  //                fits a signed 64-bit value on both engines
  // band hash    : base-1000003 polynomial fold of the band's 4 signature
  //                values, mod P
  // Everything is closed-form (no PRNG stream), so the oracle can rebuild
  // the exact coefficients with integer SQL.
  val HashP = 4294967311L // prime > 2^32
  val BandB = 1000003L // band-fold base (BandB·P < 2^63: no overflow)
  private val CoefM = 2147483629L // prime < 2^31 bounding a_i / b_i
  private[ops] def coefA(i: Int): Long = ((i + 1) * 2654435761L) % CoefM + 1
  private[ops] def coefB(i: Int): Long = ((i + 1) * 2246822519L) % CoefM
  // hoisted: one coefficient table per JVM, not per row (was a measured
  // cost at 64 draws + 2 allocations per document)
  private val HashAs: Array[Long] = Array.tabulate(NumHashes)(coefA)
  private val HashBs: Array[Long] = Array.tabulate(NumHashes)(coefB)

  /** Word 3-shingles of a document (lowercased). */
  def shingles(text: String, n: Int = 3): Set[String] = {
    if (text == null) return Set.empty
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length < n) return if (words.isEmpty) Set.empty else Set(words.mkString(" "))
    words.sliding(n).map(_.mkString(" ")).toSet
  }

  /** Base-31 code-point polynomial hash, mod 2^32 (oracle-replicable). */
  def shingleHash(s: String): Long = {
    var h = 0L
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      h = (h * 31 + cp) & 0xFFFFFFFFL
      i += Character.charCount(cp)
    }
    h
  }

  /** 64 minhashes via (a_i·h + b_i) mod P over shingle hashes. Closed-form
    * coefficients → deterministic across JVMs and replicable in SQL.
    *
    * Values are EXACTLY those of hashing `shingles(text)` (the oracle's
    * definition), computed without materializing shingle strings or a
    * dedup set: the per-window hash streams code points of the window's
    * words with a literal ' ' joiner (≡ shingleHash of the joined
    * string), and duplicates need no removal because min() over each
    * hash function is duplicate-insensitive — the Set and the string
    * concatenations were measured overhead (~20% of d3/p1), not
    * semantics. */
  def minhash(text: String): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    if (text == null) return sig
    val words = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (words.length == 0) return sig
    val windowLen = math.min(3, words.length)
    val nWindows = if (words.length < 3) 1 else words.length - 2
    var s0 = 0
    while (s0 < nWindows) {
      var h = 0L
      var w = s0
      while (w < s0 + windowLen) {
        if (w > s0) h = (h * 31 + ' ') & 0xFFFFFFFFL
        val s = words(w)
        var i = 0
        while (i < s.length) {
          val cp = s.codePointAt(i)
          h = (h * 31 + cp) & 0xFFFFFFFFL
          i += Character.charCount(cp)
        }
        w += 1
      }
      var i = 0
      while (i < NumHashes) {
        val v = (HashAs(i) * h + HashBs(i)) % HashP
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      s0 += 1
    }
    sig
  }

  /** (id, band, band_hash) rows for ANY (id, text) frame; near-dup
    * candidates collide in ≥1 band. Band hash is a codegen'd Column fold
    * (no UDF, no Spark-private hash — the oracle reproduces it exactly). */
  def bandsOf(d: DataFrame, idCol: String, textCol: String): DataFrame = {
    val mh = udf((t: String) => minhash(t))
    val sigd = d.select(col(idCol), mh(col(textCol)).as("sig"))
    val bandCols = (0 until Bands).map { b =>
      val bh = (0 until RowsPerBand).foldLeft(lit(0L): Column) { (acc, r) =>
        (acc * BandB + col("sig")(b * RowsPerBand + r) % HashP) % HashP
      }
      struct(lit(b).as("band"), bh.as("band_hash"))
    }
    sigd.select(col(idCol), explode(array(bandCols: _*)).as("bh"))
      .select(col(idCol), col("bh.band").as("band"), col("bh.band_hash").as("band_hash"))
  }

  /** doc_id → (band, band_hash) over the documents table. */
  def minhashBands(spark: SparkSession, sfDir: String): DataFrame =
    bandsOf(documents(spark, sfDir), "doc_id", "text")

  /** Jaccard-verified near-dup pairs for ANY (id, text) frame — the
    * bucket-collect candidate generation of minhashPairs, reusable by the
    * curation pipeline.
    *
    * `maxBucket` is the 100 TB safety valve: a boilerplate-heavy corpus
    * can put millions of docs into one band bucket, and the in-bucket
    * pair explosion is |bucket|² — a mega-bucket is both an OOM risk
    * (collect_list) and useless for dedup (its members are better
    * handled by exact dedup / template detection upstream). Buckets
    * larger than the cap are dropped WHOLE; Int.MaxValue (the default,
    * shared with the oracles) disables the cap. Production pipelines
    * should set it to O(10³) and count the dropped buckets. */
  def verifiedPairsOf(d: DataFrame, idCol: String, textCol: String,
      minJaccard: Double, maxBucket: Int = Int.MaxValue): DataFrame =
    verifiedPairsFromBands(bandsOf(d, idCol, textCol), d, idCol, textCol,
      minJaccard, maxBucket)

  /** `verifiedPairsOf` over a PRE-BUILT banded frame — lets a caller
    * (Pipeline.run) share one banded computation between pair generation
    * and the droppedBucketStats lineage audit. */
  def verifiedPairsFromBands(banded: DataFrame, d: DataFrame,
      idCol: String, textCol: String,
      minJaccard: Double, maxBucket: Int = Int.MaxValue): DataFrame = {
    val bands = capBuckets(banded, Seq("band", "band_hash"), maxBucket)
    val cands = bands
      .groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col(idCol)).as("ids"))
      .filter(size(col("ids")) > 1 && size(col("ids")) <= maxBucket)
      .select(explode(col("ids")).as("id_a"), col("ids"))
      .select(col("id_a"), explode(col("ids")).as("id_b"))
      .filter(col("id_a") < col("id_b"))
      .distinct()
    val texts = d.select(col(idCol), col(textCol))
    val jac = udf((x: String, y: String) => ngramJaccard(x, y))
    cands
      .join(texts.withColumnRenamed(idCol, "id_a").withColumnRenamed(textCol, "text_a"), "id_a")
      .join(texts.withColumnRenamed(idCol, "id_b").withColumnRenamed(textCol, "text_b"), "id_b")
      .withColumn("jaccard", round(jac(col("text_a"), col("text_b")), 6))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }

  /** Candidate pairs from LSH buckets, verified with exact n-gram Jaccard.
    * Candidate generation is bucket-collect, not a self-join: ONE pass
    * computes signatures (the dominant cost — a self-join recomputes the
    * minhash UDF on both sides), one shuffle groups by (band, band_hash),
    * and pairs explode within each bucket. Work is Σ|bucket|² either way
    * (inherent to LSH); a pathological all-identical corpus concentrates
    * in one bucket under both shapes. */
  def minhashPairs(spark: SparkSession, sfDir: String, minJaccard: Double = 0.5): DataFrame =
    verifiedPairsOf(documents(spark, sfDir), "doc_id", "text", minJaccard)

  /** n-gram Jaccard as a standalone surfaced op: similarity of each
    * consecutive doc_id pair — a deterministic, oracle-checkable slice of
    * the same verification kernel minhashPairs uses inside buckets. The
    * pairing join is an equi-join on doc_id+1 (no cross join). */
  def consecutiveJaccard(spark: SparkSession, sfDir: String): DataFrame = {
    val d = documents(spark, sfDir).select(col("doc_id"), col("text"))
    val jac = udf((x: String, y: String) => ngramJaccard(x, y))
    d.as("a")
      .join(d.as("b"), col("b.doc_id") === col("a.doc_id") + 1)
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        round(jac(col("a.text"), col("b.text")), 6).as("jaccard"))
  }

  /** Connected components over the near-dup pair graph: every document
    * labeled with the SMALLEST doc_id reachable through verified pairs —
    * its cluster keeper — turning pairwise dedup output into the
    * per-cluster decision a pipeline actually applies (keep one doc per
    * cluster, not "drop the greater member of each pair", which
    * over-keeps on transitive chains a~b~c).
    *
    * Shape: iterative min-label propagation (label(v) ← min(label(v),
    * min over neighbors)) ACCELERATED with path halving: each round also
    * folds in label(label(v)) (pointer jumping — cluster_id is always an
    * existing doc_id, so the labels⋈labels self-join is total). The
    * distance-to-root roughly halves per round on top of the one-hop
    * neighbor step, so convergence is O(log diameter) rounds instead of
    * O(diameter) — the same reason the alternating large-star/small-star
    * MapReduce CC algorithms run in logarithmic rounds — at the price of
    * one extra (id, label) equi-join per round. A round that converges
    * under plain propagation converges at least as fast here, and the
    * fixpoint is identical (labels only decrease and never leave the
    * component, and any combined-operator fixpoint is a neighbor-min
    * fixpoint). `maxIter` caps adversarial graphs; a capped
    * non-converged run now LOGS A WARNING so it is distinguishable from
    * a converged one. Each round EAGERLY localCheckpoints its labels: without
    * lineage truncation the logical plan doubles per round (labels feeds
    * both the join and the convergence check) and round ~9 OOMs the
    * driver just RENDERING the plan — the standard Spark iterative-
    * algorithm discipline (GraphX Pregel materializes per round too).
    * At 100 TB every round is two shuffles over (id, label) pairs, NOT
    * over documents; a long-lived production job would point
    * setCheckpointDir at durable storage and use checkpoint() for
    * executor-loss tolerance. */
  def clustersOf(pairs: DataFrame, ids: DataFrame, maxIter: Int = 20): DataFrame = {
    import org.apache.spark.storage.StorageLevel
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = ids.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    var it = 0
    var converged = false
    while (it < maxIter && !converged) {
      val nbrMin = edges
        .join(labels.select(col("doc_id").as("dst"), col("cluster_id").as("dst_label")), "dst")
        .groupBy(col("src").as("doc_id"))
        .agg(min(col("dst_label")).as("nbr_label"))
      // path halving: my root's current label (total: every cluster_id IS
      // a doc_id present in labels)
      val grand = labels.select(col("doc_id").as("g_id"), col("cluster_id").as("g_label"))
      val next = labels
        .join(nbrMin, Seq("doc_id"), "left")
        .join(grand, col("cluster_id") === col("g_id"), "left")
        .select(col("doc_id"), col("cluster_id").as("__old"),
          least(col("cluster_id"),
            coalesce(col("nbr_label"), col("cluster_id")),
            coalesce(col("g_label"), col("cluster_id")))
            .as("cluster_id"))
        // convergence indicator rides the SAME materialization instead
        // of a separate next⋈labels join job per round
        .withColumn("__changed", col("cluster_id") =!= col("__old"))
        .drop("__old")
        .localCheckpoint(true) // materialize + TRUNCATE lineage (see note)
      // zero/nonzero is all convergence needs: early-exit scan over the
      // just-checkpointed blocks, no join
      val changed = next.filter(col("__changed")).limit(1).count()
      labels = next.drop("__changed")
      converged = changed == 0
      it += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"clustersOf hit maxIter=$maxIter WITHOUT converging: labels are " +
          "upper bounds, not component minima — raise maxIter (log-diameter " +
          "rounds suffice under path halving)")
    edges.unpersist(blocking = false)
    labels.withColumn("is_keeper", col("doc_id") === col("cluster_id"))
  }

  /** d7: minhash-verified pairs → duplicate clusters over the documents
    * table. */
  def dedupClusters(spark: SparkSession, sfDir: String,
      minJaccard: Double = 0.5, maxIter: Int = 20): DataFrame =
    clustersOf(
      minhashPairs(spark, sfDir, minJaccard),
      documents(spark, sfDir).select(col("doc_id")), maxIter)

  /** Train/test decontamination: flag every corpus document sharing ANY
    * word 3-shingle with a held-out contamination set (here the docs with
    * doc_id < contamIds — the synthetic stand-in for a benchmark suite).
    * The real-pipeline shape at 100 TB: the contamination side is tiny
    * and BROADCASTS (its distinct shingle hashes), the corpus side is one
    * narrow shingle-hash explode + broadcast hash join + per-doc count —
    * no corpus-side shuffle besides the count aggregation. Hash space is
    * the shared closed-form 2^32 polynomial, so the oracle recomputes the
    * same overlap counts in SQL. */
  def decontaminate(spark: SparkSession, sfDir: String,
      contamIds: Int = 10): DataFrame = {
    val d = documents(spark, sfDir).select(col("doc_id"), col("text"))
    decontaminateAgainst(
      d.filter(col("doc_id") >= contamIds),
      d.filter(col("doc_id") < contamIds))
  }

  /** Decontamination against ANY external held-out frame — the shape a
    * real benchmark-decontam job needs: `heldout` is an arbitrary
    * (id, `textCol`) table (a loaded eval set, NOT a slice of the
    * corpus), and `minOverlap` sets how many distinct shared shingles
    * make a corpus document "contaminated" (1 = any overlap; real
    * pipelines use 3–10 to ignore idiom-level collisions). Same plan as
    * `decontaminate`: the held-out side reduces to a DISTINCT shingle-
    * hash set that BROADCASTS (eval suites are ≪ corpus); the corpus
    * side is one narrow shingle explode + broadcast hash join + per-doc
    * distinct count — no corpus-side shuffle besides that aggregation,
    * so the whole check is one pass over the corpus at any scale. */
  def decontaminateAgainst(corpus: DataFrame, heldout: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      minOverlap: Long = 1L): DataFrame = {
    require(minOverlap >= 1, s"minOverlap must be >= 1, got $minOverlap")
    val shUdf = udf((t: String) => shingles(t).toSeq.map(shingleHash))
    val contam = heldout
      .select(explode(shUdf(col(textCol))).as("h")).distinct()
    val hits = corpus
      .select(col(idCol), explode(shUdf(col(textCol))).as("h"))
      .join(broadcast(contam), "h")
      .groupBy(col(idCol))
      .agg(countDistinct(col("h")).as("n_shared"))
    corpus.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        (coalesce(col("n_shared"), lit(0L)) >= minOverlap).as("contaminated"))
  }

  /** Cross-document repeated n-gram statistics — the substring-level
    * dedup signal (à la "Deduplicating Training Data Makes Language
    * Models Better"): per document, how many of its distinct word
    * n-grams also occur in ANOTHER document. High shared_permille marks
    * boilerplate/template mass that document-level dedup missed; the
    * shared-hash table itself is the removal work-list.
    *
    * Scale shape: ONE signature UDF call per row (size + explode_outer
    * off the same array), one count aggregation over (doc, distinct
    * n-gram hash) pairs, one equi-join back + per-doc count — no
    * self-join, no n-gram strings shuffled (64-bit hashes only). Hash
    * collisions hit both engines identically (same closed-form chain
    * the oracle replays). */
  def withRepeatedNgrams(d: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 10,
      cacheSignatures: Boolean = true): DataFrame = {
    val shUdf = udf((t: String) => shingles(t, n).toSeq.map(shingleHash))
    // cacheSignatures (default): BOTH consumers (the shared-hash
    // aggregation and the probe join) read this frame — uncached, Spark
    // re-runs the tokenize+hash UDF under each subtree; the cache is
    // (id, long, long) rows only, no text. The 100 TB valve: the cache is
    // O(total n-grams) rows of MEMORY_AND_DISK with no other off switch,
    // so at sizes where even the spilled footprint is unwelcome, pass
    // false to RECOMPUTE the signature pass per consumer instead (2× UDF
    // CPU bought consciously, zero cache footprint).
    val sigs = d.select(col(idCol), shUdf(col(textCol)).as("hs"))
      .select(col(idCol), size(col("hs")).as("n_ngrams"),
        explode_outer(col("hs")).as("h")) // empty docs keep a null-h row
    val f = if (cacheSignatures) swapCache("d8-ngrams", sigs) else sigs
    val shared = f.filter(col("h").isNotNull)
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .select(col("h"), lit(true).as("is_shared"))
    // one left join + ONE per-doc aggregation computes totals and shared
    // counts together (count(is_shared) skips nulls ⇒ unshared/null-h
    // rows don't count)
    f.join(shared, Seq("h"), "left")
      .groupBy(col(idCol))
      .agg(max(col("n_ngrams")).cast("long").as("n_ngrams"),
        count(col("is_shared")).as("n_shared"))
      .select(col(idCol), col("n_ngrams"), col("n_shared"),
        when(col("n_ngrams") === 0, lit(0L)).otherwise(
          expr("n_shared * 1000 div n_ngrams"))
          .as("shared_permille"))
  }

  def repeatedNgrams(spark: SparkSession, sfDir: String, n: Int = 10): DataFrame =
    withRepeatedNgrams(documents(spark, sfDir), n = n)

  /** Exact n-gram (word 3-shingle) Jaccard similarity. */
  def ngramJaccard(a: String, b: String): Double = {
    val sa = shingles(a)
    val sb = shingles(b)
    if (sa.isEmpty && sb.isEmpty) 1.0
    else {
      val inter = sa.intersect(sb).size
      inter.toDouble / (sa.size + sb.size - inter)
    }
  }

  // -------------------------------------------------------------- SimHash

  /** 64-bit SimHash over word hashes (weight = term frequency). The
    * 64 word-hash bits come from TWO independent 32-bit code-point
    * polynomial hashes (bases 31 and 37, mod 2^32) — no wrapping 64-bit
    * multiply anywhere, so the d4/d5 oracles recompute the exact same
    * bits in integer SQL. */
  def simhash(text: String): Long = {
    if (text == null) return 0L
    val acc = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { w =>
      if (w.nonEmpty) {
        var hi = 0L // base-31 poly → bits 32..63
        var lo = 0L // base-37 poly → bits 0..31
        var i = 0
        while (i < w.length) {
          val cp = w.codePointAt(i)
          hi = (hi * 31 + cp) & 0xFFFFFFFFL
          lo = (lo * 37 + cp) & 0xFFFFFFFFL
          i += Character.charCount(cp)
        }
        var b = 0
        while (b < 32) {
          if (((lo >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          if (((hi >>> b) & 1L) == 1L) acc(b + 32) += 1 else acc(b + 32) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (acc(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def simhashes(spark: SparkSession, sfDir: String): DataFrame = {
    val sh = udf((t: String) => simhash(t))
    documents(spark, sfDir).select(col("doc_id"), sh(col("text")).as("simhash"))
  }

  /** Near-dup pairs with hamming distance ≤ maxDist via 4×16-bit band
    * blocking (a pair within distance 3 must agree on ≥1 band). Same
    * bucket-collect shape as minhashPairs: one pass + one shuffle.
    * `maxBucket`: same whole-bucket valve as verifiedPairsOf (a
    * template-heavy corpus concentrates mass in few band values — one hot
    * bucket is one OOM'd task without the cap). Default uncapped for
    * oracle parity at test SFs. */
  def simhashPairs(spark: SparkSession, sfDir: String, maxDist: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame =
    simhashPairsOf(simhashes(spark, sfDir), maxDist, maxBucket)

  /** simhashPairs over ANY (doc_id, simhash) frame. */
  def simhashPairsOf(sh: DataFrame, maxDist: Int = 3,
      maxBucket: Int = Int.MaxValue): DataFrame = {
    val banded0 = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftrightunsigned(col("simhash"), b * 16)
            .bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"),
        col("bb.band").as("band"), col("bb.band_val").as("band_val"))
    val banded = capBuckets(banded0, Seq("band", "band_val"), maxBucket)
    banded
      .groupBy(col("band"), col("band_val"))
      .agg(collect_list(struct(col("doc_id"), col("simhash"))).as("xs"))
      .filter(size(col("xs")) > 1)
      .select(explode(col("xs")).as("a"), col("xs"))
      .select(col("a"), explode(col("xs")).as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .filter(col("hamming") <= maxDist)
      .distinct()
  }
}
