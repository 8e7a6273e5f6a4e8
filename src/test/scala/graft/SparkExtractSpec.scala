package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.Dedup

/** Spark-surface integration tests: the mapPartitions extraction kernel,
  * interleaved media passthrough through the Dataset API, lineage rows,
  * size-aware skew repartition, plan shape (pushdown before the opaque
  * kernel), and the training-data ops. */
class SparkExtractSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def cfg = SgmlExtract.Config(dialect = "html4", space = "preserve")

  test("extract parses interleaved docs end-to-end (identity on plain text)") {
    import spark.implicits._
    val docs = SgmlExtract.wrapDocuments(spark, sf)
    val out = SgmlExtract.extract(docs, cfg)
    val joined = out.toDF().as("o")
      .join(spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"), col("text")).as("d"), "doc_id")
    val bad = joined.filter(
      size(col("spans")) =!= 1 || col("spans")(0)("text") =!= col("text")).count()
    assert(bad == 0)
    assert(out.count() == 500)
  }

  test("catalyst expression path ≡ typed mapPartitions path") {
    import spark.implicits._
    val docs = SgmlExtract.wrapDocumentsMarked(spark, sf)
    val typed = SgmlExtract.extract(docs, cfg).toDF()
    val exprd = SgmlExtract.extractDf(docs.toDF(), cfg)
    assert(typed.schema.map(f => (f.name, f.dataType)) ===
      exprd.schema.map(f => (f.name, f.dataType)))
    val diff = typed.as("a").join(exprd.as("b"), "doc_id")
      .filter(col("a.spans") =!= col("b.spans") || col("a.errors") =!= col("b.errors"))
    assert(diff.count() === 0)
    assert(exprd.count() === 500)
    // SQL surface via the registered function
    docs.toDF().createOrReplaceTempView("docs_v")
    val viaSql = spark.sql(
      "SELECT doc_id, extract_spans(spans, 'html4', 'preserve').spans AS spans FROM docs_v")
    assert(viaSql.select(sum(size(col("spans")))).collect()(0).getLong(0) ===
      exprd.select(sum(size(col("spans")))).collect()(0).getLong(0))
  }

  test("boilerplate strip: chrome removed, main text + inline links survive") {
    import graft.sgml._
    val html = "<html><head><title>T</title><style>x{}</style></head><body>" +
      "<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a></nav>" +
      "<div><a href=\"/x\">Related article one</a> <a href=\"/y\">Related article two</a></div>" +
      "<p>An article sentence with an <a href=\"/in\">inline link</a> inside." +
      "<footer>(c)</footer></body></html>"
    val cfg = ParserConfig(dialect = Dialect.Html4, space = SpaceMode.Preserve,
      boilerplate = true)
    val (spans, _) = SgmlParser.spans(html, cfg)
    assert(spans.map(_.text).mkString ===
      "An article sentence with an inline link inside.")
    // off: same doc parses to full content
    val (all, _) = SgmlParser.spans(html, cfg.copy(boilerplate = false))
    assert(all.map(_.text).mkString.contains("Home"))
    assert(all.map(_.text).mkString.contains("T"))
    // spark surface end-to-end on the corpus wrap
    val out = SgmlExtract.extractDf(
      SgmlExtract.wrapDocumentsBoiler(spark, sf),
      SgmlExtract.Config(dialect = "html4", space = "preserve", boilerplate = true))
    val joined = out.as("o").join(
      spark.read.parquet(s"$sf/documents.parquet")
        .select(col("doc_id").cast("string").as("doc_id"), col("text")).as("d"), "doc_id")
    assert(joined.filter(
      expr("aggregate(spans, '', (acc, sp) -> acc || sp.text)") =!= col("text")).count() === 0)
  }

  test("interleaved media spans pass through in order") {
    import spark.implicits._
    val ds = Seq(
      Doc("a", Seq(
        InSpan("text", "<p>x", null, 0),
        InSpan("media", "", "vid.mp4", 10),
        InSpan("text", "y</p>", null, 20)))).toDS()
    val r = SgmlExtract.extract(ds, cfg).collect()(0)
    assert(r.spans.map(s => (s.kind, s.text, s.media_ref)) == Seq(
      ("text", "x", null), ("media", "", "vid.mp4"), ("text", "y", null)))
    assert(r.spans.map(_.offset) == r.spans.map(_.offset).sorted)
  }

  test("poisoned doc yields error row, not task failure") {
    import spark.implicits._
    val ds = Seq(
      Doc("ok", Seq(InSpan("text", "<p>fine</p>", null, 0))),
      Doc("null-spans", null),
      Doc("huge", Seq(InSpan("text", "<p>" + ("x" * 100), null, 0)))).toDS()
    val small = SgmlExtract.Config(dialect = "html4", space = "preserve", maxDocChars = 50)
    val rs = SgmlExtract.extract(ds, small).collect().sortBy(_.doc_id)
    assert(rs.length == 3)
    val huge = rs.find(_.doc_id == "huge").get
    assert(huge.errors.exists(_.code == "doc-too-large"))
    assert(rs.find(_.doc_id == "ok").get.errors.isEmpty)
  }

  test("lineage: one row per parse partition, totals match") {
    import spark.implicits._
    val docs = SgmlExtract.wrapDocuments(spark, sf).repartition(3)
    val ex = SgmlExtract.extract(docs, cfg)
    val lin = SgmlExtract.lineage(ex, "run-1").collect()
    assert(lin.length == 3)
    assert(lin.map(_.getAs[Long]("docs")).sum == 500)
    assert(lin.forall(_.getAs[String]("run_id") == "run-1"))
  }

  test("size-aware repartition isolates whales") {
    import spark.implicits._
    val docs = (1 to 100).map(i => Doc(s"d$i", Seq(InSpan("text", "small", null, 0)))) ++
      Seq(Doc("whale1", Seq(InSpan("text", "w" * 3000, null, 0))),
          Doc("whale2", Seq(InSpan("text", "w" * 3000, null, 0))))
    val df = docs.toDS().toDF()
    val rep = SgmlExtract.sizeAwareRepartition(df, 4, whaleChars = 1000,
      whalePartitions = 2)
    val parts = rep.withColumn("pid", spark_partition_id())
      .filter(col("doc_id").startsWith("whale"))
      .select("doc_id", "pid").as[(String, Int)].collect().toMap
    // round-robin whale placement: 2 whales over 2 whale partitions →
    // exactly one whale per task, deterministically (never co-located)
    assert(parts.size == 2)
    assert(parts.values.toSet.size == 2, s"whales co-located: $parts")
    // nothing lost
    assert(rep.count() === 102)
  }

  test("observed metrics ride the job: docs/spans/errors/chars in one pass") {
    import org.apache.spark.sql.Observation
    val docs = SgmlExtract.wrapDocumentsMarked(spark, sf)
    val obs = Observation("graft")
    val out = SgmlExtract.withObservedMetrics(
      SgmlExtract.extractDf(docs.toDF(), cfg), obs)
    val written = out.count() // the consuming action; metrics piggyback
    val m = obs.get
    assert(m("docs") === written)
    assert(m("docs") === 500L)
    assert(m("spans") === 1500L) // text + tail + media per doc
    assert(m("errors") === 0L)
    assert(m("chars").asInstanceOf[Long] > 0L)
  }

  test("sgml_spans UDF surface (LATERAL VIEW ergonomics)") {
    SgmlExtract.registerUdfs(spark)
    val n = spark.sql(
      """SELECT s.kind, s.text FROM (SELECT '<ul><li>a<li>b</ul>' AS m)
        |LATERAL VIEW explode(sgml_spans(m, 'html4', 'sgml')) t AS s""".stripMargin)
      .collect()
    assert(n.map(_.getString(1)).toSeq == Seq("a", "b"))
    // spec-interpreter SQL surface: xpath.pl dialect over the parsed DOM
    val x = spark.sql(
      """SELECT sgml_xpath('<ul><li>a<li>b</ul>', '//li(last)/text', 'html4') AS r""")
      .collect()(0).getSeq[String](0)
    assert(x == Seq("b"))
  }

  test("plan shape: column pruning reaches the scan before the kernel") {
    val docs = SgmlExtract.wrapDocuments(spark, sf)
    val plan = docs.queryExecution.executedPlan.toString
    // only doc_id and text may be read — lang/source/n_chars pruned
    assert(plan.contains("ReadSchema"))
    assert(!plan.contains("n_chars"), plan)
  }

  test("dedup: exact finds injected duplicates; minhash finds near-dups") {
    import spark.implicits._
    import graft.ops.Dedup
    assert(Dedup.ngramJaccard("a b c d e f", "a b c d e f") == 1.0)
    assert(Dedup.ngramJaccard("a b c d e f", "x y z w v u") == 0.0)
    val near = Dedup.ngramJaccard(
      "the quick brown fox jumps over the lazy dog today",
      "the quick brown fox jumps over the lazy cat today")
    assert(near > 0.3 && near < 1.0)
    // simhash of near-identical texts within small hamming distance
    val h1 = Dedup.simhash("the quick brown fox jumps over the lazy dog " * 5)
    val h2 = Dedup.simhash(("the quick brown fox jumps over the lazy dog " * 5) + "tail")
    assert(java.lang.Long.bitCount(h1 ^ h2) <= 8)
  }

  test("knn: brute-force exact ranks correctly; LSH restricts to buckets") {
    import graft.ops.Similarity
    val exact = Similarity.knnBruteForce(spark, sf, numQueries = 5, k = 5).collect()
    assert(exact.length == 25) // 5 queries × 5 ranked neighbors
    val ranks = exact.groupBy(_.getLong(0)).values
    assert(ranks.forall(_.map(_.getInt(1)).sorted.sameElements(1 to 5)))
    // multi-table multi-probe LSH is approximate: with probeBits = b,
    // every candidate's bucket is within hamming distance b of its
    // query's bucket in at least one hash table — guaranteed by the
    // probe-set construction, asserted here for b = 0 and b = 1
    val buckets = Similarity.lshBuckets(spark, sf, nPlanes = 2)
      .select("vec_id", "tbl", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    def maxMinHamming(rows: Array[org.apache.spark.sql.Row]): Int =
      rows.map { r =>
        (0 until Similarity.DefaultTables).map { t =>
          java.lang.Long.bitCount(buckets((r.getLong(2), t)) ^ buckets((r.getLong(0), t)))
        }.min
      }.max
    val exactBucket =
      Similarity.knnLsh(spark, sf, numQueries = 5, k = 5, nPlanes = 2, probeBits = 0).collect()
    assert(exactBucket.nonEmpty && maxMinHamming(exactBucket) == 0)
    val oneBit =
      Similarity.knnLsh(spark, sf, numQueries = 5, k = 5, nPlanes = 2, probeBits = 1).collect()
    assert(oneBit.nonEmpty && maxMinHamming(oneBit) <= 1)
    val approx = Similarity.knnLsh(spark, sf, numQueries = 5, k = 5, nPlanes = 2).collect()
    assert(approx.nonEmpty && maxMinHamming(approx) <= 2)
    // with 2 planes (4 big buckets), top-1 recall is usually non-zero; the
    // property that matters structurally is determinism
    val again = Similarity.knnLsh(spark, sf, numQueries = 5, k = 5, nPlanes = 2).collect()
    assert(approx.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("knn ivf: cell-restricted search is deterministic, ranked by cosine") {
    import graft.ops.Similarity
    val r1 = Similarity.knnIvf(spark, sf, numQueries = 5, k = 5).collect()
    assert(r1.nonEmpty)
    val byQ = r1.groupBy(_.getAs[Long]("query_id"))
    byQ.values.foreach { rows =>
      val ranks = rows.map(_.getAs[Long]("rank")).sorted
      assert(ranks.head == 1L && ranks.length <= 5)
      assert(ranks.toSet.size == ranks.length) // dense distinct ranking
      // all candidates came from the query's probed cells (nprobe = 4)
      assert(rows.map(_.getAs[Int]("cell")).toSet.size <= 4)
    }
    // deterministic across runs (fixed kmeans seed)
    val r2 = Similarity.knnIvf(spark, sf, numQueries = 5, k = 5).collect()
    assert(r1.map(_.toString).sorted.sameElements(r2.map(_.toString).sorted))
  }

  test("knn pq: ADC ranking is complete, deterministic, self-excluding") {
    import graft.ops.Similarity
    val a = Similarity.knnPq(spark, sf).collect()
    assert(a.length == 50) // 10 queries × full top-5 (flat scan never misses)
    val byQ = a.groupBy(_.getLong(0))
    assert(byQ.keySet == (0L until 10L).toSet)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to 5L))
      assert(!rows.exists(_.getLong(2) == q)) // never its own neighbor
    }
    val b = Similarity.knnPq(spark, sf).collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ==
      b.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
  }

  test("knn ivf+pq: candidates restricted to probed cells, ranked by ADC") {
    import graft.ops.Similarity
    val composite = Similarity.knnIvfPq(spark, sf).collect()
    assert(composite.nonEmpty)
    // every returned neighbor really lives in one of its query's probed
    // cells: cross-check the cell column against the flat assignment
    composite.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).sorted.sameElements(1L to rows.length))
      assert(rows.map(_.getInt(3)).toSet.size <= 4) // ≤ nprobe distinct cells
      assert(!rows.exists(_.getLong(2) == q))
    }
    // determinism across re-runs (fresh fit, same literals)
    val again = Similarity.knnIvfPq(spark, sf).collect()
    assert(composite.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }

  test("ann recall gate: lsh/ivf/pq/ivfpq measured against exact, deterministic") {
    import graft.ops.Similarity
    val rows = Similarity.annRecall(spark, sf).collect()
    assert(rows.map(_.getString(0)).toSet == Set("lsh", "ivf", "pq", "ivfpq"))
    rows.foreach { r =>
      val hits = r.getLong(1); val total = r.getLong(2); val recall = r.getDouble(3)
      assert(total == 50L && hits >= 0 && hits <= total)
      assert(math.abs(recall - hits.toDouble / total) < 1e-6)
    }
  }

  test("mega-bucket valve: pathological one-bucket corpora survive a cap") {
    import spark.implicits._
    import graft.ops.{Dedup, Similarity}
    // 40 identical docs → every simhash band bucket holds all 40 rows
    val same = (1L to 40L).map(i => (i, "the same template text repeated " * 4))
      .toDF("doc_id", "text")
    val sh = udf((t: String) => Dedup.simhash(t))
    val hashes = same.select(col("doc_id"), sh(col("text")).as("simhash"))
    // uncapped: C(40,2) identical-hash pairs
    assert(Dedup.simhashPairsOf(hashes).count() === 40L * 39 / 2)
    // capped below the bucket size: the hot bucket drops WHOLE — no pairs,
    // no OOM path (the semi-join valve runs before any collect_list)
    assert(Dedup.simhashPairsOf(hashes, maxBucket = 10).count() === 0)
    // the audit row makes the drop loud: 4 band buckets × 40 rows
    val banded = hashes.select(col("doc_id"),
      explode(array((0 until 4).map(b => struct(lit(b).as("band"),
        shiftrightunsigned(col("simhash"), b * 16)
          .bitwiseAND(lit(0xFFFFL)).as("band_val"))): _*)).as("bb"))
      .select(col("doc_id"), col("bb.band").as("band"), col("bb.band_val").as("band_val"))
    val stats = Dedup.droppedBucketStats(banded, Seq("band", "band_val"), 10).collect()(0)
    assert(stats.getAs[Long]("dropped_buckets") === 4L)
    assert(stats.getAs[Long]("dropped_rows") === 160L)
    // same valve on the embedding near-dup path: 20 identical vectors in
    // one LSH bucket
    val emb = (1L to 20L).map(i => (i, Array.fill(64)(0.5f).toSeq))
      .toDF("vec_id", "embedding")
    assert(Similarity.embeddingNearDupsOf(emb, minSim = 0.9).count() === 20L * 19 / 2)
    assert(Similarity.embeddingNearDupsOf(emb, minSim = 0.9, maxBucket = 5).count() === 0)
    // minhash band path through the same helper
    assert(Dedup.verifiedPairsOf(same, "doc_id", "text", 0.5).count() === 40L * 39 / 2)
    assert(Dedup.verifiedPairsOf(same, "doc_id", "text", 0.5, maxBucket = 10).count() === 0)
  }

  test("dedup clusters: min-label propagation ≡ transitive closure") {
    import spark.implicits._
    import graft.ops.Dedup
    // chain 1-2-3 (transitive: pairwise drop-greater would over-keep 3),
    // pair 10-11, isolated 12
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val ids = Seq(1L, 2L, 3L, 10L, 11L, 12L).toDF("doc_id")
    val got = Dedup.clustersOf(pairs, ids).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(got == Map(
      1L -> (1L, true), 2L -> (1L, false), 3L -> (1L, false),
      10L -> (10L, true), 11L -> (10L, false), 12L -> (12L, true)))
    // a long path needs O(diameter) rounds — the convergence loop, not a
    // fixed two-hop join, must carry the label to the far end
    val path = (1L until 10L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val pathIds = (1L to 10L).toDF("doc_id")
    val far = Dedup.clustersOf(path, pathIds).filter(col("doc_id") === 10L).collect()(0)
    assert(far.getLong(1) === 1L)
    // adversarial chain, O(log diameter) pin: a 60-node path converges
    // within 12 rounds ONLY under path halving (reach doubles per round:
    // 1, 3, 7, …, 63 → 6 rounds + 1 to detect the fixpoint); plain
    // min-label propagation needs 59 and would return wrong labels here
    val chain = (1L until 60L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val chainIds = (1L to 60L).toDF("doc_id")
    val chainGot = Dedup.clustersOf(chain, chainIds, maxIter = 12).collect()
    assert(chainGot.forall(_.getLong(1) == 1L),
      chainGot.filter(_.getLong(1) != 1L).mkString(", "))
  }

  test("LSH width derives from corpus size; probe masks honor any radius") {
    import graft.ops.Similarity
    // ≤ targetBucket rows: the pinned test-SF width
    assert(Similarity.derivedPlanes(500) === Similarity.DefaultPlanes)
    assert(Similarity.derivedPlanes(64000, 1000) === Similarity.DefaultPlanes)
    // ceil(log2(n / target)): 1M → 10 bits, 1G → 20 bits, 10¹² → capped 30
    assert(Similarity.derivedPlanes(1000000L) === 10)
    assert(Similarity.derivedPlanes(1000000000L) === 20)
    assert(Similarity.derivedPlanes(1000000000000L) === 30)
    // exact power boundary: n/target = 1024 needs exactly 10 bits
    assert(Similarity.derivedPlanes(1024000L) === 10)
    assert(Similarity.derivedPlanes(1024001L) === 11)
    // the production entry point derives the width: at 500 rows ≤ the
    // 1000-row target it lands exactly on the pinned default, so results
    // must equal the oracle-path knnLsh row for row
    val auto = Similarity.knnLshAuto(spark, sf).collect().map(_.toString).sorted
    val pinned = Similarity.knnLsh(spark, sf).collect().map(_.toString).sorted
    assert(auto.sameElements(pinned))
    // probe masks: Σ C(nPlanes, i) for i ≤ probeBits, all distinct, each
    // of Hamming weight ≤ probeBits — radius 3 is honored, not clamped
    val m3 = Similarity.probeMasks(6, 3)
    assert(m3.size === 1 + 6 + 15 + 20)
    assert(m3.distinct.size === m3.size)
    assert(m3.forall(m => java.lang.Long.bitCount(m) <= 3))
    assert(Similarity.probeMasks(6, 2).size === 22) // the pinned default
    intercept[IllegalArgumentException](Similarity.probeMasks(6, 7))
    intercept[IllegalArgumentException](Similarity.probeMasks(6, -1))
    // IVF list count derives the same way: occupancy-targeted, clamped
    assert(Similarity.derivedNlist(500) === 16) // test-SF floor = pinned default
    assert(Similarity.derivedNlist(100000000L) === 1000) // 100M / 100k
    assert(Similarity.derivedNlist(1000000000000L) === 65536) // 10¹² capped
    // auto entry point lands on the pinned default at test SF → same rows
    val ivfAuto = Similarity.knnIvfAuto(spark, sf).collect().map(_.toString).sorted
    val ivfPinned = Similarity.knnIvf(spark, sf).collect().map(_.toString).sorted
    assert(ivfAuto.sameElements(ivfPinned))
  }

  test("image header sniffing: PNG/GIF/JPEG dimensions from real bytes") {
    import graft.ops.MediaOps
    // PNG: writer → sniffer round trip, arbitrary dims
    for ((w, h) <- Seq((16, 16), (1039, 17), (640, 480))) {
      val png = MediaOps.pngHeader(w, h) ++ Array.fill[Byte](10)(0x5a)
      assert(MediaOps.sniffImage(png) === Some(("image/png", w, h)))
    }
    // GIF89a: logical screen descriptor is little-endian
    val gif = "GIF89a".getBytes("ASCII") ++
      Array[Byte](0x34, 0x12, 0x78, 0x56) ++ new Array[Byte](16)
    assert(MediaOps.sniffImage(gif) === Some(("image/gif", 0x1234, 0x5678)))
    // JPEG: SOI, APP0 segment, then SOF0 (len, precision, height, width)
    val jpeg = Array[Byte](0xFF.toByte, 0xD8.toByte,
      0xFF.toByte, 0xE0.toByte, 0x00, 0x10) ++ new Array[Byte](14) ++
      Array[Byte](0xFF.toByte, 0xC0.toByte, 0x00, 0x11, 0x08,
        0x01, 0xE0.toByte, /*h=480*/ 0x02, 0x80.toByte /*w=640*/) ++
      new Array[Byte](20)
    assert(MediaOps.sniffImage(jpeg) === Some(("image/jpeg", 640, 480)))
    // non-image bytes fall through to None (stub path)
    assert(MediaOps.sniffImage("RIFFxxxxWAVE".getBytes("ASCII")) === None)
    assert(MediaOps.sniffImage(Array.emptyByteArray) === None)
    // synthetic PNG assets carry real headers: decode = header parse
    val pngMeta = MediaOps.decodeStub(MediaOps.syntheticAssets(spark, sf))
      .filter(_.mime == "image/png").collect()
    assert(pngMeta.nonEmpty)
    pngMeta.foreach { m =>
      assert(m.width >= 16 && m.width < 16 + 1024)
      assert(m.height >= 16 && m.height < 16 + 1024)
      assert(m.n_frames === 1)
    }
    // WAV: writer → sniffer round trip (fmt chunk, little-endian)
    val wav = MediaOps.wavHeader(2, 44100, 200) ++ new Array[Byte](156)
    assert(MediaOps.sniffWav(wav) === Some((2, 44100)))
    assert(MediaOps.sniffWav("noise not riff at all........".getBytes("ASCII")) === None)
    // MP4: writer → sniffer round trip (mvhd frames, tkhd 16.16 dims)
    val mp4 = MediaOps.mp4Header(640, 480, 90) ++ new Array[Byte](64)
    assert(MediaOps.sniffMp4(mp4) === Some((640, 480, 90)))
    assert(MediaOps.sniffMp4(new Array[Byte](64)) === None)
    // the synthetic corpus: every asset's header metadata parses REAL
    val metaAll = MediaOps.decodeStub(MediaOps.syntheticAssets(spark, sf)).collect()
    metaAll.filter(_.mime == "audio/wav").foreach { m =>
      assert(m.width === 0 && m.height === 0)
      assert(m.channels >= 1 && m.channels <= 2)
      assert(m.sample_rate >= 8000 && m.sample_rate <= 36000)
    }
    metaAll.filter(_.mime == "video/mp4").foreach { m =>
      assert(m.width >= 16 && m.n_frames >= 1 && m.n_frames <= 300)
      assert(m.byte_len >= 256)
    }
  }

  test("media stub pipeline: deterministic metadata, joinable to spans") {
    import graft.ops.MediaOps
    val meta = MediaOps.decodeStub(MediaOps.syntheticAssets(spark, sf))
    val rows = meta.collect()
    assert(rows.length == 500)
    assert(rows.forall(m => m.feature.length == 8))
    assert(rows.forall(m => if (m.mime == "audio/wav") m.sample_rate > 0 else m.width >= 16))
    // deterministic: same input → same output
    val again = MediaOps.decodeStub(MediaOps.syntheticAssets(spark, sf)).collect()
    assert(rows.map(_.media_ref).sorted.sameElements(again.map(_.media_ref).sorted))
    val spans = SparkEntry.queries("x2_parse_markup_spans")(spark, sf)
    val enriched = MediaOps.enrichSpans(spans, meta.toDF())
    assert(enriched.filter(col("mime").isNotNull).count() == 500)
  }

  test("media resize + frame sampling: aspect preserved, stride respected") {
    import graft.ops.MediaOps
    val meta = MediaOps.decodeStub(MediaOps.syntheticAssets(spark, sf)).toDF()
      .filter(col("width") > 0) // visual assets only: audio has no dims
    val resized = MediaOps.resizeMeta(meta, maxW = 256, maxH = 256).collect()
    assert(resized.nonEmpty)
    resized.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resized_w"), r.getAs[Int]("resized_h"))
      assert(rw <= 256 && rh <= 256 && rw >= 1 && rh >= 1)
      if (w <= 256 && h <= 256) assert(rw == w && rh == h) // no upscale
      // aspect preserved within integer rounding: rw = ⌊w·s⌋, rh = ⌊h·s⌋
      // ⇒ |rw·h − rh·w| < w + h (each floor loses <1, scaled by the other dim)
      assert(math.abs(rw.toLong * h - rh.toLong * w) <= (w + h).toLong)
    }
    val frames = MediaOps.sampleFrames(meta, stride = 30, maxFrames = 8)
    val byRef = frames.collect().groupBy(_.getAs[String]("media_ref"))
    assert(byRef.nonEmpty)
    byRef.values.foreach { rows =>
      val idxs = rows.map(_.getAs[Int]("frame_idx")).sorted
      assert(idxs.length <= 8)
      assert(idxs.head == 0)
      idxs.sliding(2).foreach { case Array(a, b) => assert(b - a == 30); case _ => }
      assert(idxs.last < rows.head.getAs[Int]("n_frames"))
    }
  }

  test("repeated n-grams: shared windows counted, singletons not") {
    import spark.implicits._
    import graft.ops.Dedup
    val run = (1 to 12).map(i => s"w$i").mkString(" ") // 12 words → 3 10-grams
    val docs = Seq(
      ("a", run),                     // shares all 3 windows with b
      ("b", run),
      ("c", (13 to 30).map(i => s"x$i").mkString(" ")), // 9 unique windows
      ("d", "too short")              // <10 words → single collapsed gram
    ).toDF("doc_id", "text")
    val out = Dedup.withRepeatedNgrams(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    assert(out("a") == ((3L, 3L, 1000L)) && out("b") == ((3L, 3L, 1000L)))
    assert(out("c") == ((9L, 0L, 0L)))
    assert(out("d") == ((1L, 0L, 0L))) // its collapsed gram is unique
  }

  test("repeated n-grams ≡ brute-force reference on random corpora") {
    import spark.implicits._
    import graft.ops.Dedup
    val rnd = new scala.util.Random(4242)
    val vocab = Array("alpha", "beta", "gamma", "delta", "eps")
    for (trial <- 1 to 3) {
      val docs = (0 until 30).map { i =>
        val len = rnd.nextInt(25) // 0..24 words — crosses the <10 collapse
        (s"t$trial-d$i", Seq.fill(len)(vocab(rnd.nextInt(vocab.length))).mkString(" "))
      }
      // brute-force reference straight from the shingle contract — a
      // MULTISET of hashes per doc (distinct STRINGS may hash-collide;
      // production explodes the Seq, so the reference must too)
      val sets = docs.map { case (id, t) =>
        id -> Dedup.shingles(t, 10).toSeq.map(Dedup.shingleHash)
      }.toMap
      val global = sets.values.flatten.groupBy(identity).view
        .mapValues(_.size).toMap
      val expected = sets.map { case (id, hs) =>
        val shared = hs.count(h => global(h) >= 2)
        id -> ((hs.size.toLong, shared.toLong,
          if (hs.isEmpty) 0L else shared.toLong * 1000 / hs.size))
      }
      val got = Dedup.withRepeatedNgrams(docs.toDF("doc_id", "text")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
      assert(got == expected, s"trial $trial")
    }
  }

  test("split assignment partitions completely for arbitrary valid weights") {
    import spark.implicits._
    import graft.ops.Sampling
    val ids = (0L until 300L).toDF("doc_id")
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val cuts = Seq.fill(2)(rnd.nextInt(1001)).sorted
      val weights = Seq(("a", cuts(0)), ("b", cuts(1) - cuts(0)),
        ("c", 1000 - cuts(1)))
      val out = Sampling.withSplit(ids, splits = weights).collect()
      assert(out.length == 300) // total function: every row, exactly once
      out.foreach { r =>
        val bucket = ((r.getLong(0) % Sampling.IdM) * Sampling.HashK %
          Sampling.HashP) % 1000
        val expect =
          if (bucket < cuts(0)) "a" else if (bucket < cuts(1)) "b" else "c"
        assert(r.getString(1) == expect, s"weights=$weights id=${r.getLong(0)}")
      }
    }
  }

  test("swapCache: a same-plan successor stays cached after the swap") {
    // two invocations whose plans canonicalize sameResult: evicting the
    // predecessor must not strip the successor's cache entry (the
    // persist-then-evict order did exactly that — zero copies cached)
    val a = graft.ops.Dedup.swapCache("t-swap", spark.range(10).toDF)
    a.count()
    val b = graft.ops.Dedup.swapCache("t-swap", spark.range(10).toDF)
    assert(b.storageLevel.useMemory || b.storageLevel.useDisk,
      s"successor lost its cache entry: ${b.storageLevel}")
    b.unpersist(blocking = true)
  }

  test("SQL kernel surface: registered functions ≡ the operator kernels") {
    import graft.ops.{Dedup, MediaOps, OpsFunctions, TextOps}
    OpsFunctions.register(spark)
    val t = "the quick brown fox jumps over the lazy dog again and again"
    spark.createDataFrame(Seq(Tuple1(t))).toDF("text")
      .createOrReplaceTempView("sqlkernel_v")
    val row = spark.sql(
      """SELECT minhash_sig(text) AS mh, simhash64(text) AS sh,
        |  ngram_jaccard(text, text) AS j, doc_fingerprint(text) AS fp,
        |  text_shingles(text) AS ss FROM sqlkernel_v""".stripMargin)
      .collect().head
    assert(row.getSeq[Long](0) == Dedup.minhash(t).toSeq)
    assert(row.getLong(1) == Dedup.simhash(t))
    assert(row.getDouble(2) == 1.0)
    assert(row.getSeq[Long](3) == TextOps.fingerprint(t).toSeq)
    assert(row.getSeq[String](4).toSet == Dedup.shingles(t))
    // media_meta over real bytes: a generated PNG and a generated WAV
    val png = MediaOps.pngEncode(20, 30, 7L)
    val wav = MediaOps.wavHeader(2, 16000, 64) ++ new Array[Byte](20)
    val mrow = spark.createDataFrame(Seq(Tuple1(png), Tuple1(wav))).toDF("b")
      .selectExpr("media_meta(b) AS m").selectExpr(
        "m.mime", "m.width", "m.height", "m.channels", "m.sample_rate")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getInt(4))).toSet
    assert(mrow == Set(("image/png", 20, 30, 0, 0),
      ("audio/wav", 0, 0, 2, 16000)))
  }

  test("trigram novelty: rare-trigram rate flags the corpus outlier") {
    import spark.implicits._
    import graft.ops.TextOps
    // ten near-identical docs (their trigrams are common: count ≥ 5)
    // plus one alien doc whose trigrams appear exactly once
    val docs = ((1 to 10).map(i => (s"c$i", "the common sentence here")) :+
      ("alien", "zzqxj wvkpf")).toDF("doc_id", "text")
    val out = TextOps.withTrigramNovelty(docs).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val (nTri, nRare, permille) = out("alien")
    assert(nTri == 9 && nRare == 9 && permille == 1000) // all trigrams unique
    (1 to 10).foreach { i =>
      val (t, r, p) = out(s"c$i")
      assert(t == 22 && r == 0 && p == 0, s"c$i: $t $r $p")
    }
    // degenerate: shorter than one trigram → zeros, no division by zero
    val tiny = TextOps.withTrigramNovelty(Seq(("t", "ab")).toDF("doc_id", "text"))
      .collect().head
    assert(tiny.getLong(1) == 0 && tiny.getLong(3) == 0)
  }

  test("scale knobs: t12 shuffle join, d8 recompute, ivf+pq auto — same rows") {
    import spark.implicits._
    import graft.ops.{Dedup, Similarity, TextOps}
    // t12: broadcast-vs-shuffle join strategy is a parameter; values identical
    val docs = ((1 to 10).map(i => (s"c$i", "the common sentence here")) :+
      ("alien", "zzqxj wvkpf")).toDF("doc_id", "text")
    val bc = TextOps.withTrigramNovelty(docs).collect().map(_.toString).sorted
    val sh = TextOps.withTrigramNovelty(docs, broadcastCommon = false)
      .collect().map(_.toString).sorted
    assert(bc.sameElements(sh))
    // t12 over a column name needing backticks (spaces) — built with
    // column functions now, not interpolated SQL text
    val spaced = docs.withColumnRenamed("text", "the text")
    val sp2 = TextOps.withTrigramNovelty(spaced, textCol = "the text")
      .collect().map(_.toString).sorted
    assert(sp2.sameElements(bc))
    // d8: cache-vs-recompute is a parameter; values identical
    val run = (1 to 12).map(i => s"w$i").mkString(" ")
    val d8docs = Seq(("a", run), ("b", run), ("c", "unique words entirely"))
      .toDF("doc_id", "text")
    val cached = Dedup.withRepeatedNgrams(d8docs).collect().map(_.toString).sorted
    val recomputed = Dedup.withRepeatedNgrams(d8docs, cacheSignatures = false)
      .collect().map(_.toString).sorted
    assert(cached.sameElements(recomputed))
    // e7 production entry: derived nlist lands on the pinned default at
    // test SF → identical rows to the oracle-path knnIvfPq
    val auto = Similarity.knnIvfPqAuto(spark, sf).collect().map(_.toString).sorted
    val pinned = Similarity.knnIvfPq(spark, sf).collect().map(_.toString).sorted
    assert(auto.sameElements(pinned))
  }

  test("real PNG decode: pngEncode → javax.imageio roundtrips every pixel") {
    import graft.ops.MediaOps
    for (seed <- Seq(0L, 7L, 4294967295L, 123456789L)) {
      val (w, h) = MediaOps.pngDims(seed)
      val bytes = MediaOps.pngEncode(w, h, seed)
      assert(bytes.length == MediaOps.pngByteLen(w, h)) // closed-form length
      // a genuinely independent decoder (the JDK's) must read it…
      val Some((dw, dh, px)) = MediaOps.decodeImage(bytes)
      assert(dw == w && dh == h)
      // …and hand back the closed-form channel values bit-for-bit
      var idx = 0
      while (idx < px.length) {
        assert((px(idx) & 0xFF) == MediaOps.pngPixel(seed, idx.toLong),
          s"seed=$seed idx=$idx")
        idx += 1
      }
      // header sniffer agrees with the full decoder
      assert(MediaOps.sniffImage(bytes) === Some(("image/png", w, h)))
    }
    assert(MediaOps.decodeImage("not an image".getBytes("ASCII")) === None)
  }

  test("real GIF decode: gifEncode → javax.imageio roundtrips every pixel") {
    import graft.ops.MediaOps
    // sizes straddling the 254-literal CLEAR boundary and sub-block edges
    for ((w, h, seed) <- Seq((16, 15, 0L), (17, 15, 99L), (40, 33, 4294967295L))) {
      val bytes = MediaOps.gifEncode(w, h, seed)
      assert(MediaOps.sniffImage(bytes) === Some(("image/gif", w, h)))
      val Some((dw, dh, px)) = MediaOps.decodeImage(bytes)
      assert(dw == w && dh == h)
      var p = 0
      while (p < w * h) { // grayscale palette: all three channels = index
        val v = MediaOps.pngPixel(seed, p.toLong)
        assert((px(3 * p) & 0xFF) == v && (px(3 * p + 1) & 0xFF) == v &&
          (px(3 * p + 2) & 0xFF) == v, s"($w,$h,$seed) pixel $p")
        p += 1
      }
    }
  }

  test("real video-frame decode: multi-frame GIF, sampled frames, pixel-exact") {
    import graft.ops.MediaOps
    // multi-frame roundtrip at the unit level: every frame of a 3-frame
    // GIF continues the closed-form pixel stream
    val (w, h, seed) = (9, 7, 12345L)
    val bytes = MediaOps.gifEncodeFrames(w, h, seed, 3)
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val reader = javax.imageio.ImageIO.getImageReaders(iis).next()
    reader.setInput(iis)
    assert(reader.getNumImages(true) == 3)
    for (f <- 0 until 3) {
      val img = reader.read(f)
      for (y <- 0 until h; x <- 0 until w) {
        val v = MediaOps.pngPixel(seed, f.toLong * w * h + y * w + x)
        assert((img.getRGB(x, y) & 0xFF) == v, s"frame $f pixel ($x,$y)")
      }
    }
    reader.dispose(); iis.close()
    // the m5 operator over the synthetic corpus: sampled indices follow
    // the stride policy, counts come from the real container, hashes are
    // the closed-form fold
    val rows = MediaOps.videoFrameHashes(MediaOps.syntheticVideos(spark, sf))
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, frames) =>
      val nf = frames.head.getLong(1)
      val expectIdx = (0L until nf by 30L).take(8).toSet
      assert(frames.map(_.getLong(2)).toSet == expectIdx)
    }
    // spot-verify one hash end to end against the closed form
    val r0 = rows.minBy(r => (r.getString(0), r.getLong(2)))
    val id = r0.getString(0).stripPrefix(SgmlExtract.AssetPrefix)
      .stripSuffix(SgmlExtract.AssetSuffix)
    val s0 = graft.ops.Dedup.shingleHash(id)
    val (gw, gh) = MediaOps.gifDims(s0)
    var expect = 0L
    for (i <- 0L until gw.toLong * gh * 3)
      expect = (expect * 31 +
        MediaOps.pngPixel(s0, r0.getLong(2) * gw * gh + i / 3)) % MediaOps.MediaP
    assert(r0.getLong(3) == expect)
  }

  test("real pixel resize: nearest-neighbor over the decoded raster") {
    import graft.ops.MediaOps
    val out = MediaOps.resizePixels(MediaOps.syntheticAssets(spark, sf),
      maxW = 64, maxH = 64).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (w, h) = (r.getAs[Int]("width"), r.getAs[Int]("height"))
      val (rw, rh) = (r.getAs[Int]("resized_w"), r.getAs[Int]("resized_h"))
      assert(rw <= 64 && rh <= 64 && rw >= 1 && rh >= 1)
      if (w <= 64 && h <= 64) assert(rw == w && rh == h)
      assert(r.getAs[Long]("pixel_hash") >= 0L)
    }
    // independent replay of one row: decode, sample, fold — must agree
    val seedOf = (ref: String) => Dedup.shingleHash(
      ref.stripPrefix(SgmlExtract.AssetPrefix).stripSuffix(SgmlExtract.AssetSuffix))
    val sample = out.head
    val seed = seedOf(sample.getAs[String]("media_ref"))
    val (w, h) = MediaOps.pngDims(seed)
    val (rw, rh) = (sample.getAs[Int]("resized_w"), sample.getAs[Int]("resized_h"))
    var expect = 0L
    for (ry <- 0 until rh; rx <- 0 until rw; c <- 0 until 3) {
      val srcIdx = (((ry * h / rh) * w + (rx * w / rw)) * 3 + c).toLong
      expect = (expect * 31 + MediaOps.pngPixel(seed, srcIdx)) % MediaOps.MediaP
    }
    assert(sample.getAs[Long]("pixel_hash") == expect)
  }

  test("real WAV decode: javax.sound PCM stats match the filler stream") {
    import graft.ops.MediaOps
    val out = MediaOps.audioStats(MediaOps.syntheticAssets(spark, sf)).collect()
    assert(out.nonEmpty)
    // independent replay of one row straight from the closed form
    val sample = out.head
    val seed = Dedup.shingleHash(sample.getAs[String]("media_ref")
      .stripPrefix(SgmlExtract.AssetPrefix).stripSuffix(SgmlExtract.AssetSuffix))
    val len = 64 + (seed % 192).toInt
    val channels = MediaOps.wavChannels(seed)
    assert(sample.getAs[Int]("channels") == channels)
    assert(sample.getAs[Int]("sample_rate") == MediaOps.wavSampleRate(seed))
    val nSamples = (len - 44) / (2 * channels) * channels
    assert(sample.getAs[Long]("n_samples") == nSamples.toLong)
    def fillerU(j: Int): Int =
      ((((seed + (j + 1) * MediaOps.MediaK) % MediaOps.MediaP % 256) - 128).toByte & 0xFF)
    var sumSq = 0L
    for (i <- 0 until nSamples) {
      val v = fillerU(44 + 2 * i) | (fillerU(44 + 2 * i + 1) << 8)
      val s = v.toShort.toLong
      sumSq += s * s
    }
    assert(sample.getAs[Long]("sum_sq") == sumSq)
    assert(sample.getAs[Long]("rms_micro") ==
      math.floor(math.sqrt(sumSq.toDouble / nSamples) * 1000000.0).toLong)
    assert(out.length ==
      MediaOps.syntheticAssets(spark, sf).filter(_.mime == "audio/wav").count())
  }
}
