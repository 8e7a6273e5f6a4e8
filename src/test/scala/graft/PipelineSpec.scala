package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end curation pipeline: quality filter, exact dedup keeper
  * choice, fuzzy-dedup loser rule, language annotation — on a corpus
  * whose expected survivors are known by construction. */
class PipelineSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .appName("pipeline-spec").getOrCreate()

  private def docsOf(rows: (String, String)*) = {
    import spark.implicits._
    rows.toDF("doc_id", "raw")
      .selectExpr("doc_id",
        "array(named_struct('kind', 'text', 'text', raw, 'media_ref', " +
          "CAST(NULL AS STRING), 'offset', 0)) AS spans")
  }

  private val quality =
    "the quick brown fox jumps over the lazy dog and runs far away today"

  test("quality filter, exact dedup, fuzzy dedup, lang-id compose") {
    val near = quality + " extra"
    val docs = docsOf(
      "d1" -> quality,          // survives (keeper of the exact pair)
      "d2" -> quality,          // exact dup of d1 → dropped
      "d3" -> near,             // near-dup of d1 (high shingle overlap) → dropped
      "d4" -> "short junk",     // < 10 words → dropped by quality
      "d5" -> ("der hund und die katze sind nicht in dem haus und das ist gut so"))
    val out = Pipeline.curate(docs).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    assert(out.keySet == Set("d1", "d5"), out)
    assert(out("d1") == "en")
    assert(out("d5") == "de")
  }

  test("curateClustered keeps one doc per component (≡ curate here)") {
    val near = quality + " extra"
    val docs = docsOf(
      "d1" -> quality, "d2" -> quality, "d3" -> near,
      "d4" -> "short junk",
      "d5" -> "der hund und die katze sind nicht in dem haus und das ist gut so")
    val clustered = Pipeline.curateClustered(docs).collect()
      .map(r => r.getString(0) -> r.getString(2)).toMap
    // d1~d3 form one component → keeper d1; d2 exact-deduped earlier;
    // d4 fails quality; d5 its own (singleton) component
    assert(clustered.keySet == Set("d1", "d5"), clustered)
    assert(clustered("d1") == "en" && clustered("d5") == "de")
    // on a corpus without skipped transitive edges the pairwise rule
    // agrees — the divergence case is pinned by the d7 unit test
    val pairwise = Pipeline.curate(docs).collect().map(_.getString(0)).toSet
    assert(pairwise == clustered.keySet)
  }

  test("markup parses before curation; parse-error docs are dropped") {
    val docs = docsOf(
      "m1" -> s"<html><body><p>$quality</p></body></html>",
      // unclosed <b> → parse error row → dropped by the n_errors gate
      "m2" -> s"<p>$quality <b>bold</p>")
    val out = Pipeline.curate(docs).collect().map(_.getString(0)).toSet
    assert(out == Set("m1"))
    val text = Pipeline.curate(docs).collect().head.getString(1)
    assert(text == quality)
  }

  test("run(): curated + lineage parquet written in one call") {
    val dir = java.nio.file.Files.createTempDirectory("pipeline").toString
    docsOf("a" -> quality, "b" -> quality)
      .write.mode("overwrite").parquet(s"$dir/in")
    Pipeline.run(spark, s"$dir/in", s"$dir/out", runId = "t1")
    val curated = spark.read.parquet(s"$dir/out/curated")
    assert(curated.count() == 1)
    val lineage = spark.read.parquet(s"$dir/out/lineage")
    assert(lineage.columns.toSet ==
      Set("run_id", "partition_id", "docs", "bytes", "spans", "errors"))
    assert(lineage.selectExpr("sum(docs)").collect().head.getLong(0) == 2L)
  }
}
