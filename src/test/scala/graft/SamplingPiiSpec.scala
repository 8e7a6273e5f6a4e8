package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.ops.{Sampling, TextOps}

/** Deterministic sampling + PII scrubbing — the restart-stability and
  * redaction-completeness properties the oracle's value compare can't
  * express directly. */
class SamplingPiiSpec extends AnyFunSuite with BeforeAndAfterAll {

  private val sf = "/root/testdata/sf0.001"

  @transient lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  override def afterAll(): Unit = if (spark != null) spark.stop()

  test("stratified sample is restart-stable and respects per-stratum rates") {
    val a = Sampling.stratifiedSample(spark, sf).collect().sortBy(_.getLong(0))
    val b = Sampling.stratifiedSample(spark, sf).collect().sortBy(_.getLong(0))
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq) // identical reruns
    assert(a.nonEmpty)
    // every kept row satisfies its own stratum's threshold
    assert(a.forall(r => r.getLong(2) < r.getLong(3)))
    // rates differ across strata (the rule isn't a constant filter)
    val rates = a.map(_.getLong(3)).distinct
    assert(rates.length > 1, s"expected multiple stratum rates, got ${rates.toSeq}")
  }

  test("uniform sample: k smallest hashes, stable under repartitioning") {
    val base = Sampling.uniformSample(spark, sf, k = 20).collect().map(_.getLong(0)).toSeq
    assert(base.length == 20)
    // the same k rows regardless of physical layout (per-partition top-k merge)
    val docs = spark.read.parquet(s"$sf/documents.parquet").repartition(13)
    val re = docs.select(col("doc_id"), Sampling.bucket1000(col("doc_id")).as("h"))
      .orderBy(col("h").asc, col("doc_id").asc).limit(20)
      .collect().map(_.getLong(0)).toSeq
    assert(re == base)
  }

  test("split assignment: total partition, stable, thresholds honored") {
    val rows = Sampling.splitAssign(spark, sf).collect()
    assert(rows.length == 500) // every row gets exactly one split
    rows.foreach { r =>
      val (b, s) = (r.getLong(1), r.getString(2))
      val expected = if (b < 900) "train" else if (b < 950) "val" else "test"
      assert(s == expected, s"bucket $b → $s")
    }
    assert(rows.map(_.getString(2)).toSet == Set("train", "val", "test"))
    // re-run identical (restart-stable by construction)
    val again = Sampling.splitAssign(spark, sf).collect()
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
    // invalid weights rejected loudly
    intercept[IllegalArgumentException] {
      Sampling.withSplit(spark.range(1).toDF("doc_id"),
        splits = Seq(("a", 800), ("b", 300)))
    }
  }

  test("pii scrub removes every email/phone/ipv4 occurrence") {
    val out = TextOps.piiScrub(spark, sf)
    val counted = out.select(
      sum(regexp_count(col("scrubbed"), lit(TextOps.EmailRe))).as("e"),
      sum(regexp_count(col("scrubbed"), lit(TextOps.PhoneRe))).as("p"),
      sum(regexp_count(col("scrubbed"), lit(TextOps.Ipv4Re))).as("i"),
      sum(col("n_emails")).as("ne"), sum(col("n_phones")).as("np"),
      sum(col("n_ips")).as("ni"), count(lit(1)).as("n")).collect()(0)
    assert(counted.getLong(0) == 0 && counted.getLong(1) == 0 && counted.getLong(2) == 0,
      s"residual PII after scrub: $counted")
    val n = counted.getLong(6)
    // synthesis: 1 phone + 1 ip per doc, 1 email (+1 for doc_id % 3 == 0)
    assert(counted.getLong(3) >= n && counted.getLong(4) == n && counted.getLong(5) == n)
    // replacement markers present
    val one = out.filter(col("doc_id") === 0).select(col("scrubbed")).collect()(0).getString(0)
    assert(one.contains("[EMAIL]") && one.contains("[PHONE]") && one.contains("[IP]"))
    assert(!one.contains("@") && !one.contains("+1-555"))
  }
}
