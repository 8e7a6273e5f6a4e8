package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway diagnostic: stage-by-stage timing of the bench pipeline. */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val amp = sys.env.getOrElse("SPARK_GRAFT_AMP", "400").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val path = Bench.ensureCorpus(spark, sfDir, amp)
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      System.err.println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    for (round <- 1 to 3) {
      time(s"r$round raw count")(spark.read.parquet(path).count())
      time(s"r$round read+decode (sum lengths)")(
        spark.read.parquet(path)
          .select(expr("aggregate(spans, 0L, (a,s) -> a + length(s.text))").as("n"))
          .agg(sum("n")).collect())
      time(s"r$round full parse") {
        val docs = spark.read.parquet(path).as[Doc]
        SgmlExtract.extract(docs, SgmlExtract.Config(dialect = "html4", space = "preserve"))
          .select(size(col("spans")).as("n")).agg(count(lit(1)), sum(col("n"))).collect()
      }
      val rt = Runtime.getRuntime
      System.err.println(f"[debug] heap used ${(rt.totalMemory - rt.freeMemory) / 1e9}%.1f GB of ${rt.totalMemory / 1e9}%.1f GB")
    }
    spark.stop()
  }
}
