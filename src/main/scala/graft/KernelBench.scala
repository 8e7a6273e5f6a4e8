package graft

import graft.sgml._
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

/** Throwaway diagnostic: raw parse-kernel throughput without Spark —
  * single-thread ceiling and thread-scaling of the kernel alone. */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val cfg = SgmlExtract.Config(dialect = "html4", space = "preserve").toParserConfig
    val rnd = new java.util.Random(42)
    val docs: Array[String] = Array.tabulate(4096) { i =>
      val body = (0 until 45).map(_ => s"word${rnd.nextInt(1000)}").mkString(" ")
      s"<html><body><p>$body<p>tail</body></html>"
    }
    def parseOne(p: SgmlParser, s: String): Int = {
      val r = p.reset().feed(s, 0).finish()
      r.spans(cfg).length
    }
    // warm-up
    locally {
      val p = new SgmlParser(cfg)
      (0 until 200000).foreach(i => parseOne(p, docs(i & 4095)))
    }

    def run(threads: Int, perThread: Int): Double = {
      val pool = Executors.newFixedThreadPool(threads)
      val done = new AtomicLong
      val t0 = System.nanoTime()
      (0 until threads).foreach { t =>
        pool.submit(new Runnable {
          def run(): Unit = {
            val p = new SgmlParser(cfg) // one per thread ≈ one per partition
            var i = 0; var acc = 0
            while (i < perThread) { acc += parseOne(p, docs((t * 7919 + i) & 4095)); i += 1 }
            done.addAndGet(acc)
          }
        })
      }
      pool.shutdown(); pool.awaitTermination(10, TimeUnit.MINUTES)
      val secs = (System.nanoTime() - t0) / 1e9
      threads.toLong * perThread / secs
    }
    for (t <- Seq(1, 8, 32)) {
      val tp = run(t, 400000)
      System.err.println(f"[kernel] threads=$t%2d  ${tp / 1000}%.0fk docs/s  (${tp / t / 1000}%.1fk/thread)")
    }
  }
}
