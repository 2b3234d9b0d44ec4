package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Dev tool: time a named subset of `SparkEntry.queries` with the same
  * methodology as `graft.Bench` (noop sink, warm-up pass), to iterate on a
  * perf fix without paying the full 166-query sweep. Run:
  * `sbt "runMain graft.tools.QuickBench q1_full_pricing substring_dup_docs"`
  * (first arg may be an sf dir; queries run twice — cold then warm).
  */
object QuickBench {
  def main(args: Array[String]): Unit = {
    val (sfDir, names) = args.headOption match {
      case Some(d) if d.startsWith("/") => (d, args.tail.toSeq)
      case _ => ("/root/testdata/sf0.1", args.toSeq)
    }
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // same mixed-shape warm-up as Bench so timings are comparable
    Seq("q1_full_pricing", "window_analytics_orders", "em_blocked_pairs")
      .foreach(run)
    names.foreach { n =>
      val cold = run(n)
      val warm = run(n)
      println(f"[quickbench] $n%-36s cold $cold%7.2f s   warm $warm%7.2f s")
    }
    spark.stop()
  }
}
