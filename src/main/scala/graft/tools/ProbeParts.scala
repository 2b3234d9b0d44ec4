package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: is the multi-tiny-job family (8-epoch trainer, iterative
  * graph) bound by per-task overhead? Times the same queries at several
  * spark.sql.shuffle.partitions settings in one JVM.
  * `sbt "runMain graft.tools.ProbeParts conformal_classifier_docs pagerank_trade_orders"`
  */
object ProbeParts {
  def main(args: Array[String]): Unit = {
    val names = if (args.nonEmpty) args.toSeq
      else Seq("conformal_classifier_docs", "pagerank_trade_orders")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // warm
    run("q1_full_pricing"); run("em_blocked_pairs")
    for (p <- Seq(32, 8, 32, 8); n <- names) {
      spark.conf.set("spark.sql.shuffle.partitions", p)
      println(f"[parts] p=$p%-3d $n%-36s ${run(n)}%6.2f s")
    }
    spark.stop()
  }
}
