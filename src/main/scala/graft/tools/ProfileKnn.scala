package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.{Dedup, Similarity}

/** Dev tool: stage timing of the mutual-kNN clustering query (run:
  * `sbt "runMain graft.tools.ProfileKnn"`). Locates whether the brute
  * kNN, the mutualization, or the CC rounds dominate.
  */
object ProfileKnn {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.load(spark, sfDir, "embeddings")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profknn] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    // warm-up
    Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3).count()
    val knn = Similarity.bruteForceTopK(e, e, "vec_id", "embedding", 3)
    time("knn")(knn.count())
    val kc = knn.localCheckpoint(true)
    val edges = kc.select(col("query_id").as("id_a"),
      col("cand_id").as("id_b"))
    val mutual = edges
      .join(edges.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
        Seq("id_a", "id_b"))
      .filter(col("id_a") < col("id_b"))
    time("mutual")(mutual.count())
    val mc = mutual.localCheckpoint(true)
    time("ccStar")(Dedup.connectedComponentsStar(e, mc, "vec_id").count())
    time("ccLabel")(Dedup.duplicateClusters(e, mc, "vec_id").count())
    time("full")(Similarity.mutualKnnClusters(e, knn, "vec_id").count())
    spark.stop()
  }
}
