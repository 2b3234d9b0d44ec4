package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: is the single-row-group corpus layout serializing scan-stage
  * compute onto one core, and does an up-front repartition unlock the
  * other 31? `sbt "runMain graft.tools.ProbeScan"`
  */
object ProbeScan {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sample.Samplers

    val orders = graft.io.Tables.load(spark, sfDir, "orders")
      .withColumn("cents",
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))
    println("[probe] orders scan partitions: " +
      orders.rdd.getNumPartitions)

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(orders) // warm

    for (_ <- 1 to 2) {
      time("poissonBootstrap as-is") {
        noop(Samplers.poissonBootstrap(orders, "o_orderkey", "cents", 32))
      }
      time("poissonBootstrap repartition(32) first") {
        noop(Samplers.poissonBootstrap(orders.repartition(32),
          "o_orderkey", "cents", 32))
      }
      val docs = graft.io.Tables.load(spark, sfDir, "documents")
      time("chrf-style grams as-is") {
        noop(docs.select(col("doc_id").as("key"), explode(expr(
          "transform(sequence(1, greatest(length(lower(text)) - 5, 1)), " +
            "i -> substr(lower(text), i, 6))")).as("g"))
          .groupBy(col("key"), col("g")).agg(count(lit(1)).as("cnt")))
      }
      time("chrf-style grams repartition(32)") {
        noop(docs.repartition(32).select(col("doc_id").as("key"),
          explode(expr(
            "transform(sequence(1, greatest(length(lower(text)) - 5, 1))," +
              " i -> substr(lower(text), i, 6))")).as("g"))
          .groupBy(col("key"), col("g")).agg(count(lit(1)).as("cnt")))
      }
      time("chrf-style grams repart + bound __s") {
        noop(docs.repartition(32)
          .select(col("doc_id").as("key"), lower(col("text")).as("__s"))
          .select(col("key"), explode(expr(
            "transform(sequence(1, greatest(length(__s) - 5, 1)), " +
              "i -> substr(__s, i, 6))")).as("g"))
          .groupBy(col("key"), col("g")).agg(count(lit(1)).as("cnt")))
      }
      time("chrf-style grams 1-core + bound __s") {
        noop(docs
          .select(col("doc_id").as("key"), lower(col("text")).as("__s"))
          .select(col("key"), explode(expr(
            "transform(sequence(1, greatest(length(__s) - 5, 1)), " +
              "i -> substr(__s, i, 6))")).as("g"))
          .groupBy(col("key"), col("g")).agg(count(lit(1)).as("cnt")))
      }
    }
    spark.stop()
  }
}
