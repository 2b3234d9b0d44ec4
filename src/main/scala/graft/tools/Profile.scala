package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.{Dedup, Shingles}

/** Dev tool: stage-by-stage timing of the heavy dedup pipelines, to locate
  * bottlenecks before optimizing (run:
  * `sbt "runMain graft.tools.Profile /root/testdata/sf0.1"`).
  */
object Profile {
  def time(name: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.load(spark, sfDir, "documents")
    time("warmup count")(docs.count())

    val events = Tables.load(spark, sfDir, "events")
    time("pivot (Spark pivot op)")(
      events.groupBy((col("user_id") % 10).as("user_bucket"))
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .count().count())
    time("pivot (manual conditional agg)")(
      events.groupBy((col("user_id") % 10).as("user_bucket"))
        .agg(
          sum(when(col("event_type") === "click", 1L)).as("click"),
          sum(when(col("event_type") === "error", 1L)).as("error"),
          sum(when(col("event_type") === "purchase", 1L)).as("purchase"),
          sum(when(col("event_type") === "signup", 1L)).as("signup"),
          sum(when(col("event_type") === "view", 1L)).as("view"))
        .count())

    val sh = docs.select(col("doc_id"),
      explode(Shingles.wordShingles(col("text"), 3)).as("sh"))
    time("shingle explode")(sh.count())

    val withMd5 = sh.withColumn("h0",
      md5(concat(lit("0:"), col("sh")).cast("binary")))
    time("shingles + 1 md5")(withMd5.count())

    val with8 = (0 until 8).foldLeft(sh) { (d, s) =>
      d.withColumn(s"h$s", md5(concat(lit(s + ":"), col("sh")).cast("binary")))
    }
    time("shingles + 8 md5")(with8.count())

    time("minhashSignatures")(
      Dedup.minhashSignatures(docs, "doc_id", "text", 8, 3).count())
    time("lshBands (full)")(
      Dedup.lshBands(Dedup.minhashSignatures(docs, "doc_id", "text", 8, 3),
        "doc_id", 8, 2).count())
    time("minhashLsh pairs")(
      Dedup.minhashLsh(docs, "doc_id", "text", 8, 2, 3).count())

    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    time("jaccard: sizes")(sizes.count())
    val dfCnt = sh.groupBy("sh").agg(count(lit(1)).as("df_cnt"))
      .filter(col("df_cnt") <= 100)
    time("jaccard: df filter")(dfCnt.count())
    val filtered = sh.join(dfCnt, Seq("sh"))
    time("jaccard: filtered shingles")(filtered.count())
    val common = filtered.select(col("sh"), col("doc_id").as("id_a"))
      .join(filtered.select(col("sh"), col("doc_id").as("id_b")), Seq("sh"))
      .filter(col("id_a") < col("id_b"))
    time("jaccard: raw pairs")(common.count())
    time("jaccard: full")(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", 3, 0.2, 100).count())

    spark.stop()
  }
}
