package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.{Dedup, HashExprs}

/** Dev tool: stage timings for substringDupPairs at 1× vs the ScaleCheck 8×
  * salted replica corpus — separates the linear regex+md5 CPU term from the
  * posting-aggregation term, so ratio regressions can be attributed.
  */
object ProfileSubstr8x {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = 8
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import Profile.time

    val docs = Tables.load(spark, sfDir, "documents")
    val width = 10000000L
    val big = (0 until n).map { i =>
      val shifted = docs.withColumn("doc_id", col("doc_id") + lit(i * width))
      if (i == 0) shifted
      else shifted.withColumn("text", concat_ws(" ",
        transform(split(col("text"), " "), w => concat(lit(s"c$i"), w))))
    }.reduce(_ unionByName _)
    time("warmup")(docs.count())

    def stages(d: DataFrame, tag: String): Unit = {
      val k = 48
      val nn = length(col("text"))
      val wins = d.select(col("doc_id"),
        explode(when(nn < k, array(col("text")))
          .otherwise(regexp_extract_all(col("text"),
            lit("(?<![^ ])(?=([\\s\\S]{" + k + "}))"), lit(1)))).as("__w"))
      time(s"$tag regex windows")(wins.count())
      val hashed = wins.select(col("doc_id"),
        HashExprs.md5PrefixLong(col("__w").cast("binary"), 16).as("h"))
      time(s"$tag + md5")(hashed.select(sum(col("h"))).count())
      time(s"$tag full substringDupPairs")(
        Dedup.substringDupPairs(d, "doc_id", "text", 48, 100).count())
    }
    stages(docs, "1x")
    stages(big, "8x")
    spark.stop()
  }
}
