package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.Dedup

/** Dev tool: stage timings for substringDupPairs (the r02 bench's slowest
  * query) — explode mass vs md5 cost vs distinct/postings shuffle.
  */
object ProfileSubstr {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import Profile.time

    val docs = Tables.load(spark, sfDir, "documents")
    time("warmup")(docs.count())
    val k = 48
    val n = length(col("text"))
    val pos = docs.select(col("doc_id"), col("text"),
      explode(sequence(lit(1), greatest(n - (k - 1), lit(1)))).as("__i"))
    time("explode positions")(pos.count())
    val sub = pos.select(col("doc_id"),
      col("text").substr(col("__i"), lit(k)).as("s"))
    time("explode + substr")(sub.select(sum(length(col("s")))).count())
    val hashed = pos.select(col("doc_id"),
      conv(substring(md5(col("text").substr(col("__i"), lit(k)).cast("binary")),
        1, 15), 16, 10).cast("long").as("h"))
    time("explode + md5 + conv")(hashed.select(sum(col("h"))).count())
    val winArr = when(n < k, array(col("text")))
      .otherwise(regexp_extract_all(col("text"),
        lit("(?<![^ ])(?=([\\s\\S]{48}))"), lit(1)))
    val regexWins = docs.select(col("doc_id"),
      explode(winArr).as("__w"))
    time("regex anchor windows")(regexWins.count())
    val ahashed = regexWins.select(col("doc_id"),
      unhex(substring(md5(col("__w").cast("binary")), 1, 16)).as("h"))
    time("regex windows + md5 unhex")(
      ahashed.select(sum(length(col("h"))).as("s")).collect()(0).getLong(0))
    time("+ distinct")(ahashed.distinct().count())
    time("+ distinct + checkpoint")(
      ahashed.distinct().localCheckpoint(true).count())
    time("full substringDupPairs (anchored)")(
      Dedup.substringDupPairs(docs, "doc_id", "text", 48, 100).count())
    time("full again (warm)")(
      Dedup.substringDupPairs(docs, "doc_id", "text", 48, 100).count())
    spark.stop()
  }
}
