package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.Dedup

/** Stage timings for the OPH pipeline at sf0.1 (dev aid). */
object ProfileOph {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
    def time(tag: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[oph] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs  rows=$n")
    }
    time("docs count")(docs.count())
    val sig = Dedup.ophSignatures(docs, "doc_id", "text", 16, 3)
    time("signatures")(sig.count())
    val bands = Dedup.ophBands(sig, "doc_id", 4)
    time("bands")(bands.count())
    val cand = Dedup.lshCandidatePairs(bands, "doc_id")
    time("candidates")(cand.count())
    time("full pairs")(Dedup.ophMinhashPairs(
      docs, "doc_id", "text", 16, 4, 3, 0.5).count())
    spark.stop()
  }
}
