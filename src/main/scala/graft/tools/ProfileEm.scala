package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.Dedup
import graft.tasks.Wrangler

/** Dev tool: stage timings for the PPJoin-routed EM queries at sf0.1 —
  * separates candidate generation / member expansion / name attachment /
  * the name-similarity distinct, so the 0.3-threshold cost is attributable.
  */
object ProfileEm {
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

    val part = Tables.load(spark, sfDir, "part")
    time("warmup")(part.count())
    val p = part.select(col("p_partkey").as("id"), col("p_name"),
      Wrangler.emTokens(col("p_name")).as("toks"))
    def noopCount(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val pairs = Dedup.ppjoinPairs(p, "id", "toks", 0.3)
    time("ppjoin 0.3 pairs (count)")(pairs.count())
    time("ppjoin 0.3 pairs (noop full)")(noopCount(pairs))
    val names = p.select(col("id"), col("p_name"))
    val joined = pairs
      .join(names.select(col("id").as("id_a"), col("p_name").as("name_a")),
        Seq("id_a"))
      .join(names.select(col("id").as("id_b"), col("p_name").as("name_b")),
        Seq("id_b"))
    time("+ name attach (noop)")(noopCount(joined))
    time("+ nameSim distinct over pairs")(
      joined.select(col("name_a"), col("name_b")).distinct().count())
    time("em_end_to_end_part full")(noopCount(
      graft.SparkEntry.queries("em_end_to_end_part")(spark, sfDir)))
    spark.stop()
  }
}
