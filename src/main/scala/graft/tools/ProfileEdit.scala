package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.scale.Dedup

/** Dev tool: timing of [[graft.scale.Dedup.editDistancePairs]] at 1× and
  * under the ScaleCheck 8× replication (run:
  * `sbt "runMain graft.tools.ProfileEdit"`).
  *
  * History: the first cut ended in `intra.unionByName(cross)` ABOVE the
  * pair-mass expansion; the Union boundary broke whole-stage codegen
  * fusion and the per-row copy tax dominated everything (8× run: 60 s for
  * 176M output rows vs ~1.5 s to count either branch alone). The fix —
  * fold intra matches in as verified self-pairs at the dictionary-scale
  * table and expand in ONE fused pipeline — is what ships; this tool
  * guards the regression.
  */
object ProfileEdit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val part = Tables.load(spark, sfDir, "part")

    // ScaleCheck's edit_pairs shape: id shift + a 3-char copy tag keeping
    // copies >= 3 edits apart (see the case comment in ScaleCheck)
    def replicate(df: DataFrame, n: Int): DataFrame = {
      val w = 10000000L
      (0 until n).map { i =>
        df.withColumn("p_partkey", col("p_partkey") + lit(i * w))
      }.reduce(_ unionByName _)
        .withColumn("p_name", concat(
          expr("repeat(concat('s', p_partkey DIV 10000000), 3)"),
          col("p_name")))
    }

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profedit] $name%-12s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }

    val base = replicate(part, 1)
    val big = replicate(part, 8)
    time("warmup")(Dedup.editDistancePairs(base, "p_partkey", "p_name", 2)
      .count())
    time("1x")(Dedup.editDistancePairs(base, "p_partkey", "p_name", 2)
      .count())
    time("8x")(Dedup.editDistancePairs(big, "p_partkey", "p_name", 2)
      .count())
    spark.stop()
  }
}
