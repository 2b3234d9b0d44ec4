package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: does setting shuffle.partitions AFTER the stream DataFrame is
  * built (runToMemory-style) still control the state partition count?
  * Prints the drained table's partition count and timing at 32 vs 8.
  */
object ProbeStream2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batch = graft.io.Tables.load(spark, sfDir, "events")

    def drain(tag: String): Double = {
      val stream = spark.readStream.schema(batch.schema)
        .parquet(s"$sfDir/events*.parquet")
        .withColumn("cents",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
      val counts = stream.groupBy(col("event_type"))
        .agg(count(lit(1)).as("c"))
      val t0 = System.nanoTime()
      val name = "p2_" + tag + "_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val out = graft.streaming.Streams.runToMemory(spark, counts, name,
        org.apache.spark.sql.streaming.OutputMode.Complete())
      out.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[p2] $tag conf_after=" +
        spark.conf.get("spark.sql.shuffle.partitions") +
        f" time $sec%6.2f s")
      sec
    }
    drain("warm1"); drain("warm2")
    drain("a"); drain("b"); drain("c")
    spark.stop()
  }
}
