package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: anatomy of one Complete-mode streaming drain — where the
  * ~1.5-2 s per-drain fixed cost of the streaming twins goes. Times the
  * same valueCounts drain at several state-partition counts and with
  * bounded (5-key) vs value-dictionary state, cold and warm. Run:
  * `sbt "runMain graft.tools.ProbeStream"`
  */
object ProbeStream {
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

    def drain(parts: Int, big: Boolean, tag: String): Double = {
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      val stream = spark.readStream.schema(batch.schema)
        .parquet(s"$sfDir/events*.parquet")
        .withColumn("cents",
          (col("value").cast("decimal(18,2)") * 100).cast("long"))
      val counts =
        if (big) stream.groupBy(col("cents").as("v"))
          .agg(count(lit(1)).as("c"))
        else stream.groupBy(col("event_type"))
          .agg(count(lit(1)).as("c"))
      val t0 = System.nanoTime()
      val name = "probe_" + tag + "_" +
        java.util.UUID.randomUUID.toString.replace("-", "")
      val out = graft.streaming.Streams.runToMemory(spark, counts, name,
        org.apache.spark.sql.streaming.OutputMode.Complete())
      out.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.conf.set("spark.sql.shuffle.partitions", 32)
      sec
    }

    // batch reference: the same agg, no streaming machinery
    def batchRef(big: Boolean): Double = {
      val b = batch.withColumn("cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
      val agg = if (big) b.groupBy(col("cents").as("v"))
        .agg(count(lit(1)).as("c"))
      else b.groupBy(col("event_type")).agg(count(lit(1)).as("c"))
      val t0 = System.nanoTime()
      agg.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }

    // warm-up
    drain(32, big = false, "warm"); drain(32, big = true, "warm")
    batchRef(false); batchRef(true)

    def withConf(k: String, v: String)(f: => Double): Double = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f finally old match {
        case Some(o) => spark.conf.set(k, o)
        case None => spark.conf.unset(k)
      }
    }

    for (parts <- Seq(32, 8)) {
      val a = drain(parts, big = false, s"nd$parts")
      val b = withConf("spark.sql.streaming.noDataMicroBatches.enabled",
        "false")(drain(parts, big = false, s"nd$parts"))
      println(f"[probe] noData=on  parts=$parts%-3d $a%6.2f s   " +
        f"noData=off $b%6.2f s")
    }
    for (parts <- Seq(8)) {
      val a = withConf("spark.sql.streaming.checkpointLocation",
        "/dev/shm/graft_ckpt")(drain(parts, big = false, "shm"))
      println(f"[probe] ckpt=/dev/shm parts=$parts%-3d $a%6.2f s")
      val b = withConf("spark.sql.streaming.noDataMicroBatches.enabled",
        "false") {
        withConf("spark.sql.streaming.checkpointLocation",
          "/dev/shm/graft_ckpt2")(drain(parts, big = false, "shm2"))
      }
      println(f"[probe] ckpt=/dev/shm noData=off parts=$parts%-3d $b%6.2f s")
    }
    println(f"[probe] batch small ${batchRef(false)}%6.2f s " +
      f"big ${batchRef(true)}%6.2f s")
    spark.stop()
  }
}
