package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Harness parquet corpus loader (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The events table stores TIMESTAMP(NANOS), which Spark 4 refuses by
    // default; surface it as epoch-nanos LongType instead (Events.* handles
    // both representations with exact integer math). The conf is
    // session-global and stays set after the first events load — benign
    // for every other table here (µs-timestamp or timestamp-free schemas
    // are unaffected by nanosAsLong), but callers mixing in external
    // TIMESTAMP(NANOS) parquet should be aware their nanos columns will
    // surface as LongType too.
    if (name == "events")
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$sfDir/$name.parquet")
  }
}
