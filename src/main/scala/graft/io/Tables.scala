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

  /** Spread a COMPUTE-DENSE pipeline input across the session's cores.
    *
    * The harness corpus is one parquet file with one row group per table,
    * and parquet cannot split a row group — so the scan stage of every
    * operator (tokenization, gram explodes, per-row digests, levenshtein,
    * media decode, map-side partial aggregation) runs as a SINGLE task
    * however many cores the session has. Guide §2.5: "one huge
    * unsplittable file … repartition immediately after the read."
    *
    * Deliberately an OPERATOR-level helper, not a loader default: the
    * round-robin exchange buys its cost back only where per-row compute
    * dominates (measured at sf0.1/local[32]: the chrF gram-dictionary job
    * 5.8 s → 1.1 s, the bootstrap digest+ladder aggregation 6.2 s →
    * 3.3 s), while queries made of many dictionary-scale jobs LOSE to the
    * extra per-task overhead (the 8-epoch trainer family measured +0.12 s
    * per added partition per query) — so only the measured compute-dense
    * pipelines call it. Scale-adaptive and a no-op whenever the input
    * already has enough partitions (a real multi-file corpus at scale
    * never pays it). Round-robin is deterministic under retries (Spark's
    * sort-before-repartition); every caller is row-order-insensitive.
    */
  def spread(df: DataFrame): DataFrame = {
    if (df.isStreaming) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
    }
  }
}
