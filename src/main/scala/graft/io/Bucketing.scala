package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table helpers: the shuffle-free co-located join path
  * (SURVEY §2.3 J1 scale note: "at 100 TB: sort-merge join on bucketed ids").
  *
  * Writing both join sides bucketed (+ sorted) by the join key lets Spark
  * plan a sort-merge join with NO Exchange on either side — the single
  * biggest shuffle saving available for repeated large-large joins.
  * BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted managed table under the session
    * warehouse. Bucket count should match the target parallelism of the
    * downstream join (one task per bucket).
    */
  def writeBucketed(
      df: DataFrame,
      tableName: String,
      bucketCols: Seq[String],
      numBuckets: Int): Unit = {
    val spark = df.sparkSession
    // A dropped-table dir can outlive its catalog entry (e.g. a killed JVM);
    // clear both so overwrite never hits LOCATION_ALREADY_EXISTS.
    spark.sql(s"DROP TABLE IF EXISTS `$tableName`")
    val warehouse = new java.net.URI(
      spark.conf.get("spark.sql.warehouse.dir")).getPath
    val loc = java.nio.file.Paths.get(warehouse, tableName)
    if (java.nio.file.Files.exists(loc)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(loc).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(tableName)
  }

  def read(spark: SparkSession, tableName: String): DataFrame =
    spark.table(tableName)
}

/** Partitioned-directory layout: the other half of the 100 TB data-layout
  * story (bucketing co-locates join keys; partitioning prunes scans).
  * Writing fact tables partitioned by their dominant filter column
  * (date, event_type, lang…) turns those filters into directory pruning —
  * the scan never opens non-matching files. LayoutSpec asserts the
  * `PartitionFilters` in the read plan.
  */
object Layout {

  def writePartitioned(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  def readPartitioned(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Globally-sorted export: range-partition on the sort key, sort within
    * each partition, write. File k's key range sits entirely below file
    * k+1's, and each file is internally sorted — so the directory as a
    * whole is one sorted sequence (the layout consumers want for binary-
    * searchable shards and merge-readers). This is the 100 TB sorted-write
    * shape: `orderBy().write` would funnel everything through one sorting
    * task per output file wave, while range partitioning samples the key
    * distribution and sorts all partitions in parallel.
    */
  def writeSorted(
      df: org.apache.spark.sql.DataFrame,
      path: String,
      sortCols: Seq[String],
      numPartitions: Int = 32): Unit =
    df.repartitionByRange(numPartitions, sortCols.map(org.apache.spark.sql.functions.col): _*)
      .sortWithinPartitions(sortCols.map(org.apache.spark.sql.functions.col): _*)
      .write
      .mode("overwrite")
      .parquet(path)
}
