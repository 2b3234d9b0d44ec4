package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.{Layout, Tables}

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write creates per-value dirs; filters prune partitions") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/events"
    val events = Tables.load(spark, sf, "events")
    Layout.writePartitioned(events, dir, Seq("event_type"))
    val dirs = new java.io.File(dir).listFiles()
      .filter(_.isDirectory).map(_.getName).toSet
    assert(dirs.exists(_.startsWith("event_type=click")))

    val filtered = Layout.readPartitioned(spark, dir)
      .filter(col("event_type") === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"partition filter not pushed:\n$plan")
    // pruned scan reads only the matching partition
    assert(filtered.count() ===
      events.filter(col("event_type") === "click").count())
  }

  test("partition column round-trips through the directory encoding") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/docs"
    val docs = Tables.load(spark, sf, "documents")
    Layout.writePartitioned(docs, dir, Seq("lang"))
    val back = Layout.readPartitioned(spark, dir)
    assert(back.select("lang").distinct().count() ===
      docs.select("lang").distinct().count())
    assert(back.count() === docs.count())
  }
}
