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

  test("writeSorted produces disjoint ordered file ranges, sorted within") {
    val dir = Files.createTempDirectory("graft_layout").toString + "/sorted"
    val orders = Tables.load(spark, sf, "orders")
    Layout.writeSorted(orders, dir, Seq("o_orderkey"), 8)
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName)
    assert(files.length > 1, "expected a multi-file sorted export")
    val ranges = files.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
      val r = d.agg(min("o_orderkey"), max("o_orderkey")).head()
      // internally sorted: row sequence equals its sorted self
      val keys = d.select("o_orderkey").as[Long].collect()
      assert(keys.sameElements(keys.sorted), s"file ${f.getName} not sorted")
      (r.getLong(0), r.getLong(1))
    }
    // file k's max < file k+1's min -> globally sorted directory
    ranges.sliding(2).foreach {
      case Array((_, hi), (lo, _)) => assert(hi < lo, s"overlapping ranges $ranges")
      case _ =>
    }
    // nothing lost in the rewrite
    assert(spark.read.parquet(dir).count() === orders.count())
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
