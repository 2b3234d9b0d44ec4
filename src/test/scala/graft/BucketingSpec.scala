package graft

import org.apache.spark.sql.functions._

import graft.io.Bucketing
import graft.scale.Skew

class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key join plans without a shuffle exchange") {
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("k", "lv")
    val right = (1L to 1000L).map(i => (i, i * 2)).toDF("k", "rv")
    Bucketing.writeBucketed(left, "b_left", Seq("k"), 4)
    Bucketing.writeBucketed(right, "b_right", Seq("k"), 4)
    // disable auto-broadcast: the point is the large-large path, where the
    // co-located sort-merge join needs no exchange on either side
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Bucketing.read(spark, "b_left")
        .join(Bucketing.read(spark, "b_right"), "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(!physical.contains("Exchange"),
        s"expected exchange-free co-located join, got:\n$physical")
      assert(joined.count() === 1000)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("saltedCountSum matches the direct aggregation") {
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 4.0))
      .toDF("k", "v")
    val salted = Skew.saltedCountSum(df, Seq("k"), "v", 8, Seq(col("v")))
      .orderBy("k")
      .as[(String, Long, Double)].collect().toSeq
    assert(salted === Seq(("a", 3L, 6.0), ("b", 1L, 4.0)))
  }

  test("saltedJoin matches plain join results") {
    val big = (1L to 100L).map(i => (i % 3, i)).toDF("k", "v")
    val dim = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("dk", "name")
    val out = Skew.saltedJoin(big, dim, "k", "dk", 4, Seq(col("v")))
    val plain = big.join(dim, col("k") === col("dk"))
    assert(out.count() === plain.count())
    assert(out.groupBy("name").count().orderBy("name")
      .as[(String, Long)].collect().toSeq ===
      plain.groupBy("name").count().orderBy("name")
        .as[(String, Long)].collect().toSeq)
  }
}
