package graft

import org.apache.spark.sql.functions._

import graft.plans.SerializeResplitRule
import graft.serialize.Serialize
import graft.transform.TransformProgram.SplitIndex

class RuleSpec extends SparkSpec {
  import spark.implicits._

  test("serialize→re-split round trip collapses to the direct column") {
    spark.experimental.extraOptimizations = Seq(SerializeResplitRule)
    try {
      val df = Seq(("alpha", "beta", "1"), ("gamma", "delta", "2"))
        .toDF("a", "b", "c")
      val serialized = df.select(col("a"),
        Serialize.serializeSimple(Seq("a", "b", "c")).as("text"))
      // element_at(split(text, quote(^)), 2) — the shape SplitIndex compiles to
      val roundTrip = serialized.select(
        element_at(split(col("text"), java.util.regex.Pattern.quote("^")), 2)
          .as("field"))
      val optimized = roundTrip.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("split"),
        s"round trip should collapse, got:\n$optimized")
      assert(roundTrip.as[String].collect().toSeq === Seq("beta", "delta"))
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("rule does not fire when the index can exceed the column count") {
    spark.experimental.extraOptimizations = Seq(SerializeResplitRule)
    try {
      // range source: keeps the plan from collapsing to a LocalRelation,
      // so the (un-rewritten) expression stays visible for inspection
      val df = spark.range(1)
        .select(concat(lit("x"), col("id")).as("a"), lit("y").as("b"))
      val q = df.select(
        try_element_at(split(
          Serialize.serializeSimple(Seq("a", "b")),
          java.util.regex.Pattern.quote("^")), lit(5)).as("field"))
      assert(q.queryExecution.optimizedPlan.toString.contains("split"))
      assert(q.as[Option[String]].head().isEmpty)
    } finally spark.experimental.extraOptimizations = Nil
  }

  test("SplitIndex after serialize still computes correctly (program path)") {
    val df = Seq(("ab", "cd")).toDF("a", "b")
    val text = Serialize.serializeSimple(Seq("a", "b"))
    val out = df.select(SplitIndex("^", 1).toColumn(text).as("v"))
    assert(out.as[String].head() === "cd")
  }

  test("the resplit_rewrite_part query's optimized plan has no split") {
    // the exact shape SparkEntry.queries("resplit_rewrite_part") builds:
    // SplitIndex-compiled try_element_at over a P2-serialized concat_ws
    spark.experimental.extraOptimizations = Seq(SerializeResplitRule)
    try {
      val df = spark.range(3).select(
        col("id"), concat(lit("n"), col("id")).as("p_name"),
        concat(lit("b"), col("id")).as("p_brand"),
        concat(lit("t"), col("id")).as("p_type"))
      val q = df
        .withColumn("text",
          Serialize.serializeSimple(Seq("p_name", "p_brand", "p_type")))
        .select(col("id"), SplitIndex("^", 1).toColumn(col("text")).as("pred"))
      // match the function call, not the Range node's "splits=" annotation
      val optimized = q.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("split("),
        s"SplitIndex round trip should collapse, got:\n$optimized")
      assert(q.orderBy("id").select("pred").as[String].collect().toSeq ===
        Seq("b0", "b1", "b2"))
    } finally spark.experimental.extraOptimizations = Nil
  }
}
