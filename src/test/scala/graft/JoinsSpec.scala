package graft

import org.apache.spark.sql.functions._

import graft.plans.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asOfJoin picks the latest right row at or before the left time") {
    val trades = Seq((1L, 10L, 100L), (1L, 25L, 101L), (2L, 5L, 102L))
      .toDF("sym", "t", "trade_id")
    val quotes = Seq((1L, 5L, 9.0), (1L, 10L, 9.5), (1L, 20L, 9.9),
      (2L, 9L, 1.0))
      .toDF("sym", "qt", "px")
    val out = Joins.asOfJoin(trades, quotes, "sym", "sym",
      col("t"), col("qt"), Seq("qt", "px"))
    val rows = out.select("trade_id", "asof_qt", "asof_px")
      .as[(Long, Long, Double)].collect().toSet
    // trade@10 matches quote@10 (same-time inclusive); trade@25 → quote@20;
    // sym 2 trade@5 has no quote ≤ 5 → dropped (inner semantics)
    assert(rows === Set((100L, 10L, 9.5), (101L, 20L, 9.9)))
  }

  test("asOfJoin carries null right values without dropping the match") {
    val l = Seq((1L, 10L)).toDF("k", "t")
    val r = Seq((1L, 5L, Option.empty[String])).toDF("k", "qt", "tag")
    val out = Joins.asOfJoin(l, r, "k", "k", col("t"), col("qt"), Seq("tag"))
    assert(out.count() === 1 && out.select("asof_tag").head().isNullAt(0))
  }

  test("rangeJoin keeps rows inside [start, end)") {
    val intervals = Seq((1L, 10L, 20L, "a"), (1L, 30L, 40L, "b"))
      .toDF("k", "s", "e", "iv")
    val points = Seq((1L, 10L), (1L, 19L), (1L, 20L), (1L, 35L), (2L, 15L))
      .toDF("k2", "pt")
    val out = Joins.rangeJoin(intervals, points, "k", "k2",
      col("pt"), col("s"), col("e"))
    val got = out.select("iv", "pt").as[(String, Long)].collect().toSet
    assert(got === Set(("a", 10L), ("a", 19L), ("b", 35L)))
  }

  test("bucketedRangeJoin agrees with direct range predicate, key-less") {
    val intervals = Seq((100L, 130L, "x"), (125L, 126L, "y"))
      .toDF("s", "e", "iv")
    val points = Seq(99L, 100L, 125L, 129L, 130L).toDF("pt")
    val out = Joins.bucketedRangeJoin(intervals, points,
      col("pt"), col("s"), col("e"), 10L)
    val got = out.select("iv", "pt").as[(String, Long)].collect().toSet
    assert(got === Set(("x", 100L), ("x", 125L), ("x", 129L), ("y", 125L)))
  }

  test("snapshotDiff classifies added/deleted/changed/unchanged") {
    val a = Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)).toDF("k", "v")
    val b = Seq((2L, 25.0), (3L, 30.0), (4L, 40.0)).toDF("k", "v")
    val got = Joins.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "deleted", 2L -> "changed",
      3L -> "unchanged", 4L -> "added"))
  }

  test("snapshotDiff: a null-keyed row counts as present on its own side") {
    // null keys never equi-match, so each side's null-key rows surface
    // one-sided; presence must come from side markers, not key nullness
    val a = Seq((Some(1L), 10.0), (Option.empty[Long], 99.0)).toDF("k", "v")
    val b = Seq((Some(1L), 10.0), (Option.empty[Long], 77.0)).toDF("k", "v")
    val got = Joins.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .select("status").as[String].collect().sorted.toSeq
    // unchanged (k=1), deleted (a's null-key row), added (b's null-key row)
    assert(got === Seq("added", "deleted", "unchanged"))
  }

  test("snapshotDiff null-safe compare: null -> value is changed, null -> null is not") {
    val a = Seq((1L, Option.empty[Double]), (2L, Option.empty[Double]))
      .toDF("k", "v")
    val b = Seq((1L, Some(5.0)), (2L, Option.empty[Double])).toDF("k", "v")
    val got = Joins.snapshotDiff(a, b, Seq("k"), Seq("v"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "changed", 2L -> "unchanged"))
  }
}
