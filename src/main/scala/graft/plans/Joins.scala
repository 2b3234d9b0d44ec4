package graft.plans

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join operators beyond the built-in equi/non-equi surface (SURVEY §2.3:
  * the reference has hash equi-joins only; these are the generalized family
  * a temporal/feature pipeline needs).
  */
object Joins {

  /** As-of join: for every left row, attach the latest right row of the same
    * key whose time ≤ the left row's time (the feature-store / trade-quote
    * join).
    *
    * Implementation is the union-sort trick, NOT a θ-join: tag both inputs,
    * union, and take per (key) a running `last(right value, ignoreNulls)`
    * over (time, tag) order — right rows sort before left rows at equal
    * times, so same-time right rows are visible to the left row. ONE shuffle
    * on the key, no candidate-pair explosion: at 100 TB this is the only
    * shape that survives (a `right.time <= left.time` range join is O(n·m)
    * per key; Spark would nested-loop it).
    *
    * @param valueCols right columns to carry (emitted as `asof_<name>`)
    * @return left rows that found a match (inner as-of semantics)
    */
  def asOfJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      leftTime: Column,
      rightTime: Column,
      valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns
    // Right values travel as ONE struct: a single running
    // last(struct, ignoreNulls) attaches the latest right ROW atomically.
    // Per-column lasts would stitch values from DIFFERENT right rows
    // whenever right value columns contain nulls (a torn row that never
    // existed). The struct itself is non-null for every right row even
    // when its fields are null, so it doubles as the match marker.
    val vsType = org.apache.spark.sql.types.StructType(
      valueCols.map(c => right.schema(c)))
    // tag 0 = right (sorts first at equal time), 1 = left
    val lPadded = left
      .withColumn("__key", col(leftKey))
      .withColumn("__t", leftTime)
      .withColumn("__tag", lit(1))
      .withColumn("__vs", lit(null).cast(vsType))
    val r = right
      .withColumn("__key", col(rightKey))
      .withColumn("__t", rightTime)
      .withColumn("__tag", lit(0))
      .withColumn("__vs", struct(valueCols.map(col): _*))
    val rPadded = leftCols.foldLeft(r)(
      (d, c) => if (valueCols.contains(c) || c == rightKey) d
        else d.withColumn(c, lit(null).cast(left.schema(c).dataType)))
    val unionCols = leftCols.map(col) ++
      Seq(col("__key"), col("__t"), col("__tag"), col("__vs"))
    val unioned = lPadded.select(unionCols: _*)
      .unionByName(rPadded.select(unionCols: _*))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned
      .withColumn("__asof", last(col("__vs"), ignoreNulls = true).over(w))
    filled.filter(col("__tag") === 1 && col("__asof").isNotNull)
      .select(leftCols.map(col) ++
        valueCols.map(c => col("__asof").getField(c).as(s"asof_$c")): _*)
  }

  /** Range join: pair left rows with right rows whose time falls in
    * [left.start, left.end). Equi-key first (shuffles on the key), the range
    * predicate applied post-join — Spark plans this as a hash join with the
    * range as a residual filter, which is the right plan when keys are
    * selective. For key-less range joins, bucketize the range into intervals
    * and equi-join on the bucket (see `bucketedRangeJoin`).
    */
  def rangeJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      rightTime: Column, leftStart: Column, leftEnd: Column): DataFrame =
    left.join(right,
      col(leftKey) === col(rightKey) &&
        rightTime >= leftStart && rightTime < leftEnd)

  /** Key-less interval join at scale: explode each left interval into the
    * fixed-width buckets it overlaps, equi-join on bucket, then apply the
    * exact range predicate. Turns an O(n·m) θ-join into a shuffle join whose
    * fan-out is interval_width / bucketWidth.
    */
  def bucketedRangeJoin(
      left: DataFrame, right: DataFrame,
      rightTime: Column, leftStart: Column, leftEnd: Column,
      bucketWidth: Long): DataFrame = {
    // Integer DIV, not floor(double /): double division loses integer
    // precision above 2^53 (epoch-nano timestamps are ~1.7e18, ulp ~256),
    // so boundary rows would bucket differently on the two sides and
    // genuinely-matching pairs silently vanish. Both sides use the same
    // truncating DIV, so bucket identity is consistent.
    val lb = left
      .withColumn("__s", leftStart.cast("long"))
      .withColumn("__e", leftEnd.cast("long"))
      .withColumn("__bucket",
        explode(sequence(expr(s"__s DIV ${bucketWidth}L"),
          expr(s"(__e - 1) DIV ${bucketWidth}L"))))
      .drop("__s", "__e")
    val rb = right.withColumn("__t", rightTime.cast("long"))
      .withColumn("__bucket", expr(s"__t DIV ${bucketWidth}L"))
      .drop("__t")
    lb.join(rb, Seq("__bucket"))
      .filter(rightTime >= leftStart && rightTime < leftEnd)
      .drop("__bucket")
  }

  /** Snapshot diff: classify every key across two table versions as
    * added / deleted / changed / unchanged — the change-detection half of a
    * CDC pipeline (the apply half is the upsert compaction query).
    *
    * One full-outer shuffle join on the key — the minimal work for an
    * unordered diff at any scale; at 100 TB both snapshots bucket by the
    * key so the join is exchange-free ([[graft.io.Bucketing]]).
    *
    * Emits the key columns, `status`, and `old_<c>` / `new_<c>` for every
    * compared column. Value comparison is null-safe (`<=>`).
    */
  def snapshotDiff(
      oldSnap: DataFrame,
      newSnap: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    // explicit presence markers, not key nullness: a row whose KEY COLUMN
    // is genuinely null would otherwise always classify as the other
    // side's absence (null keys never equi-match, so they surface one-sided)
    val a = oldSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__a_present", lit(true)).alias("a")
    val b = newSnap.select((keys ++ compareCols).map(col): _*)
      .withColumn("__b_present", lit(true)).alias("b")
    val cond = keys.map(k => col(s"a.$k") === col(s"b.$k")).reduce(_ && _)
    val changed = compareCols
      .map(c => !(col(s"a.$c") <=> col(s"b.$c")))
      .foldLeft(lit(false))(_ || _)
    a.join(b, cond, "full_outer")
      .withColumn("status",
        when(col("a.__a_present").isNull, "added")
          .when(col("b.__b_present").isNull, "deleted")
          .when(changed, "changed")
          .otherwise("unchanged"))
      .select((keys.map(k => coalesce(col(s"a.$k"), col(s"b.$k")).as(k)) :+
        col("status")) ++
        compareCols.flatMap(c =>
          Seq(col(s"a.$c").as(s"old_$c"), col(s"b.$c").as(s"new_$c"))): _*)
  }
}
