package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Event-time operators over the `events` table: tumbling windows,
  * gap-based sessionization, JSON property extraction.
  *
  * The harness parquet stores `ts` as TIMESTAMP(NANOS), which Spark 4 refuses
  * to read as a timestamp (PARQUET_TYPE_ILLEGAL); with
  * `spark.sql.legacy.parquet.nanosAsLong=true` it surfaces as epoch-nanos
  * LongType. All operators here therefore work on exact integer epoch math
  * (`DIV` — never double division, which loses precision above 2^53), and
  * emit epoch seconds (bigint): deterministic, and representation-agnostic
  * across Spark (µs) and DuckDB (ns).
  */
object Events {

  private def isNanosLong(df: DataFrame): Boolean =
    df.schema("ts").dataType == LongType

  /** Epoch seconds of the event, exact. */
  def epochSeconds(df: DataFrame): Column =
    if (isNanosLong(df)) expr("ts DIV 1000000000")
    else unix_timestamp(col("ts"))

  /** Epoch seconds of the enclosing hour boundary. */
  def hourEpoch(df: DataFrame): Column =
    if (isNanosLong(df)) expr("(ts DIV 3600000000000) * 3600")
    else unix_timestamp(date_trunc("hour", col("ts")))

  /** A proper TimestampType view of ts (µs precision) for operators that
    * need one (session_window, watermarks, streaming).
    */
  def tsAsTimestamp(df: DataFrame): Column =
    if (isNanosLong(df)) timestamp_micros(expr("ts DIV 1000"))
    else col("ts")

  /** Tumbling 1-hour window aggregation (equivalent to
    * `window($"ts", "1 hour")` for aligned windows, emitted as the hour's
    * epoch seconds → oracle-friendly). One hash-agg shuffle on
    * (hour, event_type).
    */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(hourEpoch(events).as("hour_epoch"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** Gap-based sessionization: a new session starts when the gap to the
    * previous event of the same user exceeds `gapSeconds`. Classic
    * lag → boundary flag → running sum (all in one window shuffle on
    * user_id), then per-session aggregation.
    *
    * At 100 TB: the window and the groupBy share the user_id partitioning so
    * Catalyst reuses one exchange; skewed users are bounded by session count,
    * not event count, after the agg. Ordering uses the raw ns column when
    * available (full precision).
    */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800L): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val withBoundary = events
      .withColumn("__ep", epochSeconds(events))
      .withColumn("__prev", lag(col("__ep"), 1).over(byUser))
      .withColumn("__new",
        when(col("__prev").isNull ||
          col("__ep") - col("__prev") > gapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx",
        sum(col("__new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    withBoundary
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("__ep")).as("start_epoch"),
        max(col("__ep")).as("end_epoch"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
  }

  /** Sliding event-time windows (batch form of the streaming sliding agg):
    * each event lands in window_len/slide windows; the generator fan-out is
    * the built-in `window()` function, emitted as window-start epoch seconds.
    */
  def slidingAgg(events: DataFrame, windowLen: String = "1 hour",
      slide: String = "30 minutes"): DataFrame =
    events
      .withColumn("__ts", tsAsTimestamp(events))
      .groupBy(window(col("__ts"), windowLen, slide), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Built-in session_window variant (same semantics, Spark-native operator;
    * covered by unit tests — the lag-based form above is the oracle query).
    */
  def sessionizeNative(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .withColumn("__ts", tsAsTimestamp(events))
      .groupBy(session_window(col("__ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))

  /** JSON props extraction: `props` is a JSON string column; pull typed
    * fields with get_json_object (codegen'd, no UDF).
    */
  def extractProps(events: DataFrame): DataFrame =
    events.withColumn("prop_k",
      get_json_object(col("props"), "$.k").cast("long"))
}
