package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) layout: multi-dimensional clustering for data
  * skipping — the 100 TB answer when a table is filtered on TWO independent
  * columns and a single-column sort can only prune one of them.
  *
  * Interleaving the bits of both dimensions and range-partitioning on the
  * interleaved value gives every output file a bounded min/max envelope in
  * BOTH dimensions simultaneously, so file-level statistics prune point and
  * box predicates on either (or both) columns. This is the technique behind
  * Delta/Iceberg `ZORDER BY` clustering, implemented here as pure Catalyst
  * integer expressions (shift/and/or — codegen'd, shuffle-free to compute;
  * the only exchange is the range partitioner of the final write, which any
  * global layout needs).
  *
  * Everything is integer bit math on BIGINT, reproducible bit-for-bit in the
  * DuckDB oracle with the same `>> & | <<` operators.
  */
object ZOrder {

  /** Interleave the low `bits` bits of `x` and `y` into a Morton code:
    * bit i of x lands at position 2i, bit i of y at 2i+1. Inputs must be
    * non-negative and < 2^bits (callers bucket/modulo first).
    */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits out of range: $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Reference interleave for spec cross-checks. */
  def zValueRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  /** Per-file min/max envelope statistics under a z-order layout.
    *
    * Files are the 2^prefixBits equal-width z-ranges (the top `prefixBits`
    * bits of the 2·bits-bit code — deterministic, shuffle-light: one hash
    * aggregation, no global sort needed for the *stats*; the physical write
    * path is [[writeZOrdered]]). Because a z-prefix fixes the top
    * prefixBits/2 bits of EACH dimension, every file's envelope spans at
    * most a 2^(bits - prefixBits/2) slice of both x and y — which is what
    * makes file skipping effective on either column.
    *
    * Emits per file: row count and the min/max of both dimensions — exactly
    * the footer statistics a parquet reader would prune on.
    */
  def fileStats(
      df: DataFrame,
      x: Column,
      y: Column,
      bits: Int,
      prefixBits: Int): DataFrame = {
    require(prefixBits >= 1 && prefixBits <= 2 * bits,
      s"prefixBits out of range: $prefixBits")
    val z = zValue(x, y, bits)
    df.select(x.as("zx"), y.as("zy"), z.as("zv"))
      .withColumn("file_id", shiftright(col("zv"), 2 * bits - prefixBits))
      .groupBy(col("file_id"))
      .agg(
        count(lit(1)).as("n_rows"),
        min(col("zx")).as("min_x"), max(col("zx")).as("max_x"),
        min(col("zy")).as("min_y"), max(col("zy")).as("max_y"))
  }

  /** Physically write `df` z-ordered: range-partition on the Morton code of
    * (x, y), sort within partitions, write parquet. Each output file then
    * carries tight footer min/max on BOTH columns. One range exchange —
    * the unavoidable cost of any global clustering — and nothing else.
    */
  def writeZOrdered(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int,
      numFiles: Int,
      path: String): Unit = {
    df.withColumn("__z", zValue(col(xCol), col(yCol), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
