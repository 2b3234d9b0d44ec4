package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators: salted two-phase aggregation and salted
  * broadcast-fanout joins. AQE's skew-join handles sort-merge skew
  * automatically (`spark.sql.adaptive.skewJoin.enabled`, on by default);
  * these are the explicit forms for hash aggregations — where a handful of
  * hot keys (a 5-value event_type over 100 TB of events) would put entire
  * key volumes through single reducers.
  */
object Skew {

  /** Deterministic salt in [0, saltBuckets): hash of the salt-source columns.
    * Uses xxhash64 (fast, codegen'd); the salt only needs to spread rows, so
    * engine-portability of the hash doesn't matter — results of the
    * aggregate are salt-independent.
    */
  def saltCol(saltBuckets: Int, saltSource: Seq[Column]): Column =
    pmod(xxhash64(saltSource: _*), lit(saltBuckets.toLong))

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) —
    * spreading each hot key over `saltBuckets` reducers — phase 2 merges the
    * partials on the key alone. Supported merges: algebraic aggregates
    * (count/sum/min/max), supplied as (partial, merge) column pairs over the
    * phase-1 output.
    *
    * For Spark's own hash aggregates the map-side partial agg already does
    * this when upstream partitioning is random; explicit salting matters
    * when the input arrives PRE-PARTITIONED on the hot key (e.g. read back
    * from a key-bucketed table), where map-side combine can't spread.
    */
  def saltedAgg(
      df: DataFrame,
      keyCols: Seq[String],
      saltBuckets: Int,
      saltSource: Seq[Column],
      partials: Seq[(Column, String)],
      merges: Seq[(Column, String)]): DataFrame = {
    val salted = df.withColumn("__salt", saltCol(saltBuckets, saltSource))
    val phase1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1
      .groupBy(keyCols.map(col): _*)
      .agg(merges.head._1.as(merges.head._2),
        merges.tail.map { case (c, n) => c.as(n) }: _*)
  }

  /** Salted count + decimal sum per key (the common case, pre-wired). */
  def saltedCountSum(
      df: DataFrame,
      keyCols: Seq[String],
      valueCol: String,
      saltBuckets: Int,
      saltSource: Seq[Column]): DataFrame =
    saltedAgg(df, keyCols, saltBuckets, saltSource,
      partials = Seq(
        (count(lit(1)), "__n"),
        (sum(col(valueCol).cast("decimal(18,2)")), "__s")),
      merges = Seq(
        (sum(col("__n")), "n"),
        (sum(col("__s")).cast("double"), "sum_value")))

  /** Salted join for a skewed big side against a small dimension: the big
    * side gets a deterministic salt, the small side is exploded `saltBuckets`
    * times (fanout — only viable for genuinely small dims), and the join key
    * becomes (key, salt) so one hot key spreads over `saltBuckets` tasks.
    * With a broadcastable dim prefer `broadcast(dim)`; this is the fallback
    * when the dim is too big to broadcast but small enough to fan out.
    */
  def saltedJoin(
      big: DataFrame,
      dim: DataFrame,
      bigKey: String,
      dimKey: String,
      saltBuckets: Int,
      bigSaltSource: Seq[Column]): DataFrame = {
    val saltedBig = big.withColumn("__salt", saltCol(saltBuckets, bigSaltSource))
    val fannedDim = dim.withColumn("__salt",
      explode(sequence(lit(0L), lit(saltBuckets.toLong - 1L))))
    // qualify both key references — identically-named join keys (the common
    // case) are otherwise an AMBIGUOUS_REFERENCE analysis failure
    saltedBig.join(fannedDim,
        saltedBig("__salt") === fannedDim("__salt") &&
          saltedBig(bigKey) === fannedDim(dimKey))
      .drop("__salt")
  }

  /** Heavy-hitter diagnostic: the exact top-`n` keys by row count with each
    * key's share of the table — the measurement that DECIDES when the
    * salting above (or a broadcast/AQE skew split) is worth applying. One
    * hash aggregation (map-side partials absorb the hot keys — the agg
    * itself is skew-immune), one broadcast 1-row total, one
    * TakeOrderedAndProject for the top-n: no global sort, no window, linear
    * at 100 TB.
    */
  def heavyHitters(df: DataFrame, keyCols: Seq[String], n: Int): DataFrame = {
    require(n > 0, "n must be positive")
    // one scan: the grand total is Σcnt over the (small) counts relation,
    // not a second full pass over the input; the checkpoint stops the
    // two consumers from re-running the base aggregation
    val counts = df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(true)
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .select((keyCols.map(col) :+ col("cnt") :+
        round(col("cnt").cast("double") / col("total"), 6).as("share")): _*)
      .orderBy(col("cnt").desc +: keyCols.map(col): _*)
      .limit(n)
  }
}
