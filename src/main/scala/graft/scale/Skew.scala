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

  /** Exact equi-join cardinality — the planner advisor that prices a join
    * BEFORE running it: |A ⋈_k B| = Σ_k cA(k)·cB(k) computed from the two
    * key histograms (two hash-aggs + one key-dictionary join), never the
    * join itself. The first number every 100 TB join review asks for —
    * especially self-joins, where one hot key turns Σ c² quadratic; the
    * output therefore also names the worst key's mass (max cA·cB), its
    * share of the join, and the left-side fanout. The companion to
    * [[graft.metrics.Metrics.skewProfile]] (that profiles ONE relation's
    * key; this prices the meeting of two).
    *
    * Semantics: NULL keys are counted in n_left/n_right (table sizes) but
    * never join (SQL equi-join semantics — the histogram join drops the
    * NULL group on both sides). Products accumulate as DECIMAL(38,0):
    * exact at any scale the join itself could not even materialize.
    *
    * @return ONE row: (n_left, n_right, n_keys_left, n_keys_right,
    *         n_keys_common, join_rows, max_key_rows, max_key_share,
    *         fanout_left) — shares/fanout rounded 6, NULL when join_rows
    *         is 0
    */
  def joinCardinality(
      left: DataFrame,
      leftKey: String,
      right: DataFrame,
      rightKey: String): DataFrame = {
    // each histogram feeds its totals AND the dictionary join — pin once
    // so each input is scanned exactly once
    val ca = left.groupBy(col(leftKey).as("__k"))
      .agg(count(lit(1)).as("__ca")).localCheckpoint(true)
    val cb = right.groupBy(col(rightKey).as("__k"))
      .agg(count(lit(1)).as("__cb")).localCheckpoint(true)
    val la = ca.agg(sum(col("__ca")).as("n_left"),
      count(lit(1)).as("n_keys_left"))
    val lb = cb.agg(sum(col("__cb")).as("n_right"),
      count(lit(1)).as("n_keys_right"))
    val prod = col("__ca").cast("decimal(38,0)") * col("__cb")
    val j = ca.join(cb, Seq("__k"))
      .agg(count(lit(1)).as("n_keys_common"),
        sum(prod).as("__rows"), max(prod).as("__maxk"))
    j.crossJoin(broadcast(la)).crossJoin(broadcast(lb))
      .select(col("n_left"), col("n_right"),
        col("n_keys_left"), col("n_keys_right"), col("n_keys_common"),
        coalesce(col("__rows").cast("long"), lit(0L)).as("join_rows"),
        coalesce(col("__maxk").cast("long"), lit(0L)).as("max_key_rows"),
        when(col("__rows") > 0,
          round(col("__maxk").cast("double") / col("__rows").cast("double"),
            6)).as("max_key_share"),
        when(col("__rows") > 0,
          round(col("__rows").cast("double") / col("n_left").cast("double"),
            6)).as("fanout_left"))
  }
}
