package graft.sample

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._

/** Sampling / split operators (SURVEY.md §2.4, A1-A6 + T1).
  *
  * Two families:
  *  - seeded-random variants faithful to the reference's semantics (exact-n,
  *    stratified, class-balanced, shuffle). Seeded but NOT bit-identical to
  *    numpy (`np.random` sequences are not reproducible cross-engine) —
  *    covered by invariant unit tests.
  *  - deterministic variants keyed on a unique column (row_number / modulo),
  *    reproducible in any engine — these back the DuckDB-oracle queries
  *    (SURVEY §5.3 determinism rule).
  *
  * Scale note: `orderBy(rand)` is a global sort (full shuffle). For the tiny
  * demo sets the reference draws (k≈3) that's irrelevant, but the `*Scalable`
  * comments flag the 100 TB-safe alternative where it matters.
  */
object Samplers {

  /** A1 — random exact-n sample (`sample_random`, `utils/data_utils.py:20-27`).
    * Exact-n needs a total order; at scale prefer `df.sample(frac, seed)`
    * (no shuffle) when approximate n is acceptable.
    */
  def randomExactN(df: DataFrame, n: Int, seed: Long): DataFrame =
    df.orderBy(rand(seed)).limit(n)

  /** A2 — stratified exact-n: `max(n / nLabels, 1)` rows per label group,
    * topped up with random rows to reach n (`sample_stratified`,
    * `utils/data_utils.py:29-61`).
    *
    * `withReplacement = true` is the faithful mode (the reference's
    * `df.sample(n, replace=True)` within each stratum,
    * `data_utils.py:49-53`): each of the `perLabel` draw slots independently
    * picks one uniform row of its stratum, so duplicate draws are possible.
    * Implemented by replicating each row once per draw slot
    * (`explode(sequence)`) and taking the min-rand row per
    * (label, slot) — one window shuffle, fan-out bounded by perLabel (k≈3
    * in every reference call site; for large perLabel prefer per-stratum
    * Poisson sampling). Default remains without-replacement.
    */
  def stratifiedExactN(
      df: DataFrame,
      labelCol: String,
      n: Int,
      seed: Long,
      withReplacement: Boolean = false): DataFrame = {
    val nLabels = df.select(labelCol).distinct().count()
    val perLabel = math.max(n / math.max(nLabels, 1L), 1L)
    val base =
      if (withReplacement) {
        val slots = df.withColumn("__slot",
          explode(sequence(lit(1L), lit(perLabel))))
        val w = Window.partitionBy(col(labelCol), col("__slot"))
          .orderBy(rand(seed))
        slots.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn", "__slot")
      } else {
        val w = Window.partitionBy(col(labelCol)).orderBy(rand(seed))
        df.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= perLabel).drop("__rn")
      }
    // top-up from the ACTUAL base size — a stratum smaller than perLabel
    // contributes fewer rows than the theoretical perLabel*nLabels, and
    // computing `missing` from theory would silently under-fill n
    val missing = n - base.count()
    if (missing > 0)
      base.unionByName(df.orderBy(rand(seed + 1)).limit(missing.toInt))
    // seeded order: a bare limit(n) would keep whichever rows whichever
    // partition delivered first — nondeterministic despite the seed
    else base.orderBy(rand(seed + 2)).limit(n)
  }

  /** A3 — class-balanced downsample: find the min class count m, keep m rows
    * per class (`create_data_class_balanced`, `utils/data_utils.py:337-346`).
    * One extra tiny job for m (1-row agg), then a single window pass.
    * Reference quirk NOT carried: it keys EM on a dropped "label" column and
    * crashes (`data_utils.py:267` vs `:125`); we key on the label column given.
    */
  def classBalanced(df: DataFrame, labelCol: String, seed: Long): DataFrame = {
    // broadcast the 1-row min instead of collecting it: min over zero
    // groups is NULL, and first().getLong would NPE on an empty input
    // (the crossJoin filter is simply false then — empty result, no crash)
    val m = df.groupBy(labelCol).count().agg(min("count").as("__m"))
    val w = Window.partitionBy(col(labelCol)).orderBy(rand(seed))
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("__rn") <= col("__m"))
      .drop("__rn", "__m")
  }

  /** Deterministic A3: per-class keep the m lowest `keyCol` rows (m = min
    * class count). Oracle-reproducible (no rand).
    */
  def classBalancedDeterministic(
      df: DataFrame,
      labelCol: String,
      keyCol: String): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(col(keyCol))
    val counts = df.groupBy(labelCol).count()
    val m = counts.agg(min("count").as("m"))
    df.withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(m))
      .filter(col("__rn") <= col("m"))
      .drop("__rn", "m")
  }

  /** Deterministic A2: n lowest-key rows per label group. */
  def stratifiedDeterministic(
      df: DataFrame,
      labelCol: String,
      keyCol: String,
      nPerLabel: Int): DataFrame = {
    val w = Window.partitionBy(col(labelCol)).orderBy(col(keyCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= nPerLabel).drop("__rn")
  }

  /** Deterministic hash-ish sample: `key % m == r` — reproducible in any
    * engine, shuffle-free, partition-pruning-friendly.
    */
  def moduloSample(df: DataFrame, keyCol: String, m: Int, r: Int): DataFrame =
    df.filter(col(keyCol) % m === r)

  /** A4 — full shuffle (`shuffle_data`, `utils/data_utils.py:348-357`). */
  def shuffle(df: DataFrame, seed: Long = 42L): DataFrame =
    df.orderBy(rand(seed))

  /** A5 — head-fraction limit (`limit_train_samples`,
    * `utils/data_utils.py:358-367`): despite the CLI name "samples" the value
    * is a fraction; >1.0 raises (reference quirk kept).
    */
  def headFraction(df: DataFrame, frac: Double): DataFrame = {
    require(frac <= 1.0, "max_train_samples must be a fraction <= 1.0")
    df.limit((frac * df.count()).toInt)
  }

  /** Global row number over a total order WITHOUT a single-partition window:
    * range-partition on the order keys, rank within each (parallel) range
    * partition, then add the broadcast cumulative offset of the preceding
    * partitions. Two jobs, both fully parallel — the 100 TB replacement for
    * `Window.orderBy(...)` (which funnels the table through one task).
    * Order keys must be unique for a deterministic ranking.
    */
  /** Shared two-phase scaffold for [[globalRowNumber]] / [[globalCumSum]]:
    * range-partition on the order keys, measure each (parallel) partition
    * with `partitionAgg`, and return the materialized frame plus the
    * broadcast cumulative-offset expression of the preceding partitions.
    * Materialized ONCE (localCheckpoint): RangePartitioner samples
    * boundaries with an RDD-id-derived seed, so two evaluations could
    * partition differently — the measure job and the window job must see
    * the SAME partitioning.
    */
  private def rangedWithOffsets(
      df: DataFrame,
      orderCols: Seq[String],
      numPartitions: Int,
      partitionAgg: Column): (DataFrame, Column, Long) = {
    val (ranged, exprs, totals) =
      rangedWithOffsetsMulti(df, orderCols, numPartitions, Seq(partitionAgg))
    (ranged, exprs.head, totals.head)
  }

  /** The scaffold generalized to SEVERAL partition measures in the one
    * measure job — rank + running sum need (count, sum) offsets from the
    * same partitioning, and measuring twice would range-shuffle (and
    * localCheckpoint) the frame twice.
    */
  private def rangedWithOffsetsMulti(
      df: DataFrame,
      orderCols: Seq[String],
      numPartitions: Int,
      partitionAggs: Seq[Column]): (DataFrame, Seq[Column], Seq[Long]) = {
    val ranged = df
      .repartitionByRange(numPartitions, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val aggCols = partitionAggs.zipWithIndex.map { case (a, i) =>
      coalesce(a, lit(0L)).as(s"__s$i")
    }
    val sizes = ranged.groupBy("__pid")
      .agg(aggCols.head, aggCols.tail: _*)
      .collect()
      .map(r => r.getInt(0) ->
        partitionAggs.indices.map(i => r.getLong(i + 1)))
      .toMap
    val built = partitionAggs.indices.map { i =>
      val offsets = (0 until numPartitions).scanLeft(0L) {
        (acc, p) => acc + sizes.get(p).map(_(i)).getOrElse(0L)
      }
      // ONE map literal + element_at, not an O(P) chained `when`: a chained
      // conditional is fine at 32 partitions but blows up codegen (and plan
      // size) at ~10⁴ partitions; a literal map is a single constant
      // whatever P is, and the lookup is a hash probe.
      val offsetMap = (0 until numPartitions).map(p => p -> offsets(p)).toMap
      // offsets.last = the grand total of the measure — already computed,
      // so callers never need a separate full-table pass for it
      (coalesce(element_at(typedLit(offsetMap), col("__pid")), lit(0L)),
        offsets.last)
    }
    (ranged, built.map(_._1), built.map(_._2))
  }

  def globalRowNumber(
      df: DataFrame,
      orderCols: Seq[String],
      numPartitions: Int = 32,
      rnCol: String = "__rn"): DataFrame =
    globalRowNumberWithTotal(df, orderCols, numPartitions, rnCol)._1

  /** [[globalRowNumber]] plus the total row count (free — the scaffold's
    * partition-size job already sums it; saves callers a full extra scan).
    */
  def globalRowNumberWithTotal(
      df: DataFrame,
      orderCols: Seq[String],
      numPartitions: Int = 32,
      rnCol: String = "__rn"): (DataFrame, Long) = {
    val (ranged, offsetExpr, total) =
      rangedWithOffsets(df, orderCols, numPartitions, count(lit(1)))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
    val ranked = ranged
      .withColumn(rnCol, row_number().over(w).cast("long") + offsetExpr)
      .drop("__pid")
    (ranked, total)
  }

  /** Parallel global cumulative sum over a total order (running total of
    * `valueCol` in `orderCols` order, inclusive of the current row): the
    * same two-phase shape as [[globalRowNumber]] — range-partition on the
    * order keys, partial running sums within each (parallel) partition,
    * broadcast cumulative offsets of the preceding partitions. No
    * single-partition window. `valueCol` must be integral (summed as long).
    */
  def globalCumSum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      numPartitions: Int = 32,
      cumCol: String = "__cum"): DataFrame =
    globalCumSums(df, orderCols, Seq(valueCol), Seq(cumCol), numPartitions)

  /** [[globalCumSum]] over SEVERAL value columns in one scaffold pass —
    * cumCols(i) = inclusive running total of valueCols(i) in `orderCols`
    * order. One range shuffle and one measure job however many columns
    * accumulate (the coalesce in the scaffold guards all-NULL partitions:
    * offset 0, not a driver NPE).
    */
  def globalCumSums(
      df: DataFrame,
      orderCols: Seq[String],
      valueCols: Seq[String],
      cumCols: Seq[String],
      numPartitions: Int = 32): DataFrame = {
    require(valueCols.size == cumCols.size, "one cum name per value column")
    val (ranged, offsetExprs, _) = rangedWithOffsetsMulti(
      df, orderCols, numPartitions,
      valueCols.map(v => sum(col(v).cast("long"))))
    val w = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    valueCols.zip(cumCols).zipWithIndex.foldLeft(ranged) {
      case (acc, ((v, c), i)) =>
        acc.withColumn(c, sum(col(v).cast("long")).over(w) + offsetExprs(i))
    }.drop("__pid")
  }

  /** Global rank AND inclusive running sum over a total order, both from
    * ONE range-partition pass ([[globalRowNumber]] + [[globalCumSum]] fused
    * — the Pareto/cumulative-share shape needs both, and separate calls
    * would range-shuffle the frame twice). No single-partition window;
    * also returns the grand total of `valueCol` (free from the measure
    * job), saving callers the extra full pass.
    */
  def globalRankCumSum(
      df: DataFrame,
      orderCols: Seq[String],
      valueCol: String,
      numPartitions: Int = 32,
      rnCol: String = "__rn",
      cumCol: String = "__cum"): (DataFrame, Long) = {
    val (ranged, offs, totals) = rangedWithOffsetsMulti(
      df, orderCols, numPartitions,
      Seq(count(lit(1)), sum(col(valueCol).cast("long"))))
    val wr = Window.partitionBy(col("__pid"))
      .orderBy(orderCols.map(col): _*)
    val ws = wr.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val out = ranged
      .withColumn(rnCol, row_number().over(wr).cast("long") + offs(0))
      .withColumn(cumCol, sum(col(valueCol).cast("long")).over(ws) + offs(1))
      .drop("__pid")
    (out, totals(1))
  }

  /** A5 at scale: first floor(frac·n) rows in `orderCols` order, computed
    * with [[globalRowNumber]] — no single-partition stage anywhere.
    */
  def headFractionOrdered(
      df: DataFrame,
      orderCols: Seq[String],
      frac: Double,
      numPartitions: Int = 32): DataFrame = {
    require(frac <= 1.0, "fraction must be <= 1.0")
    // total comes free from the rank scaffold's partition-size job — no
    // separate full-table count() pass
    val (ranked, total) =
      globalRowNumberWithTotal(df, orderCols, numPartitions)
    ranked
      .filter(col("__rn") <= (frac * total).toLong)
      .drop("__rn")
  }

  /** A6 — positional train/test split: first k rows (in `orderCol` order) →
    * train, rest → test (`utils/data_utils.py:216-217`). Spark has no implicit
    * row order so the order column must be explicit (file line index, key…).
    *
    * k is tiny in every reference call site (k≈3 demos), so ranking the
    * whole table would be absurd: instead the k-th smallest order key is
    * found with an orderBy+limit — Spark executes it as
    * TakeOrderedAndProject, a per-partition top-k + driver merge of k·p
    * keys, NO shuffle and NO materialization — aggregated to a 1-row max,
    * broadcast, and both sides are plain filters over the original frame.
    * The input is scanned, never checkpointed or ranked; at 100 TB the
    * threshold job moves k keys per partition and the filters are
    * pushdown-eligible scans. Order keys must be unique (documented
    * contract, same as the rank path): ties AT the threshold would all land
    * in train. A NULL order key has no position in the order: null-keyed
    * rows route to TEST and never consume a top-k slot (they would
    * otherwise sort nulls-first into the threshold job AND fall out of
    * both `<= thr` and `> thr` filters — silently vanishing from the
    * split). For rank-everything consumers (headFractionOrdered, shard
    * packing) use [[globalRowNumber]] — this fast path is for tiny k.
    */
  def positionalSplit(
      df: DataFrame,
      orderCol: String,
      k: Int): (DataFrame, DataFrame) = {
    // max over the k lowest NON-NULL keys = the k-th smallest key; null
    // when k=0 or the input is empty → train's `<= null` filter is
    // never-true and test's isNull branch keeps everything, which is the
    // right degenerate split in both cases. k >= n collapses to
    // (everything, empty).
    val thr = df.select(col(orderCol).as("__thr"))
      .filter(col("__thr").isNotNull)
      .orderBy(col("__thr")).limit(k)
      .agg(max(col("__thr")).as("__thr"))
    val train = df.crossJoin(broadcast(thr))
      .filter(col(orderCol) <= col("__thr")).drop("__thr")
    val test = df.crossJoin(broadcast(thr))
      .filter(col(orderCol).isNull ||
        col("__thr").isNull || col(orderCol) > col("__thr"))
      .drop("__thr")
    (train, test)
  }

  /** T2 — 3-way co-sort (`sort_by_instruction`, `utils/data_utils.py:226-246`):
    * align parallel (train, test, instruction) triples by the instruction
    * key so per-sub-task splits stay matched. Driver-side list op — the
    * lists hold DataFrame handles, not data.
    */
  def coSort3[A, B](
      train: Seq[A], test: Seq[A], instructions: Seq[B])(
      implicit ord: Ordering[B]): (Seq[A], Seq[A], Seq[B]) = {
    require(train.length == test.length && test.length == instructions.length,
      "co-sort requires equal-length lists")
    val sorted = instructions.zip(train.zip(test)).sortBy(_._1)
    (sorted.map(_._2._1), sorted.map(_._2._2), sorted.map(_._1))
  }

  /** T1 — top-k by a sort column with a stable unique tiebreaker (the
    * reference's best-function pick is a driver-side `maxBy`,
    * `run_wrangler.py:210-213`; as a data-plane op this is orderBy+limit,
    * which Spark executes as TakeOrderedAndProject — no global sort).
    */
  def topK(df: DataFrame, sortCol: Column, tiebreak: Column, k: Int): DataFrame =
    df.orderBy(sortCol, tiebreak).limit(k)

  /** Deterministic k-fold assignment: fold = md5(key) mod k. The standard
    * cross-validation split as a pure projection — no shuffle, no rand, no
    * driver state, stable under re-partitioning and re-runs (the same row
    * always lands in the same fold on any cluster size). md5 (not `hash`)
    * so the oracle engine reproduces fold identity exactly.
    */
  /** The deterministic-draw convention shared by the hash-based family:
    * the first 32 bits of md5(key) as a long in [0, 2^32) — reproducible
    * in any engine with md5, invariant to partitioning and cluster size.
    * Evaluated by the codegen [[graft.scale.Md5PrefixLongExpr]] (digest
    * bytes read directly — no hex string, no base-16 reparse); the value
    * contract `conv(substring(md5(x),1,8),16,10)` is property-tested
    * against the composed built-ins.
    */
  def hashDraw32(keyCol: Column): Column =
    graft.scale.HashExprs.md5PrefixLong(
      keyCol.cast("string").cast("binary"), 8)

  def kfoldAssign(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k > 0, "k-fold requires k > 0")
    df.withColumn("fold", (hashDraw32(col(keyCol)) % k).cast("int"))
  }

  /** Per-row uniform draw in [0, 1): [[hashDraw32]] as a dyadic rational
    * k/2^32 — exactly representable, engine-portable.
    */
  def uniformDraw(keyCol: Column): Column =
    hashDraw32(keyCol).cast("double") / lit(4294967296.0)

  /** Weighted Bernoulli sampling: keep each row with probability equal to
    * its weight column (importance / quality-proportional sampling — the
    * "sample high-quality documents more often" step of corpus curation).
    *
    * Pure projection + filter: no shuffle, no rand; the draw is a
    * deterministic function of the row's key, so the SAME rows survive on
    * any cluster size, any partitioning, any re-run — and a weight of 1
    * always keeps the row, 0 never does (the draw is strictly < 1).
    */
  def weightedBernoulli(df: DataFrame, keyCol: String, weightCol: String): DataFrame =
    df.filter(uniformDraw(col(keyCol)) < col(weightCol))

  /** Weighted sampling WITHOUT replacement, exact k: the one-pass reservoir
    * of Efraimidis & Spirakis (IPL 2006, algorithm A-ES). Each row draws a
    * deterministic uniform u ∈ (0,1) from a salted md5 of its key and gets
    * reservoir key ln(u)/w — taking the k LARGEST keys is distributionally
    * identical to sequential weighted draws without replacement (the
    * classic u^(1/w) order, in log space so big weights can't underflow).
    *
    * Complements [[weightedBernoulli]] (random SIZE, independent keeps):
    * this is the "give me exactly k docs, quality-proportional" curation
    * call. Scale shape: one map-side projection + TakeOrderedAndProject —
    * no shuffle beyond the k-row reduction, no global sort, no state.
    *
    * Determinism: u is a dyadic rational from the salted hash (never 0, so
    * ln is finite); the emitted `res_key` is 9-decimal-rounded and ordered
    * with the row key as tiebreak, so rank boundaries cannot sit inside
    * cross-engine libm noise. Requires strictly positive weights.
    */
  def weightedReservoir(
      df: DataFrame, keyCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, "weightedReservoir requires k > 0")
    val u = (hashDraw32(concat(lit("res:"), col(keyCol).cast("string")))
      .cast("double") + lit(0.5)) / lit(4294967296.0)
    val keyed = df
      .withColumn("res_key", round(log(u) / col(weightCol), 9))
    graft.core.Bounded.withRank(
      keyed.orderBy(col("res_key").desc, col(keyCol)).limit(k),
      Seq("res_key" -> true, keyCol -> false), "sel_rank")
  }

  /** Curriculum interleave: order training docs easy→hard WITHOUT starving
    * any difficulty level — drain the difficulty buckets round-robin
    * (round r emits each bucket's r-th doc, easiest bucket first), with a
    * seeded shuffle inside each bucket. This is the schedule a curriculum
    * or temperature-mixing loader consumes; emitting `(position, …)` keys
    * makes the schedule itself a checkable relation.
    *
    * Scale shape: the only window is PARTITIONED BY the bucket (parallel
    * across buckets — never a single-partition global window over the data
    * plane); the global (round, bucket) order is imposed by
    * TakeOrderedAndProject for the `take`-row head. The tiny post-limit
    * row_number that names final positions runs over ≤ `take` rows.
    */
  def curriculumInterleave(
      df: DataFrame, keyCol: String, bucketCol: String, take: Int): DataFrame = {
    require(take > 0, "curriculumInterleave requires take > 0")
    val shuffleKey = hashDraw32(concat(lit("cur:"), col(keyCol).cast("string")))
    val w = Window.partitionBy(col(bucketCol))
      .orderBy(shuffleKey, col(keyCol))
    graft.core.Bounded.withRank(
      df.withColumn("round_idx", row_number().over(w))
        .orderBy(col("round_idx"), col(bucketCol), col(keyCol))
        .limit(take),
      Seq("round_idx" -> false, bucketCol -> false, keyCol -> false),
      "position")
  }

  /** Neyman optimal allocation (Neyman 1934, the survey-sampling design
    * standard): split a sample budget across strata proportionally to
    * N_h·σ_h — big AND variable strata deserve samples; a huge constant
    * stratum deserves almost none. The statistically-weighted sibling of
    * [[graft.scale.TextAnalysis.unimaxAllocate]]'s uniform waterfall and
    * the design step BEFORE [[stratifiedDeterministic]] draws.
    *
    * Determinism: per-stratum moments are exact DECIMAL sums; σ_h (the
    * population sd, n divisor) and the real-valued shares are mirrored
    * fixed-order doubles; integerization is LARGEST REMAINDER — floors
    * plus one extra to the L largest fractional parts (ties to the
    * smaller stratum key via [[graft.core.Bounded.withRank]], never a
    * float-only order). Zero-variance strata get weight 0 (the Neyman
    * optimum — sampling a constant teaches nothing); if ALL strata are
    * constant the weights degenerate and every alloc is 0 (declared —
    * callers wanting a floor compose one).
    *
    * Scale: one corpus hash-agg to the stratum dictionary; everything
    * after is dictionary-scale (the unimax convention).
    *
    * @param valCol exact integer value column (cents convention)
    * @return (stratum, n_h, sd, alloc, over_allocated) — sd round 6;
    *         over_allocated flags alloc > n_h (a with-replacement design
    *         signal)
    */
  /** Bounded buffer of the k lexicographically-smallest (draw, id)
    * triples with their carried values — the STREAMING state behind
    * [[sampleQuantiles]]' bottom-k sample (the [[graft.scale.Sketches]]
    * KMV buffer discipline, with the id tiebreak because 32-bit draws DO
    * collide at corpus scale). Arrays stay sorted by (draw, id); reduce
    * early-exits O(log k) once the buffer is full and the incoming triple
    * sorts after the current max, so steady-state cost is the ~k·ln(n/k)
    * true insertions, not n·k copies.
    */
  final case class BkBuf(
      draws: Array[Long], ids: Array[String], vals: Array[Long])
  final case class BkSample(vals: Array[Long])

  def bottomKSampleAggregator(
      k: Int): Aggregator[(Long, String, Long), BkBuf, BkSample] = {
    require(k > 0, s"bad sample size $k")
    // tiebreak compares UTF-8 BYTES, not UTF-16 code units: Spark's
    // binary string ordering (and the DuckDB oracle replay) sort
    // supplementary-plane characters by their UTF-8 encoding, and
    // String.compareTo would diverge from both for such ids
    def cmpUtf8(a: String, b: String): Int = {
      val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(x.length, y.length)
    }
    def cmp(d1: Long, i1: String, d2: Long, i2: String): Int = {
      val c = java.lang.Long.compare(d1, d2)
      if (c != 0) c else cmpUtf8(i1, i2)
    }
    def insert(b: BkBuf, d0: Long, i0: String, v0: Long): BkBuf = {
      val n = b.draws.length
      if (n == k && cmp(d0, i0, b.draws(n - 1), b.ids(n - 1)) >= 0) return b
      var lo = 0; var hi = n
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (cmp(b.draws(mid), b.ids(mid), d0, i0) < 0) lo = mid + 1
        else hi = mid
      }
      val m = math.min(n + 1, k)
      val d = new Array[Long](m)
      val s = new Array[String](m)
      val v = new Array[Long](m)
      System.arraycopy(b.draws, 0, d, 0, lo)
      System.arraycopy(b.ids, 0, s, 0, lo)
      System.arraycopy(b.vals, 0, v, 0, lo)
      d(lo) = d0; s(lo) = i0; v(lo) = v0
      val tail = m - lo - 1
      if (tail > 0) {
        System.arraycopy(b.draws, lo, d, lo + 1, tail)
        System.arraycopy(b.ids, lo, s, lo + 1, tail)
        System.arraycopy(b.vals, lo, v, lo + 1, tail)
      }
      BkBuf(d, s, v)
    }
    new Aggregator[(Long, String, Long), BkBuf, BkSample] {
      override def zero: BkBuf =
        BkBuf(Array.emptyLongArray, Array.empty, Array.emptyLongArray)
      override def reduce(b: BkBuf, x: (Long, String, Long)): BkBuf =
        insert(b, x._1, x._2, x._3)
      override def merge(a: BkBuf, b: BkBuf): BkBuf = {
        val m = math.min(a.draws.length + b.draws.length, k)
        val d = new Array[Long](m)
        val s = new Array[String](m)
        val v = new Array[Long](m)
        var i = 0; var j = 0; var o = 0
        while (o < m) {
          val takeA = j >= b.draws.length || (i < a.draws.length &&
            cmp(a.draws(i), a.ids(i), b.draws(j), b.ids(j)) <= 0)
          if (takeA) { d(o) = a.draws(i); s(o) = a.ids(i); v(o) = a.vals(i)
            i += 1 }
          else { d(o) = b.draws(j); s(o) = b.ids(j); v(o) = b.vals(j)
            j += 1 }
          o += 1
        }
        BkBuf(d, s, v)
      }
      override def finish(b: BkBuf): BkSample = BkSample(b.vals)
      override def bufferEncoder: Encoder[BkBuf] = Encoders.product[BkBuf]
      override def outputEncoder: Encoder[BkSample] =
        Encoders.product[BkSample]
    }
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007): weighted
    * sampling WITHOUT replacement whose k-row sample carries an UNBIASED
    * estimator of any subset-sum — the "audit the corpus total from k
    * rows" primitive. Each row gets priority p = w/u (u uniform); the
    * top-k by priority are kept; with τ = the (k+1)-th priority, each
    * kept row's contribution max(w, τ) sums to an unbiased estimate of
    * Σw (items with w ≥ τ enter surely and count as themselves; the rest
    * enter with probability w/τ and count as τ).
    *
    * Complements [[weightedReservoir]] (A-ES draws a REPRESENTATIVE
    * sample; DLT priorities minimize subset-sum variance — within a
    * factor of the optimal k-sparse estimator). Determinism: u is the
    * salted [[hashDraw32]] draw shifted to [1, 2^32]; priorities are the
    * exact integers (w·2^32) div u (ties by id), so selection, τ, and
    * every contribution replay exactly in SQL. Weights must be positive
    * and < 2^31 (guarded loudly — the scaled priority must fit a long).
    *
    * Scale shape: one projection + TakeOrderedAndProject for the (k+1)
    * head — no shuffle beyond the k-row reduction (the weightedReservoir
    * shape); the exact-total companion is one corpus aggregate.
    *
    * @return k rows: (sel_rank, id…, weight, priority, contrib =
    *         max(w, τ), est_total = Σ contrib, exact_total,
    *         rel_err_micro) — est/exact repeated per row so the relation
    *         is self-contained; contrib/est travel as STRINGS (the
    *         ksDrift wide-decimal bridge rule: τ can reach w·2^32)
    */
  /** Poisson(1) CDF thresholds for the bootstrap's inverse-CDF draw,
    * quantized to 16-bit integers (floor(cdf·65536)) — shared LITERALS
    * (the cosQ discipline): the oracle interpolates the same integers,
    * so both engines threshold identically, and the comparison is pure
    * integer math (no float-boundary flapping possible). 16-bit
    * resolution merges the k = 7 and k = 8 cells (P ≈ 1e-5 mass maps to
    * 7/8 as the ladder lands) — a documented quantization of the
    * resampling distribution, not of the data.
    */
  private[graft] val PoissonCdf16: Seq[Int] =
    Seq(24109, 48218, 60273, 64291, 65296, 65497, 65530, 65535)

  /** ONE-SCAN Poisson bootstrap (Chamandy et al., Google 2012 — "the
    * bootstrap that distributes"): standard error and envelope for a
    * corpus mean WITHOUT resampling shuffles. Efron resampling needs the
    * whole dataset per replicate; the Poisson trick gives every row an
    * independent Poisson(1) multiplicity per replicate, so ALL B
    * replicates accumulate as 2B associative sums in a single
    * aggregation over a single pass — the only way a bootstrap survives
    * 100 TB.
    *
    * Determinism AND digest economy: each replicate's draw is a 16-BIT
    * window of a shared 60-bit digest long — replicate b reads bits
    * 16·(b%3) of md5PrefixLong(id ":c" b/3), so 32 replicates cost 11
    * digests per row, not 32, and the window extraction is codegen'd
    * long bit math — pushed through the Poisson(1) inverse CDF as an
    * integer CASE ladder over [[PoissonCdf16]]; any engine replays
    * every multiplicity exactly, and Σw, Σw·x are exact longs/decimals.
    * The replicate means are the only floats; the envelope (min/max) and
    * the moment-form SE fold over the B-row replicate table in replicate
    * order, rounded 6. Replicates that draw an empty resample (never at
    * real n) drop.
    *
    * @return one row: (n, mean, reps, boot_se, ci_lo, ci_hi) — ci is the
    *         full bootstrap envelope across `reps` replicate means
    */
  def poissonBootstrap(
      df: DataFrame,
      idCol: String,
      valCol: String,
      reps: Int = 32): DataFrame =
    bootstrapFromSums(
      bootstrapRatioSums(df.withColumn("__den1", lit(1L)),
        idCol, valCol, "__den1", reps), reps, "mean")

  /** [[poissonBootstrap]] generalized to a RATIO OF SUMS — the shape of
    * every rate metric (CTR, revenue share, dedup rate): replicate b's
    * statistic is (Σ w·num)/(Σ w·den), which a per-row bootstrap gets
    * right where bootstrapping pre-divided row ratios would weight rows
    * equally regardless of denominator mass. Same one-scan 2B-sum
    * machinery; `poissonBootstrap` IS this op with den ≡ 1.
    */
  def poissonBootstrapRatio(
      df: DataFrame,
      idCol: String,
      numCol: String,
      denCol: String,
      reps: Int = 32): DataFrame =
    bootstrapFromSums(
      bootstrapRatioSums(df, idCol, numCol, denCol, reps), reps, "ratio")

  /** The bootstrap's state half: ONE aggregation row carrying n, the
    * exact overall sums, and the 2B per-replicate weighted sums — every
    * column an associative sum, so it runs unchanged as Complete-mode
    * STREAMING state (the valueCounts convention): the live-ingest
    * deployment maintains a continuously-updated bootstrap CI.
    * bootstrapFromSums ∘ bootstrapRatioSums = the batch op (spec-pinned),
    * so the streaming twin shares the batch oracle verbatim.
    */
  def bootstrapRatioSums(
      df: DataFrame,
      idCol: String,
      numCol: String,
      denCol: String,
      reps: Int): DataFrame = {
    require(reps >= 2 && reps <= 64, s"bad reps $reps")
    val d = (c: Column) => c.cast("decimal(38,0)")
    // 3 independent 16-bit windows per 60-bit digest long: 32 replicates
    // cost ceil(32/3) = 11 digests per row, and the window extraction is
    // codegen'd long bit math (no hex-string churn)
    val nDigests = (reps + 2) / 3
    def digestCol(c: Int): Column =
      graft.scale.HashExprs.md5PrefixLong(
        concat(col(idCol).cast("string"), lit(":c" + c)).cast("binary"), 15)
    def weight(b: Int): Column = {
      val u16 = shiftright(col(s"__h${b / 3}"), (b % 3) * 16)
        .bitwiseAND(lit(65535L))
      PoissonCdf16.zipWithIndex.foldRight(lit(8L): Column) {
        case ((t, k), acc) => when(u16 < t, k.toLong).otherwise(acc)
      }
    }
    // spread the digest+ladder projection across cores — the per-row 11
    // md5 digests and 32 CASE ladders dominate the operator and would
    // otherwise run on the single-task corpus scan (Tables.spread; no-op
    // on the streaming twin's unbounded input). Measured 6.2 s → ~3.3 s
    // on bootstrap_ci_orders at sf0.1.
    val base = graft.io.Tables.spread(
        df.select(col(idCol),
          col(numCol).cast("long").as("__xn"),
          col(denCol).cast("long").as("__xd")))
      .filter(col("__xn").isNotNull && col("__xd").isNotNull)
      .select((col(idCol) +: col("__xn") +: col("__xd") +:
        (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
      .select((col("__xn") +: col("__xd") +:
        (0 until reps).map(b => weight(b).as(s"__w$b"))): _*)
    val aggs = Seq(count(lit(1)).as("n"),
      sum(d(col("__xn"))).as("__sn"), sum(d(col("__xd"))).as("__sd")) ++
      (0 until reps).flatMap { b =>
        Seq(sum(d(col("__xn")) * col(s"__w$b")).as(s"__wn$b"),
          sum(d(col("__xd")) * col(s"__w$b")).as(s"__wd$b"))
      }
    base.agg(aggs.head, aggs.tail: _*)
  }

  /** The summary fold over [[bootstrapRatioSums]]' (drained) state row:
    * replicate statistics, the micro-quantized order-free SE, and the
    * envelope. `label` names the point-estimate column ("mean"/"ratio").
    */
  def bootstrapFromSums(
      agg: DataFrame, reps: Int, label: String): DataFrame = {
    val d = (c: Column) => c.cast("decimal(38,0)")
    val reprows = agg.select(col("n"), col("__sn"), col("__sd"),
        explode(array((0 until reps).map(b => struct(
          col(s"__wn$b").as("wn"), col(s"__wd$b").as("wd"))): _*)).as("r"))
      .select(col("n"), col("__sn"), col("__sd"),
        col("r.wn").as("wn"), col("r.wd").as("wd"))
      .filter(col("wd") > 0L)
      .withColumn("__m", col("wn").cast("double") / col("wd").cast("double"))
      // the SE fold sums ACROSS replicates — raw doubles there would be
      // engine-summation-order sensitive exactly at rounding boundaries
      // (observed live), so replicate statistics quantize to exact
      // micro-longs first: the variance numerator is exact DECIMAL
      // algebra and the only float is one final sqrt/scale, order-free
      .withColumn("__q", round(col("__m") * 1e6, 0).cast("decimal(38,0)"))
    val rd = col("reps").cast("double")
    reprows.groupBy(col("n"), col("__sn"), col("__sd"))
      .agg(count(lit(1)).as("reps"),
        sum(col("__q")).as("__sq"),
        sum(col("__q") * col("__q")).as("__sqq"),
        min(col("__m")).as("__lo"), max(col("__m")).as("__hi"))
      .select(col("n"),
        round(col("__sn").cast("double") / col("__sd").cast("double"), 6)
          .as(label),
        col("reps"),
        round(sqrt(
          (d(col("reps")) * col("__sqq") - col("__sq") * col("__sq"))
            .cast("double") / (rd * (rd - 1.0))) / 1e6, 6).as("boot_se"),
        round(col("__lo"), 6).as("ci_lo"),
        round(col("__hi"), 6).as("ci_hi"))
  }

  def prioritySample(
      df: DataFrame, idCol: String, weightCol: String, k: Int): DataFrame = {
    require(k > 0, s"bad sample size $k")
    val dec = "decimal(38,0)"
    val lim = Int.MaxValue.toLong
    val base = df.select(col(idCol).as("__id"),
        col(weightCol).cast("long").as("__w"))
      .filter(col("__w").isNotNull)
      .withColumn("__w", when(col("__w") > 0 && col("__w") < lim, col("__w"))
        .otherwise(raise_error(concat(lit("prioritySample: weight out of " +
          "(0, 2^31): "), col("__w").cast("string")))))
    val u = hashDraw32(concat(lit("ps:"), col("__id").cast("string"))) + 1L
    val prio = base.withColumn("__u", u)
      .withColumn("__p", expr("__w * CAST(4294967296 AS BIGINT) div __u"))
    val top = graft.core.Bounded.withRank(
      prio.orderBy(col("__p").desc, col("__id")).limit(k + 1),
      Seq("__p" -> true, "__id" -> false), "sel_rank")
    // τ = the (k+1)-th priority; absent (n ≤ k) → 0 → est ≡ exact. The
    // integer priority (w·2^32) div u IS w/u_norm — already weight units.
    val tau = top.filter(col("sel_rank") === k + 1)
      .agg(coalesce(max(col("__p")), lit(0L)).as("__tau"))
    val exact = base.agg(sum(col("__w").cast(dec)).as("__exact"))
    val sel = top.filter(col("sel_rank") <= k)
      .crossJoin(broadcast(tau))
      .withColumn("__c",
        greatest(col("__w").cast(dec), col("__tau").cast(dec)))
    val est = sel.agg(sum(col("__c")).as("__estn"))
    sel.crossJoin(broadcast(est)).crossJoin(broadcast(exact))
      .select(col("sel_rank"), col("__id").as(idCol),
        col("__w").as("weight"), col("__p").as("priority"),
        col("__c").cast("string").as("contrib"),
        col("__estn").cast("string").as("est_total"),
        col("__exact").cast("long").as("exact_total"),
        expr("CAST((__estn - __exact) * 1000000 div __exact AS BIGINT)")
          .as("rel_err_micro"))
  }

  /** Sample-based per-group quantile ESTIMATION with an exact rank-error
    * grade — the bounded-state third member of the quantile family:
    * [[graft.metrics.Metrics.exactPercentiles]] is exact in two linear
    * passes, the streaming twins hold bucket/value state; THIS holds k
    * rows per group, period — the estimator a 100 TB profile runs when
    * one pass and O(k) memory is the whole budget.
    *
    * The sample is the k rows with the smallest salted-md5 draw
    * ([[hashDraw32]]) — a deterministic uniform sample that is a pure
    * FUNCTION of the data (partitioning- and order-independent, the KMV
    * bottom-k principle), so the estimator is exactly SQL-replayable, not
    * merely contract-checked. Estimates are the type-1 quantiles of the
    * sample; the grade joins them back over the corpus for each
    * estimate's exact TRUE rank.
    *
    * Scale shape: one dictionary count, then a threshold PRE-CUT — only
    * rows whose draw falls below ~4k/n of the hash space enter the
    * per-group rank window (≈4k rows per group, never a corpus-scale
    * window; the 4× slack makes an under-full cut P < e^−k vanishing, and
    * both engines replay the same cut so even that case compares equal).
    * The grading pass is one conditional hash-agg with the |q|-row
    * estimate dictionary on a broadcast.
    *
    * @param boundMicro rank-error acceptance in micro-units of n
    *        (50000 = ±5%); the DKW bound for k samples is
    *        ε ≈ √(ln(2/δ)/2k)
    * @return per (group, q): (group…, q, n, k_sample, est_value,
    *         target_rank, true_rank, rank_err_micro, within_bound) —
    *         err = (true−target)·1e6 div n, signed
    */
  def sampleQuantiles(
      df: DataFrame,
      idCol: String,
      valCol: String,
      qMicro: Seq[Long],
      groupCols: Seq[String],
      k: Int,
      boundMicro: Long = 50000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(k > 0, s"bad sample size $k")
    val gcols = groupCols.map(col)
    val base = df
      .select((gcols ++ Seq(col(idCol).cast("string").as("__id"),
        col(valCol).cast("long").as("__v"))): _*)
      .filter(col("__v").isNotNull)
      .localCheckpoint(true) // feeds counts, the cut, and the grade pass
    val counts = base.groupBy(gcols: _*).agg(count(lit(1)).as("__n"))
    val draw = hashDraw32(concat(lit("sq:"), col("__id")))
    // cap = 4·2^32·k div n (≥ 2^32 when n ≤ 4k → keeps everything)
    val capped = base.join(broadcast(counts), groupCols)
      .withColumn("__draw", draw)
      .filter(col("__draw") <
        expr(s"CAST(17179869184 AS BIGINT) * $k div __n"))
    val wk = Window.partitionBy(gcols: _*)
      .orderBy(col("__draw"), col("__id"))
    val sample = capped
      .withColumn("__rn", row_number().over(wk))
      .filter(col("__rn") <= k)
    val kcnt = sample.groupBy(gcols: _*).agg(count(lit(1)).as("__k"))
    val est = sampleQuantileEsts(
      sample.groupBy((gcols :+ col("__v")): _*)
        .agg(count(lit(1)).as("__cnt")),
      qMicro, groupCols)
    sampleQuantilesReport(gradeEstimates(base, est, groupCols), kcnt,
      groupCols, boundMicro)
  }

  /** [[sampleQuantiles]]' estimate fold: type-1 quantile picks over a
    * SAMPLE's value counts, qm kept for downstream grading — shared by
    * the batch path and the streaming bottom-k twin.
    */
  def sampleQuantileEsts(
      sampleCounts: DataFrame,
      qMicro: Seq[Long],
      groupCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(qMicro.nonEmpty && qMicro.forall(q => q > 0 && q <= 1000000L),
      s"bad quantiles $qMicro")
    // ungrouped would build an UNPARTITIONED window; all callers pass a
    // group key — a future ungrouped path must add a globalCumSum branch
    require(groupCols.nonEmpty,
      "sampleQuantileEsts needs groupCols (unpartitioned window otherwise)")
    val gcols = groupCols.map(col)
    val wcum = Window.partitionBy(gcols: _*).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wall = Window.partitionBy(gcols: _*)
    val qs = qMicro.map(q => struct(lit(q).as("__qm")))
    sampleCounts
      .withColumn("__cum", sum(col("__cnt")).over(wcum))
      .withColumn("__ks", sum(col("__cnt")).over(wall))
      .withColumn("__q", explode(array(qs: _*)))
      .select((gcols ++ Seq(col("__v"), col("__cnt"), col("__cum"),
        col("__q.__qm").as("__qm"),
        expr("(__ks * __q.__qm + 999999) div 1000000").as("__rank"))): _*)
      .filter(col("__rank") > col("__cum") - col("__cnt") &&
        col("__rank") <= col("__cum"))
      .select((gcols ++ Seq(col("__qm"), col("__v").as("__est"))): _*)
  }

  /** The grading aggregation: ONE pass over the corpus (batch frame or
    * stream — it is a single stream-static-join + aggregation, so it runs
    * unchanged as Complete-mode state), counting each estimate's exact
    * rank; also carries the per-group row count n.
    */
  def gradeEstimates(
      base: DataFrame,
      est: DataFrame,
      groupCols: Seq[String]): DataFrame =
    base.join(broadcast(est), groupCols)
      // __est is functionally determined by (group, qm) — grouping on it
      // (instead of a first() pick) keeps the agg deterministic AND legal
      // as Complete-mode streaming state
      .groupBy((groupCols.map(col) ++ Seq(col("__qm"), col("__est"))): _*)
      .agg(count(lit(1)).as("__n"),
        sum(when(col("__v") <= col("__est"), 1L).otherwise(0L))
          .as("true_rank"))

  /** Final assembly over the (drained) grade relation — target ranks,
    * signed micro error, the acceptance flag. Shared verbatim by the
    * batch path and the streaming twin.
    */
  def sampleQuantilesReport(
      graded: DataFrame,
      kcnt: DataFrame,
      groupCols: Seq[String],
      boundMicro: Long): DataFrame = {
    val gcols = groupCols.map(col)
    graded
      .join(broadcast(kcnt), groupCols)
      .withColumn("target_rank", expr("(__n * __qm + 999999) div 1000000"))
      .withColumn("rank_err_micro",
        expr("(true_rank - target_rank) * 1000000 div __n"))
      .select((gcols ++ Seq(
        round(col("__qm").cast("double") / 1e6, 6).as("q"),
        col("__n").as("n"), col("__k").as("k_sample"),
        col("__est").as("est_value"), col("target_rank"),
        col("true_rank"), col("rank_err_micro"),
        (abs(col("true_rank") - col("target_rank")) * 1000000L <=
          lit(boundMicro) * col("__n")).as("within_bound"))): _*)
  }

  def neymanAllocation(
      df: DataFrame,
      strataCol: String,
      valCol: String,
      budget: Long): DataFrame = {
    require(budget > 0L, s"bad budget $budget")
    val d = (c: Column) => c.cast("decimal(38,0)")
    val strata = df
      .select(coalesce(col(strataCol).cast("string"), lit("NULL"))
        .as("stratum"), col(valCol).cast("long").as("__v"))
      .filter(col("__v").isNotNull)
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_h"),
        sum(d(col("__v"))).as("__s"),
        sum(d(col("__v")) * d(col("__v"))).as("__ss"))
      .withColumn("__var",
        (d(col("n_h")) * col("__ss") - col("__s") * col("__s"))
          .cast("double") /
          (col("n_h").cast("double") * col("n_h").cast("double")))
      .withColumn("__sd", sqrt(greatest(col("__var"), lit(0.0))))
      .withColumn("__w", col("n_h").cast("double") * col("__sd"))
    // weight mass sums as DECIMAL(38,6) — a raw double Σ across strata
    // would be partial-aggregation-order-dependent (the assocPanel rule)
    val tot = strata.agg(sum(col("__w").cast("decimal(38,6)"))
      .as("__sw"))
    val real = strata.crossJoin(broadcast(tot))
      .withColumn("__share",
        when(col("__sw") > 0, lit(budget.toDouble) * col("__w") /
          col("__sw").cast("double")).otherwise(lit(0.0)))
      .withColumn("__floor", floor(col("__share")).cast("long"))
      .withColumn("__frac", col("__share") - col("__floor"))
    val ranked = graft.core.Bounded.withRank(real,
      Seq(("__frac", true), ("stratum", false)), "__rk")
    val left = ranked.agg((lit(budget) - sum(col("__floor"))).as("__l"))
    // degenerate all-constant case: weights 0 → no leftover distribution
    // (every alloc stays 0), per the declared semantics
    val extra = when(col("__sw") > 0 && col("__rk") <= col("__l"), 1L)
      .otherwise(0L)
    ranked.crossJoin(broadcast(left))
      .select(col("stratum"), col("n_h"),
        round(col("__sd"), 6).as("sd"),
        (col("__floor") + extra).as("alloc"),
        (col("__floor") + extra > col("n_h")).as("over_allocated"))
  }
}
