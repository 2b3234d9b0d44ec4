package graft.scale

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-state mergeable sketches with EXACTLY-replayable output.
  *
  * The approx family Spark ships (HLL++ `approx_count_distinct`, KLL-ish
  * `percentile_approx`) is the right tool when a ±2% answer is fine, but its
  * outputs are implementation-defined — an oracle can only tolerance-check
  * them (see `approx_stats_events`). The k-minimum-values (KMV / bottom-k)
  * sketch (Bar-Yossef et al. 2002; the theta-sketch core) is the
  * deterministic alternative: its state is the k smallest DISTINCT 64-bit
  * hash values, so every output is an exact function of the input SET —
  * independent of partitioning, merge order, and duplication — and a SQL
  * engine can replay it bit-for-bit with a window over distinct hashes.
  *
  * Scale story (the reason this exists): state is k longs per group per
  * map-side partial — corpus-size-INDEPENDENT. The shuffle carries one
  * ≤k-long array per (partition, group), never the distinct-value set, so
  * a 100 TB distinct-count costs a constant-width exchange where
  * `countDistinct` shuffles every distinct value. Merge is the k-smallest
  * of a sorted-array union — associative and commutative, which is exactly
  * what Spark's partial aggregation needs.
  *
  * Estimator: with the value domain hashed uniformly onto [1, 2^60] (the
  * repo's portable 15-hex-char md5 prefix, `Md5Prefix.eval` contract) and
  * n ≥ k distinct values, the k-th smallest hash h_k estimates
  * n ≈ (k-1) · 2^60 / h_k (the classic unbiased KMV form). Below k distinct
  * values the sketch holds the whole set and the answer is exact. The
  * division is floored BigInteger arithmetic — no float anywhere, so Spark
  * and DuckDB agree to the last digit.
  */
object Sketches {

  /** 2^60 — the hash domain size of the 15-hex-char md5 prefix. */
  val HashDomain: java.math.BigInteger =
    java.math.BigInteger.ONE.shiftLeft(60)

  /** Sorted ascending, distinct, size ≤ k. Invariant maintained by every
    * reduce/merge, so finish is O(1) and the shuffled partial is minimal.
    */
  final case class KmvBuf(vals: Array[Long])

  final case class KmvOut(nSketch: Int, kth: Long, estimate: Long)

  /** KMV estimate from a sketch's content: exact size below k, floored
    * (k-1)·2^60 / h_k at k. Callable from tests and the set-op helpers.
    */
  def estimate(vals: Array[Long], k: Int): Long =
    if (vals.length < k) vals.length.toLong
    else java.math.BigInteger.valueOf(k - 1L)
      .multiply(HashDomain)
      .divide(java.math.BigInteger.valueOf(math.max(1L, vals.last)))
      .longValue()

  /** Insert into a sorted-distinct bounded buffer (O(log k) search +
    * O(k) arraycopy — k is small and constant).
    */
  private def insert(vals: Array[Long], k: Int, h: Long): Array[Long] = {
    val pos = java.util.Arrays.binarySearch(vals, h)
    if (pos >= 0) return vals                      // already present
    val ins = -pos - 1
    if (ins >= k) return vals                      // larger than current max
    val n = math.min(vals.length + 1, k)
    val out = new Array[Long](n)
    System.arraycopy(vals, 0, out, 0, ins)
    out(ins) = h
    System.arraycopy(vals, ins, out, ins + 1, n - ins - 1)
    out
  }

  /** Merge two sorted-distinct arrays keeping the k smallest. */
  private def mergeSorted(a: Array[Long], b: Array[Long], k: Int)
      : Array[Long] = {
    val out = new Array[Long](math.min(a.length + b.length, k))
    var i = 0; var j = 0; var o = 0
    var last = Long.MinValue
    var first = true
    while (o < out.length && (i < a.length || j < b.length)) {
      val v =
        if (j >= b.length || (i < a.length && a(i) <= b(j))) { i += 1; a(i - 1) }
        else { j += 1; b(j - 1) }
      if (first || v != last) { out(o) = v; o = o + 1; last = v; first = false }
    }
    if (o == out.length) out else java.util.Arrays.copyOf(out, o)
  }

  /** The typed aggregator: Long hash in (the caller hashes — keeps the
    * aggregator engine-agnostic and the hash convention in ONE place),
    * bounded sorted buffer, (n_sketch, kth, estimate) out.
    */
  def kmvAggregator(k: Int): Aggregator[Long, KmvBuf, KmvOut] = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    new Aggregator[Long, KmvBuf, KmvOut] {
      override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)
      override def reduce(b: KmvBuf, h: Long): KmvBuf =
        KmvBuf(insert(b.vals, k, h))
      override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
        KmvBuf(mergeSorted(a.vals, b.vals, k))
      override def finish(b: KmvBuf): KmvOut =
        KmvOut(b.vals.length,
          if (b.vals.isEmpty) 0L else b.vals.last,
          estimate(b.vals, k))
      override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
      override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
    }
  }

  /** Vals-emitting variant for set operations: the sketch CONTENT (sorted
    * ≤k distinct hashes) per group, not just its summary.
    */
  def kmvValsAggregator(k: Int): Aggregator[Long, KmvBuf, KmvBuf] = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    new Aggregator[Long, KmvBuf, KmvBuf] {
      override def zero: KmvBuf = KmvBuf(Array.emptyLongArray)
      override def reduce(b: KmvBuf, h: Long): KmvBuf =
        KmvBuf(insert(b.vals, k, h))
      override def merge(a: KmvBuf, b: KmvBuf): KmvBuf =
        KmvBuf(mergeSorted(a.vals, b.vals, k))
      override def finish(b: KmvBuf): KmvBuf = b
      override def bufferEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
      override def outputEncoder: Encoder[KmvBuf] = Encoders.product[KmvBuf]
    }
  }

  /** Theta-sketch-style SET OPERATION estimates from two per-group KMV
    * sketches — the 100 TB shape for "how much do corpus A and corpus B
    * overlap per key" without an exact distinct-join: each side is reduced
    * to k longs per group, the join carries sketches, and every output is
    * still an exact-integer function of the two hash sets.
    *
    * Union: the k smallest of A ∪ B is itself the KMV sketch of the union
    * (merge = the aggregator's merge), so `est_union` is the plain KMV
    * estimate on the merged sketch. Intersection: for a hash h in the
    * union sketch, h's rank in A is ≤ its rank in A∪B ≤ k, so "h ∈ A" ⟺
    * "h ∈ A's sketch" — membership needs no data beyond the sketches.
    * With n_both = |union_sketch ∩ A ∩ B|, the estimator is the classic
    * (n_both / |union_sketch|) · est_union, floored in DECIMAL(38,0).
    * When the union sketch holds everything (n_union_sketch < k) both
    * answers are exact.
    *
    * Groups are inner-joined: a group must appear on both sides (callers
    * with one-sided groups union empty sketches first).
    */
  def kmvSetEstimate(dfA: DataFrame, dfB: DataFrame, groupCols: Seq[String],
      hashCol: Column, k: Int = 64): DataFrame = {
    val agg = udaf(kmvValsAggregator(k), Encoders.scalaLong)
    def sk(df: DataFrame, out: String): DataFrame =
      df.groupBy(groupCols.map(col): _*)
        .agg(agg(hashCol).getField("vals").as(out))
    withSetEstimates(sk(dfA, "__a").join(sk(dfB, "__b"), groupCols), k)
      .select(groupCols.map(col) ++ Seq(col("n_both"),
        col("est_union"), col("est_intersect")): _*)
  }

  /** Shared set-estimate arithmetic over a frame carrying two sketch
    * arrays `__a`/`__b` (see [[kmvSetEstimate]] for the math): adds
    * n_both, est_union, est_intersect.
    */
  private def withSetEstimates(joined: DataFrame, k: Int): DataFrame = {
    val dom = java.math.BigDecimal.valueOf(HashDomain.longValueExact())
    joined
      .withColumn("__u", slice(
        array_sort(array_union(col("__a"), col("__b"))), 1, k))
      .withColumn("__nu", size(col("__u")).cast("long"))
      .withColumn("__kthu",
        coalesce(element_at(col("__u"), size(col("__u"))), lit(0L)))
      .withColumn("n_both", size(array_intersect(col("__u"),
        array_intersect(col("__a"), col("__b")))).cast("long"))
      .withColumn("est_union",
        when(col("__nu") < k, col("__nu")).otherwise(
          expr(s"CAST((CAST(${k - 1} AS DECIMAL(38,0)) * $dom)" +
            " div greatest(__kthu, 1) AS BIGINT)")))
      .withColumn("est_intersect",
        when(col("__nu") < k, col("n_both")).otherwise(
          expr("CAST((CAST(n_both AS DECIMAL(38,0)) * est_union)" +
            " div greatest(__nu, 1) AS BIGINT)")))
  }

  /** Corpus-overlap matrix: pairwise set-operation estimates between EVERY
    * two groups, from one sketch per group — "which sources duplicate each
    * other" answered with |groups| · k longs of state. The pair join is a
    * self-join of the (|groups|-row) sketch table, so at 100 TB the cost is
    * |groups|²/2 array operations on ≤2k elements — never a data-mass term
    * (the corpus is touched exactly once, by the sketch build). Same
    * estimate arithmetic and below-k exactness as [[kmvSetEstimate]].
    */
  def kmvPairwiseOverlap(df: DataFrame, groupCol: String, hashCol: Column,
      k: Int = 64): DataFrame = {
    val agg = udaf(kmvValsAggregator(k), Encoders.scalaLong)
    val sk = df.groupBy(col(groupCol))
      .agg(agg(hashCol).getField("vals").as("__v"))
    val a = sk.select(col(groupCol).as("g_a"), col("__v").as("__a"))
    val b = sk.select(col(groupCol).as("g_b"), col("__v").as("__b"))
    withSetEstimates(a.join(b, col("g_a") < col("g_b")), k)
      .select(col("g_a"), col("g_b"), col("n_both"),
        col("est_union"), col("est_intersect"))
  }

  /** Count-min sketch build (Cormode-Muthukrishnan 2005) — the
    * bounded-memory FREQUENCY counterpart of the KMV distinct sketch, and
    * like it fully deterministic: row j's bucket for key x is the
    * md5-prefix hash of `"j:x"` mod `w`, so both engines place every
    * update identically and the sketch table replays in SQL verbatim.
    *
    * The "sketch" here IS a (depth·width)-row count table — at 100 TB the
    * build is one hash-agg whose output is d·w rows regardless of input
    * mass (map-side partials absorb the heavy keys), two sketches merge by
    * summing aligned counters, and the estimate path touches d rows per
    * queried key. Standard guarantee: est ≥ true; est ≤ true + εN with
    * prob 1-δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
    */
  def cmsBuild(df: DataFrame, key: Column, depth: Int = 4, width: Int = 512)
      : DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS shape d=$depth w=$width")
    df.select(key.cast("string").as("__k"))
      .select(explode(lit((0 until depth).toArray)).as("j"), col("__k"))
      .select(col("j"),
        pmod(HashExprs.md5PrefixLong(
          concat(col("j").cast("string"), lit(":"), col("__k"))
            .cast("binary"), 15), lit(width.toLong)).as("bucket"))
      .groupBy(col("j"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates from a CMS for a (small) key set: min over the d
    * counters each key hashes into. `keys` is broadcast-joined against the
    * d·w sketch — at scale the candidate set comes from a heavy-hitter
    * pre-pass, never the full key domain.
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 512): DataFrame = {
    val probes = keys
      .select(col(keyCol), col(keyCol).cast("string").as("__k"))
      .select(col(keyCol), explode(lit((0 until depth).toArray)).as("j"),
        col("__k"))
      .select(col(keyCol), col("j"),
        pmod(HashExprs.md5PrefixLong(
          concat(col("j").cast("string"), lit(":"), col("__k"))
            .cast("binary"), 15), lit(width.toLong)).as("bucket"))
    // left join + 0-fill: a never-seen key probes EMPTY buckets (no sketch
    // row) and must estimate 0, not disappear
    probes.join(sketch, Seq("j", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }

  /** Per-group KMV distinct sketch of `hashCol` (must already be the
    * 15-hex-char md5-prefix long — pair it with
    * [[HashExprs.md5PrefixLong]](…, 15) so the oracle's
    * `CAST(('0x' || substring(md5(x),1,15)) AS BIGINT)` replays it).
    * Output per group: `n_sketch` (how many values the sketch holds),
    * `kmv_kth` (largest hash the sketch holds = the min(n,k)-th smallest
    * distinct hash; 0 for an empty group), `kmv_est`.
    */
  def kmvDistinct(df: DataFrame, groupCols: Seq[String], hashCol: Column,
      k: Int = 64): DataFrame = {
    val agg = udaf(kmvAggregator(k), Encoders.scalaLong)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(hashCol).as("__kmv"))
      .select(groupCols.map(col) ++ Seq(
        col("__kmv.nSketch").cast("long").as("n_sketch"),
        col("__kmv.kth").as("kmv_kth"),
        col("__kmv.estimate").as("kmv_est")): _*)
  }

  // --------------------------------------------------------------------------
  // HyperLogLog (Flajolet et al. 2007) with exactly-replayable registers
  // --------------------------------------------------------------------------

  /** Fixed 2^p byte registers; merge = elementwise max (associative,
    * commutative, idempotent — the reason HLL state is safe under Spark's
    * partial aggregation AND under streaming Complete-mode re-merge).
    */
  final case class HllBuf(regs: Array[Byte])

  /** Exact-integer register summary (estimate is derived in the column
    * layer so the oracle can replay the same arithmetic):
    * nZeroRegs — registers still 0 (drives linear counting);
    * harmonicNum — Σ_b 2^(R − M[b]) with R = (60−p)+2, the harmonic-mean
    *   denominator lifted to a COMMON power-of-two denominator so it is an
    *   exact long (≤ 2^62 for every p);
    * regsDigest — Σ_b (b+1)·M[b], a replayable checksum of the whole
    *   register table so an oracle mismatch pinpoints register drift.
    */
  final case class HllOut(nZeroRegs: Long, harmonicNum: Long,
      regsDigest: Long, maxRho: Int)

  /** The rho exponent cap: hashes live in [0, 2^60) (15-hex md5 prefix),
    * the bucket eats p bits, so the rank word w has 60−p bits and
    * rho = (leading zeros of w) + 1 ∈ [1, 61−p].
    */
  private def rho(w: Long, wBits: Int): Int =
    if (w == 0L) wBits + 1
    else wBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1

  /** HLL aggregator over md5-prefix hashes: Long hash in (same convention
    * as [[kmvAggregator]] — the caller hashes), 2^p bytes of state,
    * exact-integer summary out. Scale story: the shuffle carries 2^p bytes
    * per (partition, group) — corpus-size-independent, like KMV but with
    * O(1) reduce (KMV pays O(k) arraycopy per new small hash).
    */
  def hllAggregator(p: Int): Aggregator[Long, HllBuf, HllOut] = {
    require(p >= 4 && p <= 16, s"HLL needs 4 <= p <= 16, got $p")
    val m = 1 << p
    val wBits = 60 - p
    new Aggregator[Long, HllBuf, HllOut] {
      override def zero: HllBuf = HllBuf(new Array[Byte](m))
      override def reduce(b: HllBuf, h: Long): HllBuf = {
        val bucket = (h % m).toInt
        val r = rho(h >>> p, wBits)
        if (r > b.regs(bucket)) b.regs(bucket) = r.toByte
        b
      }
      override def merge(a: HllBuf, b: HllBuf): HllBuf = {
        var i = 0
        while (i < m) {
          if (b.regs(i) > a.regs(i)) a.regs(i) = b.regs(i)
          i += 1
        }
        a
      }
      override def finish(b: HllBuf): HllOut = {
        val bigR = wBits + 2
        var zeros = 0L; var num = 0L; var digest = 0L; var maxR = 0
        var i = 0
        while (i < m) {
          val r = b.regs(i).toInt
          if (r == 0) zeros += 1
          num += 1L << (bigR - r)
          digest += (i + 1).toLong * r
          if (r > maxR) maxR = r
          i += 1
        }
        HllOut(zeros, num, digest, maxR)
      }
      override def bufferEncoder: Encoder[HllBuf] = Encoders.product[HllBuf]
      override def outputEncoder: Encoder[HllOut] = Encoders.product[HllOut]
    }
  }

  /** Standard HLL bias constant alpha_m, rendered as the exact decimal
    * literal BOTH engines parse (so the raw-estimate double is reproduced
    * bit-for-bit by the oracle's identical expression).
    */
  def hllAlphaLiteral(m: Int): String = m match {
    case 16 => "0.673"
    case 32 => "0.697"
    case 64 => "0.709"
    case _  => // 0.7213 / (1 + 1.079/m), pre-rounded to 6 decimals
      java.math.BigDecimal.valueOf(0.7213 / (1.0 + 1.079 / m))
        .setScale(6, java.math.RoundingMode.HALF_UP).toPlainString
  }

  /** Per-group HLL distinct estimate of `hashCol` (15-hex md5-prefix long,
    * see [[kmvDistinct]]). Output per group: `n_zero_regs`, `harmonic_num`,
    * `regs_digest` (all exact integers — see [[HllOut]]) and `hll_est`:
    * the classic alpha·m²·2^R / harmonic_num raw estimate, replaced by
    * linear counting m·ln(m/V) below the 2.5·m small-range threshold.
    * Both branches are single-expression doubles over exact-integer inputs
    * with fixed literal order, so DuckDB replays the rounded result.
    */
  /** The estimate expression over (n_zero_regs, harmonic_num) columns —
    * ONE string shared by every HLL surface so the arithmetic can't drift
    * between the grouped, rolling, and streaming forms.
    *
    * alpha·m²·2^R is pre-multiplied into ONE double literal: a naked
    * `0.709 * …` chain parses as DECIMAL arithmetic in DuckDB (overflows
    * DECIMAL(18)) and as a mixed decimal tree in Spark — a single
    * scientific-notation literal is a DOUBLE in both engines and both
    * parse it to the identical bit pattern.
    */
  def hllEstimateSql(p: Int): String = {
    val m = 1 << p
    val cLit = ((hllAlphaLiteral(m).toDouble * m) * m *
      java.lang.Math.scalb(1.0, 62 - p)).toString
    val raw = s"$cLit / CAST(harmonic_num AS DOUBLE)"
    s"CAST(CASE WHEN n_zero_regs > 0 AND ($raw) <= ${2.5 * m}" +
      s" THEN ROUND($m.0 * LN($m.0 / CAST(n_zero_regs AS DOUBLE)))" +
      s" ELSE ROUND($raw) END AS BIGINT)"
  }

  def hllDistinct(df: DataFrame, groupCols: Seq[String], hashCol: Column,
      p: Int = 6): DataFrame = {
    val agg = udaf(hllAggregator(p), Encoders.scalaLong)
    df.groupBy(groupCols.map(col): _*)
      .agg(agg(hashCol).as("__hll"))
      .select(groupCols.map(col) ++ Seq(
        col("__hll.nZeroRegs").as("n_zero_regs"),
        col("__hll.harmonicNum").as("harmonic_num"),
        col("__hll.regsDigest").as("regs_digest")): _*)
      .withColumn("hll_est", expr(hllEstimateSql(p)))
  }

  /** Sliding-window distinct counts from MERGEABLE per-bucket registers —
    * the sketch-algebra payoff: "distinct users in the trailing W hours,
    * per hour" without ever recounting a window. Build one register table
    * per (group, time bucket) — d·m rows per bucket however large the
    * input — then the trailing-W union is register max over a W-wide
    * range join of that TINY table against its own anchor set; the raw
    * events are scanned exactly once. An exact recount pays the full scan
    * PER WINDOW; at 100 TB this is the difference between one pass and W
    * passes.
    *
    * Determinism: identical bucket/rho math to [[hllAggregator]], here as
    * column expressions (bit-length via the binary-format string — exact
    * in both engines), summarized with the shared [[hllEstimateSql]].
    *
    * Output per (groupCols, timeBucket): n_zero_regs, harmonic_num,
    * regs_digest, hll_est for the window (timeBucket − trailing + 1 ..
    * timeBucket].
    */
  def hllRollingDistinct(df: DataFrame, groupCols: Seq[String],
      timeBucket: Column, hashCol: Column, trailing: Int = 4,
      p: Int = 6): DataFrame = {
    val regs = hllRegisterRows(df, groupCols, timeBucket, hashCol, p)
      .groupBy(groupCols.map(col) :+ col("tb") :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
    hllRollupWindows(regs, groupCols, trailing, p)
  }

  /** The per-row (group, tb, bucket, rho) projection the rolling build
    * aggregates with max(rho) — split out so a STREAMING groupBy can run
    * the identical expressions with the state store holding the register
    * maxes (one long per (group, tb, bucket): bounded, merge-order-free
    * state — the streaming twin of the batch register table).
    */
  def hllRegisterRows(df: DataFrame, groupCols: Seq[String],
      timeBucket: Column, hashCol: Column, p: Int = 6): DataFrame = {
    require(groupCols.nonEmpty,
      "rolling HLL needs at least one group column (the anchor " +
        "join keys on it); wrap a constant column for a global rollup")
    val m = 1 << p
    val wBits = 60 - p
    val gcols = groupCols.map(col)
    df.select(gcols :+ timeBucket.as("tb") :+ hashCol.as("__h"): _*)
      .withColumn("bucket", pmod(col("__h"), lit(m.toLong)))
      .withColumn("__w", expr(s"__h DIV $m"))
      .withColumn("rho", when(col("__w") === 0L, lit(wBits + 1))
        .otherwise(lit(wBits + 1) - length(bin(col("__w")))))
      .select(gcols ++ Seq(col("tb"), col("bucket"), col("rho")): _*)
  }

  /** Trailing-window union + summary over a (group, tb, bucket, rho)
    * register table — sketch algebra only, never a data-mass term; shared
    * by the batch build and the streaming state replay.
    */
  def hllRollupWindows(regs: DataFrame, groupCols: Seq[String],
      trailing: Int = 4, p: Int = 6): DataFrame = {
    require(trailing >= 1, s"trailing >= 1, got $trailing")
    val m = 1 << p
    val wBits = 60 - p
    val gcols = groupCols.map(col)
    val anchors = regs.select(gcols :+ col("tb"): _*).distinct()
      .select(gcols.map(c => c.as("a_" + c.toString)) :+
        col("tb").as("a_tb"): _*)
    val joinCond = groupCols.map(g => col(g) === col(s"a_$g"))
      .reduce(_ && _) &&
      col("tb") > col("a_tb") - trailing && col("tb") <= col("a_tb")
    val rolled = regs.join(anchors, joinCond)
      .groupBy(groupCols.map(g => col(s"a_$g").as(g)) :+
        col("a_tb").as("tb") :+ col("bucket"): _*)
      .agg(max(col("rho")).as("rho"))
    rolled
      .groupBy(gcols :+ col("tb"): _*)
      .agg(count(lit(1)).as("__n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${wBits + 2} - rho)"))
          .as("__hp"),
        sum(expr("(bucket + 1) * rho")).as("regs_digest"))
      .withColumn("n_zero_regs", lit(m.toLong) - col("__n_present"))
      .withColumn("harmonic_num", col("__hp") +
        (lit(m.toLong) - col("__n_present")) *
          expr(s"CAST(${java.math.BigInteger.ONE.shiftLeft(62 - p)} AS BIGINT)"))
      .withColumn("hll_est", expr(hllEstimateSql(p)))
      .select(gcols ++ Seq(col("tb"), col("n_zero_regs"),
        col("harmonic_num"), col("regs_digest"), col("hll_est")): _*)
  }

  // ---------------------------------------------------------------------
  // Deterministic KLL-shaped quantile sketch
  // ---------------------------------------------------------------------

  /** Quantile sketch with a GUARANTEED (not probabilistic) rank-error
    * bound — the deterministic sibling of `percentile_approx`'s KLL
    * (Karnin–Lang–Liberty, FOCS 2016), in the repo's exactly-replayable
    * style beside the KMV/CMS/HLL family above.
    *
    * Construction (the KLL compactor made canonical): sort the multiset;
    * pair adjacent items; per pair promote ONE survivor chosen by an md5
    * digest bit; repeat L times, where L is the smallest level count with
    * n ≤ k·2^L. The classic compactor analysis gives every level-ℓ
    * compaction ≤ 2^ℓ rank perturbation, so after L levels any rank
    * estimate is off by at most Σ 2^ℓ = 2^L − 1 < 2n/k — a WORST-CASE
    * bound that holds for adversarial (e.g. fully sorted) input, because
    * the digest bits depend only on (level, block index), never on values.
    *
    * The closed form this file computes: unrolling the tournament, the
    * level-L survivor of block B (original sorted ranks [B·2^L,
    * (B+1)·2^L)) sits at rank fold(B) = descend ℓ = L..1 with
    * B ← 2·B + bit(ℓ, B), bit = md5("ℓ:B") first-hex-digit parity. Ranks
    * are block-monotone, so the survivor SET is a pure function of
    * (n, k) — and the whole sketch reduces to order statistics of the
    * VALUE DICTIONARY: one corpus-mass hash-agg to (value, count), a
    * dictionary-scale cumulative sum, and one bounded explode that lands
    * each survivor rank in its covering dictionary row. No global
    * per-item sort, no window over the corpus, no driver state.
    *
    * Mergeability / streaming: the pre-compaction state is the value
    * dictionary — an associative count monoid, so partials merge by
    * union-sum and the compaction replays on the merged dictionary (the
    * streaming twin holds it as Complete-mode state; the
    * streaming_percentiles bounded-domain caveat applies verbatim).
    *
    * Quantile picks: target rank t(p) = ceil(p·n) − 1 (type-1, integer
    * (num·n + den − 1) div den − 1 — no float p·n), answered by the
    * survivor of block t div 2^L (capped at the last populated block:
    * the final PARTIAL block may have drawn a rank ≥ n). Emitted rank
    * error |survivor_rank − t| is exact; its guarantee is 2^L − 1
    * uncapped, 2^{L+1} − 1 capped.
    */
  def kllQuantiles(
      df: DataFrame,
      valueCol: String,
      k: Int,
      quantiles: Seq[(Int, Int)]): DataFrame =
    kllFromCounts(
      df.groupBy(col(valueCol).as("v")).agg(count(lit(1)).as("c")),
      k, quantiles)

  /** The md5-bit tournament descent (rank of the block-`b` survivor) as a
    * SQL expression — shared by the global and grouped sketch builds.
    */
  private def kllFoldExpr(b: String): String =
    s"aggregate(reverse(filter(sequence(1, 40), i -> i <= lev)), " +
      s"CAST($b AS BIGINT), (acc, l) -> acc * 2 + " +
      s"CAST(conv(substr(md5(CAST(CAST(l AS STRING) || ':' || " +
      s"CAST(acc AS STRING) AS BINARY)), 1, 1), 16, 10) AS BIGINT) % 2)"

  /** PER-GROUP [[kllQuantiles]] — the grouped form the percentile family
    * has everywhere else (exactPercentiles, sampleQuantiles). Same
    * canonical compaction per group; the cumulative count runs as a
    * window PARTITIONED by the group (per-group-dictionary scale — the
    * percentileTargets discipline, hence the loud nonEmpty precondition;
    * the ungrouped form routes through the range-partitioned scaffold
    * instead).
    */
  def kllQuantilesBy(
      df: DataFrame,
      valueCol: String,
      groupCols: Seq[String],
      k: Int,
      quantiles: Seq[(Int, Int)]): DataFrame =
    kllFromCountsBy(
      df.groupBy(groupCols.map(col) :+ col(valueCol).as("v"): _*)
        .agg(count(lit(1)).as("c")),
      groupCols, k, quantiles)

  /** The grouped compaction + pick fold over a (groups…, v, c) dictionary —
    * shared by the batch build and a Complete-mode streaming state.
    */
  def kllFromCountsBy(
      vc: DataFrame,
      groupCols: Seq[String],
      k: Int,
      quantiles: Seq[(Int, Int)]): DataFrame = {
    require(k >= 1, s"capacity k >= 1, got $k")
    require(groupCols.nonEmpty,
      "kllFromCountsBy is grouped; use kllFromCounts for the global form")
    quantiles.foreach { case (num, den) =>
      require(num >= 1 && num <= den, s"bad quantile $num/$den") }
    val spark = vc.sparkSession
    val g = groupCols.map(col)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(g: _*).orderBy(col("v"))
    val cum = vc.withColumn("__cum", sum(col("c")).over(w))
      .localCheckpoint(true)
    val meta = cum.groupBy(g: _*).agg(sum(col("c")).as("n"))
      .withColumn("lev", expr(
        s"array_min(filter(sequence(0, 40), " +
          s"l -> n <= $k * shiftleft(CAST(1 AS BIGINT), l)))"))
      .withColumn("p2", expr("shiftleft(CAST(1 AS BIGINT), lev)"))
      .localCheckpoint(true)
    val ranks = meta
      .select(g ++ Seq(col("lev"),
        explode(expr(
          "sequence(CAST(0 AS BIGINT), (n + p2 - 1) div p2 - 1)"))
          .as("b")): _*)
      .withColumn("r", expr(kllFoldExpr("b")))
      .select(g ++ Seq(col("b"), col("r")): _*)
    val surv = cum.join(broadcast(meta), groupCols)
      .withColumn("b", explode(expr(
        "sequence((__cum - c) div p2, (__cum - 1) div p2)")))
      .join(broadcast(ranks), groupCols :+ "b")
      .filter(col("r") >= col("__cum") - col("c") && col("r") < col("__cum"))
      .select(g ++ Seq(col("b"), col("r"), col("v")): _*)
      .localCheckpoint(true)
    val maxb = surv.groupBy(g: _*).agg(max(col("b")).as("maxb"))
    import spark.implicits._
    val picks = quantiles.toDF("q_num", "q_den")
      .crossJoin(broadcast(meta)).join(broadcast(maxb), groupCols)
      .withColumn("t", expr("(q_num * n + q_den - 1) div q_den - 1"))
      .withColumn("capped", expr("t div p2 > maxb"))
      .withColumn("b", expr("least(t div p2, maxb)"))
    picks.join(surv, groupCols :+ "b")
      .select(g ++ Seq(col("q_num"), col("q_den"), col("n"),
        col("lev").cast("long").as("levels"), col("t").as("target_rank"),
        col("r").as("surv_rank"), col("v").as("est_value"),
        abs(col("r") - col("t")).as("rank_err"),
        expr("CASE WHEN capped THEN 2 * p2 - 1 ELSE p2 - 1 END")
          .as("err_bound")): _*)
  }

  /** The compaction + pick fold over a (v, c) value dictionary — shared by
    * the batch build and the drained Complete-mode streaming state.
    */
  def kllFromCounts(
      vc: DataFrame,
      k: Int,
      quantiles: Seq[(Int, Int)]): DataFrame = {
    require(k >= 1, s"capacity k >= 1, got $k")
    require(quantiles.nonEmpty, "need at least one quantile")
    quantiles.foreach { case (num, den) =>
      require(num >= 1 && num <= den, s"bad quantile $num/$den") }
    val spark = vc.sparkSession
    // dictionary-scale cumulative count (range-partitioned scaffold —
    // the exactPercentiles discipline, no single-task window)
    val cum = graft.sample.Samplers.globalCumSum(vc, Seq("v"), "c")
      .localCheckpoint(true)
    val meta = cum.agg(sum(col("c")).as("n"))
      .withColumn("lev", expr(
        s"array_min(filter(sequence(0, 40), " +
          s"l -> n <= $k * shiftleft(CAST(1 AS BIGINT), l)))"))
      .withColumn("p2", expr("shiftleft(CAST(1 AS BIGINT), lev)"))
    // md5-bit tournament descent, evaluated ONCE PER BLOCK (≈ n/2^L ≤ k
    // rows — the interpreted md5 lambda never touches the dictionary;
    // evaluating it per dictionary row instead measured ~7 s at a 583k
    // near-unique dictionary, vs sub-second this way)
    val ranks = meta
      .select(col("lev"),
        explode(expr("sequence(CAST(0 AS BIGINT), (n + p2 - 1) div p2 - 1)"))
          .as("b"))
      .withColumn("r", expr(kllFoldExpr("b")))
      .select(col("b"), col("r"))
    // each dictionary row covers ranks [cum-c, cum): explode its candidate
    // blocks (codegen'd, ≤ |dict| + n/2^L rows), broadcast-equi-join the
    // per-block ranks, keep the rank that lands inside the row
    val surv = cum.crossJoin(broadcast(meta))
      .withColumn("b", explode(expr(
        "sequence((__cum - c) div p2, (__cum - 1) div p2)")))
      .join(broadcast(ranks), Seq("b"))
      .filter(col("r") >= col("__cum") - col("c") && col("r") < col("__cum"))
      .select(col("b"), col("r"), col("v"))
      .localCheckpoint(true)
    val maxb = surv.agg(max(col("b")).as("maxb"))
    import spark.implicits._
    val picks = quantiles.toDF("q_num", "q_den")
      .crossJoin(broadcast(meta)).crossJoin(broadcast(maxb))
      .withColumn("t", expr("(q_num * n + q_den - 1) div q_den - 1"))
      .withColumn("capped", expr("t div p2 > maxb"))
      .withColumn("b", expr("least(t div p2, maxb)"))
    picks.join(surv, Seq("b"))
      .select(col("q_num"), col("q_den"), col("n"),
        col("lev").cast("long").as("levels"), col("t").as("target_rank"),
        col("r").as("surv_rank"), col("v").as("est_value"),
        abs(col("r") - col("t")).as("rank_err"),
        expr("CASE WHEN capped THEN 2 * p2 - 1 ELSE p2 - 1 END")
          .as("err_bound"))
  }
}
