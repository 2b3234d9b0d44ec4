package graft

import org.apache.spark.sql.functions._
import graft.sample.Samplers

/** Invariant tests for the seeded samplers (SURVEY §5.2: size/stratum
  * invariants — seeded-rand variants can't be oracle-checked, so properties
  * stand in: exact sizes, per-group caps, determinism under same seed).
  */
class SamplersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val labeled = (1 to 100)
    .map(i => (i.toLong, if (i % 10 == 0) "rare" else "common"))
    .toDF("id", "label_str")

  test("randomExactN returns exactly n, deterministic per seed") {
    val a = Samplers.randomExactN(labeled, 7, 42).as[(Long, String)].collect()
    val b = Samplers.randomExactN(labeled, 7, 42).as[(Long, String)].collect()
    assert(a.length == 7 && a.sameElements(b))
    val c = Samplers.randomExactN(labeled, 7, 43).as[(Long, String)].collect()
    assert(!a.sameElements(c))
  }

  test("stratifiedExactN covers every label and returns n") {
    val got = Samplers.stratifiedExactN(labeled, "label_str", 6, 42)
    assert(got.count() == 6)
    assert(got.select("label_str").distinct().count() == 2)
  }

  test("stratifiedExactN withReplacement: exact sizes, duplicates possible") {
    // tiny strata + many draw slots → duplicate draws are near-certain,
    // which without-replacement sampling can never produce
    val tiny = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b"))
      .toDF("id", "label_str")
    val got = Samplers.stratifiedExactN(tiny, "label_str", 12, 42,
      withReplacement = true)
    assert(got.count() == 12)   // 6 per stratum despite only 2 rows each
    val perLabel = got.groupBy("label_str").count()
      .as[(String, Long)].collect().toMap
    assert(perLabel == Map("a" -> 6L, "b" -> 6L))
    val maxDup = got.groupBy("id").count().agg(max("count")).as[Long].head()
    assert(maxDup > 1L)         // replacement actually happened
    // deterministic under the same seed
    val again = Samplers.stratifiedExactN(tiny, "label_str", 12, 42,
      withReplacement = true).as[(Long, String)].collect().sorted.toSeq
    assert(again == got.as[(Long, String)].collect().sorted.toSeq)
  }

  test("classBalanced downsamples every class to the min count") {
    val got = Samplers.classBalanced(labeled, "label_str", 42)
    val counts = got.groupBy("label_str").count()
      .as[(String, Long)].collect().toMap
    assert(counts.values.toSet == Set(10L))   // min class = 10 "rare"
  }

  test("classBalancedDeterministic keeps lowest keys per class") {
    val got = Samplers.classBalancedDeterministic(labeled, "label_str", "id")
    assert(got.count() == 20)
    val rare = got.filter(col("label_str") === "common")
      .agg(max("id")).as[Long].head()
    assert(rare == 11L)   // first 10 "common" ids are 1..9,11
  }

  test("headFraction keeps floor(frac*n) rows and rejects frac>1") {
    assert(Samplers.headFraction(labeled, 0.25).count() == 25)
    intercept[IllegalArgumentException] {
      Samplers.headFraction(labeled, 1.5)
    }
  }

  test("positionalSplit: first k in order, remainder disjoint") {
    val (tr, te) = Samplers.positionalSplit(labeled, "id", 5)
    assert(tr.count() == 5 && te.count() == 95)
    assert(tr.agg(max("id")).as[Long].head() == 5L)
    assert(te.agg(min("id")).as[Long].head() == 6L)
  }

  test("shuffle permutes deterministically per seed, preserving rows") {
    val a = Samplers.shuffle(labeled, 42L).as[(Long, String)].collect().toSeq
    val b = Samplers.shuffle(labeled, 42L).as[(Long, String)].collect().toSeq
    assert(a == b)
    assert(a.map(_._1).sorted == (1L to 100L))
    assert(a.map(_._1) != (1L to 100L).toSeq)   // actually permuted
  }

  test("moduloSample is a disjoint partition of the keys") {
    val parts = (0 until 4).map(r =>
      Samplers.moduloSample(labeled, "id", 4, r).count()).sum
    assert(parts == 100)
  }

  test("globalRowNumber matches the single-partition window ranking") {
    val df = labeled.orderBy(rand(7))   // scramble physical order
    val viaRange = Samplers.globalRowNumber(df, Seq("id"), 8)
      .select("id", "__rn").as[(Long, Long)].collect().toMap
    assert(viaRange === (1L to 100L).map(i => i -> i).toMap)
  }

  test("globalCumSum matches the single-partition running total") {
    val df = labeled.withColumn("v", (col("id") % 7) + 1)
      .orderBy(rand(11))   // scramble physical order
    val got = Samplers.globalCumSum(df, Seq("id"), "v", 8)
      .select("id", "__cum").as[(Long, Long)].collect().toMap
    var run = 0L
    (1L to 100L).foreach { i =>
      run += (i % 7) + 1
      assert(got(i) === run, s"cumsum diverged at id=$i")
    }
  }

  test("headFractionOrdered keeps exactly the first floor(frac*n) keys") {
    val got = Samplers.headFractionOrdered(labeled, Seq("id"), 0.23, 8)
      .select("id").as[Long].collect().sorted.toSeq
    assert(got === (1L to 23L))
  }

  test("coSort3 aligns parallel lists by instruction key") {
    val (tr, te, ins) = Samplers.coSort3(
      Seq("tA", "tB", "tC"), Seq("eA", "eB", "eC"), Seq("b", "c", "a"))
    assert(ins == Seq("a", "b", "c"))
    assert(tr == Seq("tC", "tA", "tB") && te == Seq("eC", "eA", "eB"))
    intercept[IllegalArgumentException] {
      Samplers.coSort3(Seq(1), Seq(1, 2), Seq("x"))
    }
  }

  test("topK picks by sort column with stable tiebreak") {
    val got = Samplers.topK(labeled, col("label_str").desc, col("id"), 3)
      .as[(Long, String)].collect()
    assert(got.map(_._2).forall(_ == "rare"))
    assert(got.map(_._1).toSeq == Seq(10L, 20L, 30L))
  }

  test("kfoldAssign: folds in [0,k), deterministic, partition-invariant") {
    val df = spark.range(0, 500).toDF("id")
    val a = Samplers.kfoldAssign(df, "id", 5)
    val folds = a.select("fold").distinct().as[Int].collect().toSet
    assert(folds.subsetOf((0 until 5).toSet) && folds.size == 5)
    // every fold gets a non-degenerate share of 500 uniform keys
    val sizes = a.groupBy("fold").count().as[(Int, Long)].collect().toMap
    assert(sizes.values.forall(n => n > 50 && n < 150))
    // same key -> same fold regardless of partitioning or run
    val b = Samplers.kfoldAssign(df.repartition(13), "id", 5)
      .orderBy("id").select("fold").as[Int].collect().toSeq
    val aSorted = a.orderBy("id").select("fold").as[Int].collect().toSeq
    assert(aSorted == b)
  }

  test("weightedBernoulli: w=1 keeps all, w=0 keeps none, deterministic, monotone-ish") {
    val df = (1L to 400L).toDF("id")
    val all = Samplers.weightedBernoulli(df.withColumn("w", lit(1.0)), "id", "w")
    assert(all.count() === 400L)
    val none = Samplers.weightedBernoulli(df.withColumn("w", lit(0.0)), "id", "w")
    assert(none.count() === 0L)
    val half = Samplers.weightedBernoulli(df.withColumn("w", lit(0.5)), "id", "w")
    val n = half.count()
    assert(n > 120 && n < 280, s"half-weight keep count off: $n")
    // deterministic under repartitioning
    val again = Samplers.weightedBernoulli(
      df.repartition(7).withColumn("w", lit(0.5)), "id", "w")
      .select("id").as[Long].collect().sorted.toSeq
    assert(again === half.select("id").as[Long].collect().sorted.toSeq)
    // a kept row at weight w stays kept at any w' >= w (same draw)
    val q = Samplers.weightedBernoulli(df.withColumn("w", lit(0.25)), "id", "w")
      .select("id").as[Long].collect().toSet
    assert(q.subsetOf(half.select("id").as[Long].collect().toSet))
  }

  test("weightedReservoir: exact k, deterministic, weight-sensitive") {
    // 5 heavy docs (w=1000) among 95 light (w=1): A-ES keys ln(u)/w pull
    // the heavy ids toward rank 1 — all five must land in the top 10
    val df = (1L to 100L).toDF("id")
      .withColumn("w", when(col("id") <= 5, lit(1000.0)).otherwise(lit(1.0)))
    val got = Samplers.weightedReservoir(df, "id", "w", 10)
    val rows = got.select("sel_rank", "id").as[(Int, Long)].collect()
      .sortBy(_._1)
    assert(rows.length == 10)
    assert(rows.map(_._1).toSeq == (1 to 10))
    val heavyInTop = rows.filter(_._2 <= 5L)
    assert(heavyInTop.length == 5,
      s"expected all 5 heavy ids in top 10, got ${heavyInTop.length}")
    // deterministic under repartitioning
    val again = Samplers.weightedReservoir(df.repartition(7), "id", "w", 10)
      .select("sel_rank", "id").as[(Int, Long)].collect()
    assert(again.sortBy(_._1).sameElements(rows.sortBy(_._1)))
    // uniform weights degrade to the pure salted-hash order (rank by u)
    val uni = Samplers.weightedReservoir(
      df.withColumn("w", lit(1.0)), "id", "w", 100)
      .select("res_key").as[Double].collect()
    assert(uni.length == 100 && uni.toSet.size > 90) // keys distinct, finite
    assert(uni.forall(k => k < 0.0 && !k.isNaN && !k.isInfinite))
  }

  test("curriculumInterleave: round-robin bucket drain, bounded window") {
    // buckets 0,1,2 with 4,3,2 members: schedule must drain round-robin
    val df = Seq(
      (1L, 0L), (2L, 0L), (3L, 0L), (4L, 0L),
      (5L, 1L), (6L, 1L), (7L, 1L),
      (8L, 2L), (9L, 2L)).toDF("id", "bucket")
    val got = Samplers.curriculumInterleave(df, "id", "bucket", 9)
      .select("position", "round_idx", "bucket", "id")
      .as[(Int, Int, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == (1 to 9))
    // round 1 = one doc from each bucket in bucket order; bucket never
    // repeats within a round; every doc appears exactly once
    val round1 = got.filter(_._2 == 1).map(_._3).toSeq
    assert(round1 == Seq(0L, 1L, 2L))
    got.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).distinct.length == rows.length)
    }
    assert(got.map(_._4).distinct.length == 9)
    // positions are (round, bucket)-lexicographic
    assert(got.sortBy(r => (r._2, r._3)).map(_._1).toSeq == (1 to 9))
  }

  test("neymanAllocation: N_h*sd weighting, largest-remainder, zero-" +
      "variance strata get zero, over-allocation flagged") {
    import spark.implicits._
    // A: [0, 200] -> sd 100, w 200; B: [100]x3 -> sd 0, w 0;
    // C: [0, 100] -> sd 50, w 100. Budget 10: shares A 6.67 / C 3.33 ->
    // floors 6/3, leftover 1 to A (largest frac) -> 7/0/3; A and C
    // over-allocate past their populations (with-replacement signal)
    val df = (Seq(0L, 200L).map(("A", _)) ++
      Seq(100L, 100L, 100L).map(("B", _)) ++
      Seq(0L, 100L).map(("C", _))).toDF("g", "v")
    val got = graft.sample.Samplers.neymanAllocation(df, "g", "v", 10L)
      .orderBy("stratum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq == Seq(
      ("A", 2L, 100.0, 7L, true),
      ("B", 3L, 0.0, 0L, false),
      ("C", 2L, 50.0, 3L, true)))
    // all-constant degenerate: every alloc 0, nothing distributed
    val flat = Seq(("X", 5L), ("X", 5L), ("Y", 5L)).toDF("g", "v")
    val z = graft.sample.Samplers.neymanAllocation(flat, "g", "v", 4L)
      .collect().map(_.getLong(3)).sum
    assert(z == 0L)
  }

  test("poissonBootstrap: replicate weights replay the md5 CDF ladder " +
      "exactly; envelope brackets the exact mean; constant data has " +
      "zero SE") {
    // independent JVM re-derivation of every (row, replicate) weight:
    // replicate b reads 16-bit window b%3 of the 60-bit digest long of
    // md5(id ":c" b/3)
    def weightOf(id: Long, b: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$id:c${b / 3}".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15)
      val h = java.lang.Long.parseLong(hex, 16)
      val u16 = (h >> ((b % 3) * 16)) & 65535L
      val k = Samplers.PoissonCdf16.indexWhere(u16 < _)
      if (k < 0) 8L else k.toLong
    }
    val rows = (1L to 40L).map(i => (i, i * 10L))
    val df = rows.toDF("id", "x")
    val r = Samplers.poissonBootstrap(df, "id", "x", 8).collect()(0)
    assert(r.getAs[Long]("n") == 40L && r.getAs[Long]("reps") == 8L)
    assert(r.getAs[Double]("mean") == 205.0)
    // expected replicate means from the re-derived weights
    val ms = (0 until 8).map { b =>
      val ws = rows.map { case (id, x) => weightOf(id, b) * x }.sum
      val nb = rows.map { case (id, _) => weightOf(id, b) }.sum
      ws.toDouble / nb.toDouble
    }
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("ci_lo") == r6(ms.min))
    assert(r.getAs[Double]("ci_hi") == r6(ms.max))
    assert(r.getAs[Double]("ci_lo") <= 205.0 &&
      r.getAs[Double]("ci_hi") >= 205.0,
      "bootstrap envelope must bracket the exact mean on smooth data")
    // a constant metric is immune to resampling: SE exactly 0
    val const = (1L to 30L).map((_, 7L)).toDF("id", "x")
    val c = Samplers.poissonBootstrap(const, "id", "x", 8).collect()(0)
    assert(c.getAs[Double]("boot_se") == 0.0 &&
      c.getAs[Double]("ci_lo") == 7.0 && c.getAs[Double]("ci_hi") == 7.0)
    // RATIO form: replicate statistic is (sum w*num)/(sum w*den) — the
    // re-derived weights price it exactly; a constant per-row ratio is
    // resampling-immune (num = 3*den everywhere -> every replicate 3.0)
    val rrows = (1L to 40L).map(i => (i, i * 10L, i * 3L))
    val rr = Samplers.poissonBootstrapRatio(
      rrows.toDF("id", "num", "den"), "id", "num", "den", 8).collect()(0)
    val rms = (0 until 8).map { b =>
      val wn = rrows.map { case (id, n2, _) => weightOf(id, b) * n2 }.sum
      val wd = rrows.map { case (id, _, dn) => weightOf(id, b) * dn }.sum
      wn.toDouble / wd.toDouble
    }
    assert(rr.getAs[Double]("ratio") == r6(
      rrows.map(_._2).sum.toDouble / rrows.map(_._3).sum.toDouble))
    assert(rr.getAs[Double]("ci_lo") == r6(rms.min) &&
      rr.getAs[Double]("ci_hi") == r6(rms.max))
    val prop = (1L to 30L).map(i => (i, i * 3L, i)).toDF("id", "n2", "d2")
    val p = Samplers.poissonBootstrapRatio(prop, "id", "n2", "d2", 8)
      .collect()(0)
    assert(p.getAs[Double]("ratio") == 3.0 &&
      p.getAs[Double]("boot_se") == 0.0 &&
      p.getAs[Double]("ci_lo") == 3.0 && p.getAs[Double]("ci_hi") == 3.0)
    // composition: fold over the (drained) state = the batch op
    assert(Samplers.bootstrapFromSums(Samplers.bootstrapRatioSums(
        rrows.toDF("id", "num", "den"), "id", "num", "den", 8), 8, "ratio")
      .collect().toSeq ===
      Samplers.poissonBootstrapRatio(rrows.toDF("id", "num", "den"),
        "id", "num", "den", 8).collect().toSeq)
  }

  test("prioritySample: n <= k degenerates to the exact total (tau = 0); " +
      "contributions never undercut weights; partitioning-invariant") {
    val df = (1L to 30L).map(i => (i, i * 10L)).toDF("id", "w")
    // n <= k: every row selected, tau = 0, est == exact == 4650
    val full = Samplers.prioritySample(df, "id", "w", 50)
      .select("weight", "contrib", "est_total", "exact_total",
        "rel_err_micro")
      .collect().map(r => (r.getLong(0), r.getString(1).toLong,
        r.getString(2).toLong, r.getLong(3), r.getLong(4)))
    assert(full.length === 30)
    assert(full.forall { case (w, c, est, ex, err) =>
      c == w && est == 4650L && ex == 4650L && err == 0L })
    // k < n: contributions >= own weight (tau floors the small entrants),
    // the estimate lands within a 25% band of the exact total on this
    // fixed-salt fixture, and repartitioning changes nothing
    val big = (1L to 500L).map(i => (i, (i % 97) + 1L)).toDF("id", "w")
    val s1 = Samplers.prioritySample(big, "id", "w", 100)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getString(4).toLong, r.getLong(7))).toSeq
    assert(s1.length === 100)
    s1.foreach { case (_, _, w, c, _) => assert(c >= w) }
    assert(math.abs(s1.head._5) <= 250000L,
      s"estimate out of band: ${s1.head._5}")
    val s2 = Samplers.prioritySample(big.repartition(11), "id", "w", 100)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getString(4).toLong, r.getLong(7))).toSeq
    assert(s1 === s2)
  }

  test("bottomKSampleAggregator: buffer bounded at k, merge-order " +
      "invariant, id tiebreak on colliding draws; streaming twin equals " +
      "the batch estimator on the corpus") {
    val agg = Samplers.bottomKSampleAggregator(3)
    val items = Seq((5L, "a", 50L), (1L, "b", 10L), (3L, "c", 30L),
      (1L, "a", 11L), (9L, "z", 90L))
    def red(xs: Seq[(Long, String, Long)]) =
      xs.foldLeft(agg.zero)(agg.reduce)
    val m1 = agg.finish(agg.merge(red(items.take(2)), red(items.drop(2))))
    val m2 = agg.finish(agg.merge(red(items.reverse.take(3)),
      red(items.reverse.drop(3))))
    // bottom-3 by (draw, id): (1,a,11), (1,b,10), (3,c,30) — the draw-1
    // collision resolves by id, and value 90/50 never enter
    assert(m1.vals.toSeq === Seq(11L, 10L, 30L))
    assert(m2.vals.toSeq === m1.vals.toSeq)
    assert(red(items).draws.length === 3)
    // twin (true bottom-k state) equals the batch path (threshold cut +
    // rank) on the corpus: the cut's 4x slack kept the true bottom-k
    val twin = SparkEntry.queries(
        "streaming_sample_quantiles_lineitem")(spark, sf)
      .collect().map(_.toSeq).toSet
    val batch = SparkEntry.queries("sample_quantiles_lineitem")(spark, sf)
      .collect().map(_.toSeq).toSet
    assert(twin === batch)
  }

  test("sampleQuantiles: k >= n degenerates to the exact percentiles " +
      "(zero-state-advantage identity); k < n stays in bound and is " +
      "partitioning-invariant") {
    import graft.metrics.Metrics
    val df = (1 to 40).map(i => (("g", i.toLong, i.toLong))) // ids 1..40
      .toDF("g", "id", "v")
    // k >= n: the sample IS the corpus -> estimates equal the exact
    // type-1 quantiles, and k_sample = n
    val full = Samplers.sampleQuantiles(df, "id", "v",
        Seq(500000L, 900000L), Seq("g"), 100, 1000000L)
      .orderBy("q").collect()
      .map(r => (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val exact = Metrics.exactPercentiles(df, "v",
        Seq(500000L, 900000L), Seq("g"))
      .orderBy("q").collect().map(r => (r.getDouble(1), r.getLong(2)))
    assert(full.map(x => (x._1, x._4)).toSeq === exact.toSeq)
    assert(full.forall { case (_, n, ks, _) => n == 40L && ks == 40L })
    // k < n on a bigger uniform fixture: exact k rows survive the pre-cut,
    // estimates stay inside a generous +-15% rank band, and the result is
    // a pure function of the DATA (repartitioning changes nothing)
    val big = (1 to 5000).map(i => (("g", i.toLong, i.toLong)))
      .toDF("g", "id", "v")
    val s1 = Samplers.sampleQuantiles(big, "id", "v",
        Seq(500000L), Seq("g"), 200, 150000L)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(6),
        r.getBoolean(8))).toSeq
    assert(s1.head._1 === 200L)            // k_sample = k
    assert(s1.head._4, s"rank error out of band: $s1")
    val s2 = Samplers.sampleQuantiles(big.repartition(13), "id", "v",
        Seq(500000L), Seq("g"), 200, 150000L)
      .collect().map(r => (r.getLong(3), r.getLong(4), r.getLong(6),
        r.getBoolean(8))).toSeq
    assert(s1 === s2)
  }
}
