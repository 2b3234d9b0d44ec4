package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.scale.{HashExprs, Sketches}

class SketchesSpec extends SparkSpec {
  import spark.implicits._

  /** Exact reference: k smallest distinct hashes per group via a window —
    * the same formulation the DuckDB oracle uses.
    */
  private def windowForm(rows: Seq[(String, Long)], k: Int)
      : Map[String, (Long, Long, Long)] = {
    val df = rows.toDF("g", "v")
      .withColumn("h",
        HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
      .select($"g", $"h").distinct()
      .withColumn("rn", row_number().over(
        Window.partitionBy($"g").orderBy($"h")))
      .filter($"rn" <= k)
      .groupBy($"g")
      .agg(count(lit(1)).as("n"), max($"h").as("kth"),
        sort_array(collect_list($"h")).as("vals"))
    df.collect().map { r =>
      val vals = r.getSeq[Long](3).toArray
      r.getString(0) ->
        (r.getLong(1), r.getLong(2), Sketches.estimate(vals, k))
    }.toMap
  }

  private def aggForm(rows: Seq[(String, Long)], k: Int, parts: Int)
      : Map[String, (Long, Long, Long)] = {
    val df = rows.toDF("g", "v").repartition(parts)
      .withColumn("h",
        HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
    Sketches.kmvDistinct(df, Seq("g"), col("h"), k).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
  }

  test("KMV aggregator equals the window form on both sides of k") {
    // group a: 200 distinct (> k) with every value duplicated 3x;
    // group b: 5 distinct (< k); group c: exactly k distinct
    val k = 8
    val rows =
      (1 to 200).flatMap(i => Seq.fill(3)(("a", i.toLong))) ++
      (1 to 5).map(i => ("b", i.toLong)) ++
      (1 to k).map(i => ("c", 1000L + i))
    val want = windowForm(rows, k)
    val got = aggForm(rows, k, parts = 7)
    assert(got == want)
    // below-k groups are EXACT counts
    assert(got("b")._3 == 5L)
    assert(got("c")._1 == k.toLong)
  }

  test("KMV is partitioning- and merge-order-independent") {
    val k = 16
    val rows = (1 to 500).map(i => ("g" + (i % 3), i.toLong * 37L))
    val canonical = aggForm(rows, k, parts = 1)
    for (p <- Seq(2, 5, 13))
      assert(aggForm(rows, k, parts = p) == canonical,
        s"KMV drifted at $p partitions")
  }

  test("KMV estimate lands near the true distinct count at k=64") {
    val k = 64
    val n = 5000
    val rows = (1 to n).map(i => ("x", i.toLong))
    val est = aggForm(rows, k, parts = 4)("x")._3
    // KMV relative standard error ~ 1/sqrt(k-2) ≈ 12.7%; 4 sigma bound
    assert(math.abs(est - n) < n * 0.51, s"estimate $est vs true $n")
  }

  private def hashOf(v: Long): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(v.toString.getBytes("UTF-8"))
    // same contract as Md5Prefix.eval(bytes, 15): 15 hex chars = first 7
    // bytes + high nibble of the 8th
    var x = 0L
    for (i <- 0 until 8) x = (x << 8) | (d(i) & 0xffL)
    x >>> 4
  }

  test("kmvSetEstimate equals first-principles reference on both branches") {
    val k = 16
    // group "big": 120 vs 100 values overlapping in [81, 120] (40 common);
    // group "small": 6 vs 5 values overlapping in [3, 6] — union below k,
    // where every output must be EXACT
    val aRows = (1L to 120L).map(("big", _)) ++ (1L to 6L).map(("small", _))
    val bRows = (81L to 180L).map(("big", _)) ++ (3L to 7L).map(("small", _))
    def mk(rows: Seq[(String, Long)], parts: Int) =
      rows.toDF("g", "v").repartition(parts)
        .withColumn("__h",
          HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
    val got = Sketches.kmvSetEstimate(
        mk(aRows, 5), mk(bRows, 3), Seq("g"), col("__h"), k)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap

    // reference: bottom-k over the exact hash sets
    def ref(as: Set[Long], bs: Set[Long]): (Long, Long, Long) = {
      val ha = as.map(hashOf).toArray.sorted.take(k)
      val hb = bs.map(hashOf).toArray.sorted.take(k)
      val u = (ha ++ hb).distinct.sorted.take(k)
      val nBoth = u.count(h => ha.contains(h) && hb.contains(h)).toLong
      val estU = Sketches.estimate(u, k)
      val estI =
        if (u.length < k) nBoth
        else java.math.BigInteger.valueOf(nBoth)
          .multiply(java.math.BigInteger.valueOf(estU))
          .divide(java.math.BigInteger.valueOf(u.length.toLong)).longValue()
      (nBoth, estU, estI)
    }
    assert(got("big") == ref((1L to 120L).toSet, (81L to 180L).toSet))
    assert(got("small") == ref((1L to 6L).toSet, (3L to 7L).toSet))
    // the below-k group is exact: union 7, intersection 4
    assert(got("small")._2 == 7L && got("small")._3 == 4L)
  }

  test("kmv_setops_events query: sketch agrees with exact companions") {
    val out = SparkEntry.queries("kmv_setops_events")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nUnion, nInter) = (r.getLong(3), r.getLong(4))
      val (estU, estI) = (r.getLong(6), r.getLong(7))
      assert(math.abs(estU - nUnion) <= math.max(8L, nUnion),
        s"union estimate off: $r")
      assert(math.abs(estI - nInter) <= math.max(8L, nUnion), // union-scale error
        s"intersect estimate off: $r")
    }
  }

  test("kmvPairwiseOverlap agrees with kmvSetEstimate per pair") {
    val k = 16
    val rows =
      (1 to 100).map(i => ("s1", i.toLong)) ++
      (51 to 160).map(i => ("s2", i.toLong)) ++
      (1 to 10).map(i => ("s3", i.toLong * 1000L))
    val df = rows.toDF("g", "v")
      .withColumn("__h",
        HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
    val got = Sketches.kmvPairwiseOverlap(df, "g", col("__h"), k)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.keySet == Set(("s1", "s2"), ("s1", "s3"), ("s2", "s3")))
    for (((ga, gb), triple) <- got) {
      val a = df.filter($"g" === ga).withColumn("g", lit("x"))
      val b = df.filter($"g" === gb).withColumn("g", lit("x"))
      val ref = Sketches.kmvSetEstimate(a, b, Seq("g"), col("__h"), k)
        .collect()(0)
      assert(triple == ((ref.getLong(1), ref.getLong(2), ref.getLong(3))),
        s"pair ($ga,$gb) diverged from kmvSetEstimate")
    }
    // disjoint pair is exactly empty-intersection
    assert(got(("s1", "s3"))._3 == 0L)
  }

  test("CMS: est >= exact for every key, exact under no-collision, 0 for unseen") {
    val d = 4; val w = 512
    // 40 keys with distinct frequencies 1..40 — far below w, so most rows
    // are collision-free and many estimates come out exact
    val rows = (1 to 40).flatMap(k => Seq.fill(k)(k.toLong)).toDF("k")
    val sketch = Sketches.cmsBuild(rows, $"k", d, w)
    assert(sketch.count() <= d.toLong * w)
    val keys = ((1 to 40) ++ Seq(999, 1000)).map(_.toLong).toDF("k")
    val est = Sketches.cmsEstimate(sketch, keys, "k", d, w)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (k <- 1 to 40)
      assert(est(k.toLong) >= k.toLong, s"undercount at $k: ${est(k.toLong)}")
    // total mass 820 over 512 buckets: min-of-4 rarely collides on ALL
    // rows; assert the bound est <= exact + total (loose, deterministic)
    for (k <- 1 to 40) assert(est(k.toLong) <= k.toLong + 820L)
    assert(est(999L) == 0L && est(1000L) == 0L, "unseen keys must be 0")
  }

  test("CMS build is partitioning-invariant and merges by counter addition") {
    val rows = (1 to 300).map(i => (i % 23).toLong)
    val a = Sketches.cmsBuild(rows.toDF("k").repartition(1), $"k")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val b = Sketches.cmsBuild(rows.toDF("k").repartition(7), $"k")
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(a == b)
    // merge = summed counters: sketch(first half) + sketch(second half)
    val h1 = Sketches.cmsBuild(rows.take(150).toDF("k"), $"k")
    val h2 = Sketches.cmsBuild(rows.drop(150).toDF("k"), $"k")
    val merged = h1.unionByName(h2).groupBy($"j", $"bucket")
      .agg(sum($"cnt").as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(merged == a)
  }

  test("cms_counts_events query: overcount non-negative, top keys present") {
    val out = SparkEntry.queries("cms_counts_events")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 15)
    out.foreach { r =>
      assert(r.getLong(3) >= 0L, s"CMS undercounted: $r")
      assert(r.getLong(2) >= r.getLong(1), s"est < exact: $r")
    }
  }

  test("streaming KMV state merges across micro-batches to the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val k = 8
    val agg = udaf(Sketches.kmvAggregator(k),
      org.apache.spark.sql.Encoders.scalaLong)
    val in = MemoryStream[(String, Long)]
    val sk = in.toDF().toDF("g", "v")
      .withColumn("__h",
        HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
      .groupBy($"g").agg(agg($"__h").as("s"))
      .select($"g", $"s.nSketch".as("n"), $"s.kth".as("kth"),
        $"s.estimate".as("est"))
    val name = "kmv_merge_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = sk.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    // three batches with overlapping values — the second and third must
    // MERGE into existing per-group state, not restart it
    in.addData((1 to 30).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    in.addData((20 to 50).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    in.addData((1 to 5).map(i => ("b", i.toLong)): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getLong(2), r.getLong(3)))
      .toMap
    val wantA = windowForm((1 to 50).map(i => ("a", i.toLong)), k)("a")
    assert(got("a") == ((wantA._1.toInt, wantA._2, wantA._3)))
    assert(got("b")._1 == 5 && got("b")._3 == 5L)
  }

  test("kmv_distinct_events query matches its own exact column") {
    val out = SparkEntry.queries("kmv_distinct_events")(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (exact, est) = (r.getLong(1), r.getLong(4))
      // at sf0.001 each event_type has few-dozen users; sketch exact or near
      assert(est > 0 && math.abs(est - exact) <= math.max(8L, exact),
        s"row $r")
    }
  }

  // ---- HyperLogLog ---------------------------------------------------------

  /** JVM register reference: same bucket/rho math as the aggregator, from
    * the hash set directly.
    */
  private def hllReference(hashes: Seq[Long])
      : (Long, Long, Long) = {
    val regs = new Array[Int](64)
    hashes.distinct.foreach { h =>
      val b = (h % 64).toInt
      val w = h >>> 6
      val r = if (w == 0L) 55 else 55 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (r > regs(b)) regs(b) = r
    }
    val zeros = regs.count(_ == 0).toLong
    val num = regs.map(r => 1L << (56 - r)).sum
    val digest = regs.zipWithIndex.map { case (r, i) => (i + 1).toLong * r }.sum
    (zeros, num, digest)
  }

  test("HLL summary is partition-invariant and matches the JVM reference") {
    val rows =
      (1 to 500).flatMap(i => Seq.fill(3)(("a", i.toLong))) ++
        (1 to 5).map(i => ("b", i.toLong))
    def run(parts: Int): Map[String, (Long, Long, Long, Long)] = {
      val df = rows.toDF("g", "v").repartition(parts)
        .withColumn("h",
          HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
      Sketches.hllDistinct(df, Seq("g"), col("h")).collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    }
    val one = run(1)
    assert(run(7) == one, "registers must not depend on partitioning")
    // reference from the same hash column
    val hashed = rows.toDF("g", "v")
      .withColumn("h",
        HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
      .select($"g", $"h").collect().map(r => r.getString(0) -> r.getLong(1))
    for (g <- Seq("a", "b")) {
      val (zeros, num, digest) =
        hllReference(hashed.collect { case (`g`, h) => h }.toSeq)
      assert(one(g)._1 == zeros && one(g)._2 == num && one(g)._3 == digest,
        s"group $g summary drifted from reference")
    }
    // accuracy: 500 distinct with m=64 → σ ≈ 13%; assert a loose 30%
    assert(math.abs(one("a")._4 - 500L) <= 150, s"est ${one("a")._4}")
    // small group takes the linear-counting branch and lands within ±2
    assert(math.abs(one("b")._4 - 5L) <= 2, s"est ${one("b")._4}")
  }

  test("hllRollingDistinct: every window's summary equals the batch " +
    "sketch of exactly that window's rows") {
    val rows = for (h <- 0 to 5; u <- 1 to (10 + h * 3))
      yield ("a", h.toLong, (u * (h + 7)).toLong)
    val df = rows.toDF("g", "tb", "v")
      .withColumn("__h",
        HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15))
    val roll = Sketches.hllRollingDistinct(df, Seq("g"), $"tb", $"__h", 3)
      .collect()
      .map(r => r.getLong(1) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(roll.keySet == (0L to 5L).toSet)
    for (anchor <- 2L to 5L) {
      val slice = df.filter($"tb" > anchor - 3 && $"tb" <= anchor)
      val b = Sketches.hllDistinct(slice, Seq("g"), col("__h")).collect()(0)
      assert(roll(anchor) ==
        ((b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))),
        s"anchor $anchor drifted from the batch union")
    }
  }

  // ---- deterministic KLL-shaped quantile sketch --------------------------

  /** JVM replica of the md5-bit tournament descent (the oracle fold). */
  private def kllDescent(block: Long, lev: Int): Long = {
    var acc = block
    var l = lev
    while (l >= 1) {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$l:$acc".getBytes("UTF-8"))
      val bit = ((d(0) >> 4) & 0xf) % 2
      acc = acc * 2 + bit
      l -= 1
    }
    acc
  }

  test("kllQuantiles: adversarial sorted stream — one survivor per block " +
      "at the md5-descent rank, every pick inside the 2^L - 1 guarantee") {
    import spark.implicits._
    // n = 32 distinct ascending values (the sorted stream that defeats
    // naive reservoir estimates), k = 4 -> L = 3, blocks of 8
    val df = (0L until 32L).toDF("x")
    val qs = Seq((25, 100), (50, 100), (75, 100), (99, 100))
    val got = graft.scale.Sketches.kllQuantiles(df, "x", 4, qs)
      .orderBy("q_num").collect()
    assert(got.forall(_.getLong(3) == 3L)) // levels
    got.foreach { r =>
      val (t, sr, v, err, bound) = (r.getLong(4), r.getLong(5),
        r.getLong(6), r.getLong(7), r.getLong(8))
      assert(sr == v) // value IS its rank on 0..31
      assert(sr == kllDescent(t / 8, 3)) // the designed survivor rank
      assert(err == math.abs(sr - t) && err <= bound && bound == 7L)
    }
  }

  test("kllQuantiles: n <= k degenerates to exact type-1 quantiles " +
      "(L = 0, zero rank error)") {
    import spark.implicits._
    val df = Seq(10L, 20L, 30L, 40L, 50L).toDF("x")
    val got = graft.scale.Sketches
      .kllQuantiles(df, "x", 8, Seq((20, 100), (50, 100), (90, 100)))
      .orderBy("q_num").collect()
    assert(got.map(r => (r.getLong(4), r.getLong(6), r.getLong(7)))
      .toSeq === Seq((0L, 10L, 0L), (2L, 30L, 0L), (4L, 50L, 0L)))
  }

  test("kllQuantiles: guarantee holds across n (partial-block caps " +
      "included) and duplicate-heavy dictionaries") {
    import spark.implicits._
    for (n <- Seq(17L, 33L, 41L, 63L, 100L)) {
      val df = (0L until n).toDF("x")
      graft.scale.Sketches
        .kllQuantiles(df, "x", 4, Seq((1, 100), (50, 100), (99, 100)))
        .collect().foreach { r =>
          assert(r.getLong(7) <= r.getLong(8),
            s"n=$n err ${r.getLong(7)} > bound ${r.getLong(8)}") }
    }
    // 3-row dictionary, 128 items: the sketch sees only (value, count)
    val dup = Seq.fill(100)(5L) ++ Seq.fill(27)(9L) ++ Seq(2L)
    val got = graft.scale.Sketches
      .kllQuantiles(dup.toDF("x"), "x", 4, Seq((50, 100), (99, 100)))
      .orderBy("q_num").collect()
    assert(got.map(_.getLong(6)).toSeq === Seq(5L, 9L))
    assert(got.forall(r => r.getLong(7) <= r.getLong(8)))
  }

  test("kllQuantilesBy: each group's sketch equals the global sketch of " +
      "that group's slice (reduction to the proven ungrouped form)") {
    import spark.implicits._
    val qs = Seq((10, 100), (50, 100), (90, 100))
    val rows = (0 until 200).map(i =>
      (if (i % 2 == 0) "a" else "b", (i * 13 % 97).toLong))
    val df = rows.toDF("g", "x")
    val by = graft.scale.Sketches
      .kllQuantilesBy(df, "x", Seq("g"), 8, qs)
    for (grp <- Seq("a", "b")) {
      val slice = graft.scale.Sketches
        .kllQuantiles(df.filter($"g" === grp), "x", 8, qs)
        .orderBy("q_num").collect().toSeq
      val grouped = by.filter($"g" === grp).drop("g")
        .orderBy("q_num").collect().toSeq
      assert(grouped === slice, s"group $grp diverged")
    }
  }

  test("kllQuantiles: partition-invariant, and dictionary partials merge " +
      "by union-sum to the whole-corpus sketch") {
    import spark.implicits._
    val vals = (0 until 300).map(i => (i * 7 % 61).toLong)
    val df = vals.toDF("x")
    val base = graft.scale.Sketches
      .kllQuantiles(df, "x", 16, Seq((10, 100), (50, 100), (90, 100)))
      .orderBy("q_num").collect().toSeq
    val re = graft.scale.Sketches
      .kllQuantiles(df.repartition(7), "x", 16,
        Seq((10, 100), (50, 100), (90, 100)))
      .orderBy("q_num").collect().toSeq
    assert(base === re)
    // merge = union-sum of two disjoint-half dictionaries, then recompact
    val (h1, h2) = (vals.take(150), vals.drop(150))
    val merged = h1.toDF("v").groupBy("v").count()
      .unionByName(h2.toDF("v").groupBy("v").count())
      .groupBy("v").agg(sum("count").as("c"))
    val fromMerge = graft.scale.Sketches
      .kllFromCounts(merged, 16, Seq((10, 100), (50, 100), (90, 100)))
      .orderBy("q_num").collect().toSeq
    assert(base === fromMerge)
  }

  test("streaming HLL state merges across micro-batches to the batch answer") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.OutputMode
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(String, Long)]
    val sk = Sketches.hllDistinct(
      in.toDF().toDF("g", "v")
        .withColumn("__h",
          HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15)),
      Seq("g"), col("__h"))
    val name = "hll_merge_" +
      java.util.UUID.randomUUID.toString.replace("-", "")
    val q = sk.writeStream.format("memory").queryName(name)
      .outputMode(OutputMode.Complete()).start()
    in.addData((1 to 30).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    in.addData((20 to 50).map(i => ("a", i.toLong)): _*)
    q.processAllAvailable()
    q.stop()
    val got = spark.table(name).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val batch = Sketches.hllDistinct(
      (1 to 50).map(i => ("a", i.toLong)).toDF("g", "v")
        .withColumn("__h",
          HashExprs.md5PrefixLong($"v".cast("string").cast("binary"), 15)),
      Seq("g"), col("__h")).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == batch, "streamed register state must equal the batch build")
  }
}
