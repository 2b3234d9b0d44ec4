package graft

import org.apache.spark.sql.functions._

import graft.scale.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  /** 4-node path graph a—b—c—d (symmetrized): interior nodes must outrank
    * endpoints, and the exact scores are hand-checkable integers.
    */
  private def pathEdges = Seq(
    (1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 4L), (4L, 3L))
    .toDF("src", "dst")

  test("pageRankMicro: hand-computed exact scores on a path graph") {
    // deg: 1→1, 2→2, 3→2, 4→1. s0 = 1_000_000 each.
    // i1 contribs: into 1: s(2)/2 = 500000; into 2: s(1)/1 + s(3)/2
    //   = 1500000; into 3: s(2)/2 + s(4)/1 = 1500000; into 4: 500000.
    // i1 scores: ends 150000+425000=575000; mids 150000+1275000=1425000.
    val got = Graph.pageRankMicro(pathEdges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(
      1L -> 575000L, 2L -> 1425000L, 3L -> 1425000L, 4L -> 575000L))
  }

  test("pageRankMicro: partition-invariant (1 vs 7 partitions)") {
    val e = pathEdges.union(Seq((4L, 1L), (1L, 4L)).toDF("src", "dst"))
    val a = Graph.pageRankMicro(e.repartition(1), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRankMicro(e.repartition(7), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("pageRankMicro: total mass stays bounded and mids dominate") {
    val scores = Graph.pageRankMicro(pathEdges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores(2L) > scores(1L) && scores(3L) > scores(4L))
    // floor divisions only ever LOSE mass vs the rational fixpoint:
    // total ≤ 4 · 1e6 at every iteration
    assert(scores.values.sum <= 4000000L)
    assert(scores.values.forall(_ >= 150000L))
  }

  test("pageRankMicro: zero-in-degree node falls back to teleport mass") {
    // b→a only: a never links out to b, so b's score is exactly 150000
    val e = Seq((2L, 1L)).toDF("src", "dst")
    val got = Graph.pageRankMicro(e, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(2L) === 150000L)
    assert(got(1L) === 150000L + 85L * 150000L / 100L)
  }

  test("pageRankMicroBucketed: bucketed degree/edge stage is exchange-free " +
      "and scores match the checkpoint path exactly") {
    val e = pathEdges.union(Seq((4L, 1L), (1L, 4L)).toDF("src", "dst"))
    val table = "graft_pr_edges_bucketed"
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // disable auto-broadcast: on this tiny fixture Spark would broadcast
      // the degree table (fine here, wrong at |V| scale) — force the
      // at-scale plan so the assertion checks the layout that matters
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Graph.writeBucketedEdges(e, table, 4)
      // the out-degree agg and the degree⋈edge join both consume the
      // bucketed layout directly — no shuffle anywhere in the subplan
      val plan = Graph.bucketedDegEdges(spark, table)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed degree/edge relation must not shuffle:\n$plan")
      assert(plan.contains("Bucketed: true"),
        s"scan did not use the bucketed layout:\n$plan")
      val bucketed = Graph.pageRankMicroBucketed(spark, table, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val plain = Graph.pageRankMicro(e, 3)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(bucketed.sameElements(plain),
        "bucketed and checkpointed paths must agree bit-exactly")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
      spark.sql(s"DROP TABLE IF EXISTS $table")
    }
  }

  test("connectedComponentsStar matches duplicateClusters on adversarial " +
      "shapes: long chain, cliques, singletons, random graph") {
    import graft.scale.Dedup
    def check(nodeIds: Seq[Long], pairSeq: Seq[(Long, Long)]): Unit = {
      val nodes = nodeIds.toDF("doc_id")
      val pairs = pairSeq.toDF("id_a", "id_b")
      val star = Dedup.connectedComponentsStar(nodes, pairs, "doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val prop = Dedup.duplicateClusters(nodes, pairs, "doc_id", 50)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      assert(star.sameElements(prop),
        s"star ${star.toSeq} != propagation ${prop.toSeq}")
    }
    // 60-node chain: diameter 59 — label propagation's worst case, star
    // contraction's motivating shape (converges in O(log^2) rounds)
    check(1L to 60L, (1L until 60L).map(i => (i, i + 1)))
    // two cliques + untouched singletons
    val cliqueA = for (a <- 1L to 5L; b <- (a + 1) to 5L) yield (a, b)
    val cliqueB = for (a <- 10L to 13L; b <- (a + 1) to 13L) yield (a, b)
    check(1L to 20L, cliqueA ++ cliqueB)
    // seeded random graph (forest + cross links, reversed pairs, dups)
    val rnd = new scala.util.Random(42)
    val randomPairs = (1 to 80).map { _ =>
      val a = rnd.nextInt(40) + 1L; val b = rnd.nextInt(40) + 1L
      (a, b)
    }.filter { case (a, b) => a != b }
    check(1L to 45L, randomPairs)
  }

  test("triangleStats: hand-checked counts; canonicalizes dirty input") {
    // triangle {1,2,3} + pendant 3—4, fed as a dirty multiset: duplicates,
    // reversed pairs, and a self-loop must all canonicalize away.
    // deg: 1→2, 2→2, 3→3, 4→1; wedges = 1+1+3+0 = 5; clustering = 3/5.
    val e = Seq(
      (1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (3L, 4L), (4L, 3L), (3L, 4L), (2L, 2L))
      .toDF("src", "dst")
    val r = Graph.triangleStats(e).collect()(0)
    assert(r.getAs[Long]("n_nodes") === 4L)
    assert(r.getAs[Long]("n_edges") === 4L)
    assert(r.getAs[Long]("n_wedges") === 5L)
    assert(r.getAs[Long]("n_triangles") === 1L)
    assert(r.getAs[Double]("clustering") === 0.6)
  }

  test("triangleStats: counts each triangle once on K4, any partitioning") {
    // K4 has exactly 4 triangles and 12 wedges; every edge is in 2
    // triangles, so orientation/dedup bugs show up as over- or
    // under-counts. Also a degree-tie stress: all degrees equal → rank
    // falls back to id order everywhere.
    val nodes = (1L to 4L)
    val k4 = for (a <- nodes; b <- nodes if a != b) yield (a, b)
    val e = k4.toDF("src", "dst")
    for (p <- Seq(1, 7)) {
      val r = Graph.triangleStats(e.repartition(p)).collect()(0)
      assert(r.getAs[Long]("n_triangles") === 4L, s"partitions=$p")
      assert(r.getAs[Long]("n_wedges") === 12L)
      assert(r.getAs[Double]("clustering") === 1.0)
    }
  }

  test("kCore: tail chain peels away, the clique survives with its " +
    "in-core degrees; cascade handled; partition-invariant") {
    // 4-clique on 1..4 plus a tail 4-5-6: peeling at k=3 must remove 6
    // (deg 1), THEN 5 (deg drops to 1) — the cascade — leaving the clique
    val nodes = (1L to 4L)
    val clique = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val e = (clique ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    for (p <- Seq(1, 5)) {
      val core = Graph.kCore(e.repartition(p), 3).orderBy($"node")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toSeq
      assert(core == Seq(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
        s"partitions=$p got $core")
    }
    // k above the clique degree empties the graph
    assert(Graph.kCore(e, 4).count() == 0L)
    // k=1 keeps everything (no sub-1-degree node exists)
    assert(Graph.kCore(e, 1).count() == 6L)
  }

  test("kCore: throws at the round cap instead of returning a supergraph") {
    // A path graph is the worst case for peeling: at k=2 each round only
    // removes the two current endpoints, so a path of n nodes needs ~n/2
    // rounds. 30 nodes with maxRounds=5 therefore CANNOT converge — the
    // guard must throw rather than return the partially-peeled middle.
    val path = (1L until 30L).map(i => (i, i + 1)).toDF("src", "dst")
    val ex = intercept[IllegalStateException] {
      Graph.kCore(path, 2, maxRounds = 5).count()
    }
    assert(ex.getMessage.contains("fixpoint"))
    // with enough rounds the same graph converges cleanly (to empty: a
    // path has no 2-core)
    assert(Graph.kCore(path, 2, maxRounds = 20).count() == 0L)
  }

  test("personalizedPageRankMicro: hand-computed path, reachability bound") {
    // directed path 1 -> 2 -> 3 -> 4, source {1}, out-degree 1 everywhere:
    //   init:  s1 = 1e6, rest 0
    //   i1:    s1 = 150000;           s2 = 85*1e6   //100 = 850000
    //   i2:    s1 = 150000;           s2 = 85*150000//100 = 127500;
    //          s3 = 85*850000//100 = 722500
    // nodes beyond `iterations` hops (node 4 at 2 rounds) emit nothing
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val src = Seq(Tuple1(1L)).toDF("node")
    val got = Graph.personalizedPageRankMicro(e, src, 2)
      .orderBy($"node").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toSeq
    assert(got == Seq(1L -> 150000L, 2L -> 127500L, 3L -> 722500L))
    // same graph, plain pagerank: every node gets the 150000 teleport
    // floor — the personalized variant must NOT (that is the point)
    val plain = Graph.pageRankMicro(e, 2).orderBy($"node").collect()
    assert(plain.forall(_.getLong(1) >= 150000L))
  }

  test("linkPrediction: hand-computed Jaccard scores and the hub cap") {
    // square 1-2-3-4 plus hub 9 adjacent to all four; messy input
    // (duplicates, both directions) exercises canonicalization
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L),
      (2L, 1L), (1L, 2L),
      (9L, 1L), (9L, 2L), (9L, 3L), (9L, 4L)).toDF("src", "dst")
    // no cap binding (maxDeg 10): cn(1,3) = {2,4,9} = 3, deg 3 each ->
    // jaccard 3/(3+3-3) = 1.0; (2,4) symmetric; only those two non-edges
    val free = Graph.linkPrediction(sq, 10, 10)
      .select("rk", "x", "y", "cn", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(free == Seq((1L, 1L, 3L, 3L, 1.0), (2L, 2L, 4L, 3L, 1.0)))
    // cap 3 excludes the deg-4 hub from wedge generation: cn drops to 2
    // ({2,4} / {1,3}) while DENOMINATOR degrees stay full (3) -> 0.5
    val capped = Graph.linkPrediction(sq, 3, 10)
      .select("rk", "x", "y", "cn", "jaccard")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(capped == Seq((1L, 1L, 3L, 2L, 0.5), (2L, 2L, 4L, 2L, 0.5)))
  }

  test("bfsHops: hand-computed hop counts on the path graph") {
    val seeds = Seq(1L).toDF("node")
    val got = Graph.bfsHops(pathEdges, seeds, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L))
    // maxHops caps the radius: node 4 (3 hops away) is absent at 2
    val capped = Graph.bfsHops(pathEdges, seeds, 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(capped == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("bfsHops: multi-source minimum, unreachable absent, partition-invariant") {
    // second component 7—8 is unreachable from the path seeds
    val e = pathEdges.union(Seq((7L, 8L), (8L, 7L)).toDF("src", "dst"))
    val seeds = Seq(1L, 4L).toDF("node")  // both endpoints seeded
    val expect = Map(1L -> 0L, 4L -> 0L, 2L -> 1L, 3L -> 1L)
    val a = Graph.bfsHops(e.repartition(1), seeds, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Graph.bfsHops(e.repartition(7), seeds, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == expect && b == expect)
  }

  test("modularity: hand-computed contributions on the split path graph") {
    // communities {1,2} and {3,4}; E = 6 directed edges.
    // c0: in = 2 ((1,2),(2,1)); deg_sum = 3 ((1,2),(2,1),(2,3))
    //   q = 2/6 − (3/6)² = 1/3 − 1/4 = 0.083333 — same for c1 by symmetry
    val comm = Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L))
      .toDF("node", "community")
    val got = Graph.modularity(pathEdges, comm)
      .orderBy("community")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.toSeq == Seq(
      (0L, 2L, 2L, 3L, 0.083333), (1L, 2L, 2L, 3L, 0.083333)))
  }

  test("labelPropagation: two bridged triangles collapse to two communities") {
    // triangles {1,2,3} and {4,5,6}, bridge 3—4; 3 synchronous rounds
    // hand-traced: r1 adopts min neighbor ids, r2 consolidates, r3 lands
    // {1,2,3}→1 and {4,5,6}→3 (node 4 pulled across by the converged
    // B-side majority) — deterministic, mode ties to the smallest label
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L),
      (4L, 6L), (3L, 4L))
    val edges = tri.flatMap { case (a, b) => Seq((a, b), (b, a)) }
      .toDF("src", "dst")
    val got = Graph.labelPropagation(edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 3L, 5L -> 3L, 6L -> 3L))
    // partition invariance (the mode pick must not depend on layout)
    val b = Graph.labelPropagation(edges.repartition(7), 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b == got)
    // round-1 state is the hand-computed min-neighbor map
    val r1 = Graph.labelPropagation(edges, 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 1L, 4L -> 3L,
      5L -> 4L, 6L -> 4L))
  }

  test("hits: hand-computed two-round path counts, end normalization; " +
      "sources carry hub mass, sinks authority") {
    // s1→c1, s1→c2, s2→c2 (directed bipartite, node ids 1,2 / 11,12):
    //   a1 = indegree: c1=1, c2=2; h1: s1 = 1+2 = 3, s2 = 2
    //   a2: c1 = 3, c2 = 3+2 = 5; h2: s1 = 3+5 = 8, s2 = 5
    //   Σa = 8, Σh = 13 -> authority c1 = 0.375, c2 = 0.625;
    //   hub s1 = 8/13 = 0.615385, s2 = 5/13 = 0.384615; all else 0
    val edges = Seq((1L, 11L), (1L, 12L), (2L, 12L)).toDF("src", "dst")
    val got = Graph.hits(edges, 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(got == Map(
      1L -> ((0.0, 0.615385)), 2L -> ((0.0, 0.384615)),
      11L -> ((0.375, 0.0)), 12L -> ((0.625, 0.0))))
    // partition invariance (exact integers — no float accumulation order)
    val b = Graph.hits(edges.repartition(5), 2).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(b == got)
  }

  test("modularity: single community scores 0; Q sums over contributions") {
    // everything in one community: in = E, deg = E -> Q = 1 − 1 = 0
    val one = Seq(1L, 2L, 3L, 4L).map((_, 0L)).toDF("node", "community")
    val got = Graph.modularity(pathEdges, one).collect()
    assert(got.length == 1)
    assert(got.head.getDouble(4) == 0.0)
    assert(got.head.getLong(2) == 6L && got.head.getLong(3) == 6L)
  }
}
