package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph scoring over distributed edge lists.
  *
  * The corpus-curation stack already walks the near-dup graph once
  * (connected components, [[Dedup.duplicateClusters]]); PageRank is the
  * other graph primitive a data-quality pipeline wants — node centrality
  * for source/document weighting (e.g. rank hosts in a web-crawl link
  * graph before sampling). Reference scope: the reference engine has no
  * graph operator, so this is a scale-path extension in the same family
  * as MinHash/LSH (SURVEY §2 "scale" rows).
  *
  * Determinism: classic PageRank accumulates doubles, whose sum order
  * depends on partitioning — unverifiable across engines. Here scores are
  * EXACT long micro-units (1e-6): per-edge contribution = score div
  * out-degree (floor), damping step = 150000 + (85·Σcontrib) div 100.
  * Associative long sums + per-row integer ops ⇒ bit-identical on any
  * partitioning and replayable in any 64-bit engine — the repo's money
  * rule (SURVEY §5.3) applied to graph scores.
  *
  * Scale shape: one iteration = one equi-join of the edge list with the
  * score table on src + one hash aggregation on dst + one left-outer join
  * back to the node table (zero-in-degree nodes fall back to the teleport
  * term). k iterations = k keyed shuffles of (long, long) pairs; no
  * adjacency matrix, no driver-side state, no collect. For very large
  * graphs pre-bucket edges by src so the per-iteration join is
  * exchange-free on the edge side.
  */
object Graph {

  /** PageRank in exact micro-units over a directed edge list.
    *
    * @param edges      (src, dst) long columns; callers wanting an
    *                   undirected graph pass both directions.
    * @param iterations fixed unrolled iteration count (each is one
    *                   join+agg round; lineage stays linear, no checkpoint
    *                   needed for small k)
    * @return (node, score) — score in 1e-6 units, initial mass 1_000_000
    *         per node, damping 0.85 as the integer step above.
    */
  def pageRankMicro(edges: DataFrame, iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    // Materialize the static relations ONCE (same rationale + mechanism as
    // [[Dedup.duplicateClusters]]): every iteration re-joins the edge list,
    // and without the eager localCheckpoint the whole upstream derivation
    // (e.g. a fact-fact join producing the edges) re-executes per round —
    // and the per-iteration score lineage would nest it k times over
    // (measured 10 s → ~2 s at sf0.1 for 3 iterations).
    // the caller's edge derivation (often a fact-fact join) would otherwise
    // re-execute THREE times below — once for nodes, twice inside degEdges
    val e = edges.localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    // out-degree folded onto each edge ONCE — iterations then reuse the
    // same (src, dst, outdeg) relation instead of re-joining the degree
    // table every round
    val degEdges = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src"))
      .localCheckpoint(true)
    scoreLoop(nodes, degEdges, iterations)
  }

  /** The k damping/propagation rounds shared by both edge layouts. */
  private def scoreLoop(
      nodes: DataFrame, degEdges: DataFrame, iterations: Int): DataFrame = {
    var scores = nodes.withColumn("score", lit(1000000L))
    for (it <- 1 to iterations) {
      val inSum = degEdges
        .join(scores, col("src") === col("node"))
        .select(col("dst"), expr("score div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_sum"))
      scores = nodes
        .join(inSum, col("node") === col("dst"), "left_outer")
        .selectExpr("node",
          "CAST(150000 + (85 * coalesce(in_sum, CAST(0 AS BIGINT))) div 100 AS BIGINT) AS score")
      // Each round is referenced exactly ONCE by the next (no driver-side
      // action mid-loop), so the chain evaluates in a single job — an
      // EAGER per-round checkpoint was a full extra materialization of the
      // corpus-node-scale score table per round. Checkpoint only on the
      // k-center cadence to truncate plan depth (Similarity.scala rule).
      if (it % 16 == 0) scores = scores.localCheckpoint(true)
    }
    scores
  }

  /** Personalized PageRank (random walk with restart): the teleport mass
    * lands ONLY on the `sources` set, so scores measure proximity TO the
    * sources — the "expand a trusted seed set" primitive behind TrustRank-
    * style source weighting and seed-based corpus expansion.
    *
    * Same exact-integer scheme as [[pageRankMicro]] with a per-node
    * teleport base: sources start at 1e6 and restart at 150000 each round;
    * non-sources start (and restart) at 0 and receive only propagated
    * mass — so a node's score is nonzero iff it is within `iterations`
    * hops of a source, and the output keeps exactly those rows.
    *
    * Scale shape: the source flag is one broadcast of the (small) seed
    * set folded into the node table once; per-round cost is identical to
    * [[pageRankMicro]] (one keyed join + hash-agg over the edge relation,
    * checkpointed (long, long, long) score table).
    */
  def personalizedPageRankMicro(
      edges: DataFrame,
      sources: DataFrame,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = edges.localCheckpoint(true)
    val src = sources.select(col("node")).distinct()
      .withColumn("__base", lit(150000L))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .join(broadcast(src), Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("__base"), lit(0L)).as("base"))
      .localCheckpoint(true)
    val degEdges = e
      .join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")),
        Seq("src"))
      .localCheckpoint(true)
    var scores = nodes.select(col("node"),
      when(col("base") > 0L, lit(1000000L)).otherwise(lit(0L)).as("score"))
    for (it <- 1 to iterations) {
      val inSum = degEdges
        .join(scores.filter(col("score") > 0L), col("src") === col("node"))
        .select(col("dst"), expr("score div outdeg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("in_sum"))
      scores = nodes
        .join(inSum, col("node") === col("dst"), "left_outer")
        .selectExpr("node",
          "CAST(base + (85 * coalesce(in_sum, CAST(0 AS BIGINT))) div 100" +
            " AS BIGINT) AS score")
      // single-reference chain, no mid-loop action: k-center checkpoint
      // cadence only (see scoreLoop)
      if (it % 16 == 0) scores = scores.localCheckpoint(true)
    }
    scores.filter(col("score") > 0L)
      .select(col("node"), col("score").as("score_micro"))
  }

  /** Write an edge list as a src-bucketed table — the "pre-bucket edges by
    * src" layout for [[pageRankMicroBucketed]]: each bucket holds one src
    * hash range, sorted, so downstream per-src aggregations and joins read
    * co-located data with NO exchange on the edge side.
    */
  def writeBucketedEdges(
      edges: DataFrame, table: String, buckets: Int = 8): Unit =
    edges.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, "src").sortBy("src").saveAsTable(table)

  /** [[pageRankMicro]] over a src-bucketed edge TABLE (see
    * [[writeBucketedEdges]]) — the very-large-graph layout the scale note
    * on [[pageRankMicro]] promises. Differences from the checkpoint path:
    *
    *  - the table IS durable materialized storage, so the edge relation is
    *    NOT localCheckpoint()ed — checkpointing would erase the bucketed
    *    outputPartitioning and force an exchange of the (big) edge side in
    *    every iteration's score join;
    *  - the out-degree aggregation and the degree⋈edge join both run
    *    EXCHANGE-FREE over the buckets (plan-asserted in GraphSpec), and
    *    each iteration's score join shuffles only the (long, long) score
    *    table to the buckets' partitioning — at web-graph scale that is
    *    the difference between shuffling |E| once per iteration and
    *    shuffling |V|.
    */
  def pageRankMicroBucketed(
      spark: org.apache.spark.sql.SparkSession,
      table: String,
      iterations: Int = 3): DataFrame = {
    require(iterations >= 1, "need at least one iteration")
    val e = spark.table(table)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct()
      .localCheckpoint(true)
    val degEdges = bucketedDegEdges(spark, table)
    scoreLoop(nodes, degEdges, iterations)
  }

  /** The exchange-free (src, dst, outdeg) relation over a bucketed edge
    * table — exposed for the plan assertion.
    */
  def bucketedDegEdges(
      spark: org.apache.spark.sql.SparkSession, table: String): DataFrame = {
    val e = spark.table(table)
    e.join(e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src"))
  }

  /** Triangle counting over an undirected edge list, degree-ordered.
    *
    * The canonical distributed algorithm (node-iterator++ / Schank-Wagner;
    * the MapReduce form is Suri-Vassilvitskii "Counting Triangles and the
    * Curse of the Last Reducer", WWW'11): orient every undirected edge from
    * its lower-rank endpoint to its higher-rank endpoint, where rank =
    * (degree, id) lexicographically; then a triangle {u,v,w} is counted
    * exactly once as the wedge (u→v, u→w) whose closing edge v→w exists in
    * the oriented set. Orientation bounds each node's out-degree by
    * O(sqrt(|E|)) on skewed graphs — the hub that would otherwise produce
    * deg² wedge candidates (the "last reducer") fans out only to its few
    * higher-degree peers, so the wedge self-join is sum(out-deg²) ≪
    * sum(deg²). That is exactly the skew story that matters at 100 TB:
    * without orientation a web-scale hub node kills the job; with it the
    * same shuffle keys are near-uniform.
    *
    * Plan: 3 hash-agg/join shuffles (distinct edges, degrees, wedge join on
    * the shared lower endpoint) + one semi-join of wedges against edges on
    * the (v, w) pair. All keys are (long, long); no adjacency lists are
    * materialized, so no single row can exceed memory.
    *
    * @param edges (src, dst) long columns, interpreted undirected; loops and
    *              duplicate/reverse pairs are canonicalized away.
    * @return one row: n_nodes, n_edges, n_wedges (open+closed, Σ C(deg,2)),
    *         n_triangles, clustering = round(3·tri / wedges, 6).
    */
  def triangleStats(edges: DataFrame): DataFrame = {
    val und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      // 4 consumers below (degrees twice via union, orientation join, the
      // closing-edge join) — materialize the canonical edge set once
      .localCheckpoint(true)
    val deg = und.select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // rank = (deg, id); orient a→b when rank(a) < rank(b)
    val oriented = und
      .join(deg.select(col("node").as("a"), col("deg").as("da")), Seq("a"))
      .join(deg.select(col("node").as("b"), col("deg").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("a"))
          .otherwise(col("b")).as("lo"),
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")), col("b"))
          .otherwise(col("a")).as("hi"),
        greatest(col("da"), col("db")).as("dhi"),
        least(col("da"), col("db")).as("dlo"),
        col("a"), col("b"))
      .localCheckpoint(true)
    // wedges anchored at the LOW-rank node: pairs of out-neighbors, ordered
    // by the same (deg, id) rank so the candidate matches the closing
    // edge's own orientation
    val e1 = oriented.select(col("lo"), col("hi").as("v"),
      col("dhi").as("dv"))
    val e2 = oriented.select(col("lo"), col("hi").as("w"),
      col("dhi").as("dw"))
    val wedges = e1.join(e2, Seq("lo"))
      .filter(col("dv") < col("dw") ||
        (col("dv") === col("dw") && col("v") < col("w")))
      .select(col("v"), col("w"))
    val closing = oriented.select(col("lo").as("v"), col("hi").as("w"))
    val tri = wedges.join(closing, Seq("v", "w"), "left_semi")
      .agg(count(lit(1)).as("n_triangles"))
    val wedgeTotal = deg
      .agg(sum(expr("deg * (deg - 1) DIV 2")).as("n_wedges"))
    und.agg(count(lit(1)).as("n_edges"))
      .crossJoin(deg.agg(count(lit(1)).as("n_nodes")))
      .crossJoin(wedgeTotal)
      .crossJoin(tri)
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        round(col("n_triangles").cast("double") * 3.0 /
          col("n_wedges"), 6).as("clustering"))
  }

  /** k-core decomposition by iterative peeling (Seidman 1983; the
    * MapReduce form follows Montresor et al.): repeatedly drop nodes whose
    * degree in the SURVIVING subgraph is < k until a fixpoint — what
    * remains is the maximal subgraph where every node keeps ≥ k
    * neighbors. The dense-nucleus diagnostic for curation graphs: on a
    * near-dup graph the k-core is the template/boilerplate cluster mass
    * no pairwise threshold isolates.
    *
    * Execution shape: per round, one degree hash-agg + two semi-joins,
    * all keyed on the node — the edge set only SHRINKS, so per-round
    * shuffle mass is non-increasing (the CC-loop property). Rounds
    * truncate lineage with an eager checkpoint; the fixpoint test is one
    * driver scalar (surviving-edge count) per round. Peeling is
    * order-free — removing all sub-k nodes simultaneously each round is
    * confluent, so the fixpoint is partitioning-independent, and an SQL
    * replay of N ≥ convergence rounds equals it (extra rounds are
    * identity).
    *
    * Output: surviving (node, core_deg), core_deg ≥ k.
    */
  def kCore(edges: DataFrame, k: Int, maxRounds: Int = 20): DataFrame = {
    require(k >= 1 && maxRounds >= 1, s"bad kCore args k=$k rounds=$maxRounds")
    def degrees(und: DataFrame): DataFrame = und
      .select(col("a").as("node"))
      .union(und.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    var und = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    var nEdges = und.count()
    var round = 0
    var converged = false
    while (!converged && round < maxRounds) {
      val keep = degrees(und).filter(col("deg") >= k).select(col("node"))
      val pruned = und
        .join(keep.select(col("node").as("a")), Seq("a"), "left_semi")
        .join(keep.select(col("node").as("b")), Seq("b"), "left_semi")
        .localCheckpoint(true)
      val n = pruned.count()
      converged = n == nEdges
      nEdges = n
      und = pruned
      round += 1
    }
    // Exiting via the cap means peeling has NOT reached its fixpoint: the
    // surviving edge set is a strict SUPERGRAPH of the true k-core, so the
    // returned degrees would silently over-report core membership. A long
    // path graph needs O(n) peeling rounds, so the cap is reachable on real
    // shapes — fail loudly (same contract as connectedComponentsStar) and
    // let the caller raise maxRounds.
    if (!converged)
      throw new IllegalStateException(
        s"kCore: peeling did not reach a fixpoint after $maxRounds rounds — " +
          "refusing to return a supergraph of the true k-core; raise maxRounds")
    degrees(und).select(col("node"), col("deg").as("core_deg"))
  }

  /** Common-neighbor link prediction: score NON-adjacent node pairs by the
    * overlap of their neighborhoods — cn = |Γ(x) ∩ Γ(y)| and the Jaccard
    * score cn / (|Γ(x)| + |Γ(y)| − cn) — and return the top-k candidate
    * links. The entity-resolution / recommendation primitive over the
    * same co-occurrence graphs the other Graph ops walk.
    *
    * Wedge generation is the classic 2-path self-join on the middle node,
    * whose mass is Σ deg(m)² — quadratic in hub degree. Middle nodes with
    * deg > `maxDeg` are EXCLUDED from wedge generation (the df-cut rule
    * the dedup posting indexes use): an ultra-hub is adjacent to
    * everything, so "shares this neighbor" carries no similarity signal,
    * while costing the entire deg² blowup. The cap is part of the
    * operator's declared semantics (cn counts only sub-cap middles; the
    * oracle replicates it exactly) — degrees in the DENOMINATOR stay
    * full. Pair mass after the cap is true-candidate mass, never corpus².
    *
    * Determinism: counts are exact longs; the score is one rounded
    * division; ranking ties break on (x, y).
    */
  def linkPrediction(
      edges: DataFrame,
      maxDeg: Int,
      topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = edges
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .filter(col("a") =!= col("b"))
      .distinct()
      .localCheckpoint(true)
    val sym = e.unionByName(e.select(col("b").as("a"), col("a").as("b")))
    val deg = sym.groupBy(col("a")).agg(count(lit(1)).as("deg"))
    val mid = sym
      .join(deg.filter(col("deg") <= maxDeg).select(col("a")), Seq("a"))
      .select(col("a").as("m"), col("b").as("x"))
    val cn = mid.join(mid.select(col("m"), col("x").as("y")), Seq("m"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("cn"))
    val top = cn.join(e.select(col("a").as("x"), col("b").as("y")),
        Seq("x", "y"), "left_anti")
      .join(deg.select(col("a").as("x"), col("deg").as("deg_x")), Seq("x"))
      .join(deg.select(col("a").as("y"), col("deg").as("deg_y")), Seq("y"))
      .withColumn("jaccard", round(col("cn").cast("double") /
        (col("deg_x") + col("deg_y") - col("cn")).cast("double"), 6))
      .orderBy(col("jaccard").desc, col("x"), col("y"))
      .limit(topK)
    graft.core.Bounded.withRank(top,
        Seq("jaccard" -> true, "x" -> false, "y" -> false), "rk")
      .withColumn("rk", col("rk").cast("long"))
      .select(col("rk"), col("x"), col("y"), col("cn"),
        col("deg_x"), col("deg_y"), col("jaccard"))
  }

  /** Multi-source BFS: minimum hop count from a seed set, frontier
    * expansion bounded by `maxHops` rounds. The reachability primitive the
    * family was missing — "how far is every node from the trusted seeds"
    * (crawl-frontier depth, trust propagation radius, blast-radius
    * analysis on a lineage graph). Reference scope: like the rest of the
    * Graph family, a north-star extension (the reference engine has no
    * graph operator).
    *
    * Scale shape: each round is one equi-join of the CURRENT FRONTIER
    * (not the full visited set) with the edge list + one distinct + one
    * anti-join against visited — the standard frontier BFS, so total work
    * is O(edges touched), not rounds×edges. Frontier and visited frames
    * are localCheckpoint'd per round (iterative-lineage rule). Rounds are
    * data-bounded: expansion stops early when a frontier empties, and the
    * early exit cannot change the answer (every later round is identity),
    * so a fixed-depth `maxHops` oracle replay agrees by construction —
    * unlike the capped-fixpoint ops (kCore/CC) there is no silent-cap
    * hazard here: stopping at `maxHops` IS the declared semantics.
    *
    * @return (node, hops) for every node within `maxHops` of a seed;
    *         seeds themselves at hops 0. Unreachable nodes are absent.
    */
  def bfsHops(
      edges: DataFrame,
      sources: DataFrame,
      maxHops: Int): DataFrame = {
    require(maxHops >= 1, s"bad maxHops $maxHops")
    val e = edges.localCheckpoint(true)
    var visited = sources.select(col("node")).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint(true)
    var frontier = visited.select(col("node"))
    var h = 1
    var done = false
    while (!done && h <= maxHops) {
      val next = frontier.join(e, col("node") === col("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select(col("node")), Seq("node"), "left_anti")
        .withColumn("hops", lit(h.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) done = true
      else {
        visited = visited.unionByName(next).localCheckpoint(true)
        frontier = next.select(col("node"))
        h += 1
      }
    }
    visited
  }

  /** Newman modularity of a node partition, per community: how much more
    * intra-community edge mass the partition captures than a random graph
    * with the same degrees would — THE quality score for the cluster
    * assignments the rest of the stack produces (dup clusters, mutual-kNN
    * clusters, domain groupings). Q = Σ_c [ in_c/E − (deg_c/E)² ] with E
    * the DIRECTED edge count (2m for an undirected graph passed as both
    * directions, the family's edge convention); this returns the
    * per-community contribution so callers see which communities are
    * assortative, and Q itself is the sum of `q_contrib`.
    *
    * Scale shape: two broadcast-joins of the (small) community map onto
    * the edge list, two hash-aggregates keyed on community, one 1-row
    * broadcast total — no window, no pair mass, corpus-linear. Counts are
    * exact longs; `q_contrib` is one fixed-shape double expression over
    * two longs rounded to 6 (deterministic on any partitioning, SQL-
    * replayable).
    *
    * @param edges       (src, dst); undirected graphs pass both directions
    * @param communities (node, community) — every edge endpoint must map
    */
  def modularity(
      edges: DataFrame,
      communities: DataFrame): DataFrame = {
    val comm = communities.select(col("node"), col("community")).distinct()
    val e = edges
      .join(comm.select(col("node").as("src"), col("community").as("__cs")),
        Seq("src"))
      .join(comm.select(col("node").as("dst"), col("community").as("__cd")),
        Seq("dst"))
      .localCheckpoint(true)
    val tot = e.agg(count(lit(1)).as("__e"))
    val inC = e.filter(col("__cs") === col("__cd"))
      .groupBy(col("__cs").as("community"))
      .agg(count(lit(1)).as("in_edges"))
    val degC = e.groupBy(col("__cs").as("community"))
      .agg(count(lit(1)).as("deg_sum"))
    val nodesC = comm.groupBy(col("community"))
      .agg(count(lit(1)).as("n_nodes"))
    nodesC
      .join(degC, Seq("community"), "left")
      .join(inC, Seq("community"), "left")
      .crossJoin(broadcast(tot))
      .select(col("community"),
        col("n_nodes"),
        coalesce(col("in_edges"), lit(0L)).as("in_edges"),
        coalesce(col("deg_sum"), lit(0L)).as("deg_sum"),
        round(
          coalesce(col("in_edges"), lit(0L)).cast("double") / col("__e") -
            (coalesce(col("deg_sum"), lit(0L)).cast("double") / col("__e")) *
              (coalesce(col("deg_sum"), lit(0L)).cast("double") / col("__e")),
          6).as("q_contrib"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007) — the community
    * PRODUCER beside [[modularity]]'s scorer: labels start as node ids;
    * each round every node adopts the most frequent label among its
    * in-neighbors, ties broken on the SMALLEST label — fully
    * deterministic, so `rounds` unrolled SQL replays it exactly (the
    * [[pageRankMicro]] oracle convention). Fixed `rounds` IS the declared
    * semantics: synchronous LPA can oscillate on bipartite structure, so
    * there is no silent-convergence cap to hide (the kCore lesson).
    *
    * Scale shape: per round ONE label join keyed on src + one (dst,
    * label) hash-agg + one arg-max hash-agg (max of a (count, −label)
    * struct — no window) + a left join back for message-less nodes.
    * Labels are localCheckpoint'd per round (iterative-lineage rule).
    * Undirected graphs pass both edge directions, the family convention.
    *
    * @return (node, label) — label = the propagated community id.
    */
  def labelPropagation(edges: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"bad round count $rounds")
    val e = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    var labels = nodes.withColumn("label", col("node"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val pick = e
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(count(lit(1)).as("__c"))
        .groupBy(col("node"))
        .agg(max(struct(col("__c"), (-col("label")).as("__nl"))).as("__m"))
        .select(col("node"), (-col("__m.__nl")).as("__new"))
      labels = labels
        .join(pick, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("__new"), col("label")).as("label"))
        // Per-round eager checkpoint is LOAD-BEARING here, unlike
        // pageRank's scoreLoop: each round references `labels` TWICE
        // (the neighbor pick and the carry-forward join), so without it
        // the duplicated subtree re-executes per reference — measured
        // 4.4 s → 5.8 s at sf0.1 on the k-center cadence (round 9).
        .localCheckpoint(true)
      r += 1
    }
    labels
  }

  /** HITS hubs-and-authorities (Kleinberg, JACM 1999) over a DIRECTED
    * edge list, a fixed number of unrolled mutual-reinforcement rounds:
    * authority(i) ← Σ_{u→i} hub(u), then hub(u) ← Σ_{u→i} authority(i).
    * The link-analysis complement to [[pageRankMicro]]: PageRank measures
    * one centrality; HITS separates "points at good things" (hub) from
    * "is pointed at by good pointers" (authority) — on a bipartite trade
    * graph the round-2 authority is exactly co-purchasing mass.
    *
    * Exactness: with hub⁰ = 1 everywhere and NO mid-round normalization,
    * every intermediate score is a path count — exact DECIMAL(38,0)
    * integers through all rounds. For a fixed round count this is scale-
    * equivalent to the textbook per-round L1 normalization (each round's
    * normalization is a global constant), so normalizing ONCE at the end
    * yields the same shares; the closing two divisions are the only float
    * ops, rounded 6. Declared semantics: fixed `rounds` of the exact
    * update, not convergence iteration (the [[labelPropagation]]
    * fixed-rounds convention — no silent cap pretending to be a fixpoint).
    *
    * Scale shape: per round, two keyed equi-joins (edges ⋈ scores) + two
    * hash-aggs — every exchange keyed on node ids, nothing broadcasts
    * with the corpus; edges and nodes pinned once (the [[pageRankMicro]]
    * rationale). Score tables stay SPARSE through the rounds (a node
    * absent from a partial table holds 0, and zeros contribute nothing to
    * either sum — hub⁰ = 1 only matters for nodes WITH out-edges); the
    * full node scaffold left-joins once, on the output. Each round's
    * table is referenced exactly once by the next — no per-round
    * checkpoint (the scoreLoop rule).
    *
    * @return (node, authority, hub) — both L1-normalized shares, round 6
    */
  def hits(edges: DataFrame, rounds: Int = 2): DataFrame = {
    require(rounds >= 1, s"bad round count $rounds")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(true)
    val nodes = e.select(col("src").as("node"))
      .unionByName(e.select(col("dst").as("node"))).distinct()
    val d0 = lit(0L).cast("decimal(38,0)")
    // round 1's authority update collapses algebraically: with hub⁰ = 1
    // everywhere, Σ_{u→i} hub⁰(u) is just the indegree — one hash-agg,
    // no init table, no join
    var auth = e.groupBy(col("dst").as("node"))
      .agg(count(lit(1)).cast("decimal(38,0)").as("a"))
    var hub = e
      .join(auth.select(col("node").as("dst"), col("a")), Seq("dst"))
      .groupBy(col("src").as("node"))
      .agg(sum(col("a")).as("h"))
    var r = 1
    while (r < rounds) {
      auth = e
        .join(hub.select(col("node").as("src"), col("h")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum(col("h")).as("a"))
      hub = e
        .join(auth.select(col("node").as("dst"), col("a")), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum(col("a")).as("h"))
      r += 1
    }
    // final scores feed the totals AND the output join — pin once (node-
    // dictionary scale) instead of re-executing the round chain per branch
    auth = auth.localCheckpoint(true)
    hub = hub.localCheckpoint(true)
    val tot = auth.agg(sum(col("a")).as("__ta"))
      .crossJoin(hub.agg(sum(col("h")).as("__th")))
    nodes
      .join(auth, Seq("node"), "left")
      .join(hub, Seq("node"), "left")
      .crossJoin(broadcast(tot))
      .select(col("node"),
        round(coalesce(col("a"), d0).cast("double") /
          col("__ta").cast("double"), 6).as("authority"),
        round(coalesce(col("h"), d0).cast("double") /
          col("__th").cast("double"), 6).as("hub"))
  }
}
