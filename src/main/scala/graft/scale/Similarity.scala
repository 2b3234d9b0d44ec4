package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity search over embedding columns (ARRAY<FLOAT>).
  *
  * Two paths:
  *  - brute-force cosine top-k (the exact baseline): queries × candidates
  *    cross product with a broadcast query side — embarrassingly parallel,
  *    no shuffle on the big side; TakeOrderedAndProject per query.
  *  - IVF (inverted-file) top-k: assign every vector to its nearest centroid,
  *    search only the query's probe cells — the 100 TB path (cuts the scan by
  *    the centroid fan-out).
  *
  * Determinism: the oracle-facing variants quantize components to integers
  * (round(x·1000)) so every dot product is exact integer math — identical in
  * Spark and DuckDB regardless of summation order. The float variants are the
  * production path.
  */
object Similarity {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  private def vec(a: Column, b: Column, op: VectorBinaryExpr.Op): Column =
    ColumnBridge.column(VectorBinaryExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b), op))

  /** Σ aᵢ·bᵢ — native codegen'd tight loop ([[VectorBinaryExpr]]); the HOF
    * formulation ([[dotHof]]) evaluates interpreted and is kept only as the
    * cross-check reference.
    */
  def dot(a: Column, b: Column): Column = vec(a, b, VectorBinaryExpr.Dot)

  /** Σ (aᵢ-bᵢ)² — native codegen'd. */
  def l2Sq(a: Column, b: Column): Column = vec(a, b, VectorBinaryExpr.L2Sq)

  /** HOF reference implementations (interpreted; ScaleSpec asserts they agree
    * bit-for-bit with the native expressions).
    */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
  def dotLongHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, v) => acc + v)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in doubles (production path). */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Quantized copy of an embedding: round(x·1000) per component, as longs.
    * 64 dims × |q|≤~1000 keeps any dot product ≪ 2^53 → exact everywhere.
    */
  def quantize(a: Column, scale: Int = 1000): Column =
    transform(a, x => round(x.cast("double") * scale).cast("long"))

  def dotLong(a: Column, b: Column): Column = vec(a, b, VectorBinaryExpr.Dot)

  /** [[gramMatrix]] accumulator: row count, per-component sums, and the
    * flat upper triangle of Σ x·xᵀ. Arrays size themselves lazily on the
    * first reduce/merge so the aggregator is dimension-agnostic.
    */
  final case class GramBuf(n: Long, sums: Array[Long], tri: Array[Long])

  /** Cosine over quantized vectors: exact-integer dots, one final double
    * division — bit-deterministic across engines.
    */
  def cosineQuantized(a: Column, b: Column): Column =
    dotLong(a, b).cast("double") /
      sqrt((dotLong(a, a) * dotLong(b, b)).cast("double"))

  /** Brute-force cosine top-k: for each query vector, the k nearest
    * candidates. Query side is broadcast (queries ≪ candidates); ranking via
    * window row_number with (similarity desc, id) deterministic order.
    */
  def bruteForceTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      quantized: Boolean = true): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"),
      (if (quantized) quantize(col(vecCol)) else col(vecCol)).as("qv"))
    // spread the candidate (probe) side: the |C|·|Q| dot products run in
    // its scan stage, which the single-row-group corpus serializes onto
    // ONE task otherwise (Tables.spread rationale)
    val c = graft.io.Tables.spread(
      candidates.select(col(idCol).as("cand_id"),
        (if (quantized) quantize(col(vecCol)) else col(vecCol)).as("cv")))
    val sim =
      if (quantized) cosineQuantized(col("qv"), col("cv"))
      else cosine(col("qv"), col("cv"))
    import org.apache.spark.sql.expressions.Window
    // project the vectors away BEFORE the window: the per-query top-k
    // exchange must carry (id, id, score) rows, not two d-dim arrays per
    // pair (profiled: the un-pruned window shuffled ~1 KB/pair — 4 GB at a
    // 2k×2k self-join — and dominated the whole query 5:1)
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .select(col("query_id"), col("cand_id"), sim.as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009) —
    * THE hybrid-retrieval combiner: fuse k ranked lists (lexical BM25,
    * embedding cosine, …) by Σ 1/(k0 + rank) per document, which needs
    * no score calibration across rankers (only ranks cross lists — the
    * reason RRF beats score interpolation out of the box and is the
    * default hybrid mode in production search stacks).
    *
    * Determinism: per-list ranks come from [[graft.core.Bounded.withRank]]
    * over (score desc, id) — every input list is top-k BOUNDED by
    * construction (a `limit` output), so no global window anywhere; the
    * fused score folds the per-list rank COLUMNS in declared list order
    * (a fixed-shape double expression, not a row-order-dependent sum),
    * rounds to 6, and the final top-N ranks on the ROUNDED value with id
    * tie-break — both engines sort the same keys.
    *
    * Scale shape: the expensive part is producing the input lists (each
    * ranker's own top-k machinery); fusion itself touches ≤ Σ|list| rows
    * — driver-free, dictionary-scale, one union + one hash-agg.
    *
    * @param lists (label, ranked list) pairs; each list carries idCol +
    *              scoreCol and is already bounded (top-k) — rank i is
    *              1-based within its list
    * @return topN rows: (id, n_lists, rank_<label>…, rrf, rk) — rank
    *         columns NULL where a list misses the doc
    */
  def rrfFuse(
      lists: Seq[(String, DataFrame)],
      idCol: String,
      scoreCol: String,
      k0: Int = 60,
      topN: Int = 20): DataFrame = {
    require(lists.size >= 2, "rrfFuse needs at least two ranked lists")
    val ranked = lists.map { case (label, df) =>
      graft.core.Bounded.withRank(
          df.select(col(idCol), col(scoreCol)),
          Seq((scoreCol, true), (idCol, false)), "__r")
        .select(col(idCol), lit(label).as("__l"), col("__r"))
    }.reduce(_ unionByName _)
    val perList = lists.map { case (label, _) =>
      max(when(col("__l") === label, col("__r"))).as(s"rank_$label")
    }
    val fused = lists.map { case (label, _) =>
      coalesce(lit(1.0) /
        (lit(k0.toDouble) + col(s"rank_$label").cast("double")), lit(0.0))
    }.reduce(_ + _)
    val aggCols = count(lit(1)).as("n_lists") +: perList
    val agg = ranked.groupBy(col(idCol))
      .agg(aggCols.head, aggCols.tail: _*)
      .withColumn("rrf", round(fused, 6))
    graft.core.Bounded.withRank(
      agg.orderBy(col("rrf").desc, col(idCol)).limit(topN),
      Seq(("rrf", true), (idCol, false)), "rk")
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, ACL'19 — the
    * LASER/CCMatrix parallel-corpus miner): for every source vector, the
    * best target by RATIO MARGIN — cosine normalized by the mean cosine of
    * each side's k nearest neighbors — rather than raw cosine, which
    * over-selects hub vectors that are close to everything. The
    * translation-pair mining shape of a multilingual training-data
    * pipeline.
    *
    * score(x,y) = cos(x,y) / ( (avgₖ(x, tgt) + avgₖ(y, src)) / 2 )
    *
    * Determinism: cosines quantize to exact micro-longs (round·1e6 of the
    * integer-dot cosine), neighbor sums are associative long sums, and the
    * margin is one fixed-shape division of longs rounded to 6 — NULL when
    * the denominator is ≤ 0 (degenerate all-negative neighborhoods), which
    * sorts last under the explicit nulls-last rank. Ties break on target
    * id.
    *
    * This is the BASELINE all-pairs scorer (source side broadcast, pair
    * mass |src|·|tgt| — the same contract as [[bruteForceTopK]]); at
    * corpus scale, generate candidates with [[ivfTopK]]'s cell probe and
    * feed only those pairs through the same margin algebra. Both per-side
    * neighbor aggregations key on an id — no global window anywhere.
    *
    * @return (src_id, tgt_id, cos_sim, margin) — one row per source, its
    *         argmax-margin target.
    */
  def bitextMarginMine(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"bad neighborhood size $k")
    val s = src.select(col(idCol).as("src_id"), quantize(col(vecCol)).as("sv"))
    val c = tgt.select(col(idCol).as("tgt_id"), quantize(col(vecCol)).as("tv"))
    // vectors pruned immediately after scoring (bruteForceTopK's rule)
    val pairs = c.crossJoin(broadcast(s))
      .select(col("src_id"), col("tgt_id"),
        round(cosineQuantized(col("sv"), col("tv")) * 1e6).cast("long")
          .as("__c"))
    marginArgmax(pairs, k).select(col("src_id"), col("tgt_id"),
      col("cos_sim"), col("margin"))
  }

  /** The ratio-margin algebra over an ALREADY-GENERATED candidate pair
    * relation (src_id, tgt_id, __c = micro-long cosine): per-side top-k
    * neighborhood sums, margin = 2·cos / (avg_src + avg_tgt) in exact
    * integer cross-multiplied form, argmax per source. Both per-side
    * aggregations and the final pick key on an id — no global window.
    * Shared by [[bitextMarginMine]] (all-pairs candidates) and
    * [[bitextMarginIvf]] (cell-probe candidates).
    */
  private def marginArgmax(pairsIn: DataFrame, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pairs = pairsIn.localCheckpoint(true)
    def sideAvg(key: String, out: String): DataFrame = {
      val w = Window.partitionBy(col(key))
        .orderBy(col("__c").desc, col(if (key == "src_id") "tgt_id"
          else "src_id"))
      pairs.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .groupBy(col(key))
        .agg(sum(col("__c")).as(s"__s$out"), count(lit(1)).as(s"__n$out"))
    }
    val denom = (col("__sa") * col("__nb") + col("__sb") * col("__na"))
    val scored = pairs
      .join(sideAvg("src_id", "a"), Seq("src_id"))
      .join(sideAvg("tgt_id", "b"), Seq("tgt_id"))
      .withColumn("margin",
        when(denom > 0L,
          round((lit(2.0) * col("__c") * col("__na") * col("__nb")) /
            denom.cast("double"), 6)))
    val w = Window.partitionBy(col("src_id"))
      .orderBy(col("margin").desc_nulls_last, col("tgt_id"))
    scored.withColumn("__best", row_number().over(w))
      .filter(col("__best") === 1)
      .withColumn("cos_sim", round(col("__c").cast("double") / 1e6, 6))
  }

  /** [[bitextMarginMine]]'s 100 TB path — the IVF candidate generator the
    * brute query's docstring promises: both sides assign to a shared
    * centroid table (argmax-cosine, centroids broadcast — [[ivfTopK]]'s
    * cell probe verbatim), candidate pairs are the CELL equi-join, and the
    * same [[marginArgmax]] algebra runs over candidates only. Pair mass
    * drops from |src|·|tgt| to Σ_cell |src_cell|·|tgt_cell| ≈
    * |src|·|tgt|/cells, and nothing broadcasts with the corpus: the only
    * corpus-scale exchanges key on centroid / src_id / tgt_id.
    *
    * Approximation contract (the standard mined-bitext trade): the top-k
    * NEIGHBORHOODS are computed within the candidate set too, so margins
    * deviate from brute where a true neighbor lives across the cell
    * boundary; a source probing only empty cells is ABSENT (brute always
    * answers). The recall-vs-brute spec measures exactly this, like
    * `ann_recall_embeddings` does for ivfTopK — on the CLUSTERED fixture
    * the probe is near-exact; the checked-in near-random table (IVF's
    * worst case: no cluster structure to exploit) sits at ~0.50 argmax
    * recall for nprobe 3 of 10 cells at 30% of brute's pair mass.
    *
    * `nprobe`: sources probe their top-nprobe cells (targets stay in
    * their single argmax cell) — the standard recall/cost dial; pair mass
    * scales with nprobe/cells.
    *
    * Centroids: tgt-side vectors with `idCol % centroidMod == centroidRem`
    * (deterministic stand-in for k-means, [[ivfTopK]]'s convention; the
    * rem parameter lets an id-parity-split corpus still seed centroids).
    *
    * @return (src_id, centroid_id, tgt_id, cos_sim, margin) — centroid_id
    *         is the probed cell the winning pair met in.
    */
  def bitextMarginIvf(
      src: DataFrame,
      tgt: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      nprobe: Int = 1,
      centroidMod: Int = 100,
      centroidRem: Int = 0): DataFrame = {
    require(k >= 1, s"bad neighborhood size $k")
    require(nprobe >= 1, s"bad probe count $nprobe")
    import org.apache.spark.sql.expressions.Window
    val cents = tgt.filter(col(idCol) % centroidMod === centroidRem)
      .select(col(idCol).as("centroid_id"), quantize(col(vecCol)).as("centv"))
    def assign(df: DataFrame, id: String, v: String, probes: Int): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("c_sim", cosineQuantized(col(v), col("centv")))
      val w = Window.partitionBy(col(id))
        .orderBy(col("c_sim").desc, col("centroid_id"))
      scored.withColumn("crk", row_number().over(w))
        .filter(col("crk") <= probes)
        .drop("crk", "c_sim", "centv")
    }
    val sAss = assign(
      src.select(col(idCol).as("src_id"), quantize(col(vecCol)).as("sv")),
      "src_id", "sv", nprobe)
    val tAss = assign(
      tgt.select(col(idCol).as("tgt_id"), quantize(col(vecCol)).as("tv")),
      "tgt_id", "tv", 1)
    val pairs = sAss.join(tAss, Seq("centroid_id"))
      .select(col("src_id"), col("tgt_id"), col("centroid_id"),
        round(cosineQuantized(col("sv"), col("tv")) * 1e6).cast("long")
          .as("__c"))
    marginArgmax(pairs, k).select(col("src_id"), col("centroid_id"),
      col("tgt_id"), col("cos_sim"), col("margin"))
  }

  /** IVF scale path. Centroids are chosen deterministically as the vectors
    * with `idCol % centroidMod == 0` (a real deployment would k-means them;
    * the index structure — assign, invert, probe — is what matters here).
    * Every vector is assigned to its argmax-cosine centroid; a query probes
    * only its own cell. Returns top-k within the probed cell.
    *
    * Plan shape: centroid table is broadcast twice (assignment of candidates,
    * assignment of queries); the only shuffle is the per-cell window — keyed
    * on centroid, so it scales with cells, not pairs.
    */
  def ivfTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidMod: Int = 100): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cents = candidates.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("centroid_id"), quantize(col(vecCol)).as("centv"))
    def assign(df: DataFrame, id: String, v: String): DataFrame = {
      val scored = df.crossJoin(broadcast(cents))
        .withColumn("c_sim", cosineQuantized(col(v), col("centv")))
      val w = Window.partitionBy(col(id))
        .orderBy(col("c_sim").desc, col("centroid_id"))
      scored.withColumn("crk", row_number().over(w)).filter(col("crk") === 1)
        .drop("crk", "c_sim", "centv")
    }
    val cAssigned = assign(
      candidates.select(col(idCol).as("cand_id"), quantize(col(vecCol)).as("cv")),
      "cand_id", "cv")
    val qAssigned = assign(
      queries.select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qv")),
      "query_id", "qv")
    val scored = qAssigned.join(cAssigned, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", cosineQuantized(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("centroid_id"), col("cand_id"), col("rk"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Lloyd k-means over an embedding column, pure DataFrame ops — the real
    * IVF centroid training (ivfTopK's modulo pick stands in where oracle
    * determinism matters). Deterministic init: the k lowest-id vectors.
    * Each iteration: one broadcast crossJoin assignment + one posexplode +
    * hash-agg mean — shuffle keyed on (centroid, dim), never on pairs.
    */
  /** Cluster-balanced (diversity-preserving) selection — the taxonomy/
    * cluster-quota sampling step of embedding-driven curation (the
    * SemDeDup-family pipelines cluster the corpus, then sample per
    * cluster so head clusters stop drowning the tail; τ = 0.5 is the
    * √-mass allocation of the multilingual-sampling literature): assign
    * every vector to its nearest centroid, then apply
    * [[graft.scale.TextAnalysis.temperatureMix]]'s n^τ quota +
    * md5-uniform ranked pick with the CLUSTER as the domain.
    *
    * Determinism: 1e-3-quantized integer distances, min-struct argmin
    * (ties to the smallest centroid id), micro-quantized √ weights with
    * DECIMAL(38,0) quota arithmetic, md5 draw — every piece an existing
    * green convention.
    *
    * Scale shape: centroid table broadcasts (dictionary-scale); the
    * argmin is ONE hash-agg over |corpus|·k rows; quotas are
    * cluster-dictionary scale; the pick is a window PARTITIONED by
    * cluster (never global).
    *
    * @param centroids (centroid_id, centv) with centv already
    *                  [[quantize]]d — a trained [[kmeansCentroids]]
    *                  codebook drops in
    * @return selected rows: (idCol, cluster, sel_rank)
    */
  def clusterBalancedSelect(
      vecs: DataFrame,
      centroids: DataFrame,
      idCol: String,
      vecCol: String,
      budget: Long,
      tau: Double = 0.5): DataFrame = {
    require(budget > 0L, s"bad budget $budget")
    val q = vecs.select(col(idCol), quantize(col(vecCol)).as("__v"))
    val assigned = q.crossJoin(broadcast(centroids))
      .select(col(idCol), col("centroid_id"),
        l2Sq(col("__v"), col("centv")).as("__d2"))
      .groupBy(col(idCol))
      .agg(min(struct(col("__d2"), col("centroid_id"))).as("__m"))
      .select(col(idCol), col("__m.centroid_id").as("cluster"))
    graft.scale.TextAnalysis
      .temperatureMix(assigned, "cluster", idCol, budget, tau)
      .select(col(idCol), col("cluster"), col("__rank").as("sel_rank"))
  }

  def kmeansCentroids(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      iters: Int = 5): DataFrame = {
    val vecs = df.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    // k rows only (post-limit); dense 0-based ids via predecessor-count
    // join over the k-row frame — bounded broadcast nested-loop, no
    // global-window stage
    val sel = vecs.orderBy(col("__id")).limit(k).localCheckpoint(true)
    val cid = sel.select(col("__id"))
      .join(sel.select(col("__id").as("__id2")),
        col("__id2") < col("__id"), "left")
      .groupBy(col("__id"))
      .agg(count(col("__id2")).cast("int").as("centroid_id"))
    var cents = sel.join(cid, Seq("__id"))
      .select(col("centroid_id"), col("__v").as("centv"))
    for (_ <- 0 until iters) {
      val assigned = assignNearest(vecs, cents)
      val updated = assigned
        .select(col("centroid_id"), posexplode(col("__v")).as(Seq("pos", "x")))
        .groupBy(col("centroid_id"), col("pos")).agg(avg(col("x")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(array_sort(collect_list(struct(col("pos"), col("m"))))
          .as("__pairs"))
        .select(col("centroid_id"),
          transform(col("__pairs"), p => p.getField("m")).as("__newv"))
      // a centroid with zero assigned vectors keeps its previous position
      // instead of silently vanishing (which would shrink the index below
      // the requested k for every later iteration)
      cents = cents
        .join(updated, Seq("centroid_id"), "left")
        .select(col("centroid_id"),
          coalesce(col("__newv"), col("centv")).as("centv"))
    }
    cents
  }

  /** Argmin-L2 centroid per vector (broadcast centroids; ties → lowest id). */
  private def assignNearest(vecs: DataFrame, cents: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d2 = l2Sq(col("__v"), col("centv"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__d2"), col("centroid_id"))
    vecs.crossJoin(broadcast(cents))
      .withColumn("__d2", d2)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .drop("__rk", "__d2", "centv")
  }

  /** IVF search with trained centroids and multi-probe: each query scans its
    * `nProbe` nearest cells instead of one (recall/latency dial). The only
    * pair work is within probed cells — scan cost is ~nProbe/k of the corpus
    * per query at 100 TB.
    */
  def ivfTopKTrained(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroids: DataFrame,
      nProbe: Int = 2): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cand = candidates.select(col(idCol).as("__id"),
      transform(col(vecCol), x => x.cast("double")).as("__v"))
    val cAssigned = assignNearest(cand, centroids)
      .select(col("__id").as("cand_id"), col("__v").as("cv"),
        col("centroid_id"))
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), x => x.cast("double")).as("qv"))
    val d2 = l2Sq(col("qv"), col("centv"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("__d2"), col("centroid_id"))
    val qProbes = q.crossJoin(broadcast(centroids))
      .withColumn("__d2", d2)
      .withColumn("__rk", row_number().over(wProbe))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("qv"), col("centroid_id"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    qProbes.join(cAssigned, Seq("centroid_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos_sim", cosine(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(wTop))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk"), col("cos_sim"))
  }

  /** Brute-force EXACT-L2 top-k (the ground-truth companion for L2-metric
    * indexes like [[ivfPqTopK]], where the cosine ground truth of
    * [[bruteForceTopK]] would grade against the wrong metric). Distances
    * are exact long L2² over quantized vectors; ties break on cand id.
    */
  def bruteForceTopKL2(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"))
    // spread the probe side (the |C|·|Q| L2 math — bruteForceTopK note)
    val c = graft.io.Tables.spread(
      candidates.select(col(idCol).as("cand_id"),
        quantize(col(vecCol)).as("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("d2"), col("cand_id"))
    c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("d2", l2Sq(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk"), col("d2"))
  }

  /** IVF-PQ asymmetric-distance search (Jégou et al., "Product Quantization
    * for Nearest Neighbor Search", TPAMI 2011) — the composition that IS the
    * practical 100 TB retrieval configuration: the IVF level prunes the
    * corpus to `nProbe` cells per query, and the PQ level replaces every
    * candidate vector by `m` small codes, so the search scan reads codes
    * (m values + a cell id per candidate), never raw vectors. Distances come
    * from a per-query lookup table (ADC): for each (subspace, codebook
    * entry), the exact long L2² between the query's subvector and that
    * entry; a candidate's distance is the sum of its m table entries.
    *
    * Deterministic family conventions: coarse cells = `id % centroidMod == 0`
    * ([[ivfTopK]]); PQ codebook = subvectors of ids < pqK ([[pqAssign]]);
    * quantized 1e-3 integer vectors; every argmin ties on the lower id. ADC
    * is a sum of exact longs — the whole search replays in DuckDB.
    *
    * Plan shape: the codebook (m·pqK subvectors) and the coarse centroid
    * table are the only broadcasts; encoding is a broadcast join plus a
    * per-(vector, subspace) argmin keyed on the vector; the search joins
    * probe lists to code arrays on the CELL key and evaluates ADC from a
    * per-query map — no raw-vector pair shuffle anywhere.
    */
  def ivfPqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidMod: Int = 100,
      nProbe: Int = 2,
      m: Int = 4,
      pqK: Int = 16,
      dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m > 0 && dims % m == 0, s"m must divide $dims: $m")
    val sub = dims / m
    // key packing for the ADC map: (subspace, code) → one long. 2^20 leaves
    // room for any realistic codebook id while staying far from overflow.
    val KEY = 1048576L
    val cents = candidates.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("cell"), quantize(col(vecCol)).as("centv"))
    val cand = candidates.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("cv"))
    val wc = Window.partitionBy(col("cand_id"))
      .orderBy(col("__d2"), col("cell"))
    val candCell = cand.crossJoin(broadcast(cents))
      .withColumn("__d2", l2Sq(col("cv"), col("centv")))
      .withColumn("__rk", row_number().over(wc))
      .filter(col("__rk") === 1)
      .select(col("cand_id"), col("cv"), col("cell"))
    val book = candidates.filter(col(idCol) < pqK)
      .select(col(idCol).as("code"), quantize(col(vecCol)).as("bv"))
      .select(col("code"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("bv"))
      .select(col("code"), col("sub"),
        slice(col("bv"), col("sub") * sub + 1, lit(sub)).as("bsv"))
    // candidate encoding: per (vector, subspace) argmin over the codebook
    val wcode = Window.partitionBy(col("cand_id"), col("sub"))
      .orderBy(col("__d2"), col("code"))
    val codes = candCell
      .select(col("cand_id"), col("cell"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("cv"))
      .select(col("cand_id"), col("cell"), col("sub"),
        slice(col("cv"), col("sub") * sub + 1, lit(sub)).as("csv"))
      .join(broadcast(book), Seq("sub"))
      .withColumn("__d2", l2Sq(col("csv"), col("bsv")))
      .withColumn("__rk", row_number().over(wcode))
      .filter(col("__rk") === 1)
      .groupBy(col("cand_id"), col("cell"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("__sc"))
      .select(col("cand_id"), col("cell"),
        expr("transform(__sc, p -> p.code)").as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__d2"), col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__d2", l2Sq(col("qv"), col("centv")))
      .withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("cell"))
    // per-query ADC table: map (sub·KEY + code) → exact long L2²
    val dtab = q
      .select(col("query_id"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("qv"))
      .select(col("query_id"), col("sub"),
        slice(col("qv"), col("sub") * sub + 1, lit(sub)).as("qsv"))
      .join(broadcast(book), Seq("sub"))
      .withColumn("__d2", l2Sq(col("qsv"), col("bsv")))
      .groupBy(col("query_id"))
      .agg(map_from_entries(collect_list(struct(
        (col("sub").cast("long") * KEY + col("code")).as("k"),
        col("__d2").as("v")))).as("dtab"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("cand_id"))
    probes.join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(dtab, Seq("query_id"))
      .withColumn("adc", expr(
        s"aggregate(sequence(0, ${m - 1}), 0L, (acc, s) -> " +
          s"acc + element_at(dtab, CAST(s AS BIGINT) * $KEY + " +
          "element_at(codes, s + 1)))"))
      .withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cell"), col("cand_id"), col("rk"),
        col("adc"))
  }

  /** RESIDUAL-encoding IVF-PQ (IVFADC proper, Jégou et al. TPAMI 2011
    * §IV.A): [[ivfPqTopK]] encodes RAW vectors, which wastes the entire
    * codebook budget re-describing each cell's centroid offset; the real
    * index quantizes the residual x − c(x) against the assigned coarse
    * centroid, so the m·pqK codebook describes only within-cell
    * displacement — the structure that makes billion-scale recall work
    * when cells are far apart. The query side forms a PER-PROBED-CELL
    * residual q − c (so the ADC table is per (query, cell)), and
    * ADC = Σ_sub ‖rq_sub − book[code]_sub‖² approximates ‖q − x‖²
    * exactly when the candidate's residual is in the codebook.
    *
    * Same deterministic family conventions as [[ivfPqTopK]] (cells =
    * id % centroidMod == 0, codebook = residuals of ids < pqK, quantized
    * integer vectors, argmin ties on the lower id) — residuals of
    * quantized integers are integers, so the whole search still replays
    * in DuckDB. Residual formation is one `zip_with` per row riding the
    * scan (corpus-linear, not a per-element aggregation — the HOF rule's
    * carve-out, the [[opqApply]] precedent).
    *
    * Plan shape: identical to [[ivfPqTopK]] except the ADC table keys on
    * (query, probed cell) — |q|·nProbe maps instead of |q|, still a
    * broadcast-scale relation.
    */
  def ivfPqResidualTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      centroidMod: Int = 100,
      nProbe: Int = 2,
      m: Int = 4,
      pqK: Int = 16,
      dims: Int = 64): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(m > 0 && dims % m == 0, s"m must divide $dims: $m")
    val sub = dims / m
    val KEY = 1048576L
    val cents = candidates.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("cell"), quantize(col(vecCol)).as("centv"))
    val cand = candidates.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("cv"))
    val wc = Window.partitionBy(col("cand_id"))
      .orderBy(col("__d2"), col("cell"))
    // nearest cell, centroid KEPT for the residual
    val candCell = cand.crossJoin(broadcast(cents))
      .withColumn("__d2", l2Sq(col("cv"), col("centv")))
      .withColumn("__rk", row_number().over(wc))
      .filter(col("__rk") === 1)
      .select(col("cand_id"), col("cell"),
        zip_with(col("cv"), col("centv"), (x, y) => x - y).as("rv"))
    // codebook = RESIDUAL subvectors of ids < pqK (w.r.t. their own cells)
    val book = candCell.filter(col("cand_id") < pqK)
      .select(col("cand_id").as("code"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("rv"))
      .select(col("code"), col("sub"),
        slice(col("rv"), col("sub") * sub + 1, lit(sub)).as("bsv"))
    val wcode = Window.partitionBy(col("cand_id"), col("sub"))
      .orderBy(col("__d2"), col("code"))
    val codes = candCell
      .select(col("cand_id"), col("cell"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("rv"))
      .select(col("cand_id"), col("cell"), col("sub"),
        slice(col("rv"), col("sub") * sub + 1, lit(sub)).as("csv"))
      .join(broadcast(book), Seq("sub"))
      .withColumn("__d2", l2Sq(col("csv"), col("bsv")))
      .withColumn("__rk", row_number().over(wcode))
      .filter(col("__rk") === 1)
      .groupBy(col("cand_id"), col("cell"))
      .agg(array_sort(collect_list(struct(col("sub"), col("code"))))
        .as("__sc"))
      .select(col("cand_id"), col("cell"),
        expr("transform(__sc, p -> p.code)").as("codes"))
    val q = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"))
    val wp = Window.partitionBy(col("query_id"))
      .orderBy(col("__d2"), col("cell"))
    // probes keep the centroid: the query residual is PER PROBED CELL
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("__d2", l2Sq(col("qv"), col("centv")))
      .withColumn("__rk", row_number().over(wp))
      .filter(col("__rk") <= nProbe)
      .select(col("query_id"), col("cell"),
        zip_with(col("qv"), col("centv"), (x, y) => x - y).as("rq"))
    // per-(query, cell) ADC table over the residual codebook
    val dtab = probes
      .select(col("query_id"), col("cell"),
        explode(sequence(lit(0), lit(m - 1))).as("sub"), col("rq"))
      .select(col("query_id"), col("cell"), col("sub"),
        slice(col("rq"), col("sub") * sub + 1, lit(sub)).as("qsv"))
      .join(broadcast(book), Seq("sub"))
      .withColumn("__d2", l2Sq(col("qsv"), col("bsv")))
      .groupBy(col("query_id"), col("cell"))
      .agg(map_from_entries(collect_list(struct(
        (col("sub").cast("long") * KEY + col("code")).as("k"),
        col("__d2").as("v")))).as("dtab"))
    val wk = Window.partitionBy(col("query_id"))
      .orderBy(col("adc"), col("cand_id"))
    probes.select(col("query_id"), col("cell")).join(codes, Seq("cell"))
      .filter(col("query_id") =!= col("cand_id"))
      .join(dtab, Seq("query_id", "cell"))
      .withColumn("adc", expr(
        s"aggregate(sequence(0, ${m - 1}), 0L, (acc, s) -> " +
          s"acc + element_at(dtab, CAST(s AS BIGINT) * $KEY + " +
          "element_at(codes, s + 1)))"))
      .withColumn("rk", row_number().over(wk))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cell"), col("cand_id"), col("rk"),
        col("adc"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, blocked by an
    * LSH-ish signature: the sign pattern of selected components (a random-
    * hyperplane sketch with axis-aligned planes — deterministic). Pairs are
    * only compared within a block.
    */
  def cosineNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double = 0.95,
      signDims: Int = 8): DataFrame = {
    // quantize ONCE into a column, then derive the sign block from that
    // column — a lambda referencing the quantize subtree directly would
    // re-evaluate the 64-element transform per sign dimension per row
    // (the HOF rebind pitfall documented at Shingles.wordShingles)
    val sided = df.select(col(idCol), quantize(col(vecCol)).as("v"))
      .withColumn("block", array_join(
        transform(sequence(lit(1), lit(signDims)),
          i => when(element_at(col("v"), i.cast("int")) >= 0, "1")
            .otherwise("0")),
        ""))
    val l = sided.select(col("block"), col(idCol).as("id_a"), col("v").as("v_a"))
    val r = sided.select(col("block"), col(idCol).as("id_b"), col("v").as("v_b"))
    l.join(r, Seq("block"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineQuantized(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Product-quantization (PQ) code assignment: split each embedding into
    * `m` contiguous subspaces and encode every subvector as the id of its
    * nearest codebook centroid — the memory layout (m bytes per vector)
    * behind billion-scale ANN indexes, complementing [[sq8Stats]] (SQ8
    * compresses per dimension; PQ per subspace).
    *
    * The codebook here is the deterministic convention the k-means query
    * family uses: the subvectors of the first `k` ids (a trained codebook
    * drops in via the same DataFrame shape — [[kmeansCentroids]] per
    * subspace). Distances are exact integer L2² on quantized vectors via
    * the native codegen kernel; the argmin tiebreak is (d2, centroid id).
    *
    * Shape: one subspace explode (m rows per vector) + one broadcast join
    * against the m·k codebook + one keyed min — linear in corpus size, no
    * pair shuffle. Emits per (subspace, code): population and mean L2²
    * distortion (exact-integer sum, one rounded double).
    */
  def pqAssign(
      embeddings: DataFrame, idCol: String, vecCol: String,
      m: Int, k: Int, dims: Int = 64): DataFrame = {
    require(m > 0 && dims % m == 0, s"m must divide $dims: $m")
    // an empty codebook (k <= 0, or no ids below k) would silently drop
    // every vector at the join — fail fast on the statically-checkable half
    require(k > 0, s"codebook size must be positive: $k")
    val sub = dims / m
    def subspaces(df: DataFrame, outId: String): DataFrame =
      df.select(col(idCol).as(outId), quantize(col(vecCol)).as("v"))
        // fail fast on ragged/short vectors: out-of-range slices would
        // otherwise yield empty subvectors (l2Sq = 0 for every centroid)
        // and silently assign code 0
        .withColumn("v",
          when(size(col("v")) === dims, col("v"))
            .otherwise(raise_error(concat(
              lit(s"pqAssign: expected $dims-dim vector, got "),
              size(col("v")).cast("string")))))
        .select(col(outId), explode(sequence(lit(0), lit(m - 1))).as("sub"),
          col("v"))
        .select(col(outId), col("sub"),
          slice(col("v"), col("sub") * sub + 1, lit(sub)).as("sv"))
    val vecs = subspaces(embeddings, "vec_id_")
    val cents = subspaces(embeddings.filter(col(idCol) < k), "cent_id")
      .withColumnRenamed("sv", "cv")
    val byVecSub = Window.partitionBy(col("vec_id_"), col("sub"))
      .orderBy(col("d2"), col("cent_id"))
    vecs.join(broadcast(cents), Seq("sub"))
      .withColumn("d2", l2Sq(col("sv"), col("cv")))
      .withColumn("rk", row_number().over(byVecSub))
      .filter(col("rk") === 1)
      .groupBy(col("sub"), col("cent_id").as("code"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("d2")).cast("double") / count(lit(1)), 6).as("avg_d2"))
  }

  /** Variance-balanced OPQ dimension allocation — the permutation-
    * restricted parametric OPQ (Ge et al. CVPR'13: optimized product
    * quantization splits the space so every subspace carries a balanced
    * variance budget; contiguous splits concentrate it). Dimensions are
    * ranked by EXACT integer variance numerator n·Σx² − (Σx)² over the
    * quantized components and dealt to the m subspaces in snake order
    * (0,1,…,m−1,m−1,…,1,0,…), so each subspace receives one dimension
    * from every variance stratum.
    *
    * Design decision vs full OPQ: the eigenbasis rotation half is
    * iterative float math ([[pcaFromGram]]'s documented
    * non-replayability); a permutation IS an orthogonal transform, keeps
    * the entire downstream index exact-integer and SQL-replayable (the
    * house determinism contract), and captures the allocation half of
    * OPQ's gain. Scale shape: one posexplode + d-row hash-agg; the rank
    * window runs over d rows (dictionary scale — a global window is fine
    * at d ≤ 4096).
    *
    * @return (olddim, newpos), 1-based, `dims` rows: component olddim
    *         moves to newpos; (newpos−1) div (dims/m) is its subspace
    */
  def opqPermutation(
      embeddings: DataFrame, vecCol: String, m: Int,
      dims: Int = 64): DataFrame = {
    require(m > 0 && dims % m == 0, s"m must divide $dims: $m")
    val sub = dims / m
    val dec = "decimal(38,0)"
    val stats = embeddings
      .select(posexplode(quantize(col(vecCol))).as(Seq("p", "x")))
      .groupBy((col("p") + 1).as("olddim"))
      .agg(count(lit(1)).cast(dec).as("n"),
        sum(col("x")).cast(dec).as("s"),
        sum(col("x").cast(dec) * col("x")).cast(dec).as("ss"))
    // rank by the predecessor-count join (Bounded.withRank — the repo's
    // standard for global rank; also on a d-row dictionary an
    // unpartitioned row_number window was the one WindowExec single-task
    // warning left in the suite)
    graft.core.Bounded.withRank(
        stats.withColumn("var_num",
          col("n") * col("ss") - col("s") * col("s")),
        Seq(("var_num", true), ("olddim", false)), "__rk")
      .withColumn("r0", col("__rk").cast("long") - 1)
      .withColumn("rnd", expr(s"r0 div $m"))
      .withColumn("pos", expr(s"r0 % $m"))
      .withColumn("subsp", when(col("rnd") % 2 === 0, col("pos"))
        .otherwise(lit(m - 1) - col("pos")))
      .select(col("olddim").cast("int").as("olddim"),
        (col("subsp") * sub + col("rnd") + 1).cast("int").as("newpos"))
  }

  /** Apply an [[opqPermutation]] to the raw vector column:
    * out[newpos] = v[olddim]. The permutation is d rows — control plane;
    * it collects to the driver (the [[pcaFromGram]] d² precedent) and
    * inlines as an array literal, so the rotation is ONE codegen'd
    * transform riding the corpus scan — no join, no shuffle. Permutation
    * commutes with quantization and preserves full-vector L2, so IVF cell
    * assignment and exact ground truth are unchanged; only the PQ
    * subspace split sees the new layout.
    */
  def opqApply(
      df: DataFrame, vecCol: String, perm: DataFrame,
      dims: Int = 64): DataFrame = {
    val rows = perm.select(col("olddim"), col("newpos")).collect()
    require(rows.length == dims, s"permutation must cover $dims dims")
    val inv = new Array[Int](dims + 1)
    val seenOld = new Array[Boolean](dims + 1)
    rows.foreach { r =>
      val (o, np) = (r.getInt(0), r.getInt(1))
      require(np >= 1 && np <= dims && inv(np) == 0,
        s"not a permutation at newpos $np")
      // a repeated olddim (with distinct newpos) would pass the newpos
      // check yet apply a NON-permutation, silently breaking the
      // documented L2-preservation invariant — fail loudly instead
      require(o >= 1 && o <= dims && !seenOld(o),
        s"not a permutation at olddim $o")
      seenOld(o) = true
      inv(np) = o
    }
    val invLit = typedLit((1 to dims).map(inv))
    df.withColumn(vecCol, transform(sequence(lit(1), lit(dims)),
      i => element_at(col(vecCol), element_at(invLit, i.cast("int")))))
  }

  /** SQ8 scalar quantization of the embedding corpus: per-dimension
    * [min, max] ranges, 8-bit codes, and the resulting reconstruction
    * error — the standard 4× memory compression that makes a 100 TB vector
    * corpus fit its serving tier (each float32 → one byte + a shared
    * per-dimension range pair).
    *
    * Shape: one posexplode + a tiny per-dimension min/max agg broadcast
    * back over the scan — two jobs, no pair-wise work, linear at any corpus
    * size.
    *
    * Determinism: inputs quantize to integers (round(x·1000), the module
    * convention), codes come from INTEGER division, and the reconstruction
    * error is carried as the exact integer numerator of
    * |xq − (minq + (2·code+1)·(maxq−minq)/510)| (scaled by 510) — the only
    * double step is the final ratio, rounded to 6.
    */
  /** Upper-triangle Gram matrix Σ x·xᵀ over quantized embeddings — the
    * one-pass sufficient statistic behind PCA / whitening / covariance
    * estimation on an embedding corpus (the d×d Gram plus the component
    * sums and count give the covariance exactly; the eigendecomposition is
    * a driver-side step on d² numbers, not a data-plane job).
    *
    * Execution shape — the part that must scale: a typed Aggregator whose
    * buffer is the flat upper triangle (d·(d+1)/2 longs, ~16 KB at d=64)
    * accumulated per PARTITION and merged by elementwise add, so 100 TB of
    * vectors cross the exchange as one triangle per partition. The naive
    * expressions of the same query — explode to (id, i, xᵢ) and self-join
    * on id, or explode each row to d² products — shuffle corpus×d or
    * materialize corpus×d² rows; the aggregator shuffles O(partitions·d²)
    * bytes total.
    *
    * Output: (i, j, n, sum_i, sum_j, gram) for 1 ≤ i ≤ j ≤ d, all exact
    * longs over round(x·1000) components (|x|≤~3·10³, so a 2⁶³ overflow
    * needs ~10¹² rows per partial — beyond any real shard; DECIMAL the
    * accumulator if that bound ever binds).
    */
  def gramMatrix(embeddings: DataFrame, vecCol: String): DataFrame = {
    val spark = embeddings.sparkSession
    import org.apache.spark.sql.{Encoder, Encoders}
    import org.apache.spark.sql.expressions.Aggregator
    // typed path: Dataset[Array[Long]] keeps the aggregator input simple
    import spark.implicits._
    val ds = embeddings.select(quantize(col(vecCol)).as("v"))
      .as[Array[Long]]
    val agg = new Aggregator[Array[Long], GramBuf, GramBuf] {
      override def zero: GramBuf = GramBuf(0L, Array.emptyLongArray,
        Array.emptyLongArray)
      private def sized(b: GramBuf, d: Int): GramBuf =
        if (b.sums.nonEmpty) b
        else GramBuf(b.n, new Array[Long](d), new Array[Long](d * (d + 1) / 2))
      override def reduce(b0: GramBuf, x: Array[Long]): GramBuf = {
        val d = x.length
        val b = sized(b0, d)
        var i = 0; var t = 0
        while (i < d) {
          b.sums(i) += x(i)
          var j = i
          while (j < d) { b.tri(t) += x(i) * x(j); t += 1; j += 1 }
          i += 1
        }
        GramBuf(b.n + 1, b.sums, b.tri)
      }
      override def merge(a0: GramBuf, c: GramBuf): GramBuf = {
        if (c.sums.isEmpty) return a0
        val a = sized(a0, c.sums.length)
        var i = 0
        while (i < a.sums.length) { a.sums(i) += c.sums(i); i += 1 }
        var t = 0
        while (t < a.tri.length) { a.tri(t) += c.tri(t); t += 1 }
        GramBuf(a.n + c.n, a.sums, a.tri)
      }
      override def finish(b: GramBuf): GramBuf = b
      override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
      override def outputEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
    }
    val buf = ds.select(udaf(agg, implicitly[Encoder[Array[Long]]])
      .apply(col("v")).as("g"))
    // unpack the triangle into (i, j, n, sum_i, sum_j, gram) rows.
    // The size guard matters on an EMPTY corpus: the aggregator then emits
    // its zero buffer (empty arrays), and Spark's sequence(1, 0) counts
    // DOWN — without the filter the unpack would fabricate rows instead
    // of yielding none.
    buf.select(col("g.n").as("n"), col("g.sums").as("sums"),
        col("g.tri").as("tri"))
      .filter(size(col("sums")) > 0)
      .select(col("n"), col("sums"), col("tri"),
        explode(sequence(lit(1), size(col("sums")))).as("i"))
      .select(col("n"), col("sums"), col("tri"), col("i"),
        explode(sequence(col("i"), size(col("sums")))).as("j"))
      .select(col("i"), col("j"), col("n"),
        element_at(col("sums"), col("i")).as("sum_i"),
        element_at(col("sums"), col("j")).as("sum_j"),
        // flat index of (i,j), 1-based cols: offset of row i plus (j-i)
        element_at(col("tri"),
          (((col("i") - 1) * (lit(2) * size(col("sums")) - col("i") + 2))
            .cast("int") / 2 + (col("j") - col("i")) + 1).cast("int"))
          .as("gram"))
  }

  /** Driver-side PCA completion of [[gramMatrix]]: collect the d·(d+1)/2
    * sufficient-statistic rows (d² numbers — control plane, never
    * data-plane rows), form the covariance C = G/n − μμᵀ, and run a cyclic
    * Jacobi eigensolve. The split is the point: the corpus-sized work is
    * the one-pass Gram aggregation; the eigendecomposition is O(d³) on the
    * driver — the standard architecture for distributed PCA at d ≪ n.
    *
    * Deterministic (fixed sweep order, fixed convergence threshold, double
    * arithmetic on driver), but iterative float math is not SQL-replayable
    * — this query is rows-only-checked by design, with the spec asserting
    * the algebraic invariants (trace preservation, descending order,
    * planted-variance recovery).
    *
    * Output: (pc, eigenvalue, var_ratio, cum_ratio) for the top `topK`
    * components; eigenvalues are in quantized-component units (×10⁻⁶ of
    * the raw embedding scale — callers compare ratios, which are unitless).
    */
  def pcaFromGram(gram: DataFrame, topK: Int = 8): DataFrame = {
    val spark = gram.sparkSession
    val rows = gram.select(col("i"), col("j"), col("n"), col("sum_i"),
      col("sum_j"), col("gram")).collect()
    require(rows.nonEmpty, "empty gram input")
    val d = rows.iterator.map(_.getInt(1)).max
    val n = rows.head.getLong(2).toDouble
    val a = Array.ofDim[Double](d, d)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
      val c = r.getLong(5) / n -
        (r.getLong(3) / n) * (r.getLong(4) / n)
      a(i)(j) = c; a(j)(i) = c
    }
    val eig = jacobiEigenvalues(a).sorted(Ordering[Double].reverse)
    val trace = eig.sum
    val k = math.min(topK, d)
    def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    val out = (0 until k).map { p =>
      (p + 1, r6(eig(p)), r6(eig(p) / trace),
        r6(eig.take(p + 1).sum / trace))
    }
    import spark.implicits._
    out.toDF("pc", "eigenvalue", "var_ratio", "cum_ratio")
  }

  /** Oracle-checkable companion of [[pcaFromGram]] — the `approx_stats`
    * trick applied to PCA: iterative eigensolve output can't be replayed in
    * SQL, but its algebraic CONTRACT against the exact integer sufficient
    * statistic can. Emits, per principal component:
    *
    *  - exact companions DuckDB recomputes from the same gram relation:
    *    `n`, `d`, `trace_q` = Σᵢ(Gᵢᵢ·n − sumᵢ²) and `frob_q` =
    *    Σᵢⱼ(Gᵢⱼ·n − sumᵢ·sumⱼ)² — the covariance trace and squared
    *    Frobenius norm in quantized integer units (scaled by n² resp. n⁴),
    *    computed in BigDecimal so nothing overflows at any corpus size;
    *  - boolean contract flags the oracle pins to TRUE: Σλ = trace(C) and
    *    Σλ² = ‖C‖²_F (Jacobi preserves both to ~1e-13 relative; a broken
    *    eigensolve flips them), λ₁ ≥ maxᵢCᵢᵢ (Rayleigh quotient on eᵢ),
    *    λ_min ≥ −tol (PSD), per-row descending order and monotone
    *    cum_ratio.
    *
    * A drifting eigensolve flips a flag and fails the driver's hash
    * compare — the same mechanism that turned approx_stats from rows-only
    * into a checked query.
    */
  def pcaChecked(gram: DataFrame, topK: Int = 8): DataFrame = {
    val spark = gram.sparkSession
    val rows = gram.select(col("i"), col("j"), col("n"), col("sum_i"),
      col("sum_j"), col("gram")).collect()
    require(rows.nonEmpty, "empty gram input")
    val d = rows.iterator.map(_.getInt(1)).max
    val nL = rows.head.getLong(2)
    val n = nL.toDouble
    val a = Array.ofDim[Double](d, d)
    var traceQ = BigDecimal(0)
    var frobQ = BigDecimal(0)
    rows.foreach { r =>
      val (i, j) = (r.getInt(0) - 1, r.getInt(1) - 1)
      val c = r.getLong(5) / n - (r.getLong(3) / n) * (r.getLong(4) / n)
      a(i)(j) = c; a(j)(i) = c
      // exact integer-units covariance entry: G_ij·n − sum_i·sum_j
      val cq = BigDecimal(r.getLong(5)) * BigDecimal(nL) -
        BigDecimal(r.getLong(3)) * BigDecimal(r.getLong(4))
      if (i == j) traceQ += cq
      frobQ += cq * cq * (if (i == j) 1 else 2)
    }
    val eigAll = jacobiEigenvalues(a).sorted(Ordering[Double].reverse)
    val traceC = (traceQ / (BigDecimal(nL) * BigDecimal(nL))).toDouble
    val frobC = (frobQ / (BigDecimal(nL).pow(4))).toDouble
    val maxDiag = (0 until d).map(i => a(i)(i)).max
    val tol = 1e-9 * math.max(1.0, math.abs(traceC))
    val sumOk = math.abs(eigAll.sum - traceC) <= tol
    val frobOk = math.abs(eigAll.map(e => e * e).sum - frobC) <=
      1e-9 * math.max(1.0, traceC * traceC)
    val topOk = eigAll.head >= maxDiag - tol
    val psdOk = eigAll.last >= -tol
    val trace = eigAll.sum
    val k = math.min(topK, d)
    val out = (0 until k).map { p =>
      val cum = eigAll.take(p + 1).sum / trace
      val prevCum = if (p == 0) 0.0 else eigAll.take(p).sum / trace
      (p + 1, nL, d, traceQ.bigDecimal.toBigInteger.toString,
        frobQ.bigDecimal.toBigInteger.toString,
        sumOk, frobOk, topOk, psdOk,
        p == 0 || eigAll(p) <= eigAll(p - 1) + tol,
        cum >= prevCum - 1e-12 && cum <= 1.0 + 1e-9)
    }
    import spark.implicits._
    // companions ride as exact digit STRINGS: DuckDB's pandas bridge
    // degrades DECIMAL(38,0) to float64 (silent precision loss at ~1e21),
    // while VARCHAR survives both bridges losslessly
    out.toDF("pc", "n", "d", "trace_q", "frob_q", "sum_eq_trace_ok",
      "frob_eq_sumsq_ok", "top_ge_maxdiag_ok", "psd_ok", "descending_ok",
      "cum_monotone_ok")
  }

  /** Cyclic Jacobi for a symmetric matrix: rotate out each off-diagonal
    * element in fixed (p,q) order until the off-diagonal Frobenius mass
    * drops below 1e-12·trace² or 50 sweeps pass. O(d³) per sweep — driver
    * cost only, d is the embedding dimension.
    */
  private def jacobiEigenvalues(a0: Array[Array[Double]]): Seq[Double] = {
    val d = a0.length
    val a = a0.map(_.clone())
    def off(): Double = {
      var s = 0.0
      var p = 0
      while (p < d) {
        var q = p + 1
        while (q < d) { s += 2 * a(p)(q) * a(p)(q); q += 1 }
        p += 1
      }
      s
    }
    val tol = 1e-12 * math.max(1.0, math.pow((0 until d).map(i => a(i)(i)).sum, 2))
    var sweep = 0
    while (off() > tol && sweep < 50) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (apq != 0.0) {
            val theta = (a(q)(q) - a(p)(p)) / (2 * apq)
            // tan of the annihilating rotation, stable form; theta = 0
            // (equal diagonal) rotates by 45°: t = 1
            val t = {
              val tt = 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1))
              if (theta < 0) -tt else tt
            }
            val c = 1 / math.sqrt(t * t + 1)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (0 until d).map(i => a(i)(i))
  }

  def sq8Stats(embeddings: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val q = embeddings.select(col(idCol),
      posexplode(quantize(col(vecCol))).as(Seq("pos", "xq")))
    val ranges = q.groupBy(col("pos"))
      .agg(min(col("xq")).as("minq"), max(col("xq")).as("maxq"))
    q.join(broadcast(ranges), Seq("pos"))
      .withColumn("code",
        when(col("maxq") > col("minq"),
          expr("((xq - minq) * 255) DIV (maxq - minq)")).otherwise(0L))
      .withColumn("err_num",
        when(col("maxq") > col("minq"),
          abs(lit(510L) * (col("xq") - col("minq")) -
            (lit(2L) * col("code") + lit(1L)) * (col("maxq") - col("minq"))))
          .otherwise(0L))
      .groupBy(col("pos"))
      .agg(
        count(lit(1)).as("n"),
        max(col("minq")).as("minq"),
        max(col("maxq")).as("maxq"),
        sum(col("err_num")).as("sum_err_num"),
        round(sum(col("err_num")).cast("double") /
          (count(lit(1)).cast("double") * lit(510.0)), 6).as("avg_err"))
  }

  /** SemDeDup-style cluster-scoped semantic dedup (Abbas et al. 2023,
    * arXiv:2303.09540): assign every vector to its nearest centroid, compare
    * pairs ONLY within a cluster, and drop each vector that has a
    * smaller-id cluster-mate above the similarity threshold (keep-lowest-id
    * — the deterministic stand-in for SemDeDup's keep-least-central).
    *
    * Returns the DROP list: (vec_id, centroid_id, n_dups, max_sim) — one row
    * per removed vector, n_dups = how many kept-or-dropped smaller-id
    * neighbors exceeded the threshold, max_sim the strongest of them.
    *
    * Scale shape — TWO-LEVEL assignment, so no broadcast grows with the
    * corpus (the round-3 weak spot was a single-level centroid broadcast of
    * N/centroidMod rows):
    *  - level 1: a FIXED budget of `coarseK` coarse centroids (the coarseK
    *    smallest ids — deterministic; a trained [[kmeansCentroids]] codebook
    *    drops in via the same shape). The only broadcast in the plan; its
    *    size is corpus-independent. Scoring is N × coarseK — linear.
    *  - level 2: fine centroids are CELL-LOCAL — the `id % fineMod == 0`
    *    members of each coarse cell — and are never broadcast: the fine
    *    assignment is an equi-join keyed on coarse_id, so per-cell exchanged
    *    state tracks cell population. Fine-cluster sizes stay ~fineMod, so
    *    the within-cluster pair shuffle scales with Σ|cluster|² ≈ N·fineMod,
    *    not N². coarseK is the knob to keep per-cell fine scoring bounded as
    *    the corpus grows (pick coarseK ~ √(N/fineMod) upward).
    * A coarse cell with no fine-centroid member contributes nothing (its
    * vectors are unassigned, hence never deduped) — the cell-local analog of
    * the level-1 convention. `coarseK = 1` reduces exactly to the previous
    * single-level semantics.
    */
  def semDedup(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      threshold: Double,
      fineMod: Int = 100,
      coarseK: Int = 32): DataFrame = {
    val coarse = df.orderBy(col(idCol)).limit(coarseK)
      .select(col(idCol).as("coarse_id"), quantize(col(vecCol)).as("coarsev"))
    val vecs = df.select(col(idCol).as("__id"), quantize(col(vecCol)).as("v"))
    val wc = Window.partitionBy(col("__id"))
      .orderBy(col("c_sim").desc, col("coarse_id"))
    val vAsn = vecs.crossJoin(broadcast(coarse))
      .withColumn("c_sim", cosineQuantized(col("v"), col("coarsev")))
      .withColumn("crk", row_number().over(wc))
      .filter(col("crk") === 1)
      .select(col("coarse_id"), col("__id"), col("v"))
    val fine = vAsn.filter(col("__id") % fineMod === 0)
      .select(col("coarse_id"), col("__id").as("centroid_id"),
        col("v").as("centv"))
    val wf = Window.partitionBy(col("__id"))
      .orderBy(col("f_sim").desc, col("centroid_id"))
    val asn = vAsn.join(fine, Seq("coarse_id"))
      .withColumn("f_sim", cosineQuantized(col("v"), col("centv")))
      .withColumn("frk", row_number().over(wf))
      .filter(col("frk") === 1)
      .select(col("centroid_id"), col("__id"), col("v"))
    val a = asn.select(col("centroid_id"), col("__id").as("id_a"),
      col("v").as("v_a"))
    val b = asn.select(col("centroid_id"), col("__id").as("id_b"),
      col("v").as("v_b"))
    a.join(b, Seq("centroid_id"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos_sim", cosineQuantized(col("v_a"), col("v_b")))
      .filter(col("cos_sim") >= threshold)
      .groupBy(col("centroid_id"), col("id_b"))
      .agg(count(lit(1)).as("n_dups"),
        round(max(col("cos_sim")), 6).as("max_sim"))
      .select(col("id_b").as("vec_id"), col("centroid_id"),
        col("n_dups"), col("max_sim"))
  }

  /** Hard-negative mining for embedding-model training: for each anchor
    * vector, the single nearest vector carrying a DIFFERENT label — the
    * contrastive pair a triplet/InfoNCE trainer wants. Exhaustive
    * cross-label search is all-pairs; this blocks candidates by IVF cell
    * (the deterministic id-modulo centroid convention [[semDedup]] and
    * [[ivfTopK]] use — a trained [[kmeansCentroids]] codebook drops in),
    * so the pair work is within-cell only, ~1/k of the corpus per anchor
    * at any scale. Anchors whose cell holds no other-label vector emit
    * nothing (miss rate falls as nProbe rises; 1-probe here).
    *
    * Exactness: distances are exact long L2² over 1e-3-quantized vectors;
    * per-anchor argmin tie-breaks on candidate id.
    */
  def hardNegatives(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      centroidMod: Int = 100): DataFrame = {
    val cents = df.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("centroid_id"), quantize(col(vecCol)).as("centv"))
    val vecs = df.select(col(idCol).as("__id"),
      col(labelCol).cast("long").as("__label"),
      quantize(col(vecCol)).as("__v"))
    val w = Window.partitionBy(col("__id"))
      .orderBy(col("__cd2"), col("centroid_id"))
    val asn = vecs.crossJoin(broadcast(cents))
      .withColumn("__cd2", l2Sq(col("__v"), col("centv")))
      .withColumn("__crk", row_number().over(w))
      .filter(col("__crk") === 1)
      .select(col("centroid_id"), col("__id"), col("__label"), col("__v"))
    val cand = asn.select(col("centroid_id"), col("__id").as("neg_id"),
      col("__label").as("neg_label"), col("__v").as("neg_v"))
    asn.join(cand, Seq("centroid_id"))
      .filter(col("__label") =!= col("neg_label"))
      .withColumn("__d2", l2Sq(col("__v"), col("neg_v")))
      .groupBy(col("__id"), col("__label"))
      .agg(min(struct(col("__d2"), col("neg_id"), col("neg_label")))
        .as("__best"))
      .select(col("__id").as(idCol), col("__label").as("label"),
        col("__best").getField("neg_id").as("neg_id"),
        col("__best").getField("neg_label").as("neg_label"),
        col("__best").getField("__d2").as("d2"))
  }

  /** Nearest-centroid classification eval: build one centroid per LABEL
    * (the Rocchio classifier / "prototype" eval every embedding-model
    * pipeline runs), assign each vector to its nearest class centroid, and
    * emit the confusion matrix (true label × predicted label × count) — the
    * embedding-space analog of [[graft.metrics.Metrics.confusionMetrics]].
    *
    * Exactness (the kmeans_assign discipline): vectors quantize to 1e-3
    * longs; each centroid component is floor(1024·Σx / n) — an integer both
    * engines compute identically while 1024·Σx stays within double's exact
    * integer range and the division ulp stays under the 1/n floor-safety
    * gap: with |q| ≤ ~2^10 that holds to class sizes ~2^32. Beyond that
    * (trillion-row classes) compute the centroid in two exact integer
    * terms, m = 1024·(Σx div n) + (1024·(Σx mod n)) div n — noted, not
    * needed at tested SFs. The argmin then compares exact long distances,
    * tie-broken on label.
    *
    * Plan: one posexplode + hash-agg for the centroids (rows = labels ×
    * dim, broadcast back), one codegen L2² projection per (vector, label),
    * one min-struct hash-agg keyed on the vector, one tiny confusion agg.
    * No window, no pair join — linear at 100 TB.
    */
  def nearestCentroidConfusion(
      df: DataFrame, idCol: String, vecCol: String,
      labelCol: String): DataFrame = {
    val vecs = df.select(col(idCol).as("__id"),
      col(labelCol).cast("long").as("__label"),
      quantize(col(vecCol)).as("__v"))
    val cents = vecs
      .select(col("__label").as("clabel"),
        posexplode(col("__v")).as(Seq("pos", "x")))
      .groupBy(col("clabel"), col("pos"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("n"))
      .withColumn("m",
        floor((col("sx") * lit(1024L)).cast("double") / col("n")).cast("long"))
      .groupBy(col("clabel"))
      .agg(array_sort(collect_list(struct(col("pos"), col("m")))).as("__pairs"))
      .select(col("clabel"),
        transform(col("__pairs"), p => p.getField("m")).as("centv"))
    val scaled = vecs.withColumn("__sv",
      transform(col("__v"), x => x * lit(1024L)))
    scaled.crossJoin(broadcast(cents))
      .withColumn("__d2", l2Sq(col("__sv"), col("centv")))
      .groupBy(col("__id"), col("__label"))
      .agg(min(struct(col("__d2"), col("clabel"))).as("__best"))
      .select(col("__label").as("label"),
        col("__best").getField("clabel").as("pred_label"))
      .groupBy(col("label"), col("pred_label"))
      .agg(count(lit(1)).as("n"))
  }

  /** 1-bit binary quantization: the sign bit of each of ≤64 dimensions,
    * packed into TWO 32-bit halves (`sig_lo` dims 1-32, `sig_hi` dims
    * 33-64). Two words, not one, so no value ever touches a BIGINT sign
    * bit — `1 << 63` wraps negative in any engine and every downstream
    * comparison would have to reason about it.
    *
    * Shape: posexplode → codegen'd shift/case projection → one hash-agg on
    * the id (the repo's explode-over-interpreted-HOF rule). A 64-dim float
    * vector compresses 32:1 into 8 bytes — at 100 TB the Hamming scan
    * reads 2 longs/row instead of 256 bytes/row, which is the entire point
    * of BQ shortlisting.
    */
  def binarySignatures(
      df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      // dims beyond 64 are ignored, not aliased: shiftleft masks the shift
      // amount mod 64, so an unguarded __p >= 64 would silently fold into
      // sig_hi and diverge from any reader of the first 64 dims
      .filter(col("__p") < 64)
      .groupBy(col(idCol))
      .agg(
        sum(when(col("__x") > 0 && col("__p") < 32,
          expr("shiftleft(CAST(1 AS BIGINT), __p)")).otherwise(0L))
          .as("sig_lo"),
        sum(when(col("__x") > 0 && col("__p") >= 32,
          expr("shiftleft(CAST(1 AS BIGINT), __p - 32)")).otherwise(0L))
          .as("sig_hi"))

  /** Binary-quantized top-k: Hamming-distance shortlist over the packed
    * sign bits, then an exact rerank of the shortlist only — the
    * two-stage shape production BQ indexes use (Hamming approximates
    * angle; the rerank restores exact order where it matters).
    *
    * Scale: stage 1 is the broadcast-queries scan over 8-byte signatures
    * (per-query top-`shortlist` via window); stage 2 joins the tiny
    * shortlist back to full vectors — per query its cost is
    * `shortlist`, independent of corpus size.
    */
  def bqTopK(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      shortlist: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cs = binarySignatures(candidates, idCol, vecCol)
      .withColumnRenamed(idCol, "cand_id")
    val qs = binarySignatures(queries, idCol, vecCol)
      .select(col(idCol).as("query_id"),
        col("sig_lo").as("q_lo"), col("sig_hi").as("q_hi"))
    val ham = cs.crossJoin(broadcast(qs))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("hamming",
        (bit_count(col("sig_lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("sig_hi").bitwiseXOR(col("q_hi")))).cast("long"))
    val w1 = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming"), col("cand_id"))
    val short = ham.withColumn("hrk", row_number().over(w1))
      .filter(col("hrk") <= shortlist)
      .select("query_id", "cand_id", "hamming")
    val cv = candidates.select(col(idCol).as("cand_id"),
      quantize(col(vecCol)).as("cv"))
    val qv = queries.select(col(idCol).as("query_id"),
      quantize(col(vecCol)).as("qv"))
    val w2 = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("cand_id"))
    short.join(cv, Seq("cand_id")).join(broadcast(qv), Seq("query_id"))
      .withColumn("cos_sim", cosineQuantized(col("qv"), col("cv")))
      .withColumn("rk", row_number().over(w2))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk"), col("hamming"),
        round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** Retrieval-quality evaluation: recall@k of an approximate top-k result
    * against the exact top-k ground truth (per query). THE gate before
    * shipping an ANN index config — IVF probe counts / LSH band widths are
    * tuned against exactly this number on a held-out query sample.
    *
    * Both inputs are (query_id, cand_id, ...) top-k tables (e.g.
    * [[bruteForceTopK]] and [[ivfTopK]]). Queries the approximate index
    * returns nothing for (empty probe cell) still appear, with recall 0.
    *
    * Scale: ground truth is only computed over a query SAMPLE (k·|Q| rows
    * per side), so the joins here are trivially small; the expensive part
    * is producing `exact`, which is the caller's sampled brute-force pass.
    */
  /** Greedy farthest-first k-center selection (Gonzalez 1985) — the
    * diversity-maximizing counterpart of [[semDedup]]: instead of dropping
    * near-duplicates, PICK the `k` most mutually-spread vectors (coreset /
    * prompt-diversity selection for curation pipelines). 2-approximation of
    * the optimal k-center radius.
    *
    * Fully deterministic and oracle-replayable: distances are exact-integer
    * squared L2 over [[quantize]]d components (the codegen
    * [[VectorExprs.l2Sq]] kernel), the seed is the max-squared-norm vector,
    * and every argmax tie-breaks on ascending id.
    *
    * Execution shape: k passes over the corpus. Each round broadcasts ONE
    * new 64-long center (a scalar literal in the plan), updates the running
    * min-distance column with `least`, and takes a 1-row TakeOrdered — the
    * per-round driver traffic is one (id, vec) row, the data plane never
    * collects. At 100 TB: k linear scans with map-only work between them —
    * persist the quantized projection once and each scan reads columnar
    * cache; no shuffle at all outside the 1-row top-k.
    *
    * Output: one row per round — (sel_round, id, obj) where obj is the
    * squared norm for round 1 (the seed criterion) and the chosen point's
    * min squared distance to the already-selected set after round 1 (the
    * k-center coverage radius at that step — non-increasing in r).
    */
  def kcenterSelect(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 8): DataFrame = {
    require(k >= 1, s"k-center needs k >= 1, got $k")
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel
    val qv = df.select(col(idCol).cast("long").as("__id"),
        quantize(col(vecCol)).as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def lits(c: Array[Long]): Column =
      typedLit(c.toSeq)
    try {
      // fewer points than rounds → select everything and stop (the
      // 1-row TakeOrdered returns empty once the pool is exhausted)
      val seed = qv
        .withColumn("__obj", dotLong(col("__v"), col("__v")))
        .orderBy(col("__obj").desc, col("__id"))
        .select(col("__id"), col("__v"), col("__obj"))
        .limit(1).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          "kcenterSelect on an empty input"))
      var picked = List((1, seed.getLong(0), seed.getLong(2)))
      var center = seed.getSeq[Long](1).toArray
      // running frame: survivors with min distance to the selected set
      var d = qv.filter(col("__id") =!= seed.getLong(0))
        .withColumn("__dm", l2Sq(col("__v"), lits(center)))
      var r = 2
      var exhausted = false
      while (r <= k && !exhausted) {
        d.orderBy(col("__dm").desc, col("__id"))
          .limit(1).collect().headOption match {
          case None => exhausted = true
          case Some(next) =>
            picked ::= ((r, next.getLong(0), next.getLong(2)))
            center = next.getSeq[Long](1).toArray
            d = d.filter(col("__id") =!= next.getLong(0))
              .withColumn("__dm",
                least(col("__dm"), l2Sq(col("__v"), lits(center))))
            // every round adds a filter + least() to the lineage: at
            // k ≈ 256 the un-truncated plan tree is O(k) deep and Catalyst
            // analysis cost compounds per round. A periodic eager
            // localCheckpoint pins the survivor frame (rows only shrink,
            // and __dm is 8 bytes) and resets the plan to a leaf.
            if ((r - 1) % 16 == 0) d = d.localCheckpoint(true)
            r += 1
        }
      }
      import spark.implicits._
      picked.reverse.toDF("sel_round", "sel_id", "obj")
    } finally qv.unpersist()
  }

  /** Maximal Marginal Relevance (Carbonell & Goldstein, SIGIR '98) diverse
    * retrieval: greedily pick `k` items trading RELEVANCE to a query
    * against REDUNDANCY with the already-picked set — the RAG context
    * packer's "don't hand the model five copies of the same passage" step,
    * and the relevance-aware sibling of [[kcenterSelect]] (which ignores
    * the query entirely).
    *
    * Deterministic exact-integer form: relevance is −L2² to the query
    * vector and redundancy is −min L2² to the selected set (both exact
    * longs over [[quantize]]d components), so the λ = 1/2 marginal score
    * scaled ×2 is `min_sel_d2 − d2_query` — an exact long, argmax
    * tie-broken on ascending id, replayable in SQL round for round.
    *
    * Execution shape is [[kcenterSelect]]'s: k linear map-only passes,
    * each broadcasting ONE new center literal, a 1-row TakeOrdered per
    * round, periodic localCheckpoint so the lineage stays bounded. The
    * data plane never collects.
    *
    * Output: (sel_round, sel_id, d2_query, d2_sel) — d2_sel is the chosen
    * row's min distance to the prior picks (NULL for round 1, where
    * selection is by pure relevance).
    */
  def mmrSelect(df: DataFrame, idCol: String, vecCol: String,
      queryId: Long, k: Int = 8): DataFrame = {
    require(k >= 1, s"MMR needs k >= 1, got $k")
    val spark = df.sparkSession
    import org.apache.spark.storage.StorageLevel
    val qv = df.select(col(idCol).cast("long").as("__id"),
        quantize(col(vecCol)).as("__v"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    def lits(c: Array[Long]): Column = typedLit(c.toSeq)
    try {
      val qvec = qv.filter(col("__id") === queryId)
        .limit(1).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          s"mmrSelect: query id $queryId not present"))
        .getSeq[Long](1).toArray
      val cands = qv.filter(col("__id") =!= queryId)
        .withColumn("__dq", l2Sq(col("__v"), lits(qvec)))
      val seed = cands
        .orderBy(col("__dq"), col("__id"))
        .select(col("__id"), col("__v"), col("__dq"))
        .limit(1).collect().headOption
        .getOrElse(throw new IllegalArgumentException(
          "mmrSelect: no candidates besides the query"))
      var picked =
        List((1, seed.getLong(0), seed.getLong(2), Option.empty[Long]))
      var center = seed.getSeq[Long](1).toArray
      var d = cands.filter(col("__id") =!= seed.getLong(0))
        .withColumn("__dm", l2Sq(col("__v"), lits(center)))
      var r = 2
      var exhausted = false
      while (r <= k && !exhausted) {
        d.orderBy((col("__dm") - col("__dq")).desc, col("__id"))
          .select(col("__id"), col("__v"), col("__dq"), col("__dm"))
          .limit(1).collect().headOption match {
          case None => exhausted = true
          case Some(next) =>
            picked ::= ((r, next.getLong(0), next.getLong(2),
              Some(next.getLong(3))))
            center = next.getSeq[Long](1).toArray
            d = d.filter(col("__id") =!= next.getLong(0))
              .withColumn("__dm",
                least(col("__dm"), l2Sq(col("__v"), lits(center))))
            if ((r - 1) % 16 == 0) d = d.localCheckpoint(true)
            r += 1
        }
      }
      import spark.implicits._
      picked.reverse.toDF("sel_round", "sel_id", "d2_query", "d2_sel")
    } finally qv.unpersist()
  }

  /** Mutual-kNN clustering — graph-based semantic grouping for corpus
    * topic discovery: keep only RECIPROCATED kNN edges (a in b's top-k
    * AND b in a's top-k — the standard noise filter: an outlier pointing
    * into a dense cluster is not absorbed unless the cluster points
    * back), then clusters = connected components of the mutual graph.
    * Emits (id, cluster_rep, cluster_size).
    *
    * Takes the directed kNN table (query_id, cand_id) as INPUT so the
    * caller picks the generator for the scale at hand — [[bruteForceTopK]]
    * at notebook scale, [[ivfTopK]]/[[bqTopK]] at corpus scale; the
    * clustering itself never touches vectors. Mutualization is one
    * self-join on the k·N-row edge list keyed by both endpoints;
    * components run on the star-contraction CC. (Tried and rejected:
    * label propagation — a mutual 3-NN graph is NOT tiny-diameter, one
    * sf0.01 component chained 425 nodes long and propagation burned 3+
    * more rounds than contraction even with pointer jumping; that
    * experiment also surfaced duplicateClusters' silent iteration-cap
    * exit, now a loud throw.)
    */
  def mutualKnnClusters(
      nodes: DataFrame,
      knn: DataFrame,
      idCol: String): DataFrame = {
    val e = knn.select(col("query_id").as("id_a"),
      col("cand_id").as("id_b"))
    val mutual = e
      .join(e.select(col("id_b").as("id_a"), col("id_a").as("id_b")),
        Seq("id_a", "id_b"))
      .filter(col("id_a") < col("id_b"))
    val cc = Dedup.connectedComponentsStar(nodes, mutual, idCol)
    val sizes = cc.groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("cluster_size"))
    cc.join(sizes, Seq("cluster_rep"))
      .select(col(idCol), col("cluster_rep"), col("cluster_size"))
  }

  /** Embedding-space drift between two corpus sides (old vs new snapshot,
    * model A vs model B): per dimension, exact quantized sums and counts
    * for each side, the side means, and the mean shift — the ML-ops panel
    * that localizes WHERE in the embedding space two corpora diverge
    * (complementing [[graft.metrics.Metrics.ksDrift]], which scores one
    * scalar distribution, and semDedup, which acts on individual pairs).
    *
    * Determinism: sums are exact longs over the ×1000-quantized values
    * (the repo's vector convention); means and shift are single rounded
    * divisions of exact integers. One explode → one (dim) hash-aggregate
    * with map-side partials; d output rows at any corpus size.
    */
  def embeddingDrift(
      df: DataFrame,
      vecCol: String,
      sideCol: String): DataFrame =
    embeddingDriftFromMoments(embeddingDriftMoments(df, vecCol, sideCol))

  /** The associative half of [[embeddingDrift]] — per-dimension exact
    * conditional counts and quantized sums. A stateless explode feeding
    * one hash-aggregate: batch aggregate = legal Complete-mode streaming
    * state (the welch/proportion moments split), so the streaming twin
    * drains this d-row table and shares the batch oracle verbatim.
    */
  def embeddingDriftMoments(
      df: DataFrame,
      vecCol: String,
      sideCol: String): DataFrame = {
    val q = df.select(col(sideCol).cast("boolean").as("__s"),
      posexplode(quantize(col(vecCol))).as(Seq("__p", "__q")))
    q.groupBy((col("__p") + 1).as("dim"))
      .agg(
        sum(when(col("__s"), 0L).otherwise(1L)).as("n_a"),
        sum(when(col("__s"), 1L).otherwise(0L)).as("n_b"),
        sum(when(!col("__s"), col("__q")).otherwise(0L)).as("sum_a_q"),
        sum(when(col("__s"), col("__q")).otherwise(0L)).as("sum_b_q"))
  }

  /** Means and shift over a drained [[embeddingDriftMoments]] table —
    * single rounded divisions of exact integers.
    */
  def embeddingDriftFromMoments(g: DataFrame): DataFrame =
    g.select(col("dim").cast("long").as("dim"), col("n_a"), col("n_b"),
        col("sum_a_q"), col("sum_b_q"),
        round(col("sum_a_q").cast("double") / col("n_a"), 6).as("mean_a_q"),
        round(col("sum_b_q").cast("double") / col("n_b"), 6).as("mean_b_q"),
        round(col("sum_b_q").cast("double") / col("n_b") -
          col("sum_a_q").cast("double") / col("n_a"), 6).as("shift_q"))

  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame = {
    val hits = approx.select(col("query_id"), col("cand_id"))
      .join(exact.select(col("query_id"), col("cand_id"))
        .withColumn("__hit", lit(1L)),
        Seq("query_id", "cand_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_approx"),
        sum(coalesce(col("__hit"), lit(0L))).as("n_hit"))
    // denominator = min(k, per-query ground-truth size): a query with
    // fewer than k exact neighbors can still reach recall 1.0 when the
    // approximate result returns all of them
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("__n_exact"))
      .join(hits, Seq("query_id"), "left_outer")
      .select(col("query_id"),
        coalesce(col("n_approx"), lit(0L)).as("n_approx"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"),
        round(coalesce(col("n_hit"), lit(0L)).cast("double") /
          least(lit(k.toLong), col("__n_exact")), 6)
          .as("recall"))
  }

  /** Matryoshka truncation sweep: recall@k of top-k retrieval over the
    * FIRST `d` embedding components against full-dimension ground truth,
    * for each `d` in `dims` — the "how many dims can we drop?" curve that
    * decides index cost at serving time (MRL embeddings are trained so
    * prefixes stay usable; this measures whether yours are).
    *
    * Per dim: one brute-force quantized-cosine top-k over the sliced
    * vectors (same broadcast-queries shape as [[bruteForceTopK]], scored
    * mass ∝ dims × corpus), joined to the full-dim top-k; per-query hit
    * counts integerize to micro-units ((hits·1e6) div k) so the per-dim
    * macro mean is an associative long sum + one floor division —
    * engine-replayable exactly (same discipline as
    * [[graft.metrics.Metrics.rankingMetrics]]).
    */
  def matryoshkaRecall(
      queries: DataFrame,
      candidates: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Seq[Int],
      k: Int): DataFrame = {
    def sliced(df: DataFrame, d: Int): DataFrame =
      df.select(col(idCol), slice(col(vecCol), 1, d).as(vecCol))
    val exact = bruteForceTopK(queries, candidates, idCol, vecCol, k)
      .select(col("query_id"), col("cand_id")).localCheckpoint(true)
    dims.map { d =>
      val approx = bruteForceTopK(
        sliced(queries, d), sliced(candidates, d), idCol, vecCol, k)
      val perq = approx.select(col("query_id"), col("cand_id"))
        .join(exact.withColumn("__hit", lit(1L)),
          Seq("query_id", "cand_id"), "left_outer")
        .groupBy(col("query_id"))
        .agg(expr(s"(sum(coalesce(__hit, 0)) * 1000000) div $k")
          .as("__rm"))
      perq.agg(
          count(lit(1L)).as("n_queries"),
          round(expr("sum(__rm) div count(1)").cast("double") / 1e6, 6)
            .as(s"recall_at_$k"))
        .select(lit(d.toLong).as("dim"), col("n_queries"),
          col(s"recall_at_$k"))
    }.reduce(_ unionByName _)
  }

  /** Truncated rank-biased overlap (Webber et al., TOIS 2010) between
    * two per-query rankings — the index-quality metric [[recallAtK]]
    * cannot see: recall@k treats the top-k as a SET; RBO weights
    * agreement by depth (p^(d−1)), so an index that returns the right
    * ten neighbors in the wrong order scores below one that nails the
    * head. The standard "is the ANN index good where it matters" number.
    *
    * Definition (truncated, normalized): with A_d = |S_d ∩ T_d| / d the
    * agreement at depth d, rbo = Σ_{d≤k} p^(d−1)·A_d / Σ_{d≤k} p^(d−1) —
    * 1.0 for identical prefixes, 0.0 for disjoint lists. An item common
    * to both lists with ranks (ra, rb) enters every intersection from
    * depth max(ra, rb), so the numerator folds per item with NO per-depth
    * set materialization. Per-term doubles cast to DECIMAL(38,12) and
    * summed exactly (the assocPanel discipline — a 1-ulp pow difference
    * dies at the 12th decimal, and partial-agg order cannot move the
    * result); the weight-mass denominator folds from a literal scaffold
    * through the same cast, never a driver-side float constant.
    *
    * Inputs are ranking relations (query_id, cand_id, rk) — the
    * [[bruteForceTopK]] / [[ivfTopK]] shape.
    *
    * @return per query: (query_id, n_common, rbo — round 6; queries with
    *         no common item emit 0.0)
    */
  def rankBiasedOverlap(
      exact: DataFrame,
      approx: DataFrame,
      k: Int,
      p: Double = 0.9): DataFrame = {
    require(k >= 1, s"bad depth $k")
    require(p > 0.0 && p < 1.0, s"bad persistence $p")
    val a = exact.filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk").as("__ra"))
    val b = approx.filter(col("rk") <= k)
      .select(col("query_id"), col("cand_id"), col("rk").as("__rb"))
    val num = a.join(b, Seq("query_id", "cand_id"))
      .withColumn("__m",
        greatest(col("__ra"), col("__rb")).cast("int"))
      .withColumn("__d", explode(sequence(col("__m"), lit(k))))
      .groupBy(col("query_id"))
      .agg(count_distinct(col("cand_id")).as("n_common"),
        sum((pow(lit(p), col("__d") - 1) / col("__d"))
          .cast("decimal(38,12)")).as("__num"))
    val den = exact.sparkSession.range(1)
      .select(explode(sequence(lit(1), lit(k))).as("__d"))
      .agg(sum(pow(lit(p), col("__d") - 1).cast("decimal(38,12)"))
        .as("__den"))
    exact.select(col("query_id")).distinct()
      .join(num, Seq("query_id"), "left")
      .crossJoin(broadcast(den))
      .select(col("query_id"),
        coalesce(col("n_common"), lit(0L)).as("n_common"),
        round(coalesce(col("__num"),
          lit(0).cast("decimal(38,12)")).cast("double") /
          col("__den").cast("double"), 6).as("rbo"))
  }

  /** Density-based clustering (DBSCAN, Ester 1996) over embedding cosine
    * similarity — the clustering the k-means family cannot do: cluster
    * count emerges from density, irregular shapes survive, and sparse
    * points become NOISE instead of polluting a nearest centroid. The
    * corpus-curation read: dense semantic regions = topical cores worth
    * stratifying over; noise = the outliers a coverage-preserving
    * selection must not drop blindly.
    *
    * DECLARED semantics (the [[cosineNearDupPairs]] convention): the
    * ε-neighborhood graph is restricted to sign-LSH block candidates —
    * same `signDims`-bit block, exact integer-quantized cosine ≥ eps —
    * and the oracle replicates that blocking exactly. A point is CORE
    * iff it has ≥ minPts such neighbors (self excluded); clusters are
    * connected components over core–core edges (labels = min member id
    * via [[graft.scale.Dedup.duplicateClusters]]); a BORDER point is a
    * non-core with ≥1 core neighbor, assigned its min core-neighbor
    * cluster (ties deterministic); everything else is noise and absent
    * from the output.
    *
    * Scale shape: pair mass is block-bounded (never corpus²); degree is
    * one hash-agg over the pair list; the CC runs on the core–core
    * subgraph only; border assignment is one keyed join + min-agg.
    *
    * @return (id, cluster, role ∈ {core, border}) — noise omitted
    */
  def dbscanClusters(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      eps: Double,
      minPts: Int,
      signDims: Int = 8): DataFrame = {
    require(minPts >= 1, s"bad minPts $minPts")
    val pairs = cosineNearDupPairs(df, idCol, vecCol, eps, signDims)
      .select(col("id_a"), col("id_b"))
      .localCheckpoint(true) // feeds degree, the CC edges, border join
    val both = pairs
      .unionByName(pairs.select(col("id_b").as("id_a"),
        col("id_a").as("id_b")))
    val core = both.groupBy(col("id_a").as("id"))
      .agg(count(lit(1)).as("__deg"))
      .filter(col("__deg") >= minPts)
      .select(col("id"))
      .localCheckpoint(true) // feeds two edge filters + the CC node set
    // bounded control-plane guard (duplicateClusters itself runs per-round
    // driver actions): an all-noise corpus has no core set and no output
    if (core.isEmpty)
      return core.select(col("id"), col("id").as("cluster"),
        lit("core").as("role")).limit(0)
    val ccEdges = pairs
      .join(core.select(col("id").as("id_a")), Seq("id_a"))
      .join(core.select(col("id").as("id_b")), Seq("id_b"))
    val coreClusters = graft.scale.Dedup.duplicateClusters(
        core.select(col("id").as(idCol)), ccEdges, idCol)
      .select(col(idCol).as("id"), col("cluster_rep").as("cluster"))
      .localCheckpoint(true) // feeds the core output + border assignment
    val border = both
      .join(core.select(col("id").as("id_b")), Seq("id_b"))
      .join(coreClusters.select(col("id").as("id_b"), col("cluster")),
        Seq("id_b"))
      .join(core.select(col("id").as("id_a"),
        lit(1).as("__isc")), Seq("id_a"), "left")
      .filter(col("__isc").isNull)
      .groupBy(col("id_a").as("id"))
      .agg(min(col("cluster")).as("cluster"))
    coreClusters.withColumn("role", lit("core"))
      .unionByName(border.withColumn("role", lit("border")))
  }
}
