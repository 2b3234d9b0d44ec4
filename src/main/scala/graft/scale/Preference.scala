package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Preference-data fitting: Bradley-Terry strengths from pairwise
  * comparison outcomes — the core curation op for RLHF / arena-style
  * datasets, where a ranking must be FIT from (winner, loser) records
  * before any training or filtering decision can use it. Complements the
  * judge-ensemble agreement family (Fleiss/Krippendorff/B-cubed/ARI),
  * which grades raters but cannot rank the rated items.
  *
  * Reference scope: the reference engine (`/root/reference/
  * fast_ai_wrangler/`, pandas+LLM data wrangling) has no preference
  * operator; this is a scale-path extension in the judge-ensemble family.
  *
  * Algorithm: the MM (minorize-maximize) iteration of Hunter, "MM
  * algorithms for generalized Bradley-Terry models" (Annals of
  * Statistics 32(1), 2004):
  *   p_i ← W_i / Σ_j n_ij / (p_i + p_j)
  * with W_i = wins of i, n_ij = games between i and j, followed by a
  * mean-1 renormalization each round. Ties count half a win to each side
  * (the standard halved-tie convention), carried as ×2 integer counts so
  * every tally stays an exact long.
  *
  * Determinism (the repo's money rule, SURVEY §5.3): strengths are EXACT
  * long micro-units (1e6 = mean strength) and every round is integer
  * arithmetic only —
  *   tt_ij  = floor(n2_ij · 1e12 / (P_i + P_j))       (pair term)
  *   T_i    = Σ_j tt_ij                               (long sum)
  *   Praw_i = max((W2_i · 1e6) div max(T_i div 1e6, 1), 1)
  *   P_i    = max((Praw_i · 1e6) div max(S div N, 1), 1),  S = Σ Praw
  * The pair term evaluates as the exact two-step split
  *   q1 = (n2·1e6) div d;  tt = q1·1e6 + (((n2·1e6) mod d)·1e6) div d
  * (identical value to the single division — n2·1e12 = (q1·d + r1)·1e6 —
  * but the largest intermediate is n2·1e6, not n2·1e12, so the pair
  * dictionary holds up to ~4.6e12 comparisons per pair in ×2 units before
  * any long product wraps; the remainder term is bounded by d·1e6 ≤
  * 2N·1e12, fine to N ≈ 4.6e6 players). The remaining domain bound is tt
  * itself: floor(n2·1e12/d) must fit a long, which at the mean-1e6
  * normalized strength scale (d ≈ 2e6) again holds to ~1.8e13 comparisons
  * per pair — far past any arena corpus. The T div 1e6 / S div N
  * pre-divisions keep the later products under 2e18; the max(…, 1) floors
  * make zero-win players (the degenerate one-sided pair) well-defined
  * without a division by zero — they pin to the smallest positive
  * strength instead of collapsing the next round's p_i + p_j term. Associative long sums + per-row integer ops ⇒
  * bit-identical on any partitioning and replayable in any 64-bit engine
  * (the pageRankMicro unrolled-round oracle pattern, Graph.scala).
  *
  * Scale shape: ONE corpus-mass hash-aggregation collapses the match
  * stream to the (lo, hi) pair-count dictionary (≤ N² rows, N = player
  * count — arena leaderboards have N in the hundreds); the k MM rounds
  * are joins and hash-aggs over that dictionary only. No corpus join-back,
  * no window, no driver-side data-plane state.
  */
object Preference {

  private val Micro = 1000000L

  /** The one corpus-mass job shared by every preference operator: match
    * stream -> unordered-pair dictionary (lo, hi, n2, w2lo) in ×2
    * tie-halved units (w2lo = 2 per lo win + 1 per tie; n2 = 2 per
    * game). Associative counts — the Complete-mode streaming state of
    * the preference twins.
    */
  def pairCounts(
      matches: DataFrame,
      playerA: String,
      playerB: String,
      outcomeCol: String): DataFrame = {
    val lo = least(col(playerA), col(playerB))
    val hi = greatest(col(playerA), col(playerB))
    val loWin = (col(outcomeCol) === 0 && col(playerA) === lo) ||
      (col(outcomeCol) === 1 && col(playerB) === lo)
    matches
      .filter(col(playerA) =!= col(playerB))
      .select(lo.as("lo"), hi.as("hi"),
        when(col(outcomeCol) === 2, lit(1L))
          .when(loWin, lit(2L)).otherwise(lit(0L)).as("w2l"))
      .groupBy(col("lo"), col("hi"))
      .agg((count(lit(1)) * 2).as("n2"),
        sum(col("w2l")).as("w2lo"))
  }

  /** Bradley-Terry strengths in exact micro-units + an Elo-style report.
    *
    * @param matches one row per comparison: (playerA, playerB, outcome)
    *                with outcome 0 = A wins, 1 = B wins, 2 = tie.
    * @param rounds  fixed unrolled MM iteration count.
    * @return (player, games2, wins2, strength_micro, elo) — games2/wins2
    *         in ×2 tie-halved units; strength_micro the exact fitted
    *         strength (mean ≈ 1e6); elo = round(1500 + 400·log10(
    *         strength_micro/1e6), 6), the conventional 400-point-decade
    *         display scale anchored at 1500 (the only float, a rounded
    *         deterministic function of an exact long).
    */
  def bradleyTerryMicro(
      matches: DataFrame,
      playerA: String,
      playerB: String,
      outcomeCol: String,
      rounds: Int = 3): DataFrame =
    bradleyTerryFromPairs(
      pairCounts(matches, playerA, playerB, outcomeCol), rounds)

  /** The MM rounds over a drained/batch (lo, hi, n2, w2lo) dictionary —
    * bradleyTerryFromPairs ∘ pairCounts = bradleyTerryMicro by
    * construction (spec-pinned composition, the streaming-twin rule).
    */
  def bradleyTerryFromPairs(
      pairs0: DataFrame,
      rounds: Int = 3): DataFrame = mmFit(pairs0, Seq.empty, rounds)

  /** The MM rounds, optionally keyed (e.g. by a bootstrap-replicate
    * column): every join, aggregation, and the renormalization carry
    * `keys` — the empty-key case is the plain fit.
    */
  private def mmFit(
      pairs0: DataFrame,
      keys: Seq[String],
      rounds: Int): DataFrame = {
    require(rounds >= 1, "need at least one MM round")
    val k = keys.map(col)
    val pairs = pairs0.localCheckpoint(true)
    val perPlayer = pairs
      .select(k ++ Seq(col("lo").as("player"), col("n2"),
        col("w2lo").as("w2")): _*)
      .unionByName(pairs.select(k ++ Seq(col("hi").as("player"),
        col("n2"), (col("n2") - col("w2lo")).as("w2")): _*))
      .groupBy(k :+ col("player"): _*)
      .agg(sum(col("n2")).as("games2"), sum(col("w2")).as("wins2"))
      .localCheckpoint(true)

    var scores = perPlayer
      .select(k ++ Seq(col("player"), lit(Micro).as("p")): _*)
    for (_ <- 1 to rounds) {
      val tt = pairs
        .join(scores.select(k ++ Seq(col("player").as("lo"),
          col("p").as("plo")): _*), keys :+ "lo")
        .join(scores.select(k ++ Seq(col("player").as("hi"),
          col("p").as("phi")): _*), keys :+ "hi")
        // exact split of (n2·1e12) div d with max intermediate n2·1e6 —
        // see the object doc's overflow-headroom derivation
        .withColumn("tt",
          expr("((n2 * 1000000L) div (plo + phi)) * 1000000L + " +
            "(((n2 * 1000000L) % (plo + phi)) * 1000000L) div (plo + phi)"))
      val denom = tt.select(k ++ Seq(col("lo").as("player"), col("tt")): _*)
        .unionByName(tt.select(k ++ Seq(col("hi").as("player"),
          col("tt")): _*))
        .groupBy(k :+ col("player"): _*).agg(sum(col("tt")).as("t"))
      val praw = perPlayer.join(denom, keys :+ "player")
        .withColumn("praw", expr(
          "greatest((wins2 * 1000000L) div greatest(t div 1000000L, 1L), 1L)"))
      val scored =
        if (keys.isEmpty) {
          val norm = praw.agg(sum(col("praw")).as("__s"),
            count(lit(1)).as("__n"))
          praw.crossJoin(broadcast(norm))
        } else {
          val norm = praw.groupBy(k: _*).agg(sum(col("praw")).as("__s"),
            count(lit(1)).as("__n"))
          praw.join(broadcast(norm), keys)
        }
      scores = scored
        .withColumn("p", expr(
          "greatest((praw * 1000000L) div greatest(__s div __n, 1L), 1L)"))
        .select(k ++ Seq(col("player"), col("p")): _*)
        // scores is referenced TWICE by the next round (the lo and hi
        // strength joins) — without the eager cut the round-k lineage
        // re-executes 2^k times (measured 24 s → ~4 s at sf0.1). The
        // checkpointed relation is keys x players rows (dictionary).
        .localCheckpoint(true)
    }
    perPlayer.join(scores, keys :+ "player")
      .select(k ++ Seq(col("player"), col("games2"), col("wins2"),
        col("p").as("strength_micro"),
        round(lit(1500.0) +
          lit(400.0) * log(col("p").cast("double") / 1e6) / log(lit(10.0)),
          6).as("elo")): _*)
  }

  /** Bootstrapped Bradley-Terry: the point fit plus a per-player
    * standard error and envelope from `reps` Poisson(1) match-resampled
    * MM fits — the uncertainty a leaderboard needs before declaring one
    * model above another (Chatbot-Arena-style reports publish exactly
    * this CI beside the rating).
    *
    * Composition of two proven house pieces: the ONE-SCAN Poisson
    * bootstrap (Chamandy 2012 — per-match deterministic Poisson(1)
    * multiplicities from 16-bit md5-digest windows through the shared
    * [[graft.sample.Samplers.PoissonCdf16]] ladder, so any engine
    * replays every draw) feeding the keyed MM fit ([[mmFit]] with the
    * replicate as the key). The replicate explode is map-local — the
    * hash-aggregate combines to the (rep × pair) dictionary before any
    * exchange — and all `reps` fits run as ONE dictionary-scale job
    * grouped by replicate, not `reps` passes.
    *
    * Determinism: replicate strengths are the exact micro-longs of the
    * keyed fit; boot_se is the moment form over those longs (the
    * bootstrapFromSums convention, one rounded sqrt), ci_lo/ci_hi the
    * exact envelope. Players absent from a replicate (every one of
    * their matches drew multiplicity 0) simply miss that replicate —
    * n_reps reports the per-player coverage. A player absent from EVERY
    * replicate (possible only for near-zero match counts, ~0.37^reps for
    * a single-match player) keeps its point-fit row with NULL panel
    * columns — the panel join is a LEFT join, mirroring the oracle's
    * LEFT JOIN se USING (player).
    */
  def bradleyTerryBootstrap(
      matches: DataFrame,
      playerA: String,
      playerB: String,
      outcomeCol: String,
      idCol: String,
      reps: Int = 32,
      rounds: Int = 3): DataFrame = {
    require(reps >= 2 && reps <= 64, s"bad reps $reps")
    val lo = least(col(playerA), col(playerB))
    val hi = greatest(col(playerA), col(playerB))
    val loWin = (col(outcomeCol) === 0 && col(playerA) === lo) ||
      (col(outcomeCol) === 1 && col(playerB) === lo)
    val nDigests = (reps + 2) / 3
    def digestCol(c: Int): Column =
      graft.scale.HashExprs.md5PrefixLong(
        concat(col(idCol).cast("string"), lit(":c" + c)).cast("binary"), 15)
    def weight(b: Int): Column = {
      val u16 = shiftright(col(s"__h${b / 3}"), (b % 3) * 16)
        .bitwiseAND(lit(65535L))
      graft.sample.Samplers.PoissonCdf16.zipWithIndex
        .foldRight(lit(8L): Column) { case ((t, k), acc) =>
          when(u16 < t, k.toLong).otherwise(acc)
        }
    }
    // ONE corpus scan feeds both the replicate panel and the point fit
    // (the match projection with its Poisson digests is pinned once;
    // the point dictionary is a plain groupBy of the same relation — no
    // second pairCounts pass over the raw matches)
    // spread the digest projection + replicate explode across cores —
    // they'd otherwise run on the single-task corpus scan AND the
    // 1-partition checkpoint it feeds (Tables.spread rationale)
    val proj = graft.io.Tables.spread(matches
        .filter(col(playerA) =!= col(playerB)))
      .select((lo.as("lo") +: hi.as("hi") +:
        when(col(outcomeCol) === 2, lit(1L))
          .when(loWin, lit(2L)).otherwise(lit(0L)).as("w2l") +:
        (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
      .localCheckpoint(true)
    val base = proj
      .select(col("lo"), col("hi"), col("w2l"),
        posexplode(array((0 until reps).map(weight): _*))
          .as(Seq("rep", "w")))
      .filter(col("w") > 0)
    val pairsB = base.groupBy(col("rep"), col("lo"), col("hi"))
      .agg(sum(col("w") * 2).as("n2"),
        sum(col("w") * col("w2l")).as("w2lo"))
    val pairsPoint = proj.groupBy(col("lo"), col("hi"))
      .agg((count(lit(1)) * 2).as("n2"), sum(col("w2l")).as("w2lo"))
    val fits = mmFit(pairsB, Seq("rep"), rounds)
    val panel = fits.groupBy(col("player"))
      .agg(count(lit(1)).as("n_reps"),
        sum(col("strength_micro")).as("__sq"),
        sum(col("strength_micro") * col("strength_micro")).as("__sqq"),
        min(col("strength_micro")).as("ci_lo_micro"),
        max(col("strength_micro")).as("ci_hi_micro"))
      .withColumn("boot_se", when(col("n_reps") > 1, round(
        sqrt((col("n_reps") * col("__sqq") - col("__sq") * col("__sq"))
          .cast("double") /
          (col("n_reps").cast("double") * (col("n_reps") - 1)
            .cast("double"))) / 1e6, 6)))
    bradleyTerryFromPairs(pairsPoint, rounds)
      .join(panel, Seq("player"), "left")
      .select(col("player"), col("games2"), col("wins2"),
        col("strength_micro"), col("elo"), col("n_reps"), col("boot_se"),
        col("ci_lo_micro"), col("ci_hi_micro"))
  }

  /** Condorcet / Copeland head-to-head panel — the non-parametric
    * companion to [[bradleyTerryMicro]]: instead of FITTING strengths it
    * reads the pairwise majority graph directly. Per player: contested
    * head-to-heads, majority wins / ties / losses, the Copeland score
    * (wins − losses — Copeland 1951, the standard tournament ranking),
    * and whether the player is the CONDORCET WINNER (beats every
    * opponent faced by strict majority). BT can rank A over B without A
    * ever beating B (transitive mass); the Condorcet view is the sanity
    * check arena reports publish beside the fitted ladder.
    *
    * Exact integers end to end: a head-to-head is won iff
    * 2·w2lo > n2 in the ×2 tie-halved units (strict majority; the exact
    * half case is a tie). Same scale shape as the MM fit: ONE corpus
    * hash-agg to the pair dictionary, then dictionary-scale folds.
    */
  def copelandPanel(
      matches: DataFrame,
      playerA: String,
      playerB: String,
      outcomeCol: String): DataFrame =
    copelandFromPairs(pairCounts(matches, playerA, playerB, outcomeCol))

  /** The majority-graph fold over a drained/batch pair dictionary —
    * copelandFromPairs ∘ pairCounts = copelandPanel by construction.
    */
  def copelandFromPairs(pairs: DataFrame): DataFrame = {
    val sides = pairs.select(col("lo").as("player"),
        (col("w2lo") * 2 > col("n2")).cast("long").as("w"),
        (col("w2lo") * 2 === col("n2")).cast("long").as("t"))
      .unionByName(pairs.select(col("hi").as("player"),
        ((col("n2") - col("w2lo")) * 2 > col("n2")).cast("long").as("w"),
        (col("w2lo") * 2 === col("n2")).cast("long").as("t")))
    sides.groupBy(col("player"))
      .agg(count(lit(1)).as("n_opponents"),
        sum(col("w")).as("h2h_wins"), sum(col("t")).as("h2h_ties"),
        (count(lit(1)) - sum(col("w")) - sum(col("t"))).as("h2h_losses"),
        (sum(col("w")) * 2 + sum(col("t")) - count(lit(1)))
          .as("copeland"),
        (sum(col("w")) === count(lit(1))).as("is_condorcet"))
  }

  /** Plackett-Luce strengths from 3-WAY RANKINGS — the listwise
    * generalization of [[bradleyTerryMicro]] (best-of-k judgments, k-way
    * arena battles, ranked retrieval preferences). Hunter (AoS'04)'s PL
    * MM iteration:
    *   p_i ← W_i / Σ_{(race, stage): i ∈ suffix} n_race / Σ_{j ∈ suffix} p_j
    * where a length-3 ranking contributes two choice stages (winner among
    * all three, runner-up among the remaining two) and W_i counts the
    * times i was the chosen one. Same exact-integer scheme as the BT fit
    * (stage term = cnt·1e12 div suffix-sum, the floored Praw pick, the
    * mean-1e6 renormalization, per-round eager cut).
    *
    * Scale shape: ONE corpus hash-agg collapses the race stream to the
    * ordered-triple pattern dictionary (≤ N·(N−1)·(N−2) rows); rounds are
    * explode/join/agg over that dictionary only.
    */
  def plackettLuceMicro(
      races: DataFrame,
      firstCol: String,
      secondCol: String,
      thirdCol: String,
      rounds: Int = 3): DataFrame =
    plackettLuceFromCounts(
      raceCounts(races, firstCol, secondCol, thirdCol), rounds)

  /** The one corpus-mass job: race stream -> ordered-triple pattern
    * dictionary (degenerate repeated-player races dropped). Associative
    * counts — the Complete-mode streaming state of the PL twin.
    */
  def raceCounts(
      races: DataFrame,
      firstCol: String,
      secondCol: String,
      thirdCol: String): DataFrame =
    races
      .filter(col(firstCol) =!= col(secondCol) &&
        col(firstCol) =!= col(thirdCol) &&
        col(secondCol) =!= col(thirdCol))
      .select(col(firstCol).as("f"), col(secondCol).as("s"),
        col(thirdCol).as("t3"))
      .groupBy(col("f"), col("s"), col("t3"))
      .agg(count(lit(1)).as("cnt"))

  /** The MM rounds over a drained/batch (f, s, t3, cnt) dictionary —
    * plackettLuceFromCounts ∘ raceCounts = plackettLuceMicro by
    * construction (the streaming-twin rule).
    */
  def plackettLuceFromCounts(
      rc0: DataFrame,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "need at least one MM round")
    val rc = rc0.localCheckpoint(true)
    val perPlayer = rc
      .select(col("f").as("player"), col("cnt").as("cw"),
        col("cnt").as("ca"))
      .unionByName(rc.select(col("s").as("player"), col("cnt").as("cw"),
        col("cnt").as("ca")))
      .unionByName(rc.select(col("t3").as("player"), lit(0L).as("cw"),
        col("cnt").as("ca")))
      .groupBy(col("player"))
      .agg(sum(col("ca")).as("n_races"), sum(col("cw")).as("n_chosen"))
      .localCheckpoint(true)
    // two choice stages per pattern; suffix members derived from the keys
    val stages = rc.select(col("f"), col("s"), col("t3"), col("cnt"),
        explode(array(lit(0), lit(1))).as("stage"))
    val memberExpr =
      "CASE WHEN stage = 0 THEN array(f, s, t3) ELSE array(s, t3) END"
    var scores = perPlayer.select(col("player"), lit(Micro).as("p"))
    for (_ <- 1 to rounds) {
      val denom = stages
        .withColumn("m", explode(expr(memberExpr)))
        .join(scores.select(col("player").as("m"), col("p")), Seq("m"))
        .groupBy(col("f"), col("s"), col("t3"), col("cnt"), col("stage"))
        .agg(sum(col("p")).as("ssum"))
        // same overflow-safe split as the BT pair term (max intermediate
        // cnt·1e6 / ssum·1e6 instead of cnt·1e12)
        .withColumn("term",
          expr("((cnt * 1000000L) div ssum) * 1000000L + " +
            "(((cnt * 1000000L) % ssum) * 1000000L) div ssum"))
      val t = denom
        .withColumn("player", explode(expr(memberExpr)))
        .groupBy(col("player")).agg(sum(col("term")).as("t"))
      val praw = perPlayer.join(t, Seq("player"))
        .withColumn("praw", expr(
          "greatest((n_chosen * 1000000L) div " +
            "greatest(t div 1000000L, 1L), 1L)"))
      val norm = praw.agg(sum(col("praw")).as("__s"),
        count(lit(1)).as("__n"))
      scores = praw.crossJoin(broadcast(norm))
        .withColumn("p", expr(
          "greatest((praw * 1000000L) div greatest(__s div __n, 1L), 1L)"))
        .select(col("player"), col("p"))
        .localCheckpoint(true) // the BT per-round lineage cut
    }
    perPlayer.join(scores, Seq("player"))
      .select(col("player"), col("n_races"), col("n_chosen"),
        col("p").as("strength_micro"),
        round(lit(1500.0) +
          lit(400.0) * log(col("p").cast("double") / 1e6) / log(lit(10.0)),
          6).as("elo"))
  }

  /** Rank Centrality — the SPECTRAL preference fit (Negahban, Oh & Shah,
    * "Iterative Ranking from Pair-wise Comparisons", NIPS'12 / Operations
    * Research '17): scores are the stationary distribution of a random
    * walk on the comparison graph that moves from player i to player j
    * with probability proportional to the FRACTION of their games j won.
    * The robustness companion the MM ladder needs: BT's likelihood
    * weights pairs by GAME COUNT, so a heavily-replayed pair dominates a
    * sparse one; the walk normalizes each pair to its win fraction and
    * each player by the max degree, so on intransitive data it degrades
    * to honest flatness instead of count-driven false order (the spec
    * plants exactly that cycle).
    *
    * Chain (tie-halved ×2 units, dmax = max opponents per player):
    *   P(i→j) = f_ji / dmax,  f_ji = w2_j / n2_ij  (share j won)
    *   P(i→i) = 1 − Σ_j P(i→j)   (lazy self-loop — rows sum to 1)
    * Exact micro-longs, the [[graft.scale.Graph.pageRankMicro]] scheme:
    * p_micro(i→j) = (w2_j·1e6) div (n2·dmax) (dividend ≤ n2·1e6 — the MM
    * pair-term headroom; divisor n2·dmax needs n2·N < 9.2e18, fine to
    * thousands of players at trillions of games), π₀ = 1e6 per player,
    *   π'(i) = (π(i)·resid_i) div 1e6 + Σ_j (π(j)·p_micro(j→i)) div 1e6
    * unrolled `rounds` times — associative long sums, bit-identical on
    * any partitioning, mechanically replayable (unrolled-round oracle).
    *
    * Scale shape: ONE corpus hash-agg to the pair dictionary (the
    * [[pairCounts]] job every preference op shares); rounds are keyed
    * joins + hash-aggs over the ≤ 2·N² edge dictionary only.
    */
  def rankCentralityMicro(
      matches: DataFrame,
      playerA: String,
      playerB: String,
      outcomeCol: String,
      rounds: Int = 3): DataFrame =
    rankCentralityFromPairs(
      pairCounts(matches, playerA, playerB, outcomeCol), rounds)

  /** The walk over a drained/batch pair dictionary —
    * rankCentralityFromPairs ∘ pairCounts = rankCentralityMicro by
    * construction (the streaming-twin rule).
    */
  def rankCentralityFromPairs(
      pairs0: DataFrame,
      rounds: Int = 3): DataFrame = {
    require(rounds >= 1, "need at least one walk round")
    val pairs = pairs0.localCheckpoint(true)
    // ordered edges: src pays mass to dst at dst's win share of the pair
    val edges0 = pairs.select(col("lo").as("src"), col("hi").as("dst"),
        (col("n2") - col("w2lo")).as("w2"), col("n2"))
      .unionByName(pairs.select(col("hi").as("src"), col("lo").as("dst"),
        col("w2lo").as("w2"), col("n2")))
    val deg = edges0.groupBy(col("src").as("player"))
      .agg(count(lit(1)).as("n_opponents"))
      .localCheckpoint(true)
    val dmax = deg.agg(max(col("n_opponents")).as("__dmax"))
    val edges = edges0.crossJoin(broadcast(dmax))
      .withColumn("p_micro", expr("(w2 * 1000000L) div (n2 * __dmax)"))
      .select(col("src"), col("dst"), col("p_micro"))
      .localCheckpoint(true)
    val resid = edges.groupBy(col("src").as("player"))
      .agg((lit(Micro) - sum(col("p_micro"))).as("resid"))
      .localCheckpoint(true)
    var pi = deg.select(col("player"), lit(Micro).as("pi"))
    for (_ <- 1 to rounds) {
      val inflow = edges
        .join(pi.select(col("player").as("src"), col("pi")), Seq("src"))
        .withColumn("c", expr("(pi * p_micro) div 1000000L"))
        .groupBy(col("dst").as("player")).agg(sum(col("c")).as("inflow"))
      pi = pi.join(resid, Seq("player"))
        .join(inflow, Seq("player"), "left")
        .select(col("player"),
          (expr("(pi * resid) div 1000000L") +
            coalesce(col("inflow"), lit(0L))).as("pi"))
        .localCheckpoint(true) // pi feeds BOTH next-round joins
    }
    deg.join(pi, Seq("player"))
      .select(col("player"), col("n_opponents"), col("pi").as("pi_micro"))
  }

  /** Majority-graph TRANSITIVITY diagnostic — the triad census behind
    * "is there even a consistent ranking to fit?": among triples whose
    * three pairwise head-to-heads are all DECIDED (strict majority, no
    * tie), count the cyclic ones (rock-paper-scissors triads; Kendall &
    * Babington Smith 1940's inconsistency count). A high cyclic rate
    * means neither BT nor Copeland can honestly linearize the data — the
    * report every arena leaderboard should run before publishing one.
    *
    * Exact integers: majority edges from the ×2 tie-halved pair
    * dictionary; a directed 3-cycle a→b→c→a is counted once at its
    * minimum vertex (a < b, a < c filters the two rotations); resolved
    * triads join the undirected decided-pair relation (i < j < k by
    * construction of (lo, hi) keys). Everything after the one corpus
    * hash-agg is a dictionary³-bounded self-join — the declared
    * leaderboard-scale precondition (players in the hundreds), same
    * class as the Kendall-tau contingency self-join.
    *
    * @return one row: (n_players, n_decided_pairs, n_resolved_triads,
    *         n_cyclic_triads, cyclic_rate) — rate NULL when no triad is
    *         resolved.
    */
  def majorityCycles(
      matches: DataFrame,
      playerA: String,
      playerB: String,
      outcomeCol: String): DataFrame = {
    val pairs = pairCounts(matches, playerA, playerB, outcomeCol)
      .localCheckpoint(true)
    val dec = pairs.filter(col("w2lo") * 2 =!= col("n2"))
      .select(col("lo"), col("hi"),
        when(col("w2lo") * 2 > col("n2"), col("lo")).otherwise(col("hi"))
          .as("w_src"))
      .localCheckpoint(true)
    val e = dec.select(col("w_src").as("src"),
      when(col("w_src") === col("lo"), col("hi")).otherwise(col("lo"))
        .as("dst"))
    val cyc = e.select(col("src").as("a"), col("dst").as("b"))
      .join(e.select(col("src").as("b"), col("dst").as("c")), Seq("b"))
      .join(e.select(col("src").as("c"), col("dst").as("a")),
        Seq("c", "a"))
      .filter(col("a") < col("b") && col("a") < col("c"))
      .agg(count(lit(1)).as("n_cyclic"))
    val und = dec.select(col("lo"), col("hi"))
    val resolved = und.select(col("lo").as("i"), col("hi").as("j"))
      .join(und.select(col("lo").as("j"), col("hi").as("k")), Seq("j"))
      .join(und.select(col("lo").as("i"), col("hi").as("k")),
        Seq("i", "k"))
      .agg(count(lit(1)).as("n_resolved"))
    val np = pairs.select(col("lo").as("p"))
      .unionByName(pairs.select(col("hi").as("p"))).distinct()
      .agg(count(lit(1)).as("n_players"))
    val ndec = dec.agg(count(lit(1)).as("n_decided_pairs"))
    np.crossJoin(broadcast(ndec)).crossJoin(broadcast(resolved))
      .crossJoin(broadcast(cyc))
      .select(col("n_players"), col("n_decided_pairs"),
        col("n_resolved").as("n_resolved_triads"),
        col("n_cyclic").as("n_cyclic_triads"),
        when(col("n_resolved") > 0,
          round(col("n_cyclic").cast("double") /
            col("n_resolved").cast("double"), 6)).as("cyclic_rate"))
  }
}
