package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.scale.Preference

/** Bradley-Terry MM fit — hand-computed fixtures (exact integer algebra,
  * 3 rounds, micro-units).
  */
class PreferenceSpec extends SparkSpec {
  import spark.implicits._

  private def fit(ms: Seq[(Long, Long, Int)]) =
    Preference.bradleyTerryMicro(
      ms.toDF("pa", "pb", "oc"), "pa", "pb", "oc", 3)

  test("transitive triple recovers the skill order, exact micro values") {
    // 0 beats 1 x3 (+1 tie), 1 beats 2 x3, one upset: 2 beats 0 once.
    val ms = Seq.fill(3)((0L, 1L, 0)) ++ Seq.fill(3)((1L, 2L, 0)) ++
      Seq((0L, 2L, 1), (0L, 1L, 2))
    val got = fit(ms).orderBy($"player")
      .select($"player", $"games2", $"wins2", $"strength_micro")
      .collect().toSeq
    // hand-walked: ties halve (x2 units), three MM rounds with the
    // T div 1e6 / S div N pre-divisions and max(..,1) floors
    assert(got === Seq(
      Row(0L, 10L, 7L, 1666666L),
      Row(1L, 14L, 7L, 952380L),
      Row(2L, 8L, 2L, 380952L)))
  }

  test("all-tie pair fits equal strengths at the 1e6 mean") {
    val got = fit(Seq((5L, 9L, 2), (9L, 5L, 2), (5L, 9L, 2)))
      .select($"player", $"strength_micro", $"elo").collect()
    assert(got.map(_.getLong(1)).toSet === Set(1000000L))
    assert(got.map(_.getDouble(2)).toSet === Set(1500.0))
  }

  test("degenerate one-sided pair: loser floors at 1, no division blowup") {
    val got = fit(Seq.fill(4)((1L, 2L, 0))).orderBy($"player")
      .select($"player", $"wins2", $"strength_micro").collect().toSeq
    // winner takes (almost) the whole 2e6 mass; loser pinned at the
    // smallest positive strength — well-defined, never zero
    assert(got.map(_.getLong(1)) === Seq(8L, 0L))
    val Seq(w, l) = got.map(_.getLong(2)).toSeq
    assert(l >= 1L && w > 1900000L && w > l)
  }

  test("self-matches are dropped; elo is the rounded 400/decade display") {
    val ms = Seq((3L, 3L, 0), (1L, 2L, 0), (2L, 1L, 1))
    val got = fit(ms).orderBy($"player").collect().toSeq
    assert(got.map(_.getLong(0)) === Seq(1L, 2L))
    val elo = got.head.getDouble(4)
    val p = got.head.getLong(3)
    assert(math.abs(elo -
      BigDecimal(1500.0 + 400.0 * math.log10(p / 1e6))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("copelandPanel: majority graph, tie-halved wins, Condorcet flag") {
    // A beats B 2-1, B beats C 2-0, A-C split 1-1 (head-to-head tie)
    val ms = Seq((0L, 1L, 0), (0L, 1L, 0), (1L, 0L, 0),
      (1L, 2L, 0), (1L, 2L, 0), (2L, 0L, 0), (0L, 2L, 0))
    val got = Preference.copelandPanel(ms.toDF("pa", "pb", "oc"),
        "pa", "pb", "oc")
      .orderBy($"player").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getBoolean(6))).toSeq
    assert(got === Seq(
      (0L, 2L, 1L, 1L, 0L, 1L, false), // beats B, ties C
      (1L, 2L, 1L, 0L, 1L, 0L, false), // beats C, loses A
      (2L, 2L, 0L, 1L, 1L, -1L, false)))
    // a strict Condorcet winner: A majority-beats BOTH opponents — one
    // decisive win plus two ties IS a majority in x2 units (8 > 6)
    val ms2 = Seq((0L, 1L, 0), (0L, 1L, 2), (0L, 1L, 2), (0L, 2L, 0))
    val got2 = Preference.copelandPanel(ms2.toDF("pa", "pb", "oc"),
        "pa", "pb", "oc")
      .filter($"player" === 0L).collect().head
    assert(got2.getLong(2) == 2L && got2.getBoolean(6))
  }

  test("plackettLuceMicro: hand-walked 3-way fixture — two choice stages " +
      "per race, exact micro strengths; last-place-only player floors") {
    // races (first, second, third): (1,2,3) x2, (2,1,3), (3,1,2)
    val rs = Seq((1L, 2L, 3L), (1L, 2L, 3L), (2L, 1L, 3L), (3L, 1L, 2L))
    val got = Preference.plackettLuceMicro(
        rs.toDF("f", "s", "t3"), "f", "s", "t3", 3)
      .orderBy($"player").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // hand-walked 3 MM rounds (chosen counts 4/3/1 over 4 appearances)
    assert(got === Seq(
      (1L, 4L, 4L, 1800000L),
      (2L, 4L, 3L, 900000L),
      (3L, 4L, 1L, 299999L)))
    // a player who only ever finishes last never gets chosen -> floor 1
    val never = Seq((1L, 2L, 9L), (2L, 1L, 9L))
    val worst = Preference.plackettLuceMicro(
        never.toDF("f", "s", "t3"), "f", "s", "t3", 3)
      .filter($"player" === 9L).collect().head
    assert(worst.getLong(2) == 0L && worst.getLong(3) >= 1L)
    // degenerate races (repeated player) are dropped loudly-by-filter
    val withSelf = rs ++ Seq((5L, 5L, 6L))
    assert(Preference.plackettLuceMicro(withSelf.toDF("f", "s", "t3"),
      "f", "s", "t3", 3).count() == 3L)
  }

  test("majorityCycles: rock-paper-scissors triad counted once; " +
      "transitive triad is zero-cycle; a tied pair unresolves the triad") {
    def census(ms: Seq[(Long, Long, Int)]) =
      Preference.majorityCycles(ms.toDF("pa", "pb", "oc"),
        "pa", "pb", "oc").collect().head
    // A>B, B>C, C>A — the cycle
    val rps = census(Seq((1L, 2L, 0), (2L, 3L, 0), (3L, 1L, 0)))
    assert((rps.getLong(0), rps.getLong(1), rps.getLong(2),
      rps.getLong(3), rps.getDouble(4)) === ((3L, 3L, 1L, 1L, 1.0)))
    // A>B, B>C, A>C — transitive
    val tr = census(Seq((1L, 2L, 0), (2L, 3L, 0), (1L, 3L, 0)))
    assert((tr.getLong(2), tr.getLong(3), tr.getDouble(4)) ===
      ((1L, 0L, 0.0)))
    // tie on one pair -> no resolved triad, NULL rate
    val td = census(Seq((1L, 2L, 0), (2L, 3L, 0), (1L, 3L, 2)))
    assert(td.getLong(2) == 0L && td.getLong(3) == 0L && td.isNullAt(4))
  }

  test("bradleyTerryBootstrap: point columns equal the plain fit; " +
      "envelope brackets are ordered; deterministic under repartition") {
    val ms = (0 until 120).map { i =>
      (i.toLong, (i % 5).toLong, ((i / 5) % 5).toLong, i % 3)
    }.filter { case (_, a, b, _) => a != b }
    val df = ms.toDF("mid", "pa", "pb", "oc")
    val boot = Preference.bradleyTerryBootstrap(df, "pa", "pb", "oc",
      "mid", 16, 3)
    val point = Preference.bradleyTerryMicro(df, "pa", "pb", "oc", 3)
      .orderBy($"player").collect().toSeq
    val got = boot.orderBy($"player").collect().toSeq
    assert(got.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getDouble(4))) ===
      point.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))))
    got.foreach { r =>
      val (nr, lo, hi) = (r.getLong(5), r.getLong(7), r.getLong(8))
      assert(nr >= 1 && nr <= 16 && lo <= hi)
      if (nr > 1) assert(r.getDouble(6) >= 0.0)
    }
    val re = Preference.bradleyTerryBootstrap(df.repartition(7),
        "pa", "pb", "oc", "mid", 16, 3)
      .orderBy($"player").collect().toSeq
    assert(got === re)
  }

  test("partition-invariant: 7-way repartition fits identical strengths") {
    val ms = (0 until 60).map { i =>
      ((i % 5).toLong, ((i / 5) % 5).toLong, i % 3)
    }.filter { case (a, b, _) => a != b }
    val base = fit(ms).orderBy($"player").collect().toSeq
    val re = Preference.bradleyTerryMicro(
      ms.toDF("pa", "pb", "oc").repartition(7), "pa", "pb", "oc", 3)
      .orderBy($"player").collect().toSeq
    assert(base === re)
  }

  private def rc(ms: Seq[(Long, Long, Int)]) =
    Preference.rankCentralityMicro(
      ms.toDF("pa", "pb", "oc"), "pa", "pb", "oc", 3)

  test("rankCentrality: exact 2-player stationary mass at the win-odds " +
      "ratio") {
    // A beats B 3 of 4: p(A->B) = (2e6) div 8 = 250000, p(B->A) = 750000,
    // dmax = 1; round 1 reaches the stationary 3:1 split exactly and
    // rounds 2-3 hold it (detailed-balance: pi_A * .25 = pi_B * .75)
    val got = rc(Seq.fill(3)((1L, 2L, 0)) :+ ((1L, 2L, 1)))
      .orderBy($"player").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 1L, 1500000L), (2L, 1L, 500000L)))
  }

  test("rankCentrality agrees with the BT ordering on a transitive " +
      "arena and stays exactly uniform on a planted cycle BT strictly " +
      "orders") {
    // transitive: 0 beats 1 x4, 1 beats 2 x4, 0 beats 2 x4
    val trans = Seq.fill(4)((0L, 1L, 0)) ++ Seq.fill(4)((1L, 2L, 0)) ++
      Seq.fill(4)((0L, 2L, 0))
    val rcOrder = rc(trans).orderBy($"pi_micro".desc, $"player")
      .collect().map(_.getLong(0)).toSeq
    val btOrder = fit(trans).orderBy($"strength_micro".desc, $"player")
      .collect().map(_.getLong(0)).toSeq
    assert(rcOrder === btOrder && rcOrder === Seq(0L, 1L, 2L))

    // cycle with equal win FRACTIONS (all 1.0) but wildly unequal game
    // counts: A>B once, B>C x10, C>A x10. The walk sees three identical
    // p = 500000 edges — exactly uniform stationary mass (an honest "no
    // ranking here"); BT's count-weighted likelihood still emits a
    // strict order. This divergence is WHY the spectral cross-check
    // exists (Negahban-Oh-Shah's robustness argument).
    val cyc = Seq((0L, 1L, 0)) ++ Seq.fill(10)((1L, 2L, 0)) ++
      Seq.fill(10)((2L, 0L, 0))
    val pis = rc(cyc).collect().map(_.getLong(2)).toSet
    assert(pis === Set(1000000L), "fraction-symmetric cycle must be flat")
    val bts = fit(cyc).collect().map(_.getLong(3)).toSet
    assert(bts.size > 1, "BT strictly orders the count-skewed cycle")
  }

  test("rankCentrality is partition-invariant (exact long walk)") {
    val ms = Seq.fill(3)((0L, 1L, 0)) ++ Seq.fill(5)((1L, 2L, 0)) ++
      Seq((2L, 0L, 0), (0L, 2L, 2), (1L, 0L, 1))
    val base = rc(ms).orderBy($"player").collect().toSeq
    val re = Preference.rankCentralityMicro(
      ms.toDF("pa", "pb", "oc").repartition(7), "pa", "pb", "oc", 3)
      .orderBy($"player").collect().toSeq
    assert(base === re)
  }
}
