package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-evaluation operators over sampled generations — the measurement
  * half of an eval pipeline once candidate outputs land in a table
  * (task, sample, verdict / candidate text). Reference scope: the
  * reference engine has no eval operator; this is a scale-path extension
  * beside the judge-ensemble and preference families.
  *
  * House determinism rules throughout: counts are exact longs from
  * hash-aggregates; the only doubles are fixed-order expressions over
  * them (a k-term left-fold product, one division), mirrored verbatim by
  * the oracle.
  */
object Eval {

  /** Unbiased pass@k (Chen et al., "Evaluating Large Language Models
    * Trained on Code", 2021, eq. 1): with n samples per task of which c
    * pass,   pass@k = 1 − C(n−c, k)/C(n, k) = 1 − Π_{i<k} (n−c−i)/(n−i)
    * — the UNBIASED estimator of the probability at least one of k
    * drawn samples passes (the naive "any of the first k" is biased
    * when n > k; the product form is also numerically stable where the
    * binomials overflow). Per (task, k):
    *   n < k         → NULL (not enough samples to draw k)
    *   n − c < k     → 1.0  (every size-k draw must contain a pass)
    *   otherwise     → the k-term product, folded left in i order with
    *                   each term's quotient taken FIRST — acc·(A/B),
    *                   parenthesized, never (acc·A)/B — so both engines
    *                   execute the identical op sequence and the
    *                   rounded value cannot flap by an ulp.
    *
    * Scale shape: ONE corpus hash-agg to the (task, n, c) dictionary;
    * the k-fold product runs per dictionary row (tasks, not samples) —
    * the interpreted-HOF discipline. Output |tasks|·|ks| rows.
    */
  def passAtK(
      df: DataFrame,
      taskCol: String,
      correctCol: String,
      ks: Seq[Int]): DataFrame =
    passAtKFromCounts(passAtKCounts(df, taskCol, correctCol), ks)

  /** The one corpus-mass job of [[passAtK]]: sample stream → per-task
    * (n, c) — two associative sums, legal Complete-mode streaming state
    * at task-dictionary scale. The twin drains this and runs
    * [[passAtKFromCounts]], sharing the batch oracle verbatim.
    */
  def passAtKCounts(
      df: DataFrame,
      taskCol: String,
      correctCol: String): DataFrame =
    df.groupBy(col(taskCol).as("task"))
      .agg(count(lit(1)).as("n_samples"),
        sum(col(correctCol).cast("long")).as("n_correct"))

  /** The estimator fold over a drained/batch (task, n, c) dictionary —
    * passAtKFromCounts ∘ passAtKCounts = passAtK by construction.
    */
  def passAtKFromCounts(
      tasks: DataFrame,
      ks: Seq[Int]): DataFrame = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"bad k list $ks")
    val withK = tasks.select(col("task"), col("n_samples"),
      col("n_correct"),
      explode(lit(ks.toArray)).as("k"))
    withK.withColumn("pass_at_k", expr(
      "CASE WHEN n_samples < k THEN CAST(NULL AS DOUBLE) " +
        "WHEN n_samples - n_correct < k THEN 1.0 " +
        "ELSE ROUND(1.0 - aggregate(sequence(0, k - 1), " +
        "CAST(1.0 AS DOUBLE), (acc, i) -> acc * " +
        "(CAST(n_samples - n_correct - i AS DOUBLE) / " +
        "CAST(n_samples - i AS DOUBLE))), 6) END"))
  }

  /** chrF per (candidate, reference) pair (Popović, "chrF: character
    * n-gram F-score for automatic MT evaluation", WMT 2015) — the
    * tokenization-free companion to [[rougeN]]: clipped character
    * n-gram precision AND recall combined as
    *   chrF_β = (1+β²)·P·R / (β²·P + R),   β = 2 (recall-weighted,
    * the WMT standard). Character grams survive morphology and
    * whitespace damage that word n-grams do not — the robust choice
    * for multilingual eval tables. Declared variant (diverges from
    * sacrebleu's chrF, which strips whitespace runs before gramming —
    * do not compare absolute numbers across tools): grams run over
    * the raw lowercased text INCLUDING spaces, and a text shorter than
    * n contributes its whole string as one gram (the house ragged
    * convention), so no row is dropped. Unpaired keys follow
    * [[rougeN]]: reference-only keys emit chr_r/chrf 0.0 with
    * n_cand_grams/chr_p NULL; candidate-only keys are not emitted.
    *
    * Same exact construction as rougeN: two (key, gram, cnt)
    * dictionaries, ONE keyed equi-join with multiset clipping, one
    * per-key fold; P/R are single divisions of exact longs and chrF
    * one fixed-order expression (0.0 when the overlap is empty).
    */
  def chrF(
      candidates: DataFrame,
      references: DataFrame,
      keyCol: String,
      textCol: String,
      n: Int = 6,
      beta: Double = 2.0): DataFrame = {
    require(n >= 1 && beta > 0.0, s"bad chrF params n=$n beta=$beta")
    def grams(df: DataFrame) = df
      .select(col(keyCol).as("key"), explode(expr(
        s"transform(sequence(1, greatest(length(lower($textCol)) " +
          s"- ${n - 1}, 1)), i -> substr(lower($textCol), i, $n))"))
        .as("g"))
      .groupBy(col("key"), col("g")).agg(count(lit(1)).as("cnt"))
    val ref = grams(references)
    val cand = grams(candidates)
    // LEFT join from the reference totals — [[rougeN]]'s edge semantics:
    // a key with no candidate row survives with n_cand_grams NULL,
    // chr_p NULL, chr_r/chrf 0.0 (zero overlap), instead of silently
    // vanishing. Keys present only in the candidate input are not
    // scored (no reference → no truth to score against), same as rougeN.
    val totals = ref.groupBy(col("key"))
      .agg(sum(col("cnt")).as("n_ref_grams"))
      .join(cand.groupBy(col("key"))
        .agg(sum(col("cnt")).as("n_cand_grams")), Seq("key"), "left")
    val overlap = ref.select(col("key"), col("g"), col("cnt").as("__rc"))
      .join(cand.select(col("key"), col("g"), col("cnt").as("__cc")),
        Seq("key", "g"))
      .groupBy(col("key"))
      .agg(sum(least(col("__rc"), col("__cc"))).as("n_overlap"))
    val b2 = beta * beta
    val pr = totals.join(overlap, Seq("key"), "left")
      .withColumn("n_overlap", coalesce(col("n_overlap"), lit(0L)))
      .withColumn("__p",
        col("n_overlap").cast("double") / col("n_cand_grams"))
      .withColumn("__r",
        col("n_overlap").cast("double") / col("n_ref_grams"))
    pr.select(col("key").as(keyCol), col("n_ref_grams"),
      col("n_cand_grams"), col("n_overlap"),
      round(col("__p"), 6).as("chr_p"),
      round(col("__r"), 6).as("chr_r"),
      when(col("n_overlap") > 0L,
        round(lit(1.0 + b2) * col("__p") * col("__r") /
          (lit(b2) * col("__p") + col("__r")), 6))
        .otherwise(lit(0.0)).as("chrf"))
  }

  /** ROUGE-N recall per (candidate, reference) pair (Lin, "ROUGE: A
    * Package for Automatic Evaluation of Summaries", WAS 2004): clipped
    * n-gram overlap over the reference n-gram count —
    *   rouge_n = Σ_g min(cnt_cand(g), cnt_ref(g)) / Σ_g cnt_ref(g)
    * with MULTISET clipping (a candidate repeating one reference gram
    * five times earns credit once per reference occurrence — dropping
    * the clip is the classic inflated-overlap bug). NULL when the
    * reference has no n-grams.
    *
    * Scale shape: both sides explode to (key, gram, cnt) dictionaries
    * via hash-aggs, ONE keyed equi-join on (key, gram), one per-key
    * fold — corpus-linear, no pair mass beyond the keyed join, nothing
    * broadcast with the corpus. Exact longs; the recall division is the
    * only double.
    */
  def rougeN(
      candidates: DataFrame,
      references: DataFrame,
      keyCol: String,
      textCol: String,
      n: Int): DataFrame = {
    require(n >= 1, s"bad n $n")
    def grams(df: DataFrame) = df
      .select(col(keyCol).as("key"),
        explode(graft.scale.Shingles.positionalShingles(col(textCol), n))
          .as("g"))
      .groupBy(col("key"), col("g")).agg(count(lit(1)).as("cnt"))
    val ref = grams(references)
    val cand = grams(candidates)
    val refTot = ref.groupBy(col("key"))
      .agg(sum(col("cnt")).as("n_ref_grams"))
    val overlap = ref.select(col("key"), col("g"),
        col("cnt").as("__rc"))
      .join(cand.select(col("key"), col("g"), col("cnt").as("__cc")),
        Seq("key", "g"))
      .groupBy(col("key"))
      .agg(sum(least(col("__rc"), col("__cc"))).as("n_overlap"))
    refTot.join(overlap, Seq("key"), "left")
      .select(col("key").as(keyCol), col("n_ref_grams"),
        coalesce(col("n_overlap"), lit(0L)).as("n_overlap"),
        when(col("n_ref_grams") > 0L,
          round(coalesce(col("n_overlap"), lit(0L)).cast("double") /
            col("n_ref_grams"), 6)).as(s"rouge_$n"))
  }
}
