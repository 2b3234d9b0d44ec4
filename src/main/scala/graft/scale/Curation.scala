package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Provenance accounting for the five-stage corpus-curation DAG (the
  * `curation_pipeline_docs` composite: quality gate → exact dedup →
  * benchmark decontamination → domain mixing → shard packing).
  *
  * Every real 100 TB curation run ships this audit artifact beside the
  * kept corpus: WHICH gate dropped each document and WHY, plus the
  * per-stage mass roll-up — without it a curation run is unreviewable
  * (was the 40% mass loss quality or dedup? did decontamination eat a
  * domain?). The pipeline composite itself discards exactly this.
  */
object Curation {

  /** Per-document drop ledger: every input document lands in EXACTLY ONE
    * (stage, reason) class — the classes partition the corpus:
    *
    *   1 quality / too_short          n_tokens < minTokens
    *   2 dedup / exact_duplicate      a lower-id doc shares its fingerprint
    *   3 decontaminate / eval_holdout doc is the benchmark slice itself
    *                                  (id % evalMod == 0)
    *   3 decontaminate / contaminated shares a word shingle with the slice
    *   4 mix / over_quota             past its domain's mixing quota
    *   5 kept / kept                  survives into shard packing (which
    *                                  drops nothing — it only assigns)
    *
    * Precedence is pipeline order: a too-short doc in the eval slice
    * ledgers as too_short — the gates see it first, exactly as the
    * pipeline runs them.
    *
    * Scale shape: the stages are the SAME operators the pipeline
    * composite runs ([[TextAnalysis.fingerprint]] dedup window,
    * [[Dedup.decontaminate]]'s broadcast shingle join,
    * [[TextAnalysis.domainMix]]); accounting adds only filter-complements
    * of frames the pipeline already computes plus ONE keyed left-anti
    * join for the mix stage (whose operator returns survivors only). No
    * new shuffle classes, no window beyond the pipeline's own per-
    * fingerprint ranking.
    *
    * @return (id, stage_idx, stage, reason, n_tokens) — one row per input
    *         document.
    */
  def ledger(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      domainCol: String,
      minTokens: Int = 20,
      evalMod: Int = 20,
      weights: Map[String, Double] = Map.empty,
      mixTarget: Long = 200L,
      shingleSize: Int = 3): DataFrame = {
    require(minTokens >= 1, s"bad quality threshold $minTokens")
    require(evalMod >= 2, s"bad eval modulus $evalMod")
    def tag(df: DataFrame, idx: Int, stage: String, reason: String) =
      df.select(col(idCol), lit(idx).cast("int").as("stage_idx"),
        lit(stage).as("stage"), lit(reason).as("reason"), col("n_tokens"))

    // stage 1: quality gate (token count computed once, carried through)
    val base = docs.withColumn("n_tokens",
      TextAnalysis.tokenCount(col(textCol)).cast("long"))
    val quality = base.filter(col("n_tokens") >= minTokens)
    val tooShort = base.filter(col("n_tokens") < minTokens)

    // stage 2: exact dedup — keep the min id per normalized fingerprint
    val byFp = Window.partitionBy(col("fp")).orderBy(col(idCol))
    val ranked = quality
      .withColumn("fp", TextAnalysis.fingerprint(col(textCol)))
      .withColumn("rn", row_number().over(byFp))
    val deduped = ranked.filter(col("rn") === 1).drop("rn", "fp")
    val dupes = ranked.filter(col("rn") > 1)

    // stage 3: decontamination against the held-out eval slice
    val holdout = deduped.filter(col(idCol) % evalMod === 0)
    val corpus = deduped.filter(col(idCol) % evalMod =!= 0)
    val flags = Dedup.decontaminate(corpus,
      docs.filter(col(idCol) % evalMod === 0), idCol, textCol, shingleSize)
    val contaminated = corpus.join(
      flags.filter(col("contaminated")).select(idCol), Seq(idCol))
    val clean = corpus.join(
      flags.filter(!col("contaminated")).select(idCol), Seq(idCol))

    // stage 4: domain mixing — the operator returns survivors, so the
    // dropped side is the one accounting anti-join of the ledger
    val mixed = TextAnalysis.domainMix(clean, domainCol, idCol,
      weights, mixTarget)
    val overQuota = clean.join(mixed.select(idCol), Seq(idCol), "left_anti")

    tag(tooShort, 1, "quality", "too_short")
      .unionByName(tag(dupes, 2, "dedup", "exact_duplicate"))
      .unionByName(tag(holdout, 3, "decontaminate", "eval_holdout"))
      .unionByName(tag(contaminated, 3, "decontaminate", "contaminated"))
      .unionByName(tag(overQuota, 4, "mix", "over_quota"))
      .unionByName(tag(mixed, 5, "kept", "kept"))
  }

  /** The per-stage mass roll-up over a [[ledger]] frame — the table a
    * curation report prints: documents and token mass per (stage,
    * reason). Dictionary-scale output (≤ 6 rows).
    */
  def ledgerMass(ledger: DataFrame): DataFrame =
    ledger.groupBy(col("stage_idx"), col("stage"), col("reason"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("sum_tokens"))
}
