package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ranking over frames that are BOUNDED BY CONSTRUCTION (post-`limit`
  * rows — at most topK whatever the corpus size), without any window at
  * all: the predecessor-count broadcast self-join idiom
  * ([[graft.scale.TextAnalysis.zipfFit]] / vocabCoverage). The suite
  * treats Spark's "No Partition Defined" WindowExec warning as a scale
  * regression, so even bounded frames must not plan a global window — a
  * real (unbounded) one must be the only thing that can ever fire it.
  * For data-plane-scale ranking use the range-partitioned
  * [[graft.sample.Samplers.globalRowNumber]] family instead.
  */
object Bounded {

  /** Appends `rankCol` = the 1-based rank of each row under the
    * lexicographic order `keys` (column name, descending?). Key columns
    * must be NON-NULL and the key tuples UNIQUE per row (every call site
    * tie-breaks on a unique id) — rank = 1 + count of strictly-preceding
    * key tuples from a broadcast copy of the frame. The frame is
    * localCheckpoint'd first so the (usually sorted-limit) subtree is not
    * re-executed for each side of the self-join.
    */
  def withRank(
      df: DataFrame,
      keys: Seq[(String, Boolean)],
      rankCol: String): DataFrame = {
    require(keys.nonEmpty, "withRank needs at least one order key")
    val base = df.localCheckpoint(true)
    val names = keys.map(_._1)
    // Enforce the non-null precondition loudly: the final equi-join would
    // silently DROP null-keyed rows (the windows this replaced ranked
    // them), so a future nullable call site must fail, not shrink. The
    // frame is bounded + already checkpointed — the extra count is free.
    val nullKeyRows = base
      .filter(names.map(col(_).isNull).reduce(_ || _)).count()
    require(nullKeyRows == 0L,
      s"withRank: $nullKeyRows rows carry NULL in key columns " +
        s"(${names.mkString(", ")}) — rank keys must be non-null")
    val marked = base
      .select(names.map(n => col(n).as(s"__r_$n")): _*)
      .withColumn("__mark", lit(1))
    // __r strictly precedes the left row: OR over "equal on the first i
    // keys, strictly before on key i" (null-safe <=> on the equal prefix)
    val precedes = keys.zipWithIndex.map { case ((n, desc), i) =>
      val prefixEq = keys.take(i)
        .map { case (m, _) => col(s"__r_$m") <=> col(m) }
        .foldLeft(lit(true))(_ && _)
      val before =
        if (desc) col(s"__r_$n") > col(n) else col(s"__r_$n") < col(n)
      prefixEq && before
    }.reduce(_ || _)
    val ranks = base.select(names.map(col): _*)
      .join(broadcast(marked), precedes, "left")
      .groupBy(names.map(col): _*)
      .agg((count(col("__mark")) + 1).cast("int").as(rankCol))
    base.join(broadcast(ranks), names)
      .select(base.columns.map(col) :+ col(rankCol): _*)
  }
}
