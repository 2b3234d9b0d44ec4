package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transaction-level analytics: market-basket association mining and
  * cumulative-share (ABC/Pareto) classification — the recommendation and
  * assortment primitives over (transaction, item) relations, the same
  * family the co-occurrence graph operators ([[Graph.linkPrediction]],
  * [[TextAnalysis.pmiTopPairs]]) serve for graphs and text.
  */
object Baskets {

  /** Frequent item PAIRS with support and lift — A-priori's level-2 pass,
    * the workhorse of association mining (deeper levels repeat the same
    * join shape on the survivor set): for every unordered item pair
    * co-occurring in >= `minCount` transactions,
    *   support = n_ab / N,   lift = (n_ab · N) / (n_a · n_b),
    * where n_x counts DISTINCT transactions containing x.
    *
    * Shape: distinct (txn, item) once; pair generation is the per-basket
    * self-join — mass is Σ C(basket_size, 2), bounded by real basket
    * sizes, never corpus²; two hash-aggregates (pair counts, item counts)
    * and a broadcast of the 1-row total. Lift is exact-integer
    * cross-multiplication surfaced as one rounded division.
    */
  def frequentPairs(
      df: DataFrame,
      txnCol: String,
      itemCol: String,
      minCount: Long): DataFrame = {
    val ti = df.select(col(txnCol).as("txn"), col(itemCol).as("item"))
      .distinct()
      .localCheckpoint(true)
    val n = ti.agg(countDistinct(col("txn")).as("__n"))
    val itemCnt = ti.groupBy(col("item")).agg(count(lit(1)).as("cnt"))
    val pairs = ti
      .join(ti.select(col("txn"), col("item").as("item_b")), Seq("txn"))
      .filter(col("item") < col("item_b"))
      .groupBy(col("item").as("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= minCount)
    pairs
      .join(itemCnt.select(col("item").as("item_a"), col("cnt").as("n_a")),
        Seq("item_a"))
      .join(itemCnt.select(col("item").as("item_b"), col("cnt").as("n_b")),
        Seq("item_b"))
      .crossJoin(broadcast(n))
      .select(col("item_a"), col("item_b"), col("n_ab"), col("n_a"),
        col("n_b"),
        round(col("n_ab").cast("double") / col("__n"), 6).as("support"),
        round((col("n_ab") * col("__n")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"), 6).as("lift"))
  }

  /** ABC (Pareto) classification: items ranked by exact revenue cents,
    * classified by their CUMULATIVE share of total revenue — class A
    * while the running total stays within 80%, B within 95%, C beyond
    * (the 80/15/5 assortment rule). Boundaries compare exact integers by
    * cross-multiplication (cum·100 <= total·80) — no float share ever
    * decides a class.
    *
    * Scale note: rank and running total come from
    * [[graft.sample.Samplers.globalRankCumSum]] — range-partition on
    * (revenue desc, item), per-partition windows, broadcast offsets — so
    * even a 10⁸-10⁹-row item/SKU dictionary never funnels through a
    * single-partition window (the corpus-mass work is one map-side-
    * combined aggregate either way). The grand total rides out of the
    * scaffold's measure job for free — no separate total pass, no
    * crossJoin.
    */
  def abcAnalysis(
      df: DataFrame,
      itemCol: String,
      revenueCol: String): DataFrame = {
    val rev = df.groupBy(col(itemCol).as("item"))
      .agg(sum((col(revenueCol).cast("decimal(18,2)") * 100).cast("long"))
        .as("revenue_cents"))
      // negate for descending revenue under the scaffold's ascending sort;
      // NULL revenue (all-null input group) keeps its old desc-NULLS-LAST
      // position via the MaxValue sentinel, ties still break on item asc
      .withColumn("__negrev",
        coalesce(-col("revenue_cents"), lit(Long.MaxValue)))
    val (ranked, total) = graft.sample.Samplers.globalRankCumSum(
      rev, Seq("__negrev", "item"), "revenue_cents",
      rnCol = "rank", cumCol = "cum_cents")
    val tot = lit(total)
    ranked
      .withColumn("cum_share",
        round(col("cum_cents").cast("double") / tot, 6))
      .withColumn("abc_class",
        when(col("cum_cents") * 100 <= tot * 80, "A")
          .when(col("cum_cents") * 100 <= tot * 95, "B")
          .otherwise("C"))
      .select(col("item"), col("revenue_cents"), col("rank"),
        col("cum_cents"), col("cum_share"), col("abc_class"))
  }
}
