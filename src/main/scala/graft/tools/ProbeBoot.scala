package graft.tools

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: anatomy of the Poisson-bootstrap cost (bootstrap_ci_orders
  * 6.6 s at sf0.1): digest projection vs weight ladder vs the 2B-sum
  * decimal aggregation. `sbt "runMain graft.tools.ProbeBoot"`
  */
object ProbeBoot {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.sample.Samplers

    val orders = graft.io.Tables.load(spark, sfDir, "orders")
      .withColumn("cents",
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"))

    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe] $tag%-32s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val reps = 32
    val nDigests = (reps + 2) / 3
    def digestCol(c: Int): Column =
      graft.scale.HashExprs.md5PrefixLong(
        concat(col("o_orderkey").cast("string"), lit(":c" + c))
          .cast("binary"), 15)
    def weight(b: Int): Column = {
      val u16 = shiftright(col(s"__h${b / 3}"), (b % 3) * 16)
        .bitwiseAND(lit(65535L))
      Samplers.PoissonCdf16.zipWithIndex.foldRight(lit(8L): Column) {
        case ((t, k), acc) => when(u16 < t, k.toLong).otherwise(acc)
      }
    }
    // flat branch-free form: w = #thresholds <= u16 (identical value)
    def weightFlat(b: Int): Column = {
      val u16 = shiftright(col(s"__h${b / 3}"), (b % 3) * 16)
        .bitwiseAND(lit(65535L))
      Samplers.PoissonCdf16
        .map(t => (u16 >= t).cast("long"))
        .reduce(_ + _)
    }
    val d = (c: Column) => c.cast("decimal(38,0)")

    // warm-up
    noop(orders); noop(orders.groupBy("o_orderstatus").count())

    for (_ <- 1 to 2) {
      time("scan+project only") { noop(orders.select(col("o_orderkey"),
        col("cents"))) }
      time("+11 digests") { noop(orders.select(
        (col("o_orderkey") +: col("cents") +:
          (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)) }
      time("+32 weight ladders") { noop(orders.select(
          (col("o_orderkey") +: col("cents") +:
            (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
        .select((col("cents") +:
          (0 until reps).map(b => weight(b).as(s"__w$b"))): _*)) }
      time("full 2B decimal agg") {
        val base = orders.select(
            (col("o_orderkey") +: col("cents") +:
              (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
          .select((col("cents") +: lit(1L).as("den") +:
            (0 until reps).map(b => weight(b).as(s"__w$b"))): _*)
        val aggs = Seq(count(lit(1)).as("n"),
          sum(d(col("cents"))).as("__sn"), sum(d(col("den"))).as("__sd")) ++
          (0 until reps).flatMap { b =>
            Seq(sum(d(col("cents")) * col(s"__w$b")).as(s"__wn$b"),
              sum(d(col("den")) * col(s"__w$b")).as(s"__wd$b"))
          }
        noop(base.agg(aggs.head, aggs.tail: _*))
      }
      time("full 2B LONG agg") {
        val base = orders.select(
            (col("o_orderkey") +: col("cents") +:
              (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
          .select((col("cents") +: lit(1L).as("den") +:
            (0 until reps).map(b => weight(b).as(s"__w$b"))): _*)
        val aggs = Seq(count(lit(1)).as("n"),
          sum(col("cents")).as("__sn"), sum(col("den")).as("__sd")) ++
          (0 until reps).flatMap { b =>
            Seq(sum(col("cents") * col(s"__w$b")).as(s"__wn$b"),
              sum(col("den") * col(s"__w$b")).as(s"__wd$b"))
          }
        noop(base.agg(aggs.head, aggs.tail: _*))
      }
      time("+32 FLAT weight ladders") { noop(orders.select(
          (col("o_orderkey") +: col("cents") +:
            (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
        .select((col("cents") +:
          (0 until reps).map(b => weightFlat(b).as(s"__w$b"))): _*)) }
      time("full 2B decimal agg FLAT") {
        val base = orders.select(
            (col("o_orderkey") +: col("cents") +:
              (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
          .select((col("cents") +: lit(1L).as("den") +:
            (0 until reps).map(b => weightFlat(b).as(s"__w$b"))): _*)
        val aggs = Seq(count(lit(1)).as("n"),
          sum(d(col("cents"))).as("__sn"), sum(d(col("den"))).as("__sd")) ++
          (0 until reps).flatMap { b =>
            Seq(sum(d(col("cents")) * col(s"__w$b")).as(s"__wn$b"),
              sum(d(col("den")) * col(s"__w$b")).as(s"__wd$b"))
          }
        noop(base.agg(aggs.head, aggs.tail: _*))
      }
      time("agg FLAT, den sums LONG") {
        val base = orders.select(
            (col("o_orderkey") +: col("cents") +:
              (0 until nDigests).map(c => digestCol(c).as(s"__h$c"))): _*)
          .select((col("cents") +: lit(1L).as("den") +:
            (0 until reps).map(b => weightFlat(b).as(s"__w$b"))): _*)
        val aggs = Seq(count(lit(1)).as("n"),
          sum(d(col("cents"))).as("__sn"), sum(col("den")).as("__sd")) ++
          (0 until reps).flatMap { b =>
            Seq(sum(d(col("cents")) * col(s"__w$b")).as(s"__wn$b"),
              sum(col("den") * col(s"__w$b")).as(s"__wd$b"))
          }
        noop(base.agg(aggs.head, aggs.tail: _*))
      }
      time("whole operator") {
        noop(Samplers.poissonBootstrap(orders, "o_orderkey", "cents", 32))
      }
    }
    spark.stop()
  }
}
