package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.io.Tables
import graft.transform.TransformProgram

/** Dev tool: isolate transform_affine_lineitem's cost — scan, regex
  * extract, round/cast, orderBy tail — under the bench's noop-sink
  * methodology.
  */
object ProfileAffine {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def noop(df: org.apache.spark.sql.DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    import Profile.time

    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity")
    time("warmup scan")(li.count())
    val prog = TransformProgram.AffineNumber(1.8, 32.0, 1)
    val s = col("l_quantity").cast("string")

    time("scan only (noop)")(noop(li))
    time("scan + orderBy (noop)")(
      noop(li.orderBy(col("l_orderkey"), col("l_linenumber"))))
    time("scan + cast string (noop)")(noop(li.select(s.as("s"))))
    time("+ regexp_extract (noop)")(
      noop(li.select(regexp_extract(s, "[-+]?[0-9]*\\.?[0-9]+", 0).as("x"))))
    time("+ full affine, no order (noop)")(
      noop(li.select(prog.toColumn(s).as("pred"))))
    time("full query (noop)")(
      noop(graft.SparkEntry.queries("transform_affine_lineitem")(spark, sfDir)))
    time("full query again (noop)")(
      noop(graft.SparkEntry.queries("transform_affine_lineitem")(spark, sfDir)))
    spark.stop()
  }
}
