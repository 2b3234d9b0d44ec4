package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.serialize.Serialize

/** Benchmark-layout readers (SURVEY.md §2.1 S1-S4) producing the canonical
  * `(text, label_str)` shape. Spark-first re-expression of
  * `utils/data_utils.py` — scans are declarative (`spark.read`), joins are
  * broadcast-able, serialization is pure column expressions.
  */
object Readers {

  /** S1 — header CSV scan (`pd.read_csv`, `data_utils.py:105,135,161`). */
  def csv(spark: SparkSession, path: String): DataFrame =
    spark.read.option("header", "true").option("inferSchema", "true").csv(path)

  /** S1+J1+P3+P4 — entity-matching blocked pairs
    * (`read_blocked_pairs_simple`, `data_utils.py:104-125`):
    * labels ⋈ tableA on ltable_id=id ⋈ tableB on rtable_id=id, then
    * `"A: …<sep>B: …"` serialization and Yes/No label.
    *
    * tableA/tableB are the small dimension sides → `broadcast()` them; at
    * 100 TB the labels fact table streams through two broadcast hash joins
    * with zero shuffle. (Falls back to sort-merge automatically if a dim
    * outgrows the broadcast threshold under AQE.)
    */
  def blockedPairs(
      labels: DataFrame,
      tableA: DataFrame,
      tableB: DataFrame,
      sepTok: String = "; ",
      nanTok: String = "N/A"): DataFrame = {
    val aCols = tableA.columns.filterNot(_ == "id").toSeq
    val bCols = tableB.columns.filterNot(_ == "id").toSeq
    val a = tableA.toDF(tableA.columns.map(c => s"${c}_A").toIndexedSeq: _*)
    val b = tableB.toDF(tableB.columns.map(c => s"${c}_B").toIndexedSeq: _*)
    labels
      .join(broadcast(a), col("ltable_id") === col("id_A"), "inner")
      .join(broadcast(b), col("rtable_id") === col("id_B"), "inner")
      .withColumn("text", Serialize.serializeMergedAB(
        aCols.map(c => col(s"${c}_A")), bCols.map(c => col(s"${c}_B")),
        sepTok, nanTok))
      .withColumn("label_str", Serialize.yesNoLabel(col("label")))
      .select("text", "label_str")
  }

  /** S1+P1+P6+P8 — imputation reader (`read_imputation_single_simple`,
    * `data_utils.py:128-142`): serialize all columns except id + target,
    * label = target value + "\n".
    */
  def imputation(
      table: DataFrame,
      imputeCol: String,
      sepTok: String = "^",
      nanTok: String = "nan"): DataFrame = {
    val cols = Serialize.imputationColumns(table, imputeCol)
    table
      .withColumn("text",
        Serialize.serializeKeyed(cols.map(c => c -> c), sepTok, nanTok))
      .withColumn("label_str", Serialize.imputeLabel(col(imputeCol)))
      .select("text", "label_str")
  }

  /** S3+P5+P7 — error-detection reader for one per-column file
    * (`read_error_detection_single_simple`, `data_utils.py:146-176`):
    * lower-case column names, text = the cell value, label = inverted
    * is_clean flag.
    */
  def errorDetection(file: DataFrame, valueCol: String): DataFrame = {
    val t = Serialize.lowercaseColumns(file)
    t.withColumn("text", col(valueCol.toLowerCase).cast("string"))
      .withColumn("label_str", Serialize.invertedCleanLabel(col("is_clean")))
      .select("text", "label_str")
  }

  /** JSONL corpus reader — the de-facto interchange format for LLM training
    * corpora (one JSON document per line). Schema-first read (no inference
    * pass over 100 TB); pass `schema = None` only for ad-hoc exploration.
    * Distributed line-splittable scan; pairs with `df.write.json(...)` as
    * the sink side (exercised end-to-end by `jsonl_roundtrip_docs`).
    */
  def jsonl(
      spark: SparkSession,
      path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None): DataFrame =
    schema.fold(spark.read.json(path))(s => spark.read.schema(s).json(path))

  /** Error-detection instruction template (`promptsTemplate.py:84`),
    * formatted per file with the parsed column name.
    */
  val ErrorDetectionInstruction: String =
    "I have a table with adult data, now I will provide rows of records " +
      "with the column name: {column_name}, please write an appropriate " +
      "python program that checks if there are any spelling errors. " +
      "Return \"yes\" if there is spelling and \"no\" if there is none."

  /** S3 — directory-of-CSVs error-detection reader
    * (`read_error_detection_single_simple`, `data_utils.py:146-176`):
    * sweep `dir` for `*.csv`, parse each file's audit-target column from the
    * third `_`-separated filename token (`data_utils.py:157`), scan the file
    * (distributed CSV read), normalize through [[errorDetection]]
    * (P5 inverted-clean label + P7 lowercase columns), and pair it with the
    * formatted spelling instruction.
    *
    * The directory listing is a driver-side metadata op: file COUNT is one
    * per audited column (small by construction) while each FILE can be
    * arbitrarily large and scans distributed — the right split of driver vs
    * executor work. Files are taken in sorted name order so the downstream
    * 3-way co-sort (T2) sees a deterministic sequence.
    *
    * @return per file: (target column, (text,label_str) frame, instruction)
    */
  def errorDetectionDir(
      spark: SparkSession,
      dir: String): Seq[(String, DataFrame, String)] = {
    import scala.jdk.CollectionConverters._
    val stream = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
    val names =
      try stream.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.endsWith(".csv"))
        .toSeq.sorted
      finally stream.close()   // Files.list leaks a directory fd otherwise
    names.map { name =>
      // faithful filename-token parse (data_utils.py:157) — a CSV without
      // three '_'-separated tokens fails there too (IndexError); surface
      // the offending file name instead of a bare index error
      val toks = name.split("_")
      require(toks.length > 2,
        s"error-detection CSV name '$name' lacks the <x>_<y>_<column>.csv shape")
      val colName = toks(2).split("\\.csv")(0)
      (colName,
        errorDetection(csv(spark, s"$dir/$name"), colName),
        ErrorDetectionInstruction.replace("{column_name}", colName))
    }
  }

  /** S2 — pair-file scan for transformation benchmarks
    * (`read_transformation_data`, `data_utils.py:180-224`): text lines,
    * optional leading `//instruction`, fields split on `\t\t`, blank/tab-only
    * tokens dropped. File order is made explicit via a line index so the
    * positional split (A6) is well-defined in a distributed engine.
    *
    * Returns (data with __line order column, optional instruction).
    */
  def transformationPairs(
      spark: SparkSession,
      path: String): (DataFrame, Option[String]) = {
    import spark.implicits._
    // Line order matters (first k pairs become train): read via text + index.
    val lines = spark.read.textFile(path).rdd.zipWithIndex()
      .map { case (l, i) => (l, i) }.toDF("value", "__line")
    val first = lines.orderBy("__line").select("value").limit(1)
      .collect().headOption.map(_.getString(0))
    val instruction = first.filter(_.startsWith("//")).map(_.stripPrefix("//"))
    val body = instruction match {
      case Some(_) => lines.filter(col("__line") > 0)
      case None    => lines
    }
    val df = body
      .filter(length(trim(col("value"))) > 0)
      .withColumn("__toks",
        filter(split(col("value"), "\t\t"), t => length(trim(t)) > 0))
      .filter(size(col("__toks")) >= 2)
      .select(
        element_at(col("__toks"), 1).as("text"),
        element_at(col("__toks"), 2).as("label_str"),
        col("__line"))
    (df, instruction)
  }

  /** S4 — instruction file reader (`read_instruction`,
    * `data_utils.py:389-412`): driver-side, strip leading `//`.
    */
  def instruction(path: String): Option[String] = {
    val p = java.nio.file.Paths.get(path)
    if (java.nio.file.Files.exists(p)) {
      val s = java.nio.file.Files.readString(p).strip()
      if (s.isEmpty) None
      else Some(if (s.startsWith("//")) s.stripPrefix("//").strip() else s)
    } else None
  }

  /** Positional split on the explicit line order (A6 over S2 output) —
    * the k-th-key threshold split (top-k + broadcast threshold + filters;
    * no rank, no materialization — see Samplers.positionalSplit).
    */
  def splitTrainTest(df: DataFrame, k: Int): (DataFrame, DataFrame) = {
    val (tr, te) = graft.sample.Samplers.positionalSplit(df, "__line", k)
    (tr.drop("__line"), te.drop("__line"))
  }
}
