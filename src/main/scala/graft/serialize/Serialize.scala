package graft.serialize

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row→string serialization operators (SURVEY.md §2.2, P1-P10).
  *
  * The reference does these with pandas `apply(axis=1)` Python lambdas
  * (`utils/data_utils.py:63-101,117-141`); here every serializer is a pure
  * Catalyst `Column` expression — whole-stage-codegen'd, no UDF boundary.
  * That is the single biggest per-row perf win of the rebuild (SURVEY §2.7 F3).
  */
object Serialize {

  /** Null (and literal "nan" — a reference quirk, `data_utils.py:73`) →
    * `nanTok`; everything else stringified + trimmed. The nan check is
    * case-insensitive on the TRIMMED value: Spark stringifies Double.NaN
    * as "NaN" where pandas str() gives "nan" — a case-sensitive pre-trim
    * compare would let real NaN numerics (and padded " nan " cells)
    * through where the reference substitutes the token.
    */
  private def cleanValue(c: Column, nanTok: String): Column = {
    val s = c.cast("string")
    when(s.isNull || lower(trim(s)) === "nan", lit(nanTok))
      .otherwise(trim(s))
  }

  /** P1 — keyed serialization: `"col: value"` entries joined by the
    * (space-padded) separator. Faithful to `serialize_row`
    * (`utils/data_utils.py:63-79`): sep is prefixed with a space unless it is
    * `"."` or empty; entries are left-stripped.
    */
  def serializeKeyed(
      columnMap: Seq[(String, String)],
      sepTok: String = "^",
      nanTok: String = "nan"): Column = {
    val entries = columnMap.map { case (cOg, cMap) =>
      ltrim(concat(lit(s"$cMap: "), cleanValue(col(cOg), nanTok)))
    }
    val sep =
      if (sepTok.nonEmpty && sepTok != ".") s" $sepTok " else s"$sepTok "
    concat_ws(sep, entries: _*)
  }

  /** P2 — simple serialization: all values joined by `sepTok`, nulls →
    * `nanTok` (`serialize_row_simple`, `utils/data_utils.py:82-95`).
    * Note: unlike P1, no literal-"nan" substitution and no trim here
    * (the reference uses `pd.notnull`, not the string compare).
    */
  def serializeSimple(
      cols: Seq[String],
      sepTok: String = "^",
      nanTok: String = "nan"): Column =
    concat_ws(sepTok,
      cols.map(c => coalesce(col(c).cast("string"), lit(nanTok))): _*)

  /** Like P2 but over arbitrary pre-built columns (for suffix-projected
    * serialization where the inputs are `col("x_A")` etc).
    */
  def serializeSimpleCols(
      cs: Seq[Column],
      sepTok: String = "^",
      nanTok: String = "nan"): Column =
    concat_ws(sepTok, cs.map(c => coalesce(c.cast("string"), lit(nanTok))): _*)

  /** P3 — merged A/B serialization for entity-matching pairs
    * (`serialize_row_for_merge` + caller, `utils/data_utils.py:98-101,117-120`):
    * `"A: <a-values><sep>B: <b-values>"` where each side is P2-serialized.
    */
  def serializeMergedAB(
      colsA: Seq[Column],
      colsB: Seq[Column],
      sepTok: String = "; ",
      nanTok: String = "N/A"): Column =
    concat(
      lit("A: "), serializeSimpleCols(colsA, sepTok, nanTok),
      lit(sepTok),
      lit("B: "), serializeSimpleCols(colsB, sepTok, nanTok))

  /** P4 — binary int label → "Yes"/"No" (`data_utils.py:122`). */
  def yesNoLabel(c: Column): Column =
    when(c === 1, lit("Yes")).otherwise(lit("No"))

  /** P5 — inverted clean flag: is_clean 1→"no", 0→"yes"
    * (`data_utils.py:167`; yes = "this cell is an error").
    */
  def invertedCleanLabel(isClean: Column): Column =
    when(isClean === 1, lit("no")).otherwise(lit("yes"))

  /** P6 — imputation label: target value + trailing newline
    * (`data_utils.py:141`; stripped again on deserialize, `:374`).
    */
  def imputeLabel(c: Column): Column = concat(c.cast("string"), lit("\n"))

  /** P7 — lower-case all column names (`data_utils.py:163`). */
  def lowercaseColumns(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(_.toLowerCase): _*)

  /** P8 — serialization column set for imputation: everything except `id`
    * and the impute target (`data_utils.py:136`).
    */
  def imputationColumns(df: DataFrame, imputeCol: String): Seq[String] =
    df.columns.filterNot(c => c == "id" || c == imputeCol).toSeq

  /** P10 — final canonical projection (`data_utils.py:125`). */
  def canonical(df: DataFrame): DataFrame = df.select("text", "label_str")
}
