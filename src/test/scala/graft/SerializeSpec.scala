package graft

import org.apache.spark.sql.functions._
import graft.serialize.Serialize

/** Unit tests for SURVEY §2.2 serialization operators, on hand-built
  * fixtures mirroring the reference layouts (FIXTURES.md §A), including the
  * quirk semantics: nan_tok substitution of nulls AND literal "nan" strings,
  * space-padded separators, trailing-newline impute labels.
  */
class SerializeSpec extends SparkSpec {
  import spark.implicits._

  test("serializeKeyed: nan substitution, sep padding, trim") {
    val df = Seq(
      ("Acme", Some("12"), Some(" padded ")),
      ("nan", None, Some("x"))
    ).toDF("name", "qty", "note")
    val got = df.select(Serialize.serializeKeyed(Seq(
      "name" -> "name", "qty" -> "qty", "note" -> "note")).as("text"))
      .as[String].collect()
    assert(got(0) == "name: Acme ^ qty: 12 ^ note: padded")
    // null -> nan_tok AND literal "nan" -> nan_tok (reference quirk)
    assert(got(1) == "name: nan ^ qty: nan ^ note: x")
  }

  test("serializeKeyed: dot separator is not space-prefixed") {
    val df = Seq(("a", "b")).toDF("x", "y")
    val got = df.select(Serialize.serializeKeyed(
      Seq("x" -> "x", "y" -> "y"), sepTok = ".").as("t")).as[String].head()
    assert(got == "x: a. y: b")
  }

  test("serializeSimple: plain join with nan for nulls, no trim") {
    val df = Seq((Some("a"), None: Option[String], Some(" b "))).toDF("x", "y", "z")
    val got = df.select(Serialize.serializeSimple(
      Seq("x", "y", "z")).as("t")).as[String].head()
    assert(got == "a^nan^ b ")
  }

  test("serializeMergedAB shapes the EM pair text") {
    val df = Seq(("t1", "m1", "t2", "m2")).toDF("ti_A", "ma_A", "ti_B", "ma_B")
    val got = df.select(Serialize.serializeMergedAB(
      Seq(col("ti_A"), col("ma_A")), Seq(col("ti_B"), col("ma_B"))).as("t"))
      .as[String].head()
    assert(got == "A: t1; m1; B: t2; m2")
  }

  test("labels: yesNo, invertedClean, impute newline") {
    val df = Seq((1, 1, "Boston"), (0, 0, "NYC")).toDF("label", "is_clean", "city")
    val got = df.select(
      Serialize.yesNoLabel(col("label")).as("yn"),
      Serialize.invertedCleanLabel(col("is_clean")).as("ic"),
      Serialize.imputeLabel(col("city")).as("im"))
      .as[(String, String, String)].collect()
    assert(got(0) == (("Yes", "no", "Boston\n")))
    assert(got(1) == (("No", "yes", "NYC\n")))
  }

  test("lowercaseColumns + imputationColumns") {
    val df = Seq((1, "a", "b")).toDF("ID", "City", "Name")
    val lc = Serialize.lowercaseColumns(df)
    assert(lc.columns.toSeq == Seq("id", "city", "name"))
    assert(Serialize.imputationColumns(lc, "city") == Seq("name"))
  }
}
