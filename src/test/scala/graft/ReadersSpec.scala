package graft

import java.nio.file.Files

import graft.io.Readers

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft_readers")
    val p = dir.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("S1 csv reader infers header and types") {
    val path = tmpFile("t.csv", "id,name,score\n1,alpha,2.5\n2,beta,3.0\n")
    val df = Readers.csv(spark, path)
    assert(df.columns.toSeq === Seq("id", "name", "score"))
    assert(df.count() === 2)
    assert(df.schema("id").dataType.typeName === "integer")
  }

  test("S1+J1 blockedPairs joins labels through both dims and serializes") {
    val labels = Seq((1, 10, 1), (2, 20, 0)).toDF("ltable_id", "rtable_id", "label")
    val a = Seq((1, "acme corp"), (2, "other")).toDF("id", "name")
    val b = Seq((10, "acme inc"), (20, "misc")).toDF("id", "name")
    val out = Readers.blockedPairs(labels, a, b).orderBy("label_str")
      .as[(String, String)].collect().toSeq
    assert(out === Seq(
      ("A: other; B: misc", "No"),
      ("A: acme corp; B: acme inc", "Yes")))
  }

  test("S2 transformationPairs: instruction line, tab-split, blank filtering") {
    val path = tmpFile("pairs.tsv",
      "//convert to upper\nfoo\t\tFOO\n\n  \nbar\t\tBAR\n")
    val (df, instr) = Readers.transformationPairs(spark, path)
    assert(instr === Some("convert to upper"))
    val rows = df.orderBy("__line").select("text", "label_str")
      .as[(String, String)].collect().toSeq
    assert(rows === Seq(("foo", "FOO"), ("bar", "BAR")))
    val (train, test) = Readers.splitTrainTest(df, 1)
    assert(train.count() === 1 && test.count() === 1)
  }

  test("S3 errorDetection reader lowercases columns and inverts is_clean") {
    val file = Seq(("Memphis", 1), ("Memfis", 0)).toDF("City", "Is_Clean")
    val out = Readers.errorDetection(file, "City")
      .as[(String, String)].collect().toSet
    assert(out === Set(("Memphis", "no"), ("Memfis", "yes")))
  }

  test("S3 errorDetectionDir sweeps *.csv, parses filename target, formats instruction") {
    val dir = Files.createTempDirectory("graft_errdet")
    Files.writeString(dir.resolve("adult_split_city.csv"),
      "rowkey,city,is_clean\n1,Memphis,1\n2,Memfis,0\n")
    Files.writeString(dir.resolve("adult_split_state.csv"),
      "rowkey,state,is_clean\n1,Texas,1\n")
    Files.writeString(dir.resolve("ignore.txt"), "not a csv")
    val tasks = Readers.errorDetectionDir(spark, dir.toString)
    assert(tasks.map(_._1) === Seq("city", "state"))   // sorted file order
    val city = tasks.head._2.as[(String, String)].collect().toSet
    assert(city === Set(("Memphis", "no"), ("Memfis", "yes")))
    assert(tasks.head._3.contains("column name: city"))
    assert(tasks(1)._3.contains("column name: state"))
    assert(tasks(1)._2.count() === 1)
  }

  test("jsonl reader is corrupt-line tolerant under an explicit schema") {
    val dir = Files.createTempDirectory("graft_jsonl_corrupt")
    Files.writeString(dir.resolve("part-0.jsonl"),
      """{"doc_id": 1, "text": "good line"}
        |this is not json at all
        |{"doc_id": 3, "text": "another good one"}
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("doc_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    val df = Readers.jsonl(spark, dir.toString, Some(schema))
    // PERMISSIVE default: the corrupt line becomes an all-null row, the
    // good rows survive — no crash mid-scan on a 100 TB corpus
    assert(df.count() === 3)
    assert(df.filter($"doc_id".isNull).count() === 1)
    assert(df.filter($"doc_id".isNotNull).count() === 2)
  }

  test("S4 instruction reader strips //") {
    val path = tmpFile("instruction.txt", "// do the thing \n")
    assert(Readers.instruction(path) === Some("do the thing"))
    assert(Readers.instruction("/nonexistent/instruction.txt") === None)
  }
}
