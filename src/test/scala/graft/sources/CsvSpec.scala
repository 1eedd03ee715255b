package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CsvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType.fromDDL(
    "id BIGINT, name STRING, score BIGINT")

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-csv")
    Files.writeString(dir.resolve("part-0.csv"), lines.mkString("\n"))
    dir.toString
  }

  test("every line routes to exactly one of good/quarantine") {
    val path = writeLines(Seq(
      "1,alice,10",
      "2,\"bob, the builder\",20",  // quoted delimiter
      "3,carol",                    // short row → malformed (token count != width)
      "4,dave,not_a_number",        // type mismatch → malformed
      "\"unclosed,5",               // unclosed quote → malformed
      "",                           // blank: dropped, not a record
      ",eve,30"))                   // empty required token → missing_required
    val (good, quarantine) =
      Csv.readWithQuarantine(spark, path, schema, requiredFields = Seq("id"))

    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(g.toSeq == Seq((1L, "alice"), (2L, "bob, the builder")))

    val q = quarantine.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(q.count(_._2 == "malformed_csv") == 3)
    assert(q.collect { case (l, r) if r.startsWith("missing_required") => (l, r) } ==
      Seq((",eve,30", "missing_required:id")))
    assert(q.size + g.length == 6)
  }

  test("empty tokens in required fields quarantine as missing, naming every field") {
    val path = writeLines(Seq("1,alice,", "2,bob,20", ",carol,"))
    val (good, quarantine) =
      Csv.readWithQuarantine(spark, path, schema, requiredFields = Seq("id", "score"))
    assert(good.count() == 1)
    val reasons = quarantine.collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(reasons == Set(
      ("1,alice,", "missing_required:score"),
      (",carol,", "missing_required:id,score")))
  }

  test("dropHeaderLines removes canonical header lines; custom delimiter works") {
    val path = writeLines(Seq("id|name|score", "1|alice|10", "2|bob|20"))
    val (good, quarantine) = Csv.readWithQuarantine(spark, path, schema,
      delimiter = "|", dropHeaderLines = true)
    assert(good.count() == 2 && quarantine.count() == 0)
  }

  test("eager validation: unknown required field, reserved names, bad delimiter") {
    intercept[IllegalArgumentException](
      Csv.readWithQuarantine(spark, "/tmp/x", schema, Seq("nope")))
    intercept[IllegalArgumentException](
      Csv.readWithQuarantine(spark, "/tmp/x",
        StructType.fromDDL("__line STRING"), Nil))
    intercept[IllegalArgumentException](
      Csv.readWithQuarantine(spark, "/tmp/x", schema, Nil, delimiter = ",,"))
  }
}
