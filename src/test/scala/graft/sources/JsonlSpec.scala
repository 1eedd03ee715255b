package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.types.StructType
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class JsonlSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType.fromDDL(
    "doc_id BIGINT, text STRING, lang STRING")

  private def writeLines(lines: Seq[String]): String = {
    val dir = Files.createTempDirectory("graft-jsonl")
    Files.writeString(dir.resolve("part-0.jsonl"), lines.mkString("\n"))
    dir.toString
  }

  test("every line routes to exactly one of good/quarantine") {
    val path = writeLines(Seq(
      """{"doc_id": 1, "text": "hello", "lang": "en"}""",
      """{"doc_id": 2, "text": "welt", "lang": "de", "extra": "ignored"}""",
      """{"doc_id": 3, "text": "no lang"}""",     // parses; lang not required
      """not json at all""",
      """{"truncated": """,
      """42""",                                   // valid JSON, not an object
      "",                                         // blank: dropped, not a record
      """{"text": "no id", "lang": "en"}"""))     // missing required doc_id
    val (good, quarantine) =
      Jsonl.readWithQuarantine(spark, path, schema, requiredFields = Seq("doc_id"))

    val g = good.collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(g.toSeq == Seq((1L, "hello"), (2L, "welt"), (3L, "no lang")))

    val q = quarantine.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(q.count(_._2 == "malformed_json") == 3) // not-json, truncated, bare 42
    assert(q.collect { case (l, r) if r.startsWith("missing_required") => (l, r) } ==
      Seq(("""{"text": "no id", "lang": "en"}""", "missing_required:doc_id")))
    assert(q.size + g.length == 7) // blank line is in neither
  }

  test("multiple missing required fields are all named") {
    val path = writeLines(Seq("""{"lang": "en"}"""))
    val (_, quarantine) = Jsonl.readWithQuarantine(
      spark, path, schema, requiredFields = Seq("doc_id", "text"))
    assert(quarantine.collect().head.getString(1) == "missing_required:doc_id,text")
  }

  test("no required fields: every parse success is good") {
    val path = writeLines(Seq("""{"doc_id": 1}""", "oops"))
    val (good, quarantine) = Jsonl.readWithQuarantine(spark, path, schema)
    assert(good.count() == 1 && quarantine.count() == 1)
  }

  test("eager validation: unknown required field and reserved names") {
    intercept[IllegalArgumentException](
      Jsonl.readWithQuarantine(spark, "/tmp/x", schema, Seq("nope")))
    intercept[IllegalArgumentException](
      Jsonl.readWithQuarantine(spark, "/tmp/x",
        StructType.fromDDL("__r STRING"), Nil))
  }

  test("gzipped JSONL shards read transparently (the web-corpus delivery format)") {
    val dir = Files.createTempDirectory("graft-jsonl-gz")
    val gz = dir.resolve("part-0.jsonl.gz")
    val out = new java.util.zip.GZIPOutputStream(Files.newOutputStream(gz))
    out.write(
      ("""{"doc_id": 1, "text": "a", "lang": "en"}""" + "\n" +
        """not json""" + "\n" +
        """{"doc_id": 2, "text": "b", "lang": "de"}""").getBytes("UTF-8"))
    out.close()
    val (good, quarantine) = Jsonl.readWithQuarantine(spark, dir.toString, schema)
    assert(good.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L))
    assert(quarantine.collect().map(_.getString(1)).toSeq == Seq("malformed_json"))
  }

  test("the real documents table round-trips losslessly through JSONL") {
    val docs = graft.Tables.load(spark, TestSpark.sf, "documents")
      .select("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft-jsonl-rt")
    docs.write.mode("overwrite").json(dir.resolve("out").toString)
    val (good, quarantine) = Jsonl.readWithQuarantine(
      spark, dir.resolve("out").toString, schema, Seq("doc_id"))
    assert(quarantine.count() == 0)
    assert(good.count() == docs.count())
    assert(good.exceptAll(docs).count() == 0)
  }
}
