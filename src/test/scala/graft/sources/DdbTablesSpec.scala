package graft.sources

import java.nio.file.Files
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class DdbTablesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def itemLine(id: Int, v: String, n: String = "1"): String =
    s"""{"Item":{"pk":{"S":"id$id"},"v":{"S":"$v"},"n":{"N":"$n"}}}"""

  test("export write -> read round-trips items through manifests and gzip") {
    val tmp = Files.createTempDirectory("graft-ddb").toString
    val items = (1 to 100).map(i => itemLine(i, s"val$i"))
    DdbTables.writeS3Export(items.toDF("item_json"), tmp)

    // layout contract
    assert(Files.exists(java.nio.file.Paths.get(tmp, "manifest-summary.json")))
    assert(Files.exists(java.nio.file.Paths.get(tmp, "manifest-files.json")))
    val summary = Files.readString(java.nio.file.Paths.get(tmp, "manifest-summary.json"))
    assert(summary.contains("\"itemCount\":100"))

    val back = DdbTables.readS3Export(spark, tmp)
    assert(back.count() == 100)
    val decoded = back.as[String].collect().map(DdbJson.decodeItemLine)
    assert(decoded.map(_("pk")).toSet == (1 to 100).map(i => DdbValue.S(s"id$i")).toSet)
  }

  test("validateItems classifies missing / extra / mismatch with numeric tolerance") {
    val src = Seq(itemLine(1, "a"), itemLine(2, "b", "2.50"), itemLine(3, "c")).toDF("item_json")
    val tgtRows = Seq(
      itemLine(2, "b", "2.5"),        // N scale difference only -> match
      itemLine(3, "CHANGED"),         // mismatch
      itemLine(4, "extra"))           // extra
    val tgt = tgtRows.toDF("item_json")
    val got = DdbTables.validateItems(src, tgt, Seq("pk"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got.values.toSeq.sorted == Seq("extra_target", "mismatch", "missing_target"))
    assert(got.find(_._2 == "missing_target").get._1.contains("id1"))
    assert(got.find(_._2 == "mismatch").get._1.contains("id3"))
    assert(got.find(_._2 == "extra_target").get._1.contains("id4"))
  }

  test("renameKeys rewrites attribute names and canonicalizes") {
    val df = Seq("""{"Item":{"old_pk":{"S":"x"},"keep":{"N":"1"}}}""").toDF("item_json")
    val out = DdbTables.renameKeys(df, Map("old_pk" -> "pk")).as[String].collect().head
    val item = DdbJson.decodeItemLine(out)
    assert(item.keySet == Set("pk", "keep"))
    assert(item("pk") == DdbValue.S("x"))
  }

  test("keyed projects canonical composite keys") {
    val df = Seq(itemLine(7, "x")).toDF("item_json")
    val k = DdbTables.keyed(df, Seq("pk", "absent")).collect().head
    assert(k.getString(0).contains("\"id7\""))
    assert(k.getString(0).contains("NULL")) // absent key attr -> Null arm
  }
}
