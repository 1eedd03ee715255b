package graft.functions

import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class ContentHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def sha(s: String): String =
    MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  test("digest matches the reference recipe (markers, sort, pipe-join)") {
    val df = Seq((5, "x")).toDF("id", "name")
    val got = df.select(ContentHash.rowHash(df, Seq("name", "id")).as("h"))
      .as[String].collect().head
    // columns sorted case-insensitively: id, name
    val expected = sha(sha("0|5") + "|" + sha("0|x"))
    assert(got == expected)
  }

  test("null cells hash distinctly from empty strings") {
    val df = Seq((Option.empty[String], ""), (Option(""), "")).toDF("a", "b")
    val hashes = df.select(ContentHash.rowHash(df, Seq("a")).as("h"))
      .as[String].collect()
    assert(hashes(0) != hashes(1))
    // row digest = sha over the pipe-joined per-column digests
    assert(hashes(0) == sha(sha("1|")))
  }

  test("projection order does not change the digest") {
    val df1 = Seq((1, "x")).toDF("a", "b")
    val df2 = Seq(("x", 1)).toDF("b", "a")
    val h1 = df1.select(ContentHash.rowHash(df1, Seq("a", "b")).as("h")).as[String].collect().head
    val h2 = df2.select(ContentHash.rowHash(df2, Seq("b", "a")).as("h")).as[String].collect().head
    assert(h1 == h2)
  }

  test("withContentHash drops hashed payload but keeps requested columns") {
    val df = Seq((1, "x", "y")).toDF("id", "p1", "p2")
    val out = ContentHash.withContentHash(df, Seq("p1", "p2"), keep = Seq("id"))
    assert(out.columns.toSet == Set("id", "_content_hash"))
  }
}
