package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class DdbJsonSpec extends AnyFunSuite {
  import DdbValue._

  val item: Item = Map(
    "pk" -> S("user#1"),
    "n" -> N("42.50"),
    "flag" -> Bool(true),
    "nothing" -> Null,
    "blob" -> B(Array[Byte](1, 2, 3)),
    "tags" -> Ss(List("b", "a")),
    "nums" -> Ns(List("10", "2")),
    "blobs" -> Bs(List(Array[Byte](9), Array[Byte](1))),
    "list" -> L(List(S("x"), N("1"), M(Map("inner" -> Bool(false))))),
    "map" -> M(Map("k1" -> S("v1"), "k2" -> Ns(List("3", "1")))))

  test("encode/decode round-trips every arm") {
    val line = DdbJson.encodeItemLine(item)
    val back = DdbJson.decodeItemLine(line)
    assert(back.keySet == item.keySet)
    item.foreach { case (k, v) =>
      // sets are canonicalized (sorted) on encode; use deep tolerant compare
      assert(deepEquals(v, back(k)), s"mismatch at $k: $v vs ${back(k)}")
    }
  }

  test("encode is canonical: keys and sets sorted") {
    val line = DdbJson.encodeItemLine(Map(
      "z" -> Ss(List("c", "a", "b")), "a" -> N("1")))
    assert(line.indexOf("\"a\"") < line.indexOf("\"z\""))
    assert(line.contains("[\"a\",\"b\",\"c\"]"))
    // NS sorts numerically, not lexically
    val ns = DdbJson.encodeItemLine(Map("n" -> Ns(List("10", "2"))))
    assert(ns.contains("[\"2\",\"10\"]"))
  }

  test("decode parses the AWS export wire shapes") {
    val got = DdbJson.decodeItemLine(
      """{"Item":{"id":{"S":"abc"},"count":{"N":"7"},"del":{"NULL":true},""" +
        """"l":{"L":[{"N":"1"},{"S":"two"}]},"m":{"M":{"x":{"BOOL":false}}}}}""")
    assert(got("id") == S("abc"))
    assert(got("count") == N("7"))
    assert(got("del") == Null)
    assert(got("l") == L(List(N("1"), S("two"))))
    assert(got("m") == M(Map("x" -> Bool(false))))
  }

  test("a line without an Item field is rejected, not decoded as empty") {
    assertThrows[IllegalArgumentException](
      DdbJson.decodeItemLine("""{"Metadata":{"x":{"S":"y"}}}"""))
    // empty Item map is still legal (explicitly present)
    assert(DdbJson.decodeItemLine("""{"Item":{}}""").isEmpty)
  }

  test("deepEquals: numeric tolerance, set order-insensitivity") {
    assert(deepEquals(N("2.50"), N("2.5")))
    assert(deepEquals(N("2.50"), N("2.51"), new java.math.BigDecimal("0.01")))
    assert(!deepEquals(N("2.50"), N("2.52"), new java.math.BigDecimal("0.01")))
    assert(deepEquals(Ss(List("a", "b")), Ss(List("b", "a"))))
    assert(deepEquals(Ns(List("10", "2")), Ns(List("2", "10"))))
    assert(!deepEquals(S("a"), N("1")))
    assert(deepEquals(
      M(Map("a" -> L(List(N("1.0"))))),
      M(Map("a" -> L(List(N("1")))))))
  }

  test("keyOf projects composite keys with Null for absent attrs") {
    assert(keyOf(Map("pk" -> S("x")), Seq("pk", "sk")) == List(S("x"), Null))
  }
}
