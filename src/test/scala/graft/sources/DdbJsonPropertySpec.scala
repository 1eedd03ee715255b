package graft.sources

import org.scalacheck.{Arbitrary, Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based coverage of the DynamoDB-JSON codec: encode/decode
  * round-trips arbitrary value trees (bounded depth), and deepEquals is
  * reflexive/symmetric under tolerance — the semantics the validators
  * lean on (SURVEY.md §5 calls for scalacheck exactly here).
  */
class DdbJsonPropertySpec extends AnyFunSuite {
  import DdbValue._

  private val genString: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))
  private val genNumber: Gen[String] = for {
    sign <- Gen.oneOf("", "-")
    int <- Gen.chooseNum(0L, 999999L)
    frac <- Gen.option(Gen.chooseNum(0, 99999))
  } yield sign + int + frac.map(f => s".$f").getOrElse("")
  private val genBytes: Gen[Array[Byte]] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Arbitrary.arbitrary[Byte]).map(_.toArray))

  private def genValue(depth: Int): Gen[DdbValue] = {
    val scalars = Gen.oneOf(
      genString.map(S.apply),
      genNumber.map(N.apply),
      Arbitrary.arbitrary[Boolean].map(Bool.apply),
      Gen.const(Null),
      genBytes.map(B.apply),
      Gen.nonEmptyListOf(genString).map(ss => Ss(ss.distinct)),
      Gen.nonEmptyListOf(genNumber).map(ns => Ns(ns.distinct)),
      Gen.nonEmptyListOf(genBytes).map(Bs.apply))
    if (depth <= 0) scalars
    else Gen.frequency(
      6 -> scalars,
      1 -> Gen.listOfN(2, genValue(depth - 1)).map(L.apply),
      1 -> Gen.mapOfN(2, Gen.zip(genString.suchThat(_.nonEmpty), genValue(depth - 1))).map(M.apply))
  }

  private val genItem: Gen[Item] =
    Gen.mapOfN(4, Gen.zip(genString.suchThat(_.nonEmpty), genValue(2)))

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("encode/decode round-trips arbitrary items (deep-equal modulo set order)") {
    check(Prop.forAllNoShrink(genItem) { item =>
      val back = DdbJson.decodeItemLine(DdbJson.encodeItemLine(item))
      back.keySet == item.keySet &&
        item.forall { case (k, v) => DdbValue.deepEquals(v, back(k)) }
    })
  }

  test("canonical encoding is a fixpoint: encode(decode(encode(x))) == encode(x)") {
    check(Prop.forAllNoShrink(genItem) { item =>
      val once = DdbJson.encodeItemLine(item)
      DdbJson.encodeItemLine(DdbJson.decodeItemLine(once)) == once
    })
  }

  test("deepEquals is reflexive and symmetric under tolerance") {
    val tol = new java.math.BigDecimal("0.5")
    check(Prop.forAllNoShrink(genValue(2), genValue(2)) { (a, b) =>
      DdbValue.deepEquals(a, a, tol) &&
        DdbValue.deepEquals(a, b, tol) == DdbValue.deepEquals(b, a, tol)
    })
  }
}
