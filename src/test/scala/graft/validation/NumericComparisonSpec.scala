package graft.validation

import java.math.{BigDecimal => JBD}
import org.scalatest.funsuite.AnyFunSuite

class NumericComparisonSpec extends AnyFunSuite {
  import NumericComparison._

  private val zero = JBD.ZERO

  test("NaN equals NaN; infinities compare by sign") {
    assert(compareNumeric(Double.NaN, Float.NaN, zero) == Equal)
    assert(compareNumeric(Double.PositiveInfinity, Double.PositiveInfinity, zero) == Equal)
    assert(compareNumeric(Double.PositiveInfinity, Double.NegativeInfinity, zero) != Equal)
    assert(compareNumeric(Double.NaN, 1.0, zero) != Equal)
  }

  test("integral cross-type exact equality") {
    assert(compareNumeric(42, 42L, zero) == Equal)
    assert(compareNumeric(42.toShort, java.math.BigInteger.valueOf(42), zero) == Equal)
    assert(compareNumeric(42, 43L, zero) != Equal)
  }

  test("decimal scale-insensitive with tolerance") {
    assert(compareNumeric(new JBD("2.50"), new JBD("2.5"), zero) == Equal)
    assert(compareNumeric(new JBD("2.50"), new JBD("2.51"), new JBD("0.01")) == Equal)
    assert(compareNumeric(new JBD("2.50"), new JBD("2.52"), new JBD("0.01")) != Equal)
    assert(compareNumeric(2.5, new JBD("2.5"), zero) == Equal) // cross-family
    assert(compareNumeric(3, new JBD("3.0"), zero) == Equal)
  }

  test("tolerance symmetry and identity properties (seeded sweep)") {
    val prop = org.scalacheck.Prop.forAll { (a: Double, b: Double) =>
      (a.isNaN || b.isNaN || a.isInfinite || b.isInfinite) || {
        val tol = new JBD("0.001")
        // symmetric verdict (reasons embed operand order, so compare status)
        (compareNumeric(a, b, tol) == Equal) == (compareNumeric(b, a, tol) == Equal) &&
          compareNumeric(a, a, zero) == Equal
      }
    }
    val result = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, result.status.toString)
  }

  test("timestamp tolerance and binary compare") {
    assert(compareTimestampMillis(1000L, 1005L, 5L) == Equal)
    assert(compareTimestampMillis(1000L, 1006L, 5L) != Equal)
    assert(compareBinary(Array[Byte](1, 2), Array[Byte](1, 2)) == Equal)
    assert(compareBinary(Array[Byte](1), Array[Byte](2)) != Equal)
  }

  test("stripTrailingZeros canonicalizes zero") {
    assert(stripTrailingZeros(new JBD("0.00")).toPlainString == "0")
    assert(stripTrailingZeros(new JBD("2.500")).toPlainString == "2.5")
  }

  test("RowComparisonFailure classification") {
    import RowComparisonFailure._
    assert(compare(Seq("a"), Some(Seq(1)), None).get.items == Seq(MissingTargetRow))
    assert(compare(Seq("a"), None, Some(Seq(1))).get.items == Seq(ExtraTargetRow))
    assert(compare(Seq("a"), Some(Seq(1)), Some(Seq(1))).isEmpty)
    val diff = compare(Seq("a", "b"), Some(Seq(1, "x")), Some(Seq(1, "y"))).get
    assert(diff.items == Seq(DifferingFieldValues(Seq("b"))))
    // tolerant numeric pass-through
    assert(compare(Seq("a"), Some(Seq(2.50)), Some(Seq(new JBD("2.5"))),
      new JBD("0.01")).isEmpty)
  }
}
