package graft.validation

import java.math.{BigDecimal => JBigDecimal, BigInteger}

/** Tolerant scalar comparison semantics for validation, matching the
  * reference's rules (validation/core/NumericComparison.scala:40-155,
  * validation/RowComparisonFailure.scala:274-351):
  *
  *  - NaN == NaN; ±Inf compares by sign (SQL `=` disagrees on NaN, which
  *    is why this is Scala and not a SQL predicate)
  *  - integral values compare exactly (normalized through BigInteger so
  *    Byte/Short/Int/Long/BigInteger cross-compare)
  *  - decimal/floating values compare as BigDecimal with |x−y| <= tol,
  *    scale-insensitively (2.50 == 2.5)
  *  - cross-family (integral vs decimal) normalizes both to BigDecimal
  *  - timestamps compare with a millisecond tolerance
  *  - binary compares with java.util.Arrays.equals
  *
  * Used inside typed Dataset transforms (map over joined rows); for flat
  * all-numeric cases the SQL `abs(a-b) <= tol` form is preferred because
  * it stays in codegen — see SparkEntry's q_tolerant_compare.
  */
object NumericComparison {

  sealed trait Verdict
  case object Equal extends Verdict
  final case class Different(reason: String) extends Verdict

  private def toBigInteger(v: Any): Option[BigInteger] = v match {
    case b: Byte        => Some(BigInteger.valueOf(b.toLong))
    case s: Short       => Some(BigInteger.valueOf(s.toLong))
    case i: Int         => Some(BigInteger.valueOf(i.toLong))
    case l: Long        => Some(BigInteger.valueOf(l))
    case b: BigInteger  => Some(b)
    case b: BigInt      => Some(b.bigInteger)
    case _              => None
  }

  private def toBigDecimal(v: Any): Option[JBigDecimal] = v match {
    case f: Float if f.isNaN || f.isInfinite  => None
    case d: Double if d.isNaN || d.isInfinite => None
    case f: Float       => Some(new JBigDecimal(f.toString))
    case d: Double      => Some(new JBigDecimal(d.toString))
    case d: JBigDecimal => Some(d)
    case d: BigDecimal  => Some(d.bigDecimal)
    case other          => toBigInteger(other).map(new JBigDecimal(_))
  }

  private def specialFloat(v: Any): Option[Double] = v match {
    case f: Float if f.isNaN || f.isInfinite  => Some(f.toDouble)
    case d: Double if d.isNaN || d.isInfinite => Some(d)
    case _ => None
  }

  /** Whether the value belongs to any numeric family this comparator
    * understands (integral, decimal/floating, or special float). Used to
    * tell "two numbers disagree" apart from "these aren't even both
    * numbers" — the reference's NumericTypeMismatch category.
    */
  def isNumericValue(v: Any): Boolean =
    specialFloat(v).isDefined || toBigDecimal(v).isDefined

  /** Compare two numeric values with an absolute tolerance. */
  def compareNumeric(a: Any, b: Any, tolerance: JBigDecimal): Verdict =
    (specialFloat(a), specialFloat(b)) match {
      case (Some(x), Some(y)) =>
        // NaN == NaN; infinities must match exactly (sign included)
        if (x.isNaN && y.isNaN) Equal
        else if (x == y) Equal
        else Different(s"special float mismatch: $x vs $y")
      case (Some(x), None) => Different(s"special float vs finite: $x vs $b")
      case (None, Some(y)) => Different(s"finite vs special float: $a vs $y")
      case (None, None) =>
        (toBigInteger(a), toBigInteger(b)) match {
          case (Some(x), Some(y)) =>
            if (x == y) Equal else Different(s"integral mismatch: $x vs $y")
          case _ =>
            (toBigDecimal(a), toBigDecimal(b)) match {
              case (Some(x), Some(y)) =>
                // scale-insensitive: compareTo, not equals
                if (x.subtract(y).abs.compareTo(tolerance) <= 0) Equal
                else Different(s"decimal mismatch beyond tolerance: $x vs $y")
              case _ => Different(s"non-numeric operand: $a vs $b")
            }
        }
    }

  /** Millisecond-tolerance timestamp compare (epoch millis inputs). */
  def compareTimestampMillis(a: Long, b: Long, toleranceMs: Long): Verdict =
    if (math.abs(a - b) <= toleranceMs) Equal
    else Different(s"timestamp mismatch: $a vs $b (tol ${toleranceMs}ms)")

  def compareBinary(a: Array[Byte], b: Array[Byte]): Verdict =
    if (java.util.Arrays.equals(a, b)) Equal
    else Different("binary mismatch")

  /** Strip trailing zeros from a BigDecimal, canonicalizing 2.50 -> 2.5
    * and 0.00 -> 0 (reference: writers/Scylla.scala:344-355).
    */
  def stripTrailingZeros(d: JBigDecimal): JBigDecimal = {
    val stripped = d.stripTrailingZeros()
    // BigDecimal("0.00").stripTrailingZeros has scale -2 on old JDKs; keep 0 canonical
    if (stripped.compareTo(JBigDecimal.ZERO) == 0) JBigDecimal.ZERO else stripped
  }
}
