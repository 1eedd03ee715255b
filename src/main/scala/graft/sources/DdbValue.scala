package graft.sources

/** Serializable ADT for the DynamoDB attribute-value union
  * (reference: alternator/DdbValue.scala:17-58 — created there because
  * the AWS SDK's AttributeValue is not Java-serializable and so cannot
  * cross a Spark shuffle; the same constraint applies here).
  *
  * Ten arms, matching the DynamoDB JSON wire shape
  * ({"S": …}, {"N": …}, {"BOOL": …}, {"L": […]}, {"NULL": true},
  *  {"B": base64}, {"M": {…}}, {"SS": […]}, {"NS": […]}, {"BS": […]}).
  *
  * Numbers stay as their decimal string representation (DynamoDB numbers
  * are arbitrary-precision decimals; parsing to Double would corrupt
  * them) and compare as BigDecimal — see `DdbValue.deepEquals`.
  */
sealed trait DdbValue extends Serializable

object DdbValue {
  final case class S(value: String) extends DdbValue
  final case class N(value: String) extends DdbValue
  final case class Bool(value: Boolean) extends DdbValue
  final case class L(values: List[DdbValue]) extends DdbValue
  case object Null extends DdbValue
  final case class B(value: Array[Byte]) extends DdbValue {
    override def equals(o: Any): Boolean = o match {
      case B(other) => java.util.Arrays.equals(value, other)
      case _        => false
    }
    override def hashCode(): Int = java.util.Arrays.hashCode(value)
  }
  final case class M(values: Map[String, DdbValue]) extends DdbValue
  final case class Ss(values: List[String]) extends DdbValue
  final case class Ns(values: List[String]) extends DdbValue
  final case class Bs(values: List[Array[Byte]]) extends DdbValue

  type Item = Map[String, DdbValue]

  /** Deep tolerant equality (reference:
    * validation/RowComparisonFailure.scala:309-344): numbers (N / NS)
    * compare as BigDecimal with an absolute tolerance, sets compare
    * order-insensitively, L/M recurse.
    */
  def deepEquals(a: DdbValue, b: DdbValue,
                 tolerance: java.math.BigDecimal = java.math.BigDecimal.ZERO): Boolean = {
    def numEq(x: String, y: String): Boolean =
      new java.math.BigDecimal(x).subtract(new java.math.BigDecimal(y))
        .abs.compareTo(tolerance) <= 0
    (a, b) match {
      case (N(x), N(y))     => numEq(x, y)
      case (Ns(x), Ns(y))   =>
        x.size == y.size &&
          x.map(new java.math.BigDecimal(_)).sortBy(identity)
            .lazyZip(y.map(new java.math.BigDecimal(_)).sortBy(identity))
            .forall((p, q) => p.subtract(q).abs.compareTo(tolerance) <= 0)
      case (Ss(x), Ss(y))   => x.sorted == y.sorted
      case (Bs(x), Bs(y))   =>
        x.size == y.size && {
          val enc = java.util.Base64.getEncoder
          x.map(enc.encodeToString).sorted == y.map(enc.encodeToString).sorted
        }
      case (L(x), L(y))     => x.size == y.size && x.lazyZip(y).forall(deepEquals(_, _, tolerance))
      case (M(x), M(y))     =>
        x.keySet == y.keySet && x.forall { case (k, v) => deepEquals(v, y(k), tolerance) }
      case (x, y)           => x == y
    }
  }

  /** Composite key projection for join/key-by (reference:
    * alternator/AlternatorValidator.scala:41-49).
    */
  def keyOf(item: Item, keyAttrs: Seq[String]): List[DdbValue] =
    keyAttrs.map(a => item.getOrElse(a, Null)).toList
}
