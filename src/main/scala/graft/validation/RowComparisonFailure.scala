package graft.validation

/** Row-level diff result ADT, mirroring the reference's failure taxonomy
  * (validation/RowComparisonFailure.scala:25-74). A validation run
  * produces a `Dataset[RowComparisonFailure]`; sampling uses `limit`, not
  * driver-side collection, so the failure set never has to fit on the
  * driver.
  */
final case class RowComparisonFailure(
    rowRepr: String,
    otherRepr: Option[String],
    items: Seq[RowComparisonFailure.Item])

object RowComparisonFailure {

  sealed trait Item { def description: String }
  case object MissingTargetRow extends Item { val description = "row missing in target" }
  case object ExtraTargetRow extends Item { val description = "row only in target" }
  final case class MismatchedColumnCount(source: Int, target: Int) extends Item {
    def description = s"column count differs: $source vs $target"
  }
  final case class MismatchedColumnNames(source: Seq[String], target: Seq[String]) extends Item {
    def description = s"column names differ: ${source.mkString(",")} vs ${target.mkString(",")}"
  }
  final case class DifferingFieldValues(fields: Seq[String]) extends Item {
    def description = s"differing values in: ${fields.mkString(", ")}"
  }
  final case class DifferingTtls(fields: Seq[String]) extends Item {
    def description = s"differing ttls in: ${fields.mkString(", ")}"
  }
  final case class DifferingWritetimes(fields: Seq[String]) extends Item {
    def description = s"differing writetimes in: ${fields.mkString(", ")}"
  }
  final case class NumericTypeMismatch(fields: Seq[String]) extends Item {
    def description = s"numeric type mismatch in: ${fields.mkString(", ")}"
  }

  /** Compare two aligned value sequences with tolerant numeric semantics;
    * None means "row absent on that side".
    */
  def compare(
      fieldNames: Seq[String],
      source: Option[Seq[Any]],
      target: Option[Seq[Any]],
      tolerance: java.math.BigDecimal = java.math.BigDecimal.ZERO): Option[RowComparisonFailure] =
    (source, target) match {
      case (Some(s), None) =>
        Some(RowComparisonFailure(s.mkString("[", ",", "]"), None, Seq(MissingTargetRow)))
      case (None, Some(t)) =>
        Some(RowComparisonFailure(t.mkString("[", ",", "]"), None, Seq(ExtraTargetRow)))
      case (None, None) => None
      case (Some(s), Some(t)) =>
        if (s.length != t.length)
          Some(RowComparisonFailure(s.mkString("[", ",", "]"),
            Some(t.mkString("[", ",", "]")), Seq(MismatchedColumnCount(s.length, t.length))))
        else {
          val differing = fieldNames.lazyZip(s).lazyZip(t).flatMap { (name, a, b) =>
            val equal = (a, b) match {
              case (null, null) => true
              case (null, _) | (_, null) => false
              case (x: Array[Byte], y: Array[Byte]) =>
                NumericComparison.compareBinary(x, y) == NumericComparison.Equal
              case (x: String, y: String) => x == y
              case (x: Boolean, y: Boolean) => x == y
              case (x, y) =>
                NumericComparison.compareNumeric(x, y, tolerance) match {
                  case NumericComparison.Equal => true
                  case _ => x == y
                }
            }
            if (equal) None else Some(name)
          }
          if (differing.isEmpty) None
          else Some(RowComparisonFailure(s.mkString("[", ",", "]"),
            Some(t.mkString("[", ",", "]")), Seq(DifferingFieldValues(differing))))
        }
    }
}
