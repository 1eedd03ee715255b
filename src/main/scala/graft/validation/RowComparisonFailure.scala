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
  /** Epoch millis of any temporal value this engine compares. */
  private def temporalMillis(v: Any): Option[Long] = v match {
    case t: java.sql.Timestamp => Some(t.getTime)
    case d: java.util.Date => Some(d.getTime) // covers java.sql.Date too
    case i: java.time.Instant => Some(i.toEpochMilli)
    case l: java.time.LocalDateTime =>
      Some(l.toInstant(java.time.ZoneOffset.UTC).toEpochMilli)
    case _ => None
  }

  def compare(
      fieldNames: Seq[String],
      source: Option[Seq[Any]],
      target: Option[Seq[Any]],
      tolerance: java.math.BigDecimal = java.math.BigDecimal.ZERO,
      timestampToleranceMs: Long = 0L): Option[RowComparisonFailure] =
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
              // reference semantics (RowComparisonFailure.scala:283-290):
              // with a configured ms tolerance, timestamps compare on
              // epoch millis; without one, exact equality (incl. nanos)
              case (x, y) if timestampToleranceMs > 0 &&
                  temporalMillis(x).isDefined && temporalMillis(y).isDefined =>
                NumericComparison.compareTimestampMillis(
                  temporalMillis(x).get, temporalMillis(y).get, timestampToleranceMs) ==
                  NumericComparison.Equal
              case (x, y) =>
                NumericComparison.compareNumeric(x, y, tolerance) match {
                  case NumericComparison.Equal => true
                  case _ => x == y
                }
            }
            if (equal) None else Some((name, a, b))
          }
          if (differing.isEmpty) None
          else {
            // per-category attribution (reference Validator.scala:69-104):
            // numeric-vs-non-numeric is the sharpest diagnosis and wins;
            // then the cell's role (TTL / WRITETIME sidecar by the
            // explosion contract's naming), else a plain value diff
            val (typeMismatch, rest) = differing.partition { case (_, a, b) =>
              a != null && b != null &&
                NumericComparison.isNumericValue(a) != NumericComparison.isNumericValue(b)
            }
            val (ttls, rest2) = rest.partition(_._1.toLowerCase.endsWith("_ttl"))
            val (writetimes, plain) = rest2.partition(_._1.toLowerCase.endsWith("_writetime"))
            val items = Seq(
              if (plain.nonEmpty) Some(DifferingFieldValues(plain.map(_._1))) else None,
              if (ttls.nonEmpty) Some(DifferingTtls(ttls.map(_._1))) else None,
              if (writetimes.nonEmpty) Some(DifferingWritetimes(writetimes.map(_._1))) else None,
              if (typeMismatch.nonEmpty) Some(NumericTypeMismatch(typeMismatch.map(_._1))) else None
            ).flatten
            Some(RowComparisonFailure(s.mkString("[", ",", "]"),
              Some(t.mkString("[", ",", "]")), items))
          }
        }
    }
}
