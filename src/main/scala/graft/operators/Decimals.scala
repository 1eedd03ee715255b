package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataTypes, DecimalType}

/** Decimal canonicalization (reference: writers/Scylla.scala:344-355 —
  * opt-in stripping of trailing zeros so `2.50` and `2.5` write
  * identically to sinks that compare textually).
  *
  * Column form: cast through string with regexp-based zero strip, which
  * stays in codegen. The Scala form for row-level paths lives in
  * validation.NumericComparison.stripTrailingZeros.
  */
object Decimals {

  /** Canonical string form of a decimal column: no trailing zeros, no
    * trailing dot, "-0" folded to "0".
    */
  def canonicalString(c: Column): Column = {
    val s = c.cast("string")
    val stripped = when(s.contains("."),
      regexp_replace(regexp_replace(s, "0+$", ""), "\\.$", ""))
      .otherwise(s)
    when(stripped === "-0", lit("0")).otherwise(stripped)
  }

  /** Apply canonicalization to every decimal column (kept as decimal,
    * value unchanged, scale normalized via double round-trip avoided —
    * the canonical *comparison key* is the string form).
    */
  def withCanonicalKeys(df: DataFrame, suffix: String = "_canon"): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      f.dataType match {
        case _: DecimalType => d.withColumn(f.name + suffix, canonicalString(col(f.name)))
        case _ => d
      }
    }
}
