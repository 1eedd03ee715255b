package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StringType}
import java.util.Locale

/** Row content hashing for validation joins.
  *
  * Semantics follow the reference's content-hash join helper
  * (validation/core/ContentHashJoiner.scala:16-65):
  *  - per column: NULL hashes as sha256("1|"); non-NULL as
  *    sha256("0|" ++ stringified value); binary values are base64'd first
  *  - hashed columns are ordered case-insensitively by name so the digest
  *    is insensitive to projection order
  *  - the row digest is sha256 over the per-column digests joined by "|"
  *
  * Everything is built from codegen'd builtins (`sha2`, `concat`,
  * `concat_ws`, `when`, `base64`) — no UDF — so at scale this is one
  * whole-stage-codegen'd projection. The operational win (same as the
  * reference): replacing a wide payload with one 64-char digest before a
  * validation join shrinks the shuffle by the payload width, which is the
  * dominant cost at 100 TB.
  */
object ContentHash {

  private val NullMarker = "1|"
  private val ValueMarker = "0|"

  /** Digest for one column. */
  def columnHash(df: DataFrame, name: String): Column = {
    val c = col("`" + name.replace("`", "``") + "`")
    val stringified = df.schema(name).dataType match {
      case BinaryType => base64(c)
      case StringType => c
      case _          => c.cast(StringType)
    }
    when(c.isNull, sha2(lit(NullMarker), 256))
      .otherwise(sha2(concat(lit(ValueMarker), stringified), 256))
  }

  /** Row digest over the given columns (sorted case-insensitively). */
  def rowHash(df: DataFrame, columns: Seq[String]): Column = {
    val ordered = columns.sortBy(_.toLowerCase(Locale.ROOT))
    sha2(concat_ws("|", ordered.map(columnHash(df, _)): _*), 256)
  }

  /** Append a `_content_hash` column over `hashColumns` and drop the
    * hashed payload columns (keeping `keep`): the shuffle-volume
    * reduction rewrite from the reference.
    */
  def withContentHash(df: DataFrame, hashColumns: Seq[String], keep: Seq[String],
                      hashColumnName: String = "_content_hash"): DataFrame =
    df.withColumn(hashColumnName, rowHash(df, hashColumns))
      .drop(hashColumns.filterNot(keep.contains).toIndexedSeq: _*)

  /** DuckDB-equivalent SQL expression for `rowHash`, used to build the
    * oracle strings in SparkEntry (kept next to the Spark definition so
    * the two can't drift).
    */
  def duckdbRowHashSql(ordered: Seq[(String, String)]): String = {
    // ordered: (name, duckdbStringExpr) pairs already sorted + stringified
    val per = ordered.map { case (name, expr) =>
      s"CASE WHEN $name IS NULL THEN sha256('1|') ELSE sha256('0|' || $expr) END"
    }
    s"sha256(concat_ws('|', ${per.mkString(", ")}))"
  }
}
