package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Type-2 slowly-changing-dimension history from a change log: every
  * upsert opens a version valid from its own timestamp until the NEXT
  * operation on the same key (upsert or delete); a delete closes the
  * open version without opening one; the last operation being an
  * upsert marks that version current. This is the batch twin of
  * `streaming/CdcApply` — CdcApply keeps only the latest state, Scd2
  * keeps the full validity history a warehouse dimension needs.
  *
  * Shape at scale: ONE window shuffle on the key (lead over the
  * per-key op sequence) — no self-join, no per-key collection. The
  * change log is scanned once with the op-type filter pushed down.
  */
object Scd2 {

  /** Build the version history.
    *
    * @param tieBreak deterministic order for equal timestamps within a
    *   key (pass a unique column, e.g. the log sequence number); ties
    *   are resolved in ascending order like `Sessionize`.
    * @return one row per upsert: key, value columns, `valid_from`,
    *   `valid_to` (NULL while current), `is_current`.
    */
  def buildHistory(log: DataFrame, key: String, tsCol: String, opCol: String,
                   upsertOp: String, deleteOp: String, valueCols: Seq[String],
                   tieBreak: Seq[Column] = Nil): DataFrame = {
    Seq("valid_from", "valid_to", "is_current").foreach(c =>
      require(!log.columns.contains(c), s"$c is an Scd2 output column — rename the input's first"))
    require(upsertOp != deleteOp, "upsertOp and deleteOp must differ")

    val ops = log.filter(col(opCol) === upsertOp || col(opCol) === deleteOp)
    val order = col(tsCol).asc +: tieBreak.map(_.asc)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
    ops
      .withColumn("valid_to", lead(col(tsCol), 1).over(w))
      .filter(col(opCol) === upsertOp)
      .select(
        (col(key) +: valueCols.map(col)) ++ Seq(
          col(tsCol).as("valid_from"),
          col("valid_to"),
          col("valid_to").isNull.as("is_current")): _*)
  }
}
