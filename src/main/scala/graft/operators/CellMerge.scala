package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink-side interpretation of the exploded cell-log contract — the
  * portable analog of what a CQL cluster does with the reference's
  * per-group UPDATE stream (writers/Scylla.scala:160-276 issues one
  * `UPDATE … USING TIMESTAMP <writetime> [AND TTL <ttl>] SET <cells in
  * _set_cells>` per exploded row). Given the log of such writes, this
  * reconstructs the resulting table state under Cassandra/Scylla
  * reconciliation rules:
  *
  *  - per (primary key, cell), the write with the greatest `writetime`
  *    wins; writes that don't list the cell in `_set_cells` never touch
  *    it (the tri-state "unset" of RowExplosion)
  *  - a NULL value in a *listed* cell is a tombstone: it deletes the
  *    cell. At equal writetime a tombstone beats a value, and two
  *    values reconcile to the greater value — Cassandra's deterministic
  *    tie-break order, so replaying the same log always converges
  *  - a missing `writetime` means "stamped at apply time", like a CQL
  *    write without USING TIMESTAMP: it is ordered as `asOfMicros`
  *  - a cell written USING TTL expires `ttl` seconds after its
  *    writetime; a cell whose winning write has expired by `asOfMicros`
  *    reads as absent
  *  - a key whose cells are all absent (deleted/expired/never set) does
  *    not exist in the reconstructed state (we don't model CQL row
  *    markers: a primary key with zero live cells is dropped)
  *
  * Plan shape: ONE hash aggregation on the primary key — per cell, a
  * `max_by` whose ordering struct is NULL for writes that don't list
  * the cell (aggregates skip NULL ordering values, so the argmax ranges
  * over exactly the writes that touched it). No unpivot, no join, no
  * window: the log shuffles once on the key and every reconciliation
  * rule is a codegen'd expression. At 100 TB the cost is the same as
  * any groupBy-on-PK — partial aggregation collapses per-key write
  * bursts map-side before the exchange.
  */
object CellMerge {

  /** Reconstruct table state at `asOfMicros` from an exploded cell log.
    *
    * @param log   rows shaped like `RowExplosion.explode` output: the
    *              `pk` columns, the `cells` columns, `_set_cells`
    *              (array of listed cell names), `ttl` (seconds, null =
    *              no expiry), `writetime` (micros, null = apply time)
    * @param cells payload columns to reconcile; each must be an
    *              orderable type (the value participates in the
    *              writetime tie-break)
    */
  def merge(log: DataFrame, pk: Seq[String], cells: Seq[String],
            asOfMicros: Long): DataFrame = {
    require(pk.nonEmpty && cells.nonEmpty, "need primary key and cell columns")
    (pk ++ cells).find(_.startsWith("__w_")).foreach(c =>
      throw new IllegalArgumentException(
        s"column name '$c' collides with the merge's internal __w_* winner columns"))
    val wt = coalesce(col(RowExplosion.WritetimeColumn), lit(asOfMicros))
    // final tie-break: longer-lived cell wins (no TTL = immortal) — two
    // writes agreeing on (writetime, value) but differing in TTL must
    // reconcile deterministically, and Cassandra keeps the one that
    // expires later. writetime + ttl·10⁶ must fit a long (micros-epoch
    // writetimes and sane TTLs are ~10¹⁵; ANSI mode throws on overflow
    // rather than wrapping).
    val expiry = coalesce(
      wt + col(RowExplosion.TtlColumn).cast("long") * lit(1000000L),
      lit(Long.MaxValue))
    val winners = cells.map { c =>
      val listed = array_contains(col(RowExplosion.SetCellsColumn), c)
      // ordering: writetime, then tombstone-beats-value, then greater
      // value, then later expiry
      val ord = when(listed, struct(
        wt.as("wt"),
        col(c).isNull.cast("int").as("tomb"),
        col(c).as("v"),
        expiry.as("exp")))
      max_by(
        struct(col(c).as("v"), wt.as("wt"),
          col(RowExplosion.TtlColumn).cast("long").as("ttl")),
        ord).as(s"__w_$c")
    }
    val merged = log.groupBy(pk.map(col): _*).agg(winners.head, winners.tail: _*)
    val finals = cells.map { c =>
      val w = col(s"__w_$c")
      val expired = w.getField("ttl").isNotNull &&
        w.getField("wt") + w.getField("ttl") * lit(1000000L) <= lit(asOfMicros)
      when(w.isNull || expired, lit(null)).otherwise(w.getField("v")).as(c)
    }
    merged
      .select(pk.map(col) ++ finals: _*)
      .where(cells.map(col(_).isNotNull).reduce(_ || _))
  }

  /** Convenience: explode a wide frame with per-cell metadata and merge
    * it back — useful for round-trip testing the full sink contract.
    */
  def roundTrip(df: DataFrame, pk: Seq[String],
                cells: Seq[RowExplosion.CellSpec], asOfMicros: Long): DataFrame =
    merge(RowExplosion.explode(df, pk, cells), pk, cells.map(_.name), asOfMicros)
}
