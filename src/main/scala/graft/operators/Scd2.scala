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

  /** Point-in-time-correct enrichment of a fact table against a
    * `buildHistory` output: each fact row sees the version whose
    * validity interval `[valid_from, valid_to)` contains its timestamp
    * — and NOTHING when the key was deleted before the fact (the
    * leakage-safe feature-store join; a plain as-of on `valid_from`
    * would resurrect deleted state).
    *
    * Composition, not a new plan: ONE as-of join (union+window, one
    * key shuffle, no pair expansion — see AsOfJoin) attaches the
    * latest version at-or-before the fact, then a scan-side expiry
    * mask nulls the payload when the matched interval had already
    * closed. Output columns are `pit_<payload>`.
    */
  def pointInTime(facts: DataFrame, history: DataFrame, key: String,
                  factTsCol: String, valueCols: Seq[String]): DataFrame = {
    require(history.columns.contains("valid_from") && history.columns.contains("valid_to"),
      "history must be a buildHistory output (valid_from/valid_to)")
    valueCols.foreach(c => require(!facts.columns.contains(s"pit_$c"),
      s"pit_$c is a pointInTime output column — rename the fact input's first"))
    require(!valueCols.contains(factTsCol), s"value column clashes with $factTsCol")
    require(!history.columns.contains("__vrn"), "__vrn is reserved by pointInTime")
    // AsOfJoin.asOf requires right-side uniqueness per (key, ts). Equal-
    // timestamp upserts (buildHistory's tieBreak path) emit a zero-length
    // expired version AND its survivor with the SAME valid_from — keep only
    // the survivor (open interval first, else the latest valid_to) so the
    // as-of tie is deterministic and the expiry mask can't null a fact that
    // should see the surviving version.
    val survivor = Window.partitionBy(col(key), col("valid_from"))
      .orderBy(col("valid_to").desc_nulls_first)
    val hist = history
      .withColumn("__vrn", row_number().over(survivor))
      .filter(col("__vrn") === 1).drop("__vrn")
    // the as-of union wants both sides' timeline under ONE column name:
    // the version's valid_from IS its position on the fact clock
    val joined = AsOfJoin.asOf(facts,
      hist.select((col(key) +: valueCols.map(col)) :+
        col("valid_from").as(factTsCol) :+ col("valid_to"): _*),
      Seq(key), factTsCol, valueCols :+ "valid_to")
    val expired = col("asof_valid_to").isNotNull &&
      col(factTsCol) >= col("asof_valid_to")
    valueCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"pit_$c", when(expired, lit(null)).otherwise(col(s"asof_$c")))
    }.drop((valueCols :+ "valid_to").map(c => s"asof_$c"): _*)
  }

  /** Dimension state as of one instant: the versions whose interval
    * contains `at` — a scan-side filter over the history (min/max
    * pruning applies when the history is stored sorted by valid_from).
    */
  def snapshotAt(history: DataFrame, at: Column): DataFrame =
    history.filter(col("valid_from") <= at &&
      (col("valid_to").isNull || col("valid_to") > at))

  /** Time-weighted sufficient statistics over a query window — the
    * metering/billing aggregation ("average price held during
    * January") a version history exists to answer. Per key:
    * `millis_covered` (total milliseconds any version was live inside
    * `[windowStart, windowEnd)`) and `weighted_units` (Σ value·millis
    * with the value scaled to an integer by `unitsPerValue`, e.g. 100
    * for a 2-decimal price in cents). The time-weighted average is
    * `weighted_units / (unitsPerValue · millis_covered)` — left to the
    * caller so the OUTPUT stays all-integer and engine-exact (no
    * float sum order, no decimal→double cast divergence). Deletion
    * gaps contribute nothing: a closed version's interval simply ends.
    *
    * Shape at scale: two scan-side projections (interval clamp,
    * integer scaling) + ONE key aggregation — nothing else.
    */
  def timeWeightedStats(history: DataFrame, key: String, valueCol: String,
                        windowStart: Column, windowEnd: Column,
                        unitsPerValue: Long = 100L): DataFrame = {
    require(unitsPerValue >= 1, s"unitsPerValue must be >= 1, got $unitsPerValue")
    Seq("__dur", "__units").foreach(c => require(!history.columns.contains(c),
      s"$c is reserved by timeWeightedStats"))
    val from = greatest(col("valid_from"), windowStart)
    val until = least(coalesce(col("valid_to"), windowEnd), windowEnd)
    val dur = unix_millis(until.cast("timestamp")) - unix_millis(from.cast("timestamp"))
    history
      .withColumn("__dur", dur).filter(col("__dur") > 0)
      .withColumn("__units", round(col(valueCol) * unitsPerValue).cast("long"))
      .groupBy(col(key))
      .agg(sum(col("__dur")).cast("long").as("millis_covered"),
        sum(col("__units") * col("__dur")).cast("long").as("weighted_units"))
  }

  /** INCREMENTAL history maintenance — absorb a new batch of ops into
    * an existing `buildHistory` output without replaying the full
    * change log: versions of keys the batch never touches pass
    * through UNCHANGED (no window, no rebuild — at 100 TB a day's
    * batch touches a sliver of the dimension), and only the affected
    * keys rebuild, from their existing versions RECONSTRUCTED back
    * into ops plus the new ops.
    *
    * Reconstruction is exact: every version row is one upsert at
    * `valid_from`; a closed version with no successor starting at its
    * `valid_to` contributes a delete there (the gap a delete
    * originally created — including history-final deletes). Ties
    * (equal `valid_from` versions — the zero-length-version case
    * buildHistory supports) reconstruct in `valid_to` order
    * (current/longest last), and history ops order BEFORE same-instant
    * new ops, so the law
    *
    *   appendToHistory(buildHistory(a), b) == buildHistory(a ∪ b)
    *
    * holds whenever b's ties with a's boundaries would also have
    * resolved history-first (always true for the normal case: new ops
    * strictly later than the key's last boundary). Property-swept in
    * Scd2Spec across random logs and split points.
    */
  def appendToHistory(history: DataFrame, newOps: DataFrame, key: String,
                      tsCol: String, opCol: String, upsertOp: String,
                      deleteOp: String, valueCols: Seq[String],
                      tieBreak: Seq[String] = Nil): DataFrame = {
    require(upsertOp != deleteOp, "upsertOp and deleteOp must differ")
    Seq("__src", "__vt").foreach(c =>
      require(!history.columns.contains(c) && !newOps.columns.contains(c),
        s"$c is reserved by appendToHistory"))
    val affKeys = newOps.select(col(key)).distinct()
    val affected = history.join(affKeys, Seq(key), "left_semi")
    val untouched = history.join(affKeys, Seq(key), "left_anti")

    // __vt: reconstruction tie order at equal valid_from — ISO string
    // of valid_to (lexical == chronological), '~' sorts after digits so
    // the current/longest version reconstructs LAST
    // history rows lost the original tie-break values; they re-enter as
    // typed NULLs — inert, because __src already orders history before
    // same-instant new ops and __vt orders within history
    val tieNulls = tieBreak.map(c => lit(null).cast(newOps.schema(c).dataType).as(c))
    val upserts = affected.select(
      (col(key) +: col("valid_from").as(tsCol) +: lit(upsertOp).as(opCol) +:
        valueCols.map(col)) ++ (lit(0).as("__src") +:
        coalesce(col("valid_to").cast("string"), lit("~")).as("__vt") +:
        tieNulls): _*)
    // gap deletes — one per (key, instant) where some version ENDS but
    // no SURVIVOR version (valid_to > valid_from, or current) starts.
    // Zero-length versions [T, T) must not count as their own
    // successor (they'd suppress the delete that closed them), and a
    // chain of zero-length versions at T is closed by its next member,
    // so only the survivor's absence demands a delete. Deletes sort
    // "~~" — strictly after every upsert at the instant (including a
    // CURRENT survivor's "~"), so a reconstructed delete can never
    // truncate the survivor it coexists with.
    val survivors = affected
      .filter(col("valid_to").isNull || col("valid_to") > col("valid_from"))
      .select(col(key).as("__succ_key"), col("valid_from").as("__succ_from")).distinct()
    val deletes = affected.filter(col("valid_to").isNotNull)
      .select(col(key), col("valid_to")).distinct()
      .join(survivors, col(key) === col("__succ_key") &&
        col("valid_to") === col("__succ_from"), "left_anti")
      .select(
        (col(key) +: col("valid_to").as(tsCol) +: lit(deleteOp).as(opCol) +:
          valueCols.map(c => lit(null).cast(affected.schema(c).dataType).as(c))) ++
          (lit(0).as("__src") +: lit("~~").as("__vt") +: tieNulls): _*)
    val fresh = newOps
      .filter(col(opCol) === upsertOp || col(opCol) === deleteOp)
      .select(
        (col(key) +: col(tsCol) +: col(opCol) +: valueCols.map(col)) ++
          (lit(1).as("__src") +: lit("~").as("__vt") +: tieBreak.map(col)): _*)
    val rebuilt = buildHistory(
      upserts.unionByName(deletes).unionByName(fresh),
      key, tsCol, opCol, upsertOp, deleteOp, valueCols,
      tieBreak = Seq(col("__src"), col("__vt")) ++ tieBreak.map(col))
    untouched.unionByName(rebuilt.select(untouched.columns.map(col).toIndexedSeq: _*))
  }

  /** BITEMPORAL snapshot — "what did we BELIEVE at `txAt` the state
    * was at `validAt`?" — over a correction log where every row is an
    * assertion `(key, validTs, txTs, op, values…)`: at transaction
    * time `txTs` we asserted that, as of valid time `validTs`, the
    * key's state became `values` (upsert) or ceased to exist
    * (delete). A later-tx assertion about the SAME (key, validTs)
    * supersedes the earlier one — the late-arriving correction the
    * second time axis exists for. A plain SCD2 history cannot answer
    * this: it has no record of when a fact was LEARNED, so a restated
    * audit ("reproduce January's report as we computed it on Feb 3")
    * silently absorbs corrections made after Feb 3.
    *
    * Semantics: restrict to assertions with `txTs <= txAt`; per
    * (key, validTs) keep the last assertion by (txTs, tieBreak); per
    * key keep the latest surviving validTs <= validAt; a delete there
    * means no state (row absent).
    *
    * Shape at scale: scan-side tx filter (pushes to the source) +
    * TWO windows that share the key shuffle (the second partitions by
    * a prefix of the first — no extra exchange). No joins.
    */
  def bitemporalSnapshot(log: DataFrame, key: String, validTsCol: String,
                         txTsCol: String, opCol: String, upsertOp: String,
                         deleteOp: String, valueCols: Seq[String],
                         validAt: Column, txAt: Column,
                         tieBreak: Seq[Column] = Nil): DataFrame = {
    require(upsertOp != deleteOp, "upsertOp and deleteOp must differ")
    Seq("__rn", "__vn").foreach(c => require(!log.columns.contains(c),
      s"$c is reserved by bitemporalSnapshot"))
    val known = log
      .filter(col(opCol) === upsertOp || col(opCol) === deleteOp)
      .filter(col(txTsCol) <= txAt && col(validTsCol) <= validAt)
    val byTx = Window.partitionBy(col(key), col(validTsCol))
      .orderBy((col(txTsCol).desc +: tieBreak.map(_.desc)): _*)
    val byValid = Window.partitionBy(col(key))
      .orderBy((col(validTsCol).desc +: col(txTsCol).desc +: tieBreak.map(_.desc)): _*)
    known
      .withColumn("__rn", row_number().over(byTx)).filter(col("__rn") === 1)
      .withColumn("__vn", row_number().over(byValid)).filter(col("__vn") === 1)
      .filter(col(opCol) === upsertOp)
      .select((col(key) +: col(validTsCol).as("valid_ts") +:
        col(txTsCol).as("asserted_ts") +: valueCols.map(col)): _*)
  }
}
