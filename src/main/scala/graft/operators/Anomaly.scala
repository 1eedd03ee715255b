package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Rolling z-score anomaly flags over per-key time series — the
  * monitoring question a migration/ingest pipeline asks of its own
  * telemetry ("did this supplier's prices jump?"). Not in the
  * reference (its validator compares copies, it doesn't screen a
  * single stream); a standard observability operator, expressed to
  * be exact.
  *
  * The test is the textbook one: flag x when |x − μ| > z·σ with μ/σ
  * from the N points BEFORE x (the trailing baseline — excluding x
  * itself so a spike can't mask itself). Run naively in floating
  * point the flag flips on summation order, which breaks retry/
  * engine determinism. So the whole predicate is integer arithmetic
  * on an integer-scaled value column:
  *
  *   |x − s/n| > z·σ   ⟺   (n·x − s)² > z²·(n·q − s²)
  *
  * with s = Σxᵢ, q = Σxᵢ² over the window — both exact BIGINTs, and
  * the comparison a cross-multiplication with no division anywhere.
  * Overflow bound: |n·x−s| ≤ 2·n·M and n·q ≤ n²·M² for |x| ≤ M, so
  * the guard requires z²·(n·M)²·4 < 2⁶³ — e.g. M = 10⁷ (prices in
  * cents), n = 100, z = 3 uses ~9·10¹⁸… just over; the `require`
  * enforces the caller-declared bound and callers with larger values
  * pre-scale (anomaly detection does not need cent precision on
  * billion-unit values).
  *
  * Plan shape at 100 TB: ONE window over (key ORDER BY order) — a
  * single hash-partitioned sort per key, no self-join, no global
  * sort. Ordering must be made total by the caller's `orderBy` list
  * (ties ⇒ nondeterministic baselines).
  */
object Anomaly {

  /** Adds `n_base` (baseline size), `flagged` (BOOLEAN; false until
    * `minPoints` baseline rows exist) to `df`.
    *
    * @param valueCol integer-typed column (pre-scale decimals:
    *                 `(price*100).cast("long")`), |value| ≤ maxAbsValue
    * @param z        integer z-threshold (e.g. 3)
    */
  def rollingZFlags(df: DataFrame, keyCols: Seq[String], orderBy: Seq[Column],
                    valueCol: String, window: Int, minPoints: Int, z: Int,
                    maxAbsValue: Long): DataFrame = {
    require(window >= 2 && minPoints >= 2 && minPoints <= window, "need 2 <= minPoints <= window")
    require(z >= 1, "z must be >= 1")
    require(maxAbsValue > 0 &&
      BigInt(z) * BigInt(z) * BigInt(4) *
        (BigInt(window) * BigInt(maxAbsValue)).pow(2) < BigInt(Long.MaxValue),
      s"z=$z, window=$window, maxAbsValue=$maxAbsValue can overflow 64-bit " +
        "cross-multiplication — pre-scale the value column down")
    require(Seq("n_base", "flagged").forall(!df.columns.contains(_)),
      "n_base/flagged are reserved by rollingZFlags")

    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderBy: _*)
      .rowsBetween(-window, -1)
    val x = col(valueCol).cast("long")
    val n = count(x).over(w)
    val s = sum(x).over(w)
    val q = sum(x * x).over(w)
    val lhs = (n * x - s) * (n * x - s)
    val rhs = lit(z.toLong * z) * (n * q - s * s)
    df.withColumn("n_base", coalesce(n, lit(0L)))
      .withColumn("flagged",
        col("n_base") >= minPoints && x.isNotNull && lhs > rhs)
  }
}
