package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) file clustering: interleave the bits of
  * several integer dimensions into one sort key, then range-partition +
  * sort the data by it. Each output file then covers a tight
  * multi-dimensional bounding box, so parquet row-group min/max stats on
  * the ORIGINAL columns prune scans for predicates on ANY clustered
  * dimension — the layout answer to "we filter this 100 TB table by two
  * different keys" that a single-column sort (`target.sortBy`) cannot
  * give. (Same idea as the reference's per-segment/token-range layout
  * pressure, generalized to N dimensions; see SURVEY.md §2.14 data
  * layout.)
  *
  * The z-value is a pure bit-interleave expression (shift/and/or terms,
  * whole-stage codegen; no UDF, no shuffle beyond the final range
  * repartition) and is engine-portable: the DuckDB oracle replicates it
  * with the same integer arithmetic bit-for-bit.
  */
object ZOrder {

  /** Morton code of `cols` at `bits` bits per dimension (bit i of
    * dimension j lands at position i·n + j). Values are clamped into
    * [0, 2^bits) by pmod — callers whose domains exceed 2^bits should
    * pre-rank (e.g. `percent_rank`-bucket) to preserve locality, since
    * wrap-around interleaves distant values.
    */
  def zValue(cols: Seq[Column], bits: Int = 16): Column = {
    val n = cols.length
    require(n >= 2, "z-ordering needs at least two dimensions")
    require(bits >= 1 && n * bits <= 63, s"$n dims x $bits bits must fit a Long")
    val clamped = cols.map(c => pmod(c.cast("long"), lit(1L << bits)))
    val terms = for {
      i <- 0 until bits
      (c, j) <- clamped.zipWithIndex
    } yield shiftleft(shiftright(c, i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Integer-exact linear map of [minV, maxV] onto [0, 2^bits): scale
    * every dimension to the SAME bit width before interleaving, or the
    * wider dimension owns all the high z bits and the curve degenerates
    * to a 1-D sort on it (ZOrderSpec demonstrates this on the lineitem
    * dims). All arithmetic stays exact: the numerator is ≤ (maxV−minV)·
    * (2^bits−1) < 2^53 for any sane bits, and the subtract-pmod division
    * is integral, so the double division below is error-free and
    * engine-portable.
    */
  def scaleTo(c: Column, minV: Long, maxV: Long, bits: Int = 16): Column = {
    require(maxV > minV, "scaleTo needs a non-degenerate range")
    // enforce the exactness bound the arithmetic below depends on: the
    // numerator (maxV-minV)·(2^bits−1) must stay under 2^53 or the
    // double division silently rounds (and the Long multiply can throw
    // under ANSI) — loud error beats silent mis-clustering. subtractExact
    // because maxV-minV itself can wrap for full-Long-range dimensions
    // (e.g. a hash column), which would slip past a plain comparison.
    val range =
      try Math.subtractExact(maxV, minV)
      catch { case _: ArithmeticException =>
        throw new IllegalArgumentException(
          s"scaleTo range [$minV, $maxV] overflows Long; pre-bucket the column")
      }
    require(range <= (1L << 53) / ((1L << bits) - 1),
      s"scaleTo range $range x $bits bits exceeds the exact-arithmetic " +
        "bound (2^53); pre-bucket the column or use fewer bits")
    val clamped = least(greatest(c.cast("long"), lit(minV)), lit(maxV))
    val num = (clamped - lit(minV)) * lit((1L << bits) - 1)
    val den = lit(maxV - minV)
    ((num - pmod(num, den)) / den).cast("long") // exact floor division
  }

  /** Rewrite `df` into `numFiles` z-clustered files-worth of partitions:
    * range-partition on the z-value (sampled range bounds balance file
    * sizes even on skewed dimensions), sort within each partition, drop
    * the key. Write the result with any sink; downstream scans get
    * multi-dimensional row-group pruning for free.
    */
  def cluster(df: DataFrame, cols: Seq[String], bits: Int = 16,
              numFiles: Int = 0): DataFrame =
    clusterBy(df, zValue(cols.map(col), bits), numFiles)

  /** Same, with a caller-built z key — use `zValue(Seq(scaleTo(...)))`
    * when dimension domains differ in width (they usually do).
    */
  def clusterBy(df: DataFrame, z: Column, numFiles: Int = 0): DataFrame = {
    val withZ = df.withColumn("__z", z)
    val ranged =
      if (numFiles > 0) withZ.repartitionByRange(numFiles, col("__z"))
      else withZ.repartitionByRange(col("__z"))
    ranged.sortWithinPartitions("__z").drop("__z")
  }

  /** The same z-value as an ANSI SQL string over column names — the
    * oracle-side twin of [[zValue]] (DuckDB `%`, `&`, `|`, `<<`, `>>`
    * on BIGINT match Spark's pmod/bitwise ops on these non-negative
    * clamped domains).
    */
  def zValueSql(cols: Seq[String], bits: Int = 16): String = {
    val n = cols.length
    require(n >= 2, "z-ordering needs at least two dimensions")
    require(bits >= 1 && n * bits <= 63, s"$n dims x $bits bits must fit a Long")
    val mask = 1L << bits
    val terms = for {
      i <- 0 until bits
      (c, j) <- cols.zipWithIndex
      // double-% = pmod: SQL % keeps the sign of the dividend, Spark's
      // pmod is non-negative — without the second %, negative inputs
      // would silently diverge between the twins
    } yield s"(((((CAST($c AS BIGINT) % $mask + $mask) % $mask) >> $i) & 1) << ${i * n + j})"
    terms.mkString("(", " | ", ")")
  }
}
