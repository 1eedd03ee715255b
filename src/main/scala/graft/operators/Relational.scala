package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import java.util.Locale

/** Column-level transforms from the reference's migration surface:
  * renames, internal-column drops, case-insensitive schema resolution,
  * null-primary-key filtering, and meta-column prefix handling.
  *
  * Reference behavior being reproduced (see SURVEY.md §2.3/§2.4):
  *  - renames applied as a fold of `withColumnRenamed`
  *    (reference: writers/Scylla.scala:131-136, config/Rename.scala:16-46)
  *  - internal columns dropped before the sink
  *    (reference: writers/Scylla.scala:109-154)
  *  - case-insensitive name resolution, exact-case first then
  *    Locale.ROOT lowercase fallback, with collision detection
  *    (reference: schema/SchemaResolver.scala:14-61)
  *  - null-PK row drop with an observable drop count
  *    (reference: writers/Scylla.scala:81-107,232-258)
  *  - parquet round-trip meta column prefix `__graft_meta_<col>_<kind>`
  *    (reference: readers/TimestampColumns.scala:14-61)
  *
  * All of these stay inside the declarative plan (`select` / `filter` /
  * `withColumnRenamed`) so Catalyst still prunes and pushes down through
  * them — at 100 TB a rename must not materialize anything, and these
  * don't.
  */
object Relational {

  final case class Rename(from: String, to: String)

  /** Apply renames in ONE pass (each original column maps at most once);
    * missing source columns are ignored. A fold of `withColumnRenamed`
    * would let a later rename capture an earlier one's output —
    * columns [a, b] with renames [a->b, b->c] yields duplicate [c, c].
    * Source matching is case-insensitive, like the reference's rename map.
    *
    * Collision validation runs here, not just in the opt-in
    * [[validateRenames]]: two distinct columns mapping to one target
    * (e.g. `A` and `a` both matching a lowercase source), duplicate
    * targets, or a target equal to a surviving column would otherwise
    * silently produce duplicate output columns. Missing sources stay
    * non-fatal (reference semantics: a rename for an absent column is
    * ignored).
    */
  def applyRenames(df: DataFrame, renames: Seq[Rename]): DataFrame = {
    if (renames.isEmpty) df
    else {
      val byLower = renames.map(r => r.from.toLowerCase(Locale.ROOT) -> r.to).toMap
      // duplicate output names, from any source: two columns hitting the
      // same rename entry, two entries sharing a target, or a target
      // shadowing a column that survives un-renamed
      val outNames = df.columns.map { c =>
        byLower.getOrElse(c.toLowerCase(Locale.ROOT), c).toLowerCase(Locale.ROOT)
      }
      val dups = outNames.diff(outNames.distinct).distinct
      require(dups.isEmpty,
        s"renames would produce duplicate column(s): ${dups.mkString(", ")}")
      df.select(df.columns.toIndexedSeq.map { c =>
        byLower.get(c.toLowerCase(Locale.ROOT)) match {
          case Some(to) => col(escaped(c)).as(to)
          case None     => col(escaped(c))
        }
      }: _*)
    }
  }

  /** Key rename over a MapType column — the reference's DynamoDB item
    * rename (`renamesMap.getOrElse(key, key)` per item entry,
    * writers/DynamoStreamReplication.scala:74-76,87-89), expressed as a
    * codegen'd `transform_keys` when-chain: no UDF, no per-row Scala.
    *
    * Matching is case-SENSITIVE throughout (DynamoDB attribute names
    * are), so the target-collision guard is too — unlike the
    * case-insensitive DataFrame-column [[validateRenames]]. A target
    * equal to an UNRENAMED key that happens to exist in some row cannot
    * be checked statically (map contents are per-row); such a clash
    * surfaces at runtime as Spark's DUPLICATE_MAP_KEY error.
    */
  def renameMapKeys(m: Column, renames: Seq[Rename]): Column = {
    val dup = renames.groupBy(_.to).filter(_._2.size > 1)
    require(dup.isEmpty, s"rename targets collide: ${dup.keys.mkString(", ")}")
    if (renames.isEmpty) m
    else transform_keys(m, (k, _) =>
      renames.foldLeft(k)((cur, r) => when(k === lit(r.from), lit(r.to)).otherwise(cur)))
  }

  /** Validate a rename list against a schema: every `from` must resolve
    * (case-insensitively) and no two renames may collide on the target
    * name (case-insensitively).
    */
  def validateRenames(columns: Seq[String], renames: Seq[Rename]): Either[String, Unit] = {
    val lower = columns.map(_.toLowerCase(Locale.ROOT)).toSet
    val missing = renames.filterNot(r => lower.contains(r.from.toLowerCase(Locale.ROOT)))
    if (missing.nonEmpty)
      Left(s"rename source(s) not found: ${missing.map(_.from).mkString(", ")}")
    else {
      val targets = renames.map(_.to.toLowerCase(Locale.ROOT))
      val dups = targets.diff(targets.distinct).distinct
      // a target may also collide with a column that survives un-renamed
      val renamedSources = renames.map(_.from.toLowerCase(Locale.ROOT)).toSet
      val surviving = columns.map(_.toLowerCase(Locale.ROOT)).filterNot(renamedSources.contains)
      val clashes = targets.toSet.intersect(surviving.toSet)
      if (dups.nonEmpty) Left(s"rename target collision(s): ${dups.mkString(", ")}")
      else if (clashes.nonEmpty)
        Left(s"rename target(s) collide with existing column(s): ${clashes.mkString(", ")}")
      else Right(())
    }
  }

  /** Drop connector-internal columns if present (case-insensitive). */
  def dropInternalColumns(df: DataFrame, internal: Seq[String]): DataFrame = {
    val lower = internal.map(_.toLowerCase(Locale.ROOT)).toSet
    val present = df.columns.filter(c => lower.contains(c.toLowerCase(Locale.ROOT)))
    if (present.isEmpty) df else df.drop(present.toIndexedSeq: _*)
  }

  /** Case-insensitive column resolution: exact match wins, otherwise a
    * unique lowercase match; ambiguity and absence are errors.
    */
  def resolve(columns: Seq[String], requested: String): Either[String, String] =
    columns.find(_ == requested) match {
      case Some(c) => Right(c)
      case None =>
        val lower = requested.toLowerCase(Locale.ROOT)
        columns.filter(_.toLowerCase(Locale.ROOT) == lower) match {
          case Seq(one) => Right(one)
          case Seq()    => Left(s"column not found: $requested")
          case many     => Left(s"ambiguous column $requested: ${many.mkString(", ")}")
        }
    }

  /** Backtick-escape a column name for use in a Spark column reference. */
  def escaped(name: String): String = "`" + name.replace("`", "``") + "`"

  /** Select the requested columns (resolved case-insensitively) and alias
    * them back to the requested spelling.
    */
  def selectResolved(df: DataFrame, requested: Seq[String]): DataFrame = {
    val cols = requested.map { r =>
      resolve(df.columns.toIndexedSeq, r) match {
        case Right(actual) => col(escaped(actual)).as(r)
        case Left(err)     => throw new IllegalArgumentException(err)
      }
    }
    df.select(cols: _*)
  }

  /** Drop rows with any null primary-key component, counting drops via
    * `observe` (the Spark-native replacement for the reference's
    * accumulator): the metric is collected with NO extra pass over the
    * data, which matters when the scan is 100 TB.
    */
  private val obsCounter = new java.util.concurrent.atomic.AtomicLong()

  def dropNullPrimaryKeys(df: DataFrame, pk: Seq[String],
                          observationName: String = ""): DataFrame = {
    require(pk.nonEmpty, "dropNullPrimaryKeys needs at least one key column")
    val anyNull = pk.map(c => col(escaped(c)).isNull).reduce(_ || _)
    // default name carries a process-unique suffix: observation names
    // must be unique per query, and two drops over different tables
    // with the same key names (e.g. a union of sources keyed `id`)
    // would otherwise collide
    val name = if (observationName.nonEmpty) observationName
      else s"null_pk_drop_${pk.mkString("_")}_${obsCounter.incrementAndGet()}"
    df.observe(name, sum(when(anyNull, 1L).otherwise(0L)).as("rows_dropped"))
      .filter(!anyNull)
  }

  /** Prefix columns `src_`/`tgt_` before a diff join (reference:
    * schema/SchemaResolver.scala:90-91).
    */
  def prefixed(df: DataFrame, prefix: String): DataFrame =
    df.select(df.columns.toIndexedSeq.map(c => col(escaped(c)).as(prefix + c)): _*)

  // --- parquet round-trip meta columns (reference: readers/TimestampColumns.scala) ---

  val MetaPrefix = "__graft_meta_"

  def isMetaColumn(name: String): Boolean = name.startsWith(MetaPrefix)

  /** `c_ttl` -> `__graft_meta_c_ttl` for the named payload columns. */
  def addMetaPrefix(df: DataFrame, metaCols: Seq[String]): DataFrame =
    metaCols.foldLeft(df)((d, c) => d.withColumnRenamed(c, MetaPrefix + c))

  def stripMetaPrefix(df: DataFrame): DataFrame =
    df.columns.filter(isMetaColumn).foldLeft(df) { (d, c) =>
      d.withColumnRenamed(c, c.stripPrefix(MetaPrefix))
    }

  def dropMetaColumns(df: DataFrame): DataFrame = {
    val metas = df.columns.filter(isMetaColumn)
    if (metas.isEmpty) df else df.drop(metas.toIndexedSeq: _*)
  }
}
