package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The reference's signature transform (readers/Cassandra.scala:113-169):
  * one wide row carrying per-cell `ttl`/`writetime` metadata becomes N
  * narrow rows — one per distinct `(ttl, writetime)` group — with the
  * primary key repeated, the cells outside the group left *unset*, and
  * uniform `ttl`/`writetime` columns appended for the sink.
  *
  * Tri-state semantics (the reference's CassandraOption.{Value,Null,Unset},
  * SURVEY.md §7 hard part #1): Spark rows are two-state, so "unset" is
  * carried out-of-band in a `_set_cells` array column listing which cell
  * columns are actually set in each output row. Only a CQL-style sink
  * interprets it; every other operator can ignore it. A NULL in a listed
  * cell means "write NULL"; an unlisted cell means "don't touch".
  *
  * Tombstone avoidance (reference readers/Cassandra.scala:150-160): the
  * metadata-less group — (null ttl, null writetime) with every cell value
  * NULL — is dropped entirely, because writing it would only create
  * tombstones.
  *
  * Implementation: a `flatMap` over `Dataset[Row]` with ordinals resolved
  * once on the driver. This is per-row imperative logic over column
  * *sets* (not a per-value `explode`), which is exactly the case where
  * `flatMap` beats a generator expression; the surrounding plan stays
  * declarative, and the output is a normal DataFrame that downstream
  * writes repartition/sort as needed. Cost model at scale: output rows =
  * input rows × distinct-meta-groups (bounded by cell count), no shuffle
  * introduced here.
  */
object RowExplosion {

  /** One logical cell: a payload column plus optional per-cell metadata
    * columns holding its TTL / writetime.
    */
  final case class CellSpec(name: String, ttlCol: Option[String], writetimeCol: Option[String])

  val SetCellsColumn = "_set_cells"
  val TtlColumn = "ttl"
  val WritetimeColumn = "writetime"

  def explode(df: DataFrame, pk: Seq[String], cells: Seq[CellSpec]): DataFrame = {
    val schema = df.schema
    val pkOrdinals = pk.map(schema.fieldIndex).toArray
    val cellOrdinals = cells.map(c => schema.fieldIndex(c.name)).toArray
    val ttlOrdinals = cells.map(_.ttlCol.map(schema.fieldIndex).getOrElse(-1)).toArray
    val wtOrdinals = cells.map(_.writetimeCol.map(schema.fieldIndex).getOrElse(-1)).toArray
    val cellNames = cells.map(_.name).toArray

    val outSchema = StructType(
      pk.map(schema(_)) ++
        cells.map(c => schema(c.name).copy(nullable = true)) :+
        StructField(SetCellsColumn, ArrayType(StringType, containsNull = false), nullable = false) :+
        StructField(TtlColumn, LongType, nullable = true) :+
        StructField(WritetimeColumn, LongType, nullable = true))

    def metaAt(row: Row, ord: Int): Option[Long] =
      if (ord < 0 || row.isNullAt(ord)) None
      else Some(row.get(ord).asInstanceOf[Number].longValue())

    df.flatMap { row =>
      val pkValues = pkOrdinals.map(row.get)
      // group cells by their (ttl, writetime) pair; deterministic order:
      // nulls-first ascending on (ttl, writetime)
      val groups = cellNames.indices
        .groupBy(i => (metaAt(row, ttlOrdinals(i)), metaAt(row, wtOrdinals(i))))
        .toSeq
        .sortBy { case ((t, w), _) => (t.isDefined, t.getOrElse(0L), w.isDefined, w.getOrElse(0L)) }
      groups.flatMap { case ((ttl, wt), members) =>
        val memberSet = members.toSet
        val allNull = members.forall(i => row.isNullAt(cellOrdinals(i)))
        if (ttl.isEmpty && wt.isEmpty && allNull && groups.size > 1) None // tombstone-only group
        else {
          val cellValues = cellNames.indices.map { i =>
            if (memberSet.contains(i)) row.get(cellOrdinals(i)) else null
          }
          val setCells = members.map(cellNames(_)).sorted
          Some(Row.fromSeq(
            pkValues.toSeq ++ cellValues ++
              Seq(setCells, ttl.map(Long.box).orNull, wt.map(Long.box).orNull)))
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Expression-only form of `explode` — same output set, but built from
    * `transform`/`array_distinct`/`filter` + the `inline` generator, so
    * the whole transform stays inside whole-stage codegen with no
    * object-encoder round trip (the flatMap form pays
    * DeserializeToObject/SerializeFromObject per row). The cell-spec
    * list is static, so per-group membership unrolls into null-safe
    * equality predicates at plan time.
    *
    * Kept alongside the flatMap form (the readable reference
    * implementation); RowExplosionSpec proves them row-equal.
    */
  def explodeExpr(df: DataFrame, pk: Seq[String], cells: Seq[CellSpec]): DataFrame = {
    val keepCol = "__keep"
    def metaCol(o: Option[String]): Column =
      o.map(c => col(c).cast("long")).getOrElse(lit(null).cast("long"))
    // distinct (ttl, writetime) groups, first-occurrence order
    val gs = array_distinct(array(cells.map(c =>
      struct(metaCol(c.ttlCol).as("ttl"), metaCol(c.writetimeCol).as("wt"))): _*))
    def member(c: CellSpec, g: Column): Column =
      metaCol(c.ttlCol) <=> g.getField("ttl") &&
        metaCol(c.writetimeCol) <=> g.getField("wt")
    val sortedNames = cells.sortBy(_.name)
    val rows = transform(gs, g => {
      // tombstone-avoidance: the metadata-less all-NULL group is dropped
      // unless it is the row's only group
      val allNull = cells.map(c => !member(c, g) || col(c.name).isNull).reduce(_ && _)
      val keep = !(g.getField("ttl").isNull && g.getField("wt").isNull &&
        allNull && size(gs) > 1)
      struct(
        cells.map(c => when(member(c, g), col(c.name)).as(c.name)) ++ Seq(
          filter(array(sortedNames.map(c => when(member(c, g), lit(c.name))): _*),
            x => x.isNotNull).as(SetCellsColumn),
          g.getField("ttl").as(TtlColumn),
          g.getField("wt").as(WritetimeColumn),
          keep.as(keepCol)): _*)
    })
    df.select(pk.map(col) :+ inline(filter(rows, s => s.getField(keepCol))): _*)
      .drop(keepCol)
  }
}
