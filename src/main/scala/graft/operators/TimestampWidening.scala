package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CQL-style timestamp widening (reference: readers/Cassandra.scala:191-229).
  *
  * CQL `timestamp` is epoch *milliseconds* in a signed 64-bit value;
  * Spark's TimestampType is epoch *microseconds* in a signed 64-bit, so
  * ms→µs conversion overflows for values beyond ±292,471 years — values
  * CQL happily stores. The reference therefore replaces TimestampType
  * with LongType (epoch millis) through the entire schema, recursing
  * into struct/array/map, and widens the values to match.
  *
  * Spark-native expression: `unix_millis` handles flat columns;
  * `transform` / `transform_values` / struct rebuild handle the nested
  * cases — all codegen'd, no UDF, no row-level map.
  */
object TimestampWidening {

  /** Schema rewrite: TimestampType/TimestampNTZType -> LongType,
    * recursively (reference widenTimestampSchema, Cassandra.scala:199-208).
    */
  def widenSchema(dt: DataType): DataType = dt match {
    case TimestampType | TimestampNTZType => LongType
    case s: StructType =>
      StructType(s.fields.map(f => f.copy(dataType = widenSchema(f.dataType))))
    case a: ArrayType => a.copy(elementType = widenSchema(a.elementType))
    case m: MapType =>
      m.copy(keyType = widenSchema(m.keyType), valueType = widenSchema(m.valueType))
    case other => other
  }

  private def needsWidening(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case s: StructType => s.fields.exists(f => needsWidening(f.dataType))
    case a: ArrayType  => needsWidening(a.elementType)
    case m: MapType    => needsWidening(m.keyType) || needsWidening(m.valueType)
    case _ => false
  }

  /** Column rewrite matching `widenSchema`, built only from codegen'd
    * builtins. `unix_millis` expects TimestampType; NTZ casts to
    * TimestampType first (session-zone-free because the session is UTC).
    */
  def widenColumn(c: Column, dt: DataType): Column = dt match {
    case TimestampType    => unix_millis(c)
    case TimestampNTZType => unix_millis(c.cast(TimestampType))
    case s: StructType if needsWidening(s) =>
      // rebuild the struct field-by-field; when-null guard keeps null structs null
      when(c.isNull, lit(null).cast(widenSchema(s)))
        .otherwise(struct(s.fields.map(f =>
          widenColumn(c.getField(f.name), f.dataType).as(f.name)): _*))
    case a: ArrayType if needsWidening(a) =>
      transform(c, x => widenColumn(x, a.elementType))
    case m: MapType if needsWidening(m.valueType) && !needsWidening(m.keyType) =>
      transform_values(c, (_, v) => widenColumn(v, m.valueType))
    case m: MapType if needsWidening(m.keyType) =>
      map_from_arrays(
        transform(map_keys(c), k => widenColumn(k, m.keyType)),
        transform(map_values(c), v => widenColumn(v, m.valueType)))
    case _ => c
  }

  /** Widen every (possibly nested) timestamp in the DataFrame. */
  def widen(df: DataFrame): DataFrame = {
    val cols = df.schema.fields.map { f =>
      if (needsWidening(f.dataType)) widenColumn(col(f.name), f.dataType).as(f.name)
      else col(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }
}
