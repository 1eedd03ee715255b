package graft.operators

import java.sql.Timestamp
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class TimestampWideningSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val ts = Timestamp.valueOf("2020-06-01 12:30:45.123")
  private val millis = ts.getTime // session UTC

  test("schema rewrite recurses through struct/array/map") {
    val in = StructType(Seq(
      StructField("t", TimestampType),
      StructField("s", StructType(Seq(StructField("inner", TimestampType)))),
      StructField("a", ArrayType(TimestampType)),
      StructField("m", MapType(StringType, TimestampType)),
      StructField("keep", IntegerType)))
    val out = TimestampWidening.widenSchema(in).asInstanceOf[StructType]
    assert(out("t").dataType == LongType)
    assert(out("s").dataType.asInstanceOf[StructType]("inner").dataType == LongType)
    assert(out("a").dataType == ArrayType(LongType))
    assert(out("m").dataType == MapType(StringType, LongType))
    assert(out("keep").dataType == IntegerType)
  }

  test("values widen to epoch millis through nesting, nulls preserved") {
    val schema = StructType(Seq(
      StructField("t", TimestampType),
      StructField("s", StructType(Seq(StructField("inner", TimestampType), StructField("n", IntegerType)))),
      StructField("a", ArrayType(TimestampType)),
      StructField("m", MapType(StringType, TimestampType))))
    val rows = Seq(
      Row(ts, Row(ts, 7), Seq(ts, null), Map("k" -> ts)),
      Row(null, null, null, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val wide = TimestampWidening.widen(df)
    assert(wide.schema == TimestampWidening.widenSchema(schema))
    val got = wide.collect()
    val r = got.find(_.get(0) != null).get
    assert(r.getLong(0) == millis)
    assert(r.getStruct(1).getLong(0) == millis && r.getStruct(1).getInt(1) == 7)
    assert(r.getSeq[Any](2) == Seq(millis, null))
    assert(r.getMap[String, Long](3) == Map("k" -> millis))
    val nulls = got.find(_.get(0) == null).get
    assert((0 to 3).forall(nulls.isNullAt))
  }

  test("ntz timestamps widen identically under UTC session") {
    import spark.implicits._
    val df = Seq(Tuple1(java.time.LocalDateTime.parse("2020-06-01T12:30:45.123")))
      .toDF("t")
    assert(df.schema("t").dataType == TimestampNTZType)
    val got = TimestampWidening.widen(df).collect().head.getLong(0)
    assert(got == millis)
  }
}
