package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class CellMergeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val logSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("a", StringType),
    StructField("b", LongType),
    StructField("_set_cells", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ttl", LongType),
    StructField("writetime", LongType)))

  private val AsOf = 10_000_000L // 10s in micros

  private def merge(rows: Row*): Map[Int, (Option[String], Option[Long])] = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), logSchema)
    CellMerge.merge(df, Seq("id"), Seq("a", "b"), AsOf)
      .collect()
      .map(r => r.getInt(0) ->
        ((Option(r.get(1)).map(_.toString), Option(r.get(2)).map(_.asInstanceOf[Long]))))
      .toMap
  }

  private def w(id: Int, a: String, b: java.lang.Long, set: Seq[String],
                ttl: java.lang.Long, wt: java.lang.Long): Row =
    Row(id, a, b, set, ttl, wt)

  test("latest writetime wins per cell, independently") {
    val out = merge(
      w(1, "old", 1L, Seq("a", "b"), null, 100L),
      w(1, "new", null, Seq("a"), null, 200L))
    assert(out(1) == ((Some("new"), Some(1L)))) // b untouched by second write
  }

  test("unlisted cells are unset — they never overwrite") {
    val out = merge(
      w(1, "x", 5L, Seq("a", "b"), null, 100L),
      // later write carries a=null but does NOT list a: must not delete it
      w(1, null, 7L, Seq("b"), null, 200L))
    assert(out(1) == ((Some("x"), Some(7L))))
  }

  test("a listed NULL is a tombstone and deletes the cell") {
    val out = merge(
      w(1, "x", 5L, Seq("a", "b"), null, 100L),
      w(1, null, null, Seq("a"), null, 200L))
    assert(out(1) == ((None, Some(5L))))
  }

  test("writetime tie: tombstone beats value; two values pick the greater") {
    val out = merge(
      w(1, "x", null, Seq("a"), null, 100L),
      w(1, null, null, Seq("a"), null, 100L), // tombstone at same wt
      w(2, "aa", null, Seq("a"), null, 100L),
      w(2, "zz", null, Seq("a"), null, 100L))
    assert(!out.contains(1)) // only cell deleted → row gone
    assert(out(2)._1 == Some("zz"))
  }

  test("TTL expires a cell relative to its writetime; unexpired survives") {
    val out = merge(
      // wt 1s + ttl 2s = expires at 3s < asOf 10s → gone
      w(1, "dead", null, Seq("a"), 2L, 1_000_000L),
      w(1, null, 42L, Seq("b"), 60L, 1_000_000L)) // expires at 61s → live
    assert(out(1) == ((None, Some(42L))))
  }

  test("missing writetime stamps at apply time and wins over history") {
    val out = merge(
      w(1, "hist", null, Seq("a"), null, 9_999_999L),
      w(1, "now", null, Seq("a"), null, null))
    assert(out(1)._1 == Some("now"))
  }

  test("rows with zero live cells do not exist") {
    val out = merge(
      w(1, "x", null, Seq("a"), 1L, 1_000_000L), // expired
      w(2, null, null, Seq("a", "b"), null, 100L)) // both tombstoned
    assert(out.isEmpty)
  }

  test("round trip: explode then merge reproduces live wide rows") {
    val wideSchema = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("a", StringType),
      StructField("b", StringType),
      StructField("a_ttl", LongType),
      StructField("a_wt", LongType),
      StructField("b_ttl", LongType),
      StructField("b_wt", LongType)))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(1, "x", "y", null, 100L, null, 200L), // two meta groups
        Row(2, "p", null, 3_600L, 1_000_000L, null, null))),
      wideSchema)
    val cells = Seq(
      RowExplosion.CellSpec("a", Some("a_ttl"), Some("a_wt")),
      RowExplosion.CellSpec("b", Some("b_ttl"), Some("b_wt")))
    val back = CellMerge.roundTrip(df, Seq("id"), cells, AsOf)
      .collect().map(r => r.getInt(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(back(1) == ((Some("x"), Some("y"))))
    // id 2: cell a has unexpired one-hour TTL; b's tombstone-only group was
    // dropped by the explosion, so b is absent
    assert(back(2) == ((Some("p"), None)))
  }

  test("reserved __w_ column names are rejected eagerly") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq.empty[Row]), logSchema)
      .withColumnRenamed("a", "__w_b")
    assertThrows[IllegalArgumentException](
      CellMerge.merge(df, Seq("id"), Seq("__w_b", "b"), AsOf))
  }

  test("merge replays idempotently: merging the log twice is stable") {
    val rows = Seq(
      w(1, "x", 1L, Seq("a", "b"), null, 100L),
      w(1, "y", null, Seq("a"), null, 200L),
      w(1, null, 9L, Seq("b"), null, 150L))
    val once = merge(rows: _*)
    val twice = merge((rows ++ rows): _*) // duplicated delivery
    assert(once == twice)
    assert(once(1) == ((Some("y"), Some(9L))))
  }
}
