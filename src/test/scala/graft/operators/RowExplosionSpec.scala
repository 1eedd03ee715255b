package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class RowExplosionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("a", StringType),
    StructField("b", StringType),
    StructField("a_ttl", LongType),
    StructField("a_wt", LongType),
    StructField("b_ttl", LongType),
    StructField("b_wt", LongType)))

  private def explode(rows: Row*) = {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.toIndexedSeq), schema)
    RowExplosion.explode(df, Seq("id"), Seq(
      RowExplosion.CellSpec("a", Some("a_ttl"), Some("a_wt")),
      RowExplosion.CellSpec("b", Some("b_ttl"), Some("b_wt"))))
      .collect().toSeq.sortBy(r => (r.getInt(0), Option(r.get(5)).map(_.toString).getOrElse("")))
  }

  test("cells sharing (ttl, writetime) stay in one row") {
    val out = explode(Row(1, "x", "y", 10L, 100L, 10L, 100L))
    assert(out.size == 1)
    val r = out.head
    assert(r.getString(1) == "x" && r.getString(2) == "y")
    assert(r.getSeq[String](3) == Seq("a", "b"))
    assert(r.getLong(4) == 10L && r.getLong(5) == 100L)
  }

  test("distinct meta groups split into rows with unset cells excluded from _set_cells") {
    val out = explode(Row(2, "x", "y", 10L, 100L, 20L, 200L))
    assert(out.size == 2)
    val byTtl = out.map(r => r.getLong(4) -> r).toMap
    assert(byTtl(10L).getString(1) == "x" && byTtl(10L).get(2) == null)
    assert(byTtl(10L).getSeq[String](3) == Seq("a"))
    assert(byTtl(20L).get(1) == null && byTtl(20L).getString(2) == "y")
    assert(byTtl(20L).getSeq[String](3) == Seq("b"))
  }

  test("all-null metadata-less group is dropped when other groups exist (tombstone avoidance)") {
    val out = explode(Row(3, null, "y", null, null, 20L, 200L))
    assert(out.size == 1)
    assert(out.head.getSeq[String](3) == Seq("b"))
  }

  test("sole group survives even when all values are null (row marker kept)") {
    val out = explode(Row(4, null, null, null, null, null, null))
    assert(out.size == 1)
    assert(out.head.get(4) == null && out.head.get(5) == null)
  }

  private def canon(rows: Array[Row]): Set[Seq[Any]] =
    rows.map(r => Seq(r.get(0), r.get(1), r.get(2),
      r.getSeq[String](3).toList, r.get(4), r.get(5))).toSet

  test("expression form equals the flatMap form (crafted rows + real data)") {
    val crafted = Seq(
      Row(1, "x", "y", 10L, 100L, 10L, 100L),
      Row(2, "x", "y", 10L, 100L, 20L, 200L),
      Row(3, null, "y", null, null, 20L, 200L),
      Row(4, null, null, null, null, null, null),
      Row(5, "x", null, 10L, null, null, null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(crafted.toIndexedSeq), schema)
    val specs = Seq(
      RowExplosion.CellSpec("a", Some("a_ttl"), Some("a_wt")),
      RowExplosion.CellSpec("b", Some("b_ttl"), Some("b_wt")))
    val viaFlatMap = canon(RowExplosion.explode(df, Seq("id"), specs).collect())
    val viaExpr = canon(RowExplosion.explodeExpr(df, Seq("id"), specs).collect())
    assert(viaExpr == viaFlatMap)

    // real data: the q_explode_cells input shape at the smallest SF
    val li = graft.Tables.load(spark, TestSpark.sf, "lineitem").selectExpr(
      "l_orderkey", "l_linenumber", "l_quantity as qty", "l_extendedprice as price",
      "cast(l_suppkey % 3 as long) as qty_ttl", "cast(l_partkey % 2 as long) as qty_wt",
      "cast(l_suppkey % 5 as long) as price_ttl", "cast(l_partkey % 4 as long) as price_wt")
    val realSpecs = Seq(
      RowExplosion.CellSpec("qty", Some("qty_ttl"), Some("qty_wt")),
      RowExplosion.CellSpec("price", Some("price_ttl"), Some("price_wt")))
    val a = RowExplosion.explode(li, Seq("l_orderkey", "l_linenumber"), realSpecs)
    val b = RowExplosion.explodeExpr(li, Seq("l_orderkey", "l_linenumber"), realSpecs)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("expression form stays in codegen: no object-encoder round trip") {
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(1, "x", "y", 10L, 100L, 10L, 100L))), schema)
    val specs = Seq(
      RowExplosion.CellSpec("a", Some("a_ttl"), Some("a_wt")),
      RowExplosion.CellSpec("b", Some("b_ttl"), Some("b_wt")))
    val exprPlan = RowExplosion.explodeExpr(df, Seq("id"), specs)
      .queryExecution.executedPlan.toString
    assert(!exprPlan.contains("DeserializeToObject") && !exprPlan.contains("MapPartitions"),
      s"object round trip in expression form:\n$exprPlan")
    assert(exprPlan.contains("Generate")) // inline generator
    // the flatMap reference form does pay the round trip — that's the
    // cost the expression form removes
    val fmPlan = RowExplosion.explode(df, Seq("id"), specs)
      .queryExecution.executedPlan.toString
    assert(fmPlan.contains("DeserializeToObject"))
  }
}
