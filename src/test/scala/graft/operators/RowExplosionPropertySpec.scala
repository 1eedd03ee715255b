package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Invariant sweep for the explosion transform over generated inputs:
  *  - every non-null input cell value appears in exactly one output row,
  *    and that row lists the cell in `_set_cells`
  *  - output rows carry the input PK
  *  - per input row, (ttl, writetime) pairs of output rows are distinct
  *  - group count == distinct meta-pair count (minus a dropped
  *    all-null metadata-less group)
  */
class RowExplosionPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", IntegerType),
    StructField("a", StringType), StructField("b", StringType), StructField("c", StringType),
    StructField("a_ttl", LongType), StructField("a_wt", LongType),
    StructField("b_ttl", LongType), StructField("b_wt", LongType),
    StructField("c_ttl", LongType), StructField("c_wt", LongType)))

  private val cells = Seq(
    RowExplosion.CellSpec("a", Some("a_ttl"), Some("a_wt")),
    RowExplosion.CellSpec("b", Some("b_ttl"), Some("b_wt")),
    RowExplosion.CellSpec("c", Some("c_ttl"), Some("c_wt")))

  test("explosion invariants hold over randomized inputs") {
    val rnd = new scala.util.Random(7)
    def maybe[T](v: T): Any = if (rnd.nextInt(4) == 0) null else v
    val rows = (1 to 300).map { i =>
      Row(i, maybe(s"a$i"), maybe(s"b$i"), maybe(s"c$i"),
        maybe(rnd.nextInt(3).toLong), maybe(rnd.nextInt(2).toLong),
        maybe(rnd.nextInt(3).toLong), maybe(rnd.nextInt(2).toLong),
        maybe(rnd.nextInt(3).toLong), maybe(rnd.nextInt(2).toLong))
    }
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
    val out = RowExplosion.explode(df, Seq("id"), cells).collect()
    val byId = out.groupBy(_.getInt(0))

    // the expression form satisfies the same invariants by equality
    val exprOut = RowExplosion.explodeExpr(df, Seq("id"), cells).collect()
    def canon(rs: Array[Row]) = rs.map(r =>
      (r.getInt(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3)),
        r.getSeq[String](4).toList, Option(r.get(5)), Option(r.get(6)))).toSet
    assert(canon(exprOut) == canon(out), "expression form diverges from flatMap form")

    rows.foreach { in =>
      val id = in.getInt(0)
      val outRows = byId.getOrElse(id, Array.empty)
      assert(outRows.nonEmpty, s"row $id vanished")
      // meta pairs distinct
      val metas = outRows.map(r => (r.get(5), r.get(6))).toSeq
      assert(metas.distinct.size == metas.size, s"row $id duplicate meta groups")
      // each non-null input cell appears exactly once, in a row listing it
      Seq(("a", 1), ("b", 2), ("c", 3)).foreach { case (name, ord) =>
        val inputVal = in.get(ord)
        val carriers = outRows.filter(r => r.getSeq[String](4).contains(name))
        assert(carriers.length == 1 || (inputVal == null && carriers.isEmpty),
          s"row $id cell $name carried by ${carriers.length} rows")
        carriers.foreach(r => assert(r.get(ord) == inputVal,
          s"row $id cell $name value mismatch"))
      }
      // unset cells are null in rows that don't list them
      outRows.foreach { r =>
        val listed = r.getSeq[String](4).toSet
        Seq(("a", 1), ("b", 2), ("c", 3)).foreach { case (name, ord) =>
          if (!listed.contains(name)) assert(r.isNullAt(ord))
        }
      }
    }
  }
}
