package graft.operators

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Property sweep for the cell-log merge: a randomized write log is
  * reconciled by a 15-line Scala model of the CQL rules (argmax by
  * (writetime, tombstone, value) over listing writes, TTL expiry,
  * all-absent rows dropped) and the distributed merge must agree
  * exactly. Randomization covers: unlisted cells, tombstones, TTL
  * mixes, writetime collisions (the deterministic tie-break), null
  * writetimes (apply-time stamping), duplicate deliveries.
  */
class CellMergePropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val logSchema = StructType(Seq(
    StructField("id", IntegerType, nullable = false),
    StructField("a", StringType),
    StructField("b", LongType),
    StructField("_set_cells", ArrayType(StringType, containsNull = false), nullable = false),
    StructField("ttl", LongType),
    StructField("writetime", LongType)))

  private val AsOf = 50L * 1000000L

  private case class W(id: Int, a: String, b: java.lang.Long,
                       set: Seq[String], ttl: java.lang.Long, wt: java.lang.Long)

  /** Reference model: winner per (id, cell) by
    * (wt, tombstone, value, expiry) — the full deterministic order.
    */
  private def model(log: Seq[W]): Map[Int, (Option[String], Option[Long])] = {
    def winner[V](ws: Seq[(Long, Option[V], Option[Long])])(
        implicit ord: Ordering[V]): Option[V] = {
      if (ws.isEmpty) None
      else {
        val (wt, v, ttl) = ws.maxBy { case (wt, v, ttl) =>
          // tombstone (None) > Some at equal wt; longer-lived wins last
          (wt, v.isEmpty, v,
            ttl.map(wt + _ * 1000000L).getOrElse(Long.MaxValue))
        }((Ordering.Tuple4(Ordering.Long, Ordering.Boolean,
          Ordering.Option(ord), Ordering.Long)))
        val expired = ttl.exists(t => wt + t * 1000000L <= AsOf)
        if (expired) None else v
      }
    }
    log.groupBy(_.id).flatMap { case (id, ws) =>
      val av = winner(ws.filter(_.set.contains("a"))
        .map(w => (Option(w.wt).map(Long.unbox).getOrElse(AsOf), Option(w.a),
          Option(w.ttl).map(Long.unbox))))
      val bv = winner(ws.filter(_.set.contains("b"))
        .map(w => (Option(w.wt).map(Long.unbox).getOrElse(AsOf),
          Option(w.b).map(Long.unbox), Option(w.ttl).map(Long.unbox))))
      if (av.isEmpty && bv.isEmpty) None else Some(id -> ((av, bv)))
    }
  }

  test("distributed merge equals the Scala model over randomized logs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val log = (1 to 400).map { _ =>
        val id = rnd.nextInt(20)
        val set = rnd.nextInt(3) match {
          case 0 => Seq("a")
          case 1 => Seq("b")
          case 2 => Seq("a", "b")
        }
        W(id,
          if (rnd.nextInt(4) == 0) null else s"v${rnd.nextInt(5)}",
          if (rnd.nextInt(4) == 0) null else Long.box(rnd.nextInt(100).toLong),
          set,
          if (rnd.nextInt(3) == 0) Long.box(rnd.nextInt(40).toLong) else null,
          // small wt space forces collisions; occasional null = apply-time
          if (rnd.nextInt(10) == 0) null
          else Long.box(rnd.nextInt(8).toLong * 1000000L))
      }
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(
          log.map(w => Row(w.id, w.a, w.b, w.set, w.ttl, w.wt))),
        logSchema)
      val got = CellMerge.merge(df, Seq("id"), Seq("a", "b"), AsOf)
        .collect()
        .map(r => r.getInt(0) -> ((Option(r.get(1)).map(_.toString),
          Option(r.get(2)).map(_.asInstanceOf[Long]))))
        .toMap
      assert(got == model(log), s"trial $trial")
    }
  }
}
