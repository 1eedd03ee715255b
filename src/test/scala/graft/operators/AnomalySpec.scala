package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class AnomalySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(values: Seq[Long], window: Int = 5, minPoints: Int = 3, z: Int = 3) = {
    val df = values.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }.toDF("k", "t", "v")
    Anomaly.rollingZFlags(df, Seq("k"), Seq(col("t")), "v", window, minPoints, z, 1000000L)
      .orderBy("t").select("t", "n_base", "flagged")
      .as[(Long, Long, Boolean)].collect()
  }

  test("a spike against a stable baseline is flagged; the baseline itself is not") {
    val out = run(Seq(100L, 102L, 98L, 101L, 99L, 500L, 100L))
    val flagged = out.filter(_._3).map(_._1)
    assert(flagged.toSeq == Seq(5L)) // only the 500 spike
  }

  test("warm-up rows (fewer than minPoints baselines) are never flagged") {
    val out = run(Seq(0L, 1000000L, 0L), minPoints = 3)
    assert(out.forall(!_._3))
    assert(out.map(_._2).toSeq == Seq(0L, 1L, 2L))
  }

  test("matches exact BigInt arithmetic on random series (no float drift)") {
    val rng = new scala.util.Random(42)
    val values = Seq.fill(120)(rng.nextInt(2000).toLong - 1000)
    val window = 10; val minPoints = 4; val z = 2
    val got = run(values, window, minPoints, z)
    values.indices.foreach { i =>
      val base = values.slice(math.max(0, i - window), i).map(BigInt(_))
      val n = BigInt(base.size); val s = base.sum; val q = base.map(b => b * b).sum
      val x = BigInt(values(i))
      val expect = base.size >= minPoints &&
        (n * x - s).pow(2) > BigInt(z * z) * (n * q - s * s)
      assert(got(i)._3 == expect, s"row $i")
      assert(got(i)._2 == base.size.toLong, s"n_base row $i")
    }
  }

  test("baseline excludes the current row: a level shift flags the first shifted point") {
    // constant 0 baseline (variance 0) then a jump: any nonzero x has lhs>0=rhs
    val out = run(Seq(0L, 0L, 0L, 0L, 7L))
    assert(out.last._3)
  }

  test("keys are independent and the overflow guard rejects unsafe configs") {
    val df = Seq(("a", 1L, 10L), ("b", 1L, 999L), ("a", 2L, 11L)).toDF("k", "t", "v")
    val out = Anomaly.rollingZFlags(df, Seq("k"), Seq(col("t")), "v", 5, 2, 3, 1000L)
    assert(out.filter(col("flagged")).count() == 0) // no key has enough baseline
    intercept[IllegalArgumentException] {
      Anomaly.rollingZFlags(df, Seq("k"), Seq(col("t")), "v", 1000, 2, 1000,
        Long.MaxValue / 4)
    }
  }
}
