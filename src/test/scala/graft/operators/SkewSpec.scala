package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class SkewSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("salted aggregate equals plain aggregate (sum/count/min/max)") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
    val plain = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"),
        min(col("l_partkey")).as("mn"), max(col("l_partkey")).as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val salted = Skew.saltedAggregate(li, Seq("l_returnflag"), saltBuckets = 8,
        saltOver = Seq("l_orderkey", "l_linenumber"),
        aggs = Seq(Skew.sumOf(col("l_quantity"), "s"), Skew.countOf("n"),
          Skew.minOf(col("l_partkey"), "mn"), Skew.maxOf(col("l_partkey"), "mx")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(salted.keySet == plain.keySet)
    plain.foreach { case (k, (s, n, mn, mx)) =>
      val (s2, n2, mn2, mx2) = salted(k)
      assert(n2 == n && mn2 == mn && mx2 == mx)
      assert(math.abs(s2 - s) < 1e-6 * math.abs(s).max(1))
    }
  }

  test("salted aggregate actually spreads a hot key across buckets") {
    import spark.implicits._
    val hot = (1 to 1000).map(i => ("hot", i)).toDF("k", "v")
    val salted = hot.withColumn("__salt", Skew.salt(8, Seq(col("v"))))
    val buckets = salted.groupBy("__salt").count().count()
    assert(buckets >= 6) // hot key spread over (almost) all 8 buckets
  }

  test("salt refuses empty column list (retry-unsafe positional fallback)") {
    assertThrows[IllegalArgumentException](Skew.salt(8, Seq.empty))
  }

  test("salted join equals plain join") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_quantity")
    val part = Tables.load(spark, TestSpark.sf, "part")
      .select(col("p_partkey").as("l_partkey"), col("p_name"))
    val plain = li.join(part, "l_partkey").count()
    val salted = Skew.saltedJoin(li, part, "l_partkey", saltBuckets = 4,
      factSaltOver = Seq("l_orderkey", "l_linenumber")).count()
    assert(salted == plain)
  }

  test("property sweep: salted ops equal plain ops with NULL keys, across bucket counts") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    val fact = (1 to 500).map { i =>
      (i.toLong, if (rng.nextInt(8) == 0) None else Some(rng.nextInt(6).toLong),
        rng.nextInt(100).toLong)
    }.toDF("id", "k", "v")
    // the dimension carries a NULL key too: inner-join semantics must drop it
    val dim = ((0 to 5).map(j => (Option(j.toLong), s"d$j")) :+
      (Option.empty[Long], "d-null")).toDF("k", "name")
    val plainJoin = fact.join(dim, Seq("k")).select("id", "name")
    val plainAgg = fact.groupBy(col("k"))
      .agg(sum(col("v")).as("s"), count(lit(1)).as("n"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => Option(r.get(0)) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    for (buckets <- Seq(1, 4, 16)) {
      val sj = Skew.saltedJoin(fact, dim, "k", buckets, Seq("id")).select("id", "name")
      assert(sj.exceptAll(plainJoin).isEmpty && plainJoin.exceptAll(sj).isEmpty,
        s"saltedJoin diverged at buckets=$buckets")
      val sa = Skew.saltedAggregate(fact, Seq("k"), buckets, Seq("id"),
          Seq(Skew.sumOf(col("v"), "s"), Skew.countOf("n"),
            Skew.minOf(col("v"), "mn"), Skew.maxOf(col("v"), "mx")))
        .collect().map(r => Option(r.get(0)) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(sa == plainAgg, s"saltedAggregate diverged at buckets=$buckets")
      // the NULL key must aggregate as ONE group (SQL GROUP BY semantics)
      assert(sa.contains(None) && sa(None)._2 > 1)
    }
  }

  test("reserved __salt column is rejected on every input") {
    import spark.implicits._
    val df = Seq((1L, "k", 2L)).toDF("id", "k", "v").withColumn("__salt", lit(1))
    val clean = Seq((1L, "k", 2L)).toDF("id", "k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedAggregate(df, Seq("k"), 4, Seq("id"), Seq(Skew.countOf("n")))
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, clean.select(col("k"), col("v")), "k", 4, Seq("id"))
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(clean, df.select(col("k"), col("__salt")), "k", 4, Seq("id"))
    }
  }

  test("keyProfile reports the distribution stats that size a join") {
    import spark.implicits._
    // 1 hot key (100 rows) + 9 uniform keys (10 rows each)
    val rows = (1 to 100).map(i => ("hot", i)) ++
      (for (k <- 1 to 9; i <- 1 to 10) yield (s"k$k", i))
    val got = Skew.keyProfile(rows.toDF("k", "v"), Seq("k")).collect().head
    assert(got.getAs[Long]("n_keys") == 10)
    assert(got.getAs[Long]("max_n") == 100)
    assert(got.getAs[Long]("total_rows") == 190)
    assert(got.getAs[Double]("p50") == 10.0)
  }
}
