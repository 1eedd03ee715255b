package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class BucketingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("bucketed-to-bucketed join has no shuffle; plain join does") {
    val li = Tables.load(spark, TestSpark.sf, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = Tables.load(spark, TestSpark.sf, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))

    Bucketing.writeBucketed(li, "li_bucketed", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "o_bucketed", "l_orderkey", 4)

    // suppress broadcast so the comparison is shuffle-join vs bucket-join
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val colocated = Bucketing.colocatedJoin(spark, "li_bucketed", "o_bucketed", "l_orderkey")
      assert(!Bucketing.hasShuffle(colocated), colocated.queryExecution.executedPlan.toString)

      val plain = li.join(o, "l_orderkey")
      assert(Bucketing.hasShuffle(plain))

      // and the bucketed join is still correct
      assert(colocated.count() == plain.count())

      // groupBy on the bucket key also avoids the exchange
      val agg = spark.table("li_bucketed").groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("s"))
      assert(!Bucketing.hasShuffle(agg), agg.queryExecution.executedPlan.toString)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }
}
