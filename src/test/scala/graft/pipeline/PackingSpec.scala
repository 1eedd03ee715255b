package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class PackingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def pack(rows: Seq[(Long, Long)], budget: Long, width: Long = 100L) =
    Packing.packGreedy(rows.toDF("doc_id", "n_tok"), "doc_id", "n_tok",
        budget, width)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)

  test("greedy fill: new sequence exactly when the next doc overflows") {
    val out = pack(Seq((0L, 50L), (1L, 60L), (2L, 70L), (3L, 30L)), budget = 128)
    // 50+60=110 fits; +70 overflows -> seq 1; 70+30=100 fits
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 50L), (1L, 0L, 1L, 60L), (2L, 1L, 0L, 70L), (3L, 1L, 1L, 30L)))
  }

  test("oversized and null docs: capped at budget, one sequence alone") {
    val out = pack(Seq((0L, 500L), (1L, 10L)), budget = 128)
    assert(out.toSeq == Seq((0L, 0L, 0L, 128L), (1L, 1L, 0L, 10L)))
    val withNull = Packing.packGreedy(
      Seq((0L, Some(50L)), (1L, None)).toDF("doc_id", "n_tok"),
      "doc_id", "n_tok", 128, 100)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).sortBy(_._1)
    assert(withNull.toSeq == Seq((0L, 0L, 50L), (1L, 0L, 0L))) // null = 0 tokens
    // a NULL id fails with the problem named, not an executor NPE
    val e = intercept[Exception](
      Packing.packGreedy(
        Seq((Some(1L), 10L), (None, 20L)).toDF("doc_id", "n_tok"),
        "doc_id", "n_tok", 128, 100).collect())
    assert(e.getMessage.contains("NULL value in id column") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL value in id column")))
  }

  test("shards pack independently with globally unique sequence ids") {
    // width 2: docs {0,1} shard 0, {2,3} shard 1
    val out = pack(Seq((0L, 100L), (1L, 100L), (2L, 10L), (3L, 10L)),
      budget = 128, width = 2)
    assert(out.toSeq == Seq(
      (0L, 0L, 0L, 100L), (1L, 1L, 0L, 100L), // overflow inside shard 0
      (2L, 2L, 0L, 10L), (3L, 2L, 1L, 10L)))  // shard 1 starts fresh at seq 2·1
  }

  test("negative ids shard by floor division and pack fine") {
    // width 10: id -5 -> shard -1 (floor), id 3 -> shard 0
    val out = pack(Seq((-5L, 40L), (-2L, 40L), (3L, 40L)), budget = 128, width = 10)
    assert(out.toSeq == Seq(
      (-5L, -10L, 0L, 40L), (-2L, -10L, 1L, 40L), // shard -1: seq_id -1·10+0
      (3L, 0L, 0L, 40L)))
  }

  test("assignment is partitioning-invariant") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tok"))
    def run(df: org.apache.spark.sql.DataFrame) =
      Packing.packGreedy(df, "doc_id", "n_tok", 128, 100)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(run(docs) == run(docs.repartition(17)) &&
      run(docs) == run(docs.coalesce(1)))
  }

  test("property sweep: distributed packing equals a Scala greedy model") {
    val rnd = new scala.util.Random(13)
    for (trial <- 1 to 3) {
      val budget = 64L + rnd.nextInt(128)
      val width = 16L + rnd.nextInt(64)
      val docs = (0 until 500).map(_ => rnd.nextLong(4000)).distinct
        .map(id => (id, rnd.nextLong(120)))
      // Scala model: group by floor(id/width), greedy fill in id order
      val model = docs.groupBy { case (id, _) => Math.floorDiv(id, width) }
        .flatMap { case (shard, ds) =>
          var (seq, fill) = (-1L, 0L)
          var pos = -1L
          ds.sortBy(_._1).map { case (id, tk0) =>
            val tk = math.min(math.max(tk0, 0L), budget)
            if (seq < 0 || fill + tk > budget) { seq += 1; fill = tk; pos = 0 }
            else { fill += tk; pos += 1 }
            (id, shard * width + seq, pos, tk)
          }
        }.toSet
      val got = pack(docs, budget = budget, width = width).toSet
      assert(got == model, s"trial $trial (budget=$budget width=$width)")
    }
  }

  test("every sequence respects the budget and positions are dense") {
    val docs = Tables.load(spark, TestSpark.sf, "documents")
      .select(col("doc_id"), Text.tokenCount(col("text")).cast("long").as("n_tok"))
    val out = Packing.packGreedy(docs, "doc_id", "n_tok", 128, 100)
    val bad = out.groupBy("seq_id").agg(
        sum(col("tok_used")).as("toks"),
        count(lit(1)).as("n"),
        max(col("seq_pos")).as("mx"))
      .filter(col("toks") > 128 || col("mx") =!= col("n") - 1)
    assert(bad.count() == 0)
    assertThrows[IllegalArgumentException](
      Packing.packGreedy(docs, "doc_id", "n_tok", 0, 100))
  }
}
