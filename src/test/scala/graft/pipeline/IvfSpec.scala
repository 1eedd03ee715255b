package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

class IvfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = Tables.load(spark, TestSpark.sf, "embeddings").cache()

  private lazy val vectors: Map[Long, Array[Double]] =
    emb.collect().map(r => r.getLong(0) ->
      r.getSeq[Float](1).map(_.toDouble).toArray).toMap

  private def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  private def trueTopK(q: Long, k: Int): Seq[Long] =
    vectors.toSeq.filter(_._1 != q)
      .map { case (id, v) => (id, cos(vectors(q), v)) }
      .sortBy { case (id, c) => (-c, id) }.take(k).map(_._1)

  test("training is deterministic and buckets partition the corpus") {
    val m1 = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    val m2 = Ivf.train(emb, "vec_id", "embedding", k = 8, iters = 2)
    assert(m1.centroids.map(_.toSeq).toSeq == m2.centroids.map(_.toSeq).toSeq)
    val idx = Ivf.index(emb, "vec_id", "embedding", m1)
    assert(idx.count() == emb.count())
    val buckets = idx.groupBy("bucket").count().collect()
    assert(buckets.length > 1 && buckets.map(_.getLong(1)).sum == emb.count())
  }

  test("ivf top-k recall beats the probe fraction by a wide margin") {
    val model = Ivf.train(emb, "vec_id", "embedding", k = 10, iters = 3)
    val indexed = Ivf.index(emb, "vec_id", "embedding", model).cache()
    val got = Ivf.topK(emb.filter(col("vec_id") < 20), indexed,
        "vec_id", "embedding", model, k = 5, nProbe = 4)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = (0L until 20L).map { q =>
      val truth = trueTopK(q, 5).toSet
      (truth & got.getOrElse(q, Set.empty)).size.toDouble / truth.size
    }
    val mean = recalls.sum / recalls.size
    // probing 4/16 of the space blindly would give ~0.25; clustered
    // embeddings + nearest-centroid probes should do much better
    assert(mean >= 0.6, s"mean recall@5 = $mean")
  }
}
