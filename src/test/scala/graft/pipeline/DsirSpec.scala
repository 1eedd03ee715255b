package graft.pipeline

import java.security.MessageDigest

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{Tables, TestSpark}

/** DSIR importance resampling (hashed-ngram features + ln-ratio
  * weights): the feature counts are oracle-gated (q_dsir_features);
  * the weight column involves ln, so it is pinned here against a
  * local double-precision replica instead.
  */
class DsirSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val B = 8

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def bucket(gram: String): Long =
    java.lang.Long.parseLong(md5hex(gram).take(15), 16) % B

  private def localFeatures(text: String): Map[Long, Long] = {
    val toks = text.trim.split("\\s+").filter(_.nonEmpty).toSeq
    val grams = toks ++ toks.zip(toks.drop(1)).map { case (a, b) => s"$a $b" }
    grams.groupBy(bucket).view.mapValues(_.size.toLong).toMap
  }

  test("dsirFeatures matches the local md5-bucket replica") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").limit(40).cache()
    val expected = docs.select("doc_id", "text").collect()
      .flatMap(r => localFeatures(Option(r.getString(1)).getOrElse(""))
        .map { case (b, n) => (r.getLong(0), b, n) }).toSet
    val got = Text.dsirFeatures(docs, "text", "doc_id", buckets = B)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
  }

  test("dsirWeights: local smoothed ln-ratio replica agrees, on-target scores higher") {
    val docs = Tables.load(spark, TestSpark.sf, "documents").cache()
    val feats = Text.dsirFeatures(docs, "text", "doc_id", buckets = B).cache()
    val target = Text.dsirFeatures(docs.filter(col("source") === "src0"),
      "text", "doc_id", buckets = B)

    def dist(rows: Array[(Long, Long)]): Long => Double = {
      val byBucket = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val tot = rows.map(_._2).sum
      b => (byBucket.getOrElse(b, 0L) + 1).toDouble / (tot + B)
    }
    def collectF(df: org.apache.spark.sql.DataFrame) =
      df.select("bucket", "n").collect().map(r => (r.getLong(0), r.getLong(1)))
    val p = dist(collectF(target))
    val q = dist(collectF(feats))
    val perDoc = feats.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map { case (_, b, n) =>
        n * (math.log(p(b)) - math.log(q(b))) }.sum).toMap

    val got = Text.dsirWeights(feats, target, "doc_id", buckets = B)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet == perDoc.keySet)
    got.foreach { case (id, w) =>
      assert(math.abs(w - perDoc(id)) <= 1e-9 * math.max(1.0, math.abs(w)),
        s"doc $id: $w vs ${perDoc(id)}")
    }
    // resampling sanity: the average weight of the target slice beats
    // the average weight of the rest (the slice IS the target distro)
    val srcOf = docs.select("doc_id", "source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val (in, out) = got.toSeq.partition { case (id, _) => srcOf(id) == "src0" }
    assert(in.map(_._2).sum / in.size > out.map(_._2).sum / out.size)
  }
}
