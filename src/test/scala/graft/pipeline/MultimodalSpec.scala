package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("decodeMeta produces the deterministic fake metadata per row") {
    val df = Multimodal.withPayload(
      Seq((1L, "abc"), (2L, ""), (3L, "a longer sample payload")).toDF("doc_id", "text"),
      "text")
    val got = Multimodal.decodeMeta(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.getStruct(1)).toMap
    val m1 = got(1L)
    assert(m1.getLong(0) == 3 && m1.getLong(1) == 3 % 640)
    assert(m1.getLong(4) == 'a'.toLong)
    val m2 = got(2L)
    assert(m2.getLong(0) == 0 && m2.getLong(4) == 0 && m2.getLong(3) == 1)
  }

  test("null payloads yield null metadata") {
    val df = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val got = Multimodal.decodeMeta(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap
    assert(got(1L) != null && got(2L) == null)
  }

  test("featurize emits a fixed-dim deterministic vector; nulls stay null") {
    val df = Seq((1L, Option("abcd")), (2L, Option.empty[String])).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val got = Multimodal.featurize(df, "doc_id", "payload").collect()
      .map(r => r.getLong(0) -> Option(r.getSeq[Double](1))).toMap
    val f = got(1L).get
    assert(f.size == Multimodal.FeatureDim)
    // len=4, first='a'=97: f(j) = ((4*(j+1) + 97) % 1000) / 1000.0
    assert(f.head == 0.101 && f(1) == 0.105)
    assert(got(2L).isEmpty)
  }

  test("resize stub truncates deterministically and reports both lengths") {
    val df = Seq((1L, "x" * 100), (2L, "y")).toDF("doc_id", "text")
      .withColumn("payload", col("text").cast("binary"))
    val got = Multimodal.resizeStub(df, "doc_id", "payload", maxBytes = 10).collect()
      .map(r => r.getLong(0) -> (r.getAs[Array[Byte]](1).length, r.getLong(2), r.getLong(3))).toMap
    assert(got(1L) == ((10, 100L, 10L)))
    assert(got(2L) == ((1, 1L, 1L)))
  }

  test("a custom decoder injects through the trait and the registry; stub stays default") {
    // a "real codec" stand-in with recognizably different output
    object FixedDecoder extends MediaDecoder {
      def decodeMeta(bytes: Array[Byte]) = (bytes.length.toLong, 1920L, 1080L, 2L, 255L)
      val featureDim = 2
      def features(bytes: Array[Byte]) = Array(1.0, 2.0)
      def resize(bytes: Array[Byte], maxBytes: Int) = Array[Byte](42)
    }
    MediaDecoders.register("fixed", FixedDecoder)
    assert(MediaDecoders.names.contains("fixed") && MediaDecoders.names.contains("stub"))
    val df = Multimodal.withPayload(Seq((1L, "abc")).toDF("doc_id", "text"), "text")
    // injected per-call (resolved from the registry, as a config would)
    val viaRegistry = Multimodal.decodeMeta(df, "doc_id", "payload",
        MediaDecoders.get("fixed"))
      .select("meta.width", "meta.height").head()
    assert((viaRegistry.getLong(0), viaRegistry.getLong(1)) == ((1920L, 1080L)))
    val feats = Multimodal.featurize(df, "doc_id", "payload", FixedDecoder)
      .select("features").head().getSeq[Double](0)
    assert(feats == Seq(1.0, 2.0))
    assert(Multimodal.resize(df, "doc_id", "payload", 1, FixedDecoder)
      .select("resized").head().getAs[Array[Byte]](0).toSeq == Seq(42.toByte))
    // the default path is untouched (q_multimodal_meta's contract)
    val stubMeta = Multimodal.decodeMeta(df, "doc_id", "payload")
      .select("meta.width").head().getLong(0)
    assert(stubMeta == 3L % 640)
    // unknown names fail loudly
    assert(intercept[IllegalArgumentException](
      MediaDecoders.get("nope")).getMessage.contains("no media decoder"))
  }

  test("frame sampling strides through decoded frame counts") {
    // 20-byte payload => n_frames = 20 % 16 + 1 = 5 => frames 0 and 4
    val df = Multimodal.withPayload(Seq((7L, "x" * 20)).toDF("doc_id", "text"), "text")
    val meta = Multimodal.decodeMeta(df, "doc_id", "payload")
    val frames = Multimodal.sampleFrames(meta, "doc_id", every = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(frames == Seq((7L, 0L), (7L, 4L)))
  }
}
