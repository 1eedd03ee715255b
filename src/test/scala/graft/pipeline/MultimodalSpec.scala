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

  test("the imageio registry decoder decodes real PNG and BMP payloads end to end") {
    import java.awt.image.BufferedImage
    def encode(img: BufferedImage, fmt: String): Array[Byte] = {
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, baos)
      baos.toByteArray
    }
    // 8x6 image, left half black, right half white
    def halfAndHalf(w: Int, h: Int): BufferedImage = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) 0x000000 else 0xFFFFFF)
      img
    }
    val png = encode(halfAndHalf(8, 6), "png")
    val bmp = encode(halfAndHalf(16, 4), "bmp")
    val df = Seq((1L, png), (2L, bmp)).toDF("doc_id", "payload")
    val dec = MediaDecoders.get("imageio")
    // metadata through the registry decoder, via the SAME batched
    // plumbing the stub uses — real dimensions come back
    val meta = Multimodal.decodeMeta(df, "doc_id", "payload", dec)
      .select(col("doc_id"), col("meta.byte_len"), col("meta.width"),
        col("meta.height"), col("meta.n_frames"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(meta(1L) == ((png.length.toLong, 8L, 6L, 1L)))
    assert(meta(2L) == ((bmp.length.toLong, 16L, 4L, 1L)))
    // features: 4x4 luminance grid — left two columns ~0, right two ~1
    val f = Multimodal.featurize(df.filter(col("doc_id") === 1L),
        "doc_id", "payload", dec)
      .head().getSeq[Double](1)
    assert(f.size == dec.featureDim)
    for (cy <- 0 until 4; cx <- 0 until 4) {
      val v = f(cy * 4 + cx)
      if (cx < 2) assert(v < 0.05, s"cell ($cy,$cx)=$v should be black")
      else assert(v > 0.95, s"cell ($cy,$cx)=$v should be white")
    }
    // resize: an incompressible (random-noise) PNG shrinks by halving
    // until it fits, and the result is still a decodable PNG
    val rnd = new scala.util.Random(1)
    val noisy = new BufferedImage(64, 64, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) noisy.setRGB(x, y, rnd.nextInt() & 0xFFFFFF)
    val noisyPng = encode(noisy, "png")
    val cap = noisyPng.length / 2
    val resized = Multimodal.resize(Seq((9L, noisyPng)).toDF("doc_id", "payload"),
        "doc_id", "payload", cap, dec)
      .head()
    val outBytes = resized.getAs[Array[Byte]](1)
    assert(outBytes.length <= cap && resized.getLong(2) == noisyPng.length.toLong)
    val reread = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(outBytes))
    assert(reread != null && reread.getWidth < 64)
    // non-image bytes fail loudly, not silently
    intercept[Exception] { dec.decodeMeta("not an image".getBytes) }
  }

  test("frame sampling strides through decoded frame counts") {
    // 20-byte payload => n_frames = 20 % 16 + 1 = 5 => frames 0 and 4
    val df = Multimodal.withPayload(Seq((7L, "x" * 20)).toDF("doc_id", "text"), "text")
    val meta = Multimodal.decodeMeta(df, "doc_id", "payload")
    val frames = Multimodal.sampleFrames(meta, "doc_id", every = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(frames == Seq((7L, 0L), (7L, 4L)))
  }

  test("frame sampling survives zero-frame and null metas; rejects a zero stride") {
    // ANSI Spark throws on sequence(0, -1): a zero-frame clip must emit
    // no rows, not abort the job
    val meta = Seq(
      (1L, Some((10L, 1L, 1L, 0L, 0L))), // zero frames
      (2L, Some((10L, 1L, 1L, 3L, 0L))), // three frames
      (3L, None)                          // undecodable -> null meta
    ).toDF("doc_id", "m")
      .select(col("doc_id"), col("m").cast(
        "struct<byte_len:bigint,width:bigint,height:bigint,n_frames:bigint,first_byte:bigint>")
        .as("meta"))
    val frames = Multimodal.sampleFrames(meta, "doc_id", every = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(frames == Set((2L, 0L), (2L, 2L)))
    intercept[IllegalArgumentException](Multimodal.sampleFrames(meta, "doc_id", every = 0))
  }

  test("lenient decode maps corrupt payloads to NULL instead of failing the job") {
    val df = Seq(
      (1L, Some("not an image at all".getBytes)),
      (2L, None)
    ).toDF("doc_id", "payload")
    // strict: the corrupt payload aborts (the default contract)
    intercept[Exception] {
      Multimodal.decodeMeta(df, "doc_id", "payload", ImageIoDecoder).collect()
    }
    // lenient: corrupt -> NULL meta, the job completes, nulls are countable
    val metas = Multimodal.decodeMeta(df, "doc_id", "payload", ImageIoDecoder,
        lenient = true)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(metas == Map(1L -> true, 2L -> true))
    val hashes = Multimodal.perceptualHashes(df, "doc_id", "payload", ImageIoDecoder,
        lenient = true)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(hashes == Map(1L -> true, 2L -> true))
    val feats = Multimodal.featurize(df, "doc_id", "payload", ImageIoDecoder,
        lenient = true)
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(feats == Map(1L -> true, 2L -> true))
  }
}
