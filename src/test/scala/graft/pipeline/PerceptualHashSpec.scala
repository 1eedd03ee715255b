package graft.pipeline

import java.awt.image.BufferedImage
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Perceptual hashing over the REAL ImageIO decoder: visually-close
  * images land bit-close, unrelated images far apart, and the banded
  * near-dup join finds exactly the pairs a brute-force Hamming scan
  * finds.
  */
class PerceptualHashSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def encode(img: BufferedImage): Array[Byte] = {
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    baos.toByteArray
  }

  /** Deterministic "photo": smooth gradient + a block pattern. */
  private def photo(w: Int, h: Int, seed: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val base = (x * 255 / w + y * 255 / h) / 2
      val block = if (((x / 16) + (y / 16) + seed) % 2 == 0) 60 else 0
      val v = math.min(255, base + block)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    img
  }

  private def perturb(img: BufferedImage): BufferedImage = {
    val out = new BufferedImage(img.getWidth, img.getHeight, BufferedImage.TYPE_INT_RGB)
    val g = out.createGraphics()
    try g.drawImage(img, 0, 0, null) finally g.dispose()
    // small local edit: a 6x6 bright square — perceptually "the same image"
    for (y <- 10 until 16; x <- 10 until 16) out.setRGB(x, y, 0xFFFFFF)
    out
  }

  test("pHash: a small local edit stays bit-close, a different image is far") {
    val a = ImageIoDecoder.perceptualHash(encode(photo(128, 96, 0)))
    val aEdit = ImageIoDecoder.perceptualHash(encode(perturb(photo(128, 96, 0))))
    val b = ImageIoDecoder.perceptualHash(encode(photo(128, 96, 1)))
    def dist(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    assert(dist(a, aEdit) <= 8, s"edit moved ${dist(a, aEdit)} bits")
    assert(dist(a, b) > 15, s"different images only ${dist(a, b)} bits apart")
    // a rescaled copy of the same image hashes close too
    val aSmall = {
      val s = new BufferedImage(64, 48, BufferedImage.TYPE_INT_RGB)
      val g = s.createGraphics()
      try g.drawImage(photo(128, 96, 0), 0, 0, 64, 48, null) finally g.dispose()
      ImageIoDecoder.perceptualHash(encode(s))
    }
    assert(dist(a, aSmall) <= 10, s"rescale moved ${dist(a, aSmall)} bits")
  }

  test("perceptualHashes runs through the batched decode pass; NULL payloads yield NULL") {
    val df = Seq((1L, Some(encode(photo(64, 48, 0)))), (2L, None))
      .toDF("doc_id", "payload")
    val got = Multimodal.perceptualHashes(df, "doc_id", "payload", ImageIoDecoder)
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L).isDefined && got(2L).isEmpty)
  }

  test("banded near-dup equals brute force on random hashes, exactly once per pair") {
    val rng = new scala.util.Random(99L)
    val base = Seq.fill(40)(rng.nextLong())
    // close variants: flip up to 4 bits
    val variants = base.take(10).map { h =>
      (0 until 1 + rng.nextInt(4)).foldLeft(h)((x, _) => x ^ (1L << rng.nextInt(64)))
    }
    val hashes = (base ++ variants).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("id", "phash")
    val got = Multimodal.phashNearDup(hashes, "id", "phash", maxDist = 6)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
    val all = (base ++ variants).zipWithIndex
    val brute = (for {
      (ha, ia) <- all; (hb, ib) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 6
    } yield (ia.toLong, ib.toLong, d)).toSet
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("banded near-dup equals brute force in the radius-1 probing regime (maxDist = 10)") {
    val rng = new scala.util.Random(7L)
    val base = Seq.fill(40)(rng.nextLong())
    // close variants: flip up to 10 bits (deep into the probing arm)
    val variants = base.take(12).map { h =>
      (0 until 1 + rng.nextInt(10)).foldLeft(h)((x, _) => x ^ (1L << rng.nextInt(64)))
    }
    val hashes = (base ++ variants).zipWithIndex
      .map { case (h, i) => (i.toLong, h) }.toDF("id", "phash")
    val got = Multimodal.phashNearDup(hashes, "id", "phash", maxDist = 10)
      .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
    val all = (base ++ variants).zipWithIndex
    val brute = (for {
      (ha, ia) <- all; (hb, ib) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 10
    } yield (ia.toLong, ib.toLong, d)).toSet
    assert(got == brute)
    assert(brute.nonEmpty)
  }

  test("adversarial band spread: differing bits land in every wide band and are still found") {
    // distance 4 with one flipped bit per 16-bit quarter: under 4 exact
    // 16-bit bands NO band agrees, so this pair is found only because
    // maxDist >= 4 routes to 8-bit bands (bands 1,3,5,7 are clean)
    val h0 = 0x0123456789ABCDEFL
    val spread4 = h0 ^ ((1L << 0) | (1L << 16) | (1L << 32) | (1L << 48))
    // distance 9 with at least one flipped bit in EVERY 8-bit band:
    // no exact band key can match at any width >= 8, so this pair is
    // found only through the radius-1 probe arm
    val spread9 = h0 ^ (0 until 8).map(k => 1L << (k * 8)).reduce(_ | _) ^ (1L << 1)
    for ((other, d, maxDist) <- Seq((spread4, 4, 4), (spread4, 4, 8), (spread9, 9, 9),
                                    (spread9, 9, 15))) {
      assert(java.lang.Long.bitCount(h0 ^ other) == d)
      val pairs = Multimodal.phashNearDup(
          Seq((1L, h0), (2L, other)).toDF("id", "phash"), "id", "phash", maxDist)
        .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect().toSet
      assert(pairs == Set((1L, 2L, d)), s"maxDist=$maxDist missed distance-$d spread pair")
    }
    // and the pair dedup holds: exactly one row even when several bands collide
    val near = h0 ^ 1L
    val one = Multimodal.phashNearDup(
        Seq((1L, h0), (2L, near)).toDF("id", "phash"), "id", "phash", maxDist = 12)
      .collect()
    assert(one.length == 1)
  }

  test("phashDedup config stage drops near-duplicate images through the registry") {
    val dir = java.nio.file.Files.createTempDirectory("graft-phash-cfg")
    val src = dir.resolve("src").toString
    val out = dir.resolve("out").toString
    Seq(
      (1L, encode(photo(128, 96, 0))),
      (2L, encode(perturb(photo(128, 96, 0)))), // near-dup of 1 -> drops
      (3L, encode(photo(128, 96, 1)))           // different -> survives
    ).toDF("doc_id", "payload").write.parquet(src)
    val cfg = graft.config.PipelineConfig.parse(
      s"""source.type: parquet
         |source.path: $src
         |target.type: parquet
         |target.path: $out
         |target.mode: overwrite
         |transforms: phashDedup
         |transform.phashDedup.idColumn: doc_id
         |transform.phashDedup.payloadColumn: payload
         |transform.phashDedup.decoder: imageio
         |transform.phashDedup.maxDist: 10
         |""".stripMargin).fold(e => fail(s"parse failed: $e"), identity)
    graft.Pipeline.run(spark, cfg)
    val ids = spark.read.parquet(out).select("doc_id").as[Long].collect().toSet
    assert(ids == Set(1L, 3L))
  }

  test("bandLayout invariants: full 64-bit cover, pigeonhole bound, minimal-coef pick") {
    for (d <- 0 to 15) {
      val (layout, radius) = Multimodal.bandLayout(d)
      // bands tile the 64 bits exactly, in order, without overlap
      assert(layout.map(_._2).sum == 64, s"d=$d widths don't sum to 64")
      layout.sliding(2).foreach {
        case Seq((o1, w1), (o2, _)) => assert(o1 + w1 == o2, s"d=$d bands overlap/gap")
        case _ => ()
      }
      // pigeonhole: B bands at radius r cover distance B(r+1)-1 >= d
      assert(layout.size * (radius + 1) - 1 >= d, s"d=$d pigeonhole bound broken")
    }
  }

  test("PROPERTY: banded near-dup equals brute force at EVERY maxDist in [0, 15]") {
    val rng = new scala.util.Random(123L)
    val base = Seq.fill(30)(rng.nextLong())
    // variants at every distance tier, including spreads engineered to
    // defeat narrow pigeonholes
    val variants = base.take(15).zipWithIndex.map { case (h, i) =>
      val flips = 1 + (i % 15)
      (0 until flips).foldLeft(h)((x, j) => x ^ (1L << ((j * 13 + i * 7) % 64)))
    }
    val all = (base ++ variants).zipWithIndex.map { case (h, i) => (i.toLong, h) }
    val df = all.toDF("id", "phash")
    for (maxDist <- 0 to 15) {
      val got = Multimodal.phashNearDup(df, "id", "phash", maxDist)
        .select("a_id", "b_id", "hamming").as[(Long, Long, Int)].collect()
      val gotSet = got.toSet
      assert(got.length == gotSet.size, s"maxDist=$maxDist produced duplicate pairs")
      val brute = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        dd = java.lang.Long.bitCount(ha ^ hb) if dd <= maxDist
      } yield (ia, ib, dd)).toSet
      assert(gotSet == brute, s"maxDist=$maxDist: banded != brute force")
    }
  }

  test("the stub decoder's default hash separates exact duplicates only") {
    val x = "same bytes".getBytes
    assert(StubDecoder.perceptualHash(x) == StubDecoder.perceptualHash("same bytes".getBytes))
    assert(StubDecoder.perceptualHash(x) != StubDecoder.perceptualHash("diff bytes".getBytes))
  }
}
