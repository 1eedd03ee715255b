package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Audio arm of the media registry: the REAL JDK WAV reader
  * (javax.sound.sampled) decoding byte-exact synthesized PCM — proof
  * the MediaDecoder plug-in point is media-generic, not image-shaped.
  */
class WavDecoderSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("synthesize -> decodeMeta round trip: header fields are exact") {
    val wav = WavDecoder.synthesize(nFrames = 500, sampleRate = 8000)
    assert(wav.length == 44 + 1000)
    val (len, rate, ch, frames, first) = WavDecoder.decodeMeta(wav)
    assert(len == 1044L && rate == 8000L && ch == 1L && frames == 500L)
    assert(first == 'R'.toLong) // RIFF
  }

  test("features: silence is zero-energy, a tone is not, and both are deterministic") {
    val tone = WavDecoder.synthesize(800, period = 32)
    val f1 = WavDecoder.features(tone)
    val f2 = WavDecoder.features(tone)
    assert(f1.toSeq == f2.toSeq && f1.length == 16)
    assert(f1.forall(_ > 0.0))
    // hand-built silent clip: same header, zero samples
    val silent = WavDecoder.synthesize(800).clone()
    java.util.Arrays.fill(silent, 44, silent.length, 0.toByte)
    assert(WavDecoder.features(silent).forall(_ == 0.0))
  }

  test("perceptual hash: amplitude-scaled copy is bit-close, different audio far") {
    def scaleHalf(wav: Array[Byte]): Array[Byte] = {
      val out = wav.clone()
      var i = 44
      while (i + 1 < out.length) {
        val v = (((out(i + 1).toInt << 8) | (out(i) & 0xFF)).toShort / 2).toShort
        out(i) = (v & 0xFF).toByte
        out(i + 1) = ((v >> 8) & 0xFF).toByte
        i += 2
      }
      out
    }
    // varying-period chirp so segment energies actually differ
    val a = {
      val parts = (1 to 16).map(p => WavDecoder.synthesize(200, period = 2 + 4 * p))
      val data = parts.flatMap(_.drop(44)).toArray
      val head = WavDecoder.synthesize(parts.map(p => (p.length - 44) / 2).sum).take(44)
      head ++ data
    }
    def dist(x: Long, y: Long) = java.lang.Long.bitCount(x ^ y)
    val ha = WavDecoder.perceptualHash(a)
    assert(dist(ha, WavDecoder.perceptualHash(scaleHalf(a))) <= 4,
      "energy-delta hash must be amplitude-scale tolerant")
    val b = {
      val parts = (1 to 16).map(p => WavDecoder.synthesize(200, period = 66 - 4 * p))
      val data = parts.flatMap(_.drop(44)).toArray
      val head = WavDecoder.synthesize(parts.map(p => (p.length - 44) / 2).sum).take(44)
      head ++ data
    }
    assert(dist(ha, WavDecoder.perceptualHash(b)) > 15, "different audio must hash far")
  }

  test("resize truncates frames, stays decodable, preserves format") {
    val wav = WavDecoder.synthesize(2000)
    val small = WavDecoder.resize(wav, 500)
    assert(small.length <= 500)
    val (_, rate, ch, frames, _) = WavDecoder.decodeMeta(small)
    assert(rate == 8000L && ch == 1L && frames <= (500 - 44) / 2 && frames > 0)
    // already-small payloads pass through byte-identical
    assert(WavDecoder.resize(small, 5000).toSeq == small.toSeq)
  }

  test("registry resolves 'wav'; the Spark decode pass carries audio meta") {
    assert(MediaDecoders.get("wav") eq WavDecoder)
    val df = Seq((1L, Some(120)), (2L, None)).toDF("id", "n")
    val wav = Multimodal.withWavPayload(df, "n")
    val meta = Multimodal.decodeMeta(wav, "id", "payload", WavDecoder)
      .select(col("id"), col("meta.width").as("rate"), col("meta.n_frames").as("fr"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2))))).toMap
    assert(meta(1L).contains((8000L, 120L)) && meta(2L).isEmpty)
  }
}
