package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Pluggable media codec for the multimodal plumbing. Implementations
  * MUST be Serializable — the instance is captured by the
  * `mapPartitions` closure and shipped to executors; heavyweight
  * native handles belong in a `@transient lazy val` inside the
  * implementation so each executor opens its own (the per-partition
  * setup the batched shape exists for).
  *
  * The default [[StubDecoder]] derives deterministic pseudo-metadata
  * from the bytes (no media libraries in this container); swapping in
  * a real codec is dependency injection — pass it to
  * [[Multimodal.decodeMeta]]/[[Multimodal.featurize]]/
  * [[Multimodal.resize]] or register it by name
  * ([[MediaDecoders.register]]) for config-driven lookup.
  */
trait MediaDecoder extends Serializable {
  /** (byte_len, width, height, n_frames, first_byte) — see
    * [[Multimodal.MetaSchema]].
    */
  def decodeMeta(bytes: Array[Byte]): (Long, Long, Long, Long, Long)

  /** Fixed-dim feature vector (e.g. an image embedding). */
  def features(bytes: Array[Byte]): Array[Double]
  def featureDim: Int

  /** Resample/resize the payload to at most `maxBytes`. */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte]

  /** 64-bit perceptual hash: visually similar payloads map to
    * bit-close hashes (small Hamming distance), so media near-dup
    * reduces to the integer Hamming machinery the text tier already
    * has. Default: content hash of the raw bytes (exact-dup only) —
    * real codecs override with a perceptual construction.
    */
  def perceptualHash(bytes: Array[Byte]): Long = {
    // FNV-1a over the raw bytes: deterministic, exact-duplicate-only
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) { h ^= bytes(i) & 0xFFL; h *= 0x100000001b3L; i += 1 }
    h
  }
}

/** Deterministic stand-in decoder — any engine can reproduce its
  * output exactly, which is what lets the multimodal gate queries
  * oracle-check the PLUMBING (schema, batching, null handling,
  * explode) without a real codec.
  */
object StubDecoder extends MediaDecoder {
  def decodeMeta(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val len = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    (len, len % 640, (len * 7) % 480, len % 16 + 1, first)
  }
  val featureDim = 16
  def features(bytes: Array[Byte]): Array[Double] = {
    val len = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    Array.tabulate(featureDim)(j => ((len * (j + 1) + first) % 1000L).toDouble / 1000.0)
  }
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] =
    if (bytes.length <= maxBytes) bytes else bytes.take(maxBytes)
}

/** Real pure-JVM image codec over the JDK's `javax.imageio` (PNG, BMP,
  * GIF, JPEG readers ship with the JDK — no native libraries): the
  * proof that the [[MediaDecoder]] plug-in point carries real bytes,
  * not just the deterministic stub. Metadata decode reads ONLY the
  * image header (an `ImageReader` over the byte stream — no pixel
  * decode), which is the cost profile a 100-TB metadata pass needs;
  * features and resize decode pixels, the genuinely expensive tier.
  *
  * Stateless object: `ImageIO` is a static utility, so there is no
  * per-executor handle to lazily open — serialization is trivial.
  */
object ImageIoDecoder extends MediaDecoder {
  import java.io.ByteArrayInputStream

  def decodeMeta(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    val iis = javax.imageio.ImageIO.createImageInputStream(new ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      require(readers.hasNext, "payload is not a decodable image")
      val r = readers.next()
      try {
        r.setInput(iis)
        // getNumImages(true) counts frames (GIF animations > 1; PNG/BMP = 1)
        (bytes.length.toLong, r.getWidth(0).toLong, r.getHeight(0).toLong,
          r.getNumImages(true).toLong, first)
      } finally r.dispose()
    } finally iis.close()
  }

  private def readPixels(bytes: Array[Byte]): java.awt.image.BufferedImage = {
    val img = javax.imageio.ImageIO.read(new ByteArrayInputStream(bytes))
    require(img != null, "payload is not a decodable image")
    img
  }

  val featureDim = 16

  /** 4×4 mean-luminance grid, row-major, each cell in [0, 1] — the
    * deterministic classical-CV stand-in for a learned embedding.
    */
  def features(bytes: Array[Byte]): Array[Double] = {
    val img = readPixels(bytes)
    val (w, h) = (img.getWidth, img.getHeight)
    val out = new Array[Double](featureDim)
    var cy = 0
    while (cy < 4) {
      val y0 = cy * h / 4
      val y1 = math.min(h, math.max(y0 + 1, (cy + 1) * h / 4))
      var cx = 0
      while (cx < 4) {
        val x0 = cx * w / 4
        val x1 = math.min(w, math.max(x0 + 1, (cx + 1) * w / 4))
        var sum = 0.0
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) {
            val rgb = img.getRGB(x, y)
            sum += (0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
              0.114 * (rgb & 0xFF)) / 255.0
            x += 1
          }
          y += 1
        }
        out(cy * 4 + cx) = sum / ((y1 - y0).toLong * (x1 - x0))
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** Classic pHash: downscale to 32×32 luminance, 2-D DCT, keep the
    * 8×8 low-frequency block, threshold each coefficient at the
    * block's median (DC excluded from the median so a brightness
    * offset can't flip half the bits). Visually-close images differ
    * in a few bits; unrelated images differ in ~32.
    */
  override def perceptualHash(bytes: Array[Byte]): Long = {
    val src = readPixels(bytes)
    val n = 32
    val scaled = new java.awt.image.BufferedImage(n, n,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g2 = scaled.createGraphics()
    try {
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
      g2.drawImage(src, 0, 0, n, n, null)
    } finally g2.dispose()
    val lum = Array.ofDim[Double](n, n)
    var y = 0
    while (y < n) {
      var x = 0
      while (x < n) {
        val rgb = scaled.getRGB(x, y)
        lum(y)(x) = 0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) +
          0.114 * (rgb & 0xFF)
        x += 1
      }
      y += 1
    }
    val dct = new Array[Double](64)
    var u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        var sum = 0.0
        var yy = 0
        while (yy < n) {
          var xx = 0
          while (xx < n) {
            sum += lum(yy)(xx) *
              math.cos((2 * xx + 1) * u * math.Pi / (2.0 * n)) *
              math.cos((2 * yy + 1) * v * math.Pi / (2.0 * n))
            xx += 1
          }
          yy += 1
        }
        dct(v * 8 + u) = sum
        v += 1
      }
      u += 1
    }
    val acs = dct.drop(1).sorted
    val median = (acs(30) + acs(31)) / 2.0
    var h = 0L
    var i = 0
    while (i < 64) {
      if (dct(i) > median) h |= 1L << i
      i += 1
    }
    h
  }

  /** Halve dimensions and re-encode (PNG) until the payload fits
    * `maxBytes` or the image is 1×1; best-effort at the floor (a 1×1
    * PNG is ~70 bytes — below that no image encoding fits).
    */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) return bytes
    var img = readPixels(bytes)
    var out = bytes
    while (out.length > maxBytes && (img.getWidth > 1 || img.getHeight > 1)) {
      val nw = math.max(1, img.getWidth / 2)
      val nh = math.max(1, img.getHeight / 2)
      val scaled = new java.awt.image.BufferedImage(nw, nh,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = scaled.createGraphics()
      try g.drawImage(img, 0, 0, nw, nh, null) finally g.dispose()
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(scaled, "png", baos)
      img = scaled
      out = baos.toByteArray
    }
    out
  }
}

/** Real pure-JVM audio codec over the JDK's `javax.sound.sampled`
  * (WAV/AIFF/AU PCM readers ship with the JDK — no native libraries):
  * the proof that the [[MediaDecoder]] registry is media-GENERIC, not
  * an image abstraction with one implementation. The generic meta
  * tuple maps naturally: width → sample rate, height → channel count,
  * n_frames → sample frames. Stateless object, trivially
  * Serializable, same as [[ImageIoDecoder]].
  */
object WavDecoder extends MediaDecoder {
  import javax.sound.sampled.{AudioFormat, AudioInputStream, AudioSystem}
  import java.io.ByteArrayInputStream

  private def open(bytes: Array[Byte]): AudioInputStream =
    AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))

  /** (byte_len, sample_rate, channels, n_frames, first_byte) — header
    * read only, no sample decode: the 100-TB metadata-pass cost
    * profile, like [[ImageIoDecoder.decodeMeta]].
    */
  def decodeMeta(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    val s = open(bytes)
    try {
      val f = s.getFormat
      (bytes.length.toLong, f.getSampleRate.toLong, f.getChannels.toLong,
        s.getFrameLength, first)
    } finally s.close()
  }

  /** First-channel PCM samples in [-1, 1], capped at `maxFrames`
    * (8- and 16-bit PCM — what the JDK WAV reader emits).
    */
  private def samples(bytes: Array[Byte], maxFrames: Int = 1 << 20): Array[Double] = {
    val s = open(bytes)
    try {
      val f = s.getFormat
      val bits = f.getSampleSizeInBits
      val enc = f.getEncoding
      // linear PCM only — mu-law/a-law bytes through a linear decode
      // would produce deterministic-looking garbage, not audio
      require(enc == AudioFormat.Encoding.PCM_SIGNED ||
          enc == AudioFormat.Encoding.PCM_UNSIGNED,
        s"unsupported encoding $enc: linear PCM only")
      require(bits == 8 || bits == 16, s"unsupported PCM depth: $bits")
      val signed = enc == AudioFormat.Encoding.PCM_SIGNED
      val big = f.isBigEndian // AIFF is big-endian PCM; WAV little
      val frameSize = f.getFrameSize
      val n = math.min(if (s.getFrameLength < 0) maxFrames.toLong
        else s.getFrameLength, maxFrames.toLong).toInt
      val buf = new Array[Byte](n * frameSize)
      var off = 0
      var r = 0
      while (off < buf.length && r >= 0) {
        r = s.read(buf, off, buf.length - off)
        if (r > 0) off += r
      }
      val frames = off / frameSize
      val out = new Array[Double](frames)
      var i = 0
      while (i < frames) {
        val base = i * frameSize
        out(i) =
          if (bits == 16) {
            val (lo, hi) =
              if (big) (buf(base + 1) & 0xFF, buf(base).toInt)
              else (buf(base) & 0xFF, buf(base + 1).toInt)
            val v = ((hi << 8) | lo).toShort.toInt
            (if (signed) v else (v & 0xFFFF) - 32768) / 32768.0
          } else {
            val b0 = buf(base)
            (if (signed) b0.toInt else (b0 & 0xFF) - 128) / 128.0
          }
        i += 1
      }
      out
    } finally s.close()
  }

  val featureDim = 16

  /** Per-segment RMS energy over 16 equal time slices of the first
    * channel — the deterministic classical-DSP stand-in for a learned
    * audio embedding (the analog of the image tier's luminance grid).
    */
  def features(bytes: Array[Byte]): Array[Double] = {
    val xs = samples(bytes)
    val out = new Array[Double](featureDim)
    if (xs.isEmpty) return out
    var seg = 0
    while (seg < featureDim) {
      val a = seg * xs.length / featureDim
      val b = math.max(a + 1, (seg + 1) * xs.length / featureDim)
      var sum = 0.0
      var i = a
      while (i < math.min(b, xs.length)) { sum += xs(i) * xs(i); i += 1 }
      out(seg) = math.sqrt(sum / math.max(1, math.min(b, xs.length) - a))
      seg += 1
    }
    out
  }

  /** Energy-delta fingerprint: 65 segment energies, bit i set when
    * segment i+1 is louder than segment i — amplitude-scale-invariant
    * (both sides of each compare scale together), so re-normalized
    * copies of the same clip hash bit-close while different audio
    * flips ~half the bits. The audio analog of the image DCT pHash.
    */
  override def perceptualHash(bytes: Array[Byte]): Long = {
    val xs = samples(bytes)
    if (xs.isEmpty) return 0L
    val e = new Array[Double](65)
    var seg = 0
    while (seg < 65) {
      val a = seg * xs.length / 65
      val b = math.max(a + 1, (seg + 1) * xs.length / 65)
      var sum = 0.0
      var i = a
      while (i < math.min(b, xs.length)) { sum += xs(i) * xs(i); i += 1 }
      e(seg) = sum / math.max(1, math.min(b, xs.length) - a)
      seg += 1
    }
    var h = 0L
    var k = 0
    while (k < 64) { if (e(k + 1) > e(k)) h |= 1L << k; k += 1 }
    h
  }

  /** Truncate the clip to the frames that fit `maxBytes` (canonical
    * 44-byte PCM header + frames), preserving format — the audio
    * analog of image downscaling. Best-effort at the floor of one
    * frame.
    */
  def resize(bytes: Array[Byte], maxBytes: Int): Array[Byte] = {
    if (bytes.length <= maxBytes) return bytes
    // write back the INPUT container (AIFF/AU inputs decode fine but
    // would otherwise come back silently re-wrapped as WAV — or throw,
    // for writers that reject the byte order); fall back to WAVE only
    // when the container can't be sniffed
    val containerType =
      try AudioSystem.getAudioFileFormat(
        new java.io.ByteArrayInputStream(bytes)).getType
      catch { case _: Exception => javax.sound.sampled.AudioFileFormat.Type.WAVE }
    val s = open(bytes)
    try {
      val f = s.getFormat
      val framesAllowed = math.max(1L, (maxBytes - 44L) / f.getFrameSize)
      val limited = new AudioInputStream(s, f, math.min(framesAllowed,
        if (s.getFrameLength < 0) framesAllowed else s.getFrameLength))
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(limited, containerType, baos)
      baos.toByteArray
    } finally s.close()
  }

  /** Deterministic 16-bit mono PCM WAV: `nFrames` samples of an
    * integer triangle wave with `period` frames, canonical 44-byte
    * RIFF header — byte-exact on any JVM, which is what lets a gate
    * query oracle-check the real encode → decode round trip with
    * plain arithmetic (byte_len = 44 + 2·nFrames).
    */
  def synthesize(nFrames: Int, sampleRate: Int = 8000, period: Int = 32,
                 amplitude: Int = 8000): Array[Byte] = {
    require(nFrames > 0 && sampleRate > 0 && period > 1, "bad synth parameters")
    require(amplitude > 0 && amplitude <= 32000, "amplitude must be in (0, 32000]")
    val dataLen = nFrames * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nFrames) {
      val ph = i % period
      val tri = // integer triangle in [-amplitude, amplitude]
        if (ph < period / 2) -amplitude + (4 * amplitude * ph) / period
        else amplitude - (4 * amplitude * (ph - period / 2)) / period
      bb.putShort(tri.toShort)
      i += 1
    }
    bb.array()
  }
}

/** Name -> decoder registry for config-driven pipelines ("decode with
  * codec X" as data, not code). Driver-side: resolve the name HERE and
  * pass the instance into the transform — the closure carries the
  * decoder itself, so executors never consult the registry.
  */
object MediaDecoders {
  private val registry =
    scala.collection.concurrent.TrieMap[String, MediaDecoder](
      "stub" -> StubDecoder, "imageio" -> ImageIoDecoder, "wav" -> WavDecoder)

  def register(name: String, decoder: MediaDecoder): Unit = {
    require(name.nonEmpty, "decoder name must be non-empty")
    registry.put(name, decoder)
    ()
  }

  def get(name: String): MediaDecoder =
    registry.getOrElse(name, throw new IllegalArgumentException(
      s"no media decoder registered under '$name' (have: ${names.mkString(", ")})"))

  def names: Seq[String] = registry.keys.toSeq.sorted
}

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as batched partition-level transforms.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): [[StubDecoder]] derives deterministic pseudo-metadata
  * from the bytes. Everything around it — the binary column
  * representation, the batched `mapPartitions` shape (the Scala analog
  * of `mapInPandas`: one iterator in, one iterator out, amortized
  * per-batch setup), the output schema, and the frame-sampling
  * explode — is real and tested. A real codec plugs in through the
  * [[MediaDecoder]] trait (per-call parameter or [[MediaDecoders]]
  * registry); no edit to this file required.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("first_byte", LongType, nullable = false)))

  /** Attach a binary payload column derived from a string column (the
    * fixture tables carry no real media; production input would already
    * be binary).
    */
  def withPayload(df: DataFrame, textCol: String, payloadCol: String = "payload"): DataFrame =
    df.withColumn(payloadCol, col(textCol).cast(BinaryType))

  /** Attach a deterministic synthesized WAV payload
    * ([[WavDecoder.synthesize]]: 16-bit mono PCM, byte-exact on any
    * JVM) whose frame count comes from an integer column — the audio
    * fixture generator for gate queries (the tables carry no real
    * media; production input would already be binary). Same batched
    * mapPartitions shape as the decode passes; NULL frame counts
    * yield NULL payloads.
    */
  def withWavPayload(df: DataFrame, nFramesCol: String,
                     payloadCol: String = "payload",
                     sampleRate: Int = 8000,
                     amplitudeCol: Option[String] = None): DataFrame = {
    val schema = df.schema
    val nOrd = schema.fieldIndex(nFramesCol)
    val ampOrd = amplitudeCol.map(schema.fieldIndex)
    val outSchema = StructType(schema.fields :+
      StructField(payloadCol, BinaryType, nullable = true))
    df.mapPartitions { rows =>
      rows.map { row =>
        val payload =
          if (row.isNullAt(nOrd)) null
          else WavDecoder.synthesize(row.getAs[Number](nOrd).intValue, sampleRate,
            amplitude = ampOrd.map(row.getAs[Number](_).intValue).getOrElse(8000))
        Row.fromSeq(row.toSeq :+ payload)
      }
    }(Encoders.row(outSchema))
  }

  /** Decode payloads to a metadata struct via batched mapPartitions.
    * Per-partition setup (a real decoder handle, arena buffers) happens
    * once per partition, not per row — the property that matters when a
    * partition holds millions of rows.
    */
  /** `lenient = true` maps UNDECODABLE payloads (truncated PNG, not
    * actually audio, codec require failures) to a NULL meta struct
    * instead of failing the task — at 100 TB one corrupt row must not
    * abort the job; count the NULLs downstream as the quarantine
    * report. Default stays strict: silent data loss needs an opt-in.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String,
                 decoder: MediaDecoder = StubDecoder,
                 lenient: Boolean = false): DataFrame = {
    val schema = df.schema
    val idOrd = schema.fieldIndex(idCol)
    val payloadOrd = schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(schema(idCol), StructField("meta", MetaSchema, nullable = true)))
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here (decoder-internal
      // @transient lazy state initializes on first use per executor)
      rows.map { row =>
        val meta =
          if (row.isNullAt(payloadOrd)) null
          else decodeOrNull[Row](lenient) {
            val (len, w, h, f, fb) = decoder.decodeMeta(row.getAs[Array[Byte]](payloadOrd))
            Row(len, w, h, f, fb)
          }
        Row(row.get(idOrd), meta)
      }
    }(Encoders.row(outSchema))
  }

  /** Run a decode body; under `lenient` a decode failure becomes NULL
    * (fatal errors — OOM, interrupts — still propagate).
    */
  private def decodeOrNull[A >: Null](lenient: Boolean)(body: => A): A =
    if (!lenient) body
    else try body catch { case scala.util.control.NonFatal(_) => null }

  val FeatureDim: Int = StubDecoder.featureDim

  /** Feature extraction over payloads: batched mapPartitions emitting a
    * fixed-dim `array<double>` per row — the Scala analog of a
    * `mapInPandas` model-inference stage (per-partition model load,
    * per-batch tensor shape, columnar output).
    */
  def featurize(df: DataFrame, idCol: String, payloadCol: String,
                decoder: MediaDecoder = StubDecoder,
                lenient: Boolean = false): DataFrame = {
    val schema = df.schema
    val idOrd = schema.fieldIndex(idCol)
    val payloadOrd = schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(schema(idCol),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = true)))
    df.mapPartitions { rows =>
      // per-partition model/runtime setup would go here
      rows.map { row =>
        val feats =
          if (row.isNullAt(payloadOrd)) null
          else decodeOrNull[Seq[Double]](lenient)(
            decoder.features(row.getAs[Array[Byte]](payloadOrd)).toSeq)
        Row(row.get(idOrd), feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize via the decoder's resample; emits the resized payload plus
    * before/after lengths (the schema contract a real resizer keeps).
    */
  def resize(df: DataFrame, idCol: String, payloadCol: String, maxBytes: Int,
             decoder: MediaDecoder = StubDecoder): DataFrame = {
    val schema = df.schema
    val idOrd = schema.fieldIndex(idCol)
    val payloadOrd = schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(schema(idCol),
      StructField("resized", BinaryType, nullable = true),
      StructField("orig_len", LongType, nullable = true),
      StructField("resized_len", LongType, nullable = true)))
    df.mapPartitions { rows =>
      rows.map { row =>
        if (row.isNullAt(payloadOrd)) Row(row.get(idOrd), null, null, null)
        else {
          val b = row.getAs[Array[Byte]](payloadOrd)
          val out = decoder.resize(b, maxBytes)
          Row(row.get(idOrd), out, b.length.toLong, out.length.toLong)
        }
      }
    }(Encoders.row(outSchema))
  }

  /** Former name of [[resize]], kept for callers of the stub era. */
  def resizeStub(df: DataFrame, idCol: String, payloadCol: String, maxBytes: Int): DataFrame =
    resize(df, idCol, payloadCol, maxBytes)

  /** Perceptual hash per payload: `(id, phash LONG)` via the same
    * batched mapPartitions shape as the other decode passes. NULL
    * payloads yield NULL hashes.
    */
  def perceptualHashes(df: DataFrame, idCol: String, payloadCol: String,
                       decoder: MediaDecoder = StubDecoder,
                       lenient: Boolean = false): DataFrame = {
    val schema = df.schema
    val idOrd = schema.fieldIndex(idCol)
    val payloadOrd = schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(schema(idCol),
      StructField("phash", LongType, nullable = true)))
    df.mapPartitions { rows =>
      rows.map { row =>
        val h =
          if (row.isNullAt(payloadOrd)) null
          else decodeOrNull[java.lang.Long](lenient)(java.lang.Long.valueOf(
            decoder.perceptualHash(row.getAs[Array[Byte]](payloadOrd))))
        Row(row.get(idOrd), h)
      }
    }(Encoders.row(outSchema))
  }

  /** Media near-dup pairs from a `(id, phash)` frame: ALL pairs with
    * Hamming distance ≤ `maxDist` (≤ 15), via multi-index hashing
    * (Norouzi et al.): B wide bands, with the PROBE side emitting
    * every key within Hamming radius ⌊maxDist/B⌋ of each band value.
    * The pigeonhole rule makes this recall-lossless: a pair within
    * distance d has SOME band with at most ⌊d/B⌋ differing bits, and
    * exactly one probe mask (their band XOR) realizes that collision.
    *
    * Why wide keys with probing, not narrower exact bands: band
    * selectivity is what bounds the candidate volume. 8-bit exact
    * bands pigeonhole d ≤ 7 cheaply per-row, but 256 key values mean
    * E[candidates] ≈ n²·bands/256 — measured SUPERLINEAR at the 10×
    * scale sweep (13× cost at 10× rows). Wide keys shrink the
    * quadratic term ~30×: E[candidates] ≈ n²·B·C(width,≤r)/2^width,
    * while the probe fan-out stays a FIXED per-row constant — the
    * right trade at 100 TB, where the quadratic term is the cliff
    * and linear shuffle volume is just bandwidth. [[bandLayout]]
    * picks the (band count, width, radius) combination minimizing
    * that coefficient per requested distance.
    *
    * Candidates always form on equi-join keys — never an all-pairs
    * product; the exact `bit_count(xor)` predicate verifies. Pair
    * dedup keeps the FIRST band within radius only (no distinct pass
    * — same trick as the interval join's canonical band; per band the
    * matching probe mask is unique, so each qualifying band yields
    * exactly one joined row). Shuffle carries (band, band key, id,
    * hash): fixed width, never a payload.
    */
  /** Band layout per radius, minimizing the QUADRATIC candidate
    * coefficient (bands · C(width, ≤radius) / 2^width) first and probe
    * fan-out second — B bands with radius r pigeonhole d ≤ B(r+1)−1:
    *  - d ≤ 3:  4 × 16-bit, exact        (coef 6.1e-5, fan 4)
    *  - d ≤ 7:  4 × 16-bit, radius 1     (coef 1.0e-3, fan 68)
    *  - d ≤ 9:  5 × ~13-bit, radius 1    (coef 8.5e-3, fan ~70 — same
    *    coefficient as 4×16 radius 2 at an 8× smaller fan-out)
    *  - d ≤ 11: 4 × 16-bit, radius 2     (coef 8.4e-3, fan 548)
    *  - d ≤ 15: 4 × 16-bit, radius 3     (coef 4.3e-2, fan 2788)
    * Returns ((offset, width) per band, radius).
    */
  private[graft] def bandLayout(maxDist: Int): (Seq[(Int, Int)], Int) = {
    def even(n: Int): Seq[(Int, Int)] = {
      val base = 64 / n
      val extra = 64 % n
      val widths = Seq.fill(extra)(base + 1) ++ Seq.fill(n - extra)(base)
      widths.scanLeft(0)(_ + _).zip(widths)
    }
    maxDist match {
      case d if d <= 3  => (even(4), 0)
      case d if d <= 7  => (even(4), 1)
      case d if d <= 9  => (even(5), 1)
      case d if d <= 11 => (even(4), 2)
      case _            => (even(4), 3)
    }
  }

  /** Every (band, mask) probe pair for a layout: per band, all
    * width-bit masks with popcount ≤ radius (≤ 2^16 driver-side
    * iterations per band). Shared by [[phashNearDup]] and the banded
    * arm of `Dedup.hammingTopKAuto`.
    */
  private[graft] def bandMasks(layout: Seq[(Int, Int)], radius: Int): Seq[(Int, Long)] =
    layout.zipWithIndex.flatMap { case ((_, w), k) =>
      (0L until (1L << w)).filter(m => java.lang.Long.bitCount(m) <= radius)
        .map(m => (k, m))
    }

  def phashNearDup(hashes: DataFrame, idCol: String, hashCol: String = "phash",
                   maxDist: Int = 8): DataFrame = {
    require(maxDist >= 0 && maxDist <= 15,
      "maxDist must be in [0, 15]: the 4-band radius-3 probe covers <= 15 only")
    val (layout, radius) = bandLayout(maxDist)
    def slice(h: Column, k: Int) = {
      val (off, w) = layout(k)
      shiftrightunsigned(h, off).bitwiseAND(lit((1L << w) - 1))
    }
    def banded(side: String) = hashes.filter(col(hashCol).isNotNull)
      .select(col(idCol).as(s"${side}_id"), col(hashCol).as(s"${side}_h"))
      .select(col(s"${side}_id"), col(s"${side}_h"),
        posexplode(array(layout.indices.map(k => slice(col(s"${side}_h"), k)): _*))
          .as(Seq("band", "band_key")))
    val a = banded("a")
    val b =
      if (radius == 0) banded("b")
      else {
        // probe side: every key within the radius of each band value,
        // via a broadcast (band, mask) frame — per band the masks are
        // all width-bit values with popcount <= radius, enumerated
        // driver-side (<= 2^16 iterations per band)
        val spark = hashes.sparkSession
        import spark.implicits._
        banded("b").join(
            broadcast(bandMasks(layout, radius).toDF("band", "__m")), Seq("band"))
          .select(col("b_id"), col("b_h"), col("band"),
            col("band_key").bitwiseXOR(col("__m")).as("band_key"))
      }
    val dist = bit_count(col("a_h").bitwiseXOR(col("b_h")))
    // canonical band: no earlier band is already within the probe radius
    // (per band the matching probe mask is unique — it IS the band XOR —
    // so each qualifying band yields exactly one joined row)
    val firstBand = layout.indices.map(k =>
      lit(k) >= col("band") ||
        bit_count(slice(col("a_h"), k).bitwiseXOR(slice(col("b_h"), k))) > radius)
      .reduce(_ && _)
    a.join(b, Seq("band", "band_key"))
      .filter(col("a_id") < col("b_id") && dist <= maxDist && firstBand)
      .select(col("a_id"), col("b_id"), dist.cast("int").as("hamming"))
  }

  /** Frame sampling: one output row per sampled frame index, stride
    * `every`. Declarative explode over the decoded frame count — the
    * canonical "video → frames" fan-out. Zero-frame payloads (an empty
    * audio clip, a corrupt container decoded leniently) emit no rows
    * instead of crashing the job: `sequence(0, -1)` THROWS in ANSI
    * Spark, so the empty case is filtered before the explode.
    */
  def sampleFrames(meta: DataFrame, idCol: String, every: Int = 4): DataFrame = {
    require(every > 0, s"every must be positive, got $every")
    meta.select(col(idCol), col("meta.n_frames").as("n_frames"))
      .filter(col("n_frames") >= 1)
      .select(col(idCol),
        explode(sequence(lit(0L), col("n_frames") - 1, lit(every.toLong)))
          .as("frame_idx"))
      .select(col(idCol), col("frame_idx"))
  }
}
