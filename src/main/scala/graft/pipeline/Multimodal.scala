package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
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

/** Name -> decoder registry for config-driven pipelines ("decode with
  * codec X" as data, not code). Driver-side: resolve the name HERE and
  * pass the instance into the transform — the closure carries the
  * decoder itself, so executors never consult the registry.
  */
object MediaDecoders {
  private val registry =
    scala.collection.concurrent.TrieMap[String, MediaDecoder]("stub" -> StubDecoder)

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

  /** Decode payloads to a metadata struct via batched mapPartitions.
    * Per-partition setup (a real decoder handle, arena buffers) happens
    * once per partition, not per row — the property that matters when a
    * partition holds millions of rows.
    */
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String,
                 decoder: MediaDecoder = StubDecoder): DataFrame = {
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
          else {
            val (len, w, h, f, fb) = decoder.decodeMeta(row.getAs[Array[Byte]](payloadOrd))
            Row(len, w, h, f, fb)
          }
        Row(row.get(idOrd), meta)
      }
    }(Encoders.row(outSchema))
  }

  val FeatureDim: Int = StubDecoder.featureDim

  /** Feature extraction over payloads: batched mapPartitions emitting a
    * fixed-dim `array<double>` per row — the Scala analog of a
    * `mapInPandas` model-inference stage (per-partition model load,
    * per-batch tensor shape, columnar output).
    */
  def featurize(df: DataFrame, idCol: String, payloadCol: String,
                decoder: MediaDecoder = StubDecoder): DataFrame = {
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
          else decoder.features(row.getAs[Array[Byte]](payloadOrd)).toSeq
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

  /** Frame sampling: one output row per sampled frame index, stride
    * `every`. Declarative explode over the decoded frame count — the
    * canonical "video → frames" fan-out.
    */
  def sampleFrames(meta: DataFrame, idCol: String, every: Int = 4): DataFrame =
    meta.select(col(idCol), col("meta.n_frames").as("n_frames"),
        explode(sequence(lit(0L), col("meta.n_frames") - 1, lit(every.toLong)))
          .as("frame_idx"))
      .select(col(idCol), col("frame_idx"))
}
