package graft.pipeline

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: treat image/audio/video payloads as opaque
  * `binary` columns with a typed metadata struct, and run decode /
  * feature-extraction as batched partition-level transforms.
  *
  * The actual media decode is STUBBED (no image/audio libraries in this
  * container): `decodeStub` derives deterministic pseudo-metadata from
  * the bytes. Everything around it — the binary column representation,
  * the batched `mapPartitions` shape (the Scala analog of `mapInPandas`:
  * one iterator in, one iterator out, amortized per-batch setup), the
  * output schema, and the frame-sampling explode — is real and tested.
  * Swapping in a real decoder means replacing only `fakeDecode`.
  */
object Multimodal {

  val MetaSchema: StructType = StructType(Seq(
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
    StructField("n_frames", LongType, nullable = false),
    StructField("first_byte", LongType, nullable = false)))

  /** Deterministic stand-in for a media decoder. Replace with the real
    * thing (e.g. image codec) when the library is available.
    */
  def fakeDecode(bytes: Array[Byte]): (Long, Long, Long, Long, Long) = {
    val len = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    (len, len % 640, (len * 7) % 480, len % 16 + 1, first)
  }

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
  def decodeMeta(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
    val schema = df.schema
    val idOrd = schema.fieldIndex(idCol)
    val payloadOrd = schema.fieldIndex(payloadCol)
    val outSchema = StructType(Seq(schema(idCol), StructField("meta", MetaSchema, nullable = true)))
    df.mapPartitions { rows =>
      // per-partition decoder setup would go here
      rows.map { row =>
        val meta =
          if (row.isNullAt(payloadOrd)) null
          else {
            val (len, w, h, f, fb) = fakeDecode(row.getAs[Array[Byte]](payloadOrd))
            Row(len, w, h, f, fb)
          }
        Row(row.get(idOrd), meta)
      }
    }(Encoders.row(outSchema))
  }

  val FeatureDim = 16

  /** Deterministic stand-in for a feature extractor (e.g. an image
    * embedding model): element j derives from the byte length and first
    * byte only, so any engine can reproduce it exactly. Replace with a
    * real model runtime per partition when available.
    */
  def fakeFeatures(bytes: Array[Byte]): Array[Double] = {
    val len = bytes.length.toLong
    val first = if (bytes.isEmpty) 0L else (bytes(0) & 0xFF).toLong
    Array.tabulate(FeatureDim)(j => ((len * (j + 1) + first) % 1000L).toDouble / 1000.0)
  }

  /** Feature extraction over payloads: batched mapPartitions emitting a
    * fixed-dim `array<double>` per row — the Scala analog of a
    * `mapInPandas` model-inference stage (per-partition model load,
    * per-batch tensor shape, columnar output).
    */
  def featurize(df: DataFrame, idCol: String, payloadCol: String): DataFrame = {
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
          else fakeFeatures(row.getAs[Array[Byte]](payloadOrd)).toSeq
        Row(row.get(idOrd), feats)
      }
    }(Encoders.row(outSchema))
  }

  /** Resize stub: deterministic byte truncation standing in for a real
    * image/audio resample; emits the resized payload plus before/after
    * lengths (the schema contract a real resizer would keep).
    */
  def resizeStub(df: DataFrame, idCol: String, payloadCol: String, maxBytes: Int): DataFrame = {
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
          val out = if (b.length <= maxBytes) b else b.take(maxBytes)
          Row(row.get(idOrd), out, b.length.toLong, out.length.toLong)
        }
      }
    }(Encoders.row(outSchema))
  }

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
