package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mergeable quantile sketches as persistable artifacts — the
  * percentile twin of [[HllSketches]]: build per-group KLL sketches
  * once (one per day/partition/shard), store them as a binary column,
  * and answer any-range quantile questions later by MERGING the stored
  * sketches — no rescan of the raw data. `approx_percentile` can't do
  * this: its digest is not exposed, so every new range is a full
  * rescan.
  *
  * KLL (Karnin, Lang, Liberty — "Optimal quantile approximation in
  * streams", FOCS'16) via the DataSketches library already on Spark's
  * classpath; the sketch binary is the STANDARD DataSketches wire
  * format, readable by any binding. k = 200 gives ~1.65% normalized
  * rank error at 99% confidence, and the error envelope is preserved
  * under any merge order/shape.
  *
  * Shape at scale: the raw scan reduces to |groups| sketch rows (a few
  * KB each) in one aggregation with map-side partials; every later
  * merge works on sketch rows only. Compaction uses the sketch's
  * internal randomness, so bytes may differ between runs — the gate
  * contract is therefore the rank-error envelope (like q_hll_merge's
  * estimate envelope), never byte equality across builds.
  */
object KllSketches {

  /** One sketch row per group: `groups..., kll_sketch BINARY`. Persist
    * with a plain parquet write; round-trips byte-exactly (spec'd).
    */
  def partials(df: DataFrame, groups: Seq[String], valueCol: String,
               k: Int = 200): DataFrame = {
    require(k >= 8 && k <= 65535, s"KLL k must be in [8, 65535], got $k")
    require(!df.columns.contains("kll_sketch"),
      "kll_sketch is the partials output column — rename the input's first")
    df.groupBy(groups.map(col): _*)
      .agg(GraftColumnBridge.column(
        KllBuildAgg(GraftColumnBridge.expression(col(valueCol).cast("double")), k)
          .toAggregateExpression()).as("kll_sketch"))
  }

  /** Merge stored sketch rows up to a coarser grouping:
    * `by..., kll_sketch BINARY` — still an artifact, so rollups can
    * themselves be stored and merged again.
    */
  def mergeSketch(partials: DataFrame, by: Seq[String],
                  sketchCol: String = "kll_sketch"): DataFrame =
    partials.groupBy(by.map(col): _*)
      .agg(GraftColumnBridge.column(
        KllMergeAgg(GraftColumnBridge.expression(col(sketchCol)))
          .toAggregateExpression()).as("kll_sketch"))

  /** Quantile estimates at `probs` from a sketch binary:
    * `array<double>` (NULL for an empty sketch).
    */
  def quantiles(sketch: Column, probs: Seq[Double]): Column = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"ranks must be in [0, 1]: $probs")
    GraftColumnBridge.column(
      KllQuantiles(GraftColumnBridge.expression(sketch), probs))
  }

  /** Exact total update count carried by a sketch binary (`n` is exact
    * in KLL regardless of compaction — the free cross-check column for
    * gates and data cards).
    */
  def sketchN(sketch: Column): Column =
    GraftColumnBridge.column(KllN(GraftColumnBridge.expression(sketch)))

  /** Merge + extract in one call: `by..., n BIGINT, q_est ARRAY<DOUBLE>`. */
  def mergeQuantiles(partials: DataFrame, by: Seq[String], probs: Seq[Double],
                     sketchCol: String = "kll_sketch"): DataFrame = {
    val merged = mergeSketch(partials, by, sketchCol)
    merged.select((by.map(col) :+
      sketchN(col("kll_sketch")).as("n") :+
      quantiles(col("kll_sketch"), probs).as("q_est")): _*)
  }
}

/** Build a KLL doubles sketch from raw values; result/storage is the
  * standard DataSketches byte image.
  */
case class KllBuildAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buf: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllDoublesSketch, b: KllDoublesSketch): KllDoublesSketch = {
    a.merge(b); a
  }

  override def eval(buf: KllDoublesSketch): Any = buf.toByteArray

  override def serialize(buf: KllDoublesSketch): Array[Byte] = buf.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KllBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllBuildAgg =
    copy(child = newChild)
}

/** Union stored KLL sketch binaries (register-merge analog: the merged
  * sketch carries the combined stream's error envelope). The buffer is
  * LAZY — it adopts the first input sketch wholesale, so (a) no
  * accuracy is lost to an arbitrary pre-chosen buffer k (later merges
  * follow KLL's min-k rule over the INPUTS' k values only), and (b) an
  * empty buffer costs nothing: with thousands of group buffers live in
  * an ObjectHashAggregate, eager max-k preallocation would be ~0.5 MB
  * per buffer of pure waste.
  */
case class KllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllMergeAgg.Holder]
  with UnaryLike[Expression] {
  import KllMergeAgg.Holder

  override def createAggregationBuffer(): Holder = new Holder(null)

  // KLL merge keeps the TARGET's k, so an empty placeholder target
  // (e.g. a deserialized all-null partition buffer at the default k)
  // must be REPLACED by, not merged with, the first real sketch — or
  // its arbitrary k would cap the rollup's accuracy
  private def adopt(h: Holder, sk: KllDoublesSketch): Holder = {
    if (h.sk == null || h.sk.isEmpty) h.sk = sk
    else if (!sk.isEmpty) h.sk.merge(sk)
    h
  }

  override def update(buf: Holder, input: InternalRow): Holder = {
    val v = child.eval(input)
    if (v == null) buf
    else adopt(buf, KllDoublesSketch.heapify(Memory.wrap(v.asInstanceOf[Array[Byte]])))
  }

  override def merge(a: Holder, b: Holder): Holder =
    if (b.sk == null) a else adopt(a, b.sk)

  // an all-null (or empty-frame global) group still owes a valid empty
  // sketch artifact — emit one at the default k
  private def orEmpty(h: Holder): KllDoublesSketch =
    if (h.sk == null) KllDoublesSketch.newHeapInstance(200) else h.sk

  override def eval(buf: Holder): Any = orEmpty(buf).toByteArray
  override def serialize(buf: Holder): Array[Byte] = orEmpty(buf).toByteArray
  override def deserialize(bytes: Array[Byte]): Holder =
    new Holder(KllDoublesSketch.heapify(Memory.wrap(bytes)))

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KllMergeAgg =
    copy(child = newChild)
}

object KllMergeAgg {
  /** Mutable lazy buffer: null until the first input sketch arrives. */
  final class Holder(var sk: KllDoublesSketch)
}

/** Quantiles at fixed ranks from a KLL byte image — scalar, runs on
  * |groups|-row artifact frames (CodegenFallback like the PQ scalar
  * tier: the cost is the sketch library call, not expression dispatch).
  */
case class KllQuantiles(child: Expression, probs: Seq[Double])
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  // an EMPTY sketch has no quantiles -> null, even when the sketch
  // column itself is non-nullable (the build agg always emits bytes)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val sk = KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]]))
    if (sk.isEmpty) null
    else new GenericArrayData(probs.map(p => sk.getQuantile(p)).toArray[Any])
  }

  override protected def withNewChildInternal(newChild: Expression): KllQuantiles =
    copy(child = newChild)
}

/** Exact update count from a KLL byte image. */
case class KllN(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    KllDoublesSketch.heapify(Memory.wrap(input.asInstanceOf[Array[Byte]])).getN
  override protected def withNewChildInternal(newChild: Expression): KllN =
    copy(child = newChild)
}
