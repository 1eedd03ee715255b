package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Sketches, Union, UpdateSketch}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Mergeable distinct-SET sketches with full set algebra — what HLL
  * cannot do: HLL unions only, while audience/overlap questions need
  * intersections and differences ("how many of source B's users are
  * ALREADY in source A", "distinct new users this week"). Theta
  * sketches (the KMV/k'-minimum-values family) support union ∪,
  * intersection ∩, and difference \ over their stored form, so
  * per-partition artifacts answer any later set-algebra question with
  * no rescan — the set twin of [[HllSketches]]/[[KllSketches]].
  *
  * DataSketches theta via the jars on Spark's classpath; binaries are
  * the standard wire format. lgK = 12 (4096 retained hashes) keeps the
  * sketch EXACT below ~4096 distinct values and ~1.6% RSE above.
  * Hashing is seed-fixed, so sketch contents are deterministic for a
  * given value set (unlike KLL's randomized compaction).
  *
  * Shape at scale: one aggregation reduces the raw scan to |groups|
  * sketch rows; set algebra then runs scalar-side on artifact frames
  * (the |groups|²-at-most overlap matrix), never touching raw data.
  */
object ThetaSketches {

  /** One sketch row per group: `groups..., theta_sketch BINARY`. */
  def partials(df: DataFrame, groups: Seq[String], valueCol: String,
               lgK: Int = 12): DataFrame = {
    require(lgK >= 4 && lgK <= 26, s"lgK must be in [4, 26], got $lgK")
    require(!df.columns.contains("theta_sketch"),
      "theta_sketch is the partials output column — rename the input's first")
    df.groupBy(groups.map(col): _*)
      .agg(GraftColumnBridge.column(
        ThetaBuildAgg(GraftColumnBridge.expression(col(valueCol)), lgK)
          .toAggregateExpression()).as("theta_sketch"))
  }

  /** Union stored sketch rows up to a coarser grouping — still an
    * artifact (`by..., theta_sketch BINARY`).
    */
  def mergeSketch(partials: DataFrame, by: Seq[String],
                  sketchCol: String = "theta_sketch"): DataFrame =
    partials.groupBy(by.map(col): _*)
      .agg(GraftColumnBridge.column(
        ThetaUnionAgg(GraftColumnBridge.expression(col(sketchCol)))
          .toAggregateExpression()).as("theta_sketch"))

  /** Distinct-count estimate of a sketch binary (DOUBLE). */
  def estimate(sketch: Column): Column =
    GraftColumnBridge.column(ThetaEstimate(GraftColumnBridge.expression(sketch)))

  /** A ∩ B as a sketch binary (composable: feed back into estimate /
    * further algebra).
    */
  def intersect(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOp(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), "intersect"))

  /** A \ B as a sketch binary. */
  def aNotB(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOp(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), "anotb"))

  /** A ∪ B as a sketch binary (pairwise form of [[mergeSketch]]). */
  def union(a: Column, b: Column): Column =
    GraftColumnBridge.column(ThetaSetOp(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), "union"))
}

private object ThetaCodec {
  def heapify(bytes: Array[Byte]): Sketch =
    Sketches.wrapSketch(Memory.wrap(bytes))
  def compactBytes(s: Sketch): Array[Byte] = s.compact(true, null).toByteArray
}

/** Build a theta sketch from raw values (LONG/INT or STRING child). */
case class ThetaBuildAgg(
    child: Expression,
    lgK: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setLogNominalEntries(lgK).buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) v match {
      case l: java.lang.Long    => buf.update(l.longValue())
      case i: java.lang.Integer => buf.update(i.longValue())
      case s: UTF8String        => buf.update(s.toString)
      case other => throw new IllegalArgumentException(
        s"theta sketch supports LONG/INT/STRING values, got ${other.getClass}")
    }
    buf
  }

  override def merge(a: Union, b: Union): Union = {
    a.union(b.getResult); a
  }

  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaCodec.heapify(bytes)); u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaBuildAgg =
    copy(child = newChild)
}

/** Union stored theta sketch binaries. */
case class ThetaUnionAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union]
  with UnaryLike[Expression] {

  override def createAggregationBuffer(): Union =
    SetOperation.builder().buildUnion()

  override def update(buf: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) buf.union(ThetaCodec.heapify(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Union, b: Union): Union = { a.union(b.getResult); a }
  override def eval(buf: Union): Any = buf.getResult.toByteArray
  override def serialize(buf: Union): Array[Byte] = buf.getResult.toByteArray
  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(ThetaCodec.heapify(bytes)); u
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ThetaUnionAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): ThetaUnionAgg =
    copy(child = newChild)
}

/** Distinct estimate from a theta byte image (scalar artifact tier). */
case class ThetaEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(input: Any): Any =
    ThetaCodec.heapify(input.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(newChild: Expression): ThetaEstimate =
    copy(child = newChild)
}

/** Pairwise set algebra over two theta byte images -> byte image. */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
    extends BinaryExpression with CodegenFallback {
  require(Set("intersect", "anotb", "union").contains(op), s"unknown theta op $op")

  override def dataType: DataType = BinaryType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = ThetaCodec.heapify(l.asInstanceOf[Array[Byte]])
    val b = ThetaCodec.heapify(r.asInstanceOf[Array[Byte]])
    val out: CompactSketch = op match {
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(a); i.intersect(b); i.getResult
      case "anotb" =>
        SetOperation.builder().buildANotB().aNotB(a, b)
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(a); u.union(b); u.getResult
    }
    out.toByteArray
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): ThetaSetOp =
    copy(left = newLeft, right = newRight)
}
