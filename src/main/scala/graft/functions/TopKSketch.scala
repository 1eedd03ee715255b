package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Space-saving heavy-hitters sketch (Metwally, Agrawal, El Abbadi —
  * "Efficient computation of frequent and top-k elements in data
  * streams", ICDT'05) as a native Catalyst TypedImperativeAggregate —
  * the aggregate tier Spark itself lacks (no approximate top-k in
  * `functions._`; the nearest is `approx_count_distinct`).
  *
  * Buffer: at most `capacity` (item → (count, maxError)) entries. On an
  * unseen item with a full buffer, the minimum-count entry is evicted
  * and the newcomer inherits its count as an upper bound (error =
  * evicted count). Guarantees, preserved under any merge order:
  *   - every item with true frequency > n/capacity is present,
  *   - count_est ∈ [true, true + max_err].
  * Exact when the distinct-item count never exceeds `capacity`.
  *
  * Scale shape: each partition carries a fixed-size summary (partial
  * aggregation), the shuffle moves `capacity` entries per partition —
  * never the token stream. This is the operator for "top URLs /
  * domains / n-grams over 100 TB" where an exact groupBy would shuffle
  * the whole corpus vocabulary.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]]
  with UnaryLike[Expression] {

  require(k > 0 && capacity >= k, "need capacity >= k > 0")

  override def createAggregationBuffer(): mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  private def add(buf: mutable.HashMap[String, (Long, Long)], item: String,
                  cnt: Long, err: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf(item) = (c + cnt, e + err)
      case None if buf.size < capacity => buf(item) = (cnt, err)
      case None =>
        // evict the min-count entry (ties by item for determinism);
        // newcomer inherits its count as the classic upper bound
        val (minItem, (minCnt, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
        buf.remove(minItem)
        buf(item) = (minCnt + cnt, minCnt + err)
    }

  override def update(buf: mutable.HashMap[String, (Long, Long)],
                      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null) add(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
                     b: mutable.HashMap[String, (Long, Long)]): mutable.HashMap[String, (Long, Long)] = {
    b.foreach { case (i, (c, e)) => add(a, i, c, e) }
    a
  }

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)]): Array[Byte] = {
    val bytes = new ByteArrayOutputStream()
    val out = new DataOutputStream(bytes)
    out.writeInt(buf.size)
    buf.foreach { case (i, (c, e)) =>
      // length-prefixed UTF-8, not writeUTF: items are arbitrary values
      // (urls, whole documents) and writeUTF throws past 64 KB
      val b = i.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b)
      out.writeLong(c); out.writeLong(e)
    }
    out.close()
    bytes.toByteArray
  }

  override def deserialize(storageFormat: Array[Byte]): mutable.HashMap[String, (Long, Long)] = {
    val in = new DataInputStream(new ByteArrayInputStream(storageFormat))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, (Long, Long)]
    (1 to n).foreach { _ =>
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, java.nio.charset.StandardCharsets.UTF_8)) =
        (in.readLong(), in.readLong())
    }
    buf
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count_est", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): SpaceSavingTopK =
    copy(child = newChild)
}

object TopKSketch {
  /** `array<struct<item, count_est, max_err>>` of the ~k most frequent
    * values of `c`, using a fixed `capacity`-entry summary per partition.
    */
  def topK(c: Column, k: Int, capacity: Int): Column =
    GraftColumnBridge.column(
      SpaceSavingTopK(GraftColumnBridge.expression(c), k, capacity)
        .toAggregateExpression())
}
