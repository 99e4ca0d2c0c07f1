package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SpaceSaving heavy-hitters sketch as a native Catalyst
  * `TypedImperativeAggregate` (SURVEY.md §2.4 A9 "exotic sketches" — the
  * same extension point Spark's own `ApproximatePercentile`/HLL sketches
  * use: an arbitrary JVM buffer with explicit serialize/merge, planned as
  * a regular partial+final hash aggregate, so the map side ships one
  * `capacity`-bounded sketch per partition instead of the raw column).
  *
  * Guarantees (Metwally et al. SpaceSaving; Agarwal et al. mergeability):
  * for every entry, `count - err <= true <= count`; any item whose true
  * frequency exceeds n/capacity is present in the sketch. With
  * `capacity >= |distinct|` no eviction happens: counts are EXACT and the
  * result is independent of partitioning/merge order — the configuration
  * the DuckDB oracle pins (q85). Under truncation the kept set can vary
  * with the merge tree near tied boundary counts, like any mergeable
  * summary — bounds above still hold.
  *
  * Output: `array<struct<item, cnt, err>>`, count-descending, ties broken
  * by item order.
  */
case class HeavyHitters(
    child: Expression,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[HeavyHitters.Sketch] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"heavy_hitters supports string/bigint/int items, got ${dt.catalogString}")
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", child.dataType, nullable = false),
    StructField("cnt", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def nullable: Boolean = false
  override def prettyName: String = "heavy_hitters"

  override def createAggregationBuffer(): HeavyHitters.Sketch =
    new HeavyHitters.Sketch(capacity)

  override def update(buf: HeavyHitters.Sketch, row: InternalRow): HeavyHitters.Sketch = {
    val v = child.eval(row)
    if (v != null) {
      // UTF8String from an unsafe row aliases the row's buffer — copy
      val key = v match {
        case s: UTF8String => s.copy()
        case other => other
      }
      buf.add(key)
    }
    buf
  }

  override def merge(a: HeavyHitters.Sketch, b: HeavyHitters.Sketch): HeavyHitters.Sketch =
    a.mergeWith(b, itemOrdering)

  private lazy val itemOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(child.dataType)

  override def eval(buf: HeavyHitters.Sketch): Any = {
    val entries = buf.entries.toSeq
      .sortBy { case (item, (cnt, _)) => (-cnt, item) }(
        Ordering.Tuple2(Ordering.Long, itemOrdering))
    new GenericArrayData(entries.map { case (item, (cnt, err)) =>
      InternalRow(item, cnt, err)
    })
  }

  override def serialize(buf: HeavyHitters.Sketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.capacity)
    out.writeInt(buf.entries.size)
    buf.entries.foreach { case (item, (cnt, err)) =>
      child.dataType match {
        case StringType =>
          val b = item.asInstanceOf[UTF8String].getBytes
          out.writeInt(b.length); out.write(b)
        case LongType => out.writeLong(item.asInstanceOf[Long])
        case IntegerType => out.writeInt(item.asInstanceOf[Int])
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
      out.writeLong(cnt); out.writeLong(err)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): HeavyHitters.Sketch = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val sketch = new HeavyHitters.Sketch(in.readInt())
    val n = in.readInt()
    (0 until n).foreach { _ =>
      val item: Any = child.dataType match {
        case StringType =>
          val b = new Array[Byte](in.readInt()); in.readFully(b)
          UTF8String.fromBytes(b)
        case LongType => in.readLong()
        case IntegerType => in.readInt()
        case dt => throw new IllegalStateException(s"unsupported $dt")
      }
      val cnt = in.readLong(); val err = in.readLong()
      sketch.entries(item) = (cnt, err)
    }
    sketch
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHitters =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): HeavyHitters =
    copy(child = newChild)
}

object HeavyHitters {

  /** SpaceSaving counter set: item -> (count upper bound, max overcount). */
  final class Sketch(val capacity: Int) {
    val entries: mutable.HashMap[Any, (Long, Long)] = mutable.HashMap.empty

    /** Smallest count — the overcount floor for items absent from a FULL
      * sketch (an absent item's true count cannot exceed it). */
    private def minCount: Long =
      if (entries.size < capacity) 0L
      else entries.valuesIterator.map(_._1).min

    def add(item: Any, weight: Long = 1L): Unit =
      entries.get(item) match {
        case Some((c, e)) => entries(item) = (c + weight, e)
        case None if entries.size < capacity => entries(item) = (weight, 0L)
        case None =>
          // evict the min-count entry; the newcomer inherits its count as
          // the classic SpaceSaving overcount bound
          val (evictItem, (evictCnt, _)) = entries.minBy(_._2._1)
          entries.remove(evictItem)
          entries(item) = (evictCnt + weight, evictCnt)
      }

    /** Mergeable-summaries combine: absent items are bounded by the other
      * side's min count; then truncate to the top `capacity` counts. */
    def mergeWith(other: Sketch, ord: Ordering[Any]): Sketch = {
      val mSelf = minCount
      val mOther = other.minCount
      val keys = entries.keySet ++ other.entries.keySet
      val combined = keys.iterator.map { k =>
        val (c1, e1) = entries.getOrElse(k, (mSelf, mSelf))
        val (c2, e2) = other.entries.getOrElse(k, (mOther, mOther))
        k -> (c1 + c2, e1 + e2)
      }.toSeq
      val kept =
        if (combined.size <= capacity) combined
        else combined.sortBy { case (item, (cnt, _)) => (-cnt, item) }(
          Ordering.Tuple2(Ordering.Long, ord)).take(capacity)
      entries.clear()
      kept.foreach { case (k, v) => entries(k) = v }
      this
    }
  }

  /** Column API: `HeavyHitters(col, k)` as an aggregate Column. */
  def apply(c: Column, capacity: Int): Column = {
    import org.apache.spark.sql.graft.Bridge
    Bridge.column(
      HeavyHitters(Bridge.expression(c), capacity).toAggregateExpression())
  }
}
