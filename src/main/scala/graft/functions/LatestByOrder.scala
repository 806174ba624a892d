package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.types.{DataType, LongType, StructType}

/** Arg-max by (ord1, ord2) returning the value struct — the
  * compaction kernel of ChangeCompaction.
  *
  * Why not `max_by(struct(payload), struct(ts, pos))`: a struct-typed
  * declarative buffer can't live in an UnsafeRow hash-aggregate
  * buffer, so Spark plans **SortAggregate** — partition-wide sorts on
  * both sides of the shuffle, exactly the cost the reference's
  * ROW_NUMBER window pays (merge.sql:309). A TypedImperativeAggregate
  * runs in **ObjectHashAggregateExec**: hash table per task, partial
  * (map-side) combine, no sort anywhere. Ordering keys are two
  * bigints (event time µs, source position) — a total order, so ties
  * cannot occur and the result is deterministic.
  */
case class LatestByOrder(
    ord1: Expression,
    ord2: Expression,
    value: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[LatestByOrder.Buf] {

  private lazy val valueSchema = value.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(valueSchema)

  override def children: Seq[Expression] = Seq(ord1, ord2, value)
  override def dataType: DataType = value.dataType
  override def nullable: Boolean = true

  // SQL-exposed via GraftExtensions, so bad argument types must be
  // analysis errors, not executor-side ClassCastExceptions.
  override def checkInputDataTypes(): TypeCheckResult = {
    if (ord1.dataType != LongType || ord2.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"latest_by order keys must be BIGINT, got (${ord1.dataType.sql}, ${ord2.dataType.sql})")
    else if (!value.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"latest_by value must be a STRUCT, got ${value.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): LatestByOrder.Buf = new LatestByOrder.Buf()

  override def update(buf: LatestByOrder.Buf, input: InternalRow): LatestByOrder.Buf = {
    // null order keys sort lowest — the DESC NULLS LAST contract of
    // the window form this aggregate replaces (RowNumberToLatestBy).
    val o1 = ord1.eval(input)
    val t = if (o1 == null) Long.MinValue else o1.asInstanceOf[Long]
    val o2 = ord2.eval(input)
    val p = if (o2 == null) Long.MinValue else o2.asInstanceOf[Long]
    val v = value.eval(input)
    // NULL value structs are skipped (like max_by over nulls) rather
    // than NPE-ing in the unsafe projection.
    if (v != null &&
        (buf.row == null || t > buf.ord1 || (t == buf.ord1 && p > buf.ord2))) {
      buf.ord1 = t; buf.ord2 = p
      buf.row = toUnsafe(v.asInstanceOf[InternalRow]).copy()
    }
    buf
  }

  override def merge(buf: LatestByOrder.Buf, other: LatestByOrder.Buf): LatestByOrder.Buf = {
    if (other.row != null &&
        (buf.row == null || other.ord1 > buf.ord1 ||
          (other.ord1 == buf.ord1 && other.ord2 > buf.ord2))) {
      buf.ord1 = other.ord1; buf.ord2 = other.ord2; buf.row = other.row
    }
    buf
  }

  override def eval(buf: LatestByOrder.Buf): Any = buf.row

  override def serialize(buf: LatestByOrder.Buf): Array[Byte] = {
    if (buf.row == null) return Array.emptyByteArray
    val rowBytes = buf.row.getBytes
    val out = java.nio.ByteBuffer.allocate(16 + rowBytes.length)
    out.putLong(buf.ord1).putLong(buf.ord2).put(rowBytes)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): LatestByOrder.Buf = {
    val buf = new LatestByOrder.Buf()
    if (bytes.length > 0) {
      val in = java.nio.ByteBuffer.wrap(bytes)
      buf.ord1 = in.getLong(); buf.ord2 = in.getLong()
      val row = new UnsafeRow(valueSchema.length)
      val payload = java.util.Arrays.copyOfRange(bytes, 16, bytes.length)
      row.pointTo(payload, payload.length)
      buf.row = row
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): LatestByOrder =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): LatestByOrder =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord1 = newChildren(0), ord2 = newChildren(1), value = newChildren(2))
}

object LatestByOrder {
  final class Buf {
    var ord1: Long = Long.MinValue
    var ord2: Long = Long.MinValue
    var row: UnsafeRow = null
  }

  /** latest_by(valueStruct, ord1, ord2) as a Column aggregate. */
  def apply(value: Column, ord1: Column, ord2: Column): Column =
    toCol(LatestByOrder(toExpr(ord1), toExpr(ord2), toExpr(value)).toAggregateExpression())
}
