package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructType}

/** Top-k rows per group by (ord1 DESC, ord2 ASC) as a hash
  * aggregation — the scale form of the `row_number() OVER (...)
  * <= k` idiom. The window form sorts every partition's full
  * contents per group; this aggregate's buffer never exceeds k
  * entries, and map-side partial combine means each task ships at
  * most k rows per group to the shuffle — at 100 TB that's
  * |groups|·k rows on the wire instead of |rows| through a sort.
  * Same ObjectHashAggregateExec engine as LatestByOrder (k = 1 of
  * this aggregate is exactly that).
  *
  * Determinism: (ord1, ord2) must be a total order per group —
  * callers pass a unique tiebreak (e.g. the key) as ord2.
  *
  * `ord2Desc` flips the tiebreak direction (and the null sentinel):
  * false = (ord1 DESC, ord2 ASC) — the natural "rank by score, break
  * ties by id" shape; true = (ord1 DESC, ord2 DESC) — the shape of
  * the reference's compaction window (merge.sql:309–310), which
  * RowNumberToLatestBy rewrites onto this aggregate. Both treat a
  * null key as sorting last (NULLS LAST of the window form).
  */
case class TopKByOrder(
    k: Int,
    ord1: Expression,
    ord2: Expression,
    value: Expression,
    ord2Desc: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKByOrder.Buf] {

  private lazy val valueSchema = value.dataType.asInstanceOf[StructType]
  @transient private lazy val toUnsafe = UnsafeProjection.create(valueSchema)

  override def children: Seq[Expression] = Seq(ord1, ord2, value)
  override def dataType: DataType = ArrayType(value.dataType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = {
    if (k < 1) TypeCheckResult.TypeCheckFailure(s"top_k_by k must be >= 1, got $k")
    else if (ord1.dataType != LongType || ord2.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by order keys must be BIGINT, got (${ord1.dataType.sql}, ${ord2.dataType.sql})")
    else if (!value.dataType.isInstanceOf[StructType])
      TypeCheckResult.TypeCheckFailure(
        s"top_k_by value must be a STRUCT, got ${value.dataType.sql}")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def createAggregationBuffer(): TopKByOrder.Buf = new TopKByOrder.Buf(k, ord2Desc)

  override def update(buf: TopKByOrder.Buf, input: InternalRow): TopKByOrder.Buf = {
    val o1 = ord1.eval(input)
    val o2 = ord2.eval(input)
    val v = value.eval(input)
    if (v != null) {
      buf.offer(
        if (o1 == null) Long.MinValue else o1.asInstanceOf[Long],
        // null ord2 sorts last in either direction
        if (o2 == null) { if (ord2Desc) Long.MinValue else Long.MaxValue }
        else o2.asInstanceOf[Long],
        // copy lazily: offer tells us whether the row made the cut
        () => toUnsafe(v.asInstanceOf[InternalRow]).copy())
    }
    buf
  }

  override def merge(buf: TopKByOrder.Buf, other: TopKByOrder.Buf): TopKByOrder.Buf = {
    var i = 0
    while (i < other.size) {
      val row = other.rows(i)
      buf.offer(other.ord1s(i), other.ord2s(i), () => row)
      i += 1
    }
    buf
  }

  override def eval(buf: TopKByOrder.Buf): Any =
    new GenericArrayData(buf.rows.take(buf.size).asInstanceOf[Array[Any]])

  override def serialize(buf: TopKByOrder.Buf): Array[Byte] = {
    var bytes = 0
    var i = 0
    while (i < buf.size) { bytes += 20 + buf.rows(i).getBytes.length; i += 1 }
    val out = java.nio.ByteBuffer.allocate(4 + bytes)
    out.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      val rb = buf.rows(i).getBytes
      out.putLong(buf.ord1s(i)).putLong(buf.ord2s(i)).putInt(rb.length).put(rb)
      i += 1
    }
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKByOrder.Buf = {
    val buf = new TopKByOrder.Buf(k, ord2Desc)
    val in = java.nio.ByteBuffer.wrap(bytes)
    val n = in.getInt()
    var i = 0
    while (i < n) {
      val o1 = in.getLong(); val o2 = in.getLong()
      val len = in.getInt()
      val rb = new Array[Byte](len)
      in.get(rb)
      val row = new UnsafeRow(valueSchema.length)
      row.pointTo(rb, len)
      buf.offer(o1, o2, () => row)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByOrder =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByOrder =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(ord1 = newChildren(0), ord2 = newChildren(1), value = newChildren(2))
}

object TopKByOrder {
  /** Sorted bounded buffer: slot 0 is the best — (ord1 desc, ord2
    * asc), or (ord1 desc, ord2 desc) when `ord2Desc`. k is small
    * (top-k reporting), so insertion is O(k) array moves — cheaper
    * and flatter than a heap at these sizes.
    */
  final class Buf(k: Int, ord2Desc: Boolean = false) {
    val ord1s = new Array[Long](k)
    val ord2s = new Array[Long](k)
    val rows = new Array[UnsafeRow](k)
    var size = 0

    private def beats(o1: Long, o2: Long, i: Int): Boolean =
      o1 > ord1s(i) || (o1 == ord1s(i) &&
        (if (ord2Desc) o2 > ord2s(i) else o2 < ord2s(i)))

    def offer(o1: Long, o2: Long, row: () => UnsafeRow): Unit = {
      if (size == k && !beats(o1, o2, k - 1)) return
      var pos = if (size < k) size else k - 1
      if (size < k) size += 1
      while (pos > 0 && beats(o1, o2, pos - 1)) {
        ord1s(pos) = ord1s(pos - 1); ord2s(pos) = ord2s(pos - 1); rows(pos) = rows(pos - 1)
        pos -= 1
      }
      ord1s(pos) = o1; ord2s(pos) = o2; rows(pos) = row()
    }
  }

  /** top_k_by(valueStruct, ord1 desc, ord2 asc, k) as a Column. */
  def apply(value: Column, ord1: Column, ord2: Column, k: Int): Column =
    toCol(TopKByOrder(k, toExpr(ord1), toExpr(ord2), toExpr(value)).toAggregateExpression())

  /** Variant with an explicit ord2 direction (desc = true mirrors a
    * (ord1 DESC, ord2 DESC) window).
    */
  def apply(value: Column, ord1: Column, ord2: Column, k: Int, ord2Desc: Boolean): Column =
    toCol(TopKByOrder(k, toExpr(ord1), toExpr(ord2), toExpr(value), ord2Desc)
      .toAggregateExpression())
}
