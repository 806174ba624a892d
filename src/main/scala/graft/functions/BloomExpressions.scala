package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.{BloomFilter, CountMinSketch}

/** Bloom-filter membership probe as a native Catalyst expression.
  *
  * The scale role (SURVEY.md §5): a semi-join against a small-ish
  * build side (benchmark n-grams, a blocklist, a dictionary) normally
  * ships EVERY probe-side row through the join's shuffle. Evaluating
  * a pre-built Bloom filter map-side keeps the (1 − fpp) non-matching
  * majority out of the exchange entirely — at a 100 TB probe side the
  * shuffle shrinks from corpus-sized to match-sized. The filter may
  * report false positives, so callers MUST keep an exact join (or
  * equality verify) after the probe: the filter only prunes, it never
  * decides. False negatives are impossible, which is what makes the
  * prune safe.
  *
  * The deserialized filter is one reference object per task binary
  * (`addReferenceObj`), so the probe stays inside whole-stage codegen
  * with no per-row deserialization.
  *
  * Input types mirror what `DataFrameStatFunctions.bloomFilter`
  * inserts: STRING probes test the UTF-8 bytes, integral probes test
  * the long value.
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain needs a string or bigint probe, got $t")
  }

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(filterBytes))

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => filter.mightContainBinary(s.getBytes)
    case l: java.lang.Long => filter.mightContainLong(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val f = ctx.addReferenceObj("bloomFilter", filter, classOf[BloomFilter].getName)
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $f.mightContainBinary($c.getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $f.mightContainLong($c);")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContain {
  /** Serialize a fitted filter once (driver-side) for embedding. */
  def serialize(filter: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    filter.writeTo(bos)
    bos.toByteArray
  }

  def apply(probe: Column, filter: BloomFilter): Column =
    toCol(BloomMightContain(toExpr(probe), serialize(filter)))
}

/** Count-min-sketch frequency estimate as a native expression — the
  * counting sibling of [[BloomMightContain]]. The estimate is
  * one-sided (≥ the true count, ≤ true + ε·N with confidence 1−δ),
  * so `cms_estimate(x) >= threshold` is a SAFE map-side prune for
  * heavy-hitter queries: a key the sketch puts under the threshold
  * provably is, so only candidate keys reach the exact-count
  * exchange and the shuffle tracks the number of frequent keys, not
  * the corpus. Exact counting of the survivors then removes the
  * overestimates — sketch proposes, exact disposes, identical
  * results to the unfiltered aggregation.
  */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "cms_estimate"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"cms_estimate needs a string or bigint probe, got $t")
  }

  @transient private lazy val sketch: CountMinSketch =
    CountMinSketch.readFrom(new ByteArrayInputStream(sketchBytes))

  override def nullSafeEval(input: Any): Any = input match {
    case s: UTF8String => sketch.estimateCount(s.getBytes)
    case l: java.lang.Long => sketch.estimateCount(l)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.addReferenceObj("cmSketch", sketch, classOf[CountMinSketch].getName)
    child.dataType match {
      case StringType =>
        nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $s.estimateCount($c.getBytes());")
      case _ =>
        nullSafeCodeGen(ctx, ev, c =>
          s"${ev.value} = $s.estimateCount(Long.valueOf($c));")
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CmsEstimate {
  def serialize(sketch: CountMinSketch): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    sketch.writeTo(bos)
    bos.toByteArray
  }

  def apply(probe: Column, sketch: CountMinSketch): Column =
    toCol(CmsEstimate(toExpr(probe), serialize(sketch)))
}

/** Distributed Bloom-filter BUILD as a typed aggregate (A54's build
  * half): `groupBy(bucket).agg(bloomAgg(col))` constructs one filter
  * per group in a single pass — partial buffers fill map-side, merge
  * via bitwise OR in the reduce, and only |groups| serialized
  * filters ever move. This is how a per-bucket secondary index over
  * 100 TB is built with shuffle ∝ (buckets × filter bytes), never
  * rows. Insert semantics mirror [[BloomMightContain]]'s probe:
  * strings insert their UTF-8 bytes, integral values their long —
  * so a filter built here can be probed by that expression or by
  * driver-side `mightContain*`.
  */
case class BloomBuildAgg(
    child: org.apache.spark.sql.catalyst.expressions.Expression,
    expectedItems: Long, fpp: Double,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[BloomFilter] {

  override def children: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =
    Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def prettyName: String = "bloom_build"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"bloom_build needs a string or bigint input, got $t")
  }

  override def createAggregationBuffer(): BloomFilter =
    BloomFilter.create(expectedItems, fpp)

  override def update(buffer: BloomFilter,
      input: org.apache.spark.sql.catalyst.InternalRow): BloomFilter = {
    child.eval(input) match {
      case null => ()
      case s: UTF8String => buffer.putBinary(s.getBytes)
      case l: java.lang.Long => buffer.putLong(l)
      case other => throw new IllegalStateException(
        s"bloom_build: unexpected input $other")
    }
    buffer
  }

  override def merge(buffer: BloomFilter, other: BloomFilter): BloomFilter = {
    buffer.mergeInPlace(other)
    buffer
  }

  override def eval(buffer: BloomFilter): Any = serialize(buffer)

  override def serialize(buffer: BloomFilter): Array[Byte] =
    BloomMightContain.serialize(buffer)

  override def deserialize(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomBuildAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[org.apache.spark.sql.catalyst.expressions.Expression])
      : BloomBuildAgg =
    copy(child = newChildren.head)
}

object BloomBuildAgg {
  def apply(c: Column, expectedItems: Long, fpp: Double): Column = {
    import graft.functions.{toCol, toExpr}
    toCol(new BloomBuildAgg(toExpr(c), expectedItems, fpp).toAggregateExpression())
  }
}
