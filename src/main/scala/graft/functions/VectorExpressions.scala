package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StructField, StructType}

/** Cosine similarity of two float vectors as a native Catalyst
  * expression.
  *
  * The composable form — three `aggregate`/`zip_with` folds — runs on
  * Catalyst's interpreted HigherOrderFunction path: every element is
  * a boxed lambda invocation, which made the O(N²) near-dup scan the
  * whole benchmark (§ SURVEY.md 5: "codegen-friendly"). This
  * expression does one tight primitive loop per row and generates
  * inline Java (`doGenCode`), keeping the surrounding filter/join
  * stage in whole-stage codegen.
  *
  * Arithmetic contract (must stay oracle-compatible): products and
  * accumulation in float64, sequential left-to-right,
  * cos = dot / (sqrt(na) * sqrt(nb)).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity needs array<float> inputs, got ${left.dataType}, ${right.dataType}")
  }

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val r = CosineSimilarity.compute(x, y)
    if (r.isNaN) null else r // zero-norm input → NULL, not NaN
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""${ev.value} = graft.functions.CosineSimilarity.compute(
         |  $a.toFloatArray(), $b.toFloatArray());
         |if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }""".stripMargin)

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Order-preserving BIGINT encoding of a double: signed-long
  * comparison of the encoded values equals IEEE-754 total order on
  * the doubles (sign-magnitude → two's complement flip; the standard
  * sortable-bits trick from columnar index formats). Exists so
  * argmax/top-k over a double score can run in the LatestByOrder/
  * TopKByOrder hash aggregates — whose order keys are BIGINT —
  * instead of a row_number window, which shuffles AND sorts every
  * (row × candidate) pair. Codegen'd; NULL passes through (and the
  * aggregates treat a null key as -infinity, matching DESC NULLS
  * LAST).
  */
case class SortableDoubleBits(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case DoubleType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sortable_double_bits needs DOUBLE, got $other")
    }

  override def nullSafeEval(v: Any): Any =
    SortableDoubleBits.encode(v.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SortableDoubleBits.encode($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SortableDoubleBits {
  /** positive doubles keep their bits (already ascending); negative
    * doubles flip their magnitude bits so "more negative" is "more
    * negative" in two's complement too.
    */
  def encode(d: Double): Long = {
    val bits = java.lang.Double.doubleToLongBits(d)
    bits ^ ((bits >> 63) & Long.MaxValue)
  }

  def apply(c: Column): Column = toCol(SortableDoubleBits(toExpr(c)))
}

/** embedding → array<struct<tbl:int,bucket:long>>: the vector's
  * random-hyperplane LSH bucket in each of `tables` independent hash
  * tables (bucket = sign bits against `planes` hyperplanes).
  *
  * Replaces the composable formulation (transform/aggregate/zip_with
  * lambdas), which ran on the interpreted HigherOrderFunction path
  * AND regenerated every plane-weight array per (row, plane) — the
  * same anti-pattern MinHashBandBuckets replaced for text (measured
  * there at ~100× — SURVEY.md §5 "codegen-friendly"). Here the
  * [tables·planes × dims] plane matrix is built once per executor
  * (lazy, from the expression's parameters) and each row pays one
  * primitive dot-product loop per plane.
  *
  * Arithmetic contract (bit-identical to the previous formulation so
  * bucket assignments are unchanged): weight(h, j) =
  * (pmod(xxhash64(h, j), 2001) − 1000)/1000 with Spark's seed-42
  * chained xxhash64 over two ints; dot = sequential float64 fold;
  * bit i of table t set iff dot(v, plane t·planes+i) > 0.
  */
case class LshTableBuckets(child: Expression, tables: Int, planes: Int, dims: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("tbl", IntegerType, nullable = false),
      StructField("bucket", LongType, nullable = false))),
    containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"lsh_table_buckets needs array<float>, got $other")
    }

  // Plane matrix, built once per executor instance — NOT per row.
  @transient private lazy val weights: Array[Array[Double]] =
    Array.tabulate(tables * planes) { h =>
      val hSeed = XxHash64Function.hash(h, IntegerType, 42L)
      Array.tabulate(dims) { j =>
        val x = XxHash64Function.hash(j, IntegerType, hSeed)
        (((x % 2001L) + 2001L) % 2001L - 1000.0) / 1000.0
      }
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(dims, arr.length)
    val out = new Array[Any](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var i = 0
      while (i < planes) {
        val w = weights(t * planes + i)
        var dot = 0.0
        var j = 0
        while (j < n) { dot += arr(j).toDouble * w(j); j += 1 }
        if (dot > 0) bucket |= (1L << i)
        i += 1
      }
      out(t) = new GenericInternalRow(Array[Any](t, bucket))
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object LshTableBuckets {
  def apply(v: Column, tables: Int, planes: Int, dims: Int): Column =
    toCol(LshTableBuckets(toExpr(v), tables, planes, dims))
}

/** Element-wise mean of float vectors — the centroid-update kernel
  * of k-means (Similarity.kmeansFit). Accumulates in float64 (one
  * double[] + count per group) inside ObjectHashAggregateExec with
  * map-side partial combine: each task collapses its cluster members
  * locally, so the shuffle carries one partial-sum vector per
  * (task, cluster) — at any corpus size the reduce side sees
  * |clusters|·|tasks| rows, never the corpus. Mismatched vector
  * lengths are an error (silent truncation hides data corruption,
  * same contract as CosineSimilarity); NULL inputs are skipped;
  * empty group → NULL.
  */
case class VectorAvg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate[VectorAvg.Buf] {

  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_avg needs array<float>, got $other")
    }

  override def createAggregationBuffer(): VectorAvg.Buf = new VectorAvg.Buf()

  override def update(buf: VectorAvg.Buf, input: InternalRow): VectorAvg.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[ArrayData].toFloatArray())
    buf
  }

  override def merge(buf: VectorAvg.Buf, other: VectorAvg.Buf): VectorAvg.Buf = {
    if (other.sums != null) {
      if (buf.sums == null) { buf.sums = other.sums; buf.n = other.n }
      else {
        require(buf.sums.length == other.sums.length,
          s"vector_avg: vector lengths differ (${buf.sums.length} vs ${other.sums.length})")
        var i = 0
        while (i < buf.sums.length) { buf.sums(i) += other.sums(i); i += 1 }
        buf.n += other.n
      }
    }
    buf
  }

  override def eval(buf: VectorAvg.Buf): Any = {
    if (buf.sums == null) return null
    val out = new Array[Any](buf.sums.length)
    var i = 0
    while (i < buf.sums.length) { out(i) = (buf.sums(i) / buf.n).toFloat; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buf: VectorAvg.Buf): Array[Byte] = {
    if (buf.sums == null) return Array.emptyByteArray
    val out = java.nio.ByteBuffer.allocate(12 + 8 * buf.sums.length)
    out.putLong(buf.n).putInt(buf.sums.length)
    buf.sums.foreach(out.putDouble)
    out.array()
  }

  override def deserialize(bytes: Array[Byte]): VectorAvg.Buf = {
    val buf = new VectorAvg.Buf()
    if (bytes.nonEmpty) {
      val in = java.nio.ByteBuffer.wrap(bytes)
      buf.n = in.getLong()
      buf.sums = Array.fill(in.getInt())(in.getDouble())
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): VectorAvg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): VectorAvg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(child = newChildren(0))
}

object VectorAvg {
  final class Buf {
    var sums: Array[Double] = null
    var n: Long = 0L

    def add(arr: Array[Float]): Unit = {
      if (sums == null) sums = new Array[Double](arr.length)
      require(sums.length == arr.length,
        s"vector_avg: vector lengths differ (${sums.length} vs ${arr.length})")
      var i = 0
      while (i < arr.length) { sums(i) += arr(i); i += 1 }
      n += 1
    }
  }

  def apply(v: Column): Column =
    toCol(VectorAvg(toExpr(v)).toAggregateExpression())
}

object CosineSimilarity {
  /** Shared by interpreted + codegen paths. Mismatched lengths are an
    * error (the oracle's list_cosine_similarity errors too — silent
    * prefix truncation would hide data corruption); zero-norm inputs
    * produce NaN here, mapped to NULL by the expression.
    */
  def compute(x: Array[Float], y: Array[Float]): Double = {
    if (x.length != y.length)
      throw new IllegalArgumentException(
        s"cosine_similarity: vector lengths differ (${x.length} vs ${y.length})")
    val n = x.length
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x(i).toDouble; val yi = y(i).toDouble
      dot += xi * yi; na += xi * xi; nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def apply(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))
}
