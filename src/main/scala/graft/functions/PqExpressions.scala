package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Product-quantization kernels as native Catalyst expressions.
  *
  * PQ is the 100 TB answer to "the embedding column is the dataset":
  * a D-dim float vector (4·D bytes) becomes M sub-space code indices
  * (M bytes at K ≤ 256) — 16× smaller at D=64/M=16 — and asymmetric
  * distance computation (ADC) scores a (query, code) pair with M
  * table lookups instead of D multiplies. Codebooks and per-query
  * ADC tables are driver-built (they are sample-sized by
  * construction) and ride into the executors as codegen reference
  * objects, so both kernels stay inside whole-stage codegen.
  */
object PqOps {

  /** Per-subspace argmin-L2 code assignment. `codebooks` is
    * [m][k][dsub] flattened; returns the m code indices. Ties break
    * to the lowest code (strict `<`), making encode deterministic.
    */
  def encode(vec: Array[Float], m: Int, k: Int, codebooks: Array[Float]): Array[Int] = {
    val dsub = vec.length / m
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = 0
      var bestD = Double.MaxValue
      var ki = 0
      while (ki < k) {
        val off = (mi * k + ki) * dsub
        var d = 0.0
        var j = 0
        while (j < dsub) {
          val diff = vec(mi * dsub + j) - codebooks(off + j)
          d += diff * diff
          j += 1
        }
        if (d < bestD) { bestD = d; best = ki }
        ki += 1
      }
      codes(mi) = best
      mi += 1
    }
    codes
  }

  /** L2 norm of the reconstruction (the concatenated chosen
    * centroids) — stored beside the codes so ADC cosine needs no
    * access to the original vector.
    */
  def reconNorm(codes: Array[Int], m: Int, k: Int, dsub: Int,
      codebooks: Array[Float]): Double = {
    var s = 0.0
    var mi = 0
    while (mi < m) {
      val off = (mi * k + codes(mi)) * dsub
      var j = 0
      while (j < dsub) { val v = codebooks(off + j); s += v * v; j += 1 }
      mi += 1
    }
    math.sqrt(s)
  }

  /** ADC dot product: Σ_m tables[qi][m][code_m]; `tables` is
    * [q][m][k] flattened. */
  def adcDot(tables: Array[Float], qi: Int, m: Int, k: Int, codes: ArrayData): Double = {
    var s = 0.0
    var mi = 0
    val base = qi * m * k
    while (mi < m) {
      s += tables(base + mi * k + codes.getInt(mi))
      mi += 1
    }
    s
  }
}

/** vec → struct(codes array<int>, recon_norm double). Evaluated once
  * per corpus row at index build; the inner argmin loop dominates.
  */
case class PqEncode(child: Expression, m: Int, k: Int, codebooks: Array[Float])
    extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("codes", ArrayType(IntegerType, containsNull = false), nullable = false),
    StructField("recon_norm", DoubleType, nullable = false)))
  override def prettyName: String = "pq_encode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"pq_encode needs array<float>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData].toFloatArray()
    if (vec.length % m != 0)
      throw new IllegalArgumentException(
        s"pq_encode: ${vec.length} dims not divisible into $m subspaces")
    val codes = PqOps.encode(vec, m, k, codebooks)
    val norm = PqOps.reconNorm(codes, m, k, vec.length / m, codebooks)
    new GenericInternalRow(Array[Any](new GenericArrayData(codes), norm))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("pqCodebooks", codebooks, "float[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""float[] vec = $v.toFloatArray();
         |if (vec.length % $m != 0) {
         |  throw new IllegalArgumentException(
         |    "pq_encode: " + vec.length + " dims not divisible into $m subspaces");
         |}
         |int[] codes = graft.functions.PqOps.encode(vec, $m, $k, $cb);
         |double norm = graft.functions.PqOps.reconNorm(codes, $m, $k, vec.length / $m, $cb);
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[] {
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData(codes),
         |    Double.valueOf(norm) });""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** (query_index, codes) → ADC dot against the driver-built per-query
  * table. The per-pair hot path: M array lookups, fully codegen'd.
  */
case class PqAdcDot(left: Expression, right: Expression,
    m: Int, k: Int, tables: Array[Float]) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (IntegerType, ArrayType(IntegerType, _)) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_dot needs (int query index, array<int> codes), got ($l, $r)")
    }

  override def nullSafeEval(qi: Any, codes: Any): Any =
    PqOps.adcDot(tables, qi.asInstanceOf[Int], m, k, codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("pqTables", tables, "float[]")
    nullSafeCodeGen(ctx, ev, (qi, codes) =>
      s"${ev.value} = graft.functions.PqOps.adcDot($t, $qi, $m, $k, $codes);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
