package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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
