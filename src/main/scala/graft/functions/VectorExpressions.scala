package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for embedding math over `array<float>`
  * columns (the `embeddings.parquet` shape, FIXTURES.md §B).
  *
  * Why a custom Expression rather than `zip_with`/`aggregate` built-ins:
  * the higher-order-function route allocates a lambda frame per element and
  * boxes each float; at 100 TB × 64-1024 dims that dominates the similarity
  * scan. These expressions read the UnsafeArrayData floats in a tight
  * primitive loop inside whole-stage codegen — the preference-order (b)
  * case from the build contract (compose-built-ins is semantically fine but
  * genuinely slower here).
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_similarity"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / math.sqrt(na * nb)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double dot = 0.0, na = 0.0, nb = 0.0;
        |for (int i = 0; i < n; i++) {
        |  double x = (double) $a.getFloat(i);
        |  double y = (double) $b.getFloat(i);
        |  dot += x * y; na += x * x; nb += y * y;
        |}
        |${ev.value} = (na == 0.0 || nb == 0.0) ? 0.0 : dot / java.lang.Math.sqrt(na * nb);
      """.stripMargin
    )

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Dot product over `array<float>` — same codegen rationale as
  * [[CosineSimilarity]].
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), ArrayType(FloatType, _)) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires two array<float> arguments, got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1 }
    dot
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double dot = 0.0;
        |for (int i = 0; i < n; i++) {
        |  dot += (double) $a.getFloat(i) * (double) $b.getFloat(i);
        |}
        |${ev.value} = dot;
      """.stripMargin
    )

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
