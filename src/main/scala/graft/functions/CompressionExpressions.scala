package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Running-sum reconstruction for delta-encoded long arrays — the decode
  * half of the [[graft.operators.Compress]] columnar codec (the reference's
  * hypertables get this from TimescaleDB's native compression:
  * delta-of-delta timestamps per compressed segment).
  *
  * `prefix_sum(arr, init)` returns an `array<long>` of length `n + 1`:
  * `out(0) = init`, `out(i) = out(i-1) + arr(i-1)`. Applying it twice
  * undoes delta-of-delta (inner call rebuilds the deltas, outer call the
  * absolute values); `slice` trims the length bookkeeping at the call site.
  *
  * Why a custom Expression rather than `aggregate`/`transform` built-ins:
  * a running sum has a loop-carried dependency, and the HOF route
  * (`aggregate` re-building an array per element) is O(n²) in array copies
  * plus a lambda frame per element. This is a tight primitive loop writing
  * one `long[]` inside whole-stage codegen — the same preference-order (b)
  * case as [[CosineSimilarity]]. Null elements are not meaningful in a
  * delta stream, so the expression rejects them at type-check time
  * (`containsNull` arrays fall back to null-safe reads with nulls treated
  * as zero deltas — documented, deterministic, and never produced by the
  * encoder).
  */
case class PrefixSumLongs(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (array<bigint>, bigint), got ${left.dataType} / ${right.dataType}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "prefix_sum"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val init = r.asInstanceOf[Long]
    val n = a.numElements()
    val out = new Array[Long](n + 1)
    out(0) = init
    var i = 0
    while (i < n) {
      val d = if (a.isNullAt(i)) 0L else a.getLong(i)
      out(i + 1) = out(i) + d
      i += 1
    }
    ArrayData.toArrayData(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val out = ctx.freshName("out")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, init) => s"""
        |int $n = $a.numElements();
        |long[] $out = new long[$n + 1];
        |$out[0] = $init;
        |for (int $i = 0; $i < $n; $i++) {
        |  $out[$i + 1] = $out[$i] + ($a.isNullAt($i) ? 0L : $a.getLong($i));
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
      """.stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
