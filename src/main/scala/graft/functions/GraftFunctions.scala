package graft.functions

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}

/** Registration + Column-API surface for the engine's custom expressions.
  *
  * Two registration paths:
  *   - [[GraftFunctions.register]] on a live session (used by queries/tests)
  *   - [[GraftExtensions]] via `spark.sql.extensions` /
  *     `.withExtensions(new GraftExtensions)` for cluster deployments
  */
object GraftFunctions {

  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "cosine_similarity" -> { es: Seq[Expression] => CosineSimilarity(es(0), es(1)) },
    "dot_product" -> { es: Seq[Expression] => DotProduct(es(0), es(1)) }
  )

  def register(spark: SparkSession): Unit =
    builders.foreach { case (name, b) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, b, "built-in")
    }

  /** Cosine similarity of two `array<float>` columns (codegen'd). The
    * session must have called [[register]] (all graft query entry points do).
    */
  def cosine_similarity(a: Column, b: Column): Column =
    call_function("cosine_similarity", a, b)

  def dot_product(a: Column, b: Column): Column =
    call_function("dot_product", a, b)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction(
      (
        FunctionIdentifier("cosine_similarity"),
        new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_similarity"),
        (es: Seq[Expression]) => CosineSimilarity(es(0), es(1))
      )
    )
    e.injectFunction(
      (
        FunctionIdentifier("dot_product"),
        new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
        (es: Seq[Expression]) => DotProduct(es(0), es(1))
      )
    )
  }
}
