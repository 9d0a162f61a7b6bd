package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: rewrite a pure bounded-interval join into the bucketed
  * equi-join of [[graft.operators.RangeJoin]].
  *
  * An inner join whose ONLY usable predicate is a range —
  *
  * {{{ a JOIN b ON b.us > a.us AND b.us <= a.us + W }}}
  *
  * — has no equi key, so Spark's planner can only pick
  * BroadcastNestedLoopJoin (or a cartesian product): every row pair is
  * compared, O(|a|·|b|) regardless of how selective the interval is. This
  * rule detects that shape on epoch-micros LONG columns and rewrites the
  * logical plan to the bucketed form before planning:
  *
  *   - the lower-bound side explodes to its two candidate epoch buckets
  *     (`floor(us/W)`, `+1` — a fixed 2× fan-out)
  *   - the probe side computes its single bucket
  *   - the join becomes an equi-join on the bucket, with the original
  *     range conjuncts (and any other residual predicates) re-applied as
  *     a Filter above it
  *
  * so the planner picks shuffle-hash / sort-merge and the row-pair work
  * collapses from |a|·|b| to the colliding buckets. The rule fires ONLY
  * when the join has no equi conjunct — exactly the case where Spark has
  * nothing better than a nested loop; joins that already carry an equi
  * key keep their native plan (bucketing would add pointless fan-out).
  *
  * Registered by [[graft.functions.GraftExtensions]]
  * (`spark.sql.extensions`) or per-session via [[RangeJoinRewrite.install]].
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Idempotent per-session opt-in (the `experimental` hook runs user
    * rules in their own batch after the built-in ones).
    */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.contains(RangeJoinRewrite)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RangeJoinRewrite
    }

  private case class Bounds(base: Expression, probe: Expression, window: Long)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // a real equi KEY needs one operand per side — a same-side equality
      // (a.x = a.y) is just a filter and must not suppress the rewrite.
      // EqualNullSafe counts too: ExtractEquiJoinKeys plans <=> as a
      // native equi-join, which this rule must leave alone.
      def crossSide(a: Expression, b: Expression): Boolean =
        (a.references.nonEmpty && b.references.nonEmpty) &&
          ((a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
            (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet)))
      val hasEqui = conjuncts.exists {
        case EqualTo(a, b)       => crossSide(a, b)
        case EqualNullSafe(a, b) => crossSide(a, b)
        case _                   => false
      }
      if (hasEqui) j
      else {
        findBounds(conjuncts, left, right) match {
          case Some(b) => rewrite(j, b, conjuncts)
          case None    => j
        }
      }
  }

  private def isFromOneSide(e: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    e.references.nonEmpty &&
      (e.references.subsetOf(left.outputSet) || e.references.subsetOf(right.outputSet))

  /** Find a (base, probe, window) with `probe > base` and
    * `probe <= base + window` conjuncts on LONG expressions, base and
    * probe each referencing exactly one distinct join side.
    */
  private def findBounds(
      conjuncts: Seq[Expression],
      left: LogicalPlan,
      right: LogicalPlan
  ): Option[Bounds] = {
    def longLit(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType)   => Some(v)
      case Literal(v: Int, IntegerType) => Some(v.toLong)
      case _                            => None
    }
    // normalized (base, probe) pairs asserting probe > base
    val lowers = conjuncts.collect {
      case GreaterThan(p, b)    => (b, p)
      case LessThan(b, p)       => (b, p)
    }
    // normalized (base, probe, w) asserting probe <= base + w
    val uppers = conjuncts.collect {
      case LessThanOrEqual(p, Add(b, w, _)) if longLit(w).isDefined => (b, p, longLit(w).get)
      case LessThanOrEqual(p, Add(w, b, _)) if longLit(w).isDefined => (b, p, longLit(w).get)
      case GreaterThanOrEqual(Add(b, w, _), p) if longLit(w).isDefined => (b, p, longLit(w).get)
      case GreaterThanOrEqual(Add(w, b, _), p) if longLit(w).isDefined => (b, p, longLit(w).get)
    }
    val found = for {
      (lb, lp) <- lowers
      (ub, up, w) <- uppers
      if w > 0 && lb.semanticEquals(ub) && lp.semanticEquals(up)
      if lb.dataType == LongType && lp.dataType == LongType
      // base and probe must come from DIFFERENT single sides
      if isFromOneSide(lb, left, right) && isFromOneSide(lp, left, right)
      if lb.references.subsetOf(left.outputSet) != lp.references.subsetOf(left.outputSet)
    } yield Bounds(lb, lp, w)
    found.headOption
  }

  private def bucketOf(us: Expression, w: Long): Expression =
    // floor(us / w) via double division — exact for |us| < 2^53 µs
    // (~year 2255), matching graft.operators.RangeJoin's bucketing
    Cast(Floor(Divide(Cast(us, DoubleType), Literal(w.toDouble))), LongType)

  private def rewrite(j: Join, b: Bounds, conjuncts: Seq[Expression]): LogicalPlan = {
    val baseOnLeft = b.base.references.subsetOf(j.left.outputSet)
    val (baseChild, probeChild) = if (baseOnLeft) (j.left, j.right) else (j.right, j.left)

    // base side explodes to its two candidate buckets
    val b0 = bucketOf(b.base, b.window)
    val bucketArray = CreateArray(Seq(b0, Add(b0, Literal(1L))))
    val baseBucketAttr = AttributeReference("__graft_bucket", LongType, nullable = b0.nullable)()
    val exploded = Generate(
      Explode(bucketArray),
      unrequiredChildIndex = Nil,
      outer = false,
      qualifier = None,
      generatorOutput = Seq(baseBucketAttr),
      child = baseChild
    )

    // probe side carries its single bucket
    val probeBucket = Alias(bucketOf(b.probe, b.window), "__graft_bucket_p")()
    val projected = Project(probeChild.output :+ probeBucket, probeChild)

    val bucketEq = EqualTo(baseBucketAttr, probeBucket.toAttribute)
    val newJoin =
      if (baseOnLeft) Join(exploded, projected, Inner, Some(bucketEq), j.hint)
      else Join(projected, exploded, Inner, Some(bucketEq), j.hint)

    // every original conjunct (both range bounds + any residuals) is
    // re-applied above the equi-join; output shape is restored exactly
    val residual = conjuncts.reduce(And)
    Project(j.output, Filter(residual, newJoin))
  }
}
