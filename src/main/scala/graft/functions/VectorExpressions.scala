package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
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

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh locals: two instances of this expression can share one
    // generated function (e.g. an aggregate result projection computing
    // several similarities) — fixed names would collide and Janino's
    // "Redefinition of local variable" pushes the WHOLE projection to
    // interpreter mode
    val n = ctx.freshName("n"); val i = ctx.freshName("i")
    val dot = ctx.freshName("dot"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
    val x = ctx.freshName("x"); val y = ctx.freshName("y")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0, $na = 0.0, $nb = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  double $x = (double) $a.getFloat($i);
        |  double $y = (double) $b.getFloat($i);
        |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
        |}
        |${ev.value} = ($na == 0.0 || $nb == 0.0) ? 0.0 : $dot / java.lang.Math.sqrt($na * $nb);
      """.stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Sign-random-projection LSH bucket id over `numPlanes` pseudo-random
  * hyperplanes (Charikar SRP-LSH): bit p = sign(v · r_p), where component i
  * of plane p is a deterministic ±weight derived from
  * `xxhash64(seed, p, i) % 1000 / 1000.0` — bit-identical to the column
  * composition `aggregate(zip_with(vec, sequence(...), ...))` this replaces
  * (same xxhash64 chain: 42L → hashInt(seed) → hashInt(p) → hashInt(i);
  * same sequential double accumulation), but a tight primitive loop inside
  * whole-stage codegen instead of a lambda frame + boxed float per element
  * per plane. The bucketing stage runs over the whole corpus, so this is
  * the ANN scan cost at 100 TB.
  */
case class SrpBucket(child: Expression, numPlanes: Int, seed: Int)
    extends UnaryExpression {

  // 64 fills the whole long; the value is a bit SIGNATURE (joined on
  // equality, sliced with unsigned shifts), so the sign bit carries no
  // arithmetic meaning anywhere downstream
  require(numPlanes >= 1 && numPlanes <= 64, "numPlanes must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $dt")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_bucket"

  // per-plane hash seed: xxhash64's fold of (seed, plane) with the builtin
  // initial seed 42L; the per-dim component then folds the dim index in
  @transient private lazy val planeSeeds: Array[Long] = {
    val h0 = XXH64.hashInt(seed, 42L)
    Array.tabulate(numPlanes)(p => XXH64.hashInt(p, h0))
  }

  // the plane matrix depends only on (seed, plane, dim index), never the
  // data — materialized once per dim instead of re-hashed per row
  @transient private lazy val weights: SrpPlaneWeights = new SrpPlaneWeights(planeSeeds)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val w = weights.forDim(n)
    var bucket = 0L
    var p = 0
    while (p < numPlanes) {
      val wp = w(p)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getFloat(i).toDouble * wp(i)
        i += 1
      }
      if (dot > 0.0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wref = ctx.addReferenceObj("srpWeights", weights, classOf[SrpPlaneWeights].getName)
    // fresh locals — see CosineSimilarity.doGenCode
    val n = ctx.freshName("n"); val bucket = ctx.freshName("bucket")
    val p = ctx.freshName("p"); val w = ctx.freshName("w"); val wp = ctx.freshName("wp")
    val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    nullSafeCodeGen(
      ctx,
      ev,
      v => s"""
        |int $n = $v.numElements();
        |double[][] $w = $wref.forDim($n);
        |long $bucket = 0L;
        |for (int $p = 0; $p < $numPlanes; $p++) {
        |  double[] $wp = $w[$p];
        |  double $dot = 0.0;
        |  for (int $i = 0; $i < $n; $i++) {
        |    $dot += (double) $v.getFloat($i) * $wp[$i];
        |  }
        |  if ($dot > 0.0) $bucket |= (1L << $p);
        |}
        |${ev.value} = $bucket;
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Materialized SRP plane matrix for [[SrpBucket]]: component (p, i) is
  * `(xxhash64(planeSeed_p, i) % 1000) / 1000.0` — exactly the value the
  * previous per-row form hashed inline, hoisted because it depends only on
  * (seed, plane, dim), never the vector. At 150k rows × 32 bands × 16
  * planes × 64 dims the inline form was ~5·10⁹ XXH64 calls per signature
  * pass; this is one 256 KB matrix per expression instance.
  *
  * Single-entry dim cache: corpora have one dim, so a map is overkill; a
  * ragged corpus just recomputes on dim change (correct, slower). The
  * benign race on the volatile is settled by both threads writing
  * identical matrices.
  */
final class SrpPlaneWeights(planeSeeds: Array[Long]) extends Serializable {
  @transient @volatile private var cached: (Int, Array[Array[Double]]) = null
  def forDim(n: Int): Array[Array[Double]] = {
    val c = cached
    if (c != null && c._1 == n) return c._2
    val w = Array.tabulate(planeSeeds.length, n)((p, i) =>
      (XXH64.hashInt(i, planeSeeds(p)) % 1000L).toDouble / 1000.0)
    cached = (n, w)
    w
  }
}

/** All `bands` SRP band signatures of a vector in ONE pass — the banded
  * near-dup generator's projection stage ([[graft.ext.Dedup]] SRP banding).
  * Band `b`'s value is bit-identical to
  * `srp_bucket(vec, bitsPerBand, seed + 1 + b)` (same per-band xxhash64
  * seed chain, same weight derivation, same sequential double
  * accumulation per plane), so swapping the per-band column composition
  * for this expression cannot move a single candidate pair.
  *
  * Why one expression instead of `array(srp_bucket × bands)`: each
  * SrpBucket call re-reads the UnsafeArrayData vector and carries its own
  * reference object + codegen block — at the wide-band geometries
  * (64×20-bit = 1 280 planes) that is 64 generated loops per row and was
  * measured at ~11 s per signature pass over a 60k×64-dim corpus (the
  * r14 30× `embedding_lsh` wall anomaly). This form hoists one flattened
  * (bands·bitsPerBand)-row plane matrix and runs a single tight loop
  * emitting the whole `array<long>` signature row.
  */
case class SrpBands(child: Expression, bands: Int, bitsPerBand: Int, seed: Int)
    extends UnaryExpression {

  require(bands >= 1, "bands must be >= 1")
  require(bitsPerBand >= 1 && bitsPerBand <= 64, "bitsPerBand must be in [1, 64]")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<float>, got $dt")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_bands"

  // flattened (band, plane) seed layout: row b*bitsPerBand+p carries the
  // seed SrpBucket(vec, bitsPerBand, seed+1+b) would derive for plane p —
  // the bit-identity contract above
  @transient private lazy val planeSeeds: Array[Long] = {
    val out = new Array[Long](bands * bitsPerBand)
    var b = 0
    while (b < bands) {
      val h0 = XXH64.hashInt(seed + 1 + b, 42L)
      var p = 0
      while (p < bitsPerBand) {
        out(b * bitsPerBand + p) = XXH64.hashInt(p, h0)
        p += 1
      }
      b += 1
    }
    out
  }

  @transient private lazy val weights: SrpPlaneWeights = new SrpPlaneWeights(planeSeeds)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val n = v.numElements()
    val w = weights.forDim(n)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var p = 0
      while (p < bitsPerBand) {
        val wp = w(b * bitsPerBand + p)
        var dot = 0.0
        var i = 0
        while (i < n) {
          dot += v.getFloat(i).toDouble * wp(i)
          i += 1
        }
        if (dot > 0.0) sig |= (1L << p)
        p += 1
      }
      out(b) = sig
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(out)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val wref = ctx.addReferenceObj("srpBandWeights", weights, classOf[SrpPlaneWeights].getName)
    // fresh locals — see CosineSimilarity.doGenCode
    val n = ctx.freshName("n"); val w = ctx.freshName("w"); val out = ctx.freshName("out")
    val b = ctx.freshName("b"); val sig = ctx.freshName("sig"); val p = ctx.freshName("p")
    val wp = ctx.freshName("wp"); val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    nullSafeCodeGen(
      ctx,
      ev,
      v => s"""
        |int $n = $v.numElements();
        |double[][] $w = $wref.forDim($n);
        |long[] $out = new long[$bands];
        |for (int $b = 0; $b < $bands; $b++) {
        |  long $sig = 0L;
        |  for (int $p = 0; $p < $bitsPerBand; $p++) {
        |    double[] $wp = $w[$b * $bitsPerBand + $p];
        |    double $dot = 0.0;
        |    for (int $i = 0; $i < $n; $i++) {
        |      $dot += (double) $v.getFloat($i) * $wp[$i];
        |    }
        |    if ($dot > 0.0) $sig |= (1L << $p);
        |  }
        |  $out[$b] = $sig;
        |}
        |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
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

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // fresh locals — see CosineSimilarity.doGenCode
    val n = ctx.freshName("n"); val dot = ctx.freshName("dot"); val i = ctx.freshName("i")
    nullSafeCodeGen(
      ctx,
      ev,
      (a, b) => s"""
        |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        |double $dot = 0.0;
        |for (int $i = 0; $i < $n; $i++) {
        |  $dot += (double) $a.getFloat($i) * (double) $b.getFloat($i);
        |}
        |${ev.value} = $dot;
      """.stripMargin
    )
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
