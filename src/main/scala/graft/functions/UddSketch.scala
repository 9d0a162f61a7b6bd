package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** UDDSketch mergeable quantiles (Epicoco et al., "UDDSketch: Accurate
  * Tracking of Quantiles in Data Streams", 2020) — the sketch behind
  * TimescaleDB's `percentile_agg`/`approx_percentile`, built here as the
  * percentile twin of the HLL distinct rollup: log-γ-bucketed counts whose
  * MERGE is plain per-bucket addition, so hourly sketches roll up to daily
  * without touching raw data, and — because no collapse pass is
  * implemented (the map stays sparse; metric streams with bounded dynamic
  * range never need one, see [[UddSketchAgg]] docs) — the merged state is
  * bit-identical REGARDLESS of merge order or grouping. That determinism
  * is what lets the rollup gate pin `merged == direct` as exact equality.
  *
  * Guarantee: every estimate is the γ-bucket midpoint of a value at the
  * requested rank, so relative value error ≤ α = (γ−1)/(γ+1) (~1% at the
  * default γ = 1.02) for positive values; zero and negatives are tracked
  * sign-mirrored with the same bound on |v|.
  */
object UddSketch {

  val DefaultGamma = 1.02

  /** Sign-interleaved log-γ bucket key of a finite NON-ZERO value:
    * `i = ⌈ln|v|/ln γ⌉` (γ^(i−1) < |v| ≤ γ^i; i is negative for |v| < 1,
    * which is why the SIGN cannot ride on the index itself), then
    * `2i` for positive v and `2i + 1` for negative v. Exact zeros are
    * counted separately by the caller. |i| ≤ ~35k over the full double
    * range at γ = 1.02.
    */
  def bucketOf(v: Double, gamma: Double): Int = {
    require(v != 0.0, "zero is tracked outside the bucket map")
    val i = math.ceil(math.log(math.abs(v)) / math.log(gamma)).toInt
    if (v > 0) i * 2 else i * 2 + 1
  }

  /** Midpoint estimate of a [[bucketOf]] key: ±(γ^i + γ^(i−1))/2. */
  def valueOf(bucket: Int, gamma: Double): Double = {
    val neg = (bucket & 1) != 0
    val i = (if (neg) bucket - 1 else bucket) >> 1
    val mid = (math.pow(gamma, i) + math.pow(gamma, i - 1)) / 2.0
    if (neg) -mid else mid
  }

  /** Quantile walk in VALUE order — negatives from most-negative up
    * (larger |v| index first), then zero, then positives ascending —
    * accumulating counts to rank ⌈p·n⌉.
    */
  def quantile(zero: Long, buckets: Map[Int, Long], p: Double, gamma: Double): Option[Double] = {
    val n = zero + buckets.valuesIterator.sum
    if (n == 0L) return None
    val target = math.max(1L, math.ceil(p * n).toLong)
    var cum = 0L
    // negative keys (odd), most negative value first = LARGEST index first
    val negs = buckets.keysIterator.filter(k => (k & 1) != 0).toArray.sortBy(k => -((k - 1) >> 1))
    for (b <- negs) {
      cum += buckets(b)
      if (cum >= target) return Some(valueOf(b, gamma))
    }
    cum += zero
    if (zero > 0 && cum >= target) return Some(0.0)
    val poss = buckets.keysIterator.filter(k => (k & 1) == 0).toArray.sortBy(k => k >> 1)
    for (b <- poss) {
      cum += buckets(b)
      if (cum >= target) return Some(valueOf(b, gamma))
    }
    Some(
      if (poss.nonEmpty) valueOf(poss.last, gamma)
      else if (zero > 0) 0.0
      else valueOf(negs.last, gamma))
  }

  /** Rank walk — the inverse accessor (Timescale
    * `approx_percentile_rank`): the approximate fraction of sketched
    * values ≤ x, counting every bucket at-or-before x's bucket in VALUE
    * order (same order as [[quantile]]'s walk). All of x's own bucket is
    * included, so the estimate is ≥ the true rank by at most that
    * bucket's mass — one γ-window of values (~1% of the value's
    * magnitude at γ = 1.02), the sketch's native resolution. Satisfies
    * the round-trip `rank(quantile(p)) ≥ p` by construction (the
    * quantile midpoint lands in the bucket the walk stopped at).
    */
  def rank(zero: Long, buckets: Map[Int, Long], x: Double, gamma: Double): Option[Double] = {
    val n = zero + buckets.valuesIterator.sum
    if (n == 0L) return None
    var cum = 0L
    if (x >= 0) {
      buckets.foreach { case (k, c) => if ((k & 1) != 0) cum += c }
      cum += zero
      if (x > 0) {
        val xi = bucketOf(x, gamma) >> 1
        buckets.foreach { case (k, c) => if ((k & 1) == 0 && (k >> 1) <= xi) cum += c }
      }
    } else {
      // negative v ≤ x < 0 ⇔ |v| ≥ |x| ⇔ bucket index ≥ x's index
      val xi = (bucketOf(x, gamma) - 1) >> 1
      buckets.foreach { case (k, c) => if ((k & 1) != 0 && ((k - 1) >> 1) >= xi) cum += c }
    }
    Some(cum.toDouble / n)
  }

  private[functions] def serialize(zero: Long, m: java.util.HashMap[Integer, Array[Long]]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 4 + m.size * 12)
    bb.putLong(zero)
    bb.putInt(m.size)
    // sorted ascending so equal sketch CONTENT serializes to equal BYTES —
    // the merge-associativity gate compares binaries via the quantile
    // accessor, but byte-stable form keeps checkpointed states canonical
    val keys = new Array[Int](m.size)
    val it = m.keySet().iterator()
    var i = 0
    while (it.hasNext) { keys(i) = it.next(); i += 1 }
    java.util.Arrays.sort(keys)
    keys.foreach { k => bb.putInt(k); bb.putLong(m.get(k)(0)) }
    bb.array()
  }

  private[functions] def deserialize(bytes: Array[Byte]): (Long, java.util.HashMap[Integer, Array[Long]]) = {
    val bb = ByteBuffer.wrap(bytes)
    val zero = bb.getLong
    val n = bb.getInt
    val m = new java.util.HashMap[Integer, Array[Long]](n * 2)
    var i = 0
    while (i < n) { m.put(bb.getInt, Array(bb.getLong)); i += 1 }
    (zero, m)
  }
}

/** `udd_sketch_agg(value)` → binary sketch state. No collapse pass: the
  * sparse bucket map holds one entry per OBSERVED γ-bucket, which for a
  * metric column with dynamic range `[lo, hi]` is ≤ log_γ(hi/lo) entries
  * (~560 for a 0.004–600 range at γ = 1.02) — fixed-size partials in the
  * shuffle for any realistic metric, and exact merge-order independence
  * in exchange for not supporting adversarial (full-double-range)
  * streams in one sketch.
  */
case class UddSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[(Array[Long], java.util.HashMap[Integer, Array[Long]])] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "udd_sketch_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"udd_sketch_agg requires double input, got $dt")
  }

  override def createAggregationBuffer(): (Array[Long], java.util.HashMap[Integer, Array[Long]]) =
    (Array(0L), new java.util.HashMap[Integer, Array[Long]]())

  override def update(
      buf: (Array[Long], java.util.HashMap[Integer, Array[Long]]),
      input: InternalRow
  ): (Array[Long], java.util.HashMap[Integer, Array[Long]]) = {
    val v = child.eval(input)
    if (v != null) {
      val d = v.asInstanceOf[Double]
      if (d == 0.0) buf._1(0) += 1L
      else {
        val b = UddSketch.bucketOf(d, UddSketch.DefaultGamma)
        val cur = buf._2.get(b)
        if (cur != null) cur(0) += 1L else buf._2.put(b, Array(1L))
      }
    }
    buf
  }

  override def merge(
      a: (Array[Long], java.util.HashMap[Integer, Array[Long]]),
      b: (Array[Long], java.util.HashMap[Integer, Array[Long]])
  ): (Array[Long], java.util.HashMap[Integer, Array[Long]]) = {
    a._1(0) += b._1(0)
    val it = b._2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a._2.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0) else a._2.put(e.getKey, Array(e.getValue()(0)))
    }
    a
  }

  override def eval(buf: (Array[Long], java.util.HashMap[Integer, Array[Long]])): Any =
    UddSketch.serialize(buf._1(0), buf._2)

  override def serialize(buf: (Array[Long], java.util.HashMap[Integer, Array[Long]])): Array[Byte] =
    UddSketch.serialize(buf._1(0), buf._2)

  override def deserialize(bytes: Array[Byte]): (Array[Long], java.util.HashMap[Integer, Array[Long]]) = {
    val (zero, m) = UddSketch.deserialize(bytes)
    (Array(zero), m)
  }

  override def withNewMutableAggBufferOffset(o: Int): UddSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UddSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** `udd_merge_agg(sketch)` → binary: rolls finer-level sketch states up a
  * level by per-bucket addition — the `rollup(percentile_agg(...))` leg.
  */
case class UddMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[(Array[Long], java.util.HashMap[Integer, Array[Long]])] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "udd_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"udd_merge_agg requires binary input, got $dt")
  }

  override def createAggregationBuffer(): (Array[Long], java.util.HashMap[Integer, Array[Long]]) =
    (Array(0L), new java.util.HashMap[Integer, Array[Long]]())

  override def update(
      buf: (Array[Long], java.util.HashMap[Integer, Array[Long]]),
      input: InternalRow
  ): (Array[Long], java.util.HashMap[Integer, Array[Long]]) = {
    val v = child.eval(input)
    if (v != null) {
      val (zero, m) = UddSketch.deserialize(v.asInstanceOf[Array[Byte]])
      buf._1(0) += zero
      val it = m.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val cur = buf._2.get(e.getKey)
        if (cur != null) cur(0) += e.getValue()(0) else buf._2.put(e.getKey, e.getValue())
      }
    }
    buf
  }

  override def merge(
      a: (Array[Long], java.util.HashMap[Integer, Array[Long]]),
      b: (Array[Long], java.util.HashMap[Integer, Array[Long]])
  ): (Array[Long], java.util.HashMap[Integer, Array[Long]]) = {
    a._1(0) += b._1(0)
    val it = b._2.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val cur = a._2.get(e.getKey)
      if (cur != null) cur(0) += e.getValue()(0) else a._2.put(e.getKey, Array(e.getValue()(0)))
    }
    a
  }

  override def eval(buf: (Array[Long], java.util.HashMap[Integer, Array[Long]])): Any =
    UddSketch.serialize(buf._1(0), buf._2)

  override def serialize(buf: (Array[Long], java.util.HashMap[Integer, Array[Long]])): Array[Byte] =
    UddSketch.serialize(buf._1(0), buf._2)

  override def deserialize(bytes: Array[Byte]): (Array[Long], java.util.HashMap[Integer, Array[Long]]) = {
    val (zero, m) = UddSketch.deserialize(bytes)
    (Array(zero), m)
  }

  override def withNewMutableAggBufferOffset(o: Int): UddMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): UddMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** `udd_quantile(sketch, p)` → double: Timescale's `approx_percentile(p)`
  * accessor. Scalar walk over the deserialized sketch — off the hot path
  * by construction (one call per OUTPUT row of a rollup), so
  * CodegenFallback is the right cost point.
  */
case class UddQuantile(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"udd_quantile requires (binary, double), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "udd_quantile"

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val p = right.eval(input)
    if (s == null || p == null) null
    else {
      val (zero, m) = UddSketch.deserialize(s.asInstanceOf[Array[Byte]])
      val sm = {
        val b = Map.newBuilder[Int, Long]
        val it = m.entrySet().iterator()
        while (it.hasNext) { val e = it.next(); b += (e.getKey.intValue() -> e.getValue()(0)) }
        b.result()
      }
      UddSketch.quantile(zero, sm, p.asInstanceOf[Double], UddSketch.DefaultGamma)
        .map(java.lang.Double.valueOf).orNull
    }
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(left = cs(0), right = cs(1))
}

/** `udd_rank(sketch, x)` → double: Timescale's `approx_percentile_rank`
  * accessor — the approximate fraction of sketched values ≤ x (the
  * inverse of [[UddQuantile]]). Same off-hot-path CodegenFallback cost
  * point: one scalar walk per output row.
  */
case class UddRank(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"udd_rank requires (binary, double), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "udd_rank"

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val x = right.eval(input)
    if (s == null || x == null) null
    else {
      val (zero, m) = UddSketch.deserialize(s.asInstanceOf[Array[Byte]])
      val sm = {
        val b = Map.newBuilder[Int, Long]
        val it = m.entrySet().iterator()
        while (it.hasNext) { val e = it.next(); b += (e.getKey.intValue() -> e.getValue()(0)) }
        b.result()
      }
      UddSketch.rank(zero, sm, x.asInstanceOf[Double], UddSketch.DefaultGamma)
        .map(java.lang.Double.valueOf).orNull
    }
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(left = cs(0), right = cs(1))
}
