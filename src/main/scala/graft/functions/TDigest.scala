package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** t-digest mergeable quantiles (Dunning & Ertl, "Computing Extremely
  * Accurate Quantiles Using t-Digests") — the second quantile sketch
  * beside [[UddSketch]], pinning the OTHER side of the sketch trade-off
  * (TimescaleDB ships both as `uddsketch` and `tdigest`, Spark's own
  * `approx_percentile` is a third point in the space):
  *
  *   - UDDSketch buckets VALUE space on a fixed log-γ grid: relative
  *     value error ≤ α everywhere, state size grows with the data's
  *     dynamic range, and merge is per-bucket addition —
  *     bit-deterministic regardless of merge order (what lets its gate
  *     pin merged == direct as exact equality).
  *   - t-digest clusters RANK space adaptively (the k1 scale function
  *     `k(q) = δ/2π · asin(2q−1)` caps a cluster at one k-unit, so
  *     clusters shrink toward the tails): rank error is bounded and
  *     tail-concentrated, state is ≤ ~2δ centroids REGARDLESS of value
  *     range, but cluster boundaries depend on merge history — merge is
  *     order-DEPENDENT within the documented bound, never bit-exact.
  *     That asymmetry is structural, not an implementation artifact;
  *     the gate therefore pins exact anchors plus rank-error bounds
  *     (the oracle-fixed-TRUE idiom), not binary equality.
  *
  * Everything here is deterministic GIVEN an input centroid sequence:
  * compression sorts by (mean, weight) and walks once with a pinned
  * weighted-mean update order, so equal buffers compress identically.
  */
object TDigest {

  val DefaultCompression = 100.0

  /** Flush threshold of the unmerged-points buffer: compression cost is
    * amortized O(log buffer) per point at this size, and the buffer adds
    * at most 16 bytes per pending point to a partial's serialized form.
    */
  val BufferSize = 1024

  private val TwoPi = 2.0 * math.Pi

  /** The k1 scale function: k(q) = δ/2π · asin(2q − 1). A cluster may
    * span at most one k-unit, which caps its weight at ~`4n·q(1−q)/δ` —
    * tight clusters at the tails, wide at the median.
    */
  def kScale(q: Double, delta: Double): Double =
    delta / TwoPi * math.asin(math.min(1.0, math.max(-1.0, 2.0 * q - 1.0)))

  def kInverse(k: Double, delta: Double): Double =
    (math.sin(k * TwoPi / delta) + 1.0) / 2.0

  /** Single-pass merge-compression (the MergingDigest algorithm): sort
    * by (mean, weight), then greedily absorb the next centroid while the
    * grown cluster stays inside one k-unit of the scale function.
    * Deterministic for a given input multiset; the weighted-mean update
    * order is pinned (running mean += w·(m − mean)/(W + w)).
    */
  def compress(cents: Array[(Double, Long)], delta: Double): Array[(Double, Long)] = {
    if (cents.length <= 1) return cents
    val sorted = cents.sortBy(c => (c._1, c._2))
    var total = 0L
    sorted.foreach(total += _._2)
    val out = scala.collection.mutable.ArrayBuffer.empty[(Double, Long)]
    var curMean = sorted(0)._1
    var curW = sorted(0)._2
    var wSoFar = 0L
    var qLimit = kInverse(kScale(0.0, delta) + 1.0, delta)
    var i = 1
    while (i < sorted.length) {
      val m = sorted(i)._1
      val w = sorted(i)._2
      val proposedQ = (wSoFar + curW + w).toDouble / total.toDouble
      if (proposedQ <= qLimit) {
        curMean = curMean + w.toDouble * (m - curMean) / (curW + w).toDouble
        curW += w
      } else {
        out += ((curMean, curW))
        wSoFar += curW
        qLimit = kInverse(kScale(wSoFar.toDouble / total.toDouble, delta) + 1.0, delta)
        curMean = m
        curW = w
      }
      i += 1
    }
    out += ((curMean, curW))
    out.toArray
  }

  /** Quantile by midpoint interpolation over the compressed centroids
    * (Dunning's accessor): centroid i "sits" at the midpoint of its
    * weight span; the target rank p·n interpolates linearly between
    * adjacent midpoints, clamped to the extreme means outside them.
    */
  def quantile(cents: Array[(Double, Long)], p: Double): Option[Double] = {
    if (cents.isEmpty) return None
    var total = 0L
    cents.foreach(total += _._2)
    if (total == 0L) return None
    val target = p * total.toDouble
    var wSoFar = 0.0
    var prevMid = 0.0
    var prevMean = cents(0)._1
    var i = 0
    while (i < cents.length) {
      val m = cents(i)._1
      val w = cents(i)._2
      val mid = wSoFar + w.toDouble / 2.0
      if (target < mid) {
        if (i == 0) return Some(m)
        val frac = (target - prevMid) / (mid - prevMid)
        return Some(prevMean + frac * (m - prevMean))
      }
      prevMid = mid
      prevMean = m
      wSoFar += w.toDouble
      i += 1
    }
    Some(cents(cents.length - 1)._1)
  }

  /** Rank (CDF) by the inverse of [[quantile]]'s midpoint interpolation:
    * fraction of mass estimated ≤ x. Between adjacent centroid means the
    * two accessors are exact linear inverses, so
    * `rank(quantile(p)) == p` up to FP whenever `quantile(p)` lands
    * strictly between two distinct means (the generic case); at the
    * extremes the estimate clamps to 0/1 the same way quantile clamps to
    * the extreme means. Timescale ships this as
    * `approx_percentile_rank(tdigest)`.
    */
  def rank(cents: Array[(Double, Long)], x: Double): Option[Double] = {
    if (cents.isEmpty) return None
    var total = 0L
    cents.foreach(total += _._2)
    if (total == 0L) return None
    if (x < cents(0)._1) return Some(0.0)
    if (x > cents(cents.length - 1)._1) return Some(1.0)
    var wSoFar = 0.0
    var prevMid = 0.0
    var prevMean = cents(0)._1
    var i = 0
    while (i < cents.length) {
      val m = cents(i)._1
      val w = cents(i)._2
      val mid = wSoFar + w.toDouble / 2.0
      if (x < m) {
        // x strictly inside (prevMean, m): invert the quantile interpolation
        val frac = (x - prevMean) / (m - prevMean)
        return Some((prevMid + frac * (mid - prevMid)) / total.toDouble)
      }
      prevMid = mid
      prevMean = m
      wSoFar += w.toDouble
      i += 1
    }
    // x equals the maximum mean: the last midpoint is the walk's estimate
    Some(prevMid / total.toDouble)
  }

  private[functions] def serialize(cents: Array[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + cents.length * 16)
    bb.putInt(cents.length)
    cents.foreach { case (m, w) => bb.putDouble(m); bb.putLong(w) }
    bb.array()
  }

  private[functions] def deserialize(bytes: Array[Byte]): Array[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    Array.fill(n)((bb.getDouble, bb.getLong))
  }
}

/** Mutable aggregation buffer: the compressed digest plus an unmerged
  * point buffer, flushed through [[TDigest.compress]] at
  * [[TDigest.BufferSize]].
  */
final class TDigestBuffer(
    var digest: Array[(Double, Long)],
    val pending: scala.collection.mutable.ArrayBuffer[(Double, Long)]
) {
  def maybeFlush(delta: Double): Unit =
    if (pending.size >= TDigest.BufferSize) flush(delta)

  def flush(delta: Double): Unit =
    if (pending.nonEmpty) {
      digest = TDigest.compress(digest ++ pending, delta)
      pending.clear()
    }
}

/** `tdigest_agg(value)` → binary t-digest state (compression δ = 100:
  * ≤ ~2δ centroids, ~3 KB serialized, rank error ~4·q(1−q)/δ).
  */
case class TDigestAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TDigestBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tdigest_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case DoubleType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"tdigest_agg requires double input, got $dt")
  }

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(Array.empty, scala.collection.mutable.ArrayBuffer.empty)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.pending += ((v.asInstanceOf[Double], 1L))
      buf.maybeFlush(TDigest.DefaultCompression)
    }
    buf
  }

  override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
    a.pending ++= b.digest
    a.pending ++= b.pending
    a.maybeFlush(TDigest.DefaultCompression)
    a
  }

  override def eval(buf: TDigestBuffer): Any = {
    buf.flush(TDigest.DefaultCompression)
    TDigest.serialize(buf.digest)
  }

  override def serialize(buf: TDigestBuffer): Array[Byte] = {
    buf.flush(TDigest.DefaultCompression)
    TDigest.serialize(buf.digest)
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    new TDigestBuffer(TDigest.deserialize(bytes), scala.collection.mutable.ArrayBuffer.empty)

  override def withNewMutableAggBufferOffset(o: Int): TDigestAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** `tdigest_merge_agg(sketch)` → binary: rolls finer-level digests up a
  * level (the `rollup(percentile_agg(...))` leg for t-digest) — centroid
  * lists concatenate and re-compress under the same scale bound.
  */
case class TDigestMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[TDigestBuffer] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "tdigest_merge_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"tdigest_merge_agg requires binary input, got $dt")
  }

  override def createAggregationBuffer(): TDigestBuffer =
    new TDigestBuffer(Array.empty, scala.collection.mutable.ArrayBuffer.empty)

  override def update(buf: TDigestBuffer, input: InternalRow): TDigestBuffer = {
    val v = child.eval(input)
    if (v != null) {
      buf.pending ++= TDigest.deserialize(v.asInstanceOf[Array[Byte]])
      buf.maybeFlush(TDigest.DefaultCompression)
    }
    buf
  }

  override def merge(a: TDigestBuffer, b: TDigestBuffer): TDigestBuffer = {
    a.pending ++= b.digest
    a.pending ++= b.pending
    a.maybeFlush(TDigest.DefaultCompression)
    a
  }

  override def eval(buf: TDigestBuffer): Any = {
    buf.flush(TDigest.DefaultCompression)
    TDigest.serialize(buf.digest)
  }

  override def serialize(buf: TDigestBuffer): Array[Byte] = {
    buf.flush(TDigest.DefaultCompression)
    TDigest.serialize(buf.digest)
  }

  override def deserialize(bytes: Array[Byte]): TDigestBuffer =
    new TDigestBuffer(TDigest.deserialize(bytes), scala.collection.mutable.ArrayBuffer.empty)

  override def withNewMutableAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TDigestMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** `tdigest_quantile(sketch, p)` → double: Timescale's
  * `approx_percentile(p)` accessor through the t-digest — one scalar
  * interpolation walk per output row (CodegenFallback, off the hot path
  * like [[UddQuantile]]).
  */
case class TDigestQuantile(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"tdigest_quantile requires (binary, double), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_quantile"

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val p = right.eval(input)
    if (s == null || p == null) null
    else
      TDigest
        .quantile(TDigest.deserialize(s.asInstanceOf[Array[Byte]]), p.asInstanceOf[Double])
        .map(java.lang.Double.valueOf)
        .orNull
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(left = cs(0), right = cs(1))
}

/** `tdigest_rank(sketch, x)` → double: Timescale's
  * `approx_percentile_rank` through the t-digest — the CDF inverse of
  * [[TDigestQuantile]] (see [[TDigest.rank]]). CodegenFallback like the
  * other accessors: one scalar walk per output row, off the hot path.
  */
case class TDigestRank(left: Expression, right: Expression)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(left, right)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, DoubleType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(s"tdigest_rank requires (binary, double), got ($l, $r)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "tdigest_rank"

  override def eval(input: InternalRow): Any = {
    val s = left.eval(input)
    val x = right.eval(input)
    if (s == null || x == null) null
    else
      TDigest
        .rank(TDigest.deserialize(s.asInstanceOf[Array[Byte]]), x.asInstanceOf[Double])
        .map(java.lang.Double.valueOf)
        .orNull
  }

  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(left = cs(0), right = cs(1))
}
