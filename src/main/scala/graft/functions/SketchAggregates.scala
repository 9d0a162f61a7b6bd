package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch aggregates as single TypedImperativeAggregates.
  *
  * The composed form (64 separate `min(xxhash64(lit(i), s))` /
  * `sum(when(bit))` aggregate columns) is semantically fine but generates
  * enormous Janino classes — the first execution of each such plan spent
  * 10-15 s compiling and JIT-warming generated code, and the wide
  * aggregation buffer bloats partial rows. One imperative aggregate with a
  * primitive array buffer keeps the plan narrow, the buffer off-row, and
  * the per-row work in tight JVM loops. Partial aggregation (map-side
  * combine) still applies — merge() is elementwise min / sum.
  */

/** MinHash signature: per group, slot i = min over input strings of
  * xxhash64(input, seed=i). Input: one shingle string per row (exploded).
  * Output: array<long> of length `numHashes`.
  */
case class MinHashAgg(
    child: Expression,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"minhash_agg requires string input, got $dt")
  }

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numHashes)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      var i = 0
      while (i < numHashes) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), i.toLong)
        if (h < buf(i)) buf(i) = h
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any =
    new GenericArrayData(buf.map(x => x: Any))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * numHashes)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numHashes)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(o: Int): MinHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): MinHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** SimHash (Charikar): per group, bit b of the output = sign of the sum
  * over inputs of ±1 by bit b of xxhash64(input, seed=42 — the builtin's
  * seed). Input: one shingle string per row. Output: the 64-bit sketch.
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash_agg requires string input, got $dt")
  }

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String]
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) buf(b) += 1 else buf(b) -= 1
        b += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < 64) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var b = 0
    while (b < 64) { if (buf(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 * 64)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt)
  }

  override def withNewMutableAggBufferOffset(o: Int): SimHashAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SimHashAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}

/** MinHash signature of a shingle ARRAY as one scalar map pass — no
  * explode, no aggregate buffers, no groupBy shuffle (the r17 profile
  * measured the explode + [[MinHashAgg]] layout at ~7 µs of row
  * machinery per (doc, shingle) posting against < 1 µs of hashing).
  *
  * Hash family: ONE strong pass over the shingle bytes
  * (xxhash64(bytes, seed = 0)), then slot i = xxhash64_long(base, i) —
  * the standard "one strong hash + k derived mixes" MinHash
  * construction (Broder's min-wise family in practice; each derived
  * slot is an independent-behaving permutation of the base hash). The
  * aggregate form re-hashed the full shingle STRING per slot — 64
  * string passes per posting — which was the remaining wall once the
  * row machinery was gone; the derived mixes hash 8 bytes instead.
  * Slot VALUES therefore differ from [[MinHashAgg]]'s, which only
  * moves banding collisions: every consumer verifies candidates with
  * the exact shingle Jaccard, so outputs are identical whenever recall
  * is (gate corpora pin true pairs at one-token-edit similarity, where
  * a 16-band miss has probability ~1e-12 under ANY sane family).
  *
  * Equivalence note: the aggregate form silently DROPPED ids whose
  * shingle array was empty (explode emits no rows); callers that need
  * that contract filter `size(shingles) > 0` — [[graft.ext.Dedup
  * .minhashSignatures]] does.
  */
case class MinHashShingles(child: Expression, numHashes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(numHashes >= 1, "need numHashes >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt =>
      TypeCheckResult.TypeCheckFailure(s"minhash_shingles requires array<string>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_shingles"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.minhashShingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], numHashes)

  // stay inside whole-stage codegen: one static kernel call per row,
  // primitive long-array result — no interpreted eval, no boxed slots
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhashShingles($c, $numHashes)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** SimHash of a shingle ARRAY as one scalar map pass — bit-identical to
  * [[SimHashAgg]] over the exploded array (same element hash, seed 42;
  * same ±1 bit counting; same `count > 0` sign rule), for the same
  * reason as [[MinHashShingles]]: the aggregate form's cost was row
  * machinery, not hashing. Same empty-array note.
  */
case class SimHashShingles(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt =>
      TypeCheckResult.TypeCheckFailure(s"simhash_shingles requires array<string>, got $dt")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_shingles"

  override def nullSafeEval(input: Any): Any =
    SketchKernels.simhashShingles(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  // see MinHashShingles.doGenCode — primitive long result, fully unboxed
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
    : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhashShingles($c)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernels behind [[MinHashShingles]] and [[SimHashShingles]]:
  * public because whole-stage-codegen'd plans call them directly. The
  * minhash kernel returns [[org.apache.spark.sql.catalyst.expressions
  * .UnsafeArrayData]] over a primitive long array — no slot boxing.
  */
object SketchKernels {

  def minhashShingles(
      arr: org.apache.spark.sql.catalyst.util.ArrayData,
      numHashes: Int): org.apache.spark.sql.catalyst.expressions.UnsafeArrayData = {
    val buf = Array.fill(numHashes)(Long.MaxValue)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val base = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 0L)
        var i = 0
        while (i < numHashes) {
          val h = XXH64.hashLong(base, i.toLong)
          if (h < buf(i)) buf(i) = h
          i += 1
        }
      }
      j += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(buf)
  }

  def simhashShingles(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val counts = new Array[Int](64)
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        val s = arr.getUTF8String(j)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) out |= (1L << b); b += 1 }
    out
  }
}

/** Space-saving heavy hitters (Metwally, Agrawal & El Abbadi, ICDT 2005) —
  * the Timescale `freq_agg`/`topn_agg` family: a fixed-`k` counter summary
  * with the classic guarantees — estimates never undercount
  * (`est ≥ true`), the possible overcount is tracked per item
  * (`true ≥ est − err`), and any item with true frequency > n/k is
  * guaranteed present. Merge (map-side combine) follows Mergeable
  * Summaries (Agarwal et al., PODS 2012): shared items add
  * component-wise; an item absent from one side adds that side's minimum
  * estimate to both est and err (its occurrences there are at most that
  * minimum — zero while the side is under capacity); the union trims back
  * to the `k` largest.
  *
  * When `k` ≥ the stream's distinct count no eviction ever fires and the
  * summary degenerates to EXACT counting with err = 0 — what lets
  * `x_vocab_ss` carry a full DuckDB oracle; the eviction/merge bounds are
  * spec-checked on skewed streams where k < distinct (ExtSpec). Estimates
  * under eviction are merge-order dependent (like every mergeable
  * sketch); the bounds are not.
  *
  * Output: `array<struct<item,est,err>>` sorted est desc then item asc.
  */
case class SpaceSavingAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0
) extends TypedImperativeAggregate[java.util.HashMap[String, Array[Long]]] {
  require(k >= 1, "space_saving_agg requires k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("item", StringType, nullable = false),
      StructField("est", LongType, nullable = false),
      StructField("err", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "space_saving_agg"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"space_saving_agg requires string input, got $dt")
  }

  override def createAggregationBuffer(): java.util.HashMap[String, Array[Long]] =
    new java.util.HashMap[String, Array[Long]](k * 2)

  /** Smallest estimate in a full summary (lexicographically-smallest key
    * on ties, so eviction is deterministic given identical map content).
    */
  private def minEntry(m: java.util.HashMap[String, Array[Long]]): (String, Long) = {
    var mk: String = null
    var mv = Long.MaxValue
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val est = e.getValue()(0)
      if (est < mv || (est == mv && (mk == null || e.getKey < mk))) { mv = est; mk = e.getKey }
    }
    (mk, mv)
  }

  override def update(
      m: java.util.HashMap[String, Array[Long]],
      input: InternalRow
  ): java.util.HashMap[String, Array[Long]] = {
    val v = child.eval(input)
    if (v != null) {
      val s = v.asInstanceOf[UTF8String].toString
      val cur = m.get(s)
      if (cur != null) cur(0) += 1L
      else if (m.size < k) m.put(s, Array(1L, 0L))
      else {
        val (mk, mv) = minEntry(m)
        m.remove(mk)
        m.put(s, Array(mv + 1L, mv))
      }
    }
    m
  }

  override def merge(
      a: java.util.HashMap[String, Array[Long]],
      b: java.util.HashMap[String, Array[Long]]
  ): java.util.HashMap[String, Array[Long]] = {
    if (b.isEmpty) return a
    val minA = if (a.size < k) 0L else minEntry(a)._2
    val minB = if (b.size < k) 0L else minEntry(b)._2
    // items only in a could have appeared up to minB times in b's stream
    val aIt = a.entrySet().iterator()
    while (aIt.hasNext) {
      val e = aIt.next()
      val bv = b.get(e.getKey)
      if (bv == null) { e.getValue()(0) += minB; e.getValue()(1) += minB }
    }
    // shared items add component-wise; b-only items enter with a's floor
    val bIt = b.entrySet().iterator()
    while (bIt.hasNext) {
      val e = bIt.next()
      val av = a.get(e.getKey)
      if (av != null) { av(0) += e.getValue()(0); av(1) += e.getValue()(1) }
      else a.put(e.getKey, Array(e.getValue()(0) + minA, e.getValue()(1) + minA))
    }
    if (a.size > k) {
      val kept = sortedEntries(a).take(k)
      a.clear()
      kept.foreach { case (item, est, err) => a.put(item, Array(est, err)) }
    }
    a
  }

  private def sortedEntries(
      m: java.util.HashMap[String, Array[Long]]
  ): Array[(String, Long, Long)] = {
    val arr = new Array[(String, Long, Long)](m.size)
    var i = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      arr(i) = (e.getKey, e.getValue()(0), e.getValue()(1))
      i += 1
    }
    arr.sortBy { case (item, est, _) => (-est, item) }
  }

  override def eval(m: java.util.HashMap[String, Array[Long]]): Any =
    new GenericArrayData(sortedEntries(m).map { case (item, est, err) =>
      org.apache.spark.sql.catalyst.InternalRow(UTF8String.fromString(item),
        java.lang.Long.valueOf(est), java.lang.Long.valueOf(err))
    }.toArray[Any])

  override def serialize(m: java.util.HashMap[String, Array[Long]]): Array[Byte] = {
    var bytes = 4
    val items = sortedEntries(m)
    items.foreach { case (item, _, _) => bytes += 4 + item.getBytes("UTF-8").length + 16 }
    val bb = ByteBuffer.allocate(bytes)
    bb.putInt(items.length)
    items.foreach { case (item, est, err) =>
      val ib = item.getBytes("UTF-8")
      bb.putInt(ib.length)
      bb.put(ib)
      bb.putLong(est)
      bb.putLong(err)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Array[Long]] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = new java.util.HashMap[String, Array[Long]](k * 2)
    var i = 0
    while (i < n) {
      val len = bb.getInt
      val ib = new Array[Byte](len)
      bb.get(ib)
      m.put(new String(ib, "UTF-8"), Array(bb.getLong, bb.getLong))
      i += 1
    }
    m
  }

  override def withNewMutableAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(cs: IndexedSeq[Expression]): Expression =
    copy(child = cs.head)
}
