package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared whitespace tokenizer for the word-level expressions: splits on
  * runs of Java-regex `\s` characters — the EXACT class `split(trim(text),
  * "\\s+")` and the DuckDB oracle's RE2 `\s` use (ASCII space, \t, \n,
  * \x0B, \f, \r). Deliberately NOT `Character.isWhitespace`, which also
  * splits on Unicode spaces (U+2000-200A, U+3000, …) and would silently
  * diverge from the regex-split metrics and the SQL oracles on non-ASCII
  * whitespace.
  */
private[functions] object WordSplit {
  @inline private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  def split(text: String): java.util.ArrayList[String] = {
    val words = new java.util.ArrayList[String]()
    var i = 0
    val len = text.length
    while (i < len) {
      while (i < len && isWs(text.charAt(i))) i += 1
      if (i < len) {
        val start = i
        while (i < len && !isWs(text.charAt(i))) i += 1
        words.add(text.substring(start, i))
      }
    }
    words
  }
}

/** One-pass distinct word n-gram shingling over a text column.
  *
  * Semantically identical to the built-in composition
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i+1, n))))` (Dedup.wordShingles), but a
  * single pass over the string instead of one interpreted lambda frame +
  * array slice copy per position — the shingle stage feeds every text-dedup
  * operator, so at corpus scale this constant factor is the scan cost.
  * Deliberately CodegenFallback — the measured-faster shape for this
  * expression's consumers, all of which EXPLODE the array (ngram postings,
  * decontam shingle probes, chunk fingerprints). Inlining the kernel call
  * via doGenCode fuses the scan, this projection, the Generate loop and
  * the downstream partial aggregate into one whole-stage span, and that
  * fused form measured consistently SLOWER than letting the projection
  * fall out of codegen (interleaved 30x stress A/B: 7.9-8.2 s fused vs
  * 5.5-6.6 s fallback on ngram_jaccard; same kernel, same results) — the
  * split keeps the explode+aggregate span small and feeds it a
  * materialized array through a BoundReference instead of re-entering the
  * kernel call inside the generate loop. The map-only sketch kernels
  * (MinHashShingles/SimHashShingles/WordGramHashes/WinnowedFingerprints,
  * HashedArray, TopShingleCount) keep their doGenCode: their consumers
  * are scalar projections where fusion measured faster.
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"word_shingles requires string input, got $dt")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Max multiplicity among word n-shingles of a text column — the mode
  * count of the sliding n-gram sequence (NOT deduplicated, unlike
  * [[WordShingles]]): the "most common n-gram share" repetition signal
  * counts occurrences, so `n_words - n + 1` shingles exist for
  * `n_words ≥ n` and none below that (0 returned). One tokenize + one
  * hash-count pass per row, replacing the O(shingles²) interpreted
  * `transform(distinct, x → size(filter(…)))` composition whose lambda
  * frames dominate the quality scan at corpus scale. Whole-stage
  * codegen'd via a static kernel call.
  */
case class TopShingleCount(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"top_shingle_count requires string input, got $dt")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_shingle_count"

  override def nullSafeEval(input: Any): Any =
    TextKernels.topShingleCount(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.topShingleCount($c, $n)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Count of array elements contained in a small fixed string set — the
  * codegen'd form of `size(filter(words, w => w.isInCollection(set)))`
  * (identical semantics: occurrences counted, null elements skipped, null
  * array → null). The interpreted `filter` HOF allocates a lambda frame per
  * word; the marker scorers (stopword ratio, per-language marker counts)
  * run it once per language per row, so at corpus scale the interpreted
  * cost dominates the text-quality scan. Here: one hash-set probe per word
  * inside whole-stage codegen.
  */
case class CountInSet(child: Expression, set: Seq[String])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"count_in_set requires array<string>, got $dt")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(x => s.add(UTF8String.fromString(x)))
    s
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && lookup.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode
  ): org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val setRef = ctx.addReferenceObj("lookup", lookup, "java.util.HashSet")
    // fresh locals: langId evaluates FIVE of these in one projection —
    // fixed names would collide ("Redefinition of local variable") and
    // silently push the whole projection to interpreter mode
    val n = ctx.freshName("n"); val c = ctx.freshName("c"); val i = ctx.freshName("i")
    nullSafeCodeGen(
      ctx,
      ev,
      arr => s"""
        |int $n = $arr.numElements();
        |int $c = 0;
        |for (int $i = 0; $i < $n; $i++) {
        |  if (!$arr.isNullAt($i) && $setRef.contains($arr.getUTF8String($i))) $c++;
        |}
        |${ev.value} = $c;
      """.stripMargin
    )
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** xxhash64 over each element of a string array in one pass — fused
  * shingle-hash for the fingerprint stage (avoids an interpreted
  * `transform`). Seed 42 matches the built-in `xxhash64(col)` exactly, so
  * results are interchangeable with `transform(shingles, s => xxhash64(s))`.
  */
case class HashedArray(child: Expression, seed: Long = 42L)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hashed_array requires array<string>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_array"

  override def nullSafeEval(input: Any): Any =
    TextKernels.hashedArray(input.asInstanceOf[ArrayData], seed)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.hashedArray($c, ${seed}L)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Positional k-word gram hashes of a text column in ONE pass —
  * bit-identical to `transform(positions, i => xxhash64(concat_ws(" ",
  * slice(split(trim(text), "\\s+"), i+1, k))))` (the
  * Dedup.positionalGrams hashKey layout), without the per-position
  * array-slice copy, string concat allocation and interpreted lambda
  * frame: word boundaries are found once at the BYTE level (ASCII
  * whitespace never occurs inside a UTF-8 multibyte sequence, so the
  * byte scan equals [[WordSplit]]'s char rule), each gram's bytes are
  * assembled into one REUSED buffer, and the hash is the builtin
  * xxhash64's (seed 42 over the same bytes). Output: array<long>,
  * element i = hash of the gram starting at token i; EMPTY when the
  * text has fewer than k tokens (positionalGrams' `n_tokens >= k`
  * filter — callers posexplode, so emptiness is the filter). The
  * r17 pipeline profile put this string churn at the center of the
  * composed trigger's gram stage (~2 s of a ~4 s floor at a 5k-doc
  * batch probing a 10x store).
  */
case class WordGramHashes(child: Expression, k: Int)
    extends UnaryExpression {

  require(k >= 1, "gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"word_gram_hashes requires string input, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "word_gram_hashes"

  override def nullSafeEval(input: Any): Any =
    TextKernels.wordGramHashes(input.asInstanceOf[UTF8String], k)

  // stay inside whole-stage codegen: one static kernel call, primitive
  // long-array result (UnsafeArrayData), no virtual eval and no boxing —
  // the r17 CodegenFallback paid one interpreted eval per row and boxed
  // every output long in the engine's hottest scans
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.wordGramHashes($c, $k)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Winnowing-selected fingerprints of a text column in ONE pass —
  * bit-identical to the staged production layout in
  * Dedup.winnowingPostings (portable = false): w-word shingle hashes
  * (the builtin xxhash64 of each shingle string — [[WordGramHashes]]'
  * byte assembly, with the `< w` fallback hashing the whole text, the
  * `split("")` = [""] empty-word convention included), then the
  * distinct mins of every `windowSize`-wide window (windows truncate
  * at the tail exactly as `slice` does). Output: array<long>, distinct,
  * first-occurrence order — always non-empty (a short text selects the
  * min of its single-window shingles, as the Column form does).
  */
case class WinnowedFingerprints(child: Expression, w: Int, windowSize: Int)
    extends UnaryExpression {

  require(w >= 1, "shingle width must be >= 1")
  require(windowSize >= 1, "window size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"winnowed_fingerprints requires string input, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnowed_fingerprints"

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowedFingerprints(input.asInstanceOf[UTF8String], w, windowSize)

  // see WordGramHashes.doGenCode — same kernel-call pattern
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.winnowedFingerprints($c, $w, $windowSize)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Static kernels behind [[WordGramHashes]] and [[WinnowedFingerprints]]:
  * public because whole-stage-codegen'd plans call them directly (one
  * static call per row from the generated projection). Both return
  * [[UnsafeArrayData]] backed by a primitive long array — no element
  * boxing on the way out.
  */
object TextKernels {

  /** Distinct word n-gram shingles, first-occurrence order; see
    * [[WordShingles]].
    */
  def wordShingles(input: UTF8String, n: Int): ArrayData = {
    val text = input.toString
    // split on whitespace runs, matching split(trim(text), "\s+")
    val words = WordSplit.split(text)
    val w = words.size()
    val out = new java.util.LinkedHashSet[String]()
    if (w == 0) {
      out.add("") // split("") yields [""] → one empty shingle, as built-ins do
    } else if (w <= n) {
      out.add(String.join(" ", words))
    } else {
      val sb = new java.lang.StringBuilder(64)
      var s = 0
      while (s <= w - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words.get(s + j))
          j += 1
        }
        out.add(sb.toString)
        s += 1
      }
    }
    val arr = new Array[Any](out.size())
    val it = out.iterator()
    var k = 0
    while (it.hasNext) { arr(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(arr)
  }

  /** Max multiplicity among word n-shingles (0 when fewer than n words);
    * see [[TopShingleCount]].
    */
  def topShingleCount(input: UTF8String, n: Int): Int = {
    val text = input.toString
    // same tokenization as WordShingles and the regex-split metrics
    val words = WordSplit.split(text)
    val w = words.size()
    if (w < n) return 0
    val counts = new java.util.HashMap[String, Integer]((w - n + 1) * 2)
    val sb = new java.lang.StringBuilder(64)
    var best = 0
    var s = 0
    while (s <= w - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(words.get(s + j))
        j += 1
      }
      val c = counts.merge(sb.toString, 1, (a, b) => a + b)
      if (c > best) best = c
      s += 1
    }
    best
  }

  /** xxhash64 of every element of a string array; see [[HashedArray]]. */
  def hashedArray(arr: ArrayData, seed: Long): UnsafeArrayData = {
    val m = arr.numElements()
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      out(i) = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Positional k-gram xxhash64 hashes; EMPTY when fewer than k tokens. */
  def wordGramHashes(input: UTF8String, k: Int): UnsafeArrayData = {
    val bytes = input.getBytes
    val (starts, ends, nWords) = WordBytes.boundaries(bytes)
    if (nWords < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val n = nWords - k + 1
    val out = new Array[Long](n)
    // reusable gram buffer sized to the widest gram
    var maxLen = 0
    var i = 0
    while (i <= nWords - k) {
      var len = k - 1 // separators
      var j = i
      while (j < i + k) { len += ends(j) - starts(j); j += 1 }
      if (len > maxLen) maxLen = len
      i += 1
    }
    val buf = new Array[Byte](maxLen)
    i = 0
    while (i < n) {
      var p = 0
      var j = i
      while (j < i + k) {
        if (j > i) { buf(p) = ' '; p += 1 }
        val wl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, p, wl)
        p += wl
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, p, 42L)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Winnowing-selected shingle hashes, distinct, first-occurrence order;
    * always non-empty (boundaries returns >= 1 token: split(trim("")) =
    * [""] — one empty word, one empty shingle).
    */
  def winnowedFingerprints(input: UTF8String, w: Int, windowSize: Int): UnsafeArrayData = {
    val bytes = input.getBytes
    val (starts, ends, nWords) = WordBytes.boundaries(bytes)
    val nSh = math.max(nWords - w, 0) + 1
    val hs = new Array[Long](nSh)
    val bufLen = {
      var maxLen = 0
      var i = 0
      while (i < nSh) {
        val hi = math.min(i + w, nWords)
        var len = math.max(hi - i - 1, 0)
        var j = i
        while (j < hi) { len += ends(j) - starts(j); j += 1 }
        if (len > maxLen) maxLen = len
        i += 1
      }
      maxLen
    }
    val buf = new Array[Byte](bufLen)
    var i = 0
    while (i < nSh) {
      var p = 0
      val hi = math.min(i + w, nWords)
      var j = i
      while (j < hi) {
        if (j > i) { buf(p) = ' '; p += 1 }
        val wl = ends(j) - starts(j)
        System.arraycopy(bytes, starts(j), buf, p, wl)
        p += wl
        j += 1
      }
      hs(i) = XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, p, 42L)
      i += 1
    }
    val nWin = math.max(nSh - windowSize, 0) + 1
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i < nWin) {
      var m = hs(i)
      var j = i + 1
      val hi = math.min(i + windowSize, nSh)
      while (j < hi) { if (hs(j) < m) m = hs(j); j += 1 }
      seen.add(m)
      i += 1
    }
    val out = new Array[Long](seen.size())
    val it = seen.iterator()
    var z = 0
    while (it.hasNext) { out(z) = it.next().longValue(); z += 1 }
    UnsafeArrayData.fromPrimitiveArray(out)
  }
}

/** Byte-level word-boundary scan shared by [[WordGramHashes]] and
  * [[WinnowedFingerprints]]: the exact token sequence of
  * `split(trim(text), "\\s+", -1)` applied to raw UTF-8 (ASCII
  * whitespace bytes cannot occur inside a multibyte sequence, so byte
  * positions equal char-rule word boundaries). That contract has two
  * non-obvious corners the scan reproduces bit for bit, because every
  * persisted fingerprint store and every DuckDB oracle is derived from
  * it: `trim` strips SPACES (0x20) only, so a leading/trailing
  * non-space whitespace run (`\t`, `\n`, …) yields an empty EDGE token
  * (regex split keeps the empty field before a match at position 0 and,
  * at limit -1, after a match at the end); and empty / all-space input
  * yields one empty token (`split("") == [""]`). Token count is
  * therefore always >= 1.
  */
private[functions] object WordBytes {
  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** (starts, ends, count) of the `split(trim(bytes))` tokens; an empty
    * token has starts(i) == ends(i).
    */
  def boundaries(bytes: Array[Byte]): (Array[Int], Array[Int], Int) = {
    val n = bytes.length
    var lo = 0
    var hi = n
    while (lo < hi && bytes(lo) == ' ') lo += 1
    while (hi > lo && bytes(hi - 1) == ' ') hi -= 1
    var cap = 16
    var starts = new Array[Int](cap)
    var ends = new Array[Int](cap)
    var cnt = 0
    def push(s: Int, e: Int): Unit = {
      if (cnt == cap) {
        cap *= 2
        starts = java.util.Arrays.copyOf(starts, cap)
        ends = java.util.Arrays.copyOf(ends, cap)
      }
      starts(cnt) = s
      ends(cnt) = e
      cnt += 1
    }
    if (lo == hi) { // empty after space-trim: split("") == [""]
      push(lo, lo)
      return (starts, ends, cnt)
    }
    if (isWs(bytes(lo))) push(lo, lo) // leading non-space ws: empty edge token
    var i = lo
    while (i < hi) {
      while (i < hi && isWs(bytes(i))) i += 1
      if (i < hi) {
        val s = i
        while (i < hi && !isWs(bytes(i))) i += 1
        push(s, i)
      }
    }
    if (isWs(bytes(hi - 1))) push(hi, hi) // trailing non-space ws: empty edge token
    (starts, ends, cnt)
  }
}
