package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
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
  * CodegenFallback: one virtual call per row; the O(len) inner loop is
  * plain Java.
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

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
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

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Max multiplicity among word n-shingles of a text column — the mode
  * count of the sliding n-gram sequence (NOT deduplicated, unlike
  * [[WordShingles]]): the "most common n-gram share" repetition signal
  * counts occurrences, so `n_words - n + 1` shingles exist for
  * `n_words ≥ n` and none below that (0 returned). One tokenize + one
  * hash-count pass per row, replacing the O(shingles²) interpreted
  * `transform(distinct, x → size(filter(…)))` composition whose lambda
  * frames dominate the quality scan at corpus scale. CodegenFallback:
  * one virtual call per row; the inner loop is plain Java.
  */
case class TopShingleCount(child: Expression, n: Int)
    extends UnaryExpression
    with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"top_shingle_count requires string input, got $dt")
  }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "top_shingle_count"

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
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
    extends UnaryExpression
    with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"hashed_array requires array<string>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hashed_array"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = arr.numElements()
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val s = arr.getUTF8String(i)
      out(i) = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        s.getBaseObject, s.getBaseOffset, s.numBytes(), seed)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
