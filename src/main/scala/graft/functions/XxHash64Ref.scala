package graft.functions

/** Independent XXH64 written from the published algorithm (Yann Collet's
  * xxHash spec, github.com/Cyan4973/xxHash/blob/dev/doc/xxhash_spec.md,
  * public domain) — NOT a call into Spark's
  * `catalyst.expressions.XXH64`. Purpose: a second implementation that
  * lets the `x_text_fingerprint_prod` gate pin the production
  * fingerprint's exact hash values against something other than the code
  * under test. Verify materializes `min(xxh64ref(shingle))` per document
  * as the gate's expected table; the shingle pipeline feeding both sides
  * is itself DuckDB-proven by the md5-portable twin (`x_text_fingerprint`),
  * so the only link this closes is the 64-bit hash — exactly the link
  * DuckDB cannot express.
  *
  * Scale note: oracle-side only (driver-run, bounded by the gate corpus);
  * the production path stays the codegen'd [[HashedArray]] expression.
  */
object XxHash64Ref {

  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def round(acc: Long, x: Long): Long =
    rotl(acc + x * P2, 31) * P1

  @inline private def mergeRound(h: Long, v: Long): Long =
    (h ^ round(0L, v)) * P1 + P4

  @inline private def read8(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def read4(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24)

  /** XXH64 of `input`, per the spec's single-shot layout: 32-byte stripes
    * through four lanes, lane merge, length add, 8/4/1-byte tail, final
    * avalanche.
    */
  def hash(input: Array[Byte], seed: Long): Long = {
    val len = input.length
    var i = 0
    var h =
      if (len >= 32) {
        var v1 = seed + P1 + P2
        var v2 = seed + P2
        var v3 = seed
        var v4 = seed - P1
        while (i + 32 <= len) {
          v1 = round(v1, read8(input, i))
          v2 = round(v2, read8(input, i + 8))
          v3 = round(v3, read8(input, i + 16))
          v4 = round(v4, read8(input, i + 24))
          i += 32
        }
        var acc = rotl(v1, 1) + rotl(v2, 7) + rotl(v3, 12) + rotl(v4, 18)
        acc = mergeRound(acc, v1)
        acc = mergeRound(acc, v2)
        acc = mergeRound(acc, v3)
        mergeRound(acc, v4)
      } else seed + P5
    h += len
    while (i + 8 <= len) {
      h = rotl(h ^ round(0L, read8(input, i)), 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h = rotl(h ^ (read4(input, i) * P1), 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h = rotl(h ^ ((input(i) & 0xffL) * P5), 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  /** Seed-42 string form — the contract of the builtin `xxhash64(col)`
    * and [[HashedArray]]: hash of the string's UTF-8 bytes.
    */
  def hashString(s: String, seed: Long = 42L): Long =
    hash(s.getBytes("UTF-8"), seed)
}
