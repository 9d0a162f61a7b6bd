package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-column data skipping.
  *
  * A parquet layout sorted on one column gives tight min/max footer
  * stats — and file pruning — on THAT column only; predicates on a
  * second column scan everything. Interleaving the bits of two columns
  * into one Morton key and range-partitioning + sorting on it keeps
  * each file's rows inside a small rectangle of the (a, b) space, so
  * min/max stats stay tight on BOTH columns and point/range predicates
  * on either one prune files (the published OPTIMIZE ZORDER technique).
  *
  * The interleave is the classic mask-spread: 5 shift/mask steps per
  * column, all `org.apache.spark.sql.functions` bit ops — codegen'd,
  * constant-foldable, reproducible in any engine with shifts and ANDs
  * (the gate oracle runs the identical formula in DuckDB).
  */
object ZOrder {

  /** Spread the low 16 bits of non-negative `x` to even bit positions:
    * bit i → bit 2i.
    */
  def spread16(x: Column): Column = {
    val m0 = x.bitwiseAND(lit(0xFFFFL))
    val m1 = m0.bitwiseOR(shiftleft(m0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val m2 = m1.bitwiseOR(shiftleft(m1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val m3 = m2.bitwiseOR(shiftleft(m2, 2)).bitwiseAND(lit(0x33333333L))
    m3.bitwiseOR(shiftleft(m3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit bucket values: `a` on even bits,
    * `b` on odd bits. Callers bucket/normalize raw columns into
    * [0, 65536) first (e.g. `pmod`, range scaling, epoch-hour masking).
    */
  def zValue(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Rewrite `df` into `nFiles` z-clustered output slices: range
    * partition on the Morton key (one sampling pass, the same mechanism
    * as a global orderBy) and sort within each slice, so every written
    * file covers a compact rectangle in (a, b). `bucketA`/`bucketB`
    * must already be 16-bit bucket columns.
    */
  def cluster(df: DataFrame, bucketA: Column, bucketB: Column, nFiles: Int): DataFrame = {
    val z = zValue(bucketA, bucketB)
    df.withColumn("__z", z)
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }
}
