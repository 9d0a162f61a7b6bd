package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketed range join: pair rows whose timestamps fall within a bounded
  * interval of each other, planned as an EQUI-join.
  *
  * The naive formulation — `a JOIN b ON a.key = b.key AND b.ts BETWEEN
  * a.ts AND a.ts + w` — is an equi-join in Spark only because of the key
  * conjunct; without a key (or with a low-cardinality key) Catalyst falls
  * back to BroadcastNestedLoop/cartesian and the range predicate is
  * evaluated per row pair: O(|a|·|b|) within each key group. At corpus
  * scale a hot key makes that quadratic.
  *
  * This operator buckets event time into `window`-sized epochs and turns
  * the range predicate into an equi-join on (keys..., bucket): a row at
  * time t can only pair with rows in its own bucket or the next one
  * (interval length ≤ window), so the LEFT side is exploded to its two
  * candidate buckets — a fixed 2× fan-out, independent of data skew —
  * and the exact range predicate survives only as a residual filter on
  * the equi-join output. The plan is a plain shuffle hash / sort-merge
  * join on (keys, bucket); no nested loop, no per-key quadratic blowup
  * beyond what the true output size already implies.
  *
  * Reference analogue: the poll connector's `timestamp+incrementing`
  * incremental scan (connector.json:15) is a degenerate range predicate
  * (ts > offset); this generalizes to two-sided bounded intervals.
  */
object RangeJoin {

  /** Inner-join `left` × `right` on `keys` equality plus
    * `right(rightTs) ∈ (left(leftTs), left(leftTs) + windowMicros]` —
    * a strict "happens after, within the window" pairing.
    *
    * Both timestamp columns must be TIMESTAMP; `windowMicros` is the
    * interval length in microseconds. Columns from both sides survive
    * with `leftPrefix`/`rightPrefix` applied to disambiguate.
    */
  def within(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTs: String,
      rightTs: String,
      windowMicros: Long,
      leftPrefix: String = "a_",
      rightPrefix: String = "b_"
  ): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")

    def us(c: Column): Column = unix_micros(c)

    // left probes its own bucket and the next: a right row at most
    // windowMicros later can land in bucket(l) or bucket(l)+1. A right
    // row carries exactly one bucket, so the two probes cannot both
    // match the same (left, right) pair — no post-join dedup needed.
    val lBucket = floor(us(col(leftPrefix + leftTs)) / windowMicros)
    val l = left
      .select(keys.map(col) ++ left.columns.filterNot(keys.contains).map(c => col(c).as(leftPrefix + c)): _*)
      .withColumn("__bucket", explode(array(lBucket, lBucket + 1)))
    val r = right
      .select(keys.map(col) ++ right.columns.filterNot(keys.contains).map(c => col(c).as(rightPrefix + c)): _*)
      .withColumn("__bucket", floor(us(col(rightPrefix + rightTs)) / windowMicros))

    val joined = l.join(r, keys :+ "__bucket")
    joined
      .where(
        us(col(rightPrefix + rightTs)) > us(col(leftPrefix + leftTs)) &&
          us(col(rightPrefix + rightTs)) <= us(col(leftPrefix + leftTs)) + windowMicros
      )
      .drop("__bucket")
  }
}
