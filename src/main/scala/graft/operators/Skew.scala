package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Skew-mitigation utilities for large joins and aggregations.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) is the first line of defense and needs no code. These helpers
  * cover the cases AQE cannot re-plan:
  *   - a broadcast-ineligible join whose hot keys are known/computable
  *     up front (salting spreads one hot key over `salts` reducer
  *     partitions at the cost of replicating the other side's hot rows);
  *   - high-cardinality aggregations over skewed keys (two-phase agg).
  */
object Skew {

  /** Salted inner equi-join: `left` rows get a random-but-deterministic
    * salt derived from non-key columns; `right` rows are replicated once
    * per salt value. Correct for inner/left joins keyed on `key` columns.
    *
    * Scale note: replication factor = `salts` on the right side only —
    * salt only when the right side is the small(er) one or the hot keys
    * are filtered into their own salted join (differentiated handling).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      salts: Int,
      joinType: String = "inner"
  ): DataFrame = {
    require(salts >= 1, "salts must be >= 1")
    // deterministic salt: hash of the whole left row (not rand(), which
    // breaks retry determinism and checkpoint replay)
    val l = left.withColumn(
      "__salt",
      pmod(xxhash64(struct(left.columns.map(col): _*)), lit(salts)).cast("int")
    )
    val r = right
      .withColumn("__salt", explode(array((0 until salts).map(lit): _*)))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }

  /** Two-phase aggregation for skewed group keys: pre-aggregate on
    * (key, salt) — spreading a hot key across `salts` partial groups —
    * then combine the partials. `partials` maps each value column to its
    * partial aggregate; `finals` combines the partial columns.
    *
    * Example (count):
    *   twoPhaseAgg(df, Seq("k"), 8,
    *     Seq(count(lit(1)).as("c")), Seq(sum(col("c")).as("n")))
    */
  def twoPhaseAgg(
      df: DataFrame,
      keys: Seq[String],
      salts: Int,
      partials: Seq[Column],
      finals: Seq[Column]
  ): DataFrame = {
    val salted = df.withColumn(
      "__salt",
      pmod(xxhash64(struct(df.columns.map(col): _*)), lit(salts)).cast("int")
    )
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partials.head, partials.tail: _*)
    partial
      .groupBy(keys.map(col): _*)
      .agg(finals.head, finals.tail: _*)
  }
}
