package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** A (score, id) pair in a top-k result; ordered by score desc, id asc —
  * the deterministic tie-break used across the similarity operators.
  */
final case class ScoredId(score: Double, id: Long)

/** Bounded top-k buffer kept sorted (score desc, id asc). k is small, so
  * insertion into a sorted array beats heap constant factors and encodes
  * cheaply.
  */
final case class TopKBuf(items: Seq[ScoredId])

/** Typed top-k aggregate: per-group k best (score, id) pairs.
  *
  * Why an Aggregator instead of `row_number().over(Window...)`: the window
  * form shuffles EVERY scored row to its group's reducer before ranking —
  * for similarity search that is |corpus| × |queries| rows through the
  * exchange. The aggregate form keeps a k-element buffer per group per map
  * task (partial aggregation), so only k rows per (group × partition) reach
  * the shuffle — the difference between a full-corpus exchange and a few KB
  * per query at 100 TB.
  *
  * Register for DataFrames with `functions.udaf(new TopKAggregator(k))`.
  */
final class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, Seq[ScoredId]] {
  require(k >= 1, "k must be >= 1")

  private def lt(a: ScoredId, b: ScoredId): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, in: ScoredId): TopKBuf = {
    if (b.items.size >= k && !lt(in, b.items.last)) b
    else {
      val idx = b.items.indexWhere(x => lt(in, x)) match {
        case -1 => b.items.size
        case i  => i
      }
      val inserted = (b.items.take(idx) :+ in) ++ b.items.drop(idx)
      TopKBuf(inserted.take(k))
    }
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf =
    TopKBuf((a.items ++ b.items).sortWith(lt).take(k))

  override def finish(r: TopKBuf): Seq[ScoredId] = r.items

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[ScoredId]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
