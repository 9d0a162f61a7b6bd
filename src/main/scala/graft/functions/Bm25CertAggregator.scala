package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored candidate of a block-max certification round:
  * `score` = the document's accumulated e6 score over admitted blocks,
  * `id` = doc_id (the deterministic tie-break, score desc / id asc —
  * the BM25 ranking order), `seen` = Σ r_e6 over the query terms that
  * have contributed to this document (a seen term's contribution is
  * complete — a doc appears at most once per term's postings).
  */
final case class CertIn(score: Long, id: Long, seen: Long)

/** Bounded certification buffer: total candidate count, the top-k
  * candidates in ranking order, and the max of (score − seen) over every
  * candidate EVICTED from the top-k (Long.MinValue until one exists —
  * unlike [[TopKBuf]], evictions here carry signal: they bound the
  * below-θ potential).
  */
final case class CertBuf(m: Long, items: Seq[CertIn], restMax: Long)

/** The per-query certificate facts, driver-side closed over tot_r:
  * `theta` = k-th accumulated score (min over the kept set);
  * `minSeenTop` = min seen-mass over the kept set, so
  * top_gap = tot_r − minSeenTop; `restMax` = max(score − seen) over
  * rank>k candidates, so rest_pot = tot_r + restMax (only meaningful
  * when m > k).
  */
final case class CertOut(m: Long, theta: Long, minSeenTop: Long, restMax: Long)

/** Typed certification aggregate for the BM25 block-max probe — the
  * [[TopKAggregator]] argument applied to the exactness certificate:
  * the `row_number().over(Window.partitionBy(q_id))` form shuffled EVERY
  * accumulated candidate row to its query's reducer each certification
  * round, then aggregated them AGAIN for the per-query facts — two
  * exchanges of all candidates per round. This aggregate computes the
  * same three facts (θ, the top-k seen-mass gap, the rank>k residual
  * potential) in ONE partial-aggregated pass: k rows + two longs per
  * (query × partition) reach the shuffle, and tot_r (constant per
  * query) is applied on the driver, removing the per-round broadcast
  * join — max(tot−seen) = tot − min(seen) over the top-k, and
  * max(score+tot−seen) = tot + max(score−seen) over the rest.
  *
  * The kept set is ordered (score desc, id asc) — exactly the ranking's
  * rn ≤ k set, including ties at the boundary — so the facts are
  * bit-identical to the window form's for every input order.
  */
final class Bm25CertAggregator(k: Int) extends Aggregator[CertIn, CertBuf, CertOut] {
  require(k >= 1, "k must be >= 1")

  private def lt(a: CertIn, b: CertIn): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: CertBuf = CertBuf(0L, Vector.empty, Long.MinValue)

  override def reduce(b: CertBuf, in: CertIn): CertBuf = {
    if (b.items.size >= k && !lt(in, b.items.last))
      CertBuf(b.m + 1, b.items, math.max(b.restMax, in.score - in.seen))
    else {
      val idx = b.items.indexWhere(x => lt(in, x)) match {
        case -1 => b.items.size
        case i  => i
      }
      val inserted = (b.items.take(idx) :+ in) ++ b.items.drop(idx)
      val evicted = inserted.drop(k)
      CertBuf(
        b.m + 1,
        inserted.take(k),
        evicted.foldLeft(b.restMax)((r, e) => math.max(r, e.score - e.seen)))
    }
  }

  override def merge(a: CertBuf, b: CertBuf): CertBuf = {
    val all = (a.items ++ b.items).sortWith(lt)
    CertBuf(
      a.m + b.m,
      all.take(k),
      all.drop(k).foldLeft(math.max(a.restMax, b.restMax))(
        (r, e) => math.max(r, e.score - e.seen)))
  }

  override def finish(r: CertBuf): CertOut =
    // items is non-empty for every emitted group (groupBy only emits
    // observed queries), so theta/minSeenTop are always defined
    CertOut(
      r.m,
      r.items.map(_.score).min,
      r.items.map(_.seen).min,
      r.restMax)

  override def bufferEncoder: Encoder[CertBuf] = Encoders.product[CertBuf]
  override def outputEncoder: Encoder[CertOut] = Encoders.product[CertOut]
}
