package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One (score, id) candidate for a bounded top-k aggregation. */
case class ScoredId(cos: Double, vec_id: Long)

/** Aggregation buffer: at most k candidates, kept sorted best-first
  * (cos desc, vec_id asc). Wrapped in a case class so the buffer and
  * output ride Encoders.product. */
case class TopKBuf(items: Seq[ScoredId])

/** Bounded top-k as a typed Aggregator — the scale-path replacement for
  * `row_number().over(Window.partitionBy(q).orderBy(score))` + `rn <= k`.
  *
  * The window formulation forces a full sort shuffle of every candidate
  * row (each dragging its embedding arrays) into one reducer per
  * partition key — the classic top-k funnel. This Aggregator is
  * partial-aggregation-safe: every map task keeps at most k entries per
  * group, so the shuffle carries k·|groups| tiny (double, long) pairs
  * and the final merge is a k-way sorted-list merge. Plans as
  * HashAggregate (partial + final), never Sort + Window.
  *
  * Determinism: the comparator (cos desc, vec_id asc) is a strict total
  * order over distinct ids, so the surviving set and its order are
  * independent of row arrival and partial-merge order — exactly the
  * contract the DuckDB oracle's `row_number() ORDER BY cos DESC, vec_id
  * ASC ... <= k` expresses.
  */
class TopKAggregator(k: Int) extends Aggregator[ScoredId, TopKBuf, TopKBuf] {

  /** Total order on scores matching Spark SQL's and DuckDB's sort
    * semantics: NaN is greater than every value (a zero-norm vector's
    * 0/0 cosine ranks FIRST under DESC, as the Window formulation this
    * replaces would rank it), and -0.0 == 0.0. Plain `>`/`==` would
    * make NaN incomparable: a NaN buffer tail turns `!better(a, last)`
    * permanently true and silently drops every real candidate. */
  private def cmpScore(x: Double, y: Double): Int =
    java.lang.Double.compare(if (x == 0.0) 0.0 else x, if (y == 0.0) 0.0 else y)

  /** Strict total order: better-than. */
  private def better(a: ScoredId, b: ScoredId): Boolean = {
    val c = cmpScore(a.cos, b.cos)
    c > 0 || (c == 0 && a.vec_id < b.vec_id)
  }

  private def insert(b: Seq[ScoredId], a: ScoredId): Seq[ScoredId] =
    if (b.length == k && !better(a, b.last)) b
    else {
      val i = b.indexWhere(better(a, _)) match { case -1 => b.length; case x => x }
      ((b.take(i) :+ a) ++ b.drop(i)).take(k)
    }

  override def zero: TopKBuf = TopKBuf(Vector.empty)
  override def reduce(b: TopKBuf, a: ScoredId): TopKBuf = TopKBuf(insert(b.items, a))
  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf =
    TopKBuf(y.items.foldLeft(x.items)(insert))
  override def finish(b: TopKBuf): TopKBuf = b
  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
