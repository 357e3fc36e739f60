package graft.ops

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions

/** One (ordering key, payload id) observation for the top-k aggregate. */
case class KeyedId(key: Long, id: Long)

/** Bounded top-k per group as a typed Aggregator (the engine's UDAF
  * surface — SURVEY §2 "UDF/UDAF/UDTF"; everything else stays built-in).
  *
  * WHY an aggregate and not a window: `row_number() OVER (...) <= k`
  * shuffles and sorts EVERY row of the group. An Aggregator participates
  * in partial aggregation — each map task reduces its rows to a k-bounded
  * buffer, and the shuffle carries only those k-element buffers per
  * (task, group). At 100 TB with a hot group, that's the difference
  * between shuffling the table and shuffling k rows per task.
  *
  * Ordering is (key DESC, id ASC) and fully deterministic when callers
  * fold tie-breaks into the key (see ExtendedQueries.topkPerKey).
  */
class TopKByKey(k: Int) extends Aggregator[KeyedId, Seq[KeyedId], Seq[Long]] {
  require(k > 0, s"top-k width must be positive, got $k")

  // no negation: -Long.MinValue IS Long.MinValue (overflow), which would
  // rank the smallest possible key as the largest. Compare key descending
  // directly, then id ascending.
  private val desc: Ordering[KeyedId] = new Ordering[KeyedId] {
    override def compare(a: KeyedId, b: KeyedId): Int = {
      val byKey = java.lang.Long.compare(b.key, a.key) // DESC
      if (byKey != 0) byKey else java.lang.Long.compare(a.id, b.id) // ASC
    }
  }

  override def zero: Seq[KeyedId] = Vector.empty

  /** Binary-search insertion into the (already sorted) buffer — O(log k)
    * comparisons + one copy per accepted row, vs a full re-sort; rows
    * outside the current top-k cost ONE comparison (the common case on a
    * hot group). */
  private def insertSorted(buf: Seq[KeyedId], a: KeyedId, drop: Boolean): Seq[KeyedId] = {
    var lo = 0
    var hi = buf.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (desc.lt(buf(mid), a)) lo = mid + 1 else hi = mid
    }
    val kept = if (drop) buf.init else buf
    (kept.take(lo) :+ a) ++ kept.drop(lo)
  }

  override def reduce(buf: Seq[KeyedId], a: KeyedId): Seq[KeyedId] =
    if (buf.size < k) insertSorted(buf, a, drop = false)
    else if (desc.lt(a, buf.last)) insertSorted(buf, a, drop = true)
    else buf

  override def merge(b1: Seq[KeyedId], b2: Seq[KeyedId]): Seq[KeyedId] =
    (b1 ++ b2).sorted(desc).take(k)

  override def finish(buf: Seq[KeyedId]): Seq[Long] = buf.map(_.id)

  override def bufferEncoder: ExpressionEncoder[Seq[KeyedId]] =
    ExpressionEncoder[Seq[KeyedId]]()
  override def outputEncoder: ExpressionEncoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}

object TopK {
  /** Column-API handle: `topK(5)(keyCol, idCol)` aggregates to the ids of
    * the k largest keys, ordered (key desc, id asc). */
  def topK(k: Int): UserDefinedFunction =
    functions.udaf(new TopKByKey(k), ExpressionEncoder[KeyedId]())
}
