package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed per-group top-k aggregator: keeps a bounded min-heap of
  * (id, score) pairs, so a group of ANY size aggregates in O(n log k) with
  * an O(k) buffer — the aggregating alternative to the window
  * `row_number() <= k` form when the rank column itself isn't needed.
  *
  * Why this exists (SURVEY §2.2 UDF/UDAF row, §7.3): the window form
  * shuffles ALL rows of a group to one partition and sorts them; this
  * Aggregator does map-side partial aggregation — each partition reduces to
  * k rows per group before the shuffle, which at 100 TB is the difference
  * between shuffling the corpus and shuffling k·groups rows.
  *
  * Determinism: ties broken by id ascending (matches the oracle-side
  * `ORDER BY score DESC, id` convention).
  */
class TopKByScore(k: Int) extends Aggregator[(Long, Double), mutable.PriorityQueue[(Long, Double)], Seq[(Long, Double)]] {

  // min-heap on (score asc, id desc): the head is the WEAKEST kept entry,
  // evicted first; on score ties the larger id is weaker (id asc wins).
  private val weakestFirst: Ordering[(Long, Double)] =
    Ordering.by[(Long, Double), (Double, Long)] { case (id, score) => (-score, id) }

  override def zero: mutable.PriorityQueue[(Long, Double)] =
    mutable.PriorityQueue.empty(weakestFirst)

  override def reduce(heap: mutable.PriorityQueue[(Long, Double)], row: (Long, Double)): mutable.PriorityQueue[(Long, Double)] = {
    heap.enqueue(row)
    while (heap.size > k) heap.dequeue()
    heap
  }

  override def merge(a: mutable.PriorityQueue[(Long, Double)], b: mutable.PriorityQueue[(Long, Double)]): mutable.PriorityQueue[(Long, Double)] = {
    b.foreach(a.enqueue(_))
    while (a.size > k) a.dequeue()
    a
  }

  override def finish(heap: mutable.PriorityQueue[(Long, Double)]): Seq[(Long, Double)] =
    heap.toSeq.sortBy { case (id, score) => (-score, id) }

  override def bufferEncoder: Encoder[mutable.PriorityQueue[(Long, Double)]] =
    Encoders.kryo[mutable.PriorityQueue[(Long, Double)]]

  override def outputEncoder: Encoder[Seq[(Long, Double)]] = ExpressionEncoder()
}
