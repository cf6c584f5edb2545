package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries heavy-hitters sketch as a typed `Aggregator` — the
  * user-facing custom-aggregate surface (SURVEY.md §2.2 "UDF/UDAF"; the
  * reference has none).
  *
  * Guarantees: with capacity c, every item with frequency > n/c survives,
  * and counts are undercounted by at most n/c. With c ≥ #distinct the
  * counts are exact — which is how the oracle-checked query below uses it.
  * Merge is associative/commutative, so it runs as a proper partial
  * aggregate: each partition sketches locally, sketches merge on the
  * reduce side — O(c) state per partition, no shuffle of raw rows.
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(buf: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    if (buf.contains(item) || buf.size < capacity) {
      buf.update(item, buf.getOrElse(item, 0L) + 1L)
    } else {
      // decrement-all step; drop zeros
      val dead = mutable.Buffer[String]()
      buf.keysIterator.foreach { k =>
        val v = buf(k) - 1L
        if (v <= 0L) dead += k else buf.update(k, v)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (k, v) => a.update(k, a.getOrElse(k, 0L) + v) }
    if (a.size > capacity) {
      // Shrink back to capacity (Agarwal et al., "Mergeable Summaries"):
      // subtract the capacity-th largest count from EVERY counter and drop
      // the non-positive ones. At least `capacity` counters carry >= cut
      // mass, so the total mass removed per shrink is >= capacity * cut;
      // summed over the sketch's lifetime that bounds every key's
      // undercount by n / capacity.
      val cut = a.values.toSeq.sorted(Ordering[Long].reverse).apply(capacity - 1)
      val dead = a.collect { case (k, v) if v - cut <= 0 => k }.toSeq
      val cutKeep = a.keySet.toSet -- dead
      dead.foreach(a.remove)
      cutKeep.foreach(k => a.update(k, a(k) - cut))
    }
    a
  }

  override def finish(buf: mutable.Map[String, Long]): Map[String, Long] = buf.toMap

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
