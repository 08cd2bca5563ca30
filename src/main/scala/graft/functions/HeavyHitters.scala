package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** SpaceSaving heavy-hitters sketch as a typed `Aggregator` — the
  * bounded-memory, mergeable alternative to an exact
  * `groupBy(token).count().orderBy(...).limit(k)` when the token
  * domain is unbounded (URLs, n-grams, user agents) and only the top
  * of the distribution matters.
  *
  * State: at most `capacity` counters per partition buffer; eviction
  * replaces the minimum counter (Metwally et al., "Efficient
  * computation of frequent and top-k elements in data streams").
  * Guarantee: any item with true frequency > n / capacity is present
  * in the final summary; per-item counts overestimate by at most the
  * smallest evicted counter. Buffers merge associatively, so the
  * aggregate runs as map-side partials + one tiny shuffle — sketch
  * size, not data size, crosses the wire.
  */
class HeavyHitters(capacity: Int, k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[(String, Long)]] {

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  private def add(b: mutable.Map[String, Long], item: String, by: Long): mutable.Map[String, Long] = {
    b.get(item) match {
      case Some(c) => b.update(item, c + by)
      case None if b.size < capacity => b.update(item, by)
      case None =>
        // deterministic eviction: ties on the minimum count break by
        // item value, never by HashMap iteration order (which varies
        // across JVMs/runs and would make the sketch nondeterministic)
        val (minItem, minCount) = b.minBy { case (it, c) => (c, it) }
        b.remove(minItem)
        b.update(item, minCount + by)
    }
    b
  }

  override def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] =
    add(b, item, 1L)

  override def merge(b1: mutable.Map[String, Long], b2: mutable.Map[String, Long]): mutable.Map[String, Long] =
    b2.foldLeft(b1) { case (b, (item, c)) => add(b, item, c) }

  override def finish(b: mutable.Map[String, Long]): Seq[(String, Long)] =
    b.toSeq.sortBy { case (item, c) => (-c, item) }.take(k)

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[(String, Long)]] =
    ExpressionEncoder[Seq[(String, Long)]]()
}
