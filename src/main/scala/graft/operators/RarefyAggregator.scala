package graft.operators

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import scala.collection.mutable

/** R1 as a typed `Aggregator` (SURVEY §4.2 item 1): rarefaction that
  * composes with `groupByKey(...).agg(...)` and participates in
  * partial aggregation — count vectors merge associatively across
  * partitions (map union with summed counts), and the seeded
  * hypergeometric draw happens once per group in `finish`, keyed by
  * (seed, group) so the result is independent of partitioning.
  *
  * Input rows: (group, item, count). Output: drawn item→count map for
  * the group, or an empty map when the group's total is below `depth`
  * (same drop semantics as [[Sampling.rarefy]]).
  */
final case class RarefyBuffer(group: String, counts: mutable.Map[String, Long])

class RarefyAggregator(depth: Long, seed: Long)
    extends Aggregator[(String, String, Long), RarefyBuffer, Map[String, Long]] {

  override def zero: RarefyBuffer = RarefyBuffer("", mutable.Map.empty)

  override def reduce(b: RarefyBuffer, row: (String, String, Long)): RarefyBuffer = {
    val (grp, item, cnt) = row
    b.counts.update(item, b.counts.getOrElse(item, 0L) + cnt)
    RarefyBuffer(grp, b.counts)
  }

  override def merge(a: RarefyBuffer, b: RarefyBuffer): RarefyBuffer = {
    val (big, small) = if (a.counts.size >= b.counts.size) (a, b) else (b, a)
    small.counts.foreach { case (item, cnt) =>
      big.counts.update(item, big.counts.getOrElse(item, 0L) + cnt)
    }
    RarefyBuffer(if (big.group.nonEmpty) big.group else small.group, big.counts)
  }

  override def finish(b: RarefyBuffer): Map[String, Long] = {
    val items = b.counts.toArray.sortBy(_._1)
    val total = items.map(_._2).sum
    if (total < depth) return Map.empty
    val rng = new scala.util.Random(seed ^ scala.util.hashing.MurmurHash3
      .stringHash(b.group).toLong << 17)
    var remainingTotal = total
    var remainingDraw = depth
    val out = Map.newBuilder[String, Long]
    items.foreach { case (item, c) =>
      val x = Sampling.hypergeometric(rng, remainingTotal, c, remainingDraw)
      remainingTotal -= c
      remainingDraw -= x
      if (x > 0) out += item -> x
    }
    out.result()
  }

  override def bufferEncoder: Encoder[RarefyBuffer] = Encoders.kryo[RarefyBuffer]
  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
}
