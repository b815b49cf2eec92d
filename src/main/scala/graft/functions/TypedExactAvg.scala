package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** The third custom-aggregation tier next to the codegen Expression
  * (`graft_dot`) and the TypedImperativeAggregate (`graft_topk`): the
  * PUBLIC typed [[Aggregator]] API — case-class buffer, Encoder-derived
  * serialization, `groupByKey(...).agg(agg.toColumn)` call site. The
  * right tier when type safety at the call site matters more than the
  * last word in shuffle bytes (the buffer travels through the Encoder,
  * not a hand-rolled serializer).
  *
  * Semantics: exact average over integer cents — the buffer is
  * `(count, Σcents)`, both longs, so partial aggregation and merge are
  * exact and order-independent; only `finish` divides (one
  * correctly-rounded IEEE op, mirrored by the oracle). */
object TypedExactAvg extends Aggregator[Long, (Long, Long), Double] {
  override def zero: (Long, Long) = (0L, 0L)
  override def reduce(b: (Long, Long), cents: Long): (Long, Long) =
    (b._1 + 1, b._2 + cents)
  override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
    (x._1 + y._1, x._2 + y._2)
  override def finish(r: (Long, Long)): Double =
    r._2.toDouble / r._1 / 100.0
  override def bufferEncoder: Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
