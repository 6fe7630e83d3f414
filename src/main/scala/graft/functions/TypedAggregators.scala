package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` tier of the extension ladder —
  * for case-class `Dataset`s where the aggregation state is naturally a
  * typed value rather than a Catalyst buffer. Used via `.toColumn` on
  * `KeyValueGroupedDataset.agg`; Spark plans partial+final aggregation
  * with encoder-serialized buffers, so the same map-side-combine
  * properties as the untyped path apply. */
object TypedAggregators {

  /** Weighted mean with exact integer accumulation: values and weights
    * are taken as (value × weight, weight) long pairs, so partial sums
    * are associative and the division happens once at the end —
    * deterministic under any partitioning (the constraint every graft
    * aggregate holds itself to). */
  object WeightedMeanCents extends Aggregator[(Long, Long), (Long, Long), Double] {
    override def zero: (Long, Long) = (0L, 0L)
    override def reduce(b: (Long, Long), a: (Long, Long)): (Long, Long) =
      (b._1 + a._1 * a._2, b._2 + a._2)
    override def merge(x: (Long, Long), y: (Long, Long)): (Long, Long) =
      (x._1 + y._1, x._2 + y._2)
    override def finish(r: (Long, Long)): Double =
      if (r._2 == 0) Double.NaN else r._1.toDouble / r._2
    override def bufferEncoder: Encoder[(Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
