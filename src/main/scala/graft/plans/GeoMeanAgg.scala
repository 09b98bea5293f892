package graft.plans

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Geometric mean as a typed `Aggregator` — the third custom-aggregate
  * surface beside the Catalyst `TypedImperativeAggregate` (MinHashAgg)
  * and the built-in sketches: the high-level UDAF API for aggregates
  * with a decomposable buffer. Buffer = (Σ ln x, n); merge is
  * component-wise +, so partial aggregation and AQE work unchanged.
  * finish = exp(Σln/n). Callers round the (order-dependent) double. */
object GeoMeanAgg extends Aggregator[Double, (Double, Long), Double] {
  override def zero: (Double, Long) = (0.0, 0L)
  override def reduce(b: (Double, Long), x: Double): (Double, Long) =
    (b._1 + math.log(x), b._2 + 1)
  override def merge(a: (Double, Long), b: (Double, Long)): (Double, Long) =
    (a._1 + b._1, a._2 + b._2)
  override def finish(r: (Double, Long)): Double =
    if (r._2 == 0) Double.NaN else math.exp(r._1 / r._2)
  override def bufferEncoder: Encoder[(Double, Long)] =
    Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong)
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
