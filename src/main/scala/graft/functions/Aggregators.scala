package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed custom aggregates (SURVEY.md §2.11: aggregating transforms map to
  * `Aggregator[IN, BUF, OUT]` registered via `udaf`). Both are
  * partial-aggregation friendly — `merge` is associative+commutative, so
  * Catalyst plans map-side combine and the shuffle carries only buffers.
  */
object Aggregators {

  /** Exact weighted mean: value×weight accumulated in cents (long) so the
    * result is order-independent — the same decimal-exactness contract as
    * the rest of the engine. */
  final case class WMeanBuf(sumCents: Long, weight: Long)
  class WeightedMean extends Aggregator[(Double, Long), WMeanBuf, Double] {
    def zero: WMeanBuf = WMeanBuf(0L, 0L)
    def reduce(b: WMeanBuf, a: (Double, Long)): WMeanBuf =
      WMeanBuf(b.sumCents + math.rint(a._1 * 100).toLong * a._2, b.weight + a._2)
    def merge(x: WMeanBuf, y: WMeanBuf): WMeanBuf =
      WMeanBuf(x.sumCents + y.sumCents, x.weight + y.weight)
    def finish(b: WMeanBuf): Double =
      if (b.weight == 0) 0.0 else b.sumCents.toDouble / 100.0 / b.weight
    def bufferEncoder: Encoder[WMeanBuf] = Encoders.product[WMeanBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Bounded top-k (value, key) pairs per group — a mergeable heap buffer,
    * the shape sketches (HLL, KMV, quantile digests) share: constant-size
    * state per group regardless of group cardinality. */
  class TopK(k: Int) extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[Long]] {
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy { case (v, id) => (-v, id) }.take(k)
    def zero: Seq[(Double, Long)] = Nil
    def reduce(b: Seq[(Double, Long)], a: (Double, Long)): Seq[(Double, Long)] = trim(b :+ a)
    def merge(x: Seq[(Double, Long)], y: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(x ++ y)
    def finish(b: Seq[(Double, Long)]): Seq[Long] = b.map(_._2)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
