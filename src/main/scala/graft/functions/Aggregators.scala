package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` surface (SURVEY.md §2.3 "UDF/UDAF" row):
  * the type-safe custom-aggregation API, used where a sketch can't be
  * decomposed into built-in aggregates. Both aggregators here keep O(k) /
  * O(1) state and merge associatively — i.e. they partial-aggregate
  * map-side like any built-in, which is the property that matters at
  * 100 TB (an Aggregator whose buffer grows with the group does not
  * scale; these don't). */
object Aggregators {

  /** k smallest distinct longs per group — a bounded k-min sketch (the
    * typed twin of the fingerprint query's sort_array(collect_set) trick;
    * mergeable, O(k) buffer). */
  final class MinK(k: Int) extends Aggregator[Long, Vector[Long], Seq[Long]] {
    require(k > 0)
    def zero: Vector[Long] = Vector.empty
    private def trim(v: Vector[Long]): Vector[Long] =
      v.distinct.sorted.take(k)
    def reduce(b: Vector[Long], x: Long): Vector[Long] =
      if (b.length < k || x < b.last) trim(b :+ x) else b
    def merge(a: Vector[Long], b: Vector[Long]): Vector[Long] = trim(a ++ b)
    def finish(b: Vector[Long]): Seq[Long] = b
    def bufferEncoder: Encoder[Vector[Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
  }

  /** Exact weighted mean with O(1) mergeable state (sum, weight). */
  final case class WPoint(value: Double, weight: Double)
  final case class WBuf(sum: Double, w: Double)
  object WeightedMean extends Aggregator[WPoint, WBuf, Double] {
    def zero: WBuf = WBuf(0.0, 0.0)
    def reduce(b: WBuf, p: WPoint): WBuf =
      WBuf(b.sum + p.value * p.weight, b.w + p.weight)
    def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.sum + b.sum, a.w + b.w)
    def finish(b: WBuf): Double = if (b.w == 0.0) Double.NaN else b.sum / b.w
    def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
