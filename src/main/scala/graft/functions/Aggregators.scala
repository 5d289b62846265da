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

  /** Misra–Gries heavy-hitter summary: bounded k-entry frequency sketch.
    *
    * Buffer holds at most k (word, count) entries plus the total item
    * count n. Guarantee (stream + merge, order-independent): every item
    * with true frequency > n/(k+1) is present in the final summary, and
    * each kept count undercounts by at most n/(k+1). The candidate SET
    * depends on partition order, so callers must re-count candidates
    * exactly (one broadcast-semi-joined pass) before ranking — the final
    * top-k is then exact and deterministic whenever the true k-th count
    * exceeds n/(k+1) (HeavyHittersSpec asserts this margin on the corpus).
    *
    * Scale shape: partial buffers are O(k) regardless of group size, so
    * the map-side combine ships ≤ k rows per partition — the whole point
    * vs. a full groupBy at 100 TB where the vocabulary itself is large. */
  final case class MGBuf(n: Long, counts: Map[String, Long])
  final case class MGSummary(n: Long, words: Seq[String])
  final class MisraGries(k: Int)
      extends Aggregator[String, MGBuf, MGSummary] {
    require(k > 0)
    def zero: MGBuf = MGBuf(0L, Map.empty)
    def reduce(b: MGBuf, w: String): MGBuf = {
      val c = b.counts
      c.get(w) match {
        case Some(n) => MGBuf(b.n + 1, c.updated(w, n + 1))
        case None if c.size < k => MGBuf(b.n + 1, c.updated(w, 1L))
        case None =>
          // classic MG step: the new item and one unit of every tracked
          // item annihilate; entries hitting zero drop out
          MGBuf(b.n + 1, c.flatMap { case (kw, n) =>
            if (n > 1) Some(kw -> (n - 1)) else None })
      }
    }
    def merge(a: MGBuf, b: MGBuf): MGBuf = {
      val summed = b.counts.foldLeft(a.counts) { case (acc, (w, n)) =>
        acc.updated(w, acc.getOrElse(w, 0L) + n)
      }
      val trimmed =
        if (summed.size <= k) summed
        else {
          // subtract the (k+1)-th largest count from everything — the
          // merge analog of the decrement step; keeps ≤ k entries and
          // preserves the n/(k+1) undercount bound
          val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
          summed.flatMap { case (w, n) =>
            if (n > cut) Some(w -> (n - cut)) else None }
        }
      MGBuf(a.n + b.n, trimmed)
    }
    def finish(b: MGBuf): MGSummary =
      MGSummary(b.n, b.counts.keys.toSeq.sorted)
    def bufferEncoder: Encoder[MGBuf] = ExpressionEncoder()
    def outputEncoder: Encoder[MGSummary] = ExpressionEncoder()
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
