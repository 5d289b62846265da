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

  /** Mergeable approximate-quantile sketch: a KLL-style compactor chain
    * with a uniform per-level capacity k (the KLL structure with the
    * level-capacity schedule flattened, and DETERMINISTIC alternating
    * compaction instead of coin flips — reproducibility is worth more
    * than the constant-factor space the randomized schedule saves).
    *
    * Structure: level h holds items of weight 2^h. New items enter level
    * 0; when a level exceeds k items it is sorted and every other item
    * (alternating offset per level, the classic derandomization) is
    * promoted to level h+1 — two weight-2^h items become one weight-
    * 2^(h+1) item, so TOTAL WEIGHT is preserved exactly (an odd item is
    * held back at its level). A quantile query walks the weight-sorted
    * item multiset to the p·n rank.
    *
    * Guarantees (KllQuantilesSpec pins both on real + adversarial data):
    *  - state is O(k·log(n/k)) regardless of group size, and `merge` is
    *    level-wise concatenation + the same compaction — i.e. it partial-
    *    aggregates map-side like a built-in, the property q_percentiles'
    *    exact sort can never have at 100 TB;
    *  - each level-h compaction perturbs any rank by ≤ 2^h, and level h
    *    compacts ≤ n/(k·2^h) times, so worst-case rank error is
    *    ≤ Σ_h n/k = H·n/k ≈ (n/k)·log₂(n/k) — k=512 keeps it under 2%
    *    at 60k rows and the spec asserts ≤ 5% with merge-order shuffling.
    *
    * This is the sketch a 100 TB profile pass wants next to [[MisraGries]]:
    * q_percentiles stays exact under the oracle gate; q_approx_quantiles
    * runs this (rows-only, values spec-pinned) as the scale path. */
  final case class KllBuf(
      levels: Seq[Seq[Double]], compactions: Seq[Long], n: Long)
  final class KllQuantiles(k: Int, ps: Seq[Double])
      extends Aggregator[Double, KllBuf, Seq[Double]] {
    require(k >= 8 && ps.nonEmpty && ps.forall(p => p >= 0.0 && p <= 1.0))

    def zero: KllBuf = KllBuf(Vector(Vector.empty), Vector(0L), 0L)

    /** Compact level h in-place if over capacity; returns the new buffer.
      * Promotion can overflow level h+1, so callers loop to fixpoint. */
    private def compactLevel(b: KllBuf, h: Int): KllBuf = {
      val sorted = b.levels(h).sorted
      // hold one item back when odd so 2·2^h → 2^(h+1) preserves weight
      val (held, pairs) =
        if (sorted.length % 2 == 0) (Vector.empty[Double], sorted)
        else (Vector(sorted.head), sorted.tail)
      val offset = (b.compactions(h) % 2).toInt
      val promoted = (offset until pairs.length by 2).map(pairs)
      val levels =
        if (h + 1 < b.levels.length) b.levels
        else b.levels :+ Vector.empty[Double]
      val comps =
        if (h + 1 < b.compactions.length) b.compactions
        else b.compactions :+ 0L
      KllBuf(
        levels.updated(h, held).updated(h + 1, levels(h + 1) ++ promoted),
        comps.updated(h, comps(h) + 1), b.n)
    }

    private def compactAll(b0: KllBuf): KllBuf = {
      var b = b0
      var h = 0
      while (h < b.levels.length) {
        if (b.levels(h).length > k) b = compactLevel(b, h)
        else h += 1 // a compaction may overflow h+1; re-check from there
      }
      b
    }

    def reduce(b: KllBuf, x: Double): KllBuf =
      compactAll(KllBuf(b.levels.updated(0, b.levels(0) :+ x),
        b.compactions, b.n + 1))

    def merge(a: KllBuf, b: KllBuf): KllBuf = {
      val hs = a.levels.length max b.levels.length
      val levels = (0 until hs).map { h =>
        a.levels.applyOrElse(h, (_: Int) => Seq.empty[Double]) ++
          b.levels.applyOrElse(h, (_: Int) => Seq.empty[Double])
      }
      val comps = (0 until hs).map { h =>
        a.compactions.applyOrElse(h, (_: Int) => 0L) +
          b.compactions.applyOrElse(h, (_: Int) => 0L)
      }
      compactAll(KllBuf(levels, comps, a.n + b.n))
    }

    def finish(b: KllBuf): Seq[Double] = {
      if (b.n == 0L) return ps.map(_ => Double.NaN)
      val weighted = b.levels.iterator.zipWithIndex.flatMap { case (items, h) =>
        items.iterator.map(v => (v, 1L << h))
      }.toArray.sortBy(_._1)
      val total = weighted.iterator.map(_._2).sum
      ps.map { p =>
        val target = math.max(1L, math.ceil(p * total).toLong)
        var cum = 0L
        var i = 0
        while (i < weighted.length && cum + weighted(i)._2 < target) {
          cum += weighted(i)._2; i += 1
        }
        weighted(math.min(i, weighted.length - 1))._1
      }
    }

    def bufferEncoder: Encoder[KllBuf] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[Double]] = ExpressionEncoder()
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
