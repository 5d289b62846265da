package graft

import graft.functions.PortableHash
import graft.queries.Catalog

/** Independent driver-side oracle for the k-means family. The DuckDB gate
  * proves Spark ≡ DuckDB, but both run the SAME declarative chain — a
  * semantic slip mirrored into the oracle SQL (assigning with stale
  * centroids, a transposed dimension index) would pass it. This spec
  * re-runs the whole algorithm in plain Scala on the collected sf0.001
  * corpus (500×64 — trivially driver-sized) and compares per-vector
  * assignments exactly, and it pins the Lloyd property the parity gate
  * cannot see: the centroid update STRICTLY improves total inertia. */
class KmeansSpec extends SparkSuite {

  private val Dim = 64
  private val MinK = 8
  private val MaxK = 64
  private val TargetCell = 64

  private def quant(x: Float): Long =
    BigDecimal(x.toDouble * 1000000d)
      .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong

  private def dist(a: Array[Long], b: Array[Long]): Long = {
    var i = 0; var s = 0L
    while (i < Dim) { val d = a(i) - b(i); s += d * d; i += 1 }
    s
  }

  /** (assignments vec_id → (cid, dist), total inertia) for one pass. */
  private def assign(vecs: Seq[(Long, Array[Long])],
      cents: Seq[(Long, Array[Long])]): Map[Long, (Long, Long)] =
    vecs.map { case (id, v) =>
      val best = cents.map { case (cid, c) => (dist(v, c), cid) }.min
      id -> (best._2, best._1)
    }.toMap

  test("q_kmeans_assign matches a plain-Scala Lloyd run; the update strictly improves inertia") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    val vecs: Seq[(Long, Array[Long])] = rows.map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(quant).toArray).toSeq
    val k = math.max(MinK, math.min(MaxK, vecs.size / TargetCell))
    val cents0 = vecs
      .sortBy { case (id, _) => (PortableHash.hash60Const(id.toString), id) }
      .take(k).zipWithIndex
      .map { case ((_, v), i) => ((i + 1).toLong, v) }
    val a0 = assign(vecs, cents0)
    val byVec = vecs.toMap
    val cents1 = a0.groupBy(_._2._1).toSeq.map { case (cid, members) =>
      val vs = members.keys.toSeq.map(byVec)
      val n = vs.size
      val cv = Array.tabulate(Dim)(d => vs.map(_(d)).sum / n) // Long /: truncated, = Spark div
      (cid, cv)
    }
    val a1 = assign(vecs, cents1)
    val inertia0 = a0.values.map(_._2).sum
    val inertia1 = a1.values.map(_._2).sum
    assert(inertia1 < inertia0,
      s"Lloyd update must strictly improve on this corpus: $inertia0 -> $inertia1")

    val got = Catalog.queries("q_kmeans_assign")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === vecs.size)
    assert(got === a1, {
      val diff = got.keys.filter(id => got(id) != a1(id)).take(5)
      s"engine assignment diverges from the driver-side run at: ${diff.toSeq.sorted}"
    })
  }

  test("q_pq_topk matches a plain-Scala PQ/ADC run end to end") {
    // same discipline as the Lloyd test above: the DuckDB gate proves
    // Spark ≡ DuckDB on the shared declarative chain; this re-runs
    // codebook training, encoding and the ADC scan independently in
    // driver-side Scala and compares every output cell.
    val (pqM, subDim, pqK, nQ, topK) = (4, 16, 16, 8, 5)
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
    val vecs: Seq[(Long, Array[Long])] = rows.map(r =>
      r.getLong(0) -> r.getSeq[Float](1).map(quant).toArray).toSeq
    def slice(v: Array[Long], s: Int): Array[Long] =
      v.slice((s - 1) * subDim, s * subDim)
    def d2(a: Array[Long], b: Array[Long]): Long = {
      var i = 0; var acc = 0L
      while (i < a.length) { val d = a(i) - b(i); acc += d * d; i += 1 }
      acc
    }
    val seeds = vecs
      .sortBy { case (id, _) => (PortableHash.hash60Const(id.toString), id) }
      .take(pqK).zipWithIndex.map { case ((_, v), i) => ((i + 1).toLong, v) }
    def nearest(cb: Seq[(Long, Array[Long])], sv: Array[Long]): Long =
      cb.map { case (cid, cv) => (d2(sv, cv), cid) }.min._2
    val cb1: Map[Int, Seq[(Long, Array[Long])]] = (1 to pqM).map { s =>
      val cb0 = seeds.map { case (cid, v) => (cid, slice(v, s)) }
      val assigned = vecs.groupBy { case (_, v) => nearest(cb0, slice(v, s)) }
      s -> assigned.toSeq.map { case (cid, members) =>
        val svs = members.map { case (_, v) => slice(v, s) }
        (cid, Array.tabulate(subDim)(d => svs.map(_(d)).sum / svs.size))
      }
    }.toMap
    val codes: Map[(Long, Int), Long] = (for {
      (id, v) <- vecs; s <- 1 to pqM
    } yield (id, s) -> nearest(cb1(s), slice(v, s))).toMap
    val want = (for ((q, qv) <- vecs if q < nQ) yield {
      val dtab = (for {
        s <- 1 to pqM; (cid, cv) <- cb1(s)
      } yield (s, cid) -> d2(slice(qv, s), cv)).toMap
      val cands = vecs.collect { case (id, _) if id != q =>
        ((1 to pqM).map(s => dtab((s, codes((id, s))))).sum, id)
      }.sorted.take(topK)
      cands.zipWithIndex.map { case ((adc, id), i) =>
        (q, (i + 1).toLong, id, adc, d2(qv, vecs.toMap.apply(id)))
      }
    }).flatten.toSet
    val got = Catalog.queries("q_pq_topk")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got === want, {
      val miss = (want -- got).take(3); val extra = (got -- want).take(3)
      s"PQ divergence: missing=$miss extra=$extra"
    })
  }

  test("q_kmeans_profile is the exact rollup of q_kmeans_assign") {
    val assigns = Catalog.queries("q_kmeans_assign")(spark, sfDir).collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2)))
    val want = assigns.groupBy(_._1).map { case (cid, g) =>
      (cid, g.length.toLong, g.map(_._2).min, g.map(_._3).sum)
    }.toSet
    val got = Catalog.queries("q_kmeans_profile")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === want)
  }
}
