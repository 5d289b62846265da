package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.queries.Catalog

/** Heavy hitters (q_heavy_hitters): the Misra–Gries sketch-prune + exact
  * recount two-pass. The final result is exact — these tests pin the
  * guarantee that makes it so, and the merge algebra of the sketch. */
class HeavyHittersSpec extends SparkSuite {

  private val K = 2048

  test("MG guarantee margin: true 20th token count clears n/(k+1) on the corpus") {
    val toks = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "")
    val n = toks.count()
    val kth = toks.groupBy("w").count()
      .orderBy(desc("count"), desc("w")).limit(20)
      .agg(min("count")).head.getLong(0)
    val bound = n.toDouble / (K + 1)
    // ≥4× margin: every true top-20 word is guaranteed a candidate, so
    // the exact recount ranks the same 20 rows as a full groupBy
    assert(kth >= 4 * bound,
      s"20th count $kth vs MG bound $bound — shrink k or the guarantee is thin")
  }

  test("MG summary is a superset of every word above the guarantee threshold") {
    val agg = new Aggregators.MisraGries(8)
    val stream = Seq.fill(40)("hot") ++ (1 to 200).map(i => s"w$i") ++ Seq.fill(30)("warm")
    // split arbitrarily, reduce each half, merge — order-independent superset
    val (l, r) = stream.splitAt(97)
    val bufL = l.foldLeft(agg.zero)(agg.reduce)
    val bufR = r.foldLeft(agg.zero)(agg.reduce)
    for (merged <- Seq(agg.merge(bufL, bufR), agg.merge(bufR, bufL))) {
      val out = agg.finish(merged)
      assert(out.n == stream.length)
      val threshold = stream.length.toDouble / (8 + 1)
      val trueCounts = stream.groupBy(identity).view.mapValues(_.size)
      val mustKeep = trueCounts.filter(_._2 > threshold).keys.toSet
      assert(mustKeep.subsetOf(out.words.toSet),
        s"missing guaranteed hitters: ${mustKeep -- out.words.toSet}")
      assert(merged.counts.size <= 8)
    }
  }

  test("property: MG superset guarantee holds for random streams, splits, and k") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    // mixed-skew streams: a few hot ids + a long distinct tail
    val genStream: Gen[List[String]] = for {
      n <- Gen.choose(0, 400)
      ws <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0, 5), Gen.choose(0, 200)))
    } yield ws.map(i => s"w$i")
    def sample[A](g: Gen[A], seed: Long): A =
      g.pureApply(Gen.Parameters.default, Seed(seed))
    (1L to 40L).foreach { seed =>
      val stream = sample(genStream, seed)
      val k = 1 + (seed % 16).toInt
      val cut = sample(Gen.choose(0, stream.length max 1), seed + 1000)
      val agg = new Aggregators.MisraGries(k)
      val (l, r) = stream.splitAt(cut)
      val out = agg.finish(agg.merge(
        l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce)))
      val threshold = stream.length.toDouble / (k + 1)
      val mustKeep = stream.groupBy(identity)
        .collect { case (w, os) if os.size > threshold => w }.toSet
      assert(out.n == stream.length, s"seed=$seed")
      assert(mustKeep.subsetOf(out.words.toSet),
        s"seed=$seed k=$k missing=${mustKeep -- out.words.toSet}")
      assert(out.words.size <= k, s"seed=$seed buffer exceeded k")
    }
  }

  test("q_heavy_hitters equals the exact full groupBy top-20") {
    val got = Catalog.queries("q_heavy_hitters")(spark, sfDir).collect()
    val exact = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word").agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), desc("word")).limit(20).collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ==
      exact.map(r => (r.getString(0), r.getLong(1))).toSeq)
  }

  test("q_upsert applies update/delete/insert row counts exactly") {
    val base = spark.read.parquet(s"$sfDir/orders.parquet")
    val nBase = base.count()
    val nUpd = base.filter(col("o_orderkey") % 97 === 0).count()
    val nDel = base.filter(col("o_orderkey") % 97 === 1).count()
    val nIns = base.filter(col("o_orderkey") % 97 === 2).count()
    val out = Catalog.queries("q_upsert")(spark, sfDir)
    assert(out.count() == nBase - nDel + nIns)
    val outUpd = out.filter(col("o_orderstatus") === "X")
    assert(outUpd.count() == nUpd)
    assert(out.filter(col("o_orderkey") >= 100000000L).count() == nIns)
  }
}
