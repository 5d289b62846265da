package graft

import org.apache.spark.sql.functions._

/** The multi-probe banded-Hamming kernel (2×32-bit bands, 1-bit probes
  * on one join side) vs the 4×16-bit exact-band kernel: BOTH guarantee
  * exact recall to Hamming radius 3 by pigeonhole, so over the same
  * fingerprint frame their candidate sets restricted to hamming ≤ 3 must
  * be IDENTICAL (the caps don't bind at spec SF — asserted). Beyond the
  * radius the kernels legitimately surface different best-effort pairs;
  * the spec also records that the multi-probe kernel's raw candidate
  * volume is no larger than the exact-band kernel's on this corpus (the
  * §46 collision-collapse claim at spec scale).
  */
class MultiprobeHammingSpec extends SparkSuite {

  test("multiprobe kernel: radius-3 recall identical to the 4-band kernel") {
    val fp = graft.operators.MultimodalOps.framePerceptualHash(
        graft.operators.MultimodalOps.documentsAsMedia(spark, sfDir), 4)
      .toDF()
      .select((col("media_id") * 16 + col("frame_idx")).as("media_id"),
        col("b0"), col("b1"), col("b2"), col("b3"))
      .localCheckpoint(true)
    def norm(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
      df.collect().map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        (math.min(a, b), math.max(a, b), r.getLong(2))
      }.toSet
    val exact = norm(queries.Catalog.bandedHammingOver(fp)
      .filter(col("hamming") <= 3))
    val probe = norm(queries.Catalog
      .bandedHammingMultiprobe(fp, queries.Dedup.SimPairCap)
      .filter(col("hamming") <= 3))
    assert(probe == exact,
      s"radius-3 candidate sets diverged: only-exact=" +
        s"${(exact -- probe).take(5)}, only-probe=${(probe -- exact).take(5)}")
    val nExact = queries.Catalog.bandedHammingOver(fp).count()
    val nProbe = queries.Catalog
      .bandedHammingMultiprobe(fp, queries.Dedup.SimPairCap).count()
    assert(nProbe <= nExact,
      s"multiprobe surfaced MORE raw candidates ($nProbe) than the " +
        s"exact 4-band kernel ($nExact) — the collision collapse inverted")
  }
}
