package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup
import graft.sources.Tables

/** Pins the per-doc shingle-set guard (VERDICT r08 item 5): a pathological
  * multi-GB document must degrade to a bounded min-hash sample with visible
  * `n_truncated` accounting, never blow a single aggregation row — and the
  * cap must be provably inert on the real corpus so oracle parity holds. */
class ShingleCapSpec extends SparkSuite {

  test("cappedShingleSets: oversized doc is sliced to the cap with accounting") {
    val s = spark
    import s.implicits._
    val over = Dedup.MaxShinglesPerDoc + 37
    val dshp = s.range(over).select(lit(1L).as("doc_id"), col("id").as("hp"))
      .union(s.range(10).select(lit(2L).as("doc_id"), col("id").as("hp")))
    val out = Dedup.cappedShingleSets(dshp)
      .select("doc_id", "hs", "n_truncated")
      .collect().map(r => r.getLong(0) -> r).toMap
    val big = out(1L)
    assert(big.getSeq[Long](1).size == Dedup.MaxShinglesPerDoc,
      "oversized doc must be sliced to exactly the cap")
    assert(big.getLong(2) == 37L, "n_truncated must count the dropped tail")
    // ascending slice keeps the SMALLEST hashes — the min-hash-relevant end
    assert(big.getSeq[Long](1).head == 0L &&
      big.getSeq[Long](1).last == Dedup.MaxShinglesPerDoc - 1L)
    val small = out(2L)
    assert(small.getSeq[Long](1).size == 10 && small.getLong(2) == 0L,
      "in-bounds doc must pass through with n_truncated = 0")
  }

  test("banded-Hamming bucket cap: binds on a degenerate bucket, inert on the corpus") {
    val s = spark
    import s.implicits._
    // degenerate corpus: SimPairCap + 50 docs with the SAME fingerprint
    // band — engine semantics (slice(sort_array(collect_list), 1, cap))
    // must keep the first cap members by id, so the pair expansion is
    // cap·(cap−1)/2, never O(k²) of the full bucket
    val n = Dedup.SimPairCap + 50
    val docs = s.range(n).select(col("id").as("doc_id"), lit(0L).as("bits"))
    val capped = docs.groupBy("bits")
      .agg(expr(s"slice(sort_array(collect_list(doc_id)), 1, ${Dedup.SimPairCap})")
        .as("docs"))
      .select(size(col("docs")).as("k"),
        expr("element_at(docs, 1)").as("first"),
        expr("element_at(docs, -1)").as("last"))
      .head()
    assert(capped.getInt(0) == Dedup.SimPairCap, "bucket sliced to the cap")
    assert(capped.getLong(1) == 0L &&
      capped.getLong(2) == Dedup.SimPairCap - 1L,
      "deterministic first-N-by-id — the oracle's QUALIFY order")
    // inert on the real corpus: the largest (band, bits) bucket of the
    // ACTUAL simhash banding stays far under the cap, so the capped
    // engine result ≡ uncapped and oracle parity is unaffected
    val sim = queries.Catalog.queries("q_simhash")(spark, sfDir)
    val maxBucket = sim.select(col("doc_id"),
        explode(array((0 until 4).map { i =>
          struct(lit(i).as("band"),
            shiftright(col("simhash"), i * 15)
              .bitwiseAND(lit((1L << 15) - 1)).as("bits"))
        }: _*)).as("bb"))
      .groupBy("bb").agg(count(lit(1)).as("k"))
      .agg(max(col("k"))).head().getLong(0)
    assert(maxBucket < Dedup.SimPairCap,
      s"largest simhash band bucket $maxBucket reached SimPairCap " +
        s"${Dedup.SimPairCap}; q_simhash_pairs truncation is now live — " +
        "re-verify oracle parity")
  }

  test("cap is inert on the real corpus (shingle count is doc-length-bounded)") {
    // one char-shingle per character position, so |shingles| ≤ length(text);
    // if this ever fails the corpus changed shape and the catalog queries'
    // oracle parity under the cap needs re-verification.
    val maxLen = Tables.load(spark, sfDir, "documents")
      .agg(max(length(col("text")))).head().getInt(0)
    assert(maxLen < Dedup.MaxShinglesPerDoc,
      s"corpus max doc length $maxLen reached the shingle cap " +
        s"${Dedup.MaxShinglesPerDoc}; q_jaccard_pairs truncation is now live")
  }
}
