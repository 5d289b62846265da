package graft

/** q_sorted_neighborhood (multi-pass SNM) — what the oracle gate can't
  * express: the method's SOUNDNESS (every emitted pair is a true lev ≤ 2
  * pair, i.e. a subset of q_fuzzy_join's provably complete result) and
  * the multi-pass recall on the sf corpus. */
class SortedNeighborhoodSpec extends SparkSuite {

  private def pairs(name: String): Set[(String, String)] =
    queries.Catalog.queries(name)(spark, sfDir).collect()
      .map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"))).toSet

  test("SNM output is a subset of the complete deletion-neighborhood join") {
    val snm = pairs("q_sorted_neighborhood")
    val complete = pairs("q_fuzzy_join")
    assert(snm.nonEmpty, "no pairs found on the sf corpus")
    assert(snm.subsetOf(complete),
      s"SNM emitted pairs the complete join did not: ${snm -- complete}")
    // the documented trade-off: bounded-window recall below 100%, but the
    // two-pass union must catch a majority of the true pairs here
    assert(snm.size * 2 >= complete.size,
      s"multi-pass recall collapsed: ${snm.size}/${complete.size}")
  }

  test("emitted pairs are canonical and verified") {
    queries.Catalog.queries("q_sorted_neighborhood")(spark, sfDir)
      .collect().foreach { r =>
        assert(r.getAs[String]("name_a") < r.getAs[String]("name_b"))
        assert(r.getAs[Int]("dist") <= 2)
      }
  }
}
