package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Runtime (Bloom) filter join pruning — the shuffle-join complement to
  * q_dpp_prune's partition pruning: when a selective dimension predicate
  * feeds a SHUFFLE join, Catalyst builds a Bloom filter over the dim's
  * join keys (`bloom_filter_agg`) and injects `might_contain` as a fact-
  * side pre-shuffle filter, so non-matching fact rows drop BEFORE the
  * exchange instead of after the join. At 100 TB this is the difference
  * between shuffling the whole fact table and shuffling the ~matching
  * slice whenever the dim predicate is selective but the join is too big
  * to broadcast.
  *
  * The injection thresholds are sized for clusters (application side
  * ≥ 10 GB by default), so this is a spec-only exhibit in the RobustnessSpec
  * style: thresholds are lowered to fire on the test corpus, and results
  * are asserted identical with the filter on and off (a Bloom filter may
  * only drop non-matching rows — false positives are re-checked by the
  * join, so values never change). Complements SourcesSpec's plan-shape
  * check with the end-to-end invariance proof. */
class RuntimeFilterSpec extends SparkSuite {

  private def revenueByBrand() = {
    val li = Tables.load(spark, sfDir, "lineitem")
    // selective NON-key predicate on the dim: the classic runtime-filter
    // trigger shape (the fact knows nothing about p_size)
    val dim = Tables.load(spark, sfDir, "part").filter(col("p_size") === 1)
    li.hint("merge").join(dim, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double").as("qty"))
      .orderBy("p_brand")
  }

  private def withConfs[A](kvs: (String, String)*)(f: => A): A = {
    val saved = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("selective dim predicate injects a bloom might_contain on the fact side") {
    withConfs(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // cluster-sized gates, scaled to the test corpus: any fact scan
      // qualifies, dim must still be under the creation threshold
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val q = revenueByBrand()
      val p = q.queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"expected an injected bloom runtime filter on the fact side:\n$p")
      assert(p.contains("bloom_filter_agg"),
        s"expected the dim-side bloom filter build:\n$p")
      val filtered = q.collect()
      val plain = withConfs(
        "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val q0 = revenueByBrand()
        assert(!q0.queryExecution.executedPlan.toString.contains("might_contain"))
        q0.collect()
      }
      assert(filtered.map(_.toString).toSeq === plain.map(_.toString).toSeq,
        "a runtime filter must never change results")
    }
  }
}
