package graft

/** Automated physical-plan guard for EVERY catalog query: no accidental
  * cartesian products, and nested-loop joins only where the operator's
  * semantics require one (tiny broadcast build sides). A regression that
  * turns an equi-join into a cross product at 100 TB is fatal — this
  * catches it at plan-build time, before any driver round. */
class PlanAuditSpec extends SparkSuite {

  /** Queries whose plans legitimately contain BroadcastNestedLoopJoin:
    * range join (5-row range dim) and cosine top-k (broadcast query set,
    * non-equi self-exclusion predicate). */
  private val bnljAllowed = Set("q_range_join", "q_cosine_topk")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name plan has no cartesian product / unexpected nested loop") {
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a CartesianProduct:\n$plan")
      if (!bnljAllowed(name)) {
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name plans an unexpected BroadcastNestedLoopJoin:\n$plan")
      }
    }
  }
}
