package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{DataFrame, Dataset, SparkSession}

/** The one org.apache.spark.sql-package shim in this library: wrapping a
  * custom LogicalPlan into a DataFrame needs `Dataset.ofRows`, whose
  * enclosing object is private[sql] in Spark 4 — the standard extension
  * seam used by Spark connector/extension libraries. The other two
  * members are measurement/stability shims (checkpoint-stat saturation,
  * listener-bus flush for exact per-query metric attribution); no query
  * SEMANTICS depend on anything here beyond ofRows. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark, plan)

  /** Block until every queued listener event is dispatched. The bench
    * harness attributes shuffle-write bytes per query through a
    * SparkListener; stage-completed events drain asynchronously after the
    * collecting action returns, so without a flush the tail of query N's
    * bytes lands in query N+1's tally (ScaleStress previously
    * poll-stabilized with 100 ms sleeps — exact and slower). */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()

  /** Saturate a checkpointed frame's carried size estimate at
    * Long.MaxValue.
    *
    * `localCheckpoint`/`checkpoint` copy the origin plan's ESTIMATED
    * statistics onto the LogicalRDD (so small checkpointed frames stay
    * auto-broadcastable). In an iterative loop whose per-round plan joins
    * round N−1's checkpoint, those estimates COMPOUND multiplicatively —
    * SizeInBytesOnlyStatsPlanVisitor multiplies sizes across joins, the
    * product becomes the next round's carried stat, and by round ~20 the
    * driver is grinding ToomCook multiplications on million-bit BigInts
    * at every plan (observed: q_pagerank_converged frozen in
    * LogicalPlanStats with 100% driver CPU). Capping at Long.MaxValue is
    * lossless for every decision Spark makes with the number — any
    * estimate past ~9.2 EB already means "never broadcast, never
    * reorder toward" — and bounds the bit-length a loop can feed back
    * into itself. Frames whose estimates are below the cap are returned
    * untouched, so no existing plan changes. */
  def capCheckpointStats(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.catalyst.plans.logical.Statistics
    import org.apache.spark.sql.execution.LogicalRDD
    val cap = BigInt(Long.MaxValue)
    df.queryExecution.logical match {
      case l: LogicalRDD =>
        val s = l.computeStats()
        if (s.sizeInBytes <= cap && s.rowCount.forall(_ <= cap)) df
        else {
          val spark = df.sparkSession
          val capped = Statistics(
            sizeInBytes = s.sizeInBytes.min(cap),
            rowCount = s.rowCount.map(_.min(cap)))
          Dataset.ofRows(spark,
            new LogicalRDD(l.output, l.rdd, l.outputPartitioning,
              l.outputOrdering, l.isStreaming, l.stream)(
              spark, Some(capped), None))
        }
      case _ => df
    }
  }
}
