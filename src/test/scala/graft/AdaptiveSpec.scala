package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** AQE runtime re-planning under induced skew: one join key carrying ~80%
  * of the rows makes its reduce partition exceed the (lowered) skew
  * threshold, and OptimizeSkewedJoin must split it into advisory-sized
  * sub-partitions at runtime — the mechanism that, at 100 TB, keeps a
  * celebrity key from serializing a sort-merge join behind one straggler
  * task. Complements q_salted_agg (manual two-level salting for
  * aggregation skew): joins get runtime splitting for free from AQE, so
  * the engine's guidance (SCALE.md §6) is salt aggregations, let AQE
  * handle join skew. */
class AdaptiveSpec extends SparkSuite {

  test("AQE splits the skewed partition of a sort-merge join at runtime") {
    val s = spark.newSession()
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1048576")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "524288")

    // ~100k rows, 80% on key 0: the skew is in the DATA, the thresholds
    // above only scale the detector down to test volume
    val left = Tables.load(s, sfDir, "events")
      .select(explode(expr("sequence(1, 100)")).as("rep"),
        col("user_id"), col("event_type"), col("props"))
      .withColumn("k",
        when(pmod(col("user_id"), lit(10)) < 8, 0L)
          .otherwise(pmod(col("user_id"), lit(10)).cast("long")))
      .repartition(8) // several map tasks, so the skewed reduce partition
                      // is splittable at mapper-block granularity
    val right = s.range(0, 10).select(col("id").as("k"),
      concat(lit("dim_"), col("id")).as("label"))

    val joined = left.hint("merge").join(right, "k")
    val consumed = joined.agg(expr("bit_xor(xxhash64(struct(*)))").as("h"))
    consumed.collect()

    val finalPlan = consumed.queryExecution.executedPlan.toString
    assert(finalPlan.contains("skew=true"),
      s"no skew-split SMJ in final adaptive plan:\n$finalPlan")
  }
}
