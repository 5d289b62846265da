package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** STORAGE-PARTITIONED JOINS over graft-tsv (`SupportsReportPartitioning`
  * + `HasPartitionKey`): two tables hive-partitioned on the same column
  * join with ZERO shuffle — Spark groups each scan's splits by their
  * typed partition keys and aligns the groups, so neither corpus moves.
  * Proves:
  *  - the join plans with no ShuffleExchange on either side and the
  *    values match the same join over the in-memory source frames;
  *  - a groupBy on the partition column also rides the reported
  *    partitioning (no exchange before the aggregate);
  *  - typed keys: a LONG partition column groups by its numeric value
  *    (HasPartitionKey rows are internal-typed, not raw path strings);
  *  - the report is gated: bucketing conf off → the same query plans
  *    shuffles and still answers identically (grouping is an
  *    optimization, never a semantics change).
  */
class Dsv2SpjSpec extends SparkSuite {

  private val schemaA = StructType(Seq(
    StructField("ida", LongType),
    StructField("va", StringType),
    StructField("k", LongType)))
  private val schemaB = StructType(Seq(
    StructField("idb", LongType),
    StructField("vb", StringType),
    StructField("k", LongType)))

  private def srcA: DataFrame = {
    spark.range(60).select(
      col("id").as("ida"),
      concat(lit("a"), col("id")).as("va"),
      (col("id") % 5).as("k"))
  }
  private def srcB: DataFrame = {
    spark.range(40).select(
      col("id").as("idb"),
      concat(lit("b"), col("id")).as("vb"),
      (col("id") % 5).as("k"))
  }

  private val root = {
    val dir = Files.createTempDirectory("graft_dsv2_spj").toFile
    dir.deleteOnExit()
    val a = new java.io.File(dir, "a").getAbsolutePath
    val b = new java.io.File(dir, "b").getAbsolutePath
    srcA.coalesce(1).write.partitionBy("k")
      .option("sep", "\t").mode("overwrite").csv(a)
    srcB.coalesce(1).write.partitionBy("k")
      .option("sep", "\t").mode("overwrite").csv(b)
    (a, b)
  }

  private def readA: DataFrame =
    spark.read.format("graft-tsv").schema(schemaA)
      .option("partition.columns", "k").load(root._1)
  private def readB: DataFrame =
    spark.read.format("graft-tsv").schema(schemaB)
      .option("partition.columns", "k").load(root._2)

  private def shuffles(p: SparkPlan): Seq[SparkPlan] = {
    def walk(q: SparkPlan): Seq[SparkPlan] = q match {
      case s: ShuffleExchangeLike => s +: q.children.flatMap(walk)
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case st: QueryStageExec => walk(st.plan)
      case other => other.children.flatMap(walk)
    }
    walk(p)
  }

  /** Run `body` with SPJ confs pinned, restoring the previous values. */
  private def withSpj[A](enabled: Boolean)(body: => A): A = {
    val keys = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> enabled.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  private def expectedJoin: Seq[String] =
    srcA.join(srcB, "k").select("k", "ida", "idb", "va", "vb")
      .collect().map(_.toString).sorted.toSeq

  test("co-partitioned equi-join plans with zero shuffle and exact values") {
    withSpj(enabled = true) {
      val q = readA.join(readB, "k").select("k", "ida", "idb", "va", "vb")
      assert(q.collect().map(_.toString).sorted.toSeq === expectedJoin)
      val sh = shuffles(q.queryExecution.executedPlan)
      assert(sh.isEmpty,
        s"expected a storage-partitioned join with no Exchange, found:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("groupBy on the partition column needs no exchange before the agg") {
    withSpj(enabled = true) {
      val q = readA.groupBy("k").agg(count(lit(1)).as("n"), sum("ida").as("s"))
      val got = q.collect().map(_.toString).sorted.toSeq
      val want = srcA.groupBy("k").agg(count(lit(1)).as("n"), sum("ida").as("s"))
        .collect().map(_.toString).sorted.toSeq
      assert(got === want)
      assert(shuffles(q.queryExecution.executedPlan).isEmpty,
        s"partition-grouped aggregate should not shuffle:\n" +
          q.queryExecution.executedPlan)
    }
  }

  test("bucketing off: same values, shuffled plan (gating, not semantics)") {
    withSpj(enabled = false) {
      val q = readA.join(readB, "k").select("k", "ida", "idb", "va", "vb")
      assert(q.collect().map(_.toString).sorted.toSeq === expectedJoin)
      assert(shuffles(q.queryExecution.executedPlan).nonEmpty,
        "without v2 bucketing the sort-merge join must shuffle both sides")
    }
  }
}
