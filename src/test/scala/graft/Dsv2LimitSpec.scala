package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** LIMIT pushdown on graft-tsv: planning truncates the file list using
  * the manifest's writer row counts, so `LIMIT n` over a many-file table
  * schedules only enough leading files to cover n rows. Proves:
  *  - the planned InputPartition count drops to the covering prefix and
  *    the query still answers exactly n rows;
  *  - decline conditions: a pushed filter, or a manifest-less plain
  *    directory, keep the full plan (truncation may only ever
  *    over-plan, never under-plan);
  *  - correctness composes: limit + order-insensitive count. */
class Dsv2LimitSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  // one generation with 6 part files of 10 rows each
  private val out = {
    val dir = Files.createTempDirectory("graft_limit").toString + "/t"
    spark.range(60).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(6, col("id"))
      .write.format("graft-tsv").mode("append").save(dir)
    dir
  }

  private def read(): DataFrame =
    spark.read.format("graft-tsv").schema(schema).load(out)

  private def scanOf(df: DataFrame): BatchScanExec = {
    def find(p: SparkPlan): Option[BatchScanExec] = p match {
      case b: BatchScanExec => Some(b)
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case other => other.children.iterator.flatMap(find(_).iterator).nextOption()
    }
    find(df.queryExecution.executedPlan).getOrElse(fail("no BatchScanExec"))
  }

  test("LIMIT plans only the covering file prefix") {
    assert(scanOf(read()).inputPartitions.length == 6, "fixture: 6 part files")
    val q = read().limit(15)
    assert(q.collect().length == 15)
    val planned = scanOf(q).inputPartitions.length
    assert(planned == 2, s"15 rows / 10-row files: expected 2 planned, got $planned")
    assert(scanOf(q).toString.contains("PushedLimit: 15"))
    // a limit above the table plans everything and answers everything
    val all = read().limit(100)
    assert(all.collect().length == 60)
    assert(scanOf(all).inputPartitions.length == 6)
  }

  test("a pushed filter declines truncation (rows may not match)") {
    // id >= 55 stat-prunes to the LAST file; row-count truncation of the
    // (unfiltered) leading files would instead plan the FIRST file and
    // answer zero matching rows — so the guard must hand the filtered
    // plan through untouched
    val q = read().filter(col("id") >= 55).limit(3)
    assert(q.collect().map(_.getLong(0)).toSet.subsetOf((55L until 60L).toSet))
    assert(q.collect().length == 3)
    val baseline = scanOf(read().filter(col("id") >= 55)).inputPartitions.length
    assert(scanOf(q).inputPartitions.length == baseline,
      "filtered limit must plan exactly what the filter alone plans")
    assert(baseline == 1, "fixture: range-sorted files stat-prune to one")
  }

  test("a manifest-less plain directory declines truncation") {
    val plain = Files.createTempDirectory("graft_limit_plain").toString
    (0 until 3).foreach { i =>
      val w = new java.io.PrintWriter(new java.io.File(plain, f"f-$i.tsv"), "UTF-8")
      (i * 10 until (i + 1) * 10).foreach(j => w.println(s"$j\tv$j"))
      w.close()
    }
    val q = spark.read.format("graft-tsv").schema(schema).load(plain).limit(5)
    assert(q.collect().length == 5)
    assert(scanOf(q).inputPartitions.length == 3,
      "no row counts → no provenance → full plan")
  }
}
