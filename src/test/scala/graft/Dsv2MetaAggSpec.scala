package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LocalTableScanExec
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** METADATA-COMPLETE aggregate pushdown on graft-tsv: a filterless global
  * COUNT(*) / MIN / MAX is answered from the generation manifest's
  * writer-recorded row counts and column ranges — the scan plans as a
  * driver-local one-row LocalTableScan and NO distributed job runs.
  * Proves:
  *  - values match a full-scan computation (count + min/max over longs,
  *    doubles, strings, and a column with nulls, in one SELECT);
  *  - the physical plan contains a LocalTableScanExec and no
  *    BatchScanExec (the no-job property, asserted structurally);
  *  - all-null columns answer NULL (absent cells contribute nothing);
  *  - fallbacks: a WHERE clause, a grouped aggregate, and a plain
  *    directory without manifests all take the normal scan and still
  *    answer correctly (metadata path licensed to decline, never to be
  *    wrong);
  *  - time travel composes: VERSION AS OF answers the PINNED
  *    generation's metadata, not the current one. */
class Dsv2MetaAggSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("price", DoubleType),
    StructField("name", StringType),
    StructField("maybe", StringType)))

  private def src: DataFrame = {
    spark.range(100).select(
      col("id"),
      (col("id") * 1.5 - 20.0).as("price"),
      concat(lit("n"), lpad(col("id").cast("string"), 3, "0")).as("name"),
      when(col("id") % 2 === 0, concat(lit("m"), col("id"))).as("maybe"))
  }

  private val out = {
    val dir = Files.createTempDirectory("graft_metaagg").toString + "/t"
    src.coalesce(2).write.format("graft-tsv").mode("append").save(dir)
    dir
  }

  private def read(): DataFrame =
    spark.read.format("graft-tsv").schema(schema).load(out)

  private def plans(df: DataFrame): (Seq[LocalTableScanExec], Seq[SparkPlan]) = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case q: QueryStageExec => walk(q.plan)
      case other => other +: other.children.flatMap(walk)
    }
    val all = walk(df.queryExecution.executedPlan)
    (all.collect { case l: LocalTableScanExec => l },
      all.filter(_.getClass.getSimpleName == "BatchScanExec"))
  }

  test("filterless count/min/max answers from the manifest as a LocalTableScan") {
    val q = read().agg(
      count(lit(1)).as("n"), min("id").as("min_id"), max("id").as("max_id"),
      min("price").as("min_p"), max("price").as("max_p"),
      min("name").as("min_s"), max("name").as("max_s"),
      max("maybe").as("max_m"))
    val r = q.collect().head
    assert(r.getLong(0) == 100L && r.getLong(1) == 0L && r.getLong(2) == 99L)
    assert(r.getDouble(3) == -20.0 && r.getDouble(4) == 128.5)
    assert(r.getString(5) == "n000" && r.getString(6) == "n099")
    assert(r.getString(7) == "m98", "nullable column: max over non-nulls")
    val (local, batch) = plans(q)
    assert(local.nonEmpty && batch.isEmpty,
      s"expected a metadata-only LocalTableScan plan:\n${q.queryExecution.executedPlan}")
  }

  test("an all-null column answers NULL metadata-only") {
    val dir = Files.createTempDirectory("graft_metaagg_null").toString + "/t"
    spark.range(5).select(col("id"), lit(null).cast("string").as("maybe"))
      .coalesce(1).write.format("graft-tsv").mode("append").save(dir)
    val s2 = StructType(Seq(
      StructField("id", LongType), StructField("maybe", StringType)))
    val q = spark.read.format("graft-tsv").schema(s2).load(dir)
      .agg(min("maybe").as("mn"), count(lit(1)).as("n"))
    val r = q.collect().head
    assert(r.isNullAt(0) && r.getLong(1) == 5L)
    val (local, batch) = plans(q)
    assert(local.nonEmpty && batch.isEmpty)
  }

  test("filters, group-bys, and manifest-less dirs fall back to the real scan") {
    val filtered = read().filter(col("id") >= 50).agg(count(lit(1)).as("n"))
    assert(filtered.collect().head.getLong(0) == 50L)
    assert(plans(filtered)._1.isEmpty, "a WHERE must disable the metadata path")

    val grouped = read().groupBy(col("id") % 10).agg(max("id")).orderBy("(id % 10)")
    assert(grouped.collect().length == 10)
    assert(plans(grouped)._1.isEmpty, "a GROUP BY must disable the metadata path")

    // plain directory (no _gen manifest): no provenance, full-scan answer
    val plain = Files.createTempDirectory("graft_metaagg_plain").toString
    val line = "1\t2.0\ta\tb\n3\t4.0\tc\td\n"
    Files.write(java.nio.file.Paths.get(plain, "data.tsv"), line.getBytes)
    val q = spark.read.format("graft-tsv").schema(schema).load(plain)
      .agg(count(lit(1)).as("n"), max("id").as("mx"))
    val r = q.collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 3L)
    assert(plans(q)._1.isEmpty, "no manifest row counts → no metadata answer")
  }

  test("GROUP BY a partition column answers metadata-only, per hive leaf") {
    val dir = Files.createTempDirectory("graft_metaagg_grp").toString + "/t"
    spark.range(60).select(
      col("id"), (col("id") % 3).as("k"),
      concat(lit("g"), col("id") % 2).as("grp"))
      .coalesce(1).write.format("graft-tsv").mode("append")
      .option("partition.columns", "grp").save(dir)
    val s2 = StructType(Seq(
      StructField("id", LongType), StructField("k", LongType),
      StructField("grp", StringType)))
    val rd = spark.read.format("graft-tsv").schema(s2)
      .option("partition.columns", "grp").load(dir)
    val q = rd.groupBy("grp")
      .agg(count(lit(1)).as("n"), min("id").as("mn"), max("id").as("mx"))
      .orderBy("grp")
    val rows = q.collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(rows == Seq(("g0", 30L, 0L, 58L), ("g1", 30L, 1L, 59L)))
    val (local, batch) = plans(q)
    assert(local.nonEmpty && batch.isEmpty,
      s"partition-grouped agg should be metadata-only:\n${q.queryExecution.executedPlan}")

    // grouping by a NON-partition column must fall back to the real scan
    val byK = rd.groupBy("k").agg(count(lit(1)).as("n")).orderBy("k")
    assert(byK.collect().map(_.getLong(1)).toSeq == Seq(20L, 20L, 20L))
    assert(plans(byK)._1.isEmpty,
      "a data-column GROUP BY cannot be answered from the manifest")
  }

  test("time travel composes: the pinned generation's metadata answers") {
    val dir = Files.createTempDirectory("graft_metaagg_tt").toString + "/t"
    val s2 = StructType(Seq(StructField("id", LongType)))
    def w(lo: Int, hi: Int) = spark.range(lo, hi).select(col("id"))
      .coalesce(1).write.format("graft-tsv").mode("append")
      .option("retain.generations", "2").save(dir)
    w(0, 10)   // gen 1
    w(10, 30)  // gen 2
    val pinned = spark.read.format("graft-tsv").schema(s2)
      .option("generation", "1").load(dir)
      .agg(count(lit(1)).as("n"), max("id").as("mx"))
    val r = pinned.collect().head
    assert(r.getLong(0) == 10L && r.getLong(1) == 9L)
    val (local, batch) = plans(pinned)
    assert(local.nonEmpty && batch.isEmpty,
      "a pinned generation's manifest is just as metadata-complete")
  }
}
