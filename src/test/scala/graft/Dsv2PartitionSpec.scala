package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hive-partitioned reads of the graft-tsv connector: `col=value`
  * directory layout with the partition values carved from the PATH, not
  * the lines. Proves:
  *  - values round-trip (partition columns reconstructed per row, data
  *    columns line-parsed with positions remapped past them);
  *  - STATIC pruning: a pushed predicate on a partition column drops
  *    whole files at planning — measured by linesRead, not inferred;
  *  - RUNTIME pruning: a join's realized key set prunes SPLITS on the
  *    re-plan, so only matching partitions' bytes are read at all —
  *    the I/O-level payoff of SupportsRuntimeV2Filtering;
  *  - escaped partition values decode (Hive %XX escaping);
  *  - a malformed layout fails loudly instead of silently reading
  *    half a table.
  */
class Dsv2PartitionSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType),
    StructField("day", StringType),
    StructField("grp", StringType)))

  // 120 rows across 3 days × 4 groups, written by Spark's own
  // partitioned csv writer (tab-separated = the connector's framing)
  private val root = {
    val dir = Files.createTempDirectory("graft_dsv2_part").toFile
    dir.deleteOnExit()
    val out = new java.io.File(dir, "t").getAbsolutePath
    src().coalesce(1).write.partitionBy("day", "grp")
      .option("sep", "\t").mode("overwrite").csv(out)
    out
  }

  private def src(): DataFrame = {
    import spark.implicits._
    spark.range(120).select(
      col("id"),
      concat(lit("v"), col("id")).as("v"),
      concat(lit("2024-01-0"), (col("id") % 3 + 1)).as("day"),
      concat(lit("g"), (col("id") % 4)).as("grp"))
  }

  private def read(): DataFrame =
    spark.read.format("graft-tsv").schema(schema)
      .option("partition.columns", "day,grp").load(root)

  private def scanOf(df: DataFrame) = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
    def find(p: SparkPlan): Option[BatchScanExec] = p match {
      case b: BatchScanExec => Some(b)
      case a: AdaptiveSparkPlanExec => find(a.executedPlan)
      case q: QueryStageExec => find(q.plan)
      case other => other.children.iterator.flatMap(find(_).iterator).nextOption()
    }
    find(df.queryExecution.executedPlan).getOrElse(fail("no BatchScanExec"))
  }

  test("partition values are reconstructed per row; data columns remap past them") {
    val back = read().collect().map(_.toString).sorted.toSeq
    val expected = src().collect().map(_.toString).sorted.toSeq
    assert(back === expected)
    val plan = read().queryExecution.executedPlan.toString
    assert(plan.contains("PartitionColumns: [day, grp]"), plan)
  }

  test("a pushed partition predicate prunes whole files (linesRead proves it)") {
    val q = read().filter(col("day") === "2024-01-02")
    val rows = q.collect()
    assert(rows.length == 40 && rows.forall(_.getString(2) == "2024-01-02"))
    val scan = scanOf(q)
    assert(scan.metrics("linesRead").value == 40,
      s"only day=2024-01-02 files may be read: ${scan.metrics("linesRead").value}")
    // mixed predicate: partition prune + in-reader data predicate compose
    val q2 = read().filter(col("grp") === "g1" && col("id") < 50)
    assert(q2.collect().forall(r => r.getString(3) == "g1" && r.getLong(0) < 50))
    assert(scanOf(q2).metrics("linesRead").value == 30,
      "grp=g1 holds 30 rows; other groups' files must not be opened")
  }

  test("a join's runtime key set prunes SPLITS, not just rows") {
    import spark.implicits._
    val dimDir = Files.createTempDirectory("graft_dsv2_part_dim").toFile
    Seq(("g2", "keep"), ("g7", "drop")).toDF("grp", "tag")
      .write.mode("overwrite").parquet(dimDir.getAbsolutePath)
    val dim = spark.read.parquet(dimDir.getAbsolutePath)
      .filter(col("tag") === "keep")
    // broadcast(dim) pins the BUILD side: at test scale both sides are
    // tiny and Spark would otherwise broadcast the (smaller-looking,
    // partition-pruned-stats) FACT — no dim exchange, no DPP to reuse.
    // At the scale this layout targets, the fact side is never the
    // build side and CBO does this on its own.
    val j = read().join(broadcast(dim), "grp")
    val rows = j.collect()
    assert(rows.length == 30 && rows.forall(_.getString(0) == "g2"))
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("RuntimeFilters: [dynamicpruningexpression"), plan.take(1500))
    // the realized key set arrived BEFORE partition planning on the
    // re-plan: files outside grp=g2 were never opened
    val scan = scanOf(j)
    assert(scan.metrics("linesRead").value == 30,
      s"runtime pruning must skip non-matching partitions' files entirely: " +
        s"linesRead=${scan.metrics("linesRead").value}")
  }

  test("escaped partition values decode (Hive %XX)") {
    import spark.implicits._
    val dir = new java.io.File(
      Files.createTempDirectory("graft_dsv2_esc").toFile, "t").getAbsolutePath
    Seq((1L, "x", "a b%c:d")).toDF("id", "v", "k")
      .write.partitionBy("k").option("sep", "\t").mode("overwrite").csv(dir)
    val s = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("k", StringType)))
    val back = spark.read.format("graft-tsv").schema(s)
      .option("partition.columns", "k").load(dir).collect()
    assert(back.map(_.getString(2)).toSeq === Seq("a b%c:d"))
    // and the decoded value is filterable as a pushed partition predicate
    assert(spark.read.format("graft-tsv").schema(s)
      .option("partition.columns", "k").load(dir)
      .filter(col("k") === "a b%c:d").count() == 1)
  }

  test("partitioned WRITE round-trips through the connector's own layout") {
    val out = new java.io.File(
      Files.createTempDirectory("graft_dsv2_pwrite").toFile, "t").getAbsolutePath
    src().repartition(3).write.format("graft-tsv")
      .option("partition.columns", "day,grp")
      .mode("overwrite").save(out)
    // layout: day=*/grp=*/part files, ONE root manifest governing all
    val rootNames = new java.io.File(out).listFiles().map(_.getName)
    assert(rootNames.count(_.startsWith("_gen-")) == 1, rootNames.mkString(","))
    assert(rootNames.exists(_.startsWith("day=")), rootNames.mkString(","))
    val back = spark.read.format("graft-tsv").schema(schema)
      .option("partition.columns", "day,grp").load(out)
    assert(back.collect().map(_.toString).sorted.toSeq ===
      src().collect().map(_.toString).sorted.toSeq)
    // partition pruning works against our own layout too (collect() so
    // the metrics we read belong to THIS DataFrame's executed plan —
    // count() plans and executes a separate pushed-count query)
    val q = back.filter(col("grp") === "g3")
    assert(q.collect().length == 30)
    assert(scanOf(q).metrics("linesRead").value == 30)

    // OVERWRITE replaces every partition in one atomic swap: write a
    // different day distribution and the old generation vanishes whole
    import spark.implicits._
    Seq((1000L, "x", "2024-02-01", "g9")).toDF("id", "v", "day", "grp")
      .write.format("graft-tsv").option("partition.columns", "day,grp")
      .mode("overwrite").save(out)
    val after = spark.read.format("graft-tsv").schema(schema)
      .option("partition.columns", "day,grp").load(out).collect()
    assert(after.map(_.getLong(0)).toSeq === Seq(1000L),
      "old generation must be invisible after the swap")
    // APPEND adds to the current generation without clobbering
    Seq((2000L, "y", "2024-02-01", "g9")).toDF("id", "v", "day", "grp")
      .write.format("graft-tsv").option("partition.columns", "day,grp")
      .mode("append").save(out)
    assert(spark.read.format("graft-tsv").schema(schema)
      .option("partition.columns", "day,grp").load(out)
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1000L, 2000L))
  }

  test("partitioned write escapes special values and encodes NULL as hive default") {
    import spark.implicits._
    val out = new java.io.File(
      Files.createTempDirectory("graft_dsv2_pwesc").toFile, "t").getAbsolutePath
    val s = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("k", StringType)))
    Seq((1L, "a", "x/y:z"), (2L, "b", null))
      .toDF("id", "v", "k")
      .write.format("graft-tsv").option("partition.columns", "k")
      .mode("overwrite").save(out)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.sorted.toSeq === Seq("k=__HIVE_DEFAULT_PARTITION__", "k=x%2Fy%3Az"),
      s"escaped dirs: ${dirs.mkString(",")}")
    val back = spark.read.format("graft-tsv").schema(s)
      .option("partition.columns", "k").load(out)
      .collect().sortBy(_.getLong(0))
    assert(back(0).getString(2) == "x/y:z")
    assert(back(1).isNullAt(2), "hive default partition must read as NULL")
  }

  test("the write requests clustering: one part file per partition leaf") {
    // the Write declares RequiresDistributionAndOrdering(partition cols),
    // so Spark clusters + sorts rows before the writers and each leaf is
    // written by exactly one task as exactly one file — no per-task file
    // proliferation across 3 input partitions x 12 leaves
    val out = new java.io.File(
      Files.createTempDirectory("graft_dsv2_cluster").toFile, "t").getAbsolutePath
    src().repartition(3).write.format("graft-tsv")
      .option("partition.columns", "day,grp")
      .mode("overwrite").save(out)
    val leaves = new java.io.File(out).listFiles().filter(_.isDirectory)
      .flatMap(_.listFiles()).filter(_.isDirectory)
    assert(leaves.length == 12, s"12 leaves expected, got ${leaves.length}")
    leaves.foreach { leaf =>
      val parts = leaf.listFiles().map(_.getName).filter(_.startsWith("part-"))
      assert(parts.length == 1,
        s"clustered write must produce ONE file in ${leaf.getName}: ${parts.mkString(",")}")
    }
  }

  test("a task spanning hundreds of partition values stays within the FD cap") {
    // 200 distinct values cycle through ONE task (coalesce(1)), so the
    // writer's open-file cap forces evictions and re-opens — multiple
    // staged files per leaf — and the round trip must still be exact
    val out = new java.io.File(
      Files.createTempDirectory("graft_dsv2_hicard").toFile, "t").getAbsolutePath
    spark.range(400).select(col("id"),
      concat(lit("p"), col("id") % 200).as("k"))
      .coalesce(1).write.format("graft-tsv")
      .option("partition.columns", "k").mode("overwrite").save(out)
    val s = StructType(Seq(StructField("id", LongType), StructField("k", StringType)))
    val back = spark.read.format("graft-tsv").schema(s)
      .option("partition.columns", "k").load(out)
    assert(back.count() == 400)
    assert(back.select("k").distinct().count() == 200)
    assert(back.filter(col("k") === "p7").collect().map(_.getLong(0)).sorted.toSeq
      === Seq(7L, 207L))
  }

  test("a data file where a partition directory belongs fails loudly") {
    val dir = Files.createTempDirectory("graft_dsv2_badlayout").toFile
    val w = new java.io.PrintWriter(new java.io.File(dir, "stray.tsv"), "UTF-8")
    w.println("1\tx"); w.close()
    val s = StructType(Seq(StructField("id", LongType),
      StructField("v", StringType), StructField("k", StringType)))
    val e = intercept[Exception] {
      spark.read.format("graft-tsv").schema(s)
        .option("partition.columns", "k").load(dir.getAbsolutePath).collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("hive layout"))), e.toString)
  }
}
