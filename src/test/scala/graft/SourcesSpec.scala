package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Secondary source/sink formats (SURVEY.md §2.3): CSV, JSON and text
  * round-trips preserve values; bucketed parquet tables join without an
  * exchange (the pay-the-shuffle-once-at-ingest path from SCALE.md §3). */
class SourcesSpec extends SparkSuite {

  private def tmp(prefix: String) = Files.createTempDirectory(prefix).toString

  test("csv round-trip preserves the orders slice") {
    val out = tmp("graft-csv")
    val orig = Tables.load(spark, sfDir, "orders")
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    orig.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true")
      .schema(orig.schema).csv(out)
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("json round-trip preserves values and nested structs survive") {
    val out = tmp("graft-json")
    val orig = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"),
        struct(col("c_name"), col("c_mktsegment")).as("info"), col("c_acctbal"))
    orig.write.mode("overwrite").json(out)
    val back = spark.read.schema(orig.schema).json(out)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("text sink + scan round-trip (the reference's only format)") {
    val out = tmp("graft-text")
    val orig = Tables.load(spark, sfDir, "nation").select("n_name")
    orig.write.mode("overwrite").text(out)
    val back = spark.read.textFile(out).toDF("n_name")
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }

  test("partitioned parquet layout prunes non-matching partitions at plan time") {
    val out = tmp("graft-part")
    Tables.load(spark, sfDir, "events")
      .select("event_id", "user_id", "event_type", "value")
      .write.mode("overwrite").partitionBy("event_type").parquet(out)
    val pruned = spark.read.parquet(out).filter(col("event_type") === "click")
    val plan = pruned.queryExecution.executedPlan.toString
    // The partition predicate must become a PartitionFilter on the scan
    // (directory-level pruning — at 100 TB this is the difference between
    // reading one partition and reading the lake), never a post-scan Filter.
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"event_type filter must prune partitions:\n$plan")
    val scannedFiles = pruned.queryExecution.executedPlan.collectLeaves()
      .head.metrics.get("numFiles")
    assert(pruned.count() ==
      Tables.load(spark, sfDir, "events").filter(col("event_type") === "click").count())
    // only the click partition's files were touched
    scannedFiles.foreach(m => assert(m.value <
      new java.io.File(out).listFiles().count(_.getName.startsWith("event_type=")) + 1))
  }

  test("selective dim filter injects a runtime bloom filter into the fact scan side") {
    val s = spark
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> s.conf.getOption(k) }
    confs.foreach { case (k, v) => s.conf.set(k, v) }
    try {
      // shuffle join of the fact against a selectively-filtered build side:
      // the optimizer should seed a bloom filter from the filtered orders
      // keys and apply it to the lineitem scan side, cutting shuffle input
      // before the exchange — the runtime analog of static partition
      // pruning, and the knob that matters when the dim filter is dynamic.
      val sel = Tables.load(s, sfDir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      val j = Tables.load(s, sfDir, "lineitem")
        .join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter_agg") || plan.contains("BloomFilterMightContain") ||
        plan.toLowerCase.contains("mightcontain"),
        s"expected an injected runtime bloom filter:\n$plan")
      assert(j.count() > 0)
    } finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  test("bucketed tables sort-merge join with no shuffle exchange") {
    val s = spark
    s.sql("DROP TABLE IF EXISTS orders_b")
    s.sql("DROP TABLE IF EXISTS customer_b")
    // the in-memory catalog forgets tables between JVMs but the warehouse
    // files persist — remove the physical locations too
    Seq("orders_b", "customer_b").foreach { t =>
      val dir = new java.io.File(s"/tmp/graft-test-warehouse/$t")
      if (dir.exists()) {
        import scala.reflect.io.Directory
        new Directory(dir).deleteRecursively()
      }
    }
    Tables.load(s, sfDir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    Tables.load(s, sfDir, "customer").select("c_custkey", "c_mktsegment")
      .write.mode("overwrite").bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = s.table("orders_b")
        .join(s.table("customer_b"), col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ, got:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join must not shuffle, got:\n$plan")
      assert(joined.count() > 0)
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
