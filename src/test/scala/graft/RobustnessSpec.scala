package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Tables
import graft.streaming.StreamingOps

/** Production-robustness behaviors a 100 TB deployment leans on daily:
  * RocksDB-backed streaming state (state larger than executor memory),
  * statistics-driven broadcast planning (CBO picks the build side without
  * per-query hints), nested-struct schema pruning (scan reads the
  * subfield, not the struct), and malformed-record ingestion policies
  * (quarantine vs drop — a 100 TB CSV batch always has bad rows). */
class RobustnessSpec extends SparkSuite {

  test("streaming aggregation runs on the RocksDB state store provider") {
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("rocksdb_tumbling")
      .outputMode("complete").start()
    try {
      input.addData(
        Ev(Timestamp.valueOf("2024-01-01 00:10:00"), "click", 1.0),
        Ev(Timestamp.valueOf("2024-01-01 00:40:00"), "click", 2.0),
        Ev(Timestamp.valueOf("2024-01-01 01:10:00"), "view", 3.0))
      q.processAllAvailable()
      // state survives across micro-batches inside RocksDB
      input.addData(Ev(Timestamp.valueOf("2024-01-01 00:50:00"), "click", 4.0))
      q.processAllAvailable()
      val rows = s.table("rocksdb_tumbling")
        .orderBy("window_start", "event_type").collect()
      assert(rows.length == 2)
      assert(rows(0).getLong(2) == 3) // 00:00 window saw 3 clicks across batches
    } finally q.stop()
  }

  test("SCD2 stream (flatMapGroupsWithState) runs on RocksDB state — " +
      "same output as the default provider") {
    import StreamingOps.{TierEvent, Scd2Closed}
    // the r12-added custom-state path: open intervals live in per-key
    // state across micro-batches; the provider swap must not change one
    // row (closed-interval emission order inside a batch is sorted by
    // the operator itself)
    def run(provider: Option[String]): Seq[Scd2Closed] = {
      val s = spark.newSession()
      provider.foreach(p =>
        s.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      import s.implicits._
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      val input = MemoryStream[TierEvent]
      val q = StreamingOps.scd2Intervals(input.toDS())
        .writeStream.format("memory").queryName("scd2_prov")
        .outputMode("append").start()
      try {
        // batch 1: user 1 opens tier 10, flips to 20 (closes 10);
        // user 2 opens tier 5
        input.addData(TierEvent(1, 100, 1, 10), TierEvent(1, 200, 2, 20),
          TierEvent(2, 150, 3, 5))
        q.processAllAvailable()
        // batch 2: user 1 flips again (state carried the open 20-interval
        // ACROSS batches inside the provider); user 2 unchanged
        input.addData(TierEvent(1, 300, 4, 30), TierEvent(2, 400, 5, 5))
        q.processAllAvailable()
        s.table("scd2_prov").as[Scd2Closed].collect().toSeq
          .sortBy(c => (c.user_id, c.valid_from_us))
      } finally q.stop()
    }
    val rocks = run(Some(
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    val default = run(None)
    assert(rocks == default, s"provider changed SCD2 output: $rocks vs $default")
    assert(rocks == Seq(Scd2Closed(1, 10, 100, 200), Scd2Closed(1, 20, 200, 300)),
      rocks.toString)
  }

  test("table statistics let CBO broadcast the small side without a hint") {
    val s = spark.newSession()
    s.conf.set("spark.sql.cbo.enabled", "true")
    // threshold low enough that only REAL stats (not the default
    // fallback = spark.sql.defaultSizeInBytes = Long.Max) qualify
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "1MB")

    // an earlier aborted run can leave orphan managed-table dirs behind
    // (in-memory catalog forgets them; the warehouse doesn't)
    Seq("graft_cbo_nation", "graft_cbo_customer").foreach { t =>
      s.sql(s"DROP TABLE IF EXISTS $t")
      val p = new org.apache.hadoop.fs.Path(s"/tmp/graft-test-warehouse/$t")
      p.getFileSystem(s.sparkContext.hadoopConfiguration).delete(p, true)
    }
    Tables.load(s, sfDir, "nation").write.mode("overwrite")
      .saveAsTable("graft_cbo_nation")
    Tables.load(s, sfDir, "customer")
      .select("c_custkey", "c_nationkey", "c_acctbal")
      .write.mode("overwrite").saveAsTable("graft_cbo_customer")
    s.sql("ANALYZE TABLE graft_cbo_nation COMPUTE STATISTICS")
    s.sql("ANALYZE TABLE graft_cbo_customer COMPUTE STATISTICS")

    val joined = s.table("graft_cbo_customer")
      .join(s.table("graft_cbo_nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy("n_name").agg(count(lit(1)).as("n"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"stats-fed planner should broadcast the 25-row nation side:\n$plan")
  }

  test("nested struct subfield access prunes the scan to that field") {
    val out = Files.createTempDirectory("graft-nested").toString
    Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"),
        struct(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
          col("c_mktsegment").as("segment")).as("info"))
      .write.mode("overwrite").parquet(out)

    val pruned = spark.read.parquet(out)
      .select(col("c_custkey"), col("info.segment"))
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("struct<segment:string>") ||
      (scan.contains("segment") && !scan.contains("acctbal")),
      s"scan must read only info.segment, not the whole struct:\n$scan")
    assert(pruned.distinct().count() > 0)
  }

  test("malformed CSV rows quarantine under PERMISSIVE and vanish under DROPMALFORMED") {
    val dir = Files.createTempDirectory("graft-badcsv").toString
    Files.write(Paths.get(dir, "data.csv"),
      java.util.Arrays.asList(
        "id,qty,price",
        "1,5,10.5",
        "2,notanumber,20.0",
        "3,7,30.25",
        "4,8,notadouble"), // unparseable price
      java.nio.charset.StandardCharsets.UTF_8)
    val schema = StructType(Seq(
      StructField("id", LongType), StructField("qty", LongType),
      StructField("price", DoubleType),
      StructField("_corrupt", StringType)))

    val permissive = spark.read.schema(schema)
      .option("header", "true").option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .csv(dir)
      .cache() // corrupt-column queries need the full row context
    assert(permissive.count() == 4)
    val bad = permissive.filter(col("_corrupt").isNotNull).select("_corrupt").collect()
    assert(bad.length == 2, s"expected 2 quarantined rows, got ${bad.length}")
    assert(bad.map(_.getString(0)).exists(_.contains("notanumber")))
    val good = permissive.filter(col("_corrupt").isNull)
    assert(good.agg(sum("qty")).head.getLong(0) == 12) // 5 + 7

    val dropped = spark.read
      .schema(StructType(schema.fields.dropRight(1)))
      .option("header", "true").option("mode", "DROPMALFORMED")
      .csv(dir)
    // collect(), not count(): count prunes every column, so the parser
    // never touches the typed fields and has nothing to drop — the same
    // pruning that makes count() fast makes it blind to malformed rows
    assert(dropped.collect().length == 2)
    permissive.unpersist()
  }

  test("observe() surfaces pipeline accounting metrics without a second pass") {
    // the in-plan accounting a curation run attaches to its writes: row
    // count + quality-gate pass count ride the SAME job as the transform
    // (no extra scan), surfaced through the Observation API
    val obs = new org.apache.spark.sql.Observation("curation_stats")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .observe(obs,
        count(lit(1)).as("n_rows"),
        sum(when(col("n_chars") >= 100, 1L).otherwise(0L)).as("n_pass"))
      .filter(col("n_chars") >= 100)
    val kept = docs.count()
    val m = obs.get
    assert(m("n_rows") === 500L)
    assert(m("n_pass") === kept)
  }
}
