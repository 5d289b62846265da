package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.queries.Layout
import graft.sources.Tables

/** Physical-layout operators (graft.queries.Layout): the z-order write
  * produces per-file bounding boxes that are tight on BOTH dimensions
  * simultaneously (the property that makes min/max file skipping work for
  * predicates on either dimension), and compaction hits the byte-targeted
  * file count while preserving every row. */
class LayoutSpec extends SparkSuite {

  test("z-ordered range-partitioned files bound both dimensions tightly") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
    val Array(d) = li.agg(max("pk").as("pkm"), max("sk").as("skm")).collect()
    val (pkm, skm) = (d.getLong(0), d.getLong(1))
    val zdf = li.withColumn("zval",
      Layout.morton(expr(s"(pk * 65536L) div (${pkm + 1}L)"),
                    expr(s"(sk * 65536L) div (${skm + 1}L)")))
    val out = Files.createTempDirectory("graft-zorder").toString
    val files = 8
    zdf.repartitionByRange(files, col("zval"))
      .sortWithinPartitions("zval")
      .write.mode("overwrite").parquet(out)

    val boxes = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(count(lit(1)).as("n"),
        min("pk").as("pk_min"), max("pk").as("pk_max"),
        min("sk").as("sk_min"), max("sk").as("sk_max"))
      .collect()
    assert(boxes.length == files)
    assert(boxes.map(_.getAs[Long]("n")).sum == li.count())

    // normalized box area per file: a random or single-column-sorted
    // layout leaves at least one dimension's range ≈ global on every
    // file (area ≈ 1); 8 z-range files cut ~3 interleaved bits, so the
    // expected area is ~1/8 per file
    val (pkSpan, skSpan) = (pkm.toDouble, skm.toDouble)
    val areas = boxes.map { r =>
      val pkr = (r.getAs[Long]("pk_max") - r.getAs[Long]("pk_min")) / pkSpan
      val skr = (r.getAs[Long]("sk_max") - r.getAs[Long]("sk_min")) / skSpan
      pkr * skr
    }
    val avgArea = areas.sum / areas.length
    assert(avgArea <= 0.35, s"avg normalized box area $avgArea not tight")
    assert(areas.max <= 0.7, s"widest box ${areas.max} not tight")
  }

  test("morton interleave matches a per-bit reference on random 16-bit pairs") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val pairs = Seq.fill(1000)((rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong)) ++
      Seq((0L, 0L), (65535L, 65535L), (65535L, 0L), (0L, 65535L), (1L, 2L))
    // independent reference: place x bit i at even position 2i, y at 2i+1
    def ref(x: Long, y: Long): Long =
      (0 until 16).map { i =>
        (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }.reduce(_ | _)
    val got = pairs.toDF("x", "y")
      .select(Layout.morton(col("x"), col("y")).as("z"))
      .collect().map(_.getLong(0))
    pairs.zip(got).foreach { case ((x, y), z) =>
      assert(z == ref(x, y), s"morton($x, $y) = $z, expected ${ref(x, y)}")
    }
  }

  test("sorted layout + parquet min/max stats skip row groups for a selective predicate") {
    val out = Files.createTempDirectory("graft-rowgroup").toString
    val li = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_extendedprice")
    val total = li.count()
    // one sorted file with many small row groups: each group's min/max
    // footer stats then cover a narrow key range, which is what the
    // reader's predicate pushdown prunes on
    li.repartitionByRange(1, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite")
      .option("parquet.block.size", 64 * 1024)
      .parquet(out)

    val Array(k) = li.selectExpr("percentile_approx(l_orderkey, 0.05)").collect()
    val sel = spark.read.parquet(out)
      .filter(col("l_orderkey") <= k.getLong(0))
    sel.collect()
    val scan = sel.queryExecution.executedPlan.collectLeaves().head
    val rowsRead = scan.metrics("numOutputRows").value
    // the scan metric counts rows of SURVIVING row groups (the vectorized
    // reader filters rows after group pruning): reading ≤ half the table
    // for a 5% predicate proves groups were skipped; an unsorted layout
    // spreads the keys over every group and reads ~100%
    assert(rowsRead < total / 2,
      s"scan read $rowsRead of $total rows — row groups not skipped")
    assert(rowsRead > 0)
  }

  test("compaction hits the byte-targeted file count and preserves rows") {
    val out = Layout.compactedOrdersPath(spark, sfDir)
    val root = Layout.compactRoot(sfDir)

    val smallFiles = Layout.dataFiles(spark, s"$root/small")
    assert(smallFiles.length == 48, s"ingest produced ${smallFiles.length} files")

    val totalBytes = smallFiles.map(_.getLen).sum
    val expected = math.max(1L, (totalBytes + (4L << 20) - 1) / (4L << 20)).toInt
    val compacted = Layout.dataFiles(spark, out)
    assert(compacted.length == expected,
      s"expected $expected compacted files, got ${compacted.length}")
    assert(compacted.length < smallFiles.length)

    val orig = Tables.load(spark, sfDir, "orders")
    val back = spark.read.parquet(out)
    assert(back.exceptAll(orig).isEmpty && orig.exceptAll(back).isEmpty)
  }
}
