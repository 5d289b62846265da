package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.GraftTsvManifest

/** Commit-time auto-compaction (`compact.auto.files`, the Delta-style
  * auto-optimize knob): a batch commit that leaves >= threshold live
  * files triggers the byte-concatenation compaction as a follow-up
  * generation, so an ingest table's file count stays bounded without an
  * external scheduler. Pins: bounded file count under a stream of small
  * appends, content invariance, off-by-default, the write-option
  * override, property validation, and time travel across the
  * auto-compacted history. */
class Dsv2AutoCompactSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_autoc").toString
  spark.conf.set("spark.sql.catalog.gac",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gac.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gac.db")

  private def liveFiles(table: String): Int = {
    val dir = new org.apache.hadoop.fs.Path(s"$rootDir/db/$table")
    val fs = dir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val head = fs.listStatus(dir).map(_.getPath.getName)
      .filter(n => GraftTsvManifest.genNumber(n).isDefined).max
    GraftTsvManifest.readEntries(fs,
      new org.apache.hadoop.fs.Path(dir, head)).size
  }

  private def append(table: String, lo: Int, n: Int): Unit =
    spark.range(lo, lo + n).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
      .coalesce(1).writeTo(s"gac.db.$table").append()

  test("small appends stay bounded; content and time travel intact") {
    spark.sql("""CREATE TABLE gac.db.t (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '3',
        'compact.auto.files' = '6')""")
    (0 until 12).foreach(i => append("t", i * 100, 50))
    // every commit that reaches 6 live files is followed by a compact
    // generation folding them to 1 — the count never runs away
    assert(liveFiles("t") <= 6, s"live files: ${liveFiles("t")}")
    val ids = spark.sql("SELECT id FROM gac.db.t").collect()
      .map(_.getLong(0)).sorted
    assert(ids.length == 600)
    assert(ids.toSeq == (0 until 12).flatMap(i =>
      (i * 100) until (i * 100 + 50)).map(_.toLong).sorted)
    // the auto-compact commit is an ordinary generation: the immediately
    // preceding (pre-compact) snapshot stays readable inside retention
    val hist = spark.sql("CALL gac.system.history(`table` => 'db.t')")
      .collect()
    assert(hist.length >= 3, s"history rows: ${hist.length}")
  }

  test("off by default; write option overrides per commit") {
    spark.sql("""CREATE TABLE gac.db.off (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '1')""")
    (0 until 8).foreach(i => append("off", i * 100, 10))
    assert(liveFiles("off") == 8, "no auto-compaction without the property")
    // one write with the option folds everything
    spark.range(800, 810).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
      .coalesce(1)
      .writeTo("gac.db.off")
      .option("compact.auto.files", "3")
      .append()
    assert(liveFiles("off") == 1, s"live files: ${liveFiles("off")}")
    assert(spark.sql("SELECT count(*) FROM gac.db.off")
      .collect().head.getLong(0) == 90)
  }

  test("property validation is loud") {
    val e = intercept[Exception] {
      spark.sql("""CREATE TABLE gac.db.bad (id BIGINT) USING `graft-tsv`
        TBLPROPERTIES ('compact.auto.files' = '1')""")
    }
    assert(e.getMessage.contains("compact.auto.files"), e.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("""CREATE TABLE gac.db.bad2 (id BIGINT) USING `graft-tsv`
        TBLPROPERTIES ('compact.auto.target.bytes' = '0')""")
    }
    assert(e2.getMessage.contains("compact.auto.target.bytes"), e2.getMessage)
  }
}
