package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** GENERATION streaming (`stream.by.generation=true`,
  * GraftTsvGenerationStream): micro-batches follow the table's commit
  * clock — initial snapshot of the current generation, then each commit's
  * appended files, exactly once across restarts. The append-only contract
  * is enforced: a rewrite commit (DELETE's copy-on-write) fails the
  * stream with a named error unless `stream.allow.rewrites=true`. */
class Dsv2GenStreamSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_genstream").toString
  spark.conf.set("spark.sql.catalog.ggen",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.ggen.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS ggen.db")

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("v", StringType)))

  private def runOnce(table: String, ckpt: String, out: String,
      allowRewrites: Boolean = false): Unit = {
    val r = spark.readStream.format("graft-tsv").schema(schema)
      .option("stream.by.generation", "true")
    val q = (if (allowRewrites) r.option("stream.allow.rewrites", "true") else r)
      .load(s"$rootDir/db/$table")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.stop()
  }

  private def sunk(out: String): Seq[Long] =
    spark.read.schema(StructType(schema)).parquet(out)
      .collect().map(_.getLong(0)).sorted.toSeq

  test("initial snapshot, then per-commit increments, exactly once across resumes") {
    spark.sql("""CREATE TABLE ggen.db.s (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '6')""")
    spark.sql("INSERT INTO ggen.db.s VALUES (1, 'a'), (2, 'b')") // gen 1
    spark.sql("INSERT INTO ggen.db.s VALUES (3, 'c')")           // gen 2
    val root = Files.createTempDirectory("genstream_s").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    // fresh checkpoint: first run snapshots the CURRENT generation (both
    // commits, no double-read of gen 1's files through gen 2's manifest)
    runOnce("s", ckpt, out)
    assert(sunk(out) == Seq(1L, 2L, 3L))
    // two more commits; the resumed run delivers exactly their rows
    spark.sql("INSERT INTO ggen.db.s VALUES (4, 'd')")           // gen 3
    spark.sql("INSERT INTO ggen.db.s VALUES (5, 'e'), (6, 'f')") // gen 4
    runOnce("s", ckpt, out)
    assert(sunk(out) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // no new commits: a third run delivers nothing
    runOnce("s", ckpt, out)
    assert(sunk(out) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }

  // The §36 operating point pinned to the TABLE: TBLPROPERTIES
  // stream.max.files.per.trigger sets the admission budget for every
  // consumer that resolves the table through the catalog; a per-scan
  // max.files.per.trigger read option still overrides it.
  test("stream.max.files.per.trigger table property sets the budget; scan option overrides") {
    spark.sql("""CREATE TABLE ggen.db.tp (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '8',
        'stream.max.files.per.trigger' = '1')""")
    spark.sql("INSERT INTO ggen.db.tp VALUES (1, 'a'), (2, 'b')") // gen 1
    spark.sql("INSERT INTO ggen.db.tp VALUES (3, 'c')")           // gen 2
    spark.sql("INSERT INTO ggen.db.tp VALUES (4, 'd')")           // gen 3
    spark.sql("INSERT INTO ggen.db.tp VALUES (5, 'e')")           // gen 4
    val root = Files.createTempDirectory("genstream_tp").toString
    def drain(tag: String, extra: Map[String, String]): (Seq[Long], Int) = {
      val (ckpt, out) = (s"$root/ckpt_$tag", s"$root/out_$tag")
      var r = spark.readStream.option("stream.by.generation", "true")
      extra.foreach { case (k, v) => r = r.option(k, v) }
      val q = r.table("ggen.db.tp")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q.stop()
      val batches = new java.io.File(s"$ckpt/offsets").listFiles()
        .count(f => f.getName.forall(_.isDigit))
      (sunk(out), batches)
    }
    // the table default (budget 1) delivers one generation per batch
    val (rows1, b1) = drain("default", Map.empty)
    assert(rows1 == Seq(1L, 2L, 3L, 4L, 5L))
    assert(b1 >= 4, s"table-property budget should split batches, got $b1")
    // a per-scan option overrides the table default: one drain batch
    val (rows2, b2) = drain("override", Map("max.files.per.trigger" -> "100"))
    assert(rows2 == Seq(1L, 2L, 3L, 4L, 5L))
    assert(b2 <= 2, s"scan-option override should coalesce batches, got $b2")
  }

  test("max.files.per.trigger bounds each batch to whole generations; rows identical") {
    spark.sql("""CREATE TABLE ggen.db.mft (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '8')""")
    spark.sql("INSERT INTO ggen.db.mft VALUES (1, 'a'), (2, 'b')") // gen 1
    spark.sql("INSERT INTO ggen.db.mft VALUES (3, 'c')")           // gen 2
    spark.sql("INSERT INTO ggen.db.mft VALUES (4, 'd')")           // gen 3
    spark.sql("INSERT INTO ggen.db.mft VALUES (5, 'e'), (6, 'f')") // gen 4
    val root = Files.createTempDirectory("genstream_mft").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    val q = spark.readStream.format("graft-tsv").schema(schema)
      .option("stream.by.generation", "true")
      .option("max.files.per.trigger", "1")
      .load(s"$rootDir/db/mft")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(); q.stop()
    // content identical to the unlimited drain
    assert(sunk(out) == Seq(1L, 2L, 3L, 4L, 5L, 6L))
    // but delivered in MULTIPLE batches: the 1-file budget admits one
    // generation at a time (always at least one — no stall), so the
    // offset log carries >= 4 committed batches instead of 1
    val batches = new java.io.File(s"$ckpt/offsets").listFiles()
      .count(f => f.getName.forall(_.isDigit))
    assert(batches >= 4, s"expected one batch per generation, got $batches")
    // a SECOND bounded drain after more commits resumes exactly-once
    spark.sql("INSERT INTO ggen.db.mft VALUES (7, 'g')")           // gen 5
    val q2 = spark.readStream.format("graft-tsv").schema(schema)
      .option("stream.by.generation", "true")
      .option("max.files.per.trigger", "1")
      .load(s"$rootDir/db/mft")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q2.awaitTermination(); q2.stop()
    assert(sunk(out) == Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L))
  }

  test("a rewrite commit fails the append-only feed; the opt-out re-emits carried rows") {
    spark.sql("""CREATE TABLE ggen.db.r (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '6')""")
    // BOTH rows must land in ONE part file: a multi-file insert would let
    // DELETE drop a whole file metadata-only (no rewrite, nothing carried
    // — the stream correctly emits nothing for that case)
    val s = spark
    import s.implicits._
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .writeTo("ggen.db.r").append() // gen 1
    val root = Files.createTempDirectory("genstream_r").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    runOnce("r", ckpt, out)
    assert(sunk(out) == Seq(1L, 2L))
    spark.sql("DELETE FROM ggen.db.r WHERE id = 1") // gen 2: rewrite
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runOnce("r", ckpt, out))
    assert(e.getCause.getMessage.contains("REWROTE") &&
      e.getCause.getMessage.contains("stream.allow.rewrites"),
      e.getCause.getMessage)
    // opt-out: the rewritten file's surviving row re-emits (documented)
    runOnce("r", ckpt, out, allowRewrites = true)
    assert(sunk(out) == Seq(1L, 2L, 2L))
  }

  test("a metadata-only whole-file delete also breaks the feed; the opt-out emits nothing") {
    spark.sql("""CREATE TABLE ggen.db.m (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '6')""")
    spark.sql("INSERT INTO ggen.db.m VALUES (1, 'a')") // gen 1, file A
    spark.sql("INSERT INTO ggen.db.m VALUES (2, 'b')") // gen 2, file B
    val root = Files.createTempDirectory("genstream_m").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    runOnce("m", ckpt, out)
    assert(sunk(out) == Seq(1L, 2L))
    // id=1 is ALL of file A: the delete drops the file from the manifest
    // without writing anything — still a non-append commit
    spark.sql("DELETE FROM ggen.db.m WHERE id = 1") // gen 3
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runOnce("m", ckpt, out))
    assert(e.getCause.getMessage.contains("stream.allow.rewrites"),
      e.getCause.getMessage)
    // opt-out: no files were added, so nothing re-emits
    runOnce("m", ckpt, out, allowRewrites = true)
    assert(sunk(out) == Seq(1L, 2L))
  }

  // ---- CHANGE-FEED mode (stream.changes=true) ----------------------------

  private val changeSchema = StructType(schema.fields :+
    StructField(graft.sources.GraftTsvMeta.ChangeCol, StringType))

  private def runChanges(table: String, ckpt: String, out: String): Unit = {
    val q = spark.readStream.format("graft-tsv").schema(changeSchema)
      .option("stream.by.generation", "true")
      .option("stream.changes", "true")
      .load(s"$rootDir/db/$table")
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.stop()
  }

  private def sunkChanges(out: String): Seq[(Long, String)] =
    spark.read.schema(changeSchema).parquet(out)
      .collect().map(r => (r.getLong(0),
        r.getString(changeSchema.fieldIndex(
          graft.sources.GraftTsvMeta.ChangeCol)))).sorted.toSeq

  test("change feed: a rewrite streams signed delete+insert, carried rows cancel, resume is exactly-once") {
    spark.sql("""CREATE TABLE ggen.db.c (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '6')""")
    val s = spark
    import s.implicits._
    // one part file so the DELETE is a genuine copy-on-write rewrite
    Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1)
      .writeTo("ggen.db.c").append() // gen 1
    val root = Files.createTempDirectory("genstream_c").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    runChanges("c", ckpt, out)
    assert(sunkChanges(out) == Seq((1L, "insert"), (2L, "insert")))
    // the rewrite that FAILS the append-only feed streams fine here:
    // old file's rows sign delete, rewritten file's survivors re-insert
    spark.sql("DELETE FROM ggen.db.c WHERE id = 1") // gen 2
    runChanges("c", ckpt, out)
    assert(sunkChanges(out) == Seq((1L, "delete"), (1L, "insert"),
      (2L, "delete"), (2L, "insert"), (2L, "insert")))
    // id=1 nets to zero, id=2 to exactly one — the signed-cancellation
    // identity a downstream IVM aggregate relies on
    val net = spark.read.schema(changeSchema).parquet(out)
      .groupBy("id")
      .agg(sum(when(col(graft.sources.GraftTsvMeta.ChangeCol) === "insert",
        1L).otherwise(-1L)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    assert(net == Seq((1L, 0L), (2L, 1L)))
    // restart exactly-once: nothing new, nothing re-emitted
    runChanges("c", ckpt, out)
    assert(sunkChanges(out).size == 5)
  }

  test("change feed misuse fails loudly at scan build") {
    spark.sql("""CREATE TABLE ggen.db.e (id BIGINT, v STRING)
      USING `graft-tsv`""")
    spark.sql("INSERT INTO ggen.db.e VALUES (1, 'a')")
    val root = Files.createTempDirectory("genstream_e").toString
    // missing _change_type in the declared schema
    val e1 = intercept[Exception] {
      val q = spark.readStream.format("graft-tsv").schema(schema)
        .option("stream.by.generation", "true")
        .option("stream.changes", "true")
        .load(s"$rootDir/db/e")
        .writeStream.format("parquet").option("path", s"$root/o1")
        .option("checkpointLocation", s"$root/c1")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q.stop()
    }
    assert(exceptionChain(e1).exists(_.getMessage != null) &&
      exceptionChain(e1).exists(m => Option(m.getMessage)
        .exists(_.contains("_change_type"))), e1.toString)
    // change mode without the generation clock
    val e2 = intercept[Exception] {
      val q = spark.readStream.format("graft-tsv").schema(changeSchema)
        .option("stream.changes", "true")
        .load(s"$rootDir/db/e")
        .writeStream.format("parquet").option("path", s"$root/o2")
        .option("checkpointLocation", s"$root/c2")
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(); q.stop()
    }
    assert(exceptionChain(e2).exists(m => Option(m.getMessage)
      .exists(_.contains("stream.by.generation"))), e2.toString)
  }

  private def exceptionChain(e: Throwable): Seq[Throwable] =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10).toSeq

  test("offsets are generations: a resume past a reclaimed start names the retention knob") {
    spark.sql("""CREATE TABLE ggen.db.w (id BIGINT, v STRING)
      USING `graft-tsv`""") // default retain = 1
    spark.sql("INSERT INTO ggen.db.w VALUES (1, 'a')")  // gen 1
    val root = Files.createTempDirectory("genstream_w").toString
    val (ckpt, out) = (s"$root/ckpt", s"$root/out")
    runOnce("w", ckpt, out) // consumed through gen 1
    assert(sunk(out) == Seq(1L))
    // three more commits slide gen 1 out of the retain=1 window
    (2 to 4).foreach(i =>
      spark.sql(s"INSERT INTO ggen.db.w VALUES ($i, 'x')"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException](
      runOnce("w", ckpt, out))
    assert(e.getCause.getMessage.contains("retain.generations"),
      e.getCause.getMessage)
  }
}
