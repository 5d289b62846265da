package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Catalog maintenance procedures (`CALL g.system.compact/vacuum`,
  * GraftTsvMaintenance) — value parity end-to-end: q_dsv2_compact.
  * Proves:
  *  - compact merges sub-target files per partition leaf, byte-level,
  *    content-identical, with merged (still prunable) manifest stats;
  *  - the pre-compaction generation stays time-travel readable inside
  *    the retention window; a no-op compact publishes nothing;
  *  - vacuum reclaims crash-orphaned staging and unreferenced parts but
  *    never a referenced file; the age gate protects in-flight writes. */
class Dsv2MaintenanceSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_maint").toString
  spark.conf.set("spark.sql.catalog.gmnt",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmnt.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmnt.db")

  private def names(table: String): Seq[String] = {
    def walk(d: java.io.File, rel: String): Seq[String] =
      d.listFiles().toSeq.flatMap { f =>
        if (f.isDirectory) walk(f, rel + f.getName + "/")
        else Seq(rel + f.getName)
      }
    walk(new java.io.File(s"$rootDir/db/$table"), "")
  }

  test("compact merges small files, keeps content, history and stats") {
    spark.sql("""CREATE TABLE gmnt.db.c (id BIGINT, v STRING) USING `graft-tsv`
      TBLPROPERTIES ('retain.generations' = '2')""")
    spark.range(200).select(col("id"), concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(8, col("id"))
      .writeTo("gmnt.db.c").append()
    assert(names("c").count(_.startsWith("part-")) == 8)
    val res = spark.sql(
      "CALL gmnt.system.compact(`table` => 'db.c', target_bytes => 1048576)")
      .collect().head
    assert(res.getLong(0) == 8, s"files_before: $res")
    assert(res.getLong(1) == 1, s"files_after: $res")
    // content identical after compaction
    val ids = spark.sql("SELECT id FROM gmnt.db.c").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 200L))
    // the pre-compact generation is still pinnable (retention = 2)
    val v1 = spark.sql("SELECT count(*) FROM gmnt.db.c VERSION AS OF 1")
      .head().getLong(0)
    assert(v1 == 200)
    // merged stats stay prunable: a selective key-range read must not
    // lose rows (exactness) — Dsv2StatsSpec proves skipping mechanics
    assert(spark.sql("SELECT count(*) FROM gmnt.db.c WHERE id >= 150")
      .head().getLong(0) == 50)
    // and the merged manifest cell really carries the full range
    val fs = new org.apache.hadoop.fs.Path(rootDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val gen = names("c").filter(_.startsWith("_gen-")).max
    val entries = graft.sources.GraftTsvManifest.readEntries(fs,
      new org.apache.hadoop.fs.Path(s"$rootDir/db/c/$gen"))
    assert(entries.size == 1)
    val stats = graft.sources.GraftTsvManifest.parseStats(entries.head._2)
    assert(stats.get("id").contains(("long", "0", "199")), stats.toString)
    assert(graft.sources.GraftTsvManifest.rowCountOf(entries.head._2)
      .contains(200L))
  }

  test("compact respects partition leaves and the size target") {
    spark.sql("""CREATE TABLE gmnt.db.p (id BIGINT, day STRING)
      USING `graft-tsv` PARTITIONED BY (day)
      TBLPROPERTIES ('retain.generations' = '2')""")
    // 3 inserts → 3 generations → 3 small files per day leaf
    (0 until 3).foreach { i =>
      spark.sql(s"""INSERT INTO gmnt.db.p
        SELECT id + ${i * 100}, concat('d', id % 2) FROM range(100)""")
    }
    val before = names("p").filter(n =>
      n.contains("/part-") && !n.endsWith(".crc"))
    assert(before.count(_.startsWith("day=d0/")) == 3, before.mkString(","))
    val res = spark.sql("CALL gmnt.system.compact(`table` => 'db.p')")
      .collect().head
    assert(res.getLong(0) == 6 && res.getLong(1) == 2, res.toString)
    val after = names("p").filter(n =>
      n.contains("/part-") && !n.endsWith(".crc"))
      .filterNot(before.toSet) // retention keeps the old parts on disk
    assert(after.count(_.startsWith("day=d0/")) == 1, after.mkString(","))
    assert(after.count(_.startsWith("day=d1/")) == 1, after.mkString(","))
    assert(spark.sql("SELECT count(*) FROM gmnt.db.p").head().getLong(0) == 300)
    // a second compact is a no-op and publishes no generation
    val gens = names("p").filter(_.startsWith("_gen-")).toSet
    val res2 = spark.sql("CALL gmnt.system.compact(`table` => 'db.p')")
      .collect().head
    assert(res2.getLong(3) == -1L, res2.toString)
    assert(names("p").filter(_.startsWith("_gen-")).toSet == gens)
  }

  test("vacuum reclaims orphans, never referenced files; age gate holds") {
    spark.sql("CREATE TABLE gmnt.db.v (id BIGINT, v STRING) USING `graft-tsv`")
    spark.sql("INSERT INTO gmnt.db.v SELECT id, 'x' FROM range(50)")
    val tdir = new java.io.File(s"$rootDir/db/v")
    // crash garbage: a staging file AND a renamed-but-unreferenced part
    // (crash between part renames and the _gen swap)
    def plant(name: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(tdir, name), "UTF-8")
      w.println("999\tghost"); w.close()
    }
    plant(".staging-vcrash-0-1-aa-0")
    plant(".manifest-vcrash-abcd1234")
    plant("part-vcrash-00000.tsv")
    // age gate: a fresh orphan survives a vacuum with a 1h gate
    val guarded = spark.sql(
      "CALL gmnt.system.vacuum(`table` => 'db.v')").collect().head
    assert(guarded.getLong(0) == 0, guarded.toString)
    // and is reclaimed with the gate at zero
    val res = spark.sql(
      "CALL gmnt.system.vacuum(`table` => 'db.v', older_than_ms => 0)")
      .collect().head
    assert(res.getLong(0) == 3, res.toString)
    assert(res.getLong(1) > 0)
    assert(!names("v").exists(_.contains("vcrash")), names("v").mkString(","))
    // referenced data untouched
    assert(spark.sql("SELECT count(*) FROM gmnt.db.v").head().getLong(0) == 50)
  }

  test("vacuum leaves a pinned time-travel snapshot intact") {
    // a training run pins VERSION AS OF 1; a later mutation supersedes it
    // and a vacuum sweeps crash garbage — the pinned snapshot must answer
    // byte-identically after, because vacuum only ever deletes files NO
    // retained manifest references (the retention window, not the sweep,
    // decides what a pinned reader can still see)
    spark.sql("""CREATE TABLE gmnt.db.vp (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '2')""")
    spark.sql("INSERT INTO gmnt.db.vp SELECT id, concat('v', id) FROM range(30)")
    spark.sql("DELETE FROM gmnt.db.vp WHERE id % 3 = 0") // gen 2 rewrite
    val pinned = spark.sql(
      "SELECT id, v FROM gmnt.db.vp VERSION AS OF 1 ORDER BY id").collect()
    assert(pinned.length == 30)
    val tdir = new java.io.File(s"$rootDir/db/vp")
    val w = new java.io.PrintWriter(
      new java.io.File(tdir, "part-vpcrash-00000.tsv"), "UTF-8")
    w.println("999\tghost"); w.close()
    val res = spark.sql(
      "CALL gmnt.system.vacuum(`table` => 'db.vp', older_than_ms => 0)")
      .collect().head
    assert(res.getLong(0) == 1, res.toString) // exactly the planted orphan
    val after = spark.sql(
      "SELECT id, v FROM gmnt.db.vp VERSION AS OF 1 ORDER BY id").collect()
    assert(after.toSeq == pinned.toSeq,
      "the pinned snapshot changed across a vacuum")
    assert(spark.sql("SELECT count(*) FROM gmnt.db.vp").head().getLong(0) == 20)
  }

  test("rollback restores a retained generation; history lists the chain") {
    spark.sql("""CREATE TABLE gmnt.db.r (id BIGINT, v STRING) USING `graft-tsv`
      TBLPROPERTIES ('retain.generations' = '3')""")
    spark.sql("INSERT INTO gmnt.db.r SELECT id, 'x' FROM range(100)") // gen 1
    spark.sql("DELETE FROM gmnt.db.r WHERE id < 90")                  // gen 2
    assert(spark.sql("SELECT count(*) FROM gmnt.db.r").head().getLong(0) == 10)
    // the undo: generation 1's file list republished as generation 3
    val res = spark.sql(
      "CALL gmnt.system.rollback(`table` => 'db.r', to_generation => 1)")
      .collect().head
    assert(res.getLong(0) == 2 && res.getLong(1) == 3, res.toString)
    assert(spark.sql("SELECT count(*) FROM gmnt.db.r").head().getLong(0) == 100,
      "rollback must restore the pre-delete row set")
    // history shows all three generations; gen 3's footprint equals gen 1's
    val hist = spark.sql("CALL gmnt.system.history(`table` => 'db.r')")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3)))
    assert(hist.map(_._1).toSeq == Seq(1L, 2L, 3L), hist.mkString(","))
    assert(hist.head._2 == hist.last._2 && hist.head._3 == hist.last._3,
      s"restored generation must have gen 1's footprint: ${hist.mkString(",")}")
    // the deleted-state generation 2 stays pinnable until the window slides
    assert(spark.sql("SELECT count(*) FROM gmnt.db.r VERSION AS OF 2")
      .head().getLong(0) == 10)
    // rollback to the current generation is a no-op
    val noop = spark.sql(
      "CALL gmnt.system.rollback(`table` => 'db.r', to_generation => 3)")
      .collect().head
    assert(noop.getLong(0) == 3 && noop.getLong(1) == 3)
    // rollback past the retention window fails loudly
    spark.sql("INSERT INTO gmnt.db.r SELECT id, 'y' FROM range(5)")   // gen 4
    spark.sql("INSERT INTO gmnt.db.r SELECT id, 'z' FROM range(5)")   // gen 5 (gen 1 reclaimed)
    val e = intercept[Exception] {
      spark.sql("CALL gmnt.system.rollback(`table` => 'db.r', to_generation => 1)")
        .collect()
    }
    assert(e.getMessage.contains("not retained"), e.getMessage)
  }

  test("streamed table: per-epoch small files compact into one, stream resumes") {
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    import s.implicits._
    spark.sql("""CREATE TABLE gmnt.db.st (id BIGINT, v STRING) USING `graft-tsv`
      TBLPROPERTIES ('retain.generations' = '2')""")
    val tdir = s"$rootDir/db/st"
    val srcDir = java.nio.file.Files.createTempDirectory("graft_maint_src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft_maint_ck").toString
    def feed(i: Int): Unit = {
      (i * 10 until (i + 1) * 10).map(j => (j.toLong, s"v$j"))
        .toDF("id", "v").coalesce(1).write.mode("append").parquet(srcDir)
      val q = spark.readStream.schema("id BIGINT, v STRING").parquet(srcDir)
        .writeStream.format("graft-tsv")
        .option("path", tdir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // four epochs → four generations, each with its own small part file
    (0 until 4).foreach(feed)
    val partsBefore = names("st").count(n =>
      n.startsWith("part-") && !n.endsWith(".crc"))
    assert(partsBefore >= 4, s"expected per-epoch files, got ${names("st")}")
    val fs = new org.apache.hadoop.fs.Path(rootDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def latestEpoch(): Option[Long] = {
      val gen = names("st").filter(_.startsWith("_gen-")).max
      graft.sources.GraftTsvManifest.epochOf(fs,
        new org.apache.hadoop.fs.Path(s"$tdir/$gen"))
    }
    val epochBefore = latestEpoch()
    assert(epochBefore.isDefined, "streaming sink must record its epoch")
    val res = spark.sql("CALL gmnt.system.compact(`table` => 'db.st')")
      .collect().head
    assert(res.getLong(1) == 1, s"all epoch files pack into one: $res")
    assert(spark.sql("SELECT count(*) FROM gmnt.db.st").head().getLong(0) == 40)
    // the compacted generation CARRIES the last epoch marker, so a
    // replayed epoch across the compaction boundary stays idempotent
    assert(latestEpoch() == epochBefore,
      "compact must carry the #epoch replay marker")
    // the stream RESUMES across the compaction: the sink's epoch-replay
    // marker rides the generation chain, so the next epoch appends to the
    // compacted generation instead of double-publishing
    feed(4)
    assert(spark.sql("SELECT count(*) FROM gmnt.db.st").head().getLong(0) == 50)
    assert(spark.sql("SELECT min(id), max(id) FROM gmnt.db.st").head().toSeq ==
      Seq(0L, 49L))
  }

  test("unknown procedures and bad arguments fail loudly") {
    val e = intercept[Exception] {
      spark.sql("CALL gmnt.system.rewrite_everything('db.v')").collect()
    }
    // Spark wraps loadProcedure failures (FAILED_TO_LOAD_ROUTINE); the
    // catalog's own message rides the cause chain
    def messages(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("branch, compact, drop_branch, history, merge_branch, rollback, tag, untag, vacuum")),
      messages(e).mkString(" | "))
    val e2 = intercept[Exception] {
      spark.sql("CALL gmnt.system.compact(`table` => 'db.nosuch')").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("table"), e2.getMessage)
  }
}
