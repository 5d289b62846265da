package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Branches on the graft catalog: named writable refs as parallel
  * `_gen-N.b-<name>` manifest chains over shared (copy-on-write) part
  * files. The load-bearing claims, each pinned here:
  *  - ISOLATION both ways: branch writes are invisible to main, and a
  *    main write after the branch point is invisible to the branch;
  *  - DURABILITY under main mutation: a main OVERWRITE (retain=1) and a
  *    vacuum must not reclaim parts only the branch references (the
  *    publish keep-set / vacuum referenced-set union — the one
  *    deliberate coupling between the lineages);
  *  - fast-forward MERGE publishes the branch head as the next main
  *    generation and retires the chain; divergence refuses loudly;
  *  - DROP retires the chain without deleting data; the next main
  *    commit reclaims branch-only parts;
  *  - a streaming sink cannot target a branch (epoch replay markers ride
  *    the main chain). */
class Dsv2BranchSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_branch").toString
  spark.conf.set("spark.sql.catalog.gbr",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gbr.root", rootDir)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("id").collect().map(_.getLong(0)).sorted.toSeq

  private def tableFiles(ns: String, t: String): Set[String] =
    new java.io.File(s"$rootDir/$ns/$t").listFiles()
      .map(_.getName).filter(n => !n.startsWith(".")).toSet

  test("branch lifecycle: isolation both ways, ff-merge, divergence refusal") {
    spark.sql("CREATE NAMESPACE gbr.db")
    spark.sql("CREATE TABLE gbr.db.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.db.t SELECT id FROM range(3)")
    val row = spark.sql("CALL gbr.system.branch('db.t', 'dev')").head()
    assert(row.getString(0) == "dev" && row.getLong(1) == 1L)

    // branch write: invisible to main
    spark.range(3, 6).select(col("id"))
      .writeTo("gbr.db.t").option("branch", "dev").append()
    assert(ids(spark.table("gbr.db.t")) == Seq(0L, 1L, 2L), "main saw a branch write")
    assert(ids(spark.read.option("branch", "dev").table("gbr.db.t")) ==
      (0L to 5L), "branch lost its own write or its base")
    // plan shows which lineage the scan resolved
    assert(spark.read.option("branch", "dev").table("gbr.db.t")
      .queryExecution.executedPlan.toString.contains("Branch: dev"))

    // fast-forward merge: main absorbs the branch head, chain retires
    val m = spark.sql("CALL gbr.system.merge_branch('db.t', 'dev')").head()
    assert(m.getLong(2) > 1L, s"merge generation: $m")
    assert(ids(spark.table("gbr.db.t")) == (0L to 5L))
    val e = intercept[Exception] {
      spark.read.option("branch", "dev").table("gbr.db.t").collect()
    }
    assert(e.getMessage.contains("does not exist"), e.getMessage)

    // divergence: branch again, write BOTH sides, merge must refuse
    spark.sql("CALL gbr.system.branch('db.t', 'dev2')")
    spark.range(6, 7).select(col("id"))
      .writeTo("gbr.db.t").option("branch", "dev2").append()
    spark.sql("INSERT INTO gbr.db.t SELECT 100")
    val d = intercept[Exception] {
      spark.sql("CALL gbr.system.merge_branch('db.t', 'dev2')").collect()
    }
    assert(d.getMessage.contains("not fast-forward"), d.getMessage)
    // the diverged branch still reads its own lineage (base + its write),
    // NOT main's id=100
    assert(ids(spark.read.option("branch", "dev2").table("gbr.db.t")) ==
      (0L to 6L))
    spark.sql("CALL gbr.system.drop_branch('db.t', 'dev2')")
  }

  test("main OVERWRITE and vacuum cannot reclaim branch-referenced parts") {
    spark.sql("CREATE NAMESPACE gbr.keep")
    spark.sql("CREATE TABLE gbr.keep.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.keep.t SELECT id FROM range(4)")
    spark.sql("CALL gbr.system.branch('keep.t', 'hold')")
    spark.range(4, 8).select(col("id"))
      .writeTo("gbr.keep.t").option("branch", "hold").append()
    // main OVERWRITE at default retention: the pre-overwrite main
    // generation slides out after the NEXT commit — run two so the
    // original parts are past any retention window
    spark.sql("INSERT OVERWRITE gbr.keep.t SELECT 50")
    spark.sql("INSERT OVERWRITE gbr.keep.t SELECT 60")
    spark.sql("CALL gbr.system.vacuum('keep.t', 0)").collect()
    assert(ids(spark.table("gbr.keep.t")) == Seq(60L))
    assert(ids(spark.read.option("branch", "hold").table("gbr.keep.t")) ==
      (0L to 7L),
      "a main overwrite/vacuum reclaimed parts the branch references")

    // DROP the branch: the chain goes; the next main commit reclaims the
    // now-unreferenced branch parts
    val before = tableFiles("keep", "t")
    spark.sql("CALL gbr.system.drop_branch('keep.t', 'hold')")
    spark.sql("INSERT INTO gbr.keep.t SELECT 70")
    val after = tableFiles("keep", "t")
    assert(!after.exists(_.contains(".b-hold")), "branch manifests not retired")
    assert(before.diff(after).nonEmpty,
      "dropping the branch + committing must reclaim branch-only parts")
    assert(ids(spark.table("gbr.keep.t")) == Seq(60L, 70L))
  }

  test("merge_branch carries the main head's #epoch replay marker") {
    // the compact interleaving, for merge: streaming sink commits an
    // epoch → merge_branch publishes a new main generation between two
    // streaming invocations → the resumed stream's replay-idempotence
    // check reads the LATEST manifest's marker — if merge dropped it, a
    // replayed epoch would double-publish
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    spark.sql("CREATE NAMESPACE gbr.ep")
    spark.sql("CREATE TABLE gbr.ep.t (id BIGINT) USING `graft-tsv`")
    val dir = s"$rootDir/ep/t"
    val mem = MemoryStream[Long]
    mem.addData(1L, 2L)
    val ckpt = Files.createTempDirectory("graft_branch_ep").toString
    mem.toDF().selectExpr("value AS id")
      .writeStream.format("graft-tsv")
      .option("path", dir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().processAllAvailable()
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    import graft.sources.GraftTsvManifest
    def headGen: Long = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .flatMap(st => GraftTsvManifest.genNumber(st.getPath.getName)).max
    val epochBefore = GraftTsvManifest.epochOf(fs,
      new org.apache.hadoop.fs.Path(dir, GraftTsvManifest.genName(headGen)))
    assert(epochBefore.isDefined, "streaming commit must record an epoch")
    spark.sql("CALL gbr.system.branch('ep.t', 'side')")
    spark.range(100, 102).select(col("id"))
      .writeTo("gbr.ep.t").option("branch", "side").append()
    spark.sql("CALL gbr.system.merge_branch('ep.t', 'side')")
    // headGen is a def — re-evaluates to the merge-published head
    val epochAfter = GraftTsvManifest.epochOf(fs,
      new org.apache.hadoop.fs.Path(dir, GraftTsvManifest.genName(headGen)))
    assert(epochAfter == epochBefore,
      s"merge dropped the epoch marker: $epochBefore -> $epochAfter")
    assert(ids(spark.table("gbr.ep.t")) == Seq(1L, 2L, 100L, 101L))
  }

  test("VERSION AS OF resolves a branch; tag/branch name collisions refuse") {
    spark.sql("CREATE NAMESPACE gbr.vao")
    spark.sql("CREATE TABLE gbr.vao.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.vao.t SELECT id FROM range(2)")
    spark.sql("CALL gbr.system.branch('vao.t', 'review')")
    spark.range(10, 12).select(col("id"))
      .writeTo("gbr.vao.t").option("branch", "review").append()
    // SQL review of the branch head, no reader options needed
    assert(ids(spark.sql("SELECT * FROM gbr.vao.t VERSION AS OF 'review'")) ==
      Seq(0L, 1L, 10L, 11L))
    assert(ids(spark.table("gbr.vao.t")) == Seq(0L, 1L))
    // unknown name: the error names both tags and branches
    val u = intercept[Exception] {
      spark.sql("SELECT * FROM gbr.vao.t VERSION AS OF 'ghost'").collect()
    }
    assert(u.getMessage.contains("branches: review"), u.getMessage)
    // a name that is BOTH a tag and a branch refuses loudly
    spark.sql("CALL gbr.system.tag('vao.t', 'review', 1)")
    val amb = intercept[Exception] {
      spark.sql("SELECT * FROM gbr.vao.t VERSION AS OF 'review'").collect()
    }
    assert(amb.getMessage.contains("BOTH a tag and a branch"), amb.getMessage)
  }

  test("streaming READS refuse a branch (offsets ride the main chain)") {
    spark.sql("CREATE NAMESPACE gbr.sr")
    spark.sql("CREATE TABLE gbr.sr.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.sr.t SELECT 1")
    spark.sql("CALL gbr.system.branch('sr.t', 'b')")
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    for (genMode <- Seq(true, false)) {
      val ex = intercept[Exception] {
        spark.readStream.format("graft-tsv")
          .schema("id BIGINT")
          .option("path", s"$rootDir/sr/t")
          .option("branch", "b")
          .option("stream.by.generation", genMode.toString)
          .load()
          .writeStream.format("memory").queryName(s"br_refuse_$genMode")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start().processAllAvailable()
      }
      assert(msgs(ex).exists(_.contains("streaming read cannot target a branch")),
        s"genMode=$genMode: ${msgs(ex).mkString(" | ")}")
    }
  }

  test("error surface: unknown branch, bad name, streaming sink refusal") {
    spark.sql("CREATE NAMESPACE gbr.err")
    spark.sql("CREATE TABLE gbr.err.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.err.t SELECT 1")
    // write to a branch that was never created
    val w = intercept[Exception] {
      spark.range(1).writeTo("gbr.err.t").option("branch", "nope").append()
    }
    assert(w.getMessage.contains("does not exist"), w.getMessage)
    // read likewise, naming what exists
    spark.sql("CALL gbr.system.branch('err.t', 'real')")
    val r = intercept[Exception] {
      spark.read.option("branch", "ghost").table("gbr.err.t").collect()
    }
    assert(r.getMessage.contains("ghost") && r.getMessage.contains("real"),
      r.getMessage)
    // invalid charset fails at plan time
    val b = intercept[Exception] {
      spark.sql("CALL gbr.system.branch('err.t', 'a/b')").collect()
    }
    assert(b.getMessage.contains("invalid"), b.getMessage)
    // duplicate branch refused
    val dup = intercept[Exception] {
      spark.sql("CALL gbr.system.branch('err.t', 'real')").collect()
    }
    assert(dup.getMessage.contains("already exists"), dup.getMessage)

    // streaming sink to a branch: loud refusal at epoch commit
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
    val mem = MemoryStream[Long]
    mem.addData(1L, 2L)
    val ckpt = Files.createTempDirectory("graft_branch_ck").toString
    val ex = intercept[Exception] {
      mem.toDF().select(col("value").as("id"))
        .writeStream.format("graft-tsv")
        .option("path", s"$rootDir/err/t")
        .option("branch", "real")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start().processAllAvailable()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(ex).exists(_.contains("streaming sink cannot target a branch")),
      msgs(ex).mkString(" | "))
    // the refusal fires at PLAN time (toStreaming), before any task runs —
    // no staged epoch files to sweep later
    val leftovers = new java.io.File(s"$rootDir/err/t").listFiles()
      .map(_.getName).filter(_.startsWith(".staging-"))
    assert(leftovers.isEmpty,
      s"plan-time refusal still staged files: ${leftovers.mkString(", ")}")
  }

  test("merge_branch retry after a crash mid-retirement is idempotent") {
    spark.sql("CREATE NAMESPACE gbr.rtry")
    spark.sql("CREATE TABLE gbr.rtry.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.rtry.t SELECT id FROM range(2)")
    spark.sql("CALL gbr.system.branch('rtry.t', 'mg')")
    spark.range(2, 4).select(col("id"))
      .writeTo("gbr.rtry.t").option("branch", "mg").append()
    val dir = new java.io.File(s"$rootDir/rtry/t")
    // simulate the crash window: merge published the new main generation
    // but died before retiring the branch chain — reproduce by merging,
    // then restoring the branch manifests from a pre-merge copy
    val branchManifests = dir.listFiles().filter(_.getName.contains(".b-mg"))
      .map(f => (f.getName, java.nio.file.Files.readAllBytes(f.toPath))).toSeq
    val m1 = spark.sql("CALL gbr.system.merge_branch('rtry.t', 'mg')").head()
    branchManifests.foreach { case (n, bytes) =>
      java.nio.file.Files.write(new java.io.File(dir, n).toPath, bytes)
    }
    // the retry must detect the already-merged state and finish the
    // retirement — NOT throw "not fast-forward"
    val m2 = spark.sql("CALL gbr.system.merge_branch('rtry.t', 'mg')").head()
    assert(m2.getLong(2) == m1.getLong(2),
      s"retry republished instead of finishing retirement: $m1 vs $m2")
    assert(!dir.listFiles().exists(_.getName.contains(".b-mg")),
      "retry did not retire the branch chain")
    assert(ids(spark.table("gbr.rtry.t")) == (0L to 3L))
    // a GENUINE divergence (different file list) still refuses, naming
    // drop_branch as the abandon path
    spark.sql("CALL gbr.system.branch('rtry.t', 'dv')")
    spark.range(10, 11).select(col("id"))
      .writeTo("gbr.rtry.t").option("branch", "dv").append()
    spark.sql("INSERT INTO gbr.rtry.t SELECT 99")
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.merge_branch('rtry.t', 'dv')").collect()
    }
    assert(e.getMessage.contains("not fast-forward") &&
      e.getMessage.contains("drop_branch"), e.getMessage)
  }

  test("merge retry still finishes retirement after an INTERVENING main commit") {
    // the ADVICE r13 window: merge publishes the new main generation,
    // dies before retiring the branch chain, and a FRESH main commit
    // lands before the retry — the retry must find the merged manifest
    // among the retained main generations (not just the head) and finish
    // the retirement instead of claiming divergence
    spark.sql("CREATE NAMESPACE gbr.rtry2")
    spark.sql("CREATE TABLE gbr.rtry2.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.rtry2.t SELECT id FROM range(2)")
    spark.sql("CALL gbr.system.branch('rtry2.t', 'mg')")
    spark.range(2, 4).select(col("id"))
      .writeTo("gbr.rtry2.t").option("branch", "mg").append()
    val dir = new java.io.File(s"$rootDir/rtry2/t")
    val branchManifests = dir.listFiles().filter(_.getName.contains(".b-mg"))
      .map(f => (f.getName, java.nio.file.Files.readAllBytes(f.toPath))).toSeq
    val m1 = spark.sql("CALL gbr.system.merge_branch('rtry2.t', 'mg')").head()
    branchManifests.foreach { case (n, bytes) =>
      java.nio.file.Files.write(new java.io.File(dir, n).toPath, bytes)
    }
    // the intervening commit: main's head no longer equals the branch head
    spark.sql("INSERT INTO gbr.rtry2.t SELECT 50")
    val m2 = spark.sql("CALL gbr.system.merge_branch('rtry2.t', 'mg')").head()
    assert(m2.getLong(2) == m1.getLong(2),
      s"retry after an intervening commit republished or refused: $m1 vs $m2")
    assert(!dir.listFiles().exists(_.getName.contains(".b-mg")),
      "retry did not retire the branch chain")
    assert(ids(spark.table("gbr.rtry2.t")) == (0L to 3L) :+ 50L)
  }

  test("an EMPTY branch head never false-matches a main truncate as a crashed merge") {
    // an empty entry set carries no per-commit identity: with the branch
    // truncated AND main independently truncated-then-reloaded, the retry
    // scan would find a main generation whose (empty) entries equal the
    // branch head's, "finish" a merge that never happened, and silently
    // retire a genuinely diverged branch whose truncate intent is then
    // lost — the empty head must take the loud not-fast-forward path
    spark.sql("CREATE NAMESPACE gbr.emh")
    spark.sql("CREATE TABLE gbr.emh.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.emh.t SELECT id FROM range(3)")
    spark.sql("CALL gbr.system.branch('emh.t', 'tr')")
    // branch head = empty entries (overwrite-all with an empty frame)
    spark.range(0).select(col("id"))
      .writeTo("gbr.emh.t").option("branch", "tr")
      .overwrite(org.apache.spark.sql.functions.lit(true))
    // main diverges: truncate (an empty main generation) then reload
    spark.sql("DELETE FROM gbr.emh.t WHERE id >= 0")
    spark.sql("INSERT INTO gbr.emh.t SELECT 99")
    val e = intercept[Exception] {
      spark.sql("CALL gbr.system.merge_branch('emh.t', 'tr')").collect()
    }
    assert(e.getMessage.contains("not fast-forward") &&
      e.getMessage.contains("drop_branch"), e.getMessage)
    // the refusal deleted nothing: main keeps its reload, the branch chain
    // survives for drop_branch/reconciliation
    assert(ids(spark.table("gbr.emh.t")) == Seq(99L))
    assert(new java.io.File(s"$rootDir/emh/t").listFiles()
      .exists(_.getName.contains(".b-tr")), "branch chain must survive refusal")
  }

  test("branch_conflicts: keys touched on both sides; empty when deltas commute") {
    import org.apache.spark.sql.connector.catalog.Identifier
    spark.sql("CREATE NAMESPACE gbr.cfl")
    spark.sql("CREATE TABLE gbr.cfl.t (id BIGINT, v BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.cfl.t SELECT id, id * 10 FROM range(4)")
    spark.sql("CALL gbr.system.branch('cfl.t', 'work')")
    val cat = spark.sessionState.catalogManager.catalog("gbr")
      .asInstanceOf[graft.sources.GraftTsvCatalog]
    def conflicts() = cat.branchConflicts(spark,
      Identifier.of(Array("cfl"), "t"), "work", Seq("id"))
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3), r.getLong(4))).toSeq

    // 1) branch moved, main did not: no conflicts possible
    spark.range(10, 12).select(col("id"), (col("id") * 10).as("v"))
      .writeTo("gbr.cfl.t").option("branch", "work").append()
    assert(conflicts().isEmpty, "main never moved — nothing can conflict")

    // 2) both moved, DISJOINT keys: deltas commute, report stays empty
    spark.sql("INSERT INTO gbr.cfl.t SELECT 20, 200")
    assert(conflicts().isEmpty,
      "disjoint keys must not conflict (deltas commute)")
    intercept[Exception] {  // and merge still refuses (file lists differ)
      spark.sql("CALL gbr.system.merge_branch('cfl.t', 'work')").collect()
    }

    // 3) overlapping keys, every class: main UPDATEs id=0 (delete+insert)
    //    and DELETEs id=1; the branch updates id=0, deletes id=1, and both
    //    sides inserted id=30 — three conflict keys, classified per side
    spark.sql("UPDATE gbr.cfl.t SET v = 1000 WHERE id = 0")
    spark.sql("DELETE FROM gbr.cfl.t WHERE id = 1")
    spark.sql("INSERT INTO gbr.cfl.t SELECT 30, 300")
    // branch-side mutations ride branch-scoped row-level writes
    spark.read.option("branch", "work").table("gbr.cfl.t")
      .filter(col("id") =!= 1)
      .withColumn("v", when(col("id") === 0, 7777L).otherwise(col("v")))
      .unionByName(spark.range(30, 31).select(col("id"), lit(301L).as("v")))
      .writeTo("gbr.cfl.t").option("branch", "work").overwrite(lit(true))
    assert(conflicts() == Seq(
      (0L, "update", 2L, "update", 2L),
      (1L, "delete", 1L, "delete", 1L),
      (30L, "insert", 1L, "insert", 1L)),
      s"conflict report mismatch: ${conflicts()}")
    // branch-only keys (10, 11) and commuting keys (20 on main) are absent
    assert(!conflicts().exists(c => Seq(10L, 11L, 20L).contains(c._1)))
  }

  test("branch manifest chain is retention-bounded: base + newest K survive") {
    spark.sql("CREATE NAMESPACE gbr.ret")
    spark.sql("CREATE TABLE gbr.ret.t (id BIGINT) USING `graft-tsv`")
    spark.sql("INSERT INTO gbr.ret.t SELECT id FROM range(2)")
    spark.sql("CALL gbr.system.branch('ret.t', 'long')")
    // 6 branch commits at default retention (1): base + head survive,
    // the middle generations' manifests are reclaimed by later publishes
    (0 until 6).foreach { i =>
      spark.range(10 * i, 10 * i + 2).select(col("id"))
        .writeTo("gbr.ret.t").option("branch", "long").append()
    }
    val gens = new java.io.File(s"$rootDir/ret/t").listFiles()
      .map(_.getName)
      .flatMap(n => graft.sources.GraftTsvManifest.branchGenNumber(n, "long"))
      .sorted.toSeq
    assert(gens.size <= 3 && gens.head == 1L && gens.last == 7L,
      s"branch chain not retention-bounded: $gens")
    // retention never loses data: head still reads base + every append,
    // and the fast-forward merge (base comparison) still works
    assert(ids(spark.read.option("branch", "long").table("gbr.ret.t")) ==
      (Seq(0L, 1L) ++ (0 until 6).flatMap(i => Seq(10L * i, 10L * i + 1))).sorted)
    spark.sql("CALL gbr.system.merge_branch('ret.t', 'long')")
    assert(ids(spark.table("gbr.ret.t")).size == 14)
  }
}
