package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.GraftTsvManifest

/** History-independent commit cost (SCALE.md §25): past
  * [[GraftTsvManifest.CheckpointInlineMin]] live files the connector
  * stops republishing the full file list per generation and switches to
  * the delta-log/checkpoint shape — shared immutable `_mseg-*` segments
  * plus small `_gen` files carrying `#seg:`/`#del:`/inline-add deltas —
  * and reclamation becomes tombstone-driven (`#retired:` lines) instead
  * of a read-every-retained-manifest keep-set scan. This spec pins:
  *   - the format transition (inline → checkpoint → delta) and that
  *     every read along the way resolves the same content;
  *   - `#del` drops and time travel across delta generations;
  *   - tombstone reclamation timing — identical to the old scan's
  *     (a dropped file outlives the drop by exactly the retention
  *     window), pin-blocking included;
  *   - segment GC by reachability (checkpoints and vacuum), including
  *     branch seeds keeping their segment alive;
  *   - legacy-format upgrade: a handcrafted old-style manifest pair
  *     self-heals (tombstones synthesized once, files reclaimed on the
  *     same schedule, no corruption).
  */
class Dsv2ManifestScaleSpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_mfs").toString
  spark.conf.set("spark.sql.catalog.gmfs",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmfs.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmfs.db")

  private val fs = new Path(rootDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def rootNames(table: String): Seq[String] =
    fs.listStatus(new Path(s"$rootDir/db/$table")).toSeq
      .map(_.getPath.getName)

  private def headGen(table: String): String =
    rootNames(table).filter(n =>
      GraftTsvManifest.genNumber(n).isDefined).max

  private def manifestLines(table: String, name: String): Seq[String] = {
    val in = fs.open(new Path(s"$rootDir/db/$table/$name"))
    try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filter(_.nonEmpty).toList
    finally in.close()
  }

  private def append(table: String, lo: Int, n: Int, files: Int): Unit =
    spark.range(lo, lo + n).select(col("id"),
        concat(lit("v"), col("id")).as("v"))
      .repartitionByRange(files, col("id"))
      .writeTo(s"gmfs.db.$table").append()

  private def ids(table: String, suffix: String = ""): Seq[Long] =
    spark.sql(s"SELECT id FROM gmfs.db.$table $suffix")
      .collect().map(_.getLong(0)).sorted.toSeq

  test("inline → checkpoint → delta transition; every step reads back") {
    spark.sql("""CREATE TABLE gmfs.db.t (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '2')""")
    val t = "t"
    // 6 appends × 10 files: 10..60 live files — all below the threshold,
    // every manifest is the inline full-list (legacy) shape
    (0 until 6).foreach(i => append(t, i * 10000, 100, 10))
    assert(rootNames(t).forall(!_.startsWith(GraftTsvManifest.SegPrefix)))
    assert(manifestLines(t, headGen(t)).count(!_.startsWith("#")) == 60)
    // 7th append crosses CheckpointInlineMin=64 → checkpoint: one
    // `_mseg-*` segment holds the 70-entry list, the _gen is tiny
    append(t, 60000, 100, 10)
    val segs1 = rootNames(t).filter(_.startsWith(GraftTsvManifest.SegPrefix))
    assert(segs1.size == 1, s"expected one segment, got $segs1")
    val cpLines = manifestLines(t, headGen(t))
    assert(cpLines.exists(_.startsWith("#seg:")), cpLines.mkString("|"))
    assert(cpLines.count(!_.startsWith("#")) == 0, "checkpoint gen carries no inline entries")
    // 8th append (1 file) → DELTA: same segment ref + 1 inline add,
    // NOT a republished 71-line list
    append(t, 70000, 5, 1)
    val dLines = manifestLines(t, headGen(t))
    assert(dLines.exists(_.startsWith(s"#seg:${segs1.head}")))
    assert(dLines.count(!_.startsWith("#")) == 1, dLines.mkString("|"))
    assert(rootNames(t).count(_.startsWith(GraftTsvManifest.SegPrefix)) == 1,
      "a delta commit writes no new segment")
    // content: all 705 rows, resolved through segment + delta
    assert(ids(t) == ((0 until 6).flatMap(i =>
      (i * 10000) until (i * 10000 + 100)) ++
      (60000 until 60100) ++ (70000 until 70005)).map(_.toLong).sorted)
  }

  test("#del drops, time travel across deltas, tombstone reclamation") {
    val t = "t" // continues the table above: head = gen 8 (delta)
    val preDeleteGen = GraftTsvManifest.genNumber(headGen(t)).get
    val before = ids(t)
    spark.sql(s"DELETE FROM gmfs.db.t WHERE id >= 70000")
    val delLines = manifestLines(t, headGen(t))
    assert(delLines.exists(_.startsWith("#del:")) ||
      delLines.count(!_.startsWith("#")) == 0,
      s"expected a delta drop, got ${delLines.mkString("|")}")
    // the dropped part is TOMBSTONED (still on disk — older retained
    // generations reference it), not yet deleted
    val tombs = GraftTsvManifest.retiredOf(delLines)
    assert(tombs.nonEmpty, delLines.mkString("|"))
    assert(tombs.forall { case (_, rel) =>
      fs.exists(new Path(s"$rootDir/db/t/$rel")) })
    // time travel: the pre-delete snapshot still resolves byte-exact
    assert(ids(t, s"VERSION AS OF $preDeleteGen") == before)
    assert(ids(t).size == before.size - 5)
    // two more appends slide the retention window (retain=2) past the
    // drop generation → the tombstoned file is reclaimed and the
    // tombstone disappears — the same schedule the old full keep-set
    // scan enforced, with zero history reads
    append(t, 80000, 5, 1)
    append(t, 80010, 5, 1)
    val after = manifestLines(t, headGen(t))
    assert(GraftTsvManifest.retiredOf(after).isEmpty, after.mkString("|"))
    assert(tombs.forall { case (_, rel) =>
      !fs.exists(new Path(s"$rootDir/db/t/$rel")) },
      "dropped part must be reclaimed once its drop generation left the window")
    assert(ids(t).size == before.size - 5 + 10)
  }

  test("a pinned tag blocks tombstone reclamation until untagged") {
    val t = "t"
    val pinGen = GraftTsvManifest.genNumber(headGen(t)).get
    spark.sql(s"CALL gmfs.system.tag(`table` => 'db.t', tag => 'keep', " +
      s"generation => $pinGen)")
    spark.sql(s"DELETE FROM gmfs.db.t WHERE id >= 80000")
    val tombs = GraftTsvManifest.retiredOf(manifestLines(t, headGen(t)))
    assert(tombs.nonEmpty)
    append(t, 90000, 3, 1)
    append(t, 90010, 3, 1)
    append(t, 90020, 3, 1)
    // window slid past the drop, but the tag pins an OLDER generation
    // that may reference the files — they must survive, tombstones intact
    assert(tombs.forall { case (_, rel) =>
      fs.exists(new Path(s"$rootDir/db/t/$rel")) },
      "pin-blocked tombstones must not be reclaimed")
    assert(ids(t, s"VERSION AS OF 'keep'").nonEmpty)
    spark.sql("CALL gmfs.system.untag(`table` => 'db.t', tag => 'keep')")
    append(t, 90030, 3, 1)
    assert(tombs.forall { case (_, rel) =>
      !fs.exists(new Path(s"$rootDir/db/t/$rel")) },
      "after untag the next commit reclaims the blocked tombstones")
  }

  test("segment GC: a superseding checkpoint reclaims the old segment") {
    spark.sql("""CREATE TABLE gmfs.db.g (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '1')""")
    val t = "g"
    append(t, 0, 100, 70) // immediate checkpoint (70 ≥ 64)
    val seg1 = rootNames(t).filter(_.startsWith(GraftTsvManifest.SegPrefix))
    assert(seg1.size == 1)
    // deltas accumulate until inline ≥ max(64, live/4) forces the next
    // checkpoint; with 70-file appends every commit re-checkpoints
    append(t, 10000, 100, 70)
    append(t, 20000, 100, 70)
    val segsNow = rootNames(t).filter(_.startsWith(GraftTsvManifest.SegPrefix))
    assert(!segsNow.contains(seg1.head),
      s"superseded segment must be GC'd once no retained manifest references it: $segsNow")
    assert(segsNow.size <= 2, segsNow.mkString(","))
    assert(ids(t).size == 300)
  }

  test("changes feed and branch seeds resolve across segment manifests") {
    spark.sql("""CREATE TABLE gmfs.db.b (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '3')""")
    val t = "b"
    append(t, 0, 100, 70)   // gen 1: checkpoint
    append(t, 1000, 5, 1)   // gen 2: delta
    // changes (1, 2] = the appended 5 rows, resolved across formats
    val cat = spark.sessionState.catalogManager.catalog("gmfs")
      .asInstanceOf[graft.sources.GraftTsvCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(
      Array("db"), "b")
    val ch = cat.changes(spark, ident, "1", "2")
      .select("id").collect().map(_.getLong(0)).sorted
    assert(ch.toSeq == (1000L until 1005L))
    // branch seeded from a delta head references the same segment; the
    // segment must survive main's later checkpoints while the branch lives
    spark.sql("CALL gmfs.system.branch(`table` => 'db.b', name => 'dev')")
    val seedSeg = rootNames(t)
      .filter(_.startsWith(GraftTsvManifest.SegPrefix)).head
    append(t, 2000, 100, 70) // gen 3: new checkpoint on main
    append(t, 3000, 100, 70) // gen 4
    append(t, 4000, 100, 70) // gen 5 — gen 1-2 leave the window
    assert(rootNames(t).contains(seedSeg),
      "a live branch must keep its seed segment alive through main GC")
    val branchIds = spark.sql(
      "SELECT id FROM gmfs.db.b VERSION AS OF 'dev'")
      .collect().map(_.getLong(0)).sorted
    assert(branchIds.length == 105, s"branch snapshot: ${branchIds.length}")
    spark.sql("CALL gmfs.system.drop_branch(`table` => 'db.b', name => 'dev')")
    append(t, 5000, 1, 1)    // delta — segment GC waits for a checkpoint
    append(t, 6000, 100, 70) // still a delta (inline < live/4)
    // big enough that inline ≥ max(64, live/4) → checkpoint → GC runs,
    // and by now the seed's referencing generations left the window
    append(t, 7000, 400, 200)
    assert(!rootNames(t).contains(seedSeg),
      "after the branch retires, the next checkpoint GCs its segment")
  }

  test("legacy-format drop (no tombstones) self-heals: synthesized, then reclaimed") {
    spark.sql("""CREATE TABLE gmfs.db.l (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '2')""")
    val t = "l"
    append(t, 0, 10, 2)  // gen 1: two part files
    append(t, 100, 5, 1) // gen 2
    // handcraft the OLD format: rewrite gen 2 as a full list that DROPS
    // one of gen 1's files, with no #retired bookkeeping — exactly what
    // a pre-upgrade writer left behind after a DELETE
    val gen2 = headGen(t)
    val entries = GraftTsvManifest.readEntries(fs,
      new Path(s"$rootDir/db/l/$gen2"))
    val victim = entries.map(_._1).filter(_.startsWith("part-")).head
    val kept = entries.filterNot(_._1 == victim)
    val out = fs.create(new Path(s"$rootDir/db/l/$gen2"), true)
    try out.write(kept.map { case (rel, st) =>
      (if (st.isEmpty) rel else s"$rel\t$st") + "\n"
    }.mkString.getBytes("UTF-8"))
    finally out.close()
    assert(fs.exists(new Path(s"$rootDir/db/l/$victim")))
    // next commit: the victim is on disk, not live, not tombstoned →
    // the one-off scan classifies it (still referenced by retained gen 1)
    // and synthesizes its tombstone instead of corrupting anything
    append(t, 200, 5, 1) // gen 3
    val tombs = GraftTsvManifest.retiredOf(manifestLines(t, headGen(t)))
    assert(tombs.map(_._2).contains(victim), tombs.mkString(","))
    assert(fs.exists(new Path(s"$rootDir/db/l/$victim")),
      "still referenced by retained gen 1 — must survive")
    assert(ids(t, "VERSION AS OF 1").size == 10)
    // window slides past gen 1 → reclaimed on schedule
    append(t, 300, 5, 1) // gen 4: gen 1 leaves the window
    assert(!fs.exists(new Path(s"$rootDir/db/l/$victim")))
    assert(GraftTsvManifest.retiredOf(manifestLines(t, headGen(t))).isEmpty)
    assert(ids(t).size == 10 - 5 + 15)
  }

  test("metadata-complete aggregates and stats skipping survive the segment format") {
    spark.sql("""CREATE TABLE gmfs.db.m (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '1')""")
    append("m", 0, 1000, 70)   // checkpoint: stats cells live in the SEGMENT
    append("m", 5000, 10, 1)   // delta: inline entry carries its own stats
    // filterless COUNT/MIN/MAX answers from manifest metadata alone
    // (LocalTableScan — no distributed job); the rows counts and ranges
    // must come through segment resolution AND the delta's inline entry
    val r = spark.sql("SELECT count(*), min(id), max(id) FROM gmfs.db.m")
      .collect().head
    assert(r.getLong(0) == 1010 && r.getLong(1) == 0 && r.getLong(2) == 5009, r)
    val plan = spark.sql("SELECT count(*) FROM gmfs.db.m")
      .queryExecution.executedPlan.toString
    assert(plan.contains("LocalTableScan"),
      s"metadata-complete aggregate must stay driver-local over segments:\n$plan")
    // stats-based file skipping: a range predicate over the 70
    // range-partitioned files must open only a fraction of them
    val sel = spark.sql("SELECT count(*) FROM gmfs.db.m WHERE id BETWEEN 100 AND 140")
    assert(sel.collect().head.getLong(0) == 41)
    assert(ids("m", "WHERE id >= 5000").size == 10)
  }

  test("crash-orphaned segment is vacuumed; referenced segment survives") {
    spark.sql("""CREATE TABLE gmfs.db.v (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '1')""")
    val t = "v"
    append(t, 0, 100, 70) // checkpoint → one live segment
    val live = rootNames(t).filter(_.startsWith(GraftTsvManifest.SegPrefix)).head
    // a crashed commit leaves an unreferenced segment behind
    val orphan = s"${GraftTsvManifest.SegPrefix}deadbeef-crash"
    fs.create(new Path(s"$rootDir/db/v/$orphan"), true).close()
    spark.sql("CALL gmfs.system.vacuum(`table` => 'db.v', older_than_ms => 0)")
    val segs = rootNames(t).filter(_.startsWith(GraftTsvManifest.SegPrefix))
    assert(segs.contains(live), "vacuum must never reclaim a referenced segment")
    assert(!segs.contains(orphan), "vacuum reclaims crash-orphaned segments")
    assert(ids(t).size == 100)
  }

  test("a #del masks segment entries only — an inline re-add wins") {
    // hand-composed manifest: the rel is listed in the segment, carried
    // as #del, AND re-added inline. The inline-wins rule (readEntries +
    // publish's delsNext composition) makes the re-add visible; before
    // the fix the del silently hid it, safe only via the job-unique
    // part-naming convention that nothing near the manifest enforced.
    val dir = new Path(Files.createTempDirectory("graft_delwin").toString)
    val seg = s"${GraftTsvManifest.SegPrefix}t-seed"
    def write(name: String, body: String): Unit = {
      val o = fs.create(new Path(dir, name), true)
      try o.write(body.getBytes("UTF-8")) finally o.close()
    }
    write(seg, "part-a.tsv\tstats-old\npart-b.tsv\n")
    write("_gen-00000000000000000002",
      s"#seg:$seg\n#del:part-a.tsv\npart-a.tsv\tstats-new\npart-c.tsv\n")
    val entries = GraftTsvManifest.readEntries(
      fs, new Path(dir, "_gen-00000000000000000002"))
    assert(entries.map(_._1).sorted == Seq("part-a.tsv", "part-b.tsv", "part-c.tsv"),
      s"inline re-add must be visible, got $entries")
    assert(entries.toMap.apply("part-a.tsv") == "stats-new",
      "the INLINE entry's stats must win over the segment's")
  }
}
