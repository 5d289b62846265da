package graft

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.sources.GraftTsvManifest

/** Model-based property test of the COMMIT PROTOCOL under the round-15
  * manifest format (segments + deltas + tombstones + auto-compact): a
  * seeded random walk of table mutations, checked after EVERY op against
  * a driver-side model. The invariants are deliberately stronger than
  * any single-scenario spec:
  *
  *  1. CURRENT CONTENT: the table reads back exactly the model's rows.
  *  2. EVERY RESOLVABLE SNAPSHOT IS RIGHT: for every `_gen-N` manifest
  *     still on disk, `VERSION AS OF N` equals the model's snapshot at
  *     generation N — over-retention serving stale bytes, a dangling
  *     manifest whose parts were over-eagerly reclaimed, or a delta
  *     chain resolving to the wrong segment all fail here.
  *  3. NO LEAKED DATA FILES: every visible in-scope part on disk is
  *     referenced by some on-disk manifest or tombstoned on the head —
  *     reclamation missing files shows up as growth, reclamation going
  *     too far shows up as invariant 2 read failures.
  *  4. SEGMENTS STAY BOUNDED: unreferenced `_mseg-*` files may await the
  *     next checkpoint's GC but never accumulate past the manifest count.
  *
  * Ops: append (small/large), DELETE (modulo predicate), truncating
  * overwrite, CALL compact, tag/untag (pin interplay), vacuum, and the
  * BRANCH lifecycle (create / branch-write / fast-forward-merge /
  * diverged-merge-refusal / drop) — with the live branch's view checked
  * against ITS model every step while main mutates underneath, and
  * dropped-branch parts tracked through their documented limbo window
  * (unreferenced until the next main commit or vacuum reclaims them —
  * the leak invariant allows exactly that window and nothing more).
  * One seeded walk (fixed seed — failures must reproduce) of 60 ops; a
  * final vacuum must leave content intact with zero orphans, limbo
  * included, and a still-pinned tag resolving its exact snapshot. */
class Dsv2ManifestPropertySpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_mprop").toString
  spark.conf.set("spark.sql.catalog.gmp",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gmp.root", rootDir)
  spark.sql("CREATE NAMESPACE IF NOT EXISTS gmp.db")

  private val fs = new Path(rootDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)
  private val tdir = new Path(s"$rootDir/db/w")

  private def rootNames(): Seq[String] =
    fs.listStatus(tdir).toSeq.map(_.getPath.getName)

  private def read(suffix: String = ""): Map[Long, String] =
    spark.sql(s"SELECT id, v FROM gmp.db.w $suffix")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("random mutation walk: snapshots exact, no leaks, vacuum clean") {
    spark.sql("""CREATE TABLE gmp.db.w (id BIGINT, v STRING)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '4')""")
    val rnd = new scala.util.Random(42)
    var model = Map.empty[Long, String]
    var nextId = 0L
    // model snapshots keyed by the generation that produced them
    var snaps = Map.empty[Long, Map[Long, String]]
    var tagged: Option[(String, Long)] = None

    def df(rows: Seq[(Long, String)]) = {
      import spark.implicits._
      rows.toDF("id", "v")
    }
    def curGen(): Long = rootNames()
      .flatMap(GraftTsvManifest.genNumber).max
    def snapshot(): Unit = { snaps += (curGen() -> model) }

    def opAppend(): Unit = {
      val n = 1 + rnd.nextInt(if (rnd.nextBoolean()) 4 else 40)
      val rows = (0 until n).map { _ =>
        val id = nextId; nextId += 1; (id, s"v$id")
      }
      df(rows).repartition(1 + rnd.nextInt(3)).writeTo("gmp.db.w").append()
      model ++= rows
      snapshot()
    }
    def opDelete(): Unit = {
      val k = 2 + rnd.nextInt(5); val r = rnd.nextInt(k)
      val before = curGen()
      spark.sql(s"DELETE FROM gmp.db.w WHERE id % $k = $r")
      model = model.filter { case (id, _) => id % k != r }
      if (curGen() != before) snapshot() // no-op deletes publish nothing
    }
    def opOverwrite(): Unit = {
      val n = 1 + rnd.nextInt(10)
      val rows = (0 until n).map { _ =>
        val id = nextId; nextId += 1; (id, s"v$id")
      }
      df(rows).writeTo("gmp.db.w").overwrite(lit(true))
      model = rows.toMap
      snapshot()
    }
    def opCompact(): Unit = {
      val before = curGen()
      spark.sql("CALL gmp.system.compact(`table` => 'db.w', " +
        "target_bytes => 1048576)")
      if (curGen() != before) snapshot() // layout-only: same content
    }
    def opTag(): Unit = tagged match {
      case None =>
        val g = curGen()
        spark.sql(s"CALL gmp.system.tag(`table` => 'db.w', tag => 'pin', " +
          s"generation => $g)")
        tagged = Some(("pin", g))
      case Some((t, _)) =>
        spark.sql(s"CALL gmp.system.untag(`table` => 'db.w', tag => '$t')")
        tagged = None
    }
    def opVacuum(): Unit =
      spark.sql("CALL gmp.system.vacuum(`table` => 'db.w', older_than_ms => 0)")

    // ---- branch lifecycle inside the walk: the branch chain shares
    // copy-on-write parts with main, so tombstone reclamation, orphan
    // candidacy and segment GC all have to stay branch-aware while main
    // keeps mutating underneath — the interaction class where this
    // round's one review-caught bug lived (branch-only parts read as
    // orphans). The walk keeps at most one live branch.
    var branchModel: Option[Map[Long, String]] = None
    var branchBase = -1L
    // dropped-branch LIMBO: drop_branch deletes only the branch's
    // manifest chain; branch-only parts are documented to linger
    // unreferenced until "the next main commit's keep-set sweep (or
    // vacuum)" reclaims them — the leak invariant must allow exactly
    // that window and nothing more
    var limbo = Set.empty[String]
    def branchParts(): Set[String] = rootNames()
      .filter(n => GraftTsvManifest.branchOf(n).isDefined)
      .flatMap(n => GraftTsvManifest.read(fs, new Path(tdir, n))).toSet
    def opBranch(): Unit = branchModel match {
      case None =>
        spark.sql("CALL gmp.system.branch(`table` => 'db.w', name => 'dev')")
        branchModel = Some(model)
        branchBase = curGen()
      case Some(bm) =>
        val n = 1 + rnd.nextInt(6)
        val rows = (0 until n).map { _ =>
          val id = nextId; nextId += 1; (id, s"b$id")
        }
        df(rows).coalesce(1).writeTo("gmp.db.w")
          .option("branch", "dev").append()
        branchModel = Some(bm ++ rows)
    }
    def opMergeOrDrop(): Unit = branchModel.foreach { bm =>
      if (rnd.nextBoolean() && curGen() == branchBase) {
        // fast-forward still possible (main has not advanced)
        spark.sql("CALL gmp.system.merge_branch(`table` => 'db.w', " +
          "name => 'dev')")
        model = bm
        snapshot()
      } else {
        if (rnd.nextBoolean() && curGen() != branchBase) {
          // diverged merge must REFUSE loudly and change nothing
          val e = intercept[Exception] {
            spark.sql("CALL gmp.system.merge_branch(`table` => 'db.w', " +
              "name => 'dev')")
          }
          assert(e.getMessage.contains("not fast-forward"), e.getMessage)
          assert(read() == model, "refused merge must not mutate main")
        }
        limbo ++= branchParts()
        spark.sql("CALL gmp.system.drop_branch(`table` => 'db.w', " +
          "name => 'dev')")
        branchModel = None
      }
    }

    def checkInvariants(step: Int): Unit = {
      val names = rootNames()
      // 1. current content
      assert(read() == model, s"step $step: live content diverged")
      // 2. every resolvable generation serves its exact snapshot
      val onDisk = names.flatMap(GraftTsvManifest.genNumber).toSet
      snaps.filter { case (g, _) => onDisk.contains(g) }
        .foreach { case (g, want) =>
          val got = read(s"VERSION AS OF $g")
          assert(got == want,
            s"step $step: VERSION AS OF $g diverged (${got.size} vs ${want.size} rows)")
        }
      // 3. no leaked visible parts: on-disk ⊆ referenced ∪ tombstoned
      val manifests = names.filter(n =>
        GraftTsvManifest.genNumber(n).isDefined ||
          GraftTsvManifest.branchOf(n).isDefined)
      val referenced = manifests.flatMap(n =>
        GraftTsvManifest.read(fs, new Path(tdir, n))).toSet
      val headLines = {
        val head = names.filter(n => GraftTsvManifest.genNumber(n).isDefined).max
        val in = fs.open(new Path(tdir, head))
        try scala.io.Source.fromInputStream(in, "UTF-8").getLines()
          .filter(_.nonEmpty).toList
        finally in.close()
      }
      val tombstoned = GraftTsvManifest.retiredOf(headLines).map(_._2).toSet
      val visible = names.filter(n =>
        !n.startsWith("_") && !n.startsWith(".") && n.startsWith("part-"))
      val leaked = visible.filterNot(n =>
        referenced.contains(n) || tombstoned.contains(n) ||
          limbo.contains(n))
      assert(leaked.isEmpty, s"step $step: leaked parts $leaked")
      limbo = limbo.intersect(visible.toSet) // reclaimed limbo parts retire
      // 4. segments bounded (unreferenced ones await the next checkpoint GC)
      val segs = names.filter(_.startsWith(GraftTsvManifest.SegPrefix))
      assert(segs.size <= manifests.size + 2,
        s"step $step: segment pile-up ${segs.size} vs ${manifests.size} manifests")
    }

    // seed the table, then walk
    opAppend()
    (1 to 60).foreach { step =>
      rnd.nextInt(12) match {
        case 0 | 1 | 2 | 3 | 4 => opAppend()
        case 5 | 6 => opDelete()
        case 7 => if (rnd.nextBoolean()) opOverwrite() else opCompact()
        case 8 => opTag()
        case 9 => opVacuum()
        case 10 => opBranch()
        case 11 => opMergeOrDrop()
      }
      checkInvariants(step)
      // the live branch view must track ITS model while main mutates
      branchModel.foreach { bm =>
        assert(read("VERSION AS OF 'dev'") == bm,
          s"step $step: branch view diverged")
      }
    }
    // closing sweep: vacuum everything reclaimable, content must hold
    opVacuum()
    assert(read() == model, "post-vacuum content diverged")
    val leftover = rootNames().filter(n =>
      n.startsWith("part-") && limbo.contains(n))
    assert(leftover.isEmpty,
      s"vacuum must reclaim dropped-branch limbo parts: $leftover")
    // a tagged snapshot must still resolve after all of it
    tagged.foreach { case (t, g) =>
      assert(snaps.contains(g))
      assert(read(s"VERSION AS OF '$t'") == snaps(g),
        s"tag '$t' (gen $g) diverged after the walk")
    }
  }
}
