package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Table-maintenance verbs of the graft catalog, exposed as SQL stored
  * procedures (Spark 4's `ProcedureCatalog` seam):
  *
  * {{{
  *   CALL g.system.compact(`table` => 'db.t', target_bytes => 67108864)
  *   CALL g.system.vacuum(`table` => 'db.t', older_than_ms => 3600000)
  * }}}
  *
  * COMPACT is the OPTIMIZE verb a streamed table needs: every streaming
  * epoch publishes one generation with its own small part files
  * (exactly-once commits cannot coalesce across epochs), so a long-lived
  * sink accumulates thousands of sub-split files whose per-file overhead
  * (open, seek, list) dominates a scan at 100 TB. Compaction bin-packs
  * each partition leaf's sub-target files into concatenation groups and
  * rewrites each group as ONE new part — a pure byte-level concatenation
  * (line-framed text concatenates verbatim; no parse, no shuffle), run
  * one Spark task per output file. The new generation's manifest drops
  * the consumed smalls and carries everything else untouched; column
  * stats for a merged file are the min/max MERGE of its inputs' manifest
  * cells (metadata-only — the rewrite never inspects values), so file
  * skipping survives compaction. Visibility is the usual single `_gen`
  * swap, and time-travel retention keeps the pre-compaction snapshot
  * readable: compaction changes layout, never content or history.
  *
  * VACUUM is the orphan sweeper: the commit protocol guarantees a crash
  * leaves only INVISIBLE garbage (dot-prefixed staging/tmp files, or
  * renamed-but-never-referenced parts from a crash between the part
  * renames and the manifest swap), and each next commit sweeps what it
  * can — but a table that is never written again keeps its orphans
  * forever. VACUUM deletes exactly the files no retained manifest
  * references, age-gated (`older_than_ms`) so an IN-FLIGHT write's
  * staging files are never swept from under it. Retained generations,
  * manifests, and the descriptor are never touched — a concurrent
  * reader of any retained snapshot is unaffected.
  */
private[sources] object GraftTsvMaintenance {

  private def typeFor(tn: String): Option[DataType] = tn match {
    case "long" => Some(LongType)
    case "integer" => Some(IntegerType)
    case "double" => Some(DoubleType)
    case "string" => Some(StringType)
    case "date" => Some(DateType)
    case _ => None
  }

  /** Merge the manifest stats cells of a concatenation group,
    * metadata-only. Row counts sum; a column's range is the min/max over
    * the inputs that RECORD it (absence in a cell means the file had no
    * non-null value for it, so skipping the absent input is exact, not
    * approximate); conflicting type tags drop the column. Any input
    * without a cell poisons the merge (its values are unknown) — the
    * merged file simply carries no stats and is never pruned. Per-block
    * entries are not carried (the inputs are sub-target files — at most
    * a handful of blocks each; file-level stats keep skipping useful). */
  private[sources] def mergeStats(cells: Seq[String]): String = {
    if (cells.exists(_.isEmpty)) return ""
    val rows = cells.map(GraftTsvManifest.rowCountOf)
    if (rows.exists(_.isEmpty)) return ""
    val parsed = cells.map(GraftTsvManifest.parseStats)
    val colsInOrder = parsed.flatMap(_.keys).distinct
    val merged = colsInOrder.flatMap { c =>
      val occ = parsed.flatMap(_.get(c))
      val tn = occ.head._1
      if (!occ.forall(_._1 == tn)) None
      else typeFor(tn).flatMap { dt =>
        try {
          val typed = occ.map { case (_, mnRaw, mxRaw) =>
            ((GraftTsvPushdown.convertCell(dt, mnRaw), mnRaw),
              (GraftTsvPushdown.convertCell(dt, mxRaw), mxRaw))
          }
          val mn = typed.map(_._1)
            .reduce((a, b) => if (GraftTsvPushdown.cmp(dt, a._1, b._1) <= 0) a else b)
          val mx = typed.map(_._2)
            .reduce((a, b) => if (GraftTsvPushdown.cmp(dt, a._1, b._1) >= 0) a else b)
          Some(GraftTsvManifest.statEscape(c) + ":" + tn + ":" +
            GraftTsvManifest.statEscape(mn._2) + ":" +
            GraftTsvManifest.statEscape(mx._2))
        } catch { case _: RuntimeException => None } // corrupt cell: no entry
      }
    }
    (s"#n:${rows.flatten.sum}" +: merged).mkString(",")
  }

  /** One compaction group: the ordered rel paths to concatenate (all in
    * the same partition leaf) and the merged stats cell for the output. */
  private[sources] final case class CompactGroup(
      rels: Seq[String], lens: Seq[Long], stats: String)

  /** Plan the concatenation groups for one generation's entries: within
    * each partition leaf, name-ordered sub-target files greedily pack
    * into groups capped at `targetBytes`; only groups of 2+ files are
    * rewrite units (a lone small file gains nothing from a rewrite).
    * Name order keeps the relative row order of the inputs — compaction
    * preserves content AND per-leaf ordering, so a downstream consumer
    * relying on the (documented-unordered, but stable) listing order
    * sees no value-level change. */
  private[sources] def planGroups(
      entries: Seq[(String, String)], lenOf: Map[String, Long],
      targetBytes: Long): Seq[CompactGroup] = {
    entries
      .filter(e => lenOf.get(e._1).exists(l => l > 0 && l < targetBytes))
      .groupBy { case (rel, _) =>
        if (rel.contains('/')) rel.substring(0, rel.lastIndexOf('/') + 1) else ""
      }
      .toSeq.sortBy(_._1)
      .flatMap { case (_, leafEntries) =>
        val sorted = leafEntries.sortBy(_._1)
        val groups = Seq.newBuilder[Seq[(String, String)]]
        var cur = List.empty[(String, String)]
        var curBytes = 0L
        sorted.foreach { e =>
          val len = lenOf(e._1)
          if (cur.nonEmpty && curBytes + len > targetBytes) {
            groups += cur.reverse; cur = Nil; curBytes = 0L
          }
          cur ::= e; curBytes += len
        }
        if (cur.nonEmpty) groups += cur.reverse
        groups.result().filter(_.size >= 2).map { g =>
          CompactGroup(g.map(_._1), g.map(e => lenOf(e._1)),
            mergeStats(g.map(_._2)))
        }
      }
  }

  /** Byte-level concatenation of one group into a staged file in the
    * same partition leaf (task-side; the attempt token in the staged
    * name keeps speculative retries from interleaving, same protocol as
    * every other staged write). Inputs the writer produced always end in
    * a newline; an adopted legacy file that doesn't gets one appended so
    * the next input starts on a fresh line. */
  private def concatOne(
      hconf: SerializableHadoopConf, dirStr: String, rels: Seq[String],
      stagedName: String): String = {
    val dir = new Path(dirStr)
    val fs = dir.getFileSystem(hconf.value)
    val head = rels.head
    val leaf = if (head.contains('/')) head.substring(0, head.lastIndexOf('/') + 1) else ""
    val stagedRel = leaf + stagedName
    val out = fs.create(new Path(dir, stagedRel), true)
    val buf = new Array[Byte](1 << 20)
    try {
      rels.foreach { rel =>
        val in = fs.open(new Path(dir, rel))
        var last: Byte = '\n'
        try {
          var n = in.read(buf)
          while (n > 0) {
            out.write(buf, 0, n)
            last = buf(n - 1)
            n = in.read(buf)
          }
        } finally in.close()
        if (last != '\n') out.write('\n')
      }
    } finally out.close()
    stagedRel
  }

  /** Run compaction; returns (files_before, files_after, bytes_compacted,
    * generation or -1 when nothing to do). */
  def compact(
      spark: SparkSession, dir: Path, partCols: Seq[String],
      retainGenerations: Int, targetBytes: Long,
      pinnedGens: Set[Long] = Set.empty): (Long, Long, Long, Long) = {
    require(targetBytes > 0,
      s"graft catalog compact: target_bytes must be positive, got $targetBytes")
    val hconf = SerializableHadoopConf.fromSession()
    val fs = dir.getFileSystem(hconf.value)
    if (!fs.exists(dir)) return (0L, 0L, 0L, -1L)
    val children = GraftTsvPublisher.allFiles(fs, dir)
    val curGen = children
      .collect { case (rel, _) if !rel.contains("/") => rel }
      .flatMap(GraftTsvManifest.genNumber).maxOption
    val entries: Seq[(String, String)] = curGen match {
      case Some(g) =>
        GraftTsvManifest.readEntries(fs, new Path(dir, GraftTsvManifest.genName(g)))
      case None => // legacy plain dir: adopt the visible listing, stats-less
        children.collect {
          case (rel, st) if st.isFile && {
            val n = st.getPath.getName
            !n.startsWith(".") && !n.startsWith("_")
          } => (rel, "")
        }
    }
    val lenOf = children.collect { case (rel, st) if st.isFile => rel -> st.getLen }.toMap
    val groups = planGroups(entries, lenOf, targetBytes)
    if (groups.isEmpty) return (entries.size.toLong, entries.size.toLong, 0L, -1L)

    val label = "cp" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val dirStr = dir.toString
    val slices = math.min(groups.size,
      math.max(1, spark.sparkContext.defaultParallelism))
    val staged = spark.sparkContext
      .parallelize(groups.zipWithIndex, slices)
      .map { case (g, i) =>
        val rel = concatOne(hconf, dirStr, g.rels,
          f".staging-$label-$i%05d-a" +
            java.util.UUID.randomUUID().toString.replace("-", "").take(8))
        (rel, g.stats)
      }
      .collect().toSeq
    val dropped = groups.flatMap(_.rels).toSet
    // the current generation's #epoch replay marker is CARRIED into the
    // compacted generation: a streaming sink's epoch-replay idempotence
    // check reads the latest manifest's marker, so a compact run between
    // two streaming invocations must not erase the last committed epoch
    // id (a replayed epoch would otherwise double-publish). Running
    // compact CONCURRENTLY with a live streaming writer is outside the
    // single-writer-per-table contract, as for every other writer pair.
    val carriedEpoch = curGen.flatMap(g =>
      GraftTsvManifest.epochOf(fs, new Path(dir, GraftTsvManifest.genName(g))))
    GraftTsvPublisher.publish(fs, dir, staged, label, epochMarker = carriedEpoch,
      truncate = false, dropped = dropped, partCols,
      sweepPrefix = s".staging-$label", retainGenerations = retainGenerations,
      pinnedGens = pinnedGens)
    val after = entries.size - dropped.size + groups.size
    (entries.size.toLong, after.toLong, groups.flatMap(_.lens).sum,
      curGen.getOrElse(0L) + 1)
  }

  /** Z-ORDER REWRITE (`CALL g.system.zorder`): rewrite the table
    * clustered by the Morton interleave of two integral dimensions —
    * what OPTIMIZE ZORDER is to a Delta table. Where [[compact]] is a
    * layout-only byte concatenation (no parse, preserves row order),
    * this is a REAL distributed rewrite: scan → range-normalize each
    * dimension to 16 bits from its measured min/max (one tiny agg) →
    * `repartitionByRange` + in-partition sort on the z-value → overwrite
    * through the table's own connector write. The payoff compounds with
    * the stats the writer already records: per-file AND per-block
    * min/max ranges become tight boxes on BOTH dimensions, so a
    * selective predicate on EITHER skips most files/splits — a
    * single-key sort only ever serves one dimension. Everything else
    * composes for free because the result is an ordinary generation
    * commit: time travel retains the pre-rewrite snapshot, tags pin it,
    * rollback undoes it, and the changes feed diffs it EMPTY (content
    * identical, layout changed — the same invariant as compact).
    *
    * Scale: the rewrite is one shuffle of the table (the unavoidable
    * cost of re-clustering), sized to `target_bytes` output files; the
    * dimension bounds come from one scalar aggregate, not a sort. NULL
    * dimension values normalize to the minimum (cluster together at z
    * low end). On a hive-partitioned table rows re-cluster WITHIN each
    * leaf (the writer routes by partition value as always); the z-sort
    * then orders each task's rows per leaf.
    *
    * Returns (files_before, files_after, new generation), or
    * (n, n, -1) when the table is empty or has no committed manifest. */
  def zorder(
      spark: SparkSession, fullSqlName: String, dir: Path,
      c1: String, c2: String, targetBytes: Long): (Long, Long, Long) = {
    require(targetBytes > 0,
      s"graft catalog zorder: target_bytes must be positive, got $targetBytes")
    require(c1 != c2,
      s"graft catalog zorder: the two clustering columns must differ, got '$c1' twice")
    val df = spark.table(fullSqlName)
    val schema = df.schema
    def check(c: String): Unit = {
      require(schema.fieldNames.contains(c),
        s"graft catalog zorder: column '$c' is not in the table schema " +
          s"(${schema.fieldNames.mkString(", ")})")
      schema(c).dataType match {
        case LongType | IntegerType | DateType => ()
        case dt => throw new IllegalArgumentException(
          s"graft catalog zorder: column '$c' has type ${dt.typeName} — " +
            "z-order clustering supports integral (bigint/int/date) dimensions")
      }
    }
    check(c1); check(c2)
    val hconf = SerializableHadoopConf.fromSession()
    val fs = dir.getFileSystem(hconf.value)
    val curGen = if (fs.exists(dir))
      fs.listStatus(dir).toSeq
        .flatMap(st => GraftTsvManifest.genNumber(st.getPath.getName)).maxOption
    else None
    if (curGen.isEmpty) return (0L, 0L, -1L)
    val entries = GraftTsvManifest.readEntries(fs,
      new Path(dir, GraftTsvManifest.genName(curGen.get)))
    if (entries.isEmpty) return (0L, 0L, -1L)
    import org.apache.spark.sql.functions._
    val b = df.agg(
      min(col(c1)).cast("long"), max(col(c1)).cast("long"),
      min(col(c2)).cast("long"), max(col(c2)).cast("long")).head()
    if (b.isNullAt(0) || b.isNullAt(2))
      return (entries.size.toLong, entries.size.toLong, -1L) // all-null dims
    // bucket width via BigInt so an extreme span cannot overflow the
    // multiply-then-divide normalization; the quotient is ≤ 2^48
    def width(lo: Long, hi: Long): Long =
      ((BigInt(hi) - BigInt(lo)) / 65536 + 1).toLong
    def nrm(c: String, lo: Long, w: Long): org.apache.spark.sql.Column =
      expr(s"(coalesce(cast(`$c` as bigint), ${lo}L) - ${lo}L) div ${w}L")
    val z = graft.functions.ZOrder.morton(
      nrm(c1, b.getLong(0), width(b.getLong(0), b.getLong(1))),
      nrm(c2, b.getLong(2), width(b.getLong(2), b.getLong(3))))
    val totalBytes = {
      val lenOf = GraftTsvPublisher.allFiles(fs, dir)
        .collect { case (rel, st) if st.isFile => rel -> st.getLen }.toMap
      entries.flatMap(e => lenOf.get(e._1)).sum
    }
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    df.withColumn("__graft_zval", z)
      .repartitionByRange(nFiles, col("__graft_zval"))
      .sortWithinPartitions("__graft_zval")
      .drop("__graft_zval")
      .writeTo(fullSqlName).overwrite(lit(true))
    val newGen = fs.listStatus(dir).toSeq
      .flatMap(st => GraftTsvManifest.genNumber(st.getPath.getName)).max
    val after = GraftTsvManifest.readEntries(fs,
      new Path(dir, GraftTsvManifest.genName(newGen))).size
    (entries.size.toLong, after.toLong, newGen)
  }

  /** ROLLBACK to a retained generation: publish a NEW generation whose
    * manifest lists exactly the target generation's entries — history
    * moves forward (the bad generations stay retained and inspectable
    * until the window slides past them), visibility flips on the same
    * single `_gen` rename as every commit, and no data is copied (the
    * target's part files are still on disk precisely BECAUSE the target
    * is inside the retention window). The undo verb for a bad merge,
    * delete, compact or overwrite — the operational complement of time
    * travel: `VERSION AS OF` reads the old snapshot, rollback makes it
    * current. Returns (fromGeneration, newGeneration). */
  def rollback(
      dir: Path, partCols: Seq[String], retainGenerations: Int,
      toGen: Long, pinnedGens: Set[Long] = Set.empty): (Long, Long) = {
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"graft catalog rollback: no table directory $dir")
    val children = GraftTsvPublisher.allFiles(fs, dir)
    val gens = children
      .collect { case (rel, _) if !rel.contains("/") => rel }
      .flatMap(GraftTsvManifest.genNumber)
    val curGen = gens.maxOption.getOrElse(
      throw new IllegalArgumentException(
        "graft catalog rollback: table has no generation manifests yet"))
    if (toGen == curGen) return (curGen, curGen) // no-op
    require(gens.contains(toGen),
      s"graft catalog rollback: generation $toGen is not retained " +
        s"(retained: ${gens.sorted.mkString(", ")}) — raise retain.generations " +
        "to keep a deeper undo window")
    val entries =
      GraftTsvManifest.readEntries(fs, new Path(dir, GraftTsvManifest.genName(toGen)))
    // retention guarantees these files exist; verify anyway — publishing
    // a manifest referencing a missing part would poison every read
    val onDisk = children.map(_._1).toSet
    val missing = entries.map(_._1).filterNot(onDisk.contains)
    require(missing.isEmpty,
      s"graft catalog rollback: generation $toGen references missing part " +
        s"files (${missing.take(3).mkString(", ")}) — state corrupted outside " +
        "the commit protocol")
    val newGen = curGen + 1
    val label = "rb" + java.util.UUID.randomUUID().toString.replace("-", "").take(10)
    val tmp = new Path(dir, s".manifest-$label")
    val out = fs.create(tmp, true)
    val lines = (s"#published:${System.currentTimeMillis()}" +:
      entries.map { case (rel, stats) =>
        if (stats.isEmpty) rel else s"$rel\t$stats"
      }).map(_ + "\n").mkString
    try out.write(lines.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, GraftTsvManifest.genName(newGen))))
      throw new IllegalStateException(
        s"graft catalog rollback: failed to publish generation $newGen — a " +
          "concurrent writer took it; directory state is untouched")
    // retention sweep, same keep-set rule as a commit: everything any
    // retained manifest references stays; manifests below the window go
    val retained = ((newGen - retainGenerations to newGen) ++ pinnedGens)
      .distinct.filter(g => gens.contains(g) || g == newGen)
    val branchKeep = children.collect {
      case (rel, _) if !rel.contains("/") &&
        GraftTsvManifest.branchOf(rel).isDefined => rel
    }.flatMap(m => GraftTsvManifest.read(fs, new Path(dir, m)))
    val keep = (retained.flatMap(g =>
      GraftTsvManifest.read(fs, new Path(dir, GraftTsvManifest.genName(g)))) ++
      branchKeep).toSet
    def inScope(rel: String): Boolean = {
      val segs = rel.split("/")
      segs.length == partCols.length + 1 &&
        partCols.indices.forall(i => segs(i).startsWith(partCols(i) + "="))
    }
    children.foreach { case (rel, st) =>
      val n = st.getPath.getName
      if (st.isFile && !n.startsWith(".") && !n.startsWith("_") &&
          inScope(rel) && !keep.contains(rel))
        fs.delete(st.getPath, false)
      else if (!rel.contains("/") &&
          GraftTsvManifest.genNumber(n).exists(g =>
            g < newGen - retainGenerations && !pinnedGens(g)))
        fs.delete(st.getPath, false)
    }
    (curGen, newGen)
  }

  // ---- BRANCHES (`_gen-N.b-<name>` manifest chains; see GraftTsvManifest) ----

  /** CREATE a branch: seed its chain with a byte-copy of the current
    * head manifest as `_gen-<head>.b-<name>`. Zero data copied — the
    * branch shares every part file with main (copy-on-write protects
    * both sides: branch writes add NEW parts, and every main publish
    * path's keep-set unions in branch-referenced files). Returns the
    * base generation. */
  def branch(dir: Path, name: String): Long = {
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    require(GraftTsvManifest.validBranchName(name),
      s"graft catalog branch: invalid name '$name' (letters, digits, '_', '-')")
    require(fs.exists(dir), s"graft catalog branch: no table directory $dir")
    val rootNames = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    val cur = rootNames.flatMap(GraftTsvManifest.genNumber).maxOption.getOrElse(
      throw new IllegalArgumentException(
        "graft catalog branch: table has no generation manifests yet — " +
          "commit something before branching"))
    require(!rootNames.exists(n =>
        GraftTsvManifest.branchOf(n).contains(name)),
      s"graft catalog branch: branch '$name' already exists")
    val src = new Path(dir, GraftTsvManifest.genName(cur))
    val tmp = new Path(dir,
      s".manifest-br-${java.util.UUID.randomUUID().toString.take(8)}")
    val in = fs.open(src)
    val out = fs.create(tmp, true)
    try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 64 * 1024)
    finally { in.close(); out.close() }
    val dst = new Path(dir, GraftTsvManifest.branchGenName(cur, name))
    if (!fs.rename(tmp, dst))
      throw new IllegalStateException(
        s"graft catalog branch: failed to publish $dst — a concurrent " +
          "branch of the same name won the race; state is untouched")
    cur
  }

  /** FAST-FORWARD merge: publish the branch head's file list as the next
    * MAIN generation (the rollback republish shape — no data copied),
    * then retire the branch chain. Refuses loudly when main advanced
    * past the branch base — a three-way content merge is a row-level
    * reconciliation job (the changes feed gives both deltas), not a
    * metadata operation this verb should silently fake. Returns
    * (branch head generation, new main generation). */
  def mergeBranch(dir: Path, name: String): (Long, Long) = {
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"graft catalog merge_branch: no table directory $dir")
    val children = GraftTsvPublisher.allFiles(fs, dir)
    val rootNames = children.collect { case (rel, _) if !rel.contains("/") => rel }
    val branchGens = rootNames.flatMap(n =>
      GraftTsvManifest.branchGenNumber(n, name))
    if (branchGens.isEmpty) {
      val known = rootNames.flatMap(GraftTsvManifest.branchOf).distinct.sorted
      throw new IllegalArgumentException(
        s"graft catalog merge_branch: branch '$name' does not exist" +
          (if (known.isEmpty) " (no branches)"
           else s" (branches: ${known.mkString(", ")})"))
    }
    val base = branchGens.min   // the seed copy made at branch creation
    val head = branchGens.max
    val mainCur = rootNames.flatMap(GraftTsvManifest.genNumber).max
    if (mainCur != base) {
      // A crash between publishing the merged main generation and retiring
      // the branch chain leaves the branch alive with head < mainCur; the
      // retried merge must FINISH the retirement idempotently rather than
      // claim divergence. Already-merged = SOME retained main generation
      // past the branch point carries exactly the branch head's file list
      // — scanning only the current head missed the window where a fresh
      // main commit landed between the crashed merge and the retry
      // (ADVICE r13). Entry sets are part-file lists with per-commit
      // UUIDs, so equality means the merged manifest itself (or a
      // content-identical republish, for which retirement is the same
      // no-op fast-forward). Cost: one manifest read per retained main
      // generation > base — bounded by manifest retention.
      val headEntries = GraftTsvManifest.readEntries(fs,
        new Path(dir, GraftTsvManifest.branchGenName(head, name))).toSet
      // an EMPTY entry set carries no per-commit identity — any truncate
      // generation on main would false-match and silently retire a
      // genuinely diverged branch; an empty branch head therefore never
      // resumes a crashed merge (the loud not-fast-forward below names
      // drop_branch as the recovery)
      val mergedAt =
        if (headEntries.isEmpty) None
        else rootNames.flatMap(GraftTsvManifest.genNumber)
          .filter(_ > base).sorted
          .find(g => GraftTsvManifest.readEntries(fs,
            new Path(dir, GraftTsvManifest.genName(g))).toSet == headEntries)
      mergedAt match {
        case Some(g) =>
          branchGens.foreach(bg => fs.delete(
            new Path(dir, GraftTsvManifest.branchGenName(bg, name)), false))
          return (head, g)
        case None =>
          throw new IllegalStateException(
            s"graft catalog merge_branch: not fast-forward — main advanced " +
              s"from generation $base (the branch point) to $mainCur while " +
              s"branch '$name' diverged; reconcile row-level (branch_conflicts " +
              "reports rows touched on both sides; the changes feed exposes " +
              "both deltas), re-branch from the current head, or drop_branch " +
              "to abandon the branch. (If a CRASHED merge's published " +
              "generation was already retention-pruned, the already-merged " +
              "scan above cannot see it — drop_branch is then the recovery; " +
              "the merged rows live on main regardless.)")
      }
    }
    val entries = GraftTsvManifest.readEntries(fs,
      new Path(dir, GraftTsvManifest.branchGenName(head, name)))
    val onDisk = children.map(_._1).toSet
    val missing = entries.map(_._1).filterNot(onDisk.contains)
    require(missing.isEmpty,
      s"graft catalog merge_branch: branch head references missing part " +
        s"files (${missing.take(3).mkString(", ")}) — state corrupted " +
        "outside the commit protocol")
    val newGen = math.max(mainCur, head) + 1
    val tmp = new Path(dir,
      s".manifest-mg-${java.util.UUID.randomUUID().toString.take(8)}")
    // CARRY the main head's #epoch replay marker, exactly as compact
    // does: a streaming sink's epoch-replay idempotence check reads the
    // LATEST main manifest's marker, so a merge run between two
    // streaming invocations must not erase the last committed epoch id
    // (a replayed epoch would otherwise double-publish)
    val carriedEpoch = GraftTsvManifest.epochOf(fs,
      new Path(dir, GraftTsvManifest.genName(mainCur)))
    val out = fs.create(tmp, true)
    val lines = (carriedEpoch.map(e => s"#epoch:$e").toSeq ++
      Seq(s"#published:${System.currentTimeMillis()}") ++
      entries.map { case (rel, stats) =>
        if (stats.isEmpty) rel else s"$rel\t$stats"
      }).map(_ + "\n").mkString
    try out.write(lines.getBytes("UTF-8"))
    finally out.close()
    if (!fs.rename(tmp, new Path(dir, GraftTsvManifest.genName(newGen))))
      throw new IllegalStateException(
        s"graft catalog merge_branch: failed to publish generation $newGen — " +
          "a concurrent writer took it; directory state is untouched")
    // the branch chain is merged — retire it; parts stay (now referenced
    // by the new main generation; retention reclaims what isn't, later)
    branchGens.foreach(g => fs.delete(
      new Path(dir, GraftTsvManifest.branchGenName(g, name)), false))
    (head, newGen)
  }

  /** DROP a branch: delete its manifest chain. Parts the branch alone
    * referenced become unreferenced and are reclaimed by the next main
    * commit's keep-set sweep (or vacuum) — drop itself deletes no data,
    * symmetric with untag. Returns the number of manifests removed. */
  def dropBranch(dir: Path, name: String): Long = {
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    require(fs.exists(dir), s"graft catalog drop_branch: no table directory $dir")
    val rootNames = fs.listStatus(dir).toSeq.map(_.getPath.getName)
    val gens = rootNames.flatMap(n => GraftTsvManifest.branchGenNumber(n, name))
    if (gens.isEmpty) {
      val known = rootNames.flatMap(GraftTsvManifest.branchOf).distinct.sorted
      throw new IllegalArgumentException(
        s"graft catalog drop_branch: branch '$name' does not exist" +
          (if (known.isEmpty) " (no branches)"
           else s" (branches: ${known.mkString(", ")})"))
    }
    gens.foreach(g => fs.delete(
      new Path(dir, GraftTsvManifest.branchGenName(g, name)), false))
    gens.size.toLong
  }

  /** Run the orphan sweep; returns (files_deleted, bytes_reclaimed).
    * Deletes only (a) this connector's own staging/tmp leftovers
    * (`.staging-*`, `.manifest-*`, `._graft_table-tmp-*`) and (b)
    * in-scope visible-style part files referenced by NO retained
    * manifest — both only when older than `olderThanMs` (the in-flight-
    * write guard). Foreign files (other dot-names, out-of-scope paths)
    * are never touched. */
  def vacuum(
      dir: Path, partCols: Seq[String], olderThanMs: Long): (Long, Long) = {
    require(olderThanMs >= 0,
      s"graft catalog vacuum: older_than_ms must be >= 0, got $olderThanMs")
    val fs = dir.getFileSystem(
      SparkSession.active.sparkContext.hadoopConfiguration)
    if (!fs.exists(dir)) return (0L, 0L)
    val children = GraftTsvPublisher.allFiles(fs, dir)
    val gens = children.collect {
      case (rel, _) if !rel.contains("/") &&
        (GraftTsvManifest.genNumber(rel).isDefined ||
          GraftTsvManifest.branchOf(rel).isDefined) => rel
    }
    val referenced: Set[String] = gens.flatMap(g =>
      GraftTsvManifest.read(fs, new Path(dir, g))).toSet
    // `_mseg-*` manifest segments are internal metadata, reclaimable by
    // the same reachability rule as orphan parts: referenced by no
    // on-disk manifest (publish also GC's them at checkpoint commits;
    // vacuum additionally catches segments stranded by crashed commits)
    val segReferenced: Set[String] = gens.flatMap(g =>
      GraftTsvManifest.segRefs(fs, new Path(dir, g))).toSet
    def inScope(rel: String): Boolean = {
      val segs = rel.split("/")
      segs.length == partCols.length + 1 &&
        partCols.indices.forall(i => segs(i).startsWith(partCols(i) + "="))
    }
    val cutoff = System.currentTimeMillis() - olderThanMs
    var deleted = 0L
    var bytes = 0L
    children.foreach { case (rel, st) =>
      val n = st.getPath.getName
      val ours = n.startsWith(".staging-") || n.startsWith(".manifest-") ||
        n.startsWith("._graft_table-tmp-") ||
        (!rel.contains("/") && n.startsWith(GraftTsvManifest.SegPrefix) &&
          !segReferenced.contains(n))
      val orphanPart = st.isFile && !n.startsWith(".") && !n.startsWith("_") &&
        inScope(rel) && !referenced.contains(rel)
      if ((ours || orphanPart) && st.getModificationTime <= cutoff) {
        val len = st.getLen
        if (fs.delete(st.getPath, false)) { deleted += 1; bytes += len }
      }
    }
    (deleted, bytes)
  }
}

/** The `ProcedureCatalog` half of [[GraftTsvCatalog]]: unbound/bound
  * procedure adapters around [[GraftTsvMaintenance]]. Each CALL returns
  * one summary row (a `LocalScan`) so the operation's effect is
  * observable in SQL, not just in the filesystem. */
private[sources] object GraftTsvProcedures {

  /** (dir, partCols, retain, tag-pinned gens) resolver the catalog
    * supplies — procedures take the table name as a string argument
    * (`'db.t'`). */
  type Resolve = String => (Path, Seq[String], Int, Set[Long])

  private def utf8(s: String): UTF8String = UTF8String.fromString(s)

  private def multiRowScan(schema: StructType, rowArr: Array[InternalRow])
      : java.util.Iterator[Scan] =
    java.util.Collections.singletonList[Scan](new LocalScan {
      override def readSchema(): StructType = schema
      override def rows(): Array[InternalRow] = rowArr
      override def description(): String = "graft-tsv maintenance result"
    }).iterator()

  private def singleRowScan(schema: StructType, row: InternalRow): java.util.Iterator[Scan] =
    multiRowScan(schema, Array(row))

  def compact(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "compact"
    override def description(): String =
      "rewrite a table's sub-target part files into target-sized ones " +
        "(byte-level concatenation, new generation, history retained)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "compact"
      override def description(): String = "graft-tsv compact"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("target_bytes", LongType)
          .defaultValue((64L * 1024 * 1024).toString)
          .comment("pack smaller files up to this output size").build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, partCols, retain, pinned) = resolve(input.getString(0))
        val (before, after, bytes, gen) = GraftTsvMaintenance.compact(
          SparkSession.active, dir, partCols, retain, input.getLong(1), pinned)
        singleRowScan(
          StructType(Seq(
            StructField("files_before", LongType, nullable = false),
            StructField("files_after", LongType, nullable = false),
            StructField("bytes_compacted", LongType, nullable = false),
            StructField("generation", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](before, after, bytes, gen)))
      }
    }
  }

  /** `CALL g.system.zorder(table, columns => 'c1,c2' [, target_bytes])`
    * — see [[GraftTsvMaintenance.zorder]]. Needs the catalog's NAME (not
    * just the resolved dir) because the rewrite reads and overwrites the
    * table through its SQL identifier — the connector's own scan and
    * commit paths do the work. */
  def zorder(catalogName: String, resolve: Resolve): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "zorder"
      override def description(): String =
        "rewrite a table clustered by the Morton interleave of two " +
          "integral columns (new generation; stats become tight on both)"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "zorder"
        override def description(): String = "graft-tsv zorder rewrite"
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("columns", StringType)
            .comment("two comma-separated integral columns to cluster by").build(),
          ProcedureParameter.in("target_bytes", LongType)
            .defaultValue((64L * 1024 * 1024).toString)
            .comment("output file size target").build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val tableName = input.getString(0)
          val (dir, _, _, _) = resolve(tableName)
          val cols = input.getString(1).split(",").map(_.trim).filter(_.nonEmpty)
          require(cols.length == 2,
            "graft catalog zorder: columns must name exactly two " +
              s"comma-separated dimensions (the 16-bit Morton interleave " +
              s"is two-dimensional), got '${input.getString(1)}'")
          val full = (catalogName +: tableName.split("\\.").toSeq)
            .map(p => s"`$p`").mkString(".")
          val (before, after, gen) = GraftTsvMaintenance.zorder(
            SparkSession.active, full, dir, cols(0), cols(1), input.getLong(2))
          singleRowScan(
            StructType(Seq(
              StructField("files_before", LongType, nullable = false),
              StructField("files_after", LongType, nullable = false),
              StructField("generation", LongType, nullable = false))),
            new GenericInternalRow(Array[Any](before, after, gen)))
        }
      }
    }

  def history(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "history"
    override def description(): String =
      "list a table's retained generations (publish instant, file/row " +
        "footprint, streaming epoch) — metadata-only at any table size"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "history"
      override def description(): String = "graft-tsv history"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _, _, _) = resolve(input.getString(0))
        val rows = GraftTsvCatalog
          .history(SparkSession.active, dir.toString).collect()
          .map(r => new GenericInternalRow(Array[Any](
            r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4))): InternalRow)
        multiRowScan(
          StructType(Seq(
            StructField("generation", LongType, nullable = false),
            StructField("published_ms", LongType, nullable = false),
            StructField("n_files", LongType, nullable = false),
            StructField("n_rows", LongType, nullable = false),
            StructField("epoch", LongType, nullable = false))),
          rows)
      }
    }
  }

  def rollback(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "rollback"
    override def description(): String =
      "make a retained generation current again by publishing its file " +
        "list as a new generation (no data copied; history moves forward)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "rollback"
      override def description(): String = "graft-tsv rollback"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("to_generation", LongType)
          .comment("retained generation to restore").build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, partCols, retain, pinned) = resolve(input.getString(0))
        val (from, to) = GraftTsvMaintenance.rollback(
          dir, partCols, retain, input.getLong(1), pinned)
        singleRowScan(
          StructType(Seq(
            StructField("from_generation", LongType, nullable = false),
            StructField("new_generation", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](from, to)))
      }
    }
  }

  def vacuum(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "vacuum"
    override def description(): String =
      "reclaim crash-orphaned staging and unreferenced part files older " +
        "than the age gate; retained generations are never touched"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "vacuum"
      override def description(): String = "graft-tsv vacuum"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("older_than_ms", LongType)
          .defaultValue((60L * 60 * 1000).toString)
          .comment("only files at least this old are reclaimed").build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, partCols, _, _) = resolve(input.getString(0))
        val (deleted, bytes) =
          GraftTsvMaintenance.vacuum(dir, partCols, input.getLong(1))
        singleRowScan(
          StructType(Seq(
            StructField("files_deleted", LongType, nullable = false),
            StructField("bytes_reclaimed", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](deleted, bytes)))
      }
    }
  }

  /** NAMED TAG on a retained generation (`CALL g.system.tag('db.t',
    * 'v1', 3)`): records name → generation in the table descriptor and
    * PINS the generation — every publish path's retention sweep keeps a
    * tagged manifest and its parts regardless of the window, so
    * `VERSION AS OF 'v1'` stays resolvable until untag. Re-tagging an
    * existing name moves it (`replaced` reports which). */
  /** `CALL g.system.branch(table, name)` / `merge_branch` / `drop_branch`
    * — see the [[GraftTsvMaintenance]] branch verbs. */
  def branchProc(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "branch"
    override def description(): String =
      "create a named writable branch at the current generation (zero " +
        "data copied; write via .option(\"branch\", name), read likewise)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "branch"
      override def description(): String = "graft-tsv branch"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType)
          .comment("branch name ([A-Za-z0-9_-])").build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _, _, _) = resolve(input.getString(0))
        val base = GraftTsvMaintenance.branch(dir, input.getString(1))
        singleRowScan(
          StructType(Seq(
            StructField("branch", StringType, nullable = false),
            StructField("base_generation", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](utf8(input.getString(1)), base)))
      }
    }
  }

  def mergeBranch(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "merge_branch"
    override def description(): String =
      "fast-forward a branch into main (publishes the branch head's file " +
        "list as the next main generation; refuses if main diverged)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "merge_branch"
      override def description(): String = "graft-tsv merge_branch"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _, _, _) = resolve(input.getString(0))
        val (head, newGen) =
          GraftTsvMaintenance.mergeBranch(dir, input.getString(1))
        singleRowScan(
          StructType(Seq(
            StructField("branch", StringType, nullable = false),
            StructField("merged_head", LongType, nullable = false),
            StructField("new_generation", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](
            utf8(input.getString(1)), head, newGen)))
      }
    }
  }

  def dropBranch(resolve: Resolve): UnboundProcedure = new UnboundProcedure {
    override def name(): String = "drop_branch"
    override def description(): String =
      "delete a branch's manifest chain (no data deleted; orphaned parts " +
        "reclaimed by the next commit or vacuum)"
    override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
      override def name(): String = "drop_branch"
      override def description(): String = "graft-tsv drop_branch"
      override def isDeterministic: Boolean = false
      override def parameters(): Array[ProcedureParameter] = Array(
        ProcedureParameter.in("table", StringType).build(),
        ProcedureParameter.in("name", StringType).build())
      override def call(input: InternalRow): java.util.Iterator[Scan] = {
        val (dir, _, _, _) = resolve(input.getString(0))
        val removed = GraftTsvMaintenance.dropBranch(dir, input.getString(1))
        singleRowScan(
          StructType(Seq(
            StructField("branch", StringType, nullable = false),
            StructField("manifests_removed", LongType, nullable = false))),
          new GenericInternalRow(Array[Any](utf8(input.getString(1)), removed)))
      }
    }
  }

  def tag(doTag: (String, String, Long) => Boolean): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "tag"
      override def description(): String =
        "name a retained generation; the tag pins it past retention and " +
          "resolves via VERSION AS OF '<name>'"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "tag"
        override def description(): String = "graft-tsv tag"
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("tag", StringType)
            .comment("snapshot name ([A-Za-z0-9._-], not all digits)").build(),
          ProcedureParameter.in("generation", LongType)
            .comment("retained generation to pin").build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val replaced = doTag(
            input.getString(0), input.getString(1), input.getLong(2))
          singleRowScan(
            StructType(Seq(
              StructField("tag", StringType, nullable = false),
              StructField("generation", LongType, nullable = false),
              StructField("replaced", BooleanType, nullable = false))),
            new GenericInternalRow(Array[Any](
              utf8(input.getString(1)), input.getLong(2), replaced)))
        }
      }
    }

  /** Remove a tag: the generation stays on disk until the NEXT publish's
    * retention sweep decides (still inside the window = kept; outside =
    * reclaimed then — untag never deletes anything itself). */
  def untag(doUntag: (String, String) => Long): UnboundProcedure =
    new UnboundProcedure {
      override def name(): String = "untag"
      override def description(): String =
        "remove a named tag; the generation unpins and follows normal " +
          "retention from the next commit"
      override def bind(inputType: StructType): BoundProcedure = new BoundProcedure {
        override def name(): String = "untag"
        override def description(): String = "graft-tsv untag"
        override def isDeterministic: Boolean = false
        override def parameters(): Array[ProcedureParameter] = Array(
          ProcedureParameter.in("table", StringType).build(),
          ProcedureParameter.in("tag", StringType).build())
        override def call(input: InternalRow): java.util.Iterator[Scan] = {
          val gen = doUntag(input.getString(0), input.getString(1))
          singleRowScan(
            StructType(Seq(
              StructField("tag", StringType, nullable = false),
              StructField("generation", LongType, nullable = false))),
            new GenericInternalRow(Array[Any](utf8(input.getString(1)), gen)))
        }
      }
    }
}
