package graft

import org.apache.spark.sql.DataFrame

/** The reliable-checkpoint seam (graft.Checkpoints): iterative queries
  * default to executor-local lineage truncation, and switch — at the SAME
  * call sites — to reliable `checkpoint()` when `graft.checkpoint.dir` is
  * set. The spec runs the two heaviest convergence loops through the
  * reliable path and asserts they reach the same fixpoint as the default
  * path (VERDICT r05 item 2: losing an executor mid-loop must not be able
  * to kill a 100 TB run when the conf opts in to durability). */
class CheckpointSpec extends SparkSuite {

  private def collectSorted(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).toSeq

  private def withReliableDir[A](f: => A): A = {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ckpt_spec").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try f
    finally {
      spark.conf.unset(Checkpoints.DirKey)
      // the context keeps the resolved UUID subdir; later suites must not
      // silently inherit reliable mode semantics from a stale setting —
      // Checkpoints keys off the conf, not the context dir, so unsetting
      // the conf restores the default path
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("truncate uses reliable checkpoint files when the conf is set") {
    import spark.implicits._
    withReliableDir {
      val df = Checkpoints.truncate(Seq(1, 2, 3).toDF("x"))
      // a reliably-checkpointed Dataset's RDD lineage bottoms out in
      // ReliableCheckpointRDD; the local path keeps LocalCheckpointRDD
      assert(df.rdd.toDebugString.contains("ReliableCheckpointRDD"))
      assert(df.as[Int].collect().sorted === Array(1, 2, 3))
    }
    val local = Checkpoints.truncate(Seq(4, 5).toDF("x"))
    assert(!local.rdd.toDebugString.contains("ReliableCheckpointRDD"))
  }

  test("components loop reaches the same fixpoint through the reliable path") {
    val q = queries.Catalog.queries("q_dedup_components")
    val default = collectSorted(q(spark, sfDir))
    val reliable = withReliableDir(collectSorted(q(spark, sfDir)))
    assert(reliable === default)
  }

  test("re-pointing graft.checkpoint.dir takes effect (not first-write-wins)") {
    import spark.implicits._
    def rddCheckpointDirOf(df: DataFrame): String =
      df.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD =>
          l.rdd.getCheckpointFile.getOrElse(fail("no reliable checkpoint file"))
        case other => fail(s"not a checkpoint root: $other")
      }
    val a = java.nio.file.Files.createTempDirectory("graft_ckpt_a").toString
    val b = java.nio.file.Files.createTempDirectory("graft_ckpt_b").toString
    try {
      spark.conf.set(Checkpoints.DirKey, a)
      val inA = rddCheckpointDirOf(Checkpoints.truncate(Seq(1).toDF("x")))
      assert(inA.contains(new java.io.File(a).getName), inA)
      // store A decommissioned: the conf is re-pointed mid-session — the
      // seam must follow it, not keep writing into A forever
      spark.conf.set(Checkpoints.DirKey, b)
      val inB = rddCheckpointDirOf(Checkpoints.truncate(Seq(2).toDF("x")))
      assert(inB.contains(new java.io.File(b).getName),
        s"checkpoint still under the old dir: $inB")
    } finally {
      spark.conf.unset(Checkpoints.DirKey)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(a))
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(b))
    }
  }

  test("iteration retains O(1) checkpointed frames, not O(rounds)") {
    // Spark never deletes reliable checkpoint files on its own; the loops
    // release superseded rounds. 50 rounds must not leave 50 rdd-* dirs.
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_leak").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      queries.Catalog.queries("q_dedup_components")(spark, sfDir).collect()
      val rddDirs = scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
        _.filter(p => p.getFileName.toString.startsWith("rdd-"))
          .filter(p => java.nio.file.Files.isDirectory(p))
          .count())
      // live at exit: the last hop (+ the pre-loop candidate/docset
      // truncations outside the loop) — a handful, NOT one per round
      assert(rddDirs > 0, "reliable path did not checkpoint at all")
      assert(rddDirs <= 6, s"checkpoint store leaked $rddDirs rdd-* dirs")
    } finally {
      spark.conf.unset(Checkpoints.DirKey)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("pagerank matches through the reliable path") {
    val q = queries.Catalog.queries("q_pagerank")
    val default = collectSorted(q(spark, sfDir))
    val reliable = withReliableDir(collectSorted(q(spark, sfDir)))
    assert(reliable === default)
  }

  test("converged-pagerank loop releases superseded rounds in reliable mode") {
    // 33 rounds on this corpus: the per-round release target must be the
    // CHECKPOINTED frame, not a projection of it (release() only reclaims
    // a bare LogicalRDD root) — a wrong handle leaks one O(V) frame per
    // round and this count explodes
    val dir = java.nio.file.Files.createTempDirectory("graft_ckpt_prc").toString
    spark.conf.set(Checkpoints.DirKey, dir)
    try {
      val rows = queries.Catalog.queries("q_pagerank_converged")(spark, sfDir)
        .collect()
      assert(rows.nonEmpty && rows.head.getLong(2) > 10,
        s"expected a multi-round convergence, got ${rows.headOption}")
      val rddDirs = scala.util.Using.resource(
          java.nio.file.Files.walk(java.nio.file.Paths.get(dir)))(
        _.filter(p => p.getFileName.toString.startsWith("rdd-"))
          .filter(p => java.nio.file.Files.isDirectory(p))
          .count())
      // live at exit: the final round frame + the prGraph layout frames —
      // a handful, NOT one per round
      assert(rddDirs > 0, "reliable path did not checkpoint at all")
      assert(rddDirs <= 6, s"converged loop leaked $rddDirs rdd-* dirs " +
        s"for ${rows.head.getLong(2)} rounds")
    } finally {
      spark.conf.unset(Checkpoints.DirKey)
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
    }
  }

  test("truncate saturates carried size estimates at Long.MaxValue") {
    import org.apache.spark.sql.functions._
    // build a frame whose ESTIMATED size compounds past Long.MaxValue:
    // repeated checkpoint→self-join rounds multiply the carried stat
    // exactly like a convergence loop does (the q_pagerank_converged
    // freeze: million-bit BigInt products at every plan)
    var df = Checkpoints.truncate(
      spark.range(100).select(col("id"), (col("id") * 2).as("v")))
    (1 to 6).foreach { _ =>
      val other = df.select(col("id"), col("v").as("v2"))
      df = Checkpoints.truncate(
        df.join(other, "id").join(other.select(col("id"),
          col("v2").as("v3")), "id").select(col("id"), col("v")))
    }
    val stats = df.queryExecution.optimizedPlan.stats
    assert(stats.sizeInBytes <= BigInt(Long.MaxValue),
      s"carried estimate not capped: bitLength=${stats.sizeInBytes.bitLength}")
    assert(stats.rowCount.forall(_ <= BigInt(Long.MaxValue)))
    // results are untouched by the cap
    assert(df.count() == 100)
    // sane (sub-cap) estimates pass through unchanged: the cap must not
    // inflate or deflate a small checkpointed frame's carried stats
    val small = spark.range(10).select(col("id"))
    val smallStats = small.queryExecution.optimizedPlan.stats
    val ck = Checkpoints.truncate(small)
    assert(ck.queryExecution.optimizedPlan.stats.sizeInBytes ==
      smallStats.sizeInBytes)
  }
}
