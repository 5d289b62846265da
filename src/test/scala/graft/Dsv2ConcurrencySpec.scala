package graft

import java.nio.file.Files
import java.util.concurrent.CyclicBarrier

import scala.util.Random

import org.apache.spark.sql.functions._

/** The commit protocol under CONCURRENCY. The connector's claims:
  *
  *  - ATOMIC VISIBILITY: the generation-manifest rename is the only
  *    visibility flip, so a reader racing any number of commits sees some
  *    COMMITTED snapshot — never a torn one (half a batch, a carried
  *    entry missing). Proven by hammering reads against a live writer and
  *    asserting every observed state is a contiguous batch prefix.
  *  - GENERATION CAS: two writers that both resolved head generation N
  *    race their rename to `_gen-N+1`; rename-onto-existing fails on the
  *    loser, so exactly one commit per generation wins and the loser
  *    throws LOUDLY ("concurrent writer") — no silent lost update is
  *    possible, because publishing gen N+1 requires having LISTED gen N
  *    (whose entries the next manifest carries). Proven by racing two
  *    appender threads through a barrier and asserting final contents ==
  *    exactly the union of the commits that reported success.
  *  - ORDER-FREE MAINTENANCE: any interleaving of append / compact /
  *    vacuum / branch create→write→merge leaves the table equal to the
  *    serial model of the operations that succeeded. Proven with seeded
  *    randomized op sequences checked against a model after every step.
  *
  * (Single-writer remains the supported OPERATING mode — a commit's
  * cleanup may sweep a concurrent writer's staging files, failing that
  * writer loudly; these tests pin that the failure mode is loud refusal,
  * never corruption or silent loss.) */
class Dsv2ConcurrencySpec extends SparkSuite {

  private val rootDir = Files.createTempDirectory("graft_conc").toString
  spark.conf.set("spark.sql.catalog.gcc",
    classOf[graft.sources.GraftTsvCatalog].getName)
  spark.conf.set("spark.sql.catalog.gcc.root", rootDir)
  spark.sql("CREATE NAMESPACE gcc.db")

  /** One marked batch: rows (batch, 0..9). */
  private def batchDf(b: Long) = {
    val s = spark
    import s.implicits._
    (0L until 10L).map(i => (b, i)).toDF("batch", "id")
  }

  test("readers racing a committing writer only ever see committed prefixes") {
    spark.sql("""CREATE TABLE gcc.db.viz (batch BIGINT, id BIGINT)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '100')""")
    // deep retention: the test hammers MANY commits; reclamation of a
    // superseded generation mid-read is the documented retain-floor
    // trade, not the atomicity property under test here
    val nBatches = 12
    @volatile var writerErr: Option[Throwable] = None
    val writer = new Thread(() => {
      try (1 to nBatches).foreach { b =>
        batchDf(b.toLong).writeTo("gcc.db.viz").append()
      } catch { case t: Throwable => writerErr = Some(t) }
    })
    writer.start()
    val seen = scala.collection.mutable.Set[Long]()
    var reads = 0
    while (writer.isAlive || reads == 0) {
      val rows = spark.table("gcc.db.viz")
        .groupBy("batch").agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      reads += 1
      // every batch visible is COMPLETE (10 rows — no torn batch) and the
      // visible set is a contiguous prefix 1..j (commits are ordered; a
      // gap would mean a later commit's manifest dropped a carried entry)
      assert(rows.forall(_._2 == 10L), s"torn batch in $reads-th read: ${rows.toSeq}")
      assert(rows.map(_._1).toSeq == (1L to rows.length.toLong),
        s"non-prefix snapshot: ${rows.toSeq}")
      seen += rows.length.toLong
    }
    writer.join()
    writerErr.foreach(throw _)
    val fin = spark.table("gcc.db.viz").count()
    assert(fin == nBatches * 10L, s"final count $fin")
    assert(reads > 0 && seen.nonEmpty)
  }

  test("two racing writers: one generation per CAS win, losers fail loud, " +
      "no silent lost update") {
    spark.sql("""CREATE TABLE gcc.db.race (batch BIGINT, id BIGINT)
      USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '100')""")
    val perThread = 6
    val barrier = new CyclicBarrier(2)
    // thread k appends batches k*100+1 .. k*100+perThread, reporting which
    // commits SUCCEEDED; a loser must throw, never half-commit
    class W(k: Int) extends Thread {
      val ok = scala.collection.mutable.Set[Long]()
      val failed = scala.collection.mutable.Set[Long]()
      @volatile var unexpected: Option[Throwable] = None
      override def run(): Unit =
        try (1 to perThread).foreach { i =>
          val b = k * 100L + i
          // timed await: if the peer died, a bare await would hang the
          // suite — a broken/timed-out barrier just means no rendezvous
          // for this round, the append still runs
          try barrier.await(20, java.util.concurrent.TimeUnit.SECONDS)
          catch { case _: Exception => () }
          try { batchDf(b).writeTo("gcc.db.race").append(); ok += b }
          catch { case e: Throwable =>
            // loud refusal is the contract: CAS loss or a swept staging
            // file both surface as an exception on THIS commit
            failed += b
          }
        } catch { case t: Throwable => unexpected = Some(t) }
    }
    val (w1, w2) = (new W(1), new W(2))
    w1.start(); w2.start(); w1.join(); w2.join()
    w1.unexpected.foreach(throw _); w2.unexpected.foreach(throw _)
    val succeeded = (w1.ok ++ w2.ok).toSet
    assert(succeeded.nonEmpty, "every racing commit failed — no progress at all")
    val byBatch = spark.table("gcc.db.race")
      .groupBy("batch").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // visible == exactly the successful commits, each complete: a batch
    // visible but not reported ok would be a lying failure; a batch
    // reported ok but missing rows would be a lost update
    assert(byBatch.keySet == succeeded,
      s"visible ${byBatch.keySet.toSeq.sorted} != succeeded ${succeeded.toSeq.sorted}" +
        s" (failed: ${(w1.failed ++ w2.failed).toSeq.sorted})")
    assert(byBatch.values.forall(_ == 10L), s"torn batch: $byBatch")
    // the table is not wedged: a serial append after the race succeeds
    batchDf(999L).writeTo("gcc.db.race").append()
    assert(spark.table("gcc.db.race").filter(col("batch") === 999L).count() == 10L)
  }

  test("randomized append/compact/vacuum/branch-merge interleavings match " +
      "the serial model") {
    (1 to 3).foreach { seed =>
      val rnd = new Random(seed)
      val t = s"mix$seed"
      spark.sql(s"""CREATE TABLE gcc.db.$t (batch BIGINT, id BIGINT)
        USING `graft-tsv` TBLPROPERTIES ('retain.generations' = '3')""")
      // seed one committed generation: branching an empty table refuses
      batchDf(1L).writeTo(s"gcc.db.$t").append()
      var model = Set(1L)  // committed batch markers on MAIN
      var next = 1L
      var branchOpen = false
      var branchBatches = Set.empty[Long]
      (1 to 14).foreach { _ =>
        rnd.nextInt(5) match {
          case 0 | 1 => // append to main
            next += 1
            batchDf(next).writeTo(s"gcc.db.$t").append()
            model += next
          case 2 => // compact (content no-op)
            spark.sql(s"CALL gcc.system.compact(`table` => 'db.$t')").collect()
          case 3 => // vacuum with an in-flight guard window (content no-op)
            spark.sql(
              s"CALL gcc.system.vacuum(`table` => 'db.$t', older_than_ms => 0)"
            ).collect()
          case 4 => // branch lifecycle step: create+write, or merge back
            if (!branchOpen) {
              spark.sql(s"CALL gcc.system.branch('db.$t', 'side')").collect()
              next += 1
              batchDf(next).writeTo(s"gcc.db.$t").option("branch", "side").append()
              branchBatches += next
              branchOpen = true
            } else {
              // merge is fast-forward-only: if a main append landed since
              // the branch point, the refusal is the CORRECT outcome —
              // the model then abandons the branch via drop_branch (the
              // path the error message names)
              try {
                spark.sql(s"CALL gcc.system.merge_branch('db.$t', 'side')").collect()
                model ++= branchBatches
              } catch {
                case e: Exception if e.getMessage.contains("not fast-forward") =>
                  spark.sql(s"CALL gcc.system.drop_branch('db.$t', 'side')").collect()
              }
              branchBatches = Set.empty
              branchOpen = false
            }
        }
        // invariant after EVERY step: main == model exactly (branch
        // writes invisible until merged), every batch complete
        val byBatch = spark.table(s"gcc.db.$t")
          .groupBy("batch").agg(count(lit(1)).as("n"))
          .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
        assert(byBatch.keySet == model,
          s"seed $seed: visible ${byBatch.keySet.toSeq.sorted} != model ${model.toSeq.sorted}")
        assert(byBatch.values.forall(_ == 10L), s"seed $seed: torn batch $byBatch")
      }
    }
  }
}
