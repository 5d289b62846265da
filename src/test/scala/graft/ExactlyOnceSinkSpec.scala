package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingOps

/** Exactly-once-EFFECT file sink via foreachBatch + dynamic partition
  * overwrite (StreamingOps.idempotentBatchWriter): a replayed micro-batch
  * (the at-least-once failure mode — crash after writing, before the
  * checkpoint commit) overwrites its own batch_id partition instead of
  * appending duplicates. */
class ExactlyOnceSinkSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("replaying a micro-batch through the idempotent writer does not duplicate rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val out = Files.createTempDirectory("graft-eos").toString
    val writer = StreamingOps.idempotentBatchWriter(out)

    val input = MemoryStream[Ev]
    val q = input.toDF().writeStream
      .foreachBatch(writer)
      .option("checkpointLocation", s"$out-ckpt")
      .start()
    try {
      input.addData(Ev(ts("2024-01-01 00:10:00"), "click", 1.0),
        Ev(ts("2024-01-01 00:20:00"), "view", 2.0))
      q.processAllAvailable()
      input.addData(Ev(ts("2024-01-01 00:30:00"), "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()

    // materialize BEFORE the replay: the overwrite swaps batch 0's file
    // out from under a lazy reader's cached listing
    val once = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(once.length == 3, s"expected 3 rows after 2 batches, got ${once.length}")

    // replay batch 0 (same data, same batch id) straight through the
    // writer — the failure-recovery path re-executes exactly this call
    writer(Seq(Ev(ts("2024-01-01 00:10:00"), "click", 1.0),
      Ev(ts("2024-01-01 00:20:00"), "view", 2.0)).toDF(), 0L)

    val replayed = spark.read.parquet(out).collect().map(_.toString).sorted
    assert(replayed.length == 3, "replayed batch must overwrite, not append")
    assert(replayed sameElements once)
  }
}
