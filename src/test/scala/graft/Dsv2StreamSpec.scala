package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Micro-batch streaming seam of the graft-tsv connector
  * (GraftTsvMicroBatchStream): file-arrival batches over a directory with
  * integer file-count offsets. Proves:
  *  - incremental delivery: files written between starts are picked up by
  *    the next run, already-processed ones are not re-read (offsets resume
  *    from the checkpoint);
  *  - transforms over the stream produce batch-identical results (the
  *    micro-batches run through the same reader factory as a batch scan);
  *  - the monotonic-name contract is enforced, not assumed: a file that
  *    sorts below the processed high-water mark fails the stream with a
  *    named error instead of being silently skipped.
  */
class Dsv2StreamSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("v", StringType)))

  private def writeFile(dir: String, name: String, rows: Range): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
    rows.foreach(i => w.println(s"$i\tv$i"))
    w.close()
  }

  // file sink (not memory): the memory sink refuses checkpoint RECOVERY,
  // and resuming from the committed offset is exactly what's under test
  private def runAvailableNow(dir: String, ckpt: String, outDir: String): Unit = {
    val q = spark.readStream.format("graft-tsv").schema(schema).load(dir)
      .filter(col("id") % 2 === 0)
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    q.stop()
  }

  test("file-arrival micro-batches: incremental, resumable, batch-identical") {
    val root = Files.createTempDirectory("graft_dsv2_stream").toFile
    root.deleteOnExit()
    val dir = new java.io.File(root, "in"); dir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val out = new java.io.File(root, "out").getAbsolutePath
    writeFile(dir.getAbsolutePath, "f-000.tsv", 0 until 10)
    writeFile(dir.getAbsolutePath, "f-001.tsv", 10 until 20)
    runAvailableNow(dir.getAbsolutePath, ckpt, out)
    assert(spark.read.parquet(out).collect().map(_.getLong(0)).sorted.toSeq ===
      (0 until 20 by 2).map(_.toLong))

    // second generation arrives; the resumed run must deliver ONLY it —
    // a re-read of f-000/f-001 would surface as duplicate rows in the sink
    writeFile(dir.getAbsolutePath, "f-002.tsv", 20 until 30)
    runAvailableNow(dir.getAbsolutePath, ckpt, out)
    val all = spark.read.parquet(out).collect().map(_.getLong(0)).sorted
    assert(all.toSeq === (0 until 30 by 2).map(_.toLong),
      s"resumed stream re-read processed files: ${all.mkString(",")}")
  }

  test("a file sorting below the processed high-water mark fails fast, never skips") {
    val root = Files.createTempDirectory("graft_dsv2_stream_bad").toFile
    root.deleteOnExit()
    val dir = new java.io.File(root, "in"); dir.mkdirs()
    val ckpt = new java.io.File(root, "ckpt").getAbsolutePath
    val out = new java.io.File(root, "out").getAbsolutePath
    writeFile(dir.getAbsolutePath, "f-005.tsv", 0 until 5)
    runAvailableNow(dir.getAbsolutePath, ckpt, out)
    assert(spark.read.parquet(out).count() == 3)

    // violates the monotonic-name contract: sorts before f-005
    writeFile(dir.getAbsolutePath, "f-001.tsv", 5 until 10)
    val e = intercept[Exception] {
      runAvailableNow(dir.getAbsolutePath, ckpt, out)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => Option(c.getMessage)
      .exists(_.contains("non-monotonically"))), e.toString)
    // and nothing from the violating generation got published
    assert(spark.read.parquet(out).count() == 3)
  }
}
