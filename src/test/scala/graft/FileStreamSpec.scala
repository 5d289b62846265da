package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps

/** Structured Streaming over a real FILE source (the production ingestion
  * path — discovery, schema pinning, and incremental batches differ from
  * MemoryStream): parquet files dropped into a watched directory are
  * processed incrementally and the windowed totals converge to the batch
  * answer over the same rows. */
class FileStreamSpec extends SparkSuite {

  test("file-source stream processes incrementally-arriving parquet") {
    val s = spark
    val watchDir = Files.createTempDirectory("graft-stream-in").toString
    val ckpt = Files.createTempDirectory("graft-stream-ckpt").toString

    val events = graft.sources.Tables.load(s, sfDir, "events")
      .select("ts", "event_type", "value")
    val Array(slice1, slice2) = events.randomSplit(Array(0.5, 0.5), seed = 42)

    // first file present before the stream starts
    slice1.coalesce(1).write.mode("overwrite").parquet(s"$watchDir/batch1")

    val stream = s.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "4")
      .parquet(s"$watchDir/*")
    val q = StreamingOps.tumblingCounts(stream)
      .writeStream.format("memory").queryName("file_tumbling")
      .option("checkpointLocation", ckpt)
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val afterFirst = s.table("file_tumbling")
        .agg(sum("n")).collect()(0).getLong(0)
      assert(afterFirst == slice1.count(), "first slice fully processed")

      // second file arrives while the stream runs
      slice2.coalesce(1).write.mode("overwrite").parquet(s"$watchDir/batch2")
      q.processAllAvailable()

      val streamed = s.table("file_tumbling")
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      val batch = StreamingOps.tumblingCounts(events)
        .orderBy("window_start", "event_type").collect()
        .map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2)))
      assert(streamed sameElements batch,
        "incremental file-source result must equal the batch plan")
    } finally {
      q.stop()
      Paths.get(watchDir).toFile.listFiles()
    }
  }
}
