package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.Tables
import Parity._

/** A STREAMING-EXECUTED catalog query, so incremental execution itself is
  * under the driver's correctness gate (the rest of the streaming surface
  * is spec-tested in graft.streaming): q_stream_tumbling runs the exact
  * transform of the batch q_tumbling_window as a Structured Streaming
  * job — parquet file-stream source, AvailableNow trigger (process all
  * available input, then stop), complete-mode memory sink — and must match
  * the SAME DuckDB oracle as the batch twin.
  *
  * One transform, two execution modes: [[tumblingExact]] is called by both
  * catalog entries, which is the Spark-native claim made concrete — the
  * declarative plan doesn't know whether its source is bounded.
  *
  * Complete mode (not append+watermark) because the gate compares the full
  * result: in append mode the final windows never emit (no later data ever
  * advances the watermark past them). The production-shaped variant with
  * watermarked append output is StreamingOps.tumblingCounts, spec-tested
  * for late-data semantics in StreamingSpec.
  */
object StreamingParity {

  /** Event-time tumbling aggregation, parity-exact (decimal partials,
    * window start as epoch ms) — shared verbatim by q_tumbling_window
    * (batch) and q_stream_tumbling (incremental). */
  def tumblingExact(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(dec("value")).as("sum_value"))
      .select(unix_millis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n"), col("sum_value"))

  /** Oracle for BOTH tumbling entries (batch and streaming twins must
    * match the same spec). */
  val tumblingOracleSql: String = s"""
      |SELECT CAST(epoch_ms(date_trunc('hour', ts)) AS BIGINT) AS window_start_ms,
      |  event_type, count(*) AS n, ${sqlDsum(sqlDec("value"))} AS sum_value
      |FROM events
      |GROUP BY 1, 2 ORDER BY window_start_ms, event_type
      |""".stripMargin.trim

  private val SinkTable = "graft_stream_tumbling_sink"

  private val qStreamTumbling = QueryDef(
    "q_stream_tumbling",
    Some(tumblingOracleSql),
    (spark, dir) => {
      val out = tumblingExact(Tables.loadEventsStream(spark, dir))
      val q = out.writeStream
        .format("memory")
        .queryName(SinkTable)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(SinkTable).orderBy("window_start_ms", "event_type")
    })

  val defs: Seq[QueryDef] = Seq(qStreamTumbling)
}
