package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface: the streaming twins of the batch
  * event-time queries (q_tumbling_window / q_sessionize in the catalog),
  * plus an arbitrary-stateful operator via flatMapGroupsWithState.
  *
  * Every transform here accepts either a batch or a streaming DataFrame —
  * the logical plan is identical; only the sink/trigger differ. That is
  * the Spark-native answer to the reference's batch-only model: the same
  * declarative plan runs incrementally with watermark-bounded state.
  *
  * Scale notes: state stores are per-key partitions (user_id / window
  * key), so state sharding follows the shuffle partitioning; watermarks
  * bound state size — without them a 100 TB stream accumulates unbounded
  * window state. */
object StreamingOps {

  final case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class UserTotal(user_id: Long, n: Long, total: Double)
  // public: the state encoder's generated code needs the public ctor/accessors
  final case class UserState(n: Long, total: Double)

  /** Event-time tumbling window counts with a watermark (late rows beyond
    * `lateness` are dropped; in append mode a window emits once its end
    * passes the watermark). */
  def tumblingCounts(
      events: DataFrame,
      window_ : String = "1 hour",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  /** Event-time session windows (gap-based), the streaming twin of the
    * batch q_sessionize. */
  def sessionCounts(
      events: DataFrame,
      gap: String = "30 minutes",
      lateness: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"))

  /** Streaming exact dedup: first occurrence of each event_id wins; the
    * watermark bounds dedup state (ids older than `lateness` are evicted —
    * the streaming twin of q_dedup_exact, and the standard ingestion
    * dedup for at-least-once sources). */
  def dedupEvents(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events.withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment join: the static dimension is broadcast to
    * every micro-batch (re-read per batch if the source supports it) —
    * the streaming analog of the reference's DistributedCache side-file. */
  def enrich(stream: DataFrame, dim: DataFrame, key: String): DataFrame =
    stream.join(org.apache.spark.sql.functions.broadcast(dim), key)

  /** Stream-stream join with an event-time range condition: each click
    * joins the purchases of the same user within the following `horizon`.
    * Both sides carry watermarks and the join condition bounds event time
    * on both, so Spark can evict buffered state — the REQUIRED shape for
    * an unbounded stream-stream join (without the time bound, both sides
    * buffer forever). Column prefixes keep the two event schemas apart.
    *
    * `joinType = "leftOuter"` is the "clicks with no purchase" shape: an
    * unmatched click is held in state until the watermark passes the end
    * of its match window (c_ts + horizon), then emitted once with NULL
    * purchase columns — so outer results arrive with a bounded delay of
    * horizon + lateness, and state stays bounded by the same eviction.
    * Inner semantics are unchanged (matches emit as they arrive). */
  def clickPurchaseJoin(
      clicks: DataFrame,
      purchases: DataFrame,
      horizon: String = "1 hour",
      lateness: String = "1 hour",
      joinType: String = "inner"): DataFrame = {
    val c = clicks.withWatermark("ts", lateness)
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("value").as("c_value"))
    val p = purchases.withWatermark("ts", lateness)
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
        col("value").as("p_value"))
    c.join(p, expr(
      s"c_user = p_user AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL $horizon"),
      joinType)
  }

  /** Idempotent micro-batch writer for `foreachBatch`: each batch lands in
    * its own `batch_id=` partition with DYNAMIC partition overwrite, so a
    * replayed batch (failure before the checkpoint commit → at-least-once
    * re-delivery) overwrites exactly its own partition instead of
    * appending duplicates — the standard exactly-once-EFFECT recipe for
    * file sinks that aren't transactional. At 100 TB the same property is
    * what makes recovery O(one batch): re-running batch N rewrites batch
    * N's files only. ExactlyOnceSinkSpec replays a batch through this
    * writer and asserts the output is unchanged. */
  def idempotentBatchWriter(path: String): (DataFrame, Long) => Unit =
    (df, batchId) =>
      df.withColumn("batch_id", lit(batchId))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id")
        .parquet(path)

  final case class TierEvent(
      user_id: Long, ts_us: Long, event_id: Long, tier: Long)
  final case class Scd2Closed(
      user_id: Long, tier: Long, valid_from_us: Long, valid_to_us: Long)
  final case class Scd2State(tier: Long, openedUs: Long)

  /** Streaming SCD Type-2: each user's open validity interval lives in
    * per-key state; when the tracked attribute CHANGES, the previous
    * interval emits CLOSED (append mode — closed rows are immutable, so
    * append is the honest output mode; the still-open interval is state,
    * not output, exactly as a warehouse's current-row pointer is). The
    * batch twin q_scd2_build derives the same intervals with lag/lead
    * windows; the streaming oracle is that query filtered to closed rows.
    *
    * Ordering contract: rows are sorted by (ts_us, event_id) PER KEY PER
    * BATCH in memory — bounded by one entity's per-batch volume, never
    * the stream's. Cross-batch order is the source's contract (the
    * file-stream test corpus is one file = one batch; a production feed
    * needs per-key event-time ordered delivery or a watermark-delayed
    * sort upstream, the same requirement every CDC-to-SCD2 consumer
    * documents). */
  def scd2Intervals(events: Dataset[TierEvent]): Dataset[Scd2Closed] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Scd2State, Scd2Closed](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[TierEvent], state: GroupState[Scd2State]) =>
          val sorted = rows.toVector.sortBy(e => (e.ts_us, e.event_id))
          val out = Vector.newBuilder[Scd2Closed]
          var st = state.getOption.orNull
          sorted.foreach { e =>
            if (st == null) st = Scd2State(e.tier, e.ts_us)
            else if (e.tier != st.tier) {
              out += Scd2Closed(uid, st.tier, st.openedUs, e.ts_us)
              st = Scd2State(e.tier, e.ts_us)
            }
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Arbitrary stateful processing: running per-user totals via
    * flatMapGroupsWithState (update mode) — the custom-state escape hatch
    * for semantics windows can't express. */
  def runningUserTotals(events: Dataset[UserEvent]): Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserTotal](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[UserEvent], state: GroupState[UserState]) =>
          val prev = state.getOption.getOrElse(UserState(0L, 0.0))
          var n = prev.n
          var total = prev.total
          rows.foreach { e => n += 1; total += e.value }
          state.update(UserState(n, total))
          Iterator.single(UserTotal(userId, n, total))
      }
  }
}
