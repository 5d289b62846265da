package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingOps
import graft.streaming.StreamingOps.UserEvent

final case class Ev(ts: Timestamp, event_type: String, value: Double)
final case class UEv(ts: Timestamp, user_id: Long)

/** Structured Streaming behavior: incremental results must equal the batch
  * plan on the same data (they share the logical plan), and the watermark
  * must drop late rows in append mode. */
class StreamingSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("streaming tumbling window (complete mode) equals the batch plan") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val rows = Seq(
      Ev(ts("2024-01-01 00:10:00"), "click", 1.0),
      Ev(ts("2024-01-01 00:40:00"), "click", 2.0),
      Ev(ts("2024-01-01 00:50:00"), "view", 3.0),
      Ev(ts("2024-01-01 01:10:00"), "click", 4.0),
      Ev(ts("2024-01-01 02:05:00"), "view", 5.0))

    val input = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(input.toDF())
      .writeStream.format("memory").queryName("tumbling_complete")
      .outputMode("complete").start()
    try {
      input.addData(rows.take(3))
      q.processAllAvailable()
      input.addData(rows.drop(3))
      q.processAllAvailable()
      val streamed = s.table("tumbling_complete")
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      val batch = StreamingOps.tumblingCounts(rows.toDF())
        .orderBy("window_start", "event_type")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2), r.getDouble(3)))
      assert(streamed.nonEmpty && (streamed sameElements batch))
    } finally q.stop()
  }

  test("watermark drops late data in append mode") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[Ev]
    val q = StreamingOps.tumblingCounts(input.toDF(), lateness = "30 minutes")
      .writeStream.format("memory").queryName("tumbling_append")
      .outputMode("append").start()
    try {
      // Batch 1: two events in hour 0, then one far ahead at hour 6 —
      // advances the watermark to 05:30, finalizing (and emitting) hour 0.
      input.addData(Seq(
        Ev(ts("2024-01-01 00:10:00"), "click", 1.0),
        Ev(ts("2024-01-01 00:20:00"), "click", 1.0),
        Ev(ts("2024-01-01 06:00:00"), "view", 9.0)))
      q.processAllAvailable()
      // Batch 2: a straggler for hour 0, far below the watermark → dropped.
      input.addData(Seq(Ev(ts("2024-01-01 00:30:00"), "click", 100.0)))
      q.processAllAvailable()
      // Advance watermark past hour 6 so every surviving window emits.
      input.addData(Seq(Ev(ts("2024-01-01 09:00:00"), "view", 0.0)))
      q.processAllAvailable()

      val out = s.table("tumbling_append")
        .filter(col("window_start") === lit(ts("2024-01-01 00:00:00")))
        .collect()
      assert(out.length == 1, s"expected one finalized hour-0 row, got ${out.toSeq}")
      assert(out(0).getLong(2) == 2L, "late straggler must not be counted")
      assert(out(0).getDouble(3) == 2.0)
    } finally q.stop()
  }

  test("session windows merge events within the gap") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[UEv]
    val q = StreamingOps.sessionCounts(input.toDF().withColumn("value", lit(1.0)))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    try {
      input.addData(Seq(
        UEv(ts("2024-01-01 00:00:00"), 1L),
        UEv(ts("2024-01-01 00:10:00"), 1L),   // same session (gap 10m < 30m)
        UEv(ts("2024-01-01 01:00:00"), 1L),   // new session (gap 50m)
        UEv(ts("2024-01-01 00:05:00"), 2L)))
      q.processAllAvailable()
      val rows = s.table("sessions").orderBy("user_id", "session_start").collect()
      assert(rows.map(r => (r.getLong(2), r.getLong(3))).toSeq ==
        Seq((1L, 2L), (1L, 1L), (2L, 1L)))
    } finally q.stop()
  }

  final case class IdEv(event_id: Long, ts: Timestamp, value: Double)

  test("streaming dedup keeps the first occurrence across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[IdEv]
    val q = StreamingOps.dedupEvents(input.toDF(), lateness = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        IdEv(1L, ts("2024-01-01 00:00:00"), 1.0),
        IdEv(2L, ts("2024-01-01 00:01:00"), 2.0),
        IdEv(1L, ts("2024-01-01 00:02:00"), 99.0))) // dup within batch
      q.processAllAvailable()
      input.addData(Seq(
        IdEv(2L, ts("2024-01-01 00:03:00"), 99.0),  // dup across batches
        IdEv(3L, ts("2024-01-01 00:04:00"), 3.0)))
      q.processAllAvailable()
      val out = s.table("dedup_stream").collect()
        .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1)
      assert(out.toSeq == Seq((1L, 1.0), (2L, 2.0), (3L, 3.0)),
        "first occurrence must win, duplicates dropped")
    } finally q.stop()
  }

  test("stream-static enrichment join broadcasts the dimension") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val input = MemoryStream[UserEvent]
    val q = StreamingOps.enrich(input.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:00:00"), 5.0),
        UserEvent(2L, ts("2024-01-01 00:01:00"), 7.0)))
      q.processAllAvailable()
      val tiers = s.table("enriched").collect()
        .map(r => (r.getLong(0), r.getString(3))).toSet
      assert(tiers == Set((1L, "gold"), (2L, "basic")))
    } finally q.stop()
  }

  test("stream-stream interval join equals the batch join on the same data") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    // batch layout keeps the cross-batch match ABOVE the watermark: batch 1
    // tops out at 00:30, so after it the watermark is below zero and user
    // 2's purchase arriving in batch 2 still joins the batch-1 click.
    val clicks = Seq(
      UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),   // batch 1
      UserEvent(2L, ts("2024-01-01 00:05:00"), 3.0),   // batch 1
      UserEvent(1L, ts("2024-01-01 03:00:00"), 2.0))   // batch 2, joins nothing
    val purchases = Seq(
      UserEvent(1L, ts("2024-01-01 00:30:00"), 10.0),  // batch 1, joins click 1
      UserEvent(2L, ts("2024-01-01 00:20:00"), 30.0),  // batch 2, joins click 2 (cross-batch)
      UserEvent(1L, ts("2024-01-01 02:00:00"), 20.0))  // batch 2, >1h after click 1

    val cIn = MemoryStream[UserEvent]
    val pIn = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(cIn.toDF(), pIn.toDF())
      .writeStream.format("memory").queryName("cp_join")
      .outputMode("append").start()
    try {
      cIn.addData(clicks.take(2)); pIn.addData(purchases.take(1))
      q.processAllAvailable()
      cIn.addData(clicks.drop(2)); pIn.addData(purchases.drop(1))
      q.processAllAvailable()
      val streamed = s.table("cp_join")
        .select("c_user", "c_value", "p_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      val batch = StreamingOps.clickPurchaseJoin(clicks.toDF(), purchases.toDF())
        .select("c_user", "c_value", "p_value")
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
      assert(streamed == batch && streamed == Set((1L, 1.0, 10.0), (2L, 3.0, 30.0)),
        s"streamed=$streamed batch=$batch")
    } finally q.stop()
  }

  test("left-outer interval join emits NULL purchase once the watermark passes the window") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val cIn = MemoryStream[UserEvent]
    val pIn = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(cIn.toDF(), pIn.toDF(),
      joinType = "leftOuter")
      .writeStream.format("memory").queryName("cp_join_outer")
      .outputMode("append").start()
    def rows() = s.table("cp_join_outer")
      .select("c_user", "c_value", "p_value")
      .collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getDouble(2))).toSet
    try {
      // batch 1: user 1's click matches; user 2's click has no purchase
      cIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        UserEvent(2L, ts("2024-01-01 00:05:00"), 3.0)))
      pIn.addData(Seq(UserEvent(1L, ts("2024-01-01 00:30:00"), 10.0)))
      q.processAllAvailable()
      // the match emits immediately; the unmatched click must NOT emit yet —
      // its window (to 01:05) is still open under the current watermark
      assert(rows() == Set((1L, 1.0, 10.0)),
        s"outer row must be withheld while its window can still match: ${rows()}")
      // batch 2: advance BOTH watermarks past 01:05 + 1h lateness →
      // user 2's click is evicted and emits exactly once with NULL purchase
      cIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      pIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows() == Set((1L, 1.0, 10.0), (2L, 3.0, null), (9L, 0.0, 0.0)),
        s"late NULL emission missing or duplicated: ${rows()}")
    } finally q.stop()
  }

  test("right-outer interval join emits NULL click for unmatched purchases after eviction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val cIn = MemoryStream[UserEvent]
    val pIn = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(cIn.toDF(), pIn.toDF(),
      joinType = "rightOuter")
      .writeStream.format("memory").queryName("cp_join_right")
      .outputMode("append").start()
    def rows() = s.table("cp_join_right")
      .select("c_value", "p_user", "p_value")
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getDouble(0),
        r.getLong(1), r.getDouble(2))).toSet
    try {
      // batch 1: user 1's purchase matches a click; user 2's purchase has
      // no click in [p_ts - 1h, p_ts]
      cIn.addData(Seq(UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0)))
      pIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:30:00"), 10.0),
        UserEvent(2L, ts("2024-01-01 00:05:00"), 30.0)))
      q.processAllAvailable()
      // the match emits immediately; the unmatched purchase is withheld —
      // an on-time click at or before 00:05 could still arrive
      assert(rows() == Set((1.0, 1L, 10.0)),
        s"right-outer row must be withheld while a click can still arrive: ${rows()}")
      // batch 2: advance both watermarks far past 00:05 + 1h lateness →
      // user 2's purchase is evicted and emits once with a NULL click
      cIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      pIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows() == Set((1.0, 1L, 10.0), (null, 2L, 30.0), (0.0, 9L, 0.0)),
        s"late NULL-click emission missing or duplicated: ${rows()}")
    } finally q.stop()
  }

  test("full-outer interval join emits NULLs on both unmatched sides after eviction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val cIn = MemoryStream[UserEvent]
    val pIn = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(cIn.toDF(), pIn.toDF(),
      joinType = "fullOuter")
      .writeStream.format("memory").queryName("cp_join_full")
      .outputMode("append").start()
    def rows() = s.table("cp_join_full")
      .select("c_user", "c_value", "p_user", "p_value")
      .collect()
      .map(r => (if (r.isNullAt(0)) null else r.getLong(0),
        if (r.isNullAt(1)) null else r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3))).toSet
    try {
      // user 1 matches; user 2's click never converts; user 3's purchase
      // has no preceding click
      cIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        UserEvent(2L, ts("2024-01-01 00:05:00"), 3.0)))
      pIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:30:00"), 10.0),
        UserEvent(3L, ts("2024-01-01 00:10:00"), 30.0)))
      q.processAllAvailable()
      assert(rows() == Set((1L, 1.0, 1L, 10.0)),
        s"only the match may emit before eviction: ${rows()}")
      // advance both watermarks far past every window end
      cIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      pIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      q.processAllAvailable()
      assert(rows() == Set(
        (1L, 1.0, 1L, 10.0),
        (2L, 3.0, null, null),   // unmatched click → NULL purchase side
        (null, null, 3L, 30.0),  // unmatched purchase → NULL click side
        (9L, 0.0, 9L, 0.0)),
        s"both unmatched sides must emit exactly once: ${rows()}")
    } finally q.stop()
  }

  test("left-semi interval join emits each converting click once, never duplicates") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val cIn = MemoryStream[UserEvent]
    val pIn = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(cIn.toDF(), pIn.toDF(),
      joinType = "leftSemi")
      .writeStream.format("memory").queryName("cp_join_semi")
      .outputMode("append").start()
    def rows() = s.table("cp_join_semi")
      .select("c_user", "c_value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq.sorted
    try {
      cIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),
        UserEvent(2L, ts("2024-01-01 00:05:00"), 3.0)))
      pIn.addData(Seq(UserEvent(1L, ts("2024-01-01 00:30:00"), 10.0)))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 1.0)), s"click 1 converted, click 2 did not: ${rows()}")
      // a SECOND matching purchase for user 1 must not re-emit the click;
      // a cross-batch purchase for user 2 must emit click 2 exactly once
      pIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:45:00"), 11.0),
        UserEvent(2L, ts("2024-01-01 00:20:00"), 30.0)))
      q.processAllAvailable()
      assert(rows() == Seq((1L, 1.0), (2L, 3.0)),
        s"semi join must emit once per click, no duplicates: ${rows()}")
    } finally q.stop()
  }

  test("anti composition (outer + IS NULL) emits only never-converting clicks, after eviction") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val cIn = MemoryStream[UserEvent]
    val pIn = MemoryStream[UserEvent]
    val q = StreamingOps.clickPurchaseJoin(cIn.toDF(), pIn.toDF(),
      joinType = "leftOuter")
      .filter(col("p_ts").isNull)
      .writeStream.format("memory").queryName("cp_join_anti")
      .outputMode("append").start()
    def rows() = s.table("cp_join_anti").select("c_user", "c_value")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSet
    try {
      cIn.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:00:00"), 1.0),   // converts
        UserEvent(2L, ts("2024-01-01 00:05:00"), 3.0)))  // never converts
      pIn.addData(Seq(UserEvent(1L, ts("2024-01-01 00:30:00"), 10.0)))
      q.processAllAvailable()
      assert(rows() == Set.empty,
        s"no anti row may emit while windows are still open: ${rows()}")
      cIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:00"), 0.0)))
      pIn.addData(Seq(UserEvent(9L, ts("2024-01-01 06:00:01"), 0.0)))
      q.processAllAvailable()
      // user 9's click converts (purchase 1s later), so after eviction the
      // only anti row is user 2's abandoned click — user 1 must NOT appear
      assert(rows() == Set((2L, 3.0)),
        s"exactly the abandoned click must emit: ${rows()}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState keeps running totals across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[UserEvent]
    val q = StreamingOps.runningUserTotals(input.toDS())
      .writeStream.format("memory").queryName("running_totals")
      .outputMode("update").start()
    try {
      input.addData(Seq(
        UserEvent(1L, ts("2024-01-01 00:00:00"), 10.0),
        UserEvent(1L, ts("2024-01-01 00:01:00"), 5.0),
        UserEvent(2L, ts("2024-01-01 00:02:00"), 7.0)))
      q.processAllAvailable()
      input.addData(Seq(UserEvent(1L, ts("2024-01-01 00:05:00"), 1.0)))
      q.processAllAvailable()
      // Update mode: latest row per user wins.
      val latest = s.table("running_totals")
        .groupBy("user_id").agg(max(struct(col("n"), col("total"))).as("st"))
        .select(col("user_id"), col("st.n"), col("st.total"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      assert(latest == Set((1L, 3L, 16.0), (2L, 1L, 7.0)))
    } finally q.stop()
  }

  test("streaming SCD2 carries the open interval across batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext

    val input = MemoryStream[StreamingOps.TierEvent]
    val q = StreamingOps.scd2Intervals(input.toDS())
      .writeStream.format("memory").queryName("scd2_stream")
      .outputMode("append").start()
    try {
      // batch 1: user 1 opens tier 0 at t=100, changes to tier 1 at t=200
      // (one closed row emits); user 2 opens tier 3 and stays
      input.addData(Seq(
        StreamingOps.TierEvent(1L, 100L, 1L, 0L),
        StreamingOps.TierEvent(1L, 200L, 2L, 1L),
        StreamingOps.TierEvent(2L, 150L, 3L, 3L)))
      q.processAllAvailable()
      val afterB1 = s.table("scd2_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(afterB1.toSet == Set((1L, 0L, 100L, 200L)),
        s"batch 1 must emit exactly the one closed interval: ${afterB1.toSeq}")
      // batch 2: user 1 changes again at t=500 (closes the tier-1 interval
      // OPENED IN BATCH 1 -> state carried); user 2 changes at t=400
      input.addData(Seq(
        StreamingOps.TierEvent(1L, 500L, 4L, 2L),
        StreamingOps.TierEvent(2L, 400L, 5L, 0L)))
      q.processAllAvailable()
      val all = s.table("scd2_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      assert(all.toSet == Set(
        (1L, 0L, 100L, 200L),
        (1L, 1L, 200L, 500L),   // opened batch 1, closed batch 2
        (2L, 3L, 150L, 400L)),
        s"cross-batch state carry broken: ${all.toSeq}")
      // within-batch out-of-order rows must be (ts, event_id)-sorted
      input.addData(Seq(
        StreamingOps.TierEvent(3L, 900L, 7L, 5L),   // arrives first,
        StreamingOps.TierEvent(3L, 800L, 6L, 4L)))  // but later ts
      q.processAllAvailable()
      val u3 = s.table("scd2_stream").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .filter(_._1 == 3L)
      assert(u3.toSet == Set((3L, 4L, 800L, 900L)),
        s"per-batch (ts, event_id) sort broken: ${u3.toSeq}")
    } finally q.stop()
  }
}
