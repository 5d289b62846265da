package graft

import java.sql.Timestamp

/** q_scd2_build determinism under same-user same-timestamp ties — the case
  * the sf corpus never exercises (verified: zero duplicate (user_id, ts)
  * pairs), pinned here on a constructed events table. Both windows must
  * tie-break on event_id: change detection AND the interval close; a lead
  * ordered by ts alone closes tied change rows in arbitrary order. */
class Scd2Spec extends SparkSuite {

  test("tied timestamps order by event_id in both windows") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_scd2").toString
    def ts(us: Long) = new Timestamp(us / 1000) // whole-ms micros below
    // user 1: tier 0 at t=1000ms (eid 1), tier 1 at t=1000ms (eid 2 — the
    // TIE), tier 0 at t=2000ms (eid 3). Deterministic (ts, event_id) order
    // gives intervals: (0, 1000, 1000), (1, 1000, 2000), (0, 2000, null).
    Seq(
      (1L, ts(1000000L), 1L, "view", 1.0, """{"k": 10}"""),  // tier 0
      (2L, ts(1000000L), 1L, "view", 1.0, """{"k": 30}"""),  // tier 1, tied ts
      (3L, ts(2000000L), 1L, "view", 1.0, """{"k": 5}""")    // tier 0
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("ts"), col("event_id"), col("user_id"), col("event_type"),
        col("value"), col("props"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = queries.Catalog.queries("q_scd2_build")(spark, dir).collect()
      .map(r => (r.getAs[Long]("tier"), r.getAs[Long]("valid_from_us"),
        Option(r.getAs[java.lang.Long]("valid_to_us")).map(_.toLong)))
    assert(rows.toSeq == Seq(
      (0L, 1000000L, Some(1000000L)),
      (1L, 1000000L, Some(2000000L)),
      (0L, 2000000L, None)), s"got: ${rows.toSeq}")
  }

  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
