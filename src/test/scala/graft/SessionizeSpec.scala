package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.Sessionize

/** The custom sessionize operator stack (logical node + strategy +
  * physical exec) vs the two-window-pass formulation it replaces. */
class SessionizeSpec extends SparkSuite {

  private val GapUs = 1800000000L

  private def input: DataFrame =
    graft.sources.Tables.load(spark, sfDir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
      .select(col("user_id"), col("event_id"), col("ts_us"))

  private def windowForm(df: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    df.select(col("user_id"), col("event_id"), col("ts_us"),
      when(lag(col("ts_us"), 1).over(w).isNull ||
        col("ts_us") - lag(col("ts_us"), 1).over(w) > GapUs, 1L)
        .otherwise(0L).as("is_new"))
      .select(col("user_id"), col("event_id"), col("ts_us"),
        sum(col("is_new"))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("session_no"))
  }

  test("SessionizeExec matches the two-window-pass formulation row for row") {
    val native = Sessionize
      .withSessionNo(input, "user_id", "ts_us", "event_id", GapUs)
    val expected = windowForm(input)
    val cols = Seq("user_id", "event_id", "ts_us", "session_no").map(col)
    assert(native.select(cols: _*).exceptAll(expected.select(cols: _*)).isEmpty &&
      expected.select(cols: _*).exceptAll(native.select(cols: _*)).isEmpty,
      "native sessionize diverges from the window formulation")
  }

  test("the plan goes through the custom physical operator") {
    val plan = Sessionize
      .withSessionNo(input, "user_id", "ts_us", "event_id", GapUs)
      .queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("Sessionize "), s"expected the Sessionize operator:\n$plan")
  }

  test("exchange and sort are elided when the child is already clustered and sorted") {
    val prepared = input
      .repartition(col("user_id"))
      .sortWithinPartitions("user_id", "ts_us", "event_id")
    val plan = Sessionize
      .withSessionNo(prepared, "user_id", "ts_us", "event_id", GapUs)
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).size
    val sorts = "\\bSort\\b".r.findAllIn(plan).size
    assert(exchanges == 1, s"expected only the explicit repartition exchange:\n$plan")
    assert(sorts == 1, s"expected only the explicit sortWithinPartitions:\n$plan")
  }

  test("session numbering restarts per user and splits on gap boundary") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 0L),
      (1L, 2L, GapUs),            // gap == gapUs -> SAME session (strict >)
      (1L, 3L, GapUs * 2 + 1),    // gap = GapUs+1 -> new session
      (2L, 4L, 5L))
      .toDF("user_id", "event_id", "ts_us")
    val got = Sessionize
      .withSessionNo(rows, "user_id", "ts_us", "event_id", GapUs)
      .orderBy("user_id", "event_id")
      .select("user_id", "event_id", "session_no")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == Seq((1L, 1L, 1L), (1L, 2L, 1L), (1L, 3L, 2L), (2L, 4L, 1L)))
  }
}
