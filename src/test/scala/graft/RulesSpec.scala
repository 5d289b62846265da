package graft

import org.apache.spark.sql.catalyst.expressions.Upper

/** The injected optimizer rule actually rewrites plans in a session built
  * with GraftExtensions. */
class RulesSpec extends SparkSuite {

  test("CollapseIdempotentStringFns removes redundant upper/lower chains") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-rules-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // Parquet-backed column: not foldable and not locally evaluable, so
    // neither ConstantFolding nor ConvertToLocalRelation can hide whether
    // our rule fired.
    val df = s2.read.parquet(s"$sfDir/nation.parquet")
      .selectExpr("upper(upper(upper(n_name))) AS u", "lower(lower(n_name)) AS l")
    val optimized = df.queryExecution.optimizedPlan
    val uppers = optimized.expressions.flatMap(_.collect { case u: Upper => u })
    assert(uppers.size == 1,
      s"nested Upper must collapse to exactly one, got: $optimized")
    val row = df.orderBy("u").collect().head
    assert(row.getString(0) == row.getString(0).toUpperCase &&
      row.getString(1) == row.getString(1).toLowerCase)
  }

  test("the rule is semantics-preserving on NULL and non-ASCII input") {
    val s2 = org.apache.spark.sql.SparkSession.builder().getOrCreate()
    val r = s2.sql(
      "SELECT upper(upper(CAST(NULL AS STRING))), upper(upper('straße'))").collect().head
    assert(r.isNullAt(0))
    assert(r.getString(1) == "straße".toUpperCase)
  }
}
