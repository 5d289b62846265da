package graft

import org.apache.spark.sql.functions._

import graft.functions.Aggregators
import graft.functions.Aggregators.WPoint

/** Typed Aggregator surface: bounded-state sketches that merge
  * associatively (partial-aggregate map-side). */
class AggregatorsSpec extends SparkSuite {

  test("MinK equals the sort_array(collect_set) formulation on real data") {
    val s = spark
    import s.implicits._
    val mink = udaf(new Aggregators.MinK(3))
    val hp = s.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_custkey"), col("o_orderkey"))
      .as[(Long, Long)]
    val viaAgg = hp.toDF("k", "v").groupBy("k")
      .agg(mink(col("v")).as("mins")).orderBy("k")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    val viaBuiltin = hp.toDF("k", "v").groupBy("k")
      .agg(slice(sort_array(collect_set(col("v"))), 1, 3).as("mins")).orderBy("k")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq)
    assert(viaAgg.toSeq == viaBuiltin.toSeq)
  }

  test("MinK buffer stays bounded and merge is order-insensitive") {
    val a = new Aggregators.MinK(2)
    val b1 = (1L to 100L).foldLeft(a.zero)(a.reduce)
    assert(b1 == Vector(1L, 2L) && b1.length == 2)
    val b2 = Seq(0L, 50L).foldLeft(a.zero)(a.reduce)
    assert(a.finish(a.merge(b1, b2)) == a.finish(a.merge(b2, b1)))
    assert(a.finish(a.merge(b1, b2)) == Seq(0L, 1L))
  }

  test("WeightedMean computes the exact weighted average per group") {
    val s = spark
    import s.implicits._
    val wm = udaf(Aggregators.WeightedMean)
    val df = Seq(("a", 1.0, 1.0), ("a", 3.0, 3.0), ("b", 5.0, 2.0))
      .toDF("k", "value", "weight")
    val got = df
      .groupBy("k").agg(wm(col("value"), col("weight")).as("wmean"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getDouble(1)))
    assert(got.toSeq == Seq(("a", (1.0 + 9.0) / 4.0), ("b", 5.0)))
  }
}
