package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.CdcApply

/** Group-lifecycle edges of the CDC delta-apply (q_dsv2_ivm's algebra).
  * The oracle run proves the happy path against a full recompute; these
  * pin the paths the bench corpus never reaches: a group deleted down to
  * zero leaves the view, a group born in the delta enters it, and an
  * untouched group rides through unchanged. */
class CdcApplySpec extends SparkSuite {

  import spark.implicits._

  private def dec(s: String) = new java.math.BigDecimal(s)

  test("vanishing, appearing and untouched groups resolve correctly") {
    val view = Seq(
      ("gone", 2L, "30.00"),   // fully deleted by the delta
      ("stays", 3L, "45.50"),  // partially deleted
      ("idle", 1L, "10.00"))   // no delta rows
      .toDF("k", "n0", "s0raw")
      .select(col("k"), col("n0"), col("s0raw").cast("decimal(18,2)").as("s0"))
    val delta = Seq(
      ("gone", -2L, "-30.00"),
      ("stays", -1L, "-15.50"),
      ("born", 2L, "22.00"))   // exists only in the delta
      .toDF("k", "dn", "dsraw")
      .select(col("k"), col("dn"), col("dsraw").cast("decimal(18,2)").as("ds"))
    val got = CdcApply.applyDelta(view, delta, "k")
      .orderBy("k")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDecimal(2)))
    assert(got.toSeq === Seq(
      ("born", 2L, dec("22.00").setScale(2)),
      ("idle", 1L, dec("10.00").setScale(2)),
      ("stays", 2L, dec("30.00").setScale(2))))
    // the zeroed group is really gone, not present with n = 0
    assert(!got.map(_._1).contains("gone"))
  }

  test("an empty delta is the identity") {
    val view = Seq(("a", 5L, "1.25"))
      .toDF("k", "n0", "s0raw")
      .select(col("k"), col("n0"), col("s0raw").cast("decimal(18,2)").as("s0"))
    val delta = spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("dn",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ds",
          org.apache.spark.sql.types.DataTypes.createDecimalType(18, 2)))))
    val got = CdcApply.applyDelta(view, delta, "k").collect()
    assert(got.length === 1)
    assert(got.head.getLong(1) === 5L)
    assert(got.head.getDecimal(2) === dec("1.25").setScale(2))
  }
}
