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

  test("property: delta-apply equals recompute under random mutation histories") {
    // random BASE and FINAL multisets over a small key space; the delta
    // is their signed difference (what the changes feed nets out to for
    // ANY mutation history ending at FINAL) — apply(agg(base), delta)
    // must equal agg(final) exactly, including vanished and newborn keys
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val keyG = Gen.oneOf("a", "b", "c", "d", "e")
    val centsG = Gen.chooseNum(-99999L, 99999L)
    val rowsG = Gen.chooseNum(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(keyG, centsG)))
    def agg(rows: List[(String, Long)]): Map[String, (Long, Long)] =
      rows.groupBy(_._1).map { case (k, g) =>
        k -> (g.size.toLong, g.map(_._2).sum)
      }
    def toDec(cents: Long) =
      java.math.BigDecimal.valueOf(cents, 2)
    (1 to 60).foreach { i =>
      val seed = Seed(i.toLong)
      val base = rowsG.apply(Gen.Parameters.default, seed).get
      val fin = rowsG.apply(Gen.Parameters.default, seed.next).get
      val aB = agg(base); val aF = agg(fin)
      val view = aB.toSeq.map { case (k, (n, c)) => (k, n, toDec(c)) }
        .toDF("k", "n0", "s0raw")
        .select(col("k"), col("n0"),
          col("s0raw").cast("decimal(18,2)").as("s0"))
      val deltaRows = (aB.keySet ++ aF.keySet).toSeq.flatMap { k =>
        val (nb, cb) = aB.getOrElse(k, (0L, 0L))
        val (nf, cf) = aF.getOrElse(k, (0L, 0L))
        if (nf == nb && cf == cb) None
        else Some((k, nf - nb, toDec(cf - cb)))
      }
      val delta = deltaRows.toDF("k", "dn", "dsraw")
        .select(col("k"), col("dn"),
          col("dsraw").cast("decimal(18,2)").as("ds"))
      val got = CdcApply.applyDelta(view, delta, "k").collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDecimal(2))).toMap
      val want = aF.map { case (k, (n, c)) => k -> (n, toDec(c).setScale(2)) }
      assert(got === want, s"seed $i: base=$base final=$fin")
    }
  }

  test("a malformed delta (count nets 0, sum does not) fails loudly") {
    // the monoid contract says a group whose count nets to zero has a
    // zero sum; a feed violating it must raise, not silently drop the
    // residual sum with the group
    val view = Seq(("bad", 2L, "30.00"))
      .toDF("k", "n0", "s0raw")
      .select(col("k"), col("n0"), col("s0raw").cast("decimal(18,2)").as("s0"))
    val delta = Seq(("bad", -2L, "-29.00")) // count zeroed, 1.00 left over
      .toDF("k", "dn", "dsraw")
      .select(col("k"), col("dn"), col("dsraw").cast("decimal(18,2)").as("ds"))
    val e = intercept[Exception] {
      CdcApply.applyDelta(view, delta, "k").collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil
      else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("inconsistent delta")),
      s"expected the CdcApply raise_error, got: $e")
  }

  test("a delta netting a NEGATIVE count fails loudly, sum zero or not") {
    // a net count below zero means a delete without a matching insert —
    // malformed regardless of the sum (including the sum-0 shape a
    // double-applied delta produces)
    for (ds <- Seq("-30.00" /* sum nets 0 */, "-29.00" /* residual */)) {
      val view = Seq(("bad", 1L, "30.00"))
        .toDF("k", "n0", "s0raw")
        .select(col("k"), col("n0"), col("s0raw").cast("decimal(18,2)").as("s0"))
      val delta = Seq(("bad", -3L, ds))
        .toDF("k", "dn", "dsraw")
        .select(col("k"), col("dn"), col("dsraw").cast("decimal(18,2)").as("ds"))
      val e = intercept[Exception] {
        CdcApply.applyDelta(view, delta, "k").collect()
      }
      def messages(t: Throwable): Seq[String] =
        if (t == null) Nil
        else Option(t.getMessage).toSeq ++ messages(t.getCause)
      assert(messages(e).exists(_.contains("netted negative count")),
        s"ds=$ds: expected the negative-count raise, got: $e")
    }
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
