package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental maintenance of a (count, decimal-sum) aggregate from a
  * CDC-style change feed — the delta-apply step q_dsv2_ivm wires to the
  * graft-tsv changes feed, factored out so the group-lifecycle edge cases
  * (a group appearing only in the delta, a group deleted down to zero)
  * are testable on bare frames without a catalog table.
  *
  * Contract: `view` has columns (key, n0: long, s0: decimal); `delta` has
  * (key, dn: long, ds: decimal) where dn/ds are SIGNED net changes
  * (+1/+bal per insert, −1/−bal per delete — an update contributes its
  * delete-old and insert-new rows, so a key-moving update transfers its
  * mass between groups). Sum and count are commutative monoids, so
  * view ⊕ delta ≡ recompute; groups reaching n = 0 leave the view (their
  * sum is exactly 0 too, by the same algebra). */
object CdcApply {

  def applyDelta(view: DataFrame, delta: DataFrame, key: String): DataFrame = {
    val zeroDec = lit(0).cast("decimal(18,2)")
    view.join(delta, Seq(key), "full_outer")
      .select(col(key),
        (coalesce(col("n0"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("s0"), zeroDec) + coalesce(col("ds"), zeroDec)).as("s"))
      // a group netting n = 0 must have netted s = 0 too, and no group
      // can net n < 0 at all (the monoid algebra in the contract above —
      // a delete needs a matching prior insert); a malformed feed that
      // violates either would otherwise drop rows SILENTLY — fail loudly
      // instead. CaseWhen, not `||`: branches are guaranteed
      // conditionally evaluated, so the error can never fire for a live
      // group.
      .filter(when(col("n") > 0, lit(true))
        .when(col("n") < 0, raise_error(concat(
          lit("CdcApply: inconsistent delta — group "),
          col(key).cast("string"),
          lit(" netted negative count "),
          col("n").cast("string"))))
        .when(col("s") === zeroDec, lit(false))
        .otherwise(raise_error(concat(
          lit("CdcApply: inconsistent delta — group "),
          col(key).cast("string"),
          lit(" netted count 0 with nonzero sum "),
          col("s").cast("string")))))
  }
}
