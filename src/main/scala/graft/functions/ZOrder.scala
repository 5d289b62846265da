package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 16-bit Morton (z-order) interleave as portable Column arithmetic —
  * the multi-dimensional clustering primitive shared by the parquet
  * layout exhibit (`graft.queries.Layout`, `q_zorder_layout`) and the
  * graft-tsv catalog's `CALL g.system.zorder` rewrite. Pure integer
  * bit-twiddling (BIGINT throughout) so any SQL engine computes the
  * same value — the DuckDB oracle mirrors it expression-for-expression.
  *
  * Why z-values: sorting by interleaved bits clusters EVERY
  * participating dimension at once, so per-file/per-block min/max
  * ranges form tight boxes on both dimensions and a selective predicate
  * on EITHER prunes most files — a single-key sort gives that for one
  * dimension only. */
object ZOrder {

  private val Masks: Seq[(Int, Long)] = Seq(
    8 -> 0x00FF00FFL, 4 -> 0x0F0F0F0FL, 2 -> 0x33333333L, 1 -> 0x55555555L)

  /** Spread the low 16 bits of `c` to the even bit positions of a
    * 32-bit value (classic bit-twiddling). */
  def spread(c: Column): Column =
    Masks.foldLeft(c) { case (x, (s, m)) =>
      x.bitwiseOR(shiftleft(x, s)).bitwiseAND(lit(m))
    }

  /** zval = interleave(nx, ny): nx in even bits, ny in odd bits. Inputs
    * must already be range-normalized to [0, 65535]. */
  def morton(nx: Column, ny: Column): Column =
    spread(nx).bitwiseOR(shiftleft(spread(ny), 1))
}
