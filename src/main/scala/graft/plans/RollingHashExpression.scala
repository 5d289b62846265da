package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp ROLLING hash over every [[RollingHashes.Len]]-byte window of
  * a string: h_i = Σ_j b_{i+j}·B^(Len-1-j) mod P, computed incrementally —
  * h_{i+1} derives from h_i in O(1), so a document costs O(len) total
  * where the md5-per-shingle path (Hash60) costs O(len·Len) digest work
  * plus a digest allocation per window. This is the asymptotically right
  * shingle hash for the 100 TB fingerprint/minhash family; Hash60 remains
  * the default where oracle portability wants md5 exactly.
  *
  * Semantics notes, both load-bearing for the DuckDB oracle mirror:
  *  - operates on the string's UTF-8 BYTES (== code points on the ASCII
  *    corpus; the oracle's ord(substr) is code-point-based);
  *  - a string shorter than one window yields ONE hash over all its bytes
  *    (same truncated-window convention as the substring shingles).
  *
  * Returned as `array<long>` from a single projection — the k-min
  * fingerprint then needs NO shuffle at all: array_distinct → array_sort →
  * slice runs in the same whole-stage-codegen span. */
case class RollingHashes(child: Expression) extends UnaryExpression {

  override def prettyName: String = "rolling_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string input, got ${child.dataType.simpleString}")

  protected override def nullSafeEval(input: Any): Any =
    RollingHashes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str =>
      s"${ev.value} = graft.plans.RollingHashes.compute($str);")

  protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHashes {
  /** Window length in bytes — matches the char-8 shingles of the md5
    * family on ASCII text. */
  val Len = 8
  /** Polynomial base; any value > 255 with decent spectral behavior. */
  val B = 131L
  /** Modulus: 2^31 - 1 (Mersenne). Products stay far below 2^63:
    * (P-1)·B + 255 ≈ 2.8e11. */
  val P = (1L << 31) - 1
  /** B^(Len-1) mod P, the high-order coefficient rolled out each step. */
  val Bp: Long = {
    var v = 1L
    for (_ <- 1 until Len) v = v * B % P
    v
  }

  /** Shared by interpreted eval and generated code (one JIT-compiled
    * loop, trivial codegen). */
  def compute(s: UTF8String): GenericArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n <= Len) {
      var h = 0L
      var i = 0
      while (i < n) { h = (h * B + (bytes(i) & 0xffL)) % P; i += 1 }
      new GenericArrayData(Array(h))
    } else {
      val out = new Array[Long](n - Len + 1)
      var h = 0L
      var i = 0
      while (i < Len) { h = (h * B + (bytes(i) & 0xffL)) % P; i += 1 }
      out(0) = h
      i = 1
      while (i <= n - Len) {
        // evict byte i-1 (coefficient B^(Len-1)), shift, admit byte i+Len-1
        h = ((h - (bytes(i - 1) & 0xffL) * Bp % P + P) % P * B +
          (bytes(i + Len - 1) & 0xffL)) % P
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  def builder(args: Seq[Expression]): Expression = RollingHashes(args.head)
}
