package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.plans.RollingHashes

/** The native rolling-hash expression: values equal an independent direct
  * polynomial evaluation (the rolling recurrence introduces no drift),
  * short strings collapse to one truncated-window hash, and the codegen
  * path (whole-stage) agrees with interpreted eval. */
class RollingHashSpec extends SparkSuite {

  /** Independent reference: direct Σ b_j·B^(len-1-j) mod P per window —
    * no rolling, BigInt arithmetic so overflow bugs in the subject can't
    * hide in the reference. */
  private def ref(s: String): Seq[Long] = {
    val bytes = s.getBytes("UTF-8")
    val windows =
      if (bytes.length <= RollingHashes.Len) Seq(bytes.toSeq)
      else bytes.sliding(RollingHashes.Len).map(_.toSeq).toSeq
    windows.map { w =>
      w.foldLeft(BigInt(0))((h, b) =>
        (h * RollingHashes.B + (b & 0xff)) mod BigInt(RollingHashes.P))
        .toLong
    }
  }

  private def subject(s: String): Seq[Long] =
    RollingHashes.compute(UTF8String.fromString(s))
      .toLongArray().toSeq

  test("rolling recurrence equals direct polynomial evaluation") {
    val rnd = new scala.util.Random(7)
    val cases = Seq("abcdefgh", "abcdefghi", "the quick brown fox",
      "aaaaaaaaaaaaaaaa", "") ++
      Seq.fill(50)(rnd.alphanumeric.take(1 + rnd.nextInt(200)).mkString)
    cases.foreach { s =>
      assert(subject(s) == ref(s), s"mismatch on ${s.take(20)}...")
    }
  }

  test("strings shorter than one window yield a single truncated hash") {
    assert(subject("abc").length == 1)
    assert(subject("abc") == ref("abc"))
    assert(subject("").length == 1 && subject("").head == 0L)
  }

  test("codegen execution agrees with interpreted eval") {
    import TestSpark.spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val strs = Seq("abcdefgh", "rolling hash parity check", "xy")
    val fromDf = strs.toDF("s")
      .select(expr("rolling_hashes(s)").as("h"))
      .collect().map(_.getSeq[Long](0).toSeq)
    strs.zip(fromDf).foreach { case (s, got) =>
      assert(got == subject(s), s"codegen/interpreted drift on $s")
    }
  }

  test("window count matches the substring-shingle convention") {
    val s = "a" * 48
    assert(subject(s).length == 48 - RollingHashes.Len + 1)
  }
}
