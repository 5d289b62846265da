package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native codegen form of the portable 60-bit hash
  * (graft.functions.PortableHash.hash60): VALUE-IDENTICAL to
  * `conv(substring(md5(x), 1, 15), 16, 10)` — the first 15 hex digits of
  * the md5 digest are exactly the first 8 digest bytes read big-endian
  * shifted right by 4 — but computed straight from the digest bytes, with
  * no 32-char hex string, no substring, no base-16 parse. This sits on
  * the hottest path in the engine (one call per shingle in every
  * MinHash/LSH/fingerprint query), where those per-row allocations are
  * the difference.
  *
  * Registered as `graft_hash60` by [[GraftExtensions]] /
  * [[GraftFunctions]]; the builder wraps the argument in a cast to
  * binary, so string input hashes its UTF-8 bytes exactly like Spark's
  * own `md5(string)`. */
case class Hash60(child: Expression) extends UnaryExpression {

  override def prettyName: String = "graft_hash60"
  override def dataType: DataType = LongType
  override val nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires binary input, got ${child.dataType.simpleString}")

  @transient private lazy val localDigest =
    java.security.MessageDigest.getInstance("MD5")

  protected override def nullSafeEval(input: Any): Any = {
    localDigest.reset()
    val d = localDigest.digest(input.asInstanceOf[Array[Byte]])
    Hash60.firstSixtyBits(d)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
      v => s"""
        |try { $v = java.security.MessageDigest.getInstance("MD5"); }
        |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
       """.stripMargin)
    nullSafeCodeGen(ctx, ev, bytes => {
      val d = ctx.freshName("digest")
      s"""
         |$md.reset();
         |byte[] $d = $md.digest($bytes);
         |${ev.value} = graft.plans.Hash60.firstSixtyBits($d);
       """.stripMargin
    })
  }

  protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Hash60 {
  /** First 15 hex digits of the digest as a non-negative long: bytes 0-7
    * big-endian, unsigned-shifted right by 4 (dropping the 16th hex
    * digit). Public + static-shaped so generated code can call it. */
  def firstSixtyBits(d: Array[Byte]): Long = {
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** Function-registry builder: casts the argument to binary (UTF-8 for
    * strings, matching Spark's own md5(string) semantics). */
  def builder(args: Seq[Expression]): Expression =
    Hash60(Cast(args.head, BinaryType))
}
