package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deterministic hashes computable identically in Spark and in the DuckDB
  * oracle (and in any ANSI-ish engine): everything is derived from `md5`
  * hex strings, which both engines produce byte-identically for UTF-8 input.
  *
  * Spark's native `hash`/`xxhash64` and DuckDB's `hash` are different
  * algorithms, so any operator whose RESULT embeds hash values (MinHash
  * signatures, SimHash, LSH bucket ids, fingerprints) must use a portable
  * hash or it can never be oracle-checked. md5 is slower than xxhash64 but
  * these ops hash short tokens; at 100 TB the cost is still dominated by the
  * shuffle, and a production deployment would swap in xxhash64 once parity
  * testing is done (the functions below are the only place to change).
  */
object PortableHash {

  /** 60-bit non-negative hash: first 15 hex digits of md5, parsed base-16.
    * DuckDB equivalent: `CAST('0x' || substr(md5(s),1,15) AS BIGINT)`.
    * Spark-side this resolves to the native codegen expression
    * graft.plans.Hash60 (registered by Tables.load in every session that
    * touches the catalog) — value-identical to [[hash60Portable]], minus
    * the per-row hex-string materialization + base-16 parse. */
  def hash60(c: Column): Column = call_function("graft_hash60", c)

  /** The built-in-functions formulation (the definition the oracle SQL
    * mirrors); kept for the equality spec and registry-free contexts. */
  def hash60Portable(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)

  /** Seeded variant: independent hash families from one md5 by salting.
    * DuckDB: `CAST('0x' || substr(md5(<seed> || '|' || s),1,15) AS BIGINT)`. */
  def hash60(seed: Int, c: Column): Column =
    hash60(concat(lit(s"$seed|"), c))

  /** Seeded md5 hex string (for lexicographic-min MinHash variants where the
    * signature can stay a string). */
  def md5Seeded(seed: Int, c: Column): Column =
    md5(concat(lit(s"$seed|"), c))

  /** Mersenne prime 2^31−1: universal-hash modulus. (a*h'+b) with
    * h' < P and a,b < P stays under 2^62 — no 64-bit overflow in either
    * engine. */
  val P: Long = 2147483647L

  /** Universal hash family over ONE base md5 hash: family s maps
    * h' = hash60(x) mod P to (A_s·h' + B_s) mod P. One md5 per input row
    * instead of one per (row × family) — at 100 TB the hashing IS the
    * MinHash cost, and this is an 8× cut with the same portability. */
  def familyA(s: Int): Long = ((2L * s + 1L) * 1103515245L) % P
  def familyB(s: Int): Long = (12345L * (s + 1L) + 678L) % P
  def universal(s: Int, hp: Column): Column =
    (lit(familyA(s)) * hp + lit(familyB(s))) % lit(P)
  def sqlUniversal(s: Int, hpExpr: String): String =
    s"(${familyA(s)} * $hpExpr + ${familyB(s)}) % $P"

  /** Plan-time evaluation of [[hash60Portable]] for constants: values that
    * depend only on fixed algorithm parameters (e.g. the ANN hyperplane
    * weight matrix, a (plane, dim) grid) are computed once at plan build
    * and baked in as literals — instead of re-deriving the same md5 per
    * row per plane on both engines. Value-identical to `hash60` by
    * construction (same first-15-hex-digits-of-md5 parse). */
  def hash60Const(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  /** SQL fragment mirrors, used to build the oracle strings from the same
    * constants so Spark and DuckDB can never drift. */
  def sqlHash60(expr: String): String =
    s"CAST(concat('0x', substr(md5($expr), 1, 15)) AS BIGINT)"
  def sqlHash60(seed: Int, expr: String): String =
    sqlHash60(s"concat('$seed|', $expr)")
  def sqlMd5Seeded(seed: Int, expr: String): String =
    s"md5(concat('$seed|', $expr))"
}
