package graft

import org.apache.spark.sql.functions._

import graft.functions.PortableHash
import graft.plans.GraftFunctions

/** The native Hash60 expression must be value-identical to the
  * built-in-functions formulation the oracle SQL mirrors — on every code
  * path (codegen + interpreted) and on real corpus data. */
class Hash60Spec extends SparkSuite {

  private lazy val registered: Unit = GraftFunctions.register(spark)

  test("native graft_hash60 equals conv(substring(md5)) on corpus shingles") {
    registered
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    val mismatches = docs.select(
        PortableHash.hash60(col("w")).as("native"),
        PortableHash.hash60Portable(col("w")).as("portable"))
      .filter(col("native") =!= col("portable"))
      .count()
    assert(mismatches == 0L)
  }

  test("native graft_hash60 equals portable under interpreted eval") {
    registered
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val r = spark.sql(
        "SELECT graft_hash60('hello'), CAST(conv(substring(md5('hello'), 1, 15), 16, 10) AS BIGINT)")
        .collect().head
      assert(r.getLong(0) == r.getLong(1))
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input yields null; non-ASCII hashes UTF-8 bytes like md5(string)") {
    registered
    val r = spark.sql("""
      SELECT graft_hash60(CAST(NULL AS STRING)),
             graft_hash60('straße日本'),
             CAST(conv(substring(md5('straße日本'), 1, 15), 16, 10) AS BIGINT)""")
      .collect().head
    assert(r.isNullAt(0))
    assert(r.getLong(1) == r.getLong(2))
  }
}
