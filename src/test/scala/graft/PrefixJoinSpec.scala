package graft

import org.apache.spark.sql.functions._

/** q_prefix_join (PPJoin-style exact set-similarity join) — the value the
  * oracle gate can't test alone: COMPLETENESS of the prefix + length +
  * position filters against an in-test brute-force ground truth, plus a
  * constructed corpus where the qualifying pair set is known by hand. */
class PrefixJoinSpec extends SparkSuite {

  test("q_prefix_join: hand-built corpus — near-identical pairs found, unrelated not") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pj").toString
    val base = ("the quick brown fox jumps over the lazy dog and then " * 4).trim
    Seq(
      (1L, base, "en", "web", base.length.toLong),
      // one word changed near the end -> shingle Jaccard well above 0.8
      (2L, base.dropRight(3) + "cat", "en", "web", base.length.toLong),
      (3L, base, "en", "web", base.length.toLong), // exact copy of doc 1
      (4L, "completely different text about spark catalyst optimizer rules and physical plans in a distributed engine", "en", "web", 107L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = queries.Catalog.queries("q_prefix_join")(spark, dir).collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)), s"pairs: $pairs")
    rows.foreach { r =>
      assert(r.getAs[Long]("jac_pct") >= 80, s"below threshold: $r")
      val (i, u) = (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union"))
      assert(10 * i >= 8 * u && i <= u, s"inconsistent accounting: $r")
    }
    // the exact copy must be a full-overlap pair
    val copy = rows.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 3L).get
    assert(copy.getAs[Long]("n_inter") == copy.getAs[Long]("n_union"))
  }

  test("q_prefix_join: complete vs in-test brute force on the sf corpus") {
    val result = queries.Catalog.queries("q_prefix_join")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_inter"), r.getAs[Long]("n_union")))
      .toMap
    // ground truth: all-pairs exact Jaccard over the same md5 16-char
    // shingle space the operator defines
    val sets = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        explode(sequence(lit(1),
          greatest(length(col("text")) - 14, lit(2)) - 1)).as("i"))
      .selectExpr("doc_id", "graft_hash60(substring(text, i, 16)) as hp")
    val truth = sets.as("a")
      .join(sets.as("b"),
        col("a.hp") === col("b.hp") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(countDistinct(col("a.hp")).as("n_inter"))
      .join(sets.groupBy(col("doc_id").as("doc_a"))
        .agg(countDistinct("hp").as("na")), "doc_a")
      .join(sets.groupBy(col("doc_id").as("doc_b"))
        .agg(countDistinct("hp").as("nb")), "doc_b")
      .filter(expr("10 * n_inter >= 8 * (na + nb - n_inter)"))
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Long]("n_inter"),
          r.getAs[Long]("na") + r.getAs[Long]("nb") - r.getAs[Long]("n_inter")))
      .toMap
    assert(result == truth,
      s"missed: ${truth.keySet -- result.keySet}; extra: ${result.keySet -- truth.keySet}")
    assert(truth.nonEmpty, "sf corpus should contain qualifying pairs")
  }

  test("verify joins stay SHUFFLE_HASH — arrays never sorted, never broadcast") {
    val plan = queries.Catalog.queries("q_prefix_join")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert("ShuffledHashJoin".r.findAllIn(plan).size >= 2,
      s"both verify joins must be SHJ (pair side builds):\n$plan")
  }
}
