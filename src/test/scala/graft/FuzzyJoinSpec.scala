package graft

import org.apache.spark.sql.functions._

/** The deletion-neighborhood fuzzy join's candidate generation claims a
  * THEOREM — d(a,b) ≤ 2 ⟹ the radius-2 deletion neighborhoods intersect
  * — so the spec checks it the way Dsv2PropertySpec checks split
  * boundaries: fuzz a small-alphabet vocabulary (collision-rich, so true
  * near-pairs are plentiful) and compare the candidate-join + exact-verify
  * pipeline against the brute-force O(n²) levenshtein truth computed by
  * the same engine. Edge lengths 0 and 1 are forced into every sample
  * (they exercise the empty-range CASE guards in the generator
  * expression). */
class FuzzyJoinSpec extends SparkSuite {

  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private val word: Gen[String] =
    Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))

  test("deletion-neighborhood candidates reproduce brute-force d<=2 exactly (property)") {
    val s = spark
    import s.implicits._
    for (seed <- 1L to 8L) {
      val vocab = (sample(Gen.listOfN(40, word), seed) ++ Seq("", "a"))
        .distinct
      val names = vocab.toDF("name")
      val variants = names
        .select(col("name"), explode(queries.Dedup.deletionVariants("name")).as("v"))
      val candidates = variants.as("a")
        .join(variants.as("b"),
          col("a.v") === col("b.v") && col("a.name") < col("b.name"))
        .select(col("a.name").as("name_a"), col("b.name").as("name_b"))
        .distinct()
        .filter(levenshtein(col("name_a"), col("name_b")) <= 2)
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      val truth = names.as("a").crossJoin(names.as("b"))
        .filter(col("a.name") < col("b.name") &&
          levenshtein(col("a.name"), col("b.name")) <= 2)
        .select(col("a.name"), col("b.name"))
        .collect().map(r => (r.getString(0), r.getString(1))).toSet
      assert(candidates == truth,
        s"seed=$seed: missed=${(truth -- candidates).take(5)} " +
          s"extra=${(candidates -- truth).take(5)}")
    }
  }

  test("q_bfs_hops: forced no-broadcast path matches the default path") {
    val default = queries.Catalog.queries("q_bfs_hops")(spark, sfDir).collect()
    val keys = Seq(
      queries.GraphAdaptive.ConfKey -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    val saved = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    val fallback =
      try queries.Catalog.queries("q_bfs_hops")(spark, sfDir).collect()
      finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    assert(fallback.toSeq == default.toSeq,
      "q_bfs_hops shuffle-join fallback diverged from the broadcast path")
  }

  test("q_bfs_hops on an empty edge set returns zero rows, no crash") {
    // min(p) over zero rows is NULL — the builder must not seed a
    // NULL-node wave (or NPE on getLong); the oracle's d0 guard matches
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bfs_empty").toString
    Seq.empty[(Long, Long)].toDF("l_partkey", "l_suppkey")
      .write.mode("overwrite").parquet(s"$dir/lineitem.parquet")
    val out = queries.Catalog.queries("q_bfs_hops")(spark, dir)
    assert(out.columns.toSeq == Seq("node_id", "hop"))
    assert(out.count() == 0L)
  }

  test("q_domain_mix allocation invariants hold at sf0.001") {
    val rows = queries.Catalog.queries("q_domain_mix")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("n_tokens")).sum
    val quota = rows.map(_.getAs[Long]("quota_tokens")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("quota_tokens") <= r.getAs[Long]("n_tokens"),
        s"quota exceeds the source corpus: $r")
    }
    // integer floors only ever round DOWN: the allocated total sits in
    // (budget - nSources, budget]
    assert(quota <= total / 2 && quota > total / 2 - rows.length,
      s"sqrt-allocation off budget: quota=$quota budget=${total / 2}")
  }

  test("q_top_terms yields exactly 3 ranked terms per source") {
    val rows = queries.Catalog.queries("q_top_terms")(spark, sfDir).collect()
    val bySource = rows.groupBy(_.getAs[String]("source"))
    assert(bySource.nonEmpty)
    bySource.foreach { case (src, rs) =>
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq == Seq(1, 2, 3),
        s"$src: ranks ${rs.map(_.getAs[Int]("rk")).toSeq}")
      // ranking is (tf desc, df asc, term asc) — verify monotonicity
      val ord = rs.sortBy(_.getAs[Int]("rk"))
        .map(r => (-r.getAs[Long]("tf"), r.getAs[Long]("df"),
          r.getAs[String]("term")))
      assert(ord.toSeq == ord.sorted.toSeq, s"$src: order violated $ord")
    }
  }
}
