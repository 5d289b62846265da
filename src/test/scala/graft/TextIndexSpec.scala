package graft

import org.apache.spark.sql.functions._

/** Value-level pins for the round-12 text-indexing additions: span-level
  * dedup accounting (q_span_dedup), skip-gram co-occurrence lift
  * (q_cooccur_pmi), and the inverted-index build (q_inverted_index).
  * The span semantics are pinned on a constructed corpus where the exact
  * keep-first coverage is computable by hand — including the
  * within-document repeat case the sf corpus doesn't exercise. */
class TextIndexSpec extends SparkSuite {

  test("q_span_dedup: hand-computed keep-first coverage on a constructed corpus") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_span").toString
    Seq(
      // doc 1 owns the span a..h (global first occurrence)
      (1L, "a b c d e f g h x y", "en", "web", 19L),
      // doc 2 repeats a..h at position 2 -> one flagged window, 8 tokens
      (2L, "z a b c d e f g h q", "en", "web", 19L),
      // doc 3 repeats ITS OWN window: 10x 'p' -> windows at 1,2,3 share one
      // gram; keep-first keeps i=1, flags i=2,3 -> coverage pos 2..10 = 9
      (3L, "p p p p p p p p p p", "en", "web", 19L),
      // doc 4 is below one window -> zero windows, zero dup
      (4L, "short doc here", "en", "web", 14L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = queries.Catalog.queries("q_span_dedup")(spark, dir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_windows"),
          r.getAs[Long]("dup_windows"), r.getAs[Long]("dup_tokens"),
          r.getAs[Long]("dup_pct")))
      .toMap
    assert(rows(1L) == ((10L, 3L, 0L, 0L, 0L)), s"doc1: ${rows(1L)}")
    assert(rows(2L) == ((10L, 3L, 1L, 8L, 80L)), s"doc2: ${rows(2L)}")
    assert(rows(3L) == ((10L, 3L, 2L, 9L, 90L)), s"doc3: ${rows(3L)}")
    assert(rows(4L) == ((3L, 0L, 0L, 0L, 0L)), s"doc4: ${rows(4L)}")
  }

  test("q_span_dedup invariants on the sf corpus") {
    val rows = queries.Catalog.queries("q_span_dedup")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTok, nWin) =
        (r.getAs[Long]("n_tok"), r.getAs[Long]("n_windows"))
      val (dw, dt) =
        (r.getAs[Long]("dup_windows"), r.getAs[Long]("dup_tokens"))
      assert(nWin == math.max(nTok - 7, 0), s"window count: $r")
      assert(dw <= nWin && dt <= nTok, s"accounting exceeds doc: $r")
      // one flagged window covers exactly 8 positions; more windows only
      // ever extend coverage
      assert((dw == 0) == (dt == 0), s"coverage/window disagree: $r")
      if (dw > 0) assert(dt >= 8, s"flagged doc covers < one window: $r")
    }
    // keep-first must leave every first occurrence unflagged
    assert(rows.map(_.getAs[Long]("dup_windows")).sum <
      rows.map(_.getAs[Long]("n_windows")).sum)
  }

  test("q_cooccur_pmi: canonical pairs, marginal bounds, ordered lift") {
    val rows = queries.Catalog.queries("q_cooccur_pmi")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 30)
    rows.foreach { r =>
      assert(r.getAs[String]("w1") <= r.getAs[String]("w2"), s"order: $r")
      assert(r.getAs[Long]("c_xy") <= r.getAs[Long]("c_x") &&
        r.getAs[Long]("c_xy") <= r.getAs[Long]("c_y"),
        s"pair count exceeds a marginal: $r")
    }
    val lifts = rows.map(_.getAs[Long]("lift_micro")).toSeq
    assert(lifts == lifts.sorted.reverse, "lift not descending")
  }

  test("q_bpe_pairs: symbol alphabet, end-marker accounting, weighted mass") {
    val rows = queries.Catalog.queries("q_bpe_pairs")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    rows.foreach { r =>
      assert(r.getAs[String]("p1").length == 1, s"p1 must be a symbol: $r")
      val p2 = r.getAs[String]("p2")
      assert(p2.length == 1 || p2 == "</w>", s"p2 symbol or end marker: $r")
    }
    val cnts = rows.map(_.getAs[Long]("cnt")).toSeq
    assert(cnts == cnts.sorted.reverse, "counts not descending")
  }

  test("q_bpe_pairs: hand-computed weighted pair counts on a constructed corpus") {
    val s = spark
    import s.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe").toString
    // word frequencies: ab x3, abc x1, cd x2
    Seq(
      (1L, "ab ab cd", "en", "web", 8L),
      (2L, "ab abc cd", "en", "web", 9L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val got = queries.Catalog.queries("q_bpe_pairs")(spark, dir).collect()
      .map(r => (r.getAs[String]("p1"), r.getAs[String]("p2")) ->
        r.getAs[Long]("cnt")).toMap
    val want = Map(
      ("a", "b") -> 4L,    // ab x3 + abc x1
      ("b", "</w>") -> 3L, // ab x3
      ("b", "c") -> 1L,    // abc
      ("c", "</w>") -> 1L, // abc
      ("c", "d") -> 2L,    // cd x2
      ("d", "</w>") -> 2L) // cd x2
    assert(got == want, s"got $got")
  }

  test("q_inverted_index: postings agree with df/cf and total token mass") {
    val rows =
      queries.Catalog.queries("q_inverted_index")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var cfTotal = 0L
    rows.foreach { r =>
      val posts = r.getAs[String]("postings").split(" ").toSeq
      val docs = posts.map(_.split(":")(0).toLong)
      val tfs = posts.map(_.split(":")(1).toLong)
      assert(docs == docs.sorted && docs.distinct == docs,
        s"postings unsorted/dup for ${r.getAs[String]("term")}")
      assert(r.getAs[Long]("df") == posts.length, s"df mismatch: $r")
      assert(r.getAs[Long]("cf") == tfs.sum, s"cf mismatch: $r")
      cfTotal += r.getAs[Long]("cf")
    }
    val nTokens = spark.read
      .parquet(s"$sfDir/documents.parquet")
      .select(explode(split(col("text"), "\\s+")).as("w"))
      .filter(col("w") =!= "").count()
    assert(cfTotal == nTokens, s"index mass $cfTotal != corpus $nTokens")
  }
}
