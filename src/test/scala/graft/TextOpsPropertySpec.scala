package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.TextOps

/** Property-based invariants for the text operators (SURVEY.md §5.2) over
  * ScalaCheck-generated corpora (deterministic seeds — the offline cache
  * has no scalatest-scalacheck bridge, so generators are sampled
  * directly). */
class TextOpsPropertySpec extends SparkSuite {

  private val word: Gen[String] =
    Gen.oneOf("alpha", "Beta", "gamma,", "the", "a", "it.", "Zeta", "x")
  private val line: Gen[String] =
    Gen.listOfN(6, word).map(_.mkString(" "))
  private val corpus: Gen[List[String]] =
    Gen.chooseNum(1, 12).flatMap(n => Gen.listOfN(n, line))

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("word counts sum to the token count") {
    val s = spark
    import s.implicits._
    (1L to 8L).foreach { seed =>
      val lines = sample(corpus, seed)
      val wc = TextOps.wordCount(
        TextOps.tokenize(lines.toDF("line"), col("line")))
      val total = wc.agg(coalesce(sum("n"), lit(0L))).collect()(0).getLong(0)
      val tokens = lines.flatMap(_.split("\\s+")).count(_.nonEmpty)
      assert(total == tokens, s"seed=$seed")
    }
  }

  test("top-k common is a prefix of the full sort, and max >= min pointwise") {
    val s = spark
    import s.implicits._
    (1L to 4L).foreach { seed =>
      val la = sample(corpus, seed)
      val lb = sample(corpus, seed + 100)
      def wc(ls: List[String]) = TextOps.wordCount(
        TextOps.tokenize(ls.toDF("line"), col("line")))
      val k3 = TextOps.topKCommon(wc(la), wc(lb), 3, useMax = true)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      val full = TextOps.topKCommon(wc(la), wc(lb), Int.MaxValue, useMax = true)
        .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
      assert(full.take(3) == k3, s"seed=$seed: top-k must prefix the full sort")

      val maxBy = full.map { case (n, w) => w -> n }.toMap
      val minBy = TextOps.topKCommon(wc(la), wc(lb), Int.MaxValue, useMax = false)
        .collect().map(r => r.getString(1) -> r.getLong(0)).toMap
      assert(maxBy.keySet == minBy.keySet,
        s"seed=$seed: max/min variants must agree on the common vocabulary")
      maxBy.foreach { case (w, n) =>
        assert(n >= minBy(w), s"seed=$seed word=$w")
      }
    }
  }

  test("stopword removal result is disjoint from the stopword set") {
    val s = spark
    import s.implicits._
    (1L to 4L).foreach { seed =>
      val lines = sample(corpus, seed)
      val stop = Seq("the", "a")
      val left = TextOps.removeStopwords(
          TextOps.tokenize(lines.toDF("line"), col("line")), stop.toDF("word"))
        .select("word").distinct().as[String].collect().toSet
      assert(left.intersect(stop.toSet).isEmpty, s"seed=$seed")
    }
  }
}
